package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY E4, S4): media ride as opaque binary
  * columns with typed metadata; decode/feature-extract runs partition-wise
  * so batch-oriented decoders amortize setup per partition, not per row.
  *
  * Image decode is REAL for the formats the JDK ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — no external deps; mirrors the
  * reference's ImageRecordReader(28,28,1) pixel ingestion,
  * 13486_Code/src/main/scala/chapter_4/MnistClassification.java:61-63).
  * `decode` resizes to a fixed grayscale grid and emits pixels in [0,1].
  * Audio decode is REAL for WAV/PCM (`javax.sound.sampled` ships the
  * parser): `decodeAudio` downmixes to mono and emits per-window RMS
  * energy envelopes. Video decode stays stubbed (genuinely no JDK codec):
  * `decodeStub` derives a deterministic fake feature vector from the
  * bytes, and both real decoders fall back to it for undecodable payloads
  * so a mixed corpus never throws.
  */
object Multimodal {

  final case class MediaRecord(path: String, mediaType: String, content: Array[Byte])
  final case class MediaFeatures(path: String, mediaType: String, nBytes: Long,
                                 features: Array[Float])

  /** Wrap a text/blob column as a media record table. */
  def asMedia(df: DataFrame, pathCol: String, typeLit: String, payloadCol: String)
             (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(pathCol).cast("string").as("path"), lit(typeLit).as("mediaType"),
      col(payloadCol).cast("binary").as("content")).as[MediaRecord]
  }

  /** Deterministic stand-in for a real decoder: dim floats derived from
    * byte content (rolling sum mod 256, scaled to [0,1)).
    */
  def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 0
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) & 0x7fffffff
      out(i % dim) = ((acc % 256) / 256.0f)
      i += 1
    }
    out
  }

  /** Partition-wise "decode": the shape a real image/audio decoder plugs
    * into (per-partition init, batch loop, typed output).
    */
  def decodeStub(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (model load, codec setup)
      it.map { m =>
        MediaFeatures(m.path, m.mediaType, m.content.length.toLong,
          stubFeatures(m.content, dim))
      }
    }
  }

  /** Decode an image payload with the JDK's ImageIO (PNG/BMP/GIF/JPEG),
    * resample to `width`×`height` grayscale, and return row-major pixels
    * scaled to [0,1]. Returns None when the bytes are not a decodable image
    * (wrong magic, truncated stream, unsupported format) — callers decide
    * the fallback; `decode` substitutes `stubFeatures`.
    */
  def decodeImage(bytes: Array[Byte], width: Int, height: Int): Option[Array[Float]] = {
    require(width > 0 && height > 0)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val gray = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = gray.createGraphics()
        try g.drawImage(img, 0, 0, width, height, null) finally g.dispose()
        val raster = gray.getRaster
        val out = new Array[Float](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            out(y * width + x) = raster.getSample(x, y, 0) / 255.0f
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Partition-wise real decode: ImageIO pixels for decodable images,
    * `stubFeatures` fallback otherwise (feature dim stays width*height
    * either way, so downstream schema is uniform across a mixed corpus).
    */
  def decode(media: Dataset[MediaRecord], width: Int = 28,
             height: Int = 28): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val dim = width * height
    media.mapPartitions { it =>
      // ImageIO readers are looked up once per JVM; nothing per-row to init
      it.map { m =>
        val feats = decodeImage(m.content, width, height)
          .getOrElse(stubFeatures(m.content, dim))
        MediaFeatures(m.path, m.mediaType, m.content.length.toLong, feats)
      }
    }
  }

  /** Decode a WAV/PCM audio payload with the JDK's sampled-sound stack
    * (`javax.sound.sampled` ships a WAV parser — no external codecs),
    * downmix to mono, and summarize as `dim` per-window RMS energies in
    * [0, 1] (the classic energy-envelope feature). Any sample rate; input
    * is converted to 16-bit signed PCM first. Returns None when the bytes
    * are not parseable audio (wrong magic, truncated header, compressed
    * encoding without a JDK codec) — same contract as [[decodeImage]].
    */
  def decodeAudio(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    require(dim > 0)
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val src = ais.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
        src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, ais)
      val raw = try pcm.readAllBytes() finally { pcm.close(); ais.close() }
      val ch = target.getChannels
      val nSamples = raw.length / (2 * ch)
      if (nSamples == 0) None
      else {
        // mono samples in [-1, 1): average channels, little-endian shorts
        val mono = new Array[Double](nSamples)
        var i = 0
        while (i < nSamples) {
          var s = 0.0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            s += ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort / 32768.0
            c += 1
          }
          mono(i) = s / ch
          i += 1
        }
        val out = new Array[Float](dim)
        var o = 0
        while (o < dim) {
          val lo = (o.toLong * nSamples / dim).toInt
          val hi = math.max((((o + 1).toLong * nSamples) / dim).toInt, lo + 1)
          var acc = 0.0
          var j = lo
          while (j < hi && j < nSamples) { acc += mono(j) * mono(j); j += 1 }
          out(o) = math.sqrt(acc / math.max(hi - lo, 1)).toFloat
          o += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Partition-wise real audio decode: WAV/PCM energy envelopes for
    * parseable payloads, `stubFeatures` fallback otherwise (uniform
    * feature dim across a mixed corpus, like [[decode]]).
    */
  def decodeAudioFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val feats = decodeAudio(m.content, dim).getOrElse(stubFeatures(m.content, dim))
        MediaFeatures(m.path, m.mediaType, m.content.length.toLong, feats)
      }
    }
  }

  /** Resize a feature vector to `outDim` by mean-pooling equal buckets —
    * the downsample step of an image/audio pipeline (deterministic, no
    * codec needed; a real bilinear resize plugs in the same slot).
    */
  def resizeFeatures(features: Array[Float], outDim: Int): Array[Float] = {
    require(outDim > 0)
    val in = features.length
    Array.tabulate(outDim) { o =>
      val lo = (o.toLong * in / outDim).toInt
      val hi = math.max(((o + 1).toLong * in / outDim).toInt, lo + 1)
      var s = 0.0f
      var i = lo
      while (i < hi && i < in) { s += features(i); i += 1 }
      if (hi > lo) s / (hi - lo) else 0f
    }
  }

  final case class MediaFrame(path: String, frameIdx: Int, frame: Array[Byte])

  /** Frame sampling over an opaque "video" payload: fixed-size frames,
    * keep every `everyK`-th — the partition-wise shape of a real frame
    * extractor (ffmpeg et al. plug into the same loop).
    */
  def frameSample(media: Dataset[MediaRecord], frameSize: Int,
                  everyK: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(frameSize > 0 && everyK > 0)
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = m.content.length / frameSize
        (0 until nFrames).iterator.filter(_ % everyK == 0).map { f =>
          MediaFrame(m.path, f,
            java.util.Arrays.copyOfRange(m.content, f * frameSize, (f + 1) * frameSize))
        }
      }
    }
  }
}
