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
  * energy envelopes. Video decode is REAL for MJPEG-in-AVI (r8): AVI is
  * plain RIFF chunk framing — a from-scratch walker (public RIFF/AVI
  * spec, no deps) extracts the `##dc`/`##db` stream-data chunks from the
  * `movi` list, and for Motion-JPEG each chunk is a complete JPEG the
  * JDK's ImageIO decodes. Other codecs (H.264 etc.) remain out of reach
  * without external libraries; undecodable payloads fall back to
  * `stubFeatures` everywhere so a mixed corpus never throws.
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

  /** Walk an AVI (RIFF) container and return the video stream-data chunk
    * payloads in file order. RIFF framing (public spec): the file is
    * `"RIFF" <size LE32> "AVI "` followed by chunks of
    * `<fourcc(4)> <size LE32> <data> <pad-to-even>`; a `LIST` chunk nests
    * sub-chunks after its 4-byte list type. Video frames live in the
    * `movi` list as chunks whose fourcc is `NNdc` (compressed) or `NNdb`
    * (uncompressed), NN = the two-digit stream number. For MJPEG each
    * `dc` payload is a standalone JPEG.
    *
    * Returns None when the bytes are not a RIFF/AVI container or contain
    * no `movi` list; a TRUNCATED but well-prefixed file yields the frames
    * that fit (ingest posture: salvage, don't throw). Only the first
    * video stream encountered is returned (multi-stream files interleave
    * audio `wb` chunks, which are skipped by fourcc).
    */
  def aviVideoChunks(bytes: Array[Byte]): Option[Vector[Array[Byte]]] =
    aviVideoChunksEvery(bytes, 1).map(_.map(_._2))

  /** [[aviVideoChunks]] with the sampling INSIDE the walk: only every
    * `keepEvery`-th video chunk is copied off the payload (paired with its
    * FULL-stream frame index), so sparse sampling of a large clip does not
    * first duplicate the whole payload on the task heap (review r10).
    */
  def aviVideoChunksEvery(bytes: Array[Byte],
                          keepEvery: Int): Option[Vector[(Int, Array[Byte])]] = {
    require(keepEvery > 0)
    def le32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // honor the container's own declared extent: bytes APPENDED after the
    // RIFF chunk (naive file concatenation, recovery-tool tails) must not
    // be parsed as top-level chunks and inject foreign frames
    val riffEnd = math.min(bytes.length.toLong, 8L + le32(4)).toInt
    val frames = Vector.newBuilder[(Int, Array[Byte])]
    var frameIdx = 0
    var sawMovi = false
    var videoStream: Option[String] = None
    // depth-capped walk: each LIST recursion consumes >= 12 input bytes, so
    // an adversarial file could nest tens of thousands deep — real AVIs
    // nest <= 4, so 64 is generous and the stack stays bounded
    def walk(start: Int, end: Int, inMovi: Boolean, depth: Int): Unit = {
      if (depth > 64) return
      var off = start
      while (off + 8 <= end) {
        val cc = fourcc(off)
        val size = le32(off + 4)
        val dataStart = off + 8
        // clamp to the real buffer: a truncated tail yields what fits
        val dataEnd = math.min(dataStart + math.min(size, Int.MaxValue).toInt,
          math.min(end, bytes.length))
        if (dataEnd < dataStart) return // corrupt size past 2 GB: stop
        if (cc == "LIST" && dataStart + 4 <= dataEnd) {
          val listType = fourcc(dataStart)
          if (listType == "movi") sawMovi = true
          walk(dataStart + 4, dataEnd, inMovi || listType == "movi", depth + 1)
        } else if (inMovi && cc.length == 4 &&
          cc(0).isDigit && cc(1).isDigit &&
          (cc.endsWith("dc") || cc.endsWith("db"))) {
          val stream = cc.substring(0, 2)
          if (videoStream.isEmpty) videoStream = Some(stream)
          if (videoStream.contains(stream) && dataEnd > dataStart) {
            if (frameIdx % keepEvery == 0)
              frames += frameIdx -> java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            frameIdx += 1
          }
        }
        // chunks are padded to even lengths; advance in Long — with size
        // near 2^31, dataStart + paddedSize overflows Int to a NEGATIVE
        // offset that still passes the `off + 8 <= end` guard and indexes
        // the buffer out of bounds (review r9). Past `end` means no
        // further chunk fits: stop (same salvage-what-fits semantics).
        val next = dataStart.toLong + ((math.min(size, Int.MaxValue.toLong) + 1L) & ~1L)
        if (next <= off || next > end) return
        off = next.toInt
      }
    }
    walk(12, riffEnd, inMovi = false, depth = 0)
    if (sawMovi) Some(frames.result()) else None
  }

  /** Decode an MJPEG-in-AVI video payload: every `everyK`-th frame chunk
    * is JPEG-decoded to a `width`x`height` grayscale pixel vector (via
    * [[decodeImage]]). None when the payload is not an AVI with a `movi`
    * list; frames whose chunk fails JPEG decode are skipped (a corrupt
    * frame must not sink the clip). Frame indices are positions in the
    * FULL stream, so downstream timing math survives the sampling.
    */
  def decodeVideoFrames(bytes: Array[Byte], everyK: Int, width: Int,
                        height: Int): Option[Vector[(Int, Array[Float])]] = {
    require(everyK > 0)
    aviVideoChunksEvery(bytes, everyK).map { chunks =>
      chunks.iterator
        .flatMap { case (i, jpeg) => decodeImage(jpeg, width, height).map(i -> _) }
        .toVector
    }
  }

  final case class FrameFeatures(path: String, frameIdx: Int, nBytes: Long,
                                 features: Array[Float])

  /** Partition-wise real video decode (MJPEG/AVI): one output row per
    * sampled, decodable frame. A payload that yields NO frame rows — not
    * an AVI at all, OR an AVI whose stream is some other codec
    * (H.264/Cinepak in an AVI container is the common non-MJPEG case:
    * every chunk fails JPEG decode) — contributes a single frameIdx = -1
    * stub row, so no input ever silently vanishes and a mixed corpus
    * keeps one schema (same posture as [[decode]]/[[decodeAudioFeatures]]).
    */
  def decodeVideo(media: Dataset[MediaRecord], everyK: Int = 1, width: Int = 28,
                  height: Int = 28): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    val dim = width * height
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeVideoFrames(m.content, everyK, width, height) match {
          case Some(frames) if frames.nonEmpty =>
            frames.iterator.map { case (i, px) =>
              FrameFeatures(m.path, i, m.content.length.toLong, px) }
          case _ => Iterator.single(FrameFeatures(m.path, -1,
            m.content.length.toLong, stubFeatures(m.content, dim)))
        }
      }
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
