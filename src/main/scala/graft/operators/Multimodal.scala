package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY E4, S4): media ride as opaque binary
  * columns with typed metadata; decode/feature-extract runs partition-wise
  * so batch-oriented decoders amortize setup per partition, not per row.
  *
  * The actual image/audio decode is STUBBED (no media libraries in this
  * container): decodeStub derives a deterministic fake feature vector from
  * the bytes. The Spark-side contract — schema, partition-wise batching,
  * binary hygiene — is real and tested; swap `stubFeatures` for a JNI/
  * library decoder without touching the plumbing.
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
