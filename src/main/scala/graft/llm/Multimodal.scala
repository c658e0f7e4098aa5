package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode/feature-extract
  * runs per-partition over the binary batches.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[stubDecode]] derives a deterministic fake feature
  * vector from the payload bytes. Everything around it — schema contract,
  * partition-level batch iteration, feature post-processing — is the real
  * distributed path: swap `decode` for a JNI/ffmpeg/JPEG decoder and the
  * plan does not change.
  *
  * Scale notes: payloads never pass through a shuffle (decode happens
  * before any wide op); feature extraction is `mapPartitions`, the Scala
  * analogue of `mapInPandas` batch UDFs, so per-batch decoder state
  * (codec contexts, model sessions) is amortized across a partition.
  */
object Multimodal {

  /** Media row contract: id + opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte],
      format: String, width: Int, height: Int)

  case class MediaFeatures(media_id: Long, feat_dim: Int,
      features: Array[Float])

  /** STUB decoder — stands in for an image/audio decode. Deterministic:
    * folds payload bytes into `dim` INTEGER accumulators, with a single
    * float division at the end — so the fake features are bit-replicable
    * by any engine (integer sums are exact; one double divide + one
    * float rounding, no float32 accumulation-order sensitivity). A real
    * decoder replaces only this function. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** Per-partition batch decode: binary payloads → feature vectors.
    * Decoder "state" (here just `dim`) is initialized once per partition,
    * as a real codec context would be. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(r => MediaFeatures(r.media_id, dim, stubDecode(r.payload, dim)))
    }
  }

  /** STUB resize — stands in for an image scale: deterministically
    * resamples the payload to `targetW × targetH` bytes (nearest-byte
    * pick). The real op swaps only this function; the schema contract
    * (payload′ + updated metadata) and the shuffle-free per-row plumbing
    * are what the engine owns. */
  def stubResize(payload: Array[Byte], srcW: Int,
      targetW: Int, targetH: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(targetW * targetH, 0))
    val n = math.max(payload.length, 1)
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * n / math.max(out.length, 1)).toInt % n)
      i += 1
    }
    out
  }

  /** Resize a media batch: payloads re-encoded, metadata updated. Pure
    * projection — payloads never shuffle. */
  def resize(media: Dataset[MediaRow], targetW: Int,
      targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaRow(r.media_id,
        stubResize(r.payload, r.width, targetW, targetH),
        r.format, targetW, targetH))
    }
  }

  case class MediaFrame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB frame sampling — stands in for a video decoder pulling every
    * k-th frame: slices the payload into `frameBytes`-sized chunks and
    * keeps each `stride`-th one. One media row explodes into its frame
    * rows (flatMap — the row multiplier the real op would have), so
    * downstream per-frame feature extraction parallelizes per frame. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => MediaFrame(r.media_id, i, chunk) }
    }
  }

  /** Demo pipeline over the documents table: text bytes stand in for a
    * media payload (UTF-8 is as opaque to the plumbing as JPEG would be).
    * Output: id, dim, rounded feature norm — deterministic. */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame,
      dim: Int = 16): DataFrame = {
    import spark.implicits._
    val media = docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("format"),
      col("n_chars").cast("int").as("width"),
      lit(1).as("height")).as[MediaRow]
    extractFeatures(media, dim).toDF()
      .select(col("media_id"), col("feat_dim"),
        (floor(aggregate(col("features"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")) * 10000 + 0.5) / 10000)
          .as("feat_sq_norm"))
      .orderBy("media_id")
  }

  /** Full media pipeline demo: resize → frame-sample → per-frame feature
    * extraction. Output: (media_id, frame_no, feat_sq_norm) — the
    * video-style one-row-to-many-frames shape. */
  def documentsAsFrames(spark: SparkSession, docs: DataFrame,
      targetW: Int = 128, frameBytes: Int = 32, stride: Int = 2,
      featDim: Int = 8): DataFrame = {
    import spark.implicits._
    val media = docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("video/fake").as("format"),
      col("n_chars").cast("int").as("width"),
      lit(1).as("height")).as[MediaRow]
    val frames = frameSample(resize(media, targetW, targetH = 1),
      frameBytes, stride)
    frames.map(f => (f.media_id, f.frame_no,
        math.floor(stubDecode(f.payload, featDim)
          .foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble) * 1e4 + 0.5) / 1e4))
      .toDF("media_id", "frame_no", "feat_sq_norm")
      .orderBy("media_id", "frame_no")
  }
}
