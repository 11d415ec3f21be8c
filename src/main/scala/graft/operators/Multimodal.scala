package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata (the multimodal column
  * pattern — content stays an uninterpreted BLOB, everything queryable lives
  * in typed sibling columns). */
final case class MediaRow(asset_id: Long, content: Array[Byte], mime: String,
                          n_bytes: Long, checksum: String)

/** Decoded-frame features for one asset (decode itself is stubbed — see
  * [[Multimodal.featureExtract]]). */
final case class MediaFeatures(asset_id: Long, width: Int, height: Int,
                               n_frames: Int, features: Array[Float])

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extract / resize /
  * frame-sample as per-partition batch functions over the binary payload.
  *
  * The *decode step is a deterministic stub* — this container has no image
  * or audio codecs, so "decoding" derives dimensions and features from the
  * content checksum instead of real pixels. Everything around the stub —
  * the schema, the binary column handling, the `mapPartitions` batch shape
  * (one partition = one batch of assets through the "codec"), the metadata
  * projection — is the real production plumbing and is tested.
  *
  * Scale: binary payloads ride along in parquet; metadata predicates
  * (mime, n_bytes, checksum) push down to the scan so full-content reads
  * only happen for selected assets. The feature extraction is a
  * shuffle-free narrow transformation.
  */
object Multimodal {

  /** Wrap a text corpus as binary assets: content = UTF-8 bytes (the
    * stand-in for real media bytes), metadata derived from the content.
    * DuckDB parity: `encode(text)`, `octet_length`, `md5`. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("content"),
      lit("text/plain").as("mime"),
      octet_length(col("text")).cast("bigint").as("n_bytes"),
      md5(col("text")).as("checksum"))

  /** Deterministic fake "decode": dimensions and frame count derived from
    * the checksum's portable 60-bit hash — integer arithmetic only, so a
    * DuckDB oracle reproduces it exactly. A real deployment swaps this
    * column block for a codec call inside [[featureExtract]]. */
  def decodeMeta(assets: DataFrame): DataFrame =
    // integer `div`, not `/`: float division of a 60-bit value loses ulps
    // past 2^53 and would truncate differently than DuckDB's `//`
    assets.withColumn("h60",
        conv(substring(col("checksum"), 1, 15), 16, 10).cast("bigint"))
      .withColumn("width", (col("h60") % 624 + 16).cast("int"))
      .withColumn("height", (expr("h60 div 1024") % 464 + 16).cast("int"))
      .withColumn("n_frames", (col("h60") % 16 + 1).cast("int"))
      .drop("h60")

  /** Frame sampling: every `step`-th frame index, as a count + first/last
    * (scalar projections of the sampled sequence). */
  def frameSample(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .withColumn("n_sampled", (floor((col("n_frames") - 1) / step) + 1).cast("int"))
      .withColumn("last_frame", (col("n_sampled") - 1) * step)

  /** Feature extraction over the binary payload: per-partition batches
    * through the (stubbed) codec, emitting fixed-width float features.
    * The stub folds content bytes into `dim` accumulators — deterministic,
    * shuffle-free, and shaped exactly like a real encoder pass. */
  def featureExtract(assets: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { rows =>
      rows.map { r =>
        // --- stubbed decode: real impl would decode r.content here ---
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.content.length) {
          acc(i % dim) += (r.content(i) & 0xff) / 255.0f
          i += 1
        }
        val h = java.lang.Long.parseLong(r.checksum.take(15), 16)
        MediaFeatures(r.asset_id, (h % 624 + 16).toInt, ((h / 1024) % 464 + 16).toInt,
          (h % 16 + 1).toInt, acc)
      }
    }
  }
}
