package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column processing — north-star surface: image/audio/
  * video ride through the engine as opaque `binary` payloads plus typed
  * metadata, and the decode/feature steps run distributed with a real batch
  * shape. The codec itself is STUBBED (this container has no image/audio
  * libraries) behind `decodeStub` — a deterministic fake with the exact
  * signature a JNI/javacpp decoder would have — so everything Spark-side
  * (schema, partitioning, per-partition batching, feature schema) is real
  * and tested while the stub is one function swap away from a real codec.
  *
  * Scale posture: payloads never pass through a shuffle wider than their
  * repartition; decode is mapPartitions (the documented last-resort tier of
  * SURVEY §7.3 — justified here because an opaque byte-level codec cannot
  * be a Catalyst expression), batched so a real decoder would amortize
  * native-call overhead; features come back as narrow typed rows that all
  * downstream relational ops (joins, aggs, ANN) consume without touching
  * the payload again.
  */
object Media {

  /** Typed media row: opaque payload + the metadata a real ingest would
    * carry. */
  case class MediaAsset(
      asset_id: Long, media_type: String,
      width: Int, height: Int, payload: Array[Byte])

  /** Narrow per-asset features produced by the decode stage. */
  case class MediaFeatures(
      asset_id: Long, media_type: String,
      n_bytes: Long, mean_byte: Double, frames_sampled: Int, phash: Long)

  /** Deterministic synthetic media table derived from `documents` (text
    * bytes standing in for an encoded payload): the fixture a real pipeline
    * would read as `binary` parquet columns. */
  def syntheticAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** ======== THE STUB ========
    * Stand-in for the real codec call (e.g. a JNI image decode + resize +
    * frame sample). Deterministic pure function of the payload bytes so
    * tests are stable; a real implementation replaces ONLY this body. */
  private[multimodal] def decodeStub(a: MediaAsset, targetFrames: Int): MediaFeatures = {
    var sum = 0L
    var h = 1125899906842597L // FNV-ish rolling hash as the "perceptual hash"
    var i = 0
    while (i < a.payload.length) {
      sum += a.payload(i) & 0xff
      h = h * 31 + (a.payload(i) & 0xff)
      i += 1
    }
    val frames = if (a.media_type == "video") math.min(targetFrames, a.width % 7 + 1) else 1
    MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
      if (a.payload.isEmpty) 0.0 else sum.toDouble / a.payload.length,
      frames, h)
  }

  /** Distributed decode / feature-extract: repartition to spread payload
    * bytes evenly, then mapPartitions in fixed-size batches — the shape a
    * native decoder needs (amortized init per batch, bounded memory:
    * `batchSize` payloads resident at once). */
  def extractFeatures(assets: Dataset[MediaAsset],
                      targetFrames: Int = 4,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real codec: init native context once per batch here
          batch.iterator.map(a => decodeStub(a, targetFrames))
        }
      }
  }

  /** Features joined back to the relational/vector world — the downstream
    * consumption pattern (no payload bytes cross this join). */
  def featuresWithEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(syntheticAssets(spark, dir))
    graft.Tables.embeddings(spark, dir)
      .join(feats.toDF(), col("vec_id") === col("asset_id"))
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("mean_byte"), col("frames_sampled"), col("phash"), col("label"))
  }
}
