package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the ten testdata parquet tables (FIXTURES.md).
  *
  * Scale posture: each loader is a plain parquet scan — Catalyst pushes
  * filters and projections down into the vectorized parquet reader, so at
  * 100 TB the same code reads only the needed columns / row groups. No
  * caching here; callers own lifecycle. At cluster scale the same paths
  * would point at a partitioned parquet layout and partition pruning would
  * kick in with zero code change.
  */
object Tables {

  /** Session settings every query needs regardless of which builder created
    * the session (Verify/Bench builders don't set them all; `getOrCreate`
    * reuses sessions, so set runtime-settable confs here, per SURVEY.md §4).
    */
  def prep(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet carries Parquet TIMESTAMP(NANOS), which Spark 4 rejects
    // by default (PARQUET_TYPE_ILLEGAL). With this flag `ts` arrives as
    // LongType epoch-nanos; decode recipe in `events` below. SURVEY.md §1.3.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Native codegen'd expressions (functions/VecDot.scala,
    // functions/MinHash.scala); registration is idempotent.
    graft.functions.VecDot.register(spark)
    graft.functions.MinHashSig.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.CharNgrams.register(spark)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    prep(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, dir: String): DataFrame = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** `events` with `ts` decoded from epoch-nanos (LongType under
    * `nanosAsLong`) to a microsecond TimestampType.
    *
    * Integer `div` ONLY: `(ts/1000).cast("long")` routes through Double,
    * whose 53-bit mantissa cannot hold 61-bit epoch-nanos and corrupts the
    * microsecond (verified in SURVEY.md §1.3). DuckDB reads the same column
    * natively at microsecond precision, so both engines agree after this.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Directory for operator-internal file staging (the ORC round-trip,
    * stream arrival dirs). Root comes from the runtime conf
    * `graft.stage.dir`; harness mains (Verify, Bench) set it to a run-scoped
    * root and `deleteRecursively` it in their epilogue, so staging shares the
    * run's lifecycle instead of accreting in java.io.tmpdir (the fallback for
    * ad-hoc sessions). At cluster scale this conf must name a shared-filesystem
    * path every executor can reach — local tmpdirs don't exist off-box. */
  def stageDir(spark: SparkSession, sub: String): String = {
    val root = spark.conf.get("graft.stage.dir",
      java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-stage").toString)
    val p = java.nio.file.Paths.get(root, sub)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** stageDir keyed by an arbitrary string (e.g. the sf dir path): the key
    * is sanitized here so no call site can leak path separators into the
    * staging sub-path. */
  def stageDir(spark: SparkSession, prefix: String, rawKey: String): String =
    stageDir(spark, s"$prefix-${rawKey.replaceAll("[^A-Za-z0-9]", "_")}")

  /** Best-effort recursive delete for a staging root (harness epilogue). */
  def deleteRecursively(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Throwable => () })
    }
  }
}
