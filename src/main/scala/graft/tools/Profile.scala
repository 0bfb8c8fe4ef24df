package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler (not part of the library surface). */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(1000000L).select(sum(col("id"))).count()
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()

    // --- ngram stages (current pipeline shape)
    import org.apache.spark.sql.graft.ColumnBridge
    val n = 3
    val in = graft.operators.ScaleOps.parallelizeSmall(docs)
    val sh = in
      .select(col("doc_id"), ColumnBridge.column(graft.functions.NgramHashes(
        ColumnBridge.expression(split(lower(col("text")), " ")), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    t("ngram: shingle count")(sh.select(sum(size(col("sh")))).collect())
    val ex = sh
      .select(col("doc_id"), explode_outer(col("sh")).as("h"))
      .filter(col("h").isNotNull)
      .withColumn("f", count(lit(1)).over(Window.partitionBy(col("h"))))
    t("ngram: windowed freq")(ex.count())
    val s = 0.5
    val docSets = ex
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("f"), col("h")))).as("fh"))
      .select(col("doc_id"),
        expr("transform(fh, x -> x.h)").as("sh"),
        size(col("fh")).as("ns"),
        expr(s"slice(fh, 1, cast(size(fh) - ceil(size(fh) * $s) + 1 AS INT))")
          .as("pfx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ngram: docSets persist")(docSets.count())
    val prefix = docSets
      .select(col("doc_id"), col("ns"),
        posexplode_outer(col("pfx")).as(Seq("p0", "x")))
      .filter(col("x").isNotNull && col("x.f") > 1)
      .select(col("doc_id"), col("ns"), (col("p0") + 1).as("pos"), col("x.h").as("h"))
    val grouped = prefix.groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("pos"), col("ns"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val smallPairs = grouped.filter(size(col("ids")) <= 256)
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids)), b -> struct(
               least(a.doc_id, b.doc_id) AS doc_a,
               greatest(a.doc_id, b.doc_id) AS doc_b,
               least(a.ns - a.pos, b.ns - b.pos) AS slack,
               a.ns AS na, b.ns AS nb))))""")).as("p"))
      .select(col("p.*"))
    val cand = smallPairs
      .filter(
        least(col("na"), col("nb")) >=
          ceil(lit(s) * greatest(col("na"), col("nb")) - lit(1e-9)) &&
        col("slack") + 1 >=
          ceil(lit(s / (1.0 + s)) * (col("na") + col("nb")) - lit(1e-9)))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    t("ngram: candidates")(println("cand=" + cand.count()))
    val meta = graft.operators.ScaleOps.maybeBroadcast(
      docSets.select(col("doc_id"), col("sh"), col("ns")))
    val refined = cand.join(meta.as("A"), col("doc_a") === col("A.doc_id"))
      .join(meta.as("B"), col("doc_b") === col("B.doc_id"))
      .withColumn("inter", size(array_intersect(col("A.sh"), col("B.sh"))).cast("double"))
      .withColumn("uni", (col("A.ns") + col("B.ns")).cast("double") - col("inter"))
      .withColumn("jd", lit(1.0) - col("inter") / col("uni"))
      .filter(col("jd") <= 0.5)
    t("ngram: refine")(refined.count())
    docSets.unpersist()
    t("ngram: FULL")(graft.queries.LlmOps.qDedupNgram(spark, sfDir).count())

    // --- langid stages
    val docGrams = graft.operators.ScaleOps.parallelizeSmall(docs)
      .select(col("doc_id"), col("lang"),
        explode(graft.text.TextOps.charNgrams(col("text"), 3)).as("g"))
      .groupBy(col("doc_id"), col("lang"), col("g")).agg(count(lit(1)).as("c"))
    t("langid: docGrams")(println("docGrams=" + docGrams.count()))
    t("langid: FULL")(graft.queries.LlmOps.qTextLangid(spark, sfDir).count())

    // --- embed stages
    t("embed: FULL")(graft.queries.LlmOps.qDedupEmbed(spark, sfDir).count())
    // --- ivf
    t("ivf: FULL")(graft.queries.LlmOps.qSimIvfAnn(spark, sfDir).count())
    spark.stop()
  }
}
