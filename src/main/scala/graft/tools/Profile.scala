package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only repeat-timer for declared queries (not part of the library
  * surface): `runMain graft.tools.Profile <n_reps> <query>...` times each
  * named query `n_reps` times at local[32] after a warmup, separating plan
  * cost from JIT/codegen noise — Bench times one cold pass, which at small
  * SF is dominated by fixed overhead. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val names = if (args.length > 1) args.tail.toSeq
                else Seq("q_dedup_ngram", "q_dedup_minhash", "q_text_langid")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).select(sum(col("id"))).count()
    graft.Tables.documents(spark, sfDir).count()
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name%-24s run $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
