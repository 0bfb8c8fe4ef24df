package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_agg_pricing exercises the whole vertical:
    * scan → filter → project → partial/final aggregate → sort → sink. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Windows.queries ++
    graft.queries.Functions.queries ++
    graft.queries.MlSuffStats.queries ++
    graft.queries.LlmOps.queries ++
    graft.queries.StreamingQs.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_agg_approx_distinct, q_sim_lsh_ann, ... — see SURVEY.md §2's
    * contract total for the current list). */
  def oracleSql: Map[String, String] = Oracle.all
}
