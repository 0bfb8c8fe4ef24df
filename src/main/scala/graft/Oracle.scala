package graft

/** DuckDB-runnable ANSI SQL oracle per declared query key (SURVEY.md §2).
  *
  * Dialect-parity rules baked into every string (SURVEY.md §2.9):
  *  - money sums: `CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)` — exact,
  *    partition-order independent, mirrors graft.functions.Det.dsum;
  *  - every query ends in a total ORDER BY with unique-key tiebreak and
  *    explicit NULLS FIRST/LAST (Spark and DuckDB defaults differ);
  *  - ratio-like floats rounded (4–6 dp) on BOTH sides;
  *  - DuckDB lists are 1-indexed where Spark arrays are 0-indexed;
  *  - integer-ish derived outputs cast to BIGINT on both sides.
  */
object Oracle {

  /** Exact decimal money sum, as double (oracle twin of Det.dsum): rounded
    * decimal → exact scaled integer → one correctly-rounded double division.
    * (A direct DECIMAL→DOUBLE cast is NOT portable: DuckDB double-rounds via
    * `hugeint * 1e-10`, Spark rounds correctly via BigDecimal.) */
  private def dsum(x: String, scale: Int = 2): String = {
    val p = math.pow(10, scale).toLong
    s"CAST(round(sum(CAST($x AS DECIMAL(38,10))), $scale) * $p AS BIGINT) / $p.0"
  }

  private val scanSpecs = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  val relational: Map[String, String] = Map(
    "q_scan_parquet" ->
      (scanSpecs.map { case (t, k) =>
        s"SELECT '$t' AS table_name, count(*) AS n_rows, CAST(min($k) AS BIGINT) AS min_key, CAST(max($k) AS BIGINT) AS max_key FROM $t"
      }.mkString("", " UNION ALL ", " ORDER BY table_name")),

    "q_scan_events_ns" ->
      """SELECT event_type, count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_proj_compute" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge,
                l_returnflag || '|' || l_linestatus AS flag
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 100""",

    "q_filter_pred" ->
      """SELECT p_partkey, p_name, p_type, p_size, p_retailprice
         FROM part
         WHERE p_type LIKE 'PROMO%' AND p_size BETWEEN 10 AND 40
           AND (p_size IN (11, 13, 17, 19, 23) OR p_retailprice > 950.0)
           AND NOT (p_partkey % 7 = 0)
         ORDER BY p_partkey""",

    "q_filter_null" ->
      """SELECT c_custkey,
                b.n_big IS NULL AS no_big_order,
                coalesce(b.n_big, 0) AS n_big_orders,
                nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building
         FROM customer c
         LEFT JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
                    WHERE o_totalprice > 400000.0 GROUP BY o_custkey) b
           ON c.c_custkey = b.o_custkey
         ORDER BY c_custkey""",

    "q_join_inner" ->
      s"""SELECT c_custkey, c_name, ${dsum("o_totalprice")} AS spend, count(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey, c_name
          ORDER BY spend DESC, c_custkey LIMIT 10""",

    "q_join_multiway" ->
      s"""SELECT r_name,
                 ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
                 count(*) AS n_lines
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""",

    "q_join_left" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_big,
                 coalesce(${dsum("o_totalprice")}, 0.0) AS big_spend
          FROM customer
          LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
            ON c_custkey = o_custkey
          GROUP BY c_custkey ORDER BY c_custkey""",

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",

    "q_join_anti" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_partkey = p_partkey
                             AND l_shipdate >= TIMESTAMP '2001-06-01')
         ORDER BY p_partkey""",

    "q_join_theta" ->
      """SELECT p_partkey, l_orderkey, l_linenumber, l_partkey, l_suppkey,
                l_extendedprice, p_retailprice
         FROM part, lineitem
         WHERE p_size >= 48 AND l_quantity <= 5.0
           AND l_extendedprice BETWEEN p_retailprice - 25.0 AND p_retailprice + 25.0
         ORDER BY p_partkey, l_orderkey, l_linenumber, l_partkey, l_suppkey""",

    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${dsum("l_quantity")} AS sum_qty,
                 ${dsum("l_extendedprice")} AS sum_base_price,
                 ${dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
                 ${dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
                 round(${dsum("l_quantity")} / count(*), 6) AS avg_qty,
                 round(${dsum("l_extendedprice")} / count(*), 6) AS avg_price,
                 round(${dsum("l_discount", 6)} / count(*), 6) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2000-09-02'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps,
                count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
                count(*) AS n_rows
         FROM lineitem""",

    "q_agg_groupingsets" ->
      s"""SELECT n_name, c_mktsegment,
                 CAST(grouping(n_name) AS BIGINT) AS g_nation,
                 CAST(grouping(c_mktsegment) AS BIGINT) AS g_segment,
                 count(*) AS n_cust,
                 ${dsum("c_acctbal")} AS sum_bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
          ORDER BY g_nation, g_segment, n_name ASC NULLS FIRST,
                   c_mktsegment ASC NULLS FIRST""",

    "q_agg_stats" ->
      """SELECT l_returnflag, count(*) AS n,
                round(stddev_samp(l_quantity), 4) AS sd_qty,
                round(var_samp(l_quantity), 4) AS var_qty,
                round(covar_pop(l_quantity, l_discount), 6) AS cov_qd,
                round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
                round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
                round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_median" ->
      """SELECT o_orderstatus, count(*) AS n,
                round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
                round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_sort_multi" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
                nullif(c_mktsegment, 'BUILDING') AS seg_or_null
         FROM customer
         ORDER BY seg_or_null ASC NULLS LAST, c_acctbal DESC, c_custkey
         LIMIT 200""",

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge
         FROM lineitem
         ORDER BY charge DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey
         LIMIT 20""",

    "q_set_union" ->
      """SELECT DISTINCT src, c_custkey FROM (
           SELECT 'building' AS src, c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION ALL
           SELECT 'rich' AS src, c_custkey FROM customer WHERE c_acctbal > 5000.0
           UNION ALL
           SELECT 'rich' AS src, c_custkey FROM customer WHERE c_acctbal > 7000.0)
         ORDER BY src, c_custkey""",

    "q_set_intersect" ->
      """SELECT p_partkey FROM (
           SELECT p_partkey FROM part WHERE p_size > 25
           INTERSECT
           SELECT l_partkey FROM lineitem)
         ORDER BY p_partkey""",

    "q_set_except" ->
      """SELECT c_custkey FROM (
           SELECT c_custkey FROM customer
           EXCEPT
           SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001)
         ORDER BY c_custkey""")

  /** All oracle strings, keyed like SparkEntry.queries. */
  def all: Map[String, String] = relational
}
