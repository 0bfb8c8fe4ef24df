package graft.queries

import graft.Tables
import graft.functions.Det.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar / array / JSON / generator function contract — SURVEY.md §2.8.
  *
  * Dialect-parity notes baked in: substring is 1-based in both engines;
  * DuckDB lists are 1-indexed where Spark arrays are 0-indexed; transcendental
  * outputs (ln/exp/sqrt) are rounded to 6 dp (libm agreement is ~1 ulp,
  * far inside the rounding step); higher-order array folds run left-to-right
  * in both engines and are written with identical operation order.
  */
object Functions {

  type Q = (SparkSession, String) => DataFrame

  /** String function battery over customer. */
  val qStrFuncs: Q = (s, dir) =>
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        lower(col("c_mktsegment")).as("lo_seg"),
        substring(col("c_name"), 10, 4).as("sub_name"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
        length(col("c_name")).cast("long").as("name_len"),
        regexp_replace(col("c_name"), lit("Customer#"), lit("C-")).as("repl_name"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("joined"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("extracted_id"))
      .orderBy("c_custkey")

  /** Datetime function battery over orders (UTC pinned both engines). */
  val qDateFuncs: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3d"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        last_day(col("o_orderdate").cast("date")).cast("timestamp").as("month_end"))
      .orderBy("o_orderkey")

  /** Math function battery over part (2000 rows — small surface for the
    * transcendental-rounding risk discussed above). */
  val qMathFuncs: Q = (s, dir) =>
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        round(col("p_retailprice"), 1).as("r1"),
        floor(col("p_retailprice")).cast("long").as("fl"),
        ceil(col("p_retailprice")).cast("long").as("ce"),
        abs(lit(25) - col("p_size")).cast("long").as("ab"),
        round(sqrt(col("p_retailprice")), 6).as("sq"),
        round(log(col("p_retailprice")), 6).as("lg"),
        round(exp(col("p_size").cast("double") / lit(10.0)), 6).as("ex"),
        pow(col("p_size").cast("double"), 2).as("pw"),
        (col("p_partkey") % 97).cast("long").as("md"),
        signum(col("p_size").cast("double") - lit(25.0)).cast("long").as("sg"))
      .orderBy("p_partkey")

  /** Array surface over embeddings: size, element access, slice, and
    * higher-order transform/aggregate (L2 norm of the first 4 dims).
    * Floats are widened to double BEFORE any arithmetic on both sides.
    *
    * The output is all-scalar on purpose: the driver's canonicalizer
    * row-sorts with pandas and cannot hash a top-level array column, so the
    * slice/transform coverage is surfaced as four scalar head columns and a
    * transform-inside-aggregate fold instead of an array-typed column. */
  val qArrayFuncs: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(col("embedding")(0).cast("double"), 6).as("h0"),
        round(col("embedding")(1).cast("double"), 6).as("h1"),
        round(col("embedding")(2).cast("double"), 6).as("h2"),
        round(col("embedding")(3).cast("double"), 6).as("h3"),
        round(expr(
          "sqrt(aggregate(transform(slice(embedding, 1, 4), x -> double(x) * double(x)), 0D, (s, x) -> s + x))"),
          6).as("l2_head4"))
      .orderBy("vec_id")

  /** JSON extraction + aggregation: props is `{"k": <int>}`. */
  val qJsonFuncs: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
      .orderBy("k_mod")

  /** Map construction. Entries are sorted before map_from_entries so the
    * result is deterministic; the map itself is oracle-checked through its
    * sorted-entry JSON serialization (DuckDB rebuilds the same string with
    * an ordered string_agg — MAP literals themselves aren't portable). */
  val qMapFuncs: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n")))))
        .as("type_counts"))
      .select(
        col("user_id"),
        size(col("type_counts")).cast("long").as("n_types"),
        to_json(col("type_counts")).as("type_counts_json"),
        coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("n_click"),
        coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("n_purchase"))
      .orderBy("user_id")

  /** Word count — the canonical MapReduce program, as a generator (explode ≡
    * UDTF surface). Map-side partial aggregation replaces the reference's
    * combiner; top-20 via TakeOrderedAndProject. */
  val qExplodeTokens: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val queries: Map[String, Q] = Map(
    "q_str_funcs" -> qStrFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_array_funcs" -> qArrayFuncs,
    "q_json_funcs" -> qJsonFuncs,
    "q_map_funcs" -> qMapFuncs,
    "q_explode_tokens" -> qExplodeTokens)
}
