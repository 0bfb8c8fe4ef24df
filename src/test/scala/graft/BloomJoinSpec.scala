package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** operators/BloomJoin.prefilter: the reduction must be semantically
  * invisible (no false negatives; false positives die in the real join),
  * visible in the executed plan, and gated. */
class BloomJoinSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def fact = Tables.lineitem(spark, SparkFixture.Sf0001)
    .select(col("l_orderkey"), col("l_extendedprice"))
  private def dim = Tables.orders(spark, SparkFixture.Sf0001)
    .filter(col("o_totalprice") > 200000.0).select(col("o_orderkey"))

  test("no false negatives: every fact row with a dim key survives the probe") {
    val matching = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val reduced = BloomJoin.prefilter(fact, "l_orderkey", dim)
    // probe-survivors ⊇ true matches, and the reduction actually reduces
    // (fpp 0.01 on this selectivity cannot keep the whole fact).
    assert(reduced.count() >= matching.count())
    assert(reduced.count() < fact.count())
    assert(matching.join(reduced, Seq("l_orderkey", "l_extendedprice"), "left_anti").count() == 0)
  }

  test("q_join_bloom equals its unfiltered twin bit-for-bit") {
    val bloom = queries.Relational.qJoinBloom(spark, SparkFixture.Sf0001).collect()
    val twin = {
      val cust = Tables.customer(spark, SparkFixture.Sf0001)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val keys = Tables.orders(spark, SparkFixture.Sf0001)
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      Tables.lineitem(spark, SparkFixture.Sf0001)
        .join(keys, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          graft.functions.Det.dsum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_returnflag").collect()
    }
    assert(bloom.toSeq == twin.toSeq)
  }

  test("the probe is in the executed plan; gates escalate then fall back") {
    val reduced = BloomJoin.prefilter(fact, "l_orderkey", dim)
    assert(PlanCheck.flatten(PlanCheck.finalPlan(reduced))
      .exists(_.toString.contains("bloom_might_contain")))
    // Above the key cap the build ESCALATES: still a filter (the default
    // 16 MiB budget affords a tiny fpp for this dim), still no false
    // negatives.
    val escalated = BloomJoin.prefilter(fact, "l_orderkey", dim, maxBuildKeys = 1L)
    assert(PlanCheck.flatten(PlanCheck.finalPlan(escalated))
      .exists(_.toString.contains("bloom_might_contain")))
    val matching = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(matching.join(escalated, Seq("l_orderkey", "l_extendedprice"), "left_anti").count() == 0)
    // Past the escalation budget's useful fpp (1 byte over thousands of
    // keys), and on an empty build side, the operator must be an identity —
    // not a degraded filter that passes everything at real probe cost.
    val exhausted = BloomJoin.prefilter(fact, "l_orderkey", dim,
      maxBuildKeys = 1L, escalationBudgetBytes = 1L)
    assert(!PlanCheck.flatten(PlanCheck.finalPlan(exhausted))
      .exists(_.toString.contains("bloom_might_contain")))
    val empty = BloomJoin.prefilter(fact, "l_orderkey", dim.filter(lit(false)))
    assert(!PlanCheck.flatten(PlanCheck.finalPlan(empty))
      .exists(_.toString.contains("bloom_might_contain")))
  }

  test("non-integral join keys are rejected, not silently cast") {
    // A lossy cast (string → long) nulls out unparseable keys and the probe
    // would DROP rows the real join matches — the operator must throw.
    val strDim = dim.select(col("o_orderkey").cast("string").as("k"))
    assertThrows[IllegalArgumentException] {
      BloomJoin.prefilter(fact, "l_orderkey", strDim)
    }
    val strFact = fact.select(col("l_orderkey").cast("string").as("l_orderkey"))
    assertThrows[IllegalArgumentException] {
      BloomJoin.prefilter(strFact, "l_orderkey", dim)
    }
  }

  test("a NULL serialized-filter literal yields null, not an NPE") {
    // bloom_might_contain is registered session-wide; arbitrary SQL can
    // hand it a null filter — both codegen and interpreted paths must
    // treat that as null-in-null-out.
    graft.functions.BloomMightContain.register(spark)
    val sqlRows = spark.sql(
      "SELECT bloom_might_contain(CAST(7 AS BIGINT), CAST(NULL AS BINARY)) AS r"
    ).collect()
    assert(sqlRows.head.isNullAt(0))
    val interp = graft.functions.BloomMightContain(
      Literal(7L), Literal(null, org.apache.spark.sql.types.BinaryType))
    assert(interp.eval(null) == null)
  }

  test("interpreted eval agrees with the filter (codegen-off twin)") {
    val bf = dim.select(col("o_orderkey").cast("long").as("k"))
      .stat.bloomFilter("k", 1000L, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val keys = dim.as[Long].collect()
    val expr = graft.functions.BloomMightContain(
      Literal(keys.head), Literal(bytes))
    assert(expr.eval(null) == true)
    // null key → null out (dropped by a Filter, matching inner-join loss)
    val nullExpr = graft.functions.BloomMightContain(
      Literal(null, org.apache.spark.sql.types.LongType), Literal(bytes))
    assert(nullExpr.eval(null) == null)
  }
}
