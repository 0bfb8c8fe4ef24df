package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 operator cross-checks: weighted SSSP vs a brute-force Bellman-Ford,
  * BM25 vs an exact driver-side recomputation (same JVM ln / HALF_UP
  * rounding / decimal-sum semantics as the engine), and RRF fusion
  * re-derived from its own legs. sf0.001 keeps every collect tiny. */
class R16OpsSpec extends AnyFunSuite {
  import SparkFixture._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Det.dsum(scale 6) reproduced exactly: each double → DECIMAL(38,10),
    * exact sum, HALF_UP round to 6, through the scaled-long division. */
  private def dsum6(xs: Seq[Double]): Double = {
    val s = xs.map(BigDecimal(_).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
    s.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(1000000)).toLongExact / 1000000.0
  }

  test("q_graph_sssp equals a brute-force Bellman-Ford over the same pruned weighted graph") {
    import org.apache.spark.sql.expressions.Window
    // Rebuild the pruned weighted entity graph exactly as the query does.
    val e0 = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, Sf0001).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, Sf0001).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, Sf0001).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("s_nationkey").cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
    val wTop = Window.partitionBy(col("src")).orderBy(col("w").desc, col("dst"))
    val edges = e0.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 3)
      .select(col("src"), col("dst"), (lit(1L) + col("w") % 5L).as("cost"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seed = Tables.supplier(spark, Sf0001)
      .orderBy(col("s_suppkey")).limit(1)
      .select(col("s_nationkey").cast("long")).head().getLong(0)
    // Bellman-Ford: |V| relaxation sweeps — a different algorithm from the
    // query's Dijkstra, same answer on positive costs.
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var dist = Map(seed -> 0L)
    for (_ <- nodes.indices) {
      for ((u, v, c) <- edges; du <- dist.get(u))
        if (du + c < dist.getOrElse(v, Long.MaxValue)) dist += v -> (du + c)
    }
    val got = SparkEntry.queries("q_graph_sssp")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == dist, s"sssp drift: got $got vs brute $dist")
    // Weighted costs must respect the hop structure: hops <= cost <= 5*hops.
    val hops = SparkEntry.queries("q_graph_reachability")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == hops.keySet, "sssp and BFS must reach the same set")
    for ((n, c) <- got; h = hops(n))
      assert(h <= c && c <= 5 * h, s"node $n: cost $c outside [$h, ${5 * h}]")
  }

  /** Exact driver-side BM25 over the collected corpus — same tokenizer
    * (split on single space, interior+trailing empties kept), same JVM ln,
    * same rounding and decimal sum as the engine. */
  private lazy val bm25Brute: Map[Long, Seq[(Long, Double, Long)]] = {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (d, t) =>
      t.toLowerCase.split(" ", -1).map(term => (d, term))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dl = tf.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    val n = docs.length.toDouble
    val avgdl = dl.values.sum.toDouble / n
    val df = tf.groupBy(_._1._2).map { case (t, m) => t -> m.size.toLong }
    val qids = docs.map(_._1).filter(_ <= 4)
    qids.map { qid =>
      val qterms = tf.keys.filter(_._1 == qid).map(_._2).toSet
      val contribs = tf.toSeq.collect {
        case ((d, term), f) if d != qid && qterms(term) =>
          val idf = math.log(1.0 + (n - df(term).toDouble + 0.5) / (df(term).toDouble + 0.5))
          val tfc = f.toDouble * (1.2 + 1.0) /
            (f.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * dl(d).toDouble / avgdl))
          (d, round6(idf * tfc))
      }
      val scored = contribs.groupBy(_._1).map { case (d, cs) =>
        (d, dsum6(cs.map(_._2)), cs.length.toLong)
      }.toSeq
      qid -> scored.sortBy { case (d, s, _) => (-s, d) }.take(10)
    }.toMap
  }

  test("q_text_bm25 equals the exact driver-side BM25 (same ln, rounding, decimal sum)") {
    val got = SparkEntry.queries("q_text_bm25")(spark, Sf0001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1))
          .map(r => (r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
      }
    assert(got.keySet == bm25Brute.keySet)
    for ((q, rows) <- got)
      assert(rows == bm25Brute(q), s"qid $q: $rows vs brute ${bm25Brute(q)}")
  }

  test("q_sim_hybrid_rrf: fused scores re-derive from the leg ranks; dense leg matches brute cosine") {
    val got = SparkEntry.queries("q_sim_hybrid_rrf")(spark, Sf0001).collect()
    assert(got.nonEmpty)
    // Fused score is exactly 1/(60+dr) + 1/(60+sr) with absent legs = 0.
    for (r <- got) {
      val dr = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val sr = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(dr.isDefined || sr.isDefined, "a fused row must come from a leg")
      val exp = round6(dr.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        sr.map(x => 1.0 / (60.0 + x)).getOrElse(0.0))
      assert(r.getDouble(5) == exp, s"row $r: rrf ${r.getDouble(5)} != $exp")
    }
    // Per qid: ranks are 1..k and fused scores non-increasing.
    for ((_, rows) <- got.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getDouble(5)).toSeq
      assert(scores == scores.sorted.reverse, s"fused scores not ranked: $scores")
    }
    // Dense leg cross-check: brute cosine ranks over collected embeddings.
    val emb = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val denseBrute = (0L to 4L).map { qid =>
      val ranked = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, round6(cos(v, emb(qid)))) }
        .sortBy { case (id, c) => (-c, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      qid -> ranked
    }.toMap
    for (r <- got if !r.isNullAt(3)) {
      val exp = denseBrute(r.getLong(0))(r.getLong(2))
      assert(r.getLong(3) == exp,
        s"qid ${r.getLong(0)} id ${r.getLong(2)}: dense rank ${r.getLong(3)} != brute $exp")
    }
  }
}
