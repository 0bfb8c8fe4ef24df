package graft

import graft.queries.LlmOps
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Near-dup dedup correctness: planted-duplicate fixtures + full recall
  * equivalence against an exact all-pairs computation (SURVEY §5.2). */
class MinhashSpec extends AnyFunSuite {
  import SparkFixture._

  private def bigrams(t: String): Set[String] =
    t.toLowerCase.split(" ").sliding(2).map(_.mkString(" ")).toSet

  private def jaccardDist(a: String, b: String): Double = {
    val (sa, sb) = (bigrams(a), bigrams(b))
    1.0 - (sa & sb).size.toDouble / (sa | sb).size.toDouble
  }

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = "the quick brown fox jumps over the lazy cat near the old river bank today"
  private val unrelated = "completely different words about databases joins shuffles and partitions everywhere"

  test("minhashPairs finds the planted near-dup pair with its exact Jaccard") {
    import spark.implicits._
    val docs = Seq(
      (0L, base), (1L, nearDup), (2L, unrelated),
      (3L, "another unrelated document mentioning spark catalyst tungsten codegen stages tasks"),
    ).toDF("doc_id", "text")
    val got = LlmOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1, s"expected exactly the planted pair, got ${got.mkString(",")}")
    val (a, b, d) = got(0)
    assert((a, b) == (0L, 1L))
    val exp = BigDecimal(jaccardDist(base, nearDup))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(d - exp) < 1e-9, s"dist $d vs exact $exp")
  }

  test("minhashPairs == exact all-pairs result on the real sf0.001 corpus") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val got = LlmOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val local = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = (for {
      i <- local.indices; j <- (i + 1) until local.length
      d = jaccardDist(local(i)._2, local(j)._2) if d <= 0.5
      (a, b) = if (local(i)._1 < local(j)._1) (local(i)._1, local(j)._1)
               else (local(j)._1, local(i)._1)
    } yield (a, b, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(exp.nonEmpty, "corpus should contain planted near-dups")
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("ngram_hashes kernel: distinct chained hashes, null/short/empty edges, codegen") {
    import org.apache.spark.sql.graft.ColumnBridge
    import spark.implicits._
    def kernel(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.select(ColumnBridge.column(graft.functions.NgramHashes(
        ColumnBridge.expression(col("w")), n)).as("sh"))
    // Distinctness + window identity: identical windows collapse to one
    // hash; distinct windows get distinct hashes (w.h.p.).
    val rep = Seq(Tuple1(Seq("a", "b", "a", "b", "a", "b"))).toDF("w")
    val reps = kernel(rep, 3).head().getSeq[Long](0)
    assert(reps.length == 2, s"'a b a b a b' has 2 distinct trigrams, got $reps")
    // Shorter than n → empty (not a truncated gram — set semantics).
    assert(kernel(Seq(Tuple1(Seq("a", "b"))).toDF("w"), 3).head().getSeq[Long](0).isEmpty)
    assert(kernel(Seq(Tuple1(Seq.empty[String])).toDF("w"), 3).head().getSeq[Long](0).isEmpty)
    // Null words void exactly the windows containing them.
    val withNull = Seq(Tuple1(Seq("a", "b", null, "c", "d", "e"))).toDF("w")
    assert(kernel(withNull, 3).head().getSeq[Long](0).length == 1,
      "only the (c,d,e) window survives a null at position 2")
    // Same tokens ⇒ same hashes regardless of which row produced them
    // (pure function of the window's words).
    val two = Seq(Tuple1(Seq("x", "y", "z", "w")), Tuple1(Seq("y", "z", "w"))).toDF("w")
    val Array(h1, h2) = kernel(two, 3).collect().map(_.getSeq[Long](0).toSet)
    assert((h1 & h2).size == 1, s"shared (y,z,w) trigram must hash identically: $h1 / $h2")
    // SQL-registry surface: same kernel reachable from spark.sql text.
    Tables.prep(spark)
    val viaSql = spark.sql(
      "SELECT ngram_hashes(array('a','b','a','b','a','b'), 3) AS sh")
      .head().getSeq[Long](0)
    assert(viaSql.toSet == reps.toSet, "SQL-registered ngram_hashes diverged")
    assert(spark.sql("SELECT char_ngrams('abcd', 2) AS g").head().getSeq[String](0)
      == Seq("ab", "bc", "cd"))
    // Stays inside whole-stage codegen (literal inputs constant-fold to a
    // LocalTableScan, so probe the plan over a real scan).
    val plan = Tables.documents(spark, Sf0001)
      .select(ColumnBridge.column(graft.functions.NgramHashes(
        ColumnBridge.expression(split(lower(col("text")), " ")), 3)).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("ngram_hashes") && l.trim.startsWith("*(")),
      s"ngram_hashes Project not inside a codegen stage:\n$plan")
  }

  test("ngramJaccardPairs (prefix-filtered) == trigram all-pairs on the sf0.001 corpus") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val got = LlmOps.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Driver-side exact trigram Jaccard over every pair — validates both the
    // prefix-filter completeness (no candidate missed) and the refine math.
    def tris(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val local = docs.collect().map(r => (r.getLong(0), tris(r.getString(1))))
      .filter(_._2.nonEmpty)
    val exp = (for {
      i <- local.indices; j <- (i + 1) until local.length
      inter = (local(i)._2 & local(j)._2).size.toDouble
      uni = local(i)._2.size + local(j)._2.size - inter
      d = 1.0 - inter / uni if d <= 0.5
      (a, b) = if (local(i)._1 < local(j)._1) (local(i)._1, local(j)._1)
               else (local(j)._1, local(i)._1)
    } yield (a, b, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(exp.nonEmpty, "corpus should contain trigram near-dups")
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("ngramJaccardPairs degenerate corpus: identical docs route through the big-bucket path") {
    import spark.implicits._
    // 120 byte-identical docs: every posting bucket holds all 120, far past
    // the default bucketCap, so candidates flow through the AQE-splittable
    // self-join route; the ppjoin filters must keep every true pair
    // (identical docs have slack = min and pass trivially).
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = (0L until 120L).map(d => (d, text)).toDF("doc_id", "text")
    val got = LlmOps.ngramJaccardPairs(docs).collect()
    assert(got.length == 120 * 119 / 2, s"expected all C(120,2) pairs, got ${got.length}")
    assert(got.forall(_.getDouble(2) == 0.0), "identical docs must have distance 0")
  }

  test("cosineNearDupPairs finds exactly the planted embedding near-dups") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = LlmOps.plantedNearDupEmbeddings(emb)
    val got = SparkEntry.queries("q_dedup_embed")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Driver-side exact: every pair of the planted frame at cos >= 0.98.
    val vs = planted.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = (for {
      i <- vs.indices; j <- (i + 1) until vs.length
      if cos(vs(i)._2, vs(j)._2) >= 0.98
      (a, b) = if (vs(i)._1 < vs(j)._1) (vs(i)._1, vs(j)._1) else (vs(j)._1, vs(i)._1)
    } yield (a, b)).toSet
    assert(exp.nonEmpty, "planting should create near-dup pairs")
    assert(got == exp, s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    // And every pair is a planted (source, source + 1e6) pair, not noise.
    assert(got.forall { case (a, b) => b == a + 1000000L })
  }

  test("degenerate corpus: 1,000 identical docs route through the big-bucket self-join path and ALL pairs are reported") {
    import spark.implicits._
    // Every band bucket holds all 1,000 ids — far past DegenerateBucketCap,
    // so the collect_list + pair-explode path is bypassed entirely (no
    // 1,000-element array in one aggregation buffer, no C(1000,2) structs
    // from one row) and pairs come from the streaming self-join. The exact
    // answer is every pair at distance 0 — recall must not drop.
    val docs = (0L until 1000L).map(i => (i, base)).toDF("doc_id", "text")
    val pairs = LlmOps.minhashPairs(docs)
    assert(pairs.count() == 1000L * 999L / 2)
    assert(pairs.filter(col("jaccard_dist") =!= 0.0).count() == 0)
  }

  test("bucketCap routing does not change the result (planted mix, cap 2 vs huge)") {
    import spark.implicits._
    val docs = Seq(
      (0L, base), (1L, nearDup), (2L, unrelated),
      (3L, base), (4L, base),
      (5L, "another unrelated document mentioning spark catalyst tungsten codegen stages tasks"),
    ).toDF("doc_id", "text")
    def run(cap: Int) = LlmOps.minhashPairs(docs, bucketCap = cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBig = run(2)      // dup cluster {0,1,3,4} exceeds the cap
    val viaSmall = run(1000) // everything fits the explode path
    assert(viaBig == viaSmall && viaBig.nonEmpty)
  }

  test("MLlib MinHashLSH agrees on the planted pair (pipeline wrapper)") {
    import spark.implicits._
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
    val sh = LlmOps.shingles(docs)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh)
    val model = graft.ml.Pipelines.minhashLsh(feat, numTables = 8)
    val pairs = model.approxSimilarityJoin(feat, feat, 0.5, "jd")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id"), col("datasetB.doc_id"), col("jd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(math.abs(pairs(0)._3 - jaccardDist(base, nearDup)) < 1e-6)
  }

  test("staged pair artifact: equals the direct pipeline and is staged ONCE for both consumers") {
    import java.nio.file.{Files, Paths}
    // Throwaway replay root so this test owns the artifact's lifecycle.
    val prev = spark.conf.getOption("graft.replay.dir")
    val root = Files.createTempDirectory("minhash-staged-spec").toString
    spark.conf.set("graft.replay.dir", root)
    try {
      val direct = LlmOps.minhashPairs(
          Tables.documents(spark, Sf0001).select("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaArtifact = SparkEntry.queries("q_dedup_minhash")(spark, Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaArtifact == direct,
        "staged round trip changed the pair set")
      // Both graded consumers share ONE staging: the marker written by the
      // q_dedup_minhash run must be untouched after q_dedup_components.
      val marker = Paths.get(
        Tables.replayDir(spark, "minhash-pairs", Sf0001), ".staged")
      assert(Files.exists(marker), "artifact marker missing after staging")
      val stagedAt = Files.getLastModifiedTime(marker)
      assert(SparkEntry.queries("q_dedup_components")(spark, Sf0001).count() > 0)
      assert(Files.getLastModifiedTime(marker) == stagedAt,
        "q_dedup_components restaged the artifact instead of reusing it")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.replay.dir", v)
        case None => spark.conf.unset("graft.replay.dir")
      }
      Tables.deleteRecursively(root)
    }
  }

  test("incrementalDedupPairs: planted batch near-dup found via the corpus index") {
    import spark.implicits._
    val corpus = Seq((0L, base), (2L, unrelated)).toDF("doc_id", "text")
    val batch = Seq(
      (11L, nearDup),
      (12L, "spark streaming watermarks sessions state stores checkpoints and triggers"),
    ).toDF("doc_id", "text")
    val (meta, buckets) = LlmOps.corpusIndex(corpus)
    val got = LlmOps.incrementalDedupPairs(meta, buckets, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1, s"expected only the planted hit, got ${got.mkString(",")}")
    assert((got(0)._1, got(0)._2) == (0L, 11L))
    val exp = BigDecimal(jaccardDist(base, nearDup))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(0)._3 - exp) < 1e-9)
  }

  test("index append: corpus index + batch rows == index built from the union") {
    import spark.implicits._
    // The incremental op's amortization claim: accepting a batch means
    // APPENDING its meta/bucket rows to the stored index, not rebuilding.
    // Signatures are deterministic functions of the text, so the appended
    // index must equal the from-scratch index over corpus ∪ batch.
    val corpus = Seq((0L, base), (2L, unrelated)).toDF("doc_id", "text")
    val batch = Seq((11L, nearDup)).toDF("doc_id", "text")
    val (cMeta, cBuckets) = LlmOps.corpusIndex(corpus)
    val (bMeta, bBuckets) = LlmOps.corpusIndex(batch)
    val (fMeta, fBuckets) = LlmOps.corpusIndex(corpus.unionByName(batch))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(cMeta.unionByName(bMeta)) == rows(fMeta),
      "appended meta != from-scratch meta")
    assert(rows(cBuckets.unionByName(bBuckets)) == rows(fBuckets),
      "appended buckets != from-scratch buckets")
  }

  test("q_dedup_incremental == exact batch-x-corpus answer on the real sf0.001 corpus") {
    val got = SparkEntry.queries("q_dedup_incremental")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val local = Tables.documents(spark, Sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (batch, corpus) = local.partition(_._1 % 10 == 3)
    val exp = (for {
      (cid, ct) <- corpus; (bid, bt) <- batch
      d = jaccardDist(ct, bt) if d <= 0.5
    } yield (cid, bid,
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(exp.nonEmpty, "corpus should contain cross-split near-dups")
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("stored index layout: an ingest probe never exchanges the index side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // The claim stagedCorpusIndex's layout exists for: per-ingest cost is
    // O(batch + hits) IN SHUFFLE TERMS too — the stored postings and
    // per-doc records scan pre-partitioned on their join keys and are
    // never exchanged; only batch-derived rows (probe signatures,
    // candidates) move. Broadcasts forced OFF (static threshold also
    // seeds AQE's; gate=0 kills the batch-meta hint) — the degraded
    // regime where the only way the index sides avoid moving is the
    // bucketed layout itself.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (meta, buckets) = LlmOps.stagedCorpusIndex(spark, Sf0001)
      val batch = Tables.documents(spark, Sf0001)
        .filter(col("doc_id") % 10 === 3).select("doc_id", "text")
      val df = LlmOps.incrementalDedupPairs(meta, buckets, batch,
        broadcastGateBytes = 0L)
      // Degraded-regime rows == the graded key's gated-broadcast rows.
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val viaGate = SparkEntry.queries("q_dedup_incremental")(spark, Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == viaGate, "degraded regime changed the pair set")
      val plan = PlanCheck.finalPlan(df)
      val nBucketed = PlanCheck.flatten(plan).count {
        case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
        case _ => false
      }
      assert(nBucketed == 2,
        s"expected both index scans to read the bucketed layout in:\n$plan")
      // A bucketed index scan must feed its consuming join with NO
      // exchange in between (exchanges elsewhere — e.g. the candidate
      // distinct — carry batch-derived rows and are expected). `dirty`
      // = an exchange sits on the path since the nearest join above.
      def indexMoved(p: SparkPlan, dirty: Boolean): Boolean = p match {
        case q: QueryStageExec => indexMoved(q.plan, dirty)
        case j: BaseJoinExec => j.children.exists(indexMoved(_, false))
        case e: ShuffleExchangeLike => e.children.exists(indexMoved(_, true))
        case s: FileSourceScanExec if s.relation.bucketSpec.isDefined => dirty
        case other => other.children.exists(indexMoved(_, dirty))
      }
      assert(!indexMoved(plan, dirty = false),
        s"an index-side scan was exchanged before its join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      graft.operators.ScaleOps.releaseTracked()
    }
  }

  test("canonical selection keeps the max-quality member of every cluster (min-id on ties)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_dedup_canonical")(spark, Sf0001).collect()
    assert(got.nonEmpty)
    // Brute-force twin: cluster membership from the graded components,
    // quality recomputed per member, argmax on (quality desc, id asc).
    val labels = graft.operators.Components.connectedComponents(
      graft.queries.LlmOps.stagedMinhashPairs(spark, Sf0001), "doc_a", "doc_b")
    val q = Tables.documents(spark, Sf0001).select(col("doc_id"),
      graft.text.TextOps.qualityScore(col("text")).as("quality"))
    val members = labels.join(q, labels("id") === q("doc_id"))
      .select(col("comp"), col("id"), col("quality"))
      .collect().groupBy(_.getLong(0))
    assert(got.length == members.size)
    for (r <- got) {
      val (comp, keepDoc, keepQ, nDocs, nDropped) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      val m = members(comp)
      val best = m.minBy(x => (-x.getDouble(2), x.getLong(1)))
      assert(keepDoc == best.getLong(1) && keepQ == best.getDouble(2),
        s"cluster $comp kept $keepDoc, expected ${best.getLong(1)}")
      assert(nDocs == m.length && nDropped == m.length - 1)
    }
  }
}
