package graft

import graft.queries.LlmOps
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data text operators: tokenization, quality, SimHash, winnowing
  * fingerprints, n-gram language ID, embedding-cosine near-dup. */
class TextOpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("BPE-ish tokenizer splits contractions, numbers, punctuation") {
    import spark.implicits._
    val df = Seq("it's 42 spark-jobs, really!").toDF("text")
    val toks = df.select(TextOps.tokensBpeIsh(col("text"))).collect()(0).getSeq[String](0)
    assert(toks == Seq("it", "'s", " 42", " spark", "-", "jobs", ",", " really", "!"))
    assert(df.select(TextOps.tokenCountBpeIsh(col("text"))).collect()(0).getLong(0) == 9L)
    assert(df.select(TextOps.tokenCountWs(col("text"))).collect()(0).getLong(0) == 4L)
  }

  test("quality score ranks natural text above degenerate text") {
    import spark.implicits._
    val natural = "the quick brown fox jumps over a lazy dog and runs to the old river bank " * 3
    val degenerate = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) ____"
    val df = Seq(("nat", natural), ("deg", degenerate)).toDF("id", "text")
      .select(col("id"), TextOps.qualityScore(col("text")).as("q"))
    val q = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q("nat") > 0.8, s"natural text scored ${q("nat")}")
    assert(q("deg") < 0.6, s"degenerate text scored ${q("deg")}")
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("SimHash: identical texts collide, near-dups are close, others far") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val near = base.replace("dog", "cat")
    val far = "completely different words about databases joins shuffles partitions everywhere"
    val df = Seq((0L, base), (1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val h = df.select(col("doc_id"), TextOps.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L), "identical texts must produce identical simhash")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(2L)) <= 12, s"near-dup hamming ${hamming(h(0L), h(2L))}")
    assert(hamming(h(0L), h(3L)) > 12, s"unrelated hamming ${hamming(h(0L), h(3L))}")

    val pairs = TextOps.simhashPairs(df, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("native simhash64 kernel bit-matches the interpreted HOF fold on the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
      // Edge inputs the corpus lacks: empty string, single token, repeated
      // token, punctuation-only, multi-space runs.
      .unionAll(Seq((100001L, ""), (100002L, "one"), (100003L, "dup dup dup"),
        (100004L, "@@@ !!!"), (100005L, "a  b   c")).toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      TextOps.simhash64(col("text")).as("native"),
      TextOps.simhash64Hof(col("text")).as("hof"))
    val diff = both.filter(col("native") =!= col("hof")).count()
    assert(diff == 0L, s"$diff documents diverge between native and HOF simhash")
  }

  test("native char_ngrams kernel bit-matches the substring HOF on corpus + edges") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
      // Edge inputs: empty (one "" gram), shorter-than-n (one truncated
      // gram), exactly n, multi-byte UTF-8 codepoints, uppercase folding.
      .unionAll(Seq((200001L, ""), (200002L, "ab"), (200003L, "abc"),
        (200004L, "héllo wörld"), (200005L, "ÄÖÜß€漢字テスト"),
        (200006L, "MiXeD CaSe")).toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      graft.text.TextOps.charNgrams(col("text"), 3).as("native"),
      graft.text.TextOps.charNgramsHof(col("text"), 3).as("hof"))
    val diff = both.filter(not(col("native") <=> col("hof"))).count()
    assert(diff == 0L, s"$diff documents diverge between native and HOF char_ngrams")
    // And the kernel sits inside whole-stage codegen (no fallback to eval)
    // — asserted on a native-only projection: the HOF twin above never
    // codegens (lambdas don't), which would break any stage containing it.
    val plan = Tables.documents(spark, Sf0001)
      .select(graft.text.TextOps.charNgrams(col("text"), 3))
      .queryExecution.executedPlan.toString
    // A leading `*(n)` marks an operator inside a WholeStageCodegen stage.
    assert(plan.linesIterator.exists(l => l.contains("char_ngrams") && l.trim.startsWith("*(")),
      s"char_ngrams Project not inside a codegen stage:\n$plan")
  }

  test("winnowing fingerprints: shared token runs share prints; disjoint do not") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"intro words then $shared and a tail"
    val b = s"other opening $shared closing remarks here"
    val c = "nothing in common with anything else at all whatsoever"
    val df = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val fp = TextOps.fingerprints(df, k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((fp(0L) & fp(1L)).nonEmpty, "docs sharing an 8-token run must share a fingerprint")
    assert((fp(0L) & fp(2L)).isEmpty && (fp(1L) & fp(2L)).isEmpty)
    // Deterministic across partitionings.
    val fp2 = TextOps.fingerprints(df.repartition(5), k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fp2 == fp.toSeq.flatMap { case (id, s) => s.map(id -> _) }.toSet)
  }

  test("n-gram language ID separates distinct-alphabet fixtures and runs on the corpus") {
    import spark.implicits._
    // Two synthetic "languages" with disjoint character statistics.
    val aa = Seq.tabulate(12)(i => ("aa", s"aba bab abba babba abab bba ab$i"))
    val bb = Seq.tabulate(12)(i => ("bb", s"xyz zyx xzy yxz zxy xyzzy zy$i"))
    val train = (aa ++ bb).toDF("lang", "text")
    val test = Seq((0L, "abba bab aba abab"), (1L, "zyx xyz zxy yxz"), (2L, "ab ba abba"))
      .toDF("doc_id", "text")
    val pred = TextOps.langIdNGram(train, test, n = 3, topN = 50).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(0L -> "aa", 1L -> "bb", 2L -> "aa"), pred.toString)
    // Real corpus: classifies every document deterministically.
    val docs = Tables.documents(spark, Sf0001)
    val p1 = TextOps.langIdNGram(docs.select(col("lang"), col("text")),
      docs.select(col("doc_id"), col("text"))).collect().map(_.toSeq).toSet
    assert(p1.size == 500)
  }

  test("embedding-cosine near-dup finds exactly the planted scaled+noised pairs") {
    Tables.prep(spark)
    val emb = Tables.embeddings(spark, Sf0001).select(col("vec_id"), col("embedding"))
    // Plant: for vec_id < 15, a copy at id+1000, scaled and slightly rotated
    // (deterministic per-index perturbation) → cosine ≈ 0.999+.
    val planted = emb.filter(col("vec_id") < 15)
      .select((col("vec_id") + 1000).as("vec_id"),
        expr("transform(embedding, (x, i) -> double(x) * 1.1 + 0.0005 * cos(double(i)))").as("embedding"))
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .unionAll(planted)
    val pairs = LlmOps.cosineNearDupPairs(all, minCos = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      (0L until 15L).map(i => (i, i + 1000)).toSet,
      s"got ${pairs.mkString(",")}")
    assert(pairs.forall(_._3 >= 0.99))
  }

  test("BPE pair counts match a hand-computed planted corpus") {
    import spark.implicits._
    // "ab ab aba" + "Ab" → lowercased words: ab×3 (two + one from doc 2),
    // aba×1. Pairs: ab → {a b, b </w>} ×3; aba → {a b, b a, a </w>} ×1.
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-spec")
    try {
      Seq((1L, "ab ab aba", "en", "s", 9L), (2L, "Ab", "en", "s", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(dir.resolve("documents.parquet").toString)
      val got = SparkEntry.queries("q_text_bpe_pairs")(spark, dir.toString)
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      assert(got == List(("a b", 4L), ("b </w>", 3L), ("a </w>", 1L), ("b a", 1L)),
        s"got $got")
    } finally Tables.deleteRecursively(dir.toString)
  }
}
