package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star list):
  * BPE-ish tokenization, quality scoring, SimHash near-dup, winnowing
  * fingerprints, n-gram language ID. All pure column expressions /
  * relational plans — no UDFs, so everything stays codegen-friendly and
  * scales as ordinary narrow maps + keyed aggregations.
  */
object TextOps {

  // ------------------------------------------------------------- tokenizing

  /** GPT2-flavoured pre-tokenizer regex (simplified): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. */
  val BpeIshPattern: String =
    "('(?:s|t|re|ve|m|ll|d))|( ?[a-zA-Z]+)|( ?[0-9]+)|( ?[^a-zA-Z0-9\\s]+)"

  /** BPE-ish word pieces of a text column. */
  def tokensBpeIsh(text: Column): Column =
    regexp_extract_all(text, lit(BpeIshPattern), lit(0))

  def tokenCountBpeIsh(text: Column): Column =
    size(tokensBpeIsh(text)).cast("long")

  /** Whitespace token count (the cheap path). */
  def tokenCountWs(text: Column): Column =
    size(split(text, "\\s+")).cast("long")

  // -------------------------------------------------------- quality scoring

  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "in", "to", "is")

  /** Heuristic document quality in [0, 1]: length sweet-spot, alphabetic
    * ratio, non-degenerate stopword fraction, mean-word-length sanity.
    * Deterministic closed-form — rank cutoffs for corpus filtering. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / lit(200.0), lit(1.0)) // ramps to 1 at 200 chars
    val alpha = length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double") /
      greatest(len, lit(1.0))
    val toks = split(lower(text), "\\s+")
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    // Occurrence count, not set intersection — a 2000-token natural doc has
    // hundreds of stopword TOKENS even though only ~9 distinct ones exist.
    val stopFrac = size(filter(toks,
      t => array_contains(array(Stopwords.map(lit): _*), t))).cast("double") / nTok
    // Natural text has SOME stopwords but isn't all stopwords.
    val stopScore = when(stopFrac.between(0.01, 0.6), lit(1.0)).otherwise(lit(0.4))
    val meanWord = len / nTok
    val wordScore = when(meanWord.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.3))
    round(lit(0.3) * lenScore + lit(0.3) * alpha +
      lit(0.2) * stopScore + lit(0.2) * wordScore, 6)
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: each token votes ±1 per bit of
    * its xxhash64; bits with positive tallies are set. ONE native codegen'd
    * pass per document (functions/SimHash.scala) — the interpreted HOF fold
    * it replaces re-folded the token array once per bit (64 × tokens lambda
    * dispatches; the same anti-pattern minhash_sig eliminated for a
    * measured 40%+ win). Values are bit-identical to the fold — asserted in
    * TextOpsSpec against [[simhash64Hof]]. */
  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    // Direct expression construction — no SQL-parser round trip (which broke
    // for computed/aliased child columns) and no SparkSession.active
    // registration side effect at column-construction time.
    ColumnBridge.column(graft.functions.SimHash64(
      ColumnBridge.expression(split(lower(text), "\\s+"))))
  }

  /** The superseded interpreted HOF formulation, kept ONLY as the
    * independent cross-check for the native kernel (TextOpsSpec asserts
    * bit-equality on the corpus). Bit assembly uses bitwise OR of shifted
    * single bits (never arithmetic on the packed value, which would
    * overflow the signed long at bit 63). */
  private[graft] def simhash64Hof(text: Column): Column = {
    val t = text.toString
    expr(
      s"""aggregate(
            transform(sequence(0, 63), b -> struct(b AS b,
              aggregate(split(lower($t), '\\\\s+'), 0L, (acc, tok) ->
                acc + CASE WHEN (shiftright(xxhash64(tok), cast(b AS INT)) & 1L) = 1L
                           THEN 1L ELSE -1L END) AS v)),
            cast(0 AS BIGINT),
            (acc, s) -> acc | CASE WHEN s.v > 0L THEN shiftleft(1L, cast(s.b AS INT)) ELSE 0L END)""")
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxHamming (≤ 3 by
    * default). Pigeonhole banding: split the 64-bit hash into 4 16-bit
    * bands — any pair within Hamming 3 shares at least one full band, so a
    * 4-way band bucket join finds all such pairs without an all-pairs scan
    * (same 100 TB shape as the MinHash pipeline; exact Hamming refine via
    * bit_count(xor)). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4 bands pigeonhole only Hamming <= 3")
    val in = graft.operators.ScaleOps.parallelizeSmall(docs)
    val withH = in.select(col("doc_id"), simhash64(col("text")).as("sh"))
    val bands = withH.select(col("doc_id"), col("sh"), explode(expr(
      "transform(sequence(0, 3), b -> struct(b AS band, shiftright(sh, cast(b * 16 AS INT)) & 65535L AS key))"))
      .as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sh ^ b.sh)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // --------------------------------------------- winnowing fingerprints

  /** Winnowing document fingerprints (the rolling-hash scheme used for
    * near-dup/plagiarism detection): hash every k-gram of tokens, slide a
    * window of w hashes, keep each window's minimum — guarantees any
    * shared run of ≥ w + k - 1 tokens yields a shared fingerprint. Built
    * relationally: explode positions, window-function min per sliding
    * frame, distinct. */
  def fingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val in = graft.operators.ScaleOps.parallelizeSmall(docs)
    val toks = in.select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= k)
    val grams = toks.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(1, size(t) - ${k - 1}), i -> xxhash64(concat_ws(' ', slice(t, i, $k))))"))
      .as(Seq("pos", "h")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      // frame min FIRST (over every gram), THEN keep only full windows
      .withColumn("fp", min(col("h")).over(win))
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("n_grams") - w)
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  // ------------------------------------------------------ n-gram language ID

  /** Character n-grams of a (lowercased, space-collapsed) text column. */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    // ONE native linear pass (functions/CharNgrams). The r1–r6 HOF
    // formulation (transform(sequence(1, len-n+1), i -> substring(t, i, n)))
    // was quadratic per row twice over: an interpreted lambda per position
    // AND substring's byte-0 rescan per extraction (UTF-8 is variable-width)
    // — measured as the dominant ~4 s of q_text_langid at sf0.1. Values are
    // bit-identical to the fold — asserted in TextOpsSpec vs charNgramsHof.
    ColumnBridge.column(graft.functions.CharNgrams(
      ColumnBridge.expression(lower(text)), n))
  }

  /** The superseded HOF formulation, kept ONLY as the independent
    * cross-check for the native kernel (TextOpsSpec asserts bit-equality,
    * including the shorter-than-n and empty-string edge rule). */
  private[graft] def charNgramsHof(text: Column, n: Int): Column =
    transform(array(lower(text)), t =>
      transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => t.substr(i, lit(n)))).getItem(0)

  /** N-gram-profile language ID (the classic heuristic): build per-language
    * top-`topN` character-trigram profiles from `train` (lang, text), then
    * classify each `test` (doc_id, text) document to the language whose
    * profile covers the largest share of its trigram occurrences.
    * Profiles are a tiny broadcast table; classification is one explode +
    * one broadcast join + one argmax window. */
  def langIdNGram(train: DataFrame, test: DataFrame,
                  n: Int = 3, topN: Int = 200): DataFrame = {
    import graft.operators.ScaleOps.parallelizeSmall
    val trainGrams = parallelizeSmall(train)
      .select(col("lang"), explode(charNgrams(col("text"), n)).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
    val testGrams = parallelizeSmall(test)
      .select(col("doc_id"), explode(charNgrams(col("text"), n)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    classifyGrams(trainGrams, testGrams, test.select(col("doc_id")).distinct(), topN)
  }

  /** Self-classification (train == test == the corpus — the declared
    * q_text_langid shape): the gram explode is THE cost of language ID, and
    * the generic two-frame API pays it twice over the same rows. Here the
    * corpus is exploded ONCE into per-(doc, lang, gram) counts; the
    * language profile is a re-aggregation of that same frame (the shuffle
    * output is shared via ReusedExchange), and classification consumes it
    * directly. Same answer as langIdNGram(docs, docs) — lang is functionally
    * determined by doc_id, so summing per-doc counts per (lang, g) equals
    * counting the exploded grams per (lang, g). */
  def langIdSelf(docs: DataFrame, n: Int = 3, topN: Int = 200): DataFrame = {
    import graft.operators.ScaleOps.{parallelizeSmall, persistIfBig}
    // The gram table is consumed TWICE (profile re-agg + classification),
    // and DataFrame reuse duplicates the logical subtree (2 Generate
    // nodes, 0 ReusedExchange measured) — so above the persist gate the
    // compact per-doc gram counts are cached rather than re-exploding a
    // corpus-sized text scan; below it the duplicated explode is cheaper
    // than the cache round-trip (both measured at sf0.1 — see persistIfBig).
    val docGrams = persistIfBig(parallelizeSmall(docs)
      .select(col("doc_id"), col("lang"), explode(charNgrams(col("text"), n)).as("g"))
      .groupBy(col("doc_id"), col("lang"), col("g")).agg(count(lit(1)).as("c")),
      gate = docs)
    val trainGrams = docGrams.groupBy(col("lang"), col("g")).agg(sum(col("c")).as("c"))
    val testGrams = docGrams.select(col("doc_id"), col("g"), col("c"))
    classifyGrams(trainGrams, testGrams, docs.select(col("doc_id")).distinct(), topN)
  }

  /** Shared tail of the language-ID pipelines: rank per-language gram
    * counts into top-`topN` profiles (tiny, broadcast), score each document
    * by profile coverage, argmax per doc, 'und' fallback for documents
    * overlapping no profile. */
  private def classifyGrams(trainGrams: DataFrame, testGrams: DataFrame,
                            allDocIds: DataFrame, topN: Int): DataFrame = {
    val rankW = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))
    val profile = trainGrams
      .withColumn("r", row_number().over(rankW))
      .filter(col("r") <= topN)
      .select(col("lang"), col("g"))
    val scored = testGrams.join(broadcast(profile), "g")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("score"))
    val pickW = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang"))
    val picked = scored
      .withColumn("r", row_number().over(pickW))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
    // Documents overlapping NO profile (unseen script, too-short text) must
    // not vanish: surface them as "und" with score 0.
    allDocIds
      .join(picked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
      .orderBy("doc_id")
  }
}
