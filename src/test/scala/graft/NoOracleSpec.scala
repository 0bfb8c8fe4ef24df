package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit coverage for declared keys that have (or long had) no DuckDB
  * oracle (SURVEY §2's "—" rows): each is checked against an independent
  * computation instead. q_map_funcs gained an oracle in r9 but keeps its
  * cross-check here — it exercises the map lookups directly. */
class NoOracleSpec extends AnyFunSuite {
  import SparkFixture._

  test("q_source_csv: CSV-parsed per-label stats match the parquet source") {
    val got = SparkEntry.queries("q_source_csv")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val exp = Tables.embeddings(spark, Sf0001)
      .orderBy("vec_id").limit(200)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), round(avg(col("embedding")(0).cast("double")), 6).as("m"))
      .orderBy("label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == exp.map(t => (t._1, t._2)))
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-5, s"label ${g._1}: csv mean ${g._3} vs ${e._3}")
    }
  }

  test("q_agg_quantile_sketch: merged ranks within the summary error bound, deterministic") {
    val got = SparkEntry.queries("q_agg_quantile_sketch")(spark, Sf0001).collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, Sf0001)
    // Rank-error bound: the merged estimate's TRUE rank must sit within
    // ~2/levels of the requested quantile (each 129-point day summary
    // carries ≤ n_day/129 rank slack; summing across days keeps the
    // relative bound — the GK/KLL merge law).
    for (r <- got) {
      val t = r.getString(0)
      val n = r.getLong(5).toDouble
      assert(r.getLong(4) > 1, s"$t: merge needs ≥2 day partials")
      for ((p, i) <- Seq((50, 1), (90, 2), (99, 3))) {
        val est = r.getDouble(i)
        val rank = ev.filter(col("event_type") === t && col("value") <= est)
          .count().toDouble / n
        assert(math.abs(rank - p / 100.0) <= 0.03,
          s"$t p$p: estimate $est has rank $rank")
      }
    }
    // Integer weighted-rank selection is partitioning-independent: the same
    // rows under a deliberately different partitioning must produce
    // IDENTICAL rows (no float accumulation order anywhere in the merge).
    val scrambled = graft.queries.Relational
      .quantileSketchFrom(ev.repartition(7)).collect()
    assert(scrambled.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq,
      "quantile merge is partitioning-sensitive")
  }

  test("q_agg_approx_distinct: HLL estimates within 10% of exact") {
    val r = SparkEntry.queries("q_agg_approx_distinct")(spark, Sf0001).collect()(0)
    val exact = Tables.lineitem(spark, Sf0001)
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")))
      .collect()(0)
    for (i <- 0 to 1) {
      val est = r.getLong(i).toDouble
      val ex = exact.getLong(i).toDouble
      assert(math.abs(est - ex) / ex < 0.10, s"col $i: approx $est vs exact $ex")
    }
  }

  test("q_agg_sketch_merge: day-merged sketches ≈ single-pass, error bounded, deterministic") {
    val got = SparkEntry.queries("q_agg_sketch_merge")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // Single-pass twin: sketch the raw column per type in one aggregation.
    // The merged estimate may differ slightly (union drops the HIP
    // estimator's single-stream refinement) but must stay within the
    // sketch's error envelope of both the twin and the exact count.
    val single = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = Tables.events(spark, Sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((t, est, _) <- got) {
      assert(math.abs(est - exact(t)).toDouble / exact(t) < 0.05,
        s"$t: merged $est vs exact ${exact(t)}")
      assert(math.abs(est - single(t)).toDouble / single(t) < 0.05,
        s"$t: merged $est vs single-pass ${single(t)}")
    }
    // Register-max union is order-independent: the same rows under a
    // deliberately different partitioning must produce IDENTICAL estimates.
    val scrambled = Tables.events(spark, Sf0001).repartition(7)
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((t, est, _) <- got)
      assert(est == scrambled(t),
        s"$t: estimate not partition-deterministic ($est vs ${scrambled(t)})")
  }

  test("q_map_funcs: map lookups match direct per-type counts") {
    val got = SparkEntry.queries("q_map_funcs")(spark, Sf0001)
      .select("user_id", "n_click", "n_purchase")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val direct = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == direct)
  }

  test("q_dedup_simhash: banded pair set == brute-force all-pairs over the same fingerprints") {
    val got = SparkEntry.queries("q_dedup_simhash")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // Independent check: collect every doc's fingerprint and compare ALL
    // pairs driver-side (fine at sf0.001; the query itself never does this).
    val hs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), graft.text.TextOps.simhash64(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = (for {
      (ida, ha) <- hs; (idb, hb) <- hs if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ida, idb, d)).toSet
    assert(got == exp, s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    assert(got.nonEmpty, "corpus should contain simhash near-dups")
  }

  test("q_text_fingerprint: winnowed set == driver-side reference winnow") {
    val got = SparkEntry.queries("q_text_fingerprint")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Independent winnow: gram hashes come from the same xxhash64 primitive
    // (no driver-side twin exists), but the sliding-window minimum, the
    // full-window rule, and the distinct are recomputed in plain Scala.
    val k = 3; val w = 4
    val grams = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), expr(
        s"transform(sequence(1, size(t) - ${k - 1}), i -> xxhash64(concat_ws(' ', slice(t, i, $k))))")
        .as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val exp = (for {
      (docId, hs) <- grams
      p <- 0 to hs.size - w // full windows only
    } yield (docId, hs.slice(p, p + w).min)).toSet
    assert(got == exp, s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    assert(got.nonEmpty)
  }

  test("q_media_features: features match an independent parse of the container layouts") {
    // Independent of Media.decode: the payloads are re-parsed here straight
    // from the PUBLISHED format layouts (BMP little-endian header offsets,
    // RIFF chunk walk, Y4M text header + frame markers), so a decoder bug
    // and its mirror in this test cannot cancel out.
    val got = SparkEntry.queries("q_media_features")(spark, Sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5), r.getInt(6), r.getLong(7)))).toMap
    def le32(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
        ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    def le16(p: Array[Byte], o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def feat(ranges: Seq[(Int, Int)], p: Array[Byte]): (Double, Long) = {
      var sum = 0L; var n = 0L; var h = 1125899906842597L
      for ((f, u) <- ranges; i <- f until u) { sum += p(i) & 0xff; h = h * 31 + (p(i) & 0xff); n += 1 }
      (BigDecimal(if (n == 0) 0.0 else sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, h)
    }
    def be32(p: Array[Byte], o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
        ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
    val exp = graft.multimodal.Media.syntheticAssets(spark, Sf0001).collect()
      .map { a =>
        val p = a.payload
        val (w, h, frames, mean, hash) =
          if (p(0) == 'B' && p(1) == 'M') {
            val off = le32(p, 10); val w = le32(p, 18); val hh = le32(p, 22)
            val rowSize = ((3 * w + 3) / 4) * 4
            val (m, hs) = feat(
              (0 until hh).map(y => (off + y * rowSize, off + y * rowSize + 3 * w)), p)
            (w, hh, 1, m, hs)
          } else if (p(0) == 'R') { // RIFF/WAVE
            var off = 12; var ch = 0; var ba = 0; var dFrom = -1; var dLen = 0
            while (off + 8 <= p.length) {
              val cid = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
              val len = le32(p, off + 4)
              if (cid == "fmt ") { ch = le16(p, off + 10); ba = le16(p, off + 20) }
              if (cid == "data") { dFrom = off + 8; dLen = len }
              off += 8 + len + (len & 1)
            }
            val (m, hs) = feat(Seq((dFrom, dFrom + dLen)), p)
            (dLen / ba, ch, 1, m, hs)
          } else if ((p(0) & 0xff) == 0x89) { // PNG (r15: compressed tier)
            var off = 8; var w = 0; var hh = 0
            val zs = new java.io.ByteArrayOutputStream()
            while (off + 8 <= p.length) {
              val len = be32(p, off)
              val tag = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
              if (tag == "IHDR") { w = be32(p, off + 8); hh = be32(p, off + 12) }
              if (tag == "IDAT") zs.write(p, off + 8, len)
              off += 12 + len
            }
            val inf = new java.util.zip.Inflater()
            inf.setInput(zs.toByteArray)
            val scan = new Array[Byte](hh * (1 + w * 3))
            var got2 = 0
            while (!inf.finished()) got2 += inf.inflate(scan, got2, scan.length - got2)
            inf.end()
            val px = Array.ofDim[Int](hh, w * 3)
            for (y <- 0 until hh; i <- 0 until w * 3) {
              val x = scan(y * (1 + w * 3) + 1 + i) & 0xff
              px(y)(i) = (scan(y * (1 + w * 3)) & 0xff) match {
                case 0 => x
                case 1 => (x + (if (i >= 3) px(y)(i - 3) else 0)) & 0xff
                case 2 => (x + (if (y > 0) px(y - 1)(i) else 0)) & 0xff
              }
            }
            var sum = 0L; var n = 0L; var hs = 1125899906842597L
            for (y <- 0 until hh; i <- 0 until w * 3) {
              sum += px(y)(i); hs = hs * 31 + px(y)(i); n += 1
            }
            val m = BigDecimal(sum.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (w, hh, 1, m, hs)
          } else { // YUV4MPEG2
            val nl = p.indexOf('\n'.toByte)
            val params = new String(p, 0, nl, java.nio.charset.StandardCharsets.US_ASCII).split(' ')
            val w = params.find(_.startsWith("W")).get.tail.toInt
            val hh = params.find(_.startsWith("H")).get.tail.toInt
            val fd = w * hh + 2 * (w / 2) * (hh / 2)
            var off = nl + 1; val all = Seq.newBuilder[(Int, Int)]; var n = 0
            while (off < p.length) {
              val fnl = p.indexOf('\n'.toByte, off)
              all += ((fnl + 1, fnl + 1 + fd)); n += 1; off = fnl + 1 + fd
            }
            val s = all.result()
            val step = math.max(1, n / 4)
            val pick = s.indices.by(step).take(4).map(s)
            val (m, hs) = feat(pick, p)
            (w, hh, pick.length, m, hs)
          }
        a.asset_id -> ((a.media_type, p.length.toLong, w, h, mean, frames, hash))
      }.toMap
    assert(got == exp,
      s"diff=${(exp.toSet diff got.toSet).take(2)} / ${(got.toSet diff exp.toSet).take(2)}")
  }

  test("q_sim_ivf_ann: recall >= 0.6 vs brute-force Euclidean top-10") {
    val ivf = SparkEntry.queries("q_sim_ivf_ann")(spark, Sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    val top = e.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum))
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = (ivf & top).size.toDouble / top.size
    assert(recall >= 0.6, s"IVF recall $recall; ivf=$ivf true=$top")
  }

  test("q_sim_ivf_pq: recall >= 0.6 vs brute-force top-10; ADC approximates the exact distance") {
    val rows = SparkEntry.queries("q_sim_ivf_pq")(spark, Sf0001).collect()
    val pq = rows.map(_.getLong(0)).toSet
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    val top = e.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum))
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = (pq & top).size.toDouble / top.size
    assert(recall >= 0.6, s"IVF-PQ recall $recall; pq=$pq true=$top")
    // adist is the ADC estimate of the SQUARED distance from the m-byte
    // code — it must sit in the right ballpark of dist² (quantization
    // error bounded well below the distance scale), or the shortlist
    // ranking the re-rank depends on would be noise.
    rows.foreach { r =>
      val (ad, d) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(ad - d * d) <= 0.5 * d * d + 0.25,
        s"ADC estimate $ad far from exact ${d * d} for vec ${r.getLong(0)}")
    }
  }

  test("q_sim_lsh_ann: recall >= 0.6 vs brute-force Euclidean top-10") {
    val lsh = SparkEntry.queries("q_sim_lsh_ann")(spark, Sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // Independent brute-force: exact Euclidean top-10 of vec 0.
    val e = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val q = e.find(_._1 == 0L).get._2
    val top = e.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum))
      }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = (lsh & top).size.toDouble / top.size
    assert(recall >= 0.6, s"LSH recall $recall; lsh=$lsh true=$top")
  }

  test("q_text_bpe_train: the 10-rule sequence matches an independent driver-side BPE") {
    val got = SparkEntry.queries("q_text_bpe_train")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got.length == 10 && got.map(_._1) == (1 to 10))
    // Reference BPE: plain Scala over the collected word counts — same
    // lowercased whitespace words, '</w>' terminator, leftmost-first
    // merge, ties broken (count desc, left asc, right asc).
    var vocab: Map[Vector[String], Long] = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0).map(_.toString).toVector :+ "</w>", r.getLong(1)))
      .toMap
    val expected = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to 10) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      expected += ((step, a, b, a + b, cnt))
      vocab = vocab.toSeq.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = a + b
          else out += s
        }
        (out.toVector, n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    assert(got == expected.result(),
      s"distributed rule sequence diverges from reference BPE:\n$got\nvs\n${expected.result()}")
  }

  test("q_text_bpe_encode: per-doc trained token counts match a reference encode") {
    val got = SparkEntry.queries("q_text_bpe_encode")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // Reference: the spec-verified graded rules applied word by word on
    // the driver (leftmost-first fold, '</w>' terminator).
    val rules = SparkEntry.queries("q_text_bpe_train")(spark, Sf0001)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(w: String): Int = {
      var syms = w.map(_.toString).toVector :+ "</w>"
      for ((a, b) <- rules) {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = a + b
          else out += s
        }
        syms = out.toVector
      }
      syms.length
    }
    val exp = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), ws.length.toLong, ws.map(w => encode(w).toLong).sum)
      }.toSeq.sortBy(_._1)
    assert(got == exp, "distributed encode diverges from the reference fold")
  }

  // Independent driver-side unigram-LM reference: same seeding, hard-EM,
  // pruning schedule, and longest-piece tie-break as text/Unigram.scala,
  // written against the plain collected word counts.
  private def refUnigramViterbi(w: String, logp: Map[String, Double],
                                maxLen: Int): (Double, Vector[String]) = {
    val dp = scala.collection.mutable.ArrayBuffer(
      (0.0, Vector.empty[String]))
    for (i <- 1 to w.length) {
      var best = (-1e18, Vector.empty[String])
      for (j <- math.max(1, i - maxLen + 1) to i) {
        val piece = w.substring(j - 1, i)
        logp.get(piece).foreach { lp =>
          val cand = dp(j - 1)._1 + lp
          if (cand > best._1) best = (cand, dp(j - 1)._2 :+ piece)
        }
      }
      dp += best
    }
    dp.last
  }

  private def refUnigramTrain(words: Seq[(String, Long)], seedSize: Int,
                              prunes: Seq[Int], finalRounds: Int,
                              maxLen: Int): (Seq[(String, Long, Double)], Seq[Double]) = {
    val cand = scala.collection.mutable.Map[String, Long]()
    for ((w, n) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i))
      cand(w.substring(i, i + l)) = cand.getOrElse(w.substring(i, i + l), 0L) + n
    var counts: Seq[(String, Long)] =
      cand.toSeq.filter(_._1.length == 1) ++
      cand.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    def logp = {
      val total = counts.map(_._2).sum.toDouble
      counts.map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    val losses = Seq.newBuilder[Double]
    for (r <- 1 to prunes.size + finalRounds) {
      val lp = logp
      val agg = scala.collection.mutable.Map[String, Long]()
      var loss = 0.0
      for ((w, n) <- words) {
        val (s, segs) = refUnigramViterbi(w, lp, maxLen)
        loss -= s * n
        for (p <- segs) agg(p) = agg.getOrElse(p, 0L) + n
      }
      losses += loss
      counts =
        if (r <= prunes.size)
          agg.toSeq.filter(_._1.length == 1) ++
          agg.toSeq.filter(_._1.length > 1)
            .sortBy { case (p, c) => (-c, p) }.take(prunes(r - 1))
        else agg.toSeq
    }
    val lpF = logp
    (counts.map { case (p, c) => (p, c, lpF(p)) }
      .sortBy { case (p, c, _) => (-c, p) }, losses.result())
  }

  private def unigramWordFreqs: Seq[(String, Long)] =
    Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("q_text_unigram_train: pieces match an independent driver-side EM; prune-free losses non-increasing") {
    val got = SparkEntry.queries("q_text_unigram_train")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val (refPieces, refLosses) =
      refUnigramTrain(unigramWordFreqs, 300, Seq(200, 120), 2, 4)
    val ref = refPieces.map { case (p, c, l) =>
      (p, c, math.rint(l * 1e6) / 1e6) }
    assert(got.nonEmpty)
    assert(got == ref,
      s"distributed EM diverges from reference (first diff: " +
      s"${got.zip(ref).find(x => x._1 != x._2)})")
    // The Spark trainer's own loss trace obeys the hard-EM law on the
    // final (prune-free) rounds, and tracks the reference within float
    // summation noise.
    import org.apache.spark.sql.functions.{count => fcount}
    val wordsDf = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(fcount(lit(1)).as("n"))
    val (_, losses) = graft.text.Unigram.train(wordsDf)
    assert(losses.length == 4)
    assert(losses(3) <= losses(2) + 1e-6,
      s"final prune-free EM round increased the loss: $losses")
    for ((a, b) <- losses.zip(refLosses))
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
        s"loss trace diverges from reference: $losses vs $refLosses")
  }

  test("q_text_unigram_encode: per-doc counts match a reference Viterbi encode; Viterbi is optimal vs brute force") {
    val pieces = graft.queries.LlmOps.stagedUnigramPieces(spark, Sf0001)
    val lp = pieces.map(p => p.piece -> p.logp).toMap
    val got = SparkEntry.queries("q_text_unigram_encode")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    val exp = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), ws.length.toLong,
          ws.map(w => refUnigramViterbi(w, lp, 4)._2.length.toLong).sum)
      }.toSeq.sortBy(_._1)
    assert(got == exp, "distributed encode diverges from the reference Viterbi")
    // Coverage: every distinct word's segmentation concatenates back to
    // the word exactly (no char dropped or duplicated by the DP).
    val vocab = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val bad = graft.text.Unigram.encodeWords(vocab, pieces)
      .filter(concat_ws("", col("segs")) =!= col("w")).count()
    assert(bad == 0L, s"$bad words with lossy segmentations")
    // Optimality: on short words, the DP score equals the brute-force
    // best over ALL segmentations into known pieces.
    def brute(w: String): Double = {
      if (w.isEmpty) 0.0
      else (1 to math.min(4, w.length)).flatMap { l =>
        lp.get(w.substring(0, l)).map(_ + brute(w.substring(l)))
      }.foldLeft(-1e18)(math.max)
    }
    val shorts = unigramWordFreqs.map(_._1).filter(_.length <= 8).take(200)
    assert(shorts.nonEmpty)
    for (w <- shorts) {
      val dp = refUnigramViterbi(w, lp, 4)._1
      assert(math.abs(dp - brute(w)) <= 1e-9,
        s"Viterbi suboptimal on '$w': dp=$dp brute=${brute(w)}")
    }
  }

  test("q_text_wordpiece_train: rule sequence AND likelihood scores match an independent driver-side WordPiece") {
    val got = SparkEntry.queries("q_text_wordpiece_train")(spark, Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSeq
    assert(got.length == 10 && got.map(_._1) == (1 to 10))
    // Reference WordPiece: `##`-continuation symbols, likelihood-gain
    // argmax cnt(ab)/(cnt(a)·cnt(b)) as the SAME IEEE double division on
    // exact counts (bit-identical to the distributed argmax), ties
    // (score desc, left asc, right asc), leftmost-first rewrite.
    var vocab: Map[Vector[String], Long] = unigramWordFreqs.map { case (w, n) =>
      (w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }.toVector, n)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val expected = Seq.newBuilder[(Int, String, String, String, Double)]
    for (step <- 1 to 10) {
      val uni = scala.collection.mutable.Map[String, Long]()
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- vocab) {
        for (s <- syms) uni(s) = uni.getOrElse(s, 0L) + n
        for (i <- 0 until syms.length - 1)
          pairs((syms(i), syms(i + 1))) =
            pairs.getOrElse((syms(i), syms(i + 1)), 0L) + n
      }
      val scored = pairs.toSeq.map { case ((a, b), c) =>
        (a, b, c.toDouble / (uni(a).toDouble * uni(b).toDouble)) }
      val (a, b, sc) = scored.minBy { case (x, y, s) => (-s, x, y) }
      val merged = a + b.stripPrefix("##")
      expected += ((step, a, b, merged, sc))
      vocab = vocab.toSeq.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = merged
          else out += s
        }
        (out.toVector, n)
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    assert(got == expected.result(),
      s"distributed WordPiece diverges from reference (first diff: " +
      s"${got.zip(expected.result()).find(x => x._1 != x._2)})")
  }

  test("q_text_wordpiece_encode: per-doc counts match a reference greedy longest-match walk; zero UNK") {
    val (pieces, maxLen) =
      graft.queries.LlmOps.stagedWordpieceVocab(spark, Sf0001)
    def encode(w: String): Long = {
      var (pos, cnt) = (0, 0L)
      while (pos < w.length) {
        var l = math.min(maxLen, w.length - pos)
        var hit = 0
        while (hit == 0 && l >= 1) {
          val raw = w.substring(pos, pos + l)
          val piece = if (pos > 0) "##" + raw else raw
          if (pieces.contains(piece)) hit = l else l -= 1
        }
        if (hit == 0) return -1L
        pos += hit; cnt += 1
      }
      cnt
    }
    val got = SparkEntry.queries("q_text_wordpiece_encode")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val exp = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        val toks = ws.map(encode)
        (r.getLong(0), ws.length.toLong,
          toks.filter(_ >= 0).sum, toks.count(_ < 0).toLong)
      }.toSeq.sortBy(_._1)
    assert(got == exp, "distributed greedy walk diverges from the reference")
    assert(got.forall(_._4 == 0L),
      "UNK words despite the alphabet backstop")
  }

  test("q_sim_rerank_mmr: every pick is the greedy argmax over the independent shortlist; rank-1 is the relevance top-1") {
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val emb = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val got = SparkEntry.queries("q_sim_rerank_mmr")(spark, Sf0001).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == (0L to 4L).toSet)
    for ((qid, rows) <- got) {
      // Independent shortlist: cosine top-20 by (rel desc, id).
      val shortlist = emb.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(v, emb(qid))) }
        .sortBy { case (id, r) => (-r, id) }.take(20)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L), s"qid $qid ranks")
      val ids = sorted.map(_.getLong(2)).toSeq
      assert(ids.distinct == ids && ids.forall(shortlist.map(_._1).contains),
        s"qid $qid picks outside the shortlist or duplicated")
      // rank-1 must be the pure-relevance top-1 (empty selected set).
      assert(ids.head == shortlist.head._1, s"qid $qid rank-1 not max-rel")
      // Every later pick maximizes lam*rel - (1-lam)*maxSim(selected).
      val lam = 0.7
      var selected = Vector.empty[Long]
      for (r <- sorted) {
        val pool = shortlist.filterNot(c => selected.contains(c._1))
        val scored = pool.map { case (id, rel) =>
          val red = if (selected.isEmpty) 0.0
            else selected.map(s => cos(emb(id), emb(s))).max
          (id, lam * rel - (1.0 - lam) * red)
        }
        val (bestId, bestScore) = scored.minBy { case (id, m) => (-m, id) }
        assert(r.getLong(2) == bestId,
          s"qid $qid rank ${r.getLong(1)}: picked ${r.getLong(2)}, argmax $bestId")
        assert(r.getDouble(4) == round6(bestScore),
          s"qid $qid rank ${r.getLong(1)}: mmr ${r.getDouble(4)} != ${round6(bestScore)}")
        selected :+= bestId
      }
    }
  }

  test("q_dedup_semantic: per-cluster drop counts == brute force over the model's own assignments; planted same-cluster pairs dropped") {
    val got = SparkEntry.queries("q_dedup_semantic")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    // Re-derive the assignments with the same seeded helper and recompute
    // drops brute-force (keep-min-id within each cluster at cos >= 0.98).
    val emb = graft.queries.LlmOps.plantedNearDupEmbeddings(
      Tables.embeddings(spark, Sf0001))
    val model = graft.ml.Pipelines.kmeansQuantizer(emb, "embedding", k = 16)
    val rows = model.transform(graft.ml.Pipelines.withFeatures(emb, "embedding"))
      .select(col("vec_id"), col("prediction").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = rows.groupBy(_._2).map { case (c, ms) =>
      val dropped = ms.count { case (id, _, v) =>
        ms.exists { case (id2, _, v2) => id2 < id && cos(v, v2) >= 0.98 }
      }
      (c, ms.length.toLong, dropped.toLong)
    }.toSeq.sortBy(_._1)
    assert(got == exp, s"got $got vs brute $exp")
    assert(got.map(_._3).sum > 0, "the planted near-dups must produce drops")
    // Every planted pair (id, id + 10^6) that landed in the SAME cluster
    // must have dropped its high-id member (cos ~ 0.999 >> 0.98).
    val byId = rows.map(r => r._1 -> r._2).toMap
    val sameCluster = rows.collect {
      case (id, c, _) if id >= 1000000L && byId.get(id - 1000000L).contains(c) => id
    }
    assert(sameCluster.nonEmpty, "no planted pair landed in one cluster — fixture broken")
    val droppedTotal = got.map(_._3).sum
    assert(droppedTotal >= sameCluster.length,
      s"planted same-cluster dups $sameCluster not all dropped ($droppedTotal)")
  }
}
