package graft

import graft.operators.SkewJoin
import graft.sources.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout pruning and skew-salting: the last two 100 TB design
  * claims demonstrated as code + assertions. */
class LayoutSkewSpec extends AnyFunSuite {
  import SparkFixture._

  test("partitioned layout: partition filter prunes directories at the scan") {
    val path = sys.props("java.io.tmpdir") + "/graft-layout-docs"
    Layout.writePartitioned(Tables.documents(spark, Sf0001), path, "lang")
    val back = Layout.readPartitioned(spark, path)
    val en = back.filter(col("lang") === "en")
    // The filter must land in the scan's partitionFilters, not a post-scan
    // Filter over all rows.
    val plan = en.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    assert(scans.head.partitionFilters.nonEmpty,
      s"lang filter not pushed to partition pruning:\n$plan")
    // Pruning is lossless.
    val expected = Tables.documents(spark, Sf0001).filter(col("lang") === "en").count()
    assert(en.count() == expected)
    // And the executed scan read strictly fewer files than the layout holds
    // (inputFiles lists pre-pruning; the scan metric counts what was read).
    plan.execute().count()
    val readFiles = scans.head.metrics("numFiles").value
    val allFiles = back.inputFiles.length
    assert(allFiles >= 5, s"expected one file per lang partition, saw $allFiles")
    assert(readFiles < allFiles,
      s"pruned scan read $readFiles of $allFiles files")
  }

  test("salted join equals the plain join on a skewed fact table") {
    import spark.implicits._
    // 90% of fact rows share one hot key — the classic skew shape.
    val fact = spark.range(0, 20000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k")
      .select(col("k"), col("payload"), col("name"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select(col("k"), col("payload"), col("name"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain, s"sizes: salted=${salted.size} plain=${plain.size}")
    assert(plain.size == 20000)
  }

  test("property: salted join == plain join across random skew shapes and salt factors") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Deterministic generated cases (raw Gen + fixed seeds, DetPropSpec
    // style): fact-row count, dim-key count, hot-key share, salt factor —
    // including the salt=1 degenerate and the 100%-hot extreme.
    val caseGen = for {
      n <- Gen.choose(50, 400)
      nKeys <- Gen.choose(1, 20)
      hotPct <- Gen.choose(0, 100)
      salt <- Gen.choose(1, 16)
    } yield (n, nKeys, hotPct, salt)
    (1 to 6).foreach { i =>
      val (n, nKeys, hotPct, salt) =
        caseGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val fact = spark.range(n.toLong).select(
        when(pmod(col("id") * 31 + 7, lit(100)) < hotPct, lit(0L))
          .otherwise(pmod(col("id"), lit(nKeys.toLong))).as("k"),
        col("id").as("payload"))
      val dim = (0L until nKeys.toLong).map(k => (k, s"d$k")).toDF("k", "name")
      val plain = fact.join(dim, "k").select("k", "payload", "name")
        .collect().map(_.toSeq).toSet
      val salted = SkewJoin.saltedJoin(fact, dim, "k", salt)
        .select("k", "payload", "name").collect().map(_.toSeq).toSet
      assert(salted == plain,
        s"case(n=$n keys=$nKeys hot=$hotPct% salt=$salt): salted=${salted.size} plain=${plain.size}")
    }
  }

  test("q_layout_prune's read side prunes partitions in its executed plan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // The graded key itself (not just the Layout library): its read-back
    // scan must carry the lang filter as a partition filter. The aggregate
    // plan has exchanges, so AQE wraps it — collect inside the adaptive
    // root (TreeNode.collect does not descend into it).
    val df = SparkEntry.queries("q_layout_prune")(spark, Sf0001)
    val root = df.queryExecution.executedPlan
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"lang filter not pushed to partition pruning:\n$plan")
    assert(df.count() > 0)
  }

  test("q_agg_incremental's delta scan prunes day partitions in its plan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // The refresh claim is that the delta read touches one day directory,
    // not the table: the day predicate must land in the partitioned scan's
    // partitionFilters (the rollup scan has no partition columns).
    val df = SparkEntry.queries("q_agg_incremental")(spark, Sf0001)
    val root = df.queryExecution.executedPlan
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in:\n$plan")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"day cutover not pushed to partition pruning:\n$plan")
    assert(df.count() > 0)
  }

  test("Layout.compact shrinks the file count and preserves content byte-for-byte") {
    val frag = Tables.stageDir(spark, "spec-fragments", Sf0001)
    val compacted = Tables.stageDir(spark, "spec-compacted", Sf0001)
    val src = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    src.repartition(32).write.mode("overwrite").parquet(frag)
    val nOut = Layout.compact(spark, frag, compacted, targetBytes = 10L * 1024 * 1024)
    def parquetFiles(path: String): Int =
      spark.read.parquet(path).inputFiles.length
    assert(parquetFiles(frag) >= 32, s"fixture not fragmented: ${parquetFiles(frag)} files")
    assert(parquetFiles(compacted) == nOut)
    assert(nOut < parquetFiles(frag), s"compaction did not shrink: $nOut files")
    val got = spark.read.parquet(compacted).collect().map(_.toSeq).toSet
    val exp = src.collect().map(_.toSeq).toSet
    assert(got == exp, s"content changed: missing=${(exp -- got).take(3)}")
  }

  test("adaptive salt factor: tuned from the measured hot-key share at two skew profiles") {
    import spark.implicits._
    def spreadOf(fact: org.apache.spark.sql.DataFrame, hotKey: Long, salt: Int): Map[Int, Long] =
      fact.withColumn("__salt",
          pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
        .filter(col("k") === hotKey)
        .groupBy("__salt").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Profile 1: one key holds 64× the average key's rows (6400 vs 100 over
    // 64 keys — ~50% share). The derived factor must ask for real spread...
    val hot64 = spark.range(0, 6400).select(lit(0L).as("k"), col("id").as("payload"))
      .union(spark.range(0, 6300)
        .select((pmod(col("id"), lit(63L)) + 1L).as("k"), col("id").as("payload")))
    val salt64 = SkewJoin.adaptiveSaltFactor(hot64, "k")
    assert(salt64 > 1, s"64× hot key derived salt $salt64 — would not spread")
    // ...and the hot key's rows must actually land in every salt bucket,
    // none holding more than twice the fair share.
    val buckets64 = spreadOf(hot64, 0L, salt64)
    assert(buckets64.keySet == (0 until salt64).toSet, s"empty salt buckets: $buckets64")
    assert(buckets64.values.max < 2L * 6400 / salt64, buckets64.toString)
    // Profile 2: 90% of rows on the hot key — a larger derived factor, and
    // the adaptive join still equals the plain join.
    val hot90 = spark.range(0, 10000).select(
      when(col("id") % 10 =!= 0, lit(5L)).otherwise(pmod(col("id"), lit(64L))).as("k"),
      col("id").as("payload"))
    val salt90 = SkewJoin.adaptiveSaltFactor(hot90, "k")
    assert(salt90 >= salt64, s"90% share derived $salt90 < 64×-profile $salt64")
    val buckets90 = spreadOf(hot90, 5L, salt90)
    assert(buckets90.keySet == (0 until salt90).toSet, s"empty salt buckets: $buckets90")
    val dim = (0L until 64L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = hot90.join(dim, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val adaptive = SkewJoin.saltedJoinAdaptive(hot90, dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(adaptive == plain, s"sizes: adaptive=${adaptive.size} plain=${plain.size}")
    // A uniform fact collapses to salt 1 — no dim explosion, no extra work.
    val uniform = spark.range(0, 8000)
      .select(pmod(col("id"), lit(64L)).as("k"), col("id").as("payload"))
    assert(SkewJoin.adaptiveSaltFactor(uniform, "k") == 1,
      "uniform fact should not pay for salting")
  }

  test("per-key salting: only hot keys salted, dim amplification < global-factor explosion, answer invariant") {
    import spark.implicits._
    // 90% of rows on key 5, 63 cold keys — the planted hot-key shape.
    val fact = spark.range(0, 10000).select(
      when(col("id") % 10 =!= 0, lit(5L)).otherwise(pmod(col("id"), lit(64L))).as("k"),
      col("id").as("payload"))
    val dim = (0L until 64L).map(k => (k, s"d$k")).toDF("k", "name")
    // (1) The hot table holds ONLY the hot key, with a real factor.
    val hot = SkewJoin.perKeySaltFactors(fact, "k").collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(5L),
      s"hot table should hold exactly the planted key: ${hot.toSeq}")
    val hotFactor = hot.head.getLong(1)
    assert(hotFactor > 1, s"hot key derived factor $hotFactor — would not spread")
    // (2) Dim amplification: Σ per-key factors beats nKeys × global factor.
    val globalFactor = SkewJoin.adaptiveSaltFactor(fact, "k")
    val perKeyDimRows = 64 - 1 + hotFactor // cold keys once + hot key f times
    assert(perKeyDimRows < 64L * globalFactor,
      s"per-key explosion $perKeyDimRows !< global ${64L * globalFactor}")
    // (3) Result equality with the plain join, and invariance across caps.
    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    for (cap <- Seq(2, 8, 64)) {
      val got = SkewJoin.saltedJoinPerKey(fact, dim, "k", maxFactor = cap)
        .select("k", "payload", "name").collect().map(_.toSeq).toSet
      assert(got == plain, s"maxFactor=$cap: got=${got.size} plain=${plain.size}")
    }
    // (4) The hot key's rows actually spread across its salt buckets.
    val spread = SkewJoin.saltedJoinPerKey(fact, dim, "k")
      .filter(col("k") === 5L).count()
    assert(spread == 9000L, s"hot-key rows lost/duplicated: $spread")
    // (5) A uniform fact derives NO hot keys — the join degenerates to the
    // plain join with zero extra dim copies.
    val uniform = spark.range(0, 8000)
      .select(pmod(col("id"), lit(64L)).as("k"), col("id").as("payload"))
    assert(SkewJoin.perKeySaltFactors(uniform, "k").isEmpty,
      "uniform fact should not pay for salting")
    val uPlain = uniform.join(dim, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val uGot = SkewJoin.saltedJoinPerKey(uniform, dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(uGot == uPlain)
  }

  test("Layout.compact sizes a hive-partitioned tree from its nested data files") {
    // The small-files shape compaction exists for is often a partitioned
    // tree; a top-level-only listing would measure 0 bytes and collapse
    // everything to one file regardless of targetBytes.
    val part = Tables.stageDir(spark, "spec-compact-part", Sf0001)
    val out = Tables.stageDir(spark, "spec-compact-part-out", Sf0001)
    val src = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Layout.writePartitioned(src, part, "lang", filesPerPartition = 4)
    // Independent byte count of the nested data files: compact's output
    // count must reflect it (a top-level-only listing would see 0 bytes).
    val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(part)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var total = 0L
    while (bytes.hasNext) {
      val f = bytes.next()
      if (f.toString.endsWith(".parquet")) total += java.nio.file.Files.size(f)
    }
    val target = 2048L
    val expected = math.max(1L, (total + target - 1) / target).toInt
    val nOut = Layout.compact(spark, part, out, targetBytes = target)
    assert(total > target, s"fixture too small to exercise sizing: $total bytes")
    assert(nOut == expected,
      s"compact sized $nOut files from a $total-byte partitioned tree (expected $expected)")
    val got = spark.read.parquet(out).select("doc_id", "n_chars")
      .collect().map(_.toSeq).toSet
    val exp = src.select("doc_id", "n_chars").collect().map(_.toSeq).toSet
    assert(got == exp, s"content changed: missing=${(exp -- got).take(3)}")
  }

  test("z-order clustering tightens per-file envelopes in BOTH dimensions at once") {
    // Deterministic 64×64 grid, one row per cell: after scaling to 16 bits
    // and Morton interleaving, 8 z-range files must cover ~1/2 of the
    // even-bit dimension and ~1/4 of the odd-bit dimension each (the top 3
    // z bits are y15, x15, y14) — while a hash-fragmented baseline sees
    // nearly the full range of both in every file. Tight envelopes are
    // what parquet min/max data skipping prunes on.
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("pk"), (col("id") / 64).cast("long").as("sk"))
    val withZ = grid
      .withColumn("px", expr("(pk * 65535) div 63"))
      .withColumn("sx", expr("(sk * 65535) div 63"))
      .select(col("pk"), col("sk"),
        Layout.morton16(col("px"), col("sx")).as("z"))
    val zPath = Tables.stageDir(spark, "spec-zorder", Sf0001)
    val basePath = Tables.stageDir(spark, "spec-zorder-base", Sf0001)
    Layout.zorderWrite(withZ, zPath, col("z"), numFiles = 8)
    withZ.repartition(8).write.mode("overwrite").parquet(basePath)

    def avgRanges(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("pk")) - min(col("pk"))).as("pkr"),
          (max(col("sk")) - min(col("sk"))).as("skr"))
        .select(avg(col("pkr")), avg(col("skr"))).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (zPk, zSk) = avgRanges(zPath)
    val (bPk, bSk) = avgRanges(basePath)
    assert(spark.read.parquet(zPath).inputFiles.length == 8)
    assert(zPk <= 0.6 * bPk, s"pk envelope not tightened: z=$zPk base=$bPk")
    assert(zSk <= 0.35 * bSk, s"sk envelope not tightened: z=$zSk base=$bSk")
    // The clustered round trip is lossless.
    val got = spark.read.parquet(zPath).select("pk", "sk").collect().map(_.toSeq).toSet
    val exp = grid.collect().map(_.toSeq).toSet
    assert(got == exp, s"content changed: missing=${(exp -- got).take(3)}")
  }

  test("hilbert16: bijection + unit-step adjacency vs driver reference; envelopes tighten in BOTH dimensions") {
    // Independent driver-side reference: the classic iterative xy2d
    // (per-level quadrant digit + rotate/reflect, n−1 flip) on the full
    // 65536 grid — the Spark fold must agree bit-for-bit.
    def refHilbert(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 32768L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 65535L - x; y = 65535L - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    // 64×64 grid scaled to the 16-bit corners — exercises every rotation
    // path across 6 levels and the full-range flip arithmetic.
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("gx"), (col("id") / 64).cast("long").as("gy"))
      .withColumn("px", expr("(gx * 65535) div 63"))
      .withColumn("sx", expr("(gy * 65535) div 63"))
    val got = grid.select(col("px"), col("sx"),
        Layout.hilbert16(col("px"), col("sx")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.size == 4096)
    for (((x, y), h) <- got)
      assert(h == refHilbert(x, y), s"hilbert16($x,$y)=$h != ref ${refHilbert(x, y)}")
    // Defining Hilbert property on a contiguous grid: sort a FULL small
    // grid (32×32 in raw coordinates) by index — bijective onto 0..1023
    // and every consecutive pair is grid-adjacent (|dx|+|dy| == 1). The
    // Z-order curve fails the adjacency half (seam jumps) — this is
    // exactly the locality upgrade the operator claims.
    val small = spark.range(0, 1024).select(
        (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .select(col("x"), col("y"),
        Layout.hilbert16(col("x") * 2048, col("y") * 2048).as("h"))
      .orderBy("h").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(small.length == 1024 && small.distinct.length == 1024)
    for (Seq((x1, y1), (x2, y2)) <- small.toSeq.sliding(2))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent hilbert step ($x1,$y1)->($x2,$y2)")
    // Envelope tightening vs a hash-fragmented baseline (the q_layout
    // zorder pin, same grid/files): both dimensions tighten.
    val withH = grid.select(col("gx").as("pk"), col("gy").as("sk"),
      Layout.hilbert16(col("px"), col("sx")).as("h"))
    val hPath = Tables.stageDir(spark, "spec-hilbert", Sf0001)
    val basePath = Tables.stageDir(spark, "spec-hilbert-base", Sf0001)
    Layout.zorderWrite(withH, hPath, col("h"), numFiles = 8)
    withH.repartition(8).write.mode("overwrite").parquet(basePath)
    def avgRanges(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("pk")) - min(col("pk"))).as("pkr"),
          (max(col("sk")) - min(col("sk"))).as("skr"))
        .select(avg(col("pkr")), avg(col("skr"))).head()
      (perFile.getDouble(0), perFile.getDouble(1))
    }
    val (hPk, hSk) = avgRanges(hPath)
    val (bPk, bSk) = avgRanges(basePath)
    assert(hPk <= 0.6 * bPk, s"pk envelope not tightened: h=$hPk base=$bPk")
    assert(hSk <= 0.6 * bSk, s"sk envelope not tightened: h=$hSk base=$bSk")
  }

  test("2-D skipping: box scan opens a strict sound subset; hilbert opens no more files than z-order over a box sweep") {
    val d = queries.Relational.staged2DManifestLayout(spark, Sf0001)
    val li = Tables.lineitem(spark, Sf0001)
    val bounds = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (pkMax, skMax) = (bounds.getLong(0), bounds.getLong(1))
    val total = spark.read.parquet(s"$d/data").inputFiles.length
    // Strict subset + soundness on the graded box.
    val (aLo, aHi) = (pkMax / 4, pkMax / 2)
    val (bLo, bHi) = (skMax / 4, skMax / 2)
    val pruned = Layout.manifestPrunedRead2D(spark, d,
      lit(aLo), lit(aHi), lit(bLo), lit(bHi))
    assert(pruned.inputFiles.length > 0 && pruned.inputFiles.length < total,
      s"no 2-D skipping: ${pruned.inputFiles.length} of $total files")
    val skipped = spark.read.parquet(s"$d/data").inputFiles
      .filterNot(pruned.inputFiles.toSet)
    val leaked = spark.read.parquet(skipped.toIndexedSeq: _*)
      .filter(col("l_partkey") >= aLo && col("l_partkey") <= aHi &&
              col("l_suppkey") >= bLo && col("l_suppkey") <= bHi).count()
    assert(leaked == 0L, s"$leaked in-box rows in skipped files")
    // Hilbert vs z-order: same data, same file count, morton clustering
    // with the same 2-D manifest; across a sweep of quarter-domain boxes
    // the hilbert layout must open no more files in total (its bounded
    // run envelopes are the whole reason it exists).
    val zd = Tables.stageDir(spark, "spec-2d-zorder", Sf0001)
    Tables.deleteRecursively(zd)
    val scaled = li
      .withColumn("__ha", expr(s"(l_partkey * 65535) div greatest($pkMax, 1)"))
      .withColumn("__hb", expr(s"(l_suppkey * 65535) div greatest($skMax, 1)"))
    Layout.zorderWrite(
      scaled.drop("__z"), s"$zd/data",
      Layout.morton16(col("__ha"), col("__hb")), 16)
    spark.read.parquet(s"$zd/data")
      .groupBy(input_file_name().as("file_path"))
      .agg(min(col("l_partkey")).as("min_a"), max(col("l_partkey")).as("max_a"),
        min(col("l_suppkey")).as("min_b"), max(col("l_suppkey")).as("max_b"),
        count(lit(1)).as("n_rows"))
      .coalesce(1).write.mode("overwrite").parquet(s"$zd/manifest2d")
    def opened(root: String, box: (Long, Long, Long, Long)): Int =
      Layout.manifestPrunedRead2D(spark, root,
        lit(box._1), lit(box._2), lit(box._3), lit(box._4))
        .inputFiles.length
    val boxes = for (i <- 0 to 2; j <- 0 to 2) yield (
      pkMax * i / 4, pkMax * (i + 1) / 4, skMax * j / 4, skMax * (j + 1) / 4)
    val h = boxes.map(opened(d, _)).sum
    val z = boxes.map(opened(zd, _)).sum
    info(s"box sweep: hilbert opened $h files, z-order $z, total $total per layout")
    assert(h <= z, s"hilbert opened MORE files than z-order: $h vs $z")
    assert(h < boxes.size * total, "no pruning at all across the sweep")
  }

  test("bucketed layout: co-located join runs with zero join-side exchanges; plain twin shuffles both") {
    // AQE-final shuffle count (reused and broadcast exchanges don't count).
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = PlanCheck.shufflesOf(df)
    // The graded query: bucketed writes + catalog join. Its only shuffles
    // are the post-join groupBy (1) and the total-order sort (1) — the join
    // itself reads both bucket layouts pre-partitioned.
    val bucketed = SparkEntry.queries("q_layout_bucketed")(spark, Sf0001)
    assert(shuffles(bucketed) <= 2,
      "bucketed join must not exchange its inputs: the bucket spec IS the distribution")
    // Non-bucketed twin, same plan otherwise (merge hint forbids the
    // broadcast escape): both join inputs must pay a full shuffle.
    val twin = Tables.orders(spark, Sf0001)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .hint("merge")
      .join(Tables.customer(spark, Sf0001).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment", "o_orderstatus")
    assert(shuffles(twin) >= 4,
      "twin lost its join shuffles — the bucketed comparison is no longer meaningful")
    // And the bucketed result equals the plain-source join (losslessness —
    // the oracle argument in miniature).
    val exp = Tables.orders(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = bucketed.select("c_mktsegment", "o_orderstatus", "n_orders")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exp, s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
  }

  test("salted join spreads the hot key across salt buckets — even for byte-identical rows") {
    import spark.implicits._
    // Every hot row identical: a content-hash salt would collapse to ONE
    // bucket; the row-position salt must still spread them.
    val fact = spark.range(0, 8000).select(lit(7L).as("k"), lit("same").as("payload"))
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == (0 until 8).toSet, s"empty salt buckets: $buckets")
    // No bucket holds more than twice the fair share.
    assert(buckets.values.max < 2 * 8000 / 8, buckets.toString)
    // And the identical-row join still equals the plain join.
    val dim = Seq((7L, "hot")).toDF("k", "name")
    assert(SkewJoin.saltedJoin(fact, dim, "k", 8).count() == 8000)
  }
}
