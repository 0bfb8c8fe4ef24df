package graft

import graft.ml.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: probes a fraction of cells, still recalls most of the true
  * top-k, deterministically. */
class IvfSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val emb = Tables.embeddings(spark, Sf0001)
  private lazy val all = emb
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  private lazy val query = all.find(_._1 == 0L).get._2
  private lazy val trueTop = all.filter(_._1 != 0L)
    .map { case (id, v) =>
      (id, math.sqrt(v.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum))
    }
    .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet

  test("IVF search touches a cell subset and recalls >= 0.7 of true top-10") {
    val index = Ivf.build(emb.filter(col("vec_id") =!= 0), "embedding", nCells = 16)
    val probedRows = index.assigned.filter(col("cell").isin(
      0.until(16).map(Integer.valueOf): _*)).count()
    val got = Ivf.search(index, query, k = 10, nProbe = 6)
    val ids = got.select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ids & trueTop).size.toDouble / trueTop.size
    assert(recall >= 0.7, s"IVF recall $recall; got=$ids true=$trueTop")
    // Efficiency: the probed subset is a strict fraction of the table.
    val touched = index.assigned.filter(col("cell").isin(
      Ivf.search(index, query, 10, 6).select(col("cell")).distinct()
        .collect().map(r => Integer.valueOf(r.getInt(0))).toSeq: _*)).count()
    assert(touched < probedRows, s"probe touched $touched of $probedRows rows")
  }

  test("partitioned IVF search prunes cell directories and matches in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    try {
    val disk = Ivf.buildPartitioned(
      emb.filter(col("vec_id") =!= 0), "embedding", nCells = 16, path = dir)
    val got = Ivf.searchPartitioned(spark, disk, query, k = 10, nProbe = 6)
    // The probe filter must reach the scan as a PARTITION filter — pruning
    // directories before IO, not a post-read predicate.
    val scanNode = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters"))
    assert(scanNode.exists(_.contains("cell")),
      s"no cell PartitionFilters in scan:\n${got.queryExecution.executedPlan}")
    // Identical result set to the in-memory search over the same quantizer.
    val mem = Ivf.build(emb.filter(col("vec_id") =!= 0), "embedding", nCells = 16)
    val expect = Ivf.search(mem, query, 10, 6)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ids = got.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids == expect, s"disk=$ids mem=$expect")
    } finally Tables.deleteRecursively(dir)
  }

  test("IVF search is deterministic across runs") {
    val index = Ivf.build(emb.filter(col("vec_id") =!= 0), "embedding", nCells = 16)
    val a = Ivf.search(index, query, 10, 4).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Ivf.search(index, query, 10, 4).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 10)
  }

  test("append == assigning the union with the same frozen quantizer (no retrain)") {
    val isBatch = col("vec_id") % 10 === 7
    val corpus = emb.filter(col("vec_id") =!= 0 && !isBatch)
    val batch = emb.filter(col("vec_id") =!= 0 && isBatch)
    val base = Ivf.build(corpus, "embedding", nCells = 16, maxIter = 4)
    val appended = Ivf.append(base, batch)
    // Assignment is pointwise against the frozen centroids, so the
    // appended index must be ROW-identical to running the same model over
    // corpus ∪ batch — the no-retrain amortization claim itself.
    val viaUnion = base.model.transform(
        graft.ml.Pipelines.withFeatures(corpus.unionByName(batch), "embedding"))
      .withColumnRenamed("prediction", "cell").drop("features")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).collect().map(_.toSeq).toSet
    assert(rows(appended.assigned) == rows(viaUnion))
    // And the batch really is in the searchable index.
    assert(appended.assigned.filter(isBatch).count() == batch.count())
  }

  test("q_sim_ivf_append: search over the appended index recalls >= 0.7 of the FULL true top-10") {
    val got = SparkEntry.queries("q_sim_ivf_append")(spark, SparkFixture.Sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // trueTop is brute force over ALL vectors (corpus ∪ batch) — a batch
    // vector that is a true neighbour must be reachable post-append.
    val recall = (got & trueTop).size.toDouble / trueTop.size
    assert(recall >= 0.7, s"recall $recall; got=$got true=$trueTop")
    assert(got.size == 10)
  }

  test("appendPartitioned lands batch files inside existing cell directories") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_append_layout").toString
    try {
      val isBatch = col("vec_id") % 10 === 7
      val corpus = emb.filter(col("vec_id") =!= 0 && !isBatch)
      val batch = emb.filter(col("vec_id") =!= 0 && isBatch)
      val disk = Ivf.buildPartitioned(corpus, "embedding", nCells = 16, path = dir)
      val before = Ivf.searchPartitioned(spark, disk, query, 10, 6)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      Ivf.appendPartitioned(disk, batch)
      // No rewrite: the corpus rows survive and the batch rows are appended.
      val after = graft.sources.Layout.readPartitioned(spark, dir)
      assert(after.count() == corpus.count() + batch.count())
      assert(after.filter(isBatch).count() == batch.count())
      // Search sees the appended vectors through the same partition pruning.
      val got = Ivf.searchPartitioned(spark, disk, query, 10, 6)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val mem = Ivf.search(
        Ivf.append(Ivf.build(corpus, "embedding", nCells = 16), batch), query, 10, 6)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(got == mem, s"disk=$got mem=$mem (before append: $before)")
    } finally Tables.deleteRecursively(dir)
  }

  test("auto-tuned nProbe: stored beside the layout, used by default, recall >= 0.8 on held-out queries") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_tuned").toString
    try {
      val corpus = emb.filter(col("vec_id") =!= 0)
      val disk = Ivf.buildPartitioned(corpus, "embedding", nCells = 16,
        path = dir, tuneForK = 10, targetRecall = 0.9)
      // Stored beside the centroids' layout and round-trippable.
      val stored = Ivf.storedNProbe(dir)
      assert(stored == disk.tunedNProbe && stored.exists(p => p >= 1 && p <= 16),
        s"stored=$stored field=${disk.tunedNProbe}")
      // The tuning samples are the smallest ids — evaluate recall on
      // held-out queries OUTSIDE that sample (largest ids), at the stored
      // width used by DEFAULT (no explicit nProbe).
      val heldOut = all.filter(_._1 != 0L).sortBy(-_._1).take(5)
      val recalls = heldOut.map { case (qid, q) =>
        val truth = all.filter(t => t._1 != 0L)
          .map { case (id, v) =>
            (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
          }
          .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        val got = Ivf.searchPartitioned(spark, disk, q, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & truth).size.toDouble / truth.size
      }
      val mean = recalls.sum / recalls.length
      info(s"tuned nProbe=${stored.get}, held-out recalls=${recalls.mkString(",")}")
      assert(mean >= 0.8, s"mean held-out recall $mean at tuned width $stored")
    } finally Tables.deleteRecursively(dir)
  }

  test("IVF-PQ: codes >=8x smaller than float vectors, recall >= 0.8 held-out at tuned nProbe, pruned code scan, deterministic") {
    import graft.ml.Pq
    val dir = java.nio.file.Files.createTempDirectory("ivf_pq").toString
    try {
      val corpus = emb.filter(col("vec_id") =!= 0)
      val built = Pq.build(corpus, "embedding", nCells = 16)
      val index = Pq.writeCodes(built, dir)
      // COMPRESSION: every code is exactly m bytes; the stored float
      // vectors are 4·dim bytes — the representation the codes replace.
      val dim = corpus.select(size(col("embedding"))).head().getInt(0)
      val codeBytes = index.codes.select(length(col("code")).cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
      assert(codeBytes == Seq(index.m.toLong),
        s"code byte lengths $codeBytes, expected exactly m=${index.m}")
      val ratio = (4.0 * dim) / index.m
      info(s"PQ compression: ${4 * dim} B -> ${index.m} B per vector (${ratio}x)")
      assert(ratio >= 8.0, s"compression $ratio < 8x")
      // RECALL at the tuned nProbe on held-out queries (outside the tuning
      // sample's smallest ids) — the ADC shortlist + exact re-rank must
      // hold the IVF family's bound.
      val heldOut = all.filter(_._1 != 0L).sortBy(-_._1).take(5)
      val recalls = heldOut.map { case (qid, q) =>
        val truth = all.filter(t => t._1 != 0L)
          .map { case (id, v) =>
            (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
          }
          .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
        val got = Pq.search(index, q, k = 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & truth).size.toDouble / truth.size
      }
      val mean = recalls.sum / recalls.length
      info(s"tuned nProbe=${index.tunedNProbe}, PQ held-out recalls=${recalls.mkString(",")}")
      assert(mean >= 0.8, s"mean PQ held-out recall $mean")
      // The code scan PRUNES: the probe filter reaches the partitioned
      // layout as a PartitionFilter, so unprobed cells are never read.
      val plan = Pq.search(index, query, k = 10)
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
          l.contains("PartitionFilters") && l.contains("cell")),
        s"no cell PartitionFilters in PQ code scan:\n$plan")
      // Deterministic across runs (seeded quantizer + seeded codebooks).
      val a = Pq.search(index, query, 10).select("vec_id")
        .collect().map(_.getLong(0)).toSeq
      val b = Pq.search(index, query, 10).select("vec_id")
        .collect().map(_.getLong(0)).toSeq
      assert(a == b, s"nondeterministic PQ search: $a vs $b")
    } finally Tables.deleteRecursively(dir)
  }
}
