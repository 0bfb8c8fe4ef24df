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
  }

  test("IVF search is deterministic across runs") {
    val index = Ivf.build(emb.filter(col("vec_id") =!= 0), "embedding", nCells = 16)
    val a = Ivf.search(index, query, 10, 4).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Ivf.search(index, query, 10, 4).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 10)
  }
}
