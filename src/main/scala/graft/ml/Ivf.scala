package graft.ml

import graft.functions.Vec
import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second scale
  * path for similarity search beside LSH (north-star: "an IVF or
  * LSH-bucketed variant as the scale path"):
  *
  *  - build: a seeded k-means coarse quantizer assigns every vector to one
  *    of `nCells` cells — at 100 TB the vector table is WRITTEN partitioned
  *    by this cell id, so a probe becomes partition pruning at the scan;
  *  - search: pick the `nProbe` cells whose centroids are nearest the query
  *    (centroids are model parameters — a tiny driver-side array, not a
  *    data collect), scan only those cells, exact re-rank with the native
  *    vec_dot distance.
  *
  * Fraction of data touched ≈ nProbe/nCells; recall vs brute force is
  * asserted in IvfSpec.
  */
object Ivf {

  case class Index(assigned: DataFrame, model: KMeansModel,
                   arrayCol: String, idCol: String)

  /** Assign every embedding to its quantizer cell. */
  def build(embeddings: DataFrame, arrayCol: String, nCells: Int,
            seed: Long = 42L, idCol: String = "vec_id"): Index = {
    val model = Pipelines.kmeans(embeddings, arrayCol, nCells, seed)
    val assigned = model.transform(Pipelines.withFeatures(embeddings, arrayCol))
      .withColumnRenamed("prediction", "cell")
      .drop("features")
    Index(assigned, model, arrayCol, idCol)
  }

  /** Top-k by Euclidean distance among the nProbe nearest cells. */
  def search(index: Index, query: Array[Double], k: Int, nProbe: Int): DataFrame = {
    val probes = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }.take(nProbe).map(_._1)
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val q = Seq(Tuple1(query)).toDF("__ivf_qe")
    index.assigned
      .filter(col("cell").isin(probes.map(Integer.valueOf): _*))
      .crossJoin(broadcast(q))
      .withColumn("dist", Vec.euclid(index.arrayCol, "__ivf_qe"))
      .drop("__ivf_qe")
      .orderBy(col("dist"), col(index.idCol))
      .limit(k)
  }
}
