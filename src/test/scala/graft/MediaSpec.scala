package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: binary payload schema, distributed batch
  * decode determinism, partition invariance, downstream join. */
class MediaSpec extends AnyFunSuite {
  import SparkFixture._

  test("synthetic assets carry a true binary payload column + metadata") {
    val a = Media.syntheticAssets(spark, Sf0001)
    assert(a.schema("payload").dataType == BinaryType)
    assert(a.count() == 500)
    val types = a.toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and partition-invariant") {
    val a = Media.syntheticAssets(spark, Sf0001)
    val f1 = Media.extractFeatures(a, batchSize = 64).collect()
      .map(f => f.asset_id -> f).toMap
    val f2 = Media.extractFeatures(a.repartition(7), batchSize = 3).collect()
      .map(f => f.asset_id -> f).toMap
    assert(f1.keySet == f2.keySet && f1.keySet.size == 500)
    f1.foreach { case (id, f) =>
      assert(f == f2(id), s"asset $id differs across partitionings")
      assert(f.n_bytes > 0 && f.mean_byte > 0.0)
      assert(if (f.media_type == "video") f.frames_sampled >= 1 else f.frames_sampled == 1)
    }
  }

  test("features join back to embeddings without payload bytes") {
    val joined = Media.featuresWithEmbeddings(spark, Sf0001)
    assert(!joined.schema.fields.exists(_.dataType == BinaryType))
    assert(joined.count() == 500)
    assert(joined.filter(col("phash").isNull).count() == 0)
  }
}
