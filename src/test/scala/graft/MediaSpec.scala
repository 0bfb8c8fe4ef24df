package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing tests: binary payload schema, REAL container decode
  * (BMP / WAV / Y4M header truth, stride handling), distributed batch
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

  test("payloads are real containers: magic bytes match the declared type") {
    for (a <- Media.syntheticAssets(spark, Sf0001).collect()) {
      val magic = new String(a.payload.take(9).map(b => (b & 0xff).toChar))
      a.media_type match {
        case "image" => assert(magic.startsWith("BM"), s"asset ${a.asset_id}")
        case "audio" => assert(magic.startsWith("RIFF") &&
          new String(a.payload.slice(8, 12).map(_.toChar)) == "WAVE",
          s"asset ${a.asset_id}")
        case "video" => assert(magic == "YUV4MPEG2", s"asset ${a.asset_id}")
      }
    }
  }

  test("decoder recovers the true header dimensions, not the metadata") {
    // decoded_* must come from the PAYLOAD: images and video frames carry
    // (width, height) in their headers; WAV's analog is (sample frames,
    // channels) — synthesized as width×height mono samples.
    val feats = Media.extractFeatures(Media.syntheticAssets(spark, Sf0001))
      .collect().map(f => f.asset_id -> f).toMap
    for (a <- Media.syntheticAssets(spark, Sf0001).collect()) {
      val f = feats(a.asset_id)
      a.media_type match {
        case "image" | "video" =>
          assert(f.decoded_width == a.width && f.decoded_height == a.height,
            s"asset ${a.asset_id}: parsed ${f.decoded_width}x${f.decoded_height} " +
              s"!= header ${a.width}x${a.height}")
        case "audio" =>
          assert(f.decoded_width == a.width * a.height && f.decoded_height == 1,
            s"asset ${a.asset_id}: parsed ${f.decoded_width} frames x " +
              s"${f.decoded_height} ch")
      }
      assert(if (a.media_type == "video") f.frames_sampled >= 1
        else f.frames_sampled == 1)
    }
  }

  test("BMP decode is stride-aware: padding bytes never reach the features") {
    // Hand-build a 3x2 24-bpp BMP whose 4-byte row stride holds JUNK
    // padding (a real encoder may emit garbage there); the decode must
    // skip it. 3 px * 3 B = 9 B rows padded to 12 — 3 junk bytes per row.
    val w = 3; val h = 2
    val rowSize = 12
    val b = new Array[Byte](54 + rowSize * h)
    b(0) = 'B'; b(1) = 'M'
    def putIntLE(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    putIntLE(2, b.length); putIntLE(10, 54); putIntLE(14, 40)
    putIntLE(18, w); putIntLE(22, h)
    b(26) = 1; b(28) = 24
    putIntLE(34, rowSize * h)
    for (y <- 0 until h; i <- 0 until rowSize) // pixel = 10, padding = junk
      b(54 + y * rowSize + i) = if (i < 9) 10.toByte else 0x7f.toByte
    val asset = Media.MediaAsset(0L, "image", w, h, b)
    import spark.implicits._
    val f = Media.extractFeatures(Seq(asset).toDS()).collect()(0)
    assert(f.decoded_width == 3 && f.decoded_height == 2)
    assert(f.mean_byte == 10.0,
      s"padding bytes leaked into the mean: ${f.mean_byte}")
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
    }
  }

  test("features join back to embeddings without payload bytes") {
    val joined = Media.featuresWithEmbeddings(spark, Sf0001)
    assert(!joined.schema.fields.exists(_.dataType == BinaryType))
    assert(joined.count() == 500)
    assert(joined.filter(col("phash").isNull).count() == 0)
  }

  test("resize: nearest-neighbor at identical dims reproduces the decoder's full-image mean") {
    // Synthetic image assets with (w, h) == (8, 6) — id % 48 == 0 and
    // id % 3 == 0 — are resized to EXACTLY their own dimensions, so the
    // 8×6 thumbnail picks every pixel once and its mean must equal the
    // decode stage's full-image mean, reached through a DIFFERENT
    // traversal (row ranges vs (ty, tx) picks). Integer byte sums are
    // exact, so this is equality, not tolerance.
    val assets = Media.syntheticAssets(spark, Sf0001)
    val feats = Media.extractFeatures(assets).toDF()
      .select(col("asset_id"), col("mean_byte"))
    val thumbs = Media.resizeThumbs(assets).toDF()
      .select(col("asset_id"), col("thumb_mean"), col("src_width"), col("src_height"))
    val both = feats.join(thumbs, "asset_id")
      .filter(col("asset_id") % 48 === 0 && col("asset_id") % 3 === 0)
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Int]("src_width") == 8 && r.getAs[Int]("src_height") == 6)
      assert(r.getAs[Double]("mean_byte") == r.getAs[Double]("thumb_mean"),
        s"asset ${r.getAs[Long]("asset_id")}: decode/resize mean diverged")
    }
  }

  test("resize covers every modality, is deterministic, and partition-invariant") {
    val assets = Media.syntheticAssets(spark, Sf0001)
    val a = Media.resizeThumbs(assets).toDF().orderBy("asset_id").collect()
    val b = Media.resizeThumbs(assets.repartition(13)).toDF()
      .orderBy("asset_id").collect()
    assert(a.toSeq == b.toSeq, "resize depends on partitioning")
    val byType = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byType.keySet == Set("image", "audio", "video"))
    // Thumbnails carry real signal: hashes are (near-)unique across assets.
    assert(a.map(_.getLong(7)).distinct.length > a.length * 9 / 10)
  }

  test("audio resize is a true nearest-index PCM resample (independent recompute)") {
    // Independently walk the RIFF layout for one audio asset and replay
    // the declared resample arithmetic (fi = i·nf/48) with separately
    // written code; mean and hash must match the operator's output.
    val a = Media.syntheticAssets(spark, Sf0001)
      .filter(col("asset_id") === 1L).head()
    val p = a.payload
    def le32(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    def le16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    var off = 12; var blockAlign = 0; var dataFrom = -1; var dataLen = 0
    while (off + 8 <= p.length) {
      val cid = new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(off + 4)
      if (cid == "fmt ") blockAlign = le16(off + 20)
      if (cid == "data") { dataFrom = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    val nf = dataLen / blockAlign
    var sum = 0L; var n = 0L; var h = 1125899906842597L
    for (i <- 0 until 48; b <- 0 until blockAlign) {
      val idx = dataFrom + (i * nf / 48) * blockAlign + b
      sum += p(idx) & 0xff; h = h * 31 + (p(idx) & 0xff); n += 1
    }
    val got = SparkEntry.queries("q_media_resize")(spark, Sf0001)
      .filter(col("asset_id") === 1L).head()
    assert(got.getAs[Long]("thumb_hash") == h)
    assert(got.getAs[Double]("thumb_mean") ==
      BigDecimal(sum.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
