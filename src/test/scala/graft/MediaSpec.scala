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
    var sawBmp = 0; var sawPng = 0
    for (a <- Media.syntheticAssets(spark, Sf0001).collect()) {
      val magic = new String(a.payload.take(9).map(b => (b & 0xff).toChar))
      a.media_type match {
        case "image" =>
          // Two image containers: raw BMP and compressed PNG (sniffed from
          // the magic, never the media_type).
          val png = (a.payload(0) & 0xff) == 0x89 && magic.substring(1, 4) == "PNG"
          assert(magic.startsWith("BM") || png, s"asset ${a.asset_id}")
          if (png) sawPng += 1 else sawBmp += 1
        case "audio" => assert(magic.startsWith("RIFF") &&
          new String(a.payload.slice(8, 12).map(_.toChar)) == "WAVE",
          s"asset ${a.asset_id}")
        case "video" => assert(magic == "YUV4MPEG2", s"asset ${a.asset_id}")
      }
    }
    assert(sawBmp > 0 && sawPng > 0, s"both image containers must appear: bmp=$sawBmp png=$sawPng")
  }

  test("PNG decode: independent chunk walk + inflate + unfilter reproduces the features; multi-IDAT exercised") {
    val pngs = Media.syntheticAssets(spark, Sf0001)
      .filter(col("asset_id") % 4 === 3).collect().take(8)
    assert(pngs.nonEmpty)
    val feats = Media.extractFeatures(Media.syntheticAssets(spark, Sf0001))
      .collect().map(f => f.asset_id -> f).toMap
    for (a <- pngs) {
      val p = a.payload
      def be32(o: Int) = ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
        ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
      // Independent walk (separately written from Media.pngPixels).
      assert((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      var off = 8; var w = 0; var h = 0; var nIdat = 0
      val zs = new java.io.ByteArrayOutputStream()
      while (off + 8 <= p.length) {
        val len = be32(off)
        val tag = new String(p, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        // CRC of every chunk must validate (tag + data).
        val crc = new java.util.zip.CRC32()
        crc.update(p, off + 4, 4 + len)
        assert(crc.getValue.toInt == be32(off + 8 + len),
          s"asset ${a.asset_id}: chunk $tag CRC mismatch")
        if (tag == "IHDR") { w = be32(off + 8); h = be32(off + 12) }
        if (tag == "IDAT") { nIdat += 1; zs.write(p, off + 8, len) }
        off += 12 + len
      }
      assert(nIdat >= 2, s"asset ${a.asset_id}: expected a multi-IDAT stream, got $nIdat")
      assert(w == a.width && h == a.height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(zs.toByteArray)
      val scan = new Array[Byte](h * (1 + w * 3))
      var got = 0
      while (!inf.finished()) got += inf.inflate(scan, got, scan.length - got)
      inf.end()
      assert(got == scan.length)
      // Unfilter (encoder rotates None/Sub/Up) with separately written code.
      val px = Array.ofDim[Int](h, w * 3)
      for (y <- 0 until h) {
        val ft = scan(y * (1 + w * 3)) & 0xff
        for (i <- 0 until w * 3) {
          val x = scan(y * (1 + w * 3) + 1 + i) & 0xff
          px(y)(i) = ft match {
            case 0 => x
            case 1 => (x + (if (i >= 3) px(y)(i - 3) else 0)) & 0xff
            case 2 => (x + (if (y > 0) px(y - 1)(i) else 0)) & 0xff
          }
        }
      }
      var sum = 0L; var n = 0L; var hh = 1125899906842597L
      for (y <- 0 until h; i <- 0 until w * 3) {
        sum += px(y)(i); hh = hh * 31 + px(y)(i); n += 1
      }
      val f = feats(a.asset_id)
      assert(f.decoded_width == w && f.decoded_height == h)
      assert(f.mean_byte == sum.toDouble / n, s"asset ${a.asset_id}: mean diverged")
      assert(f.phash == hh, s"asset ${a.asset_id}: hash diverged")
    }
  }

  test("PNG resize at source dims reproduces the decoder's full-image mean") {
    import spark.implicits._
    val asset = Media.MediaAsset(7L, "image", 8, 6, Media.encodePng(7L, 8, 6))
    val f = Media.extractFeatures(Seq(asset).toDS()).collect()(0)
    val t = Media.resizeThumbs(Seq(asset).toDS(), tw = 8, th = 6).collect()(0)
    assert(t.src_width == 8 && t.src_height == 6)
    assert(t.thumb_mean == f.mean_byte,
      "PNG decode/resize mean diverged at identity dims")
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
      .filter(col("asset_id") % 48 === 0 && col("asset_id") % 4 === 0)
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

  test("q_dedup_media rediscovers exactly the planted re-upload clusters") {
    // Planted structure: content is a pure function of doc_id % 211, so
    // the expected clusters are the seed groups with >= 2 members.
    val ids = Tables.documents(spark, Sf0001).select(col("doc_id"))
      .collect().map(_.getLong(0))
    val bySeed = ids.groupBy(_ % 211).filter(_._2.length >= 2)
    val expected = bySeed.map { case (seed, members) =>
      (Seq("image", "audio", "video", "image")((seed % 4).toInt),
        members.length.toLong, members.min)
    }.toSeq.sorted
    val got = SparkEntry.queries("q_dedup_media")(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got.nonEmpty, "the re-upload corpus must contain duplicates")
    assert(got == expected,
      s"cluster drift: ${got.take(5)}... vs planted ${expected.take(5)}...")
    // The hash must come from the payload, not the id: two members of one
    // cluster decode to the same phash under a direct decode.
    val seed = bySeed.keys.head
    val pair = bySeed(seed).sorted.take(2)
    val feats = Media.extractFeatures(
        Media.syntheticDupAssets(spark, Sf0001))
      .filter(col("asset_id").isin(pair: _*))
      .collect()
    assert(feats.length == 2 && feats(0).phash == feats(1).phash)
  }

  // ------------------------------ JPEG / javax.imageio real-codec tier (r18)

  test("JPEG decode: the javax.imageio tier round-trips the encoded test pattern") {
    import SparkFixture.spark.implicits._
    val assets = (1L to 24L).map { id =>
      val (w, h) = (((id % 16) * 2 + 8).toInt, ((id % 12) * 2 + 6).toInt)
      Media.MediaAsset(id, "image", w, h, Media.encodeJpeg(id, w, h))
    }
    // Real JPEG magic + JDK decode through the SAME codec seam as every
    // other container (sniffed, batched mapPartitions).
    assert(assets.forall(a => (a.payload(0) & 0xff) == 0xff &&
      (a.payload(1) & 0xff) == 0xd8), "payloads are not JPEG")
    val feats = Media.extractFeatures(
      SparkFixture.spark.createDataset(assets)).collect().sortBy(_.asset_id)
    assert(feats.length == 24)
    for ((f, a) <- feats.zip(assets)) {
      // Header truth: dims come from the decoded stream.
      assert(f.decoded_width == a.width && f.decoded_height == a.height,
        s"asset ${a.asset_id}: decoded dims drift")
      // The encoded pattern is mid-brightness gradients; a lossy decode
      // must still land in the interior, not at the clip rails.
      assert(f.mean_byte > 32 && f.mean_byte < 224,
        s"asset ${a.asset_id}: implausible decoded mean ${f.mean_byte}")
    }
    // Content-addressing survives the lossy codec: byte-identical
    // payloads hash identically; different seeds hash apart.
    val dup = Media.extractFeatures(SparkFixture.spark.createDataset(Seq(
      Media.MediaAsset(100L, "image", 16, 12, Media.encodeJpeg(5L, 16, 12)),
      Media.MediaAsset(200L, "image", 16, 12, Media.encodeJpeg(5L, 16, 12)),
      Media.MediaAsset(300L, "image", 16, 12, Media.encodeJpeg(6L, 16, 12)))))
      .collect().sortBy(_.asset_id)
    assert(dup(0).phash == dup(1).phash, "same payload, different phash")
    assert(dup(0).phash != dup(2).phash, "different payloads collide")
  }

  test("JPEG resize at source dims reproduces the decoder's full-image mean") {
    import SparkFixture.spark.implicits._
    val a = Media.MediaAsset(7L, "image", 20, 14, Media.encodeJpeg(7L, 20, 14))
    val ds = SparkFixture.spark.createDataset(Seq(a))
    val full = Media.extractFeatures(ds).collect().head
    val thumb = Media.resizeThumbs(ds, tw = 20, th = 14).collect().head
    assert(thumb.src_width == 20 && thumb.src_height == 14)
    assert(math.abs(thumb.thumb_mean - full.mean_byte) < 1e-9,
      s"identity resize mean ${thumb.thumb_mean} != decode mean ${full.mean_byte}")
    val small = Media.resizeThumbs(ds, tw = 8, th = 6).collect().head
    assert(small.thumb_w == 8 && small.thumb_h == 6 &&
      small.thumb_hash != thumb.thumb_hash)
  }

  test("PNG cross-check: the hand-rolled unfilter agrees with javax.imageio byte-for-byte") {
    // The r15 PNG decoder (chunk walk + inflate + Paeth unfilter) verified
    // against the JDK's INDEPENDENT codec on the same payloads — a real
    // second implementation, not a fixture replay.
    for (id <- 1L to 16L) {
      val (w, h) = (((id % 16) * 2 + 8).toInt, ((id % 12) * 2 + 6).toInt)
      val p = Media.encodePng(id, w, h)
      val (w1, h1, px1) = Media.pngPixels(id, p)
      val (w2, h2, px2) = Media.imageioPixels(id, p)
      assert(w1 == w2 && h1 == h2, s"png $id: dim drift")
      assert(java.util.Arrays.equals(px1, px2),
        s"png $id: hand-rolled pixels diverge from javax.imageio")
    }
  }

  test("media quarantine: exactly the planted corruptions drop; survivors decode unchanged") {
    import graft.multimodal.Media
    val routed = Media.decodeRouted(
      Media.syntheticCorruptAssets(spark, Sf0001)).collect()
    val planted = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") % 37 === 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "fixture degenerate: no corruption planted")
    val quarantined = routed.filter(!_.ok)
    assert(quarantined.map(_.asset_id).toSet == planted,
      "quarantine set != planted corruption set")
    assert(quarantined.forall(_.reason.startsWith("decode_failed:")),
      "quarantine rows must carry a deterministic reason")
    // Survivors flow through the IDENTICAL decode: features byte-equal to
    // the clean (non-routing) path's.
    val clean = Media.extractFeatures(Media.syntheticAssets(spark, Sf0001))
      .collect().map(f => f.asset_id -> f).toMap
    for (r <- routed if r.ok) {
      val c = clean(r.asset_id)
      assert((r.phash, r.mean_byte, r.decoded_width, r.decoded_height,
        r.frames_sampled) ==
        (c.phash, c.mean_byte, c.decoded_width, c.decoded_height,
          c.frames_sampled),
        s"survivor ${r.asset_id} decoded differently under routing")
    }
  }
}
