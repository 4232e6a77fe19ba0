package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic, shuffle-free and drops payloads") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3)),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9)),
      Multimodal.MediaRow(3L, "image", Array[Byte]())).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 3 && feats(2L).n_bytes == 2 && feats(3L).n_bytes == 0)
    // deterministic stub dimensions
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert((1L to 3L).forall(i =>
      feats(i).width == again(i).width && feats(i).height == again(i).height &&
        feats(i).checksum == again(i).checksum))
    // no shuffle in the plan
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("resize clamps dimensions to the box and shrinks payload by area") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array.tabulate[Byte](1000)(_.toByte)),
      Multimodal.MediaRow(2L, "image", Array[Byte](5))).toDS()
    val out = Multimodal.resize(media, 64, 64).collect().map(r => r.media_id -> r).toMap
    out.values.foreach { r =>
      assert(r.width <= 64 && r.height <= 64 && r.width >= 1 && r.height >= 1)
      assert(r.payload.length >= 1)
    }
    // determinism
    val again = Multimodal.resize(media, 64, 64).collect().map(r => r.media_id -> r).toMap
    assert(out.keys.forall(k => out(k).width == again(k).width &&
      out(k).payload.length == again(k).payload.length))
  }

  test("frame sampling emits n contiguous non-overlapping slices per doc") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val media = Seq(Multimodal.MediaRow(7L, "video", payload),
      Multimodal.MediaRow(8L, "video", Array[Byte]())).toDS()
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.count(_.media_id == 7L) == 4)
    assert(frames.count(_.media_id == 8L) == 0) // empty payload -> no frames
    val back = frames.filter(_.media_id == 7L).sortBy(_.frame_idx)
      .flatMap(_.payload)
    assert(back.sameElements(payload)) // evenly-spaced slices cover exactly
  }

  test("strideFrames slices bytes exactly and fingerprints match the slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val payload = Array.tabulate[Byte](250)(_.toByte)
    val media = Seq(Multimodal.MediaRow(1L, "video", payload),
      Multimodal.MediaRow(2L, "video", Array[Byte]())).toDS().toDF()
    val frames = Multimodal.strideFrames(media, frameLen = 100, stride = 80)
      .orderBy("media_id", "frame_idx").collect()
    // 250 bytes, stride 80 -> offsets 0, 80, 160, 240
    assert(frames.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, 0, 0, 100), (1L, 1, 80, 100), (1L, 2, 160, 90),
        (1L, 3, 240, 10)))
    // fingerprint = xxhash64 of the actual slice (recomputed independently)
    val expected = Seq(0, 80, 160, 240).map { off =>
      val slice = payload.slice(off, math.min(off + 100, 250))
      spark.range(1).select(xxhash64(lit(slice))).collect()(0).getLong(0)
    }
    assert(frames.map(_.getLong(4)).toSeq == expected)
  }

  test("ImageIoDecoder reads real PNG and JPEG dimensions without pixel decode") {
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x123456)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    assert(Multimodal.ImageIoDecoder.decode("image/png", encoded("png", 37, 19)) == (37, 19))
    assert(Multimodal.ImageIoDecoder.decode("image/jpeg", encoded("jpg", 128, 64)) == (128, 64))
    // garbage payloads error loudly instead of returning fake dims
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("image/png", Array[Byte](1, 2, 3))
    }
  }

  test("PNG synthesis round-trips through the real decoder distributed") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val feats = Multimodal.extractFeatures(
        Multimodal.documentsAsPngMedia(spark, sf), Multimodal.ImageIoDecoder)
      .toDF()
    // decoded dims must equal the synthesis formula for every document
    val bad = feats.filter(
      col("width") =!= (lit(16) + col("media_id") % 32).cast("int") ||
      col("height") =!= (lit(16) + col("media_id") % 17).cast("int"))
    assert(bad.count() == 0)
    assert(feats.count() ==
      graft.Tables(spark, sf, "documents").count())
  }

  test("documents-as-media payload bytes equal utf-8 text length") {
    val sf = "/root/testdata/sf0.001"
    val feats = Multimodal.extractFeatures(
      Multimodal.documentsAsMedia(spark, sf))
    val viaSql = graft.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "cast(octet_length(text) AS bigint) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.collect().foreach { f =>
      assert(f.n_bytes == viaSql(f.media_id), s"doc ${f.media_id}")
    }
  }

  test("dHash64: dimension-invariant on grid-aligned patterns, signature = pattern bits") {
    def patternPng(p: Int, w: Int, h: Int): Array[Byte] = {
      val v = new Array[Int](9)
      v(0) = 128
      (0 until 8).foreach(i =>
        v(i + 1) = v(i) + (if (((p >> i) & 1) == 1) 8 else -8))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 9).foreach { gx =>
        (gx * w / 9 until (gx + 1) * w / 9).foreach { x =>
          val g = v(gx); val rgb = (g << 16) | (g << 8) | g
          (0 until h).foreach(y => img.setRGB(x, y, rgb))
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    (0 until 16).foreach { p =>
      val h16 = Multimodal.dHash64(patternPng(p, 16, 16))
      val h47 = Multimodal.dHash64(patternPng(p, 47, 32))
      assert(h16 == h47, s"pattern $p not dimension-invariant")
      // every 8-bit row of the hash is the pattern's bit signature
      (0 until 8).foreach { row =>
        assert(((h16 >>> (row * 8)) & 0xff) == p, s"pattern $p row $row")
      }
    }
    // distinct patterns -> distinct hashes (16 clusters, not fewer)
    val all = (0 until 16).map(p => Multimodal.dHash64(patternPng(p, 20, 18)))
    assert(all.distinct.size == 16)
  }

  test("dHash64 is codec-robust: JPEG vs PNG of one image collide, distinct images stay distant") {
    // The perceptual-dedup family's JPEG coverage: the decode path is
    // format-agnostic (ImageIO picks the reader from the payload), so the
    // SAME image encoded losslessly (PNG) and lossily (JPEG, the JDK's
    // default ~0.75 quality) must land within a few Hamming bits — JPEG's
    // block noise cannot flip a 9x8 area-averaged luma gradient — while a
    // genuinely different image stays tens of bits away. This is exactly
    // the contract q198b's Hamming-banded near-dup query relies on:
    // re-encoded copies collide in a band, unrelated images do not.
    def gray(f: (Int, Int) => Int, w: Int = 64, h: Int = 64) = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val ramp     = gray((x, _) => 32 + x * 3)       // smooth horizontal ramp
    val reversed = gray((x, _) => 223 - x * 3)      // opposite-direction ramp
    val png  = Multimodal.dHash64(enc(ramp, "png"))
    val jpg  = Multimodal.dHash64(enc(ramp, "jpg"))
    val far  = Multimodal.dHash64(enc(reversed, "jpg"))
    assert(ham(png, jpg) <= 4,
      s"JPEG re-encode moved the hash ${ham(png, jpg)} bits; must be a near-dup")
    assert(ham(png, far) >= 32,
      s"reversed ramp only ${ham(png, far)} bits away; must be distant")
  }
}
