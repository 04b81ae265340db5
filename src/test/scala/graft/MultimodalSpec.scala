package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing contracts: the decode/resize/frame steps are
  * declared deterministic fakes (no media libs in the container), but
  * the schemas, batch shapes, partition behavior, and output
  * contracts they exercise are the real interface a JNI/Arrow decoder
  * plugs into — so those are what this spec pins.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    (0L until 30L).map(i => (i, s"document number $i with some text body " * (i.toInt % 3 + 1)))
      .toDF("doc_id", "text")
  }

  test("syntheticAssets: schema matches assetSchema; media type cycles deterministically") {
    val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")
    assert(assets.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.assetSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val types = assets.select("asset_id", "media_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types(0L) == "image" && types(1L) == "audio" && types(2L) == "video")
    assert(types(3L) == "image", "media type cycles with id % 3")
  }

  test("describeAssets: byte length and hash computed without decoding") {
    val desc = Multimodal.describeAssets(
      Multimodal.syntheticAssets(docs, "doc_id", "text")).collect()
    assert(desc.length == 30)
    desc.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16)
    }
  }

  test("decodeFeaturesStub: fixed-dim vectors, deterministic across runs and partitioning") {
    val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val a = Multimodal.decodeFeaturesStub(assets, dim = 16)
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Multimodal.decodeFeaturesStub(assets.repartition(7), dim = 16)
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.values.forall(_.length == 16))
    assert(a == b, "features must not depend on partitioning")
    assert(a(0L) != a(1L), "distinct content yields distinct features")
  }

  test("resizeStub: aspect-ratio-preserving clamp to maxSide, bytes re-encoded") {
    val resized = Multimodal.resizeStub(
      Multimodal.syntheticAssets(docs, "doc_id", "text"), maxSide = 64).collect()
    resized.foreach { r =>
      // exact expected dims from the synthetic formulas — BOTH sides
      // must shrink by the SAME scale (a ≤-bound alone missed the
      // lazy-Column bug where landscape heights skipped the scale)
      val id = r.getAs[Long]("asset_id")
      val w0 = (id % 64) * 16 + 16
      val h0 = (id % 48) * 16 + 16
      val scale = math.min(1.0, 64.0 / math.max(w0, h0))
      assert(r.getAs[Int]("width") == (w0 * scale).toInt, s"asset $id width")
      assert(r.getAs[Int]("height") == (h0 * scale).toInt, s"asset $id height")
      assert(r.getAs[Array[Byte]]("content").length <= 4096)
    }
  }

  test("sampleFramesStub: only video rows, evenly spaced frame timestamps") {
    val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")
    val frames = Multimodal.sampleFramesStub(assets, everyMs = 500L)
    val byAsset = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), max("frame_ts_ms").as("maxTs")).collect()
    val videoIds = assets.filter(col("media_type") === "video")
      .select("asset_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byAsset.map(_.getLong(0)).toSet == videoIds.keySet,
      "exactly the video assets produce frames")
    byAsset.foreach { r =>
      val dur = videoIds(r.getLong(0))
      assert(r.getLong(1) == dur / 500L + 1, "evenly spaced every 500ms incl. t=0")
      assert(r.getAs[Long]("maxTs") <= dur)
    }
  }

  // structured media: alternating high/low chunks, so every chunk
  // mean sits FAR from the vector mean and the fingerprint is robust
  // to small perturbations (bit b flips only if chunk b's content
  // crosses the global mean)
  private def structuredBytes(flipChunk: Int = -1, invert: Boolean = false): Array[Byte] =
    structuredBytesFlips(if (flipChunk < 0) Set.empty else Set(flipChunk), invert)

  private def structuredBytesFlips(flips: Set[Int], invert: Boolean = false): Array[Byte] = {
    val dim = 8; val chunk = 16
    val out = new Array[Byte](dim * chunk)
    for (c <- 0 until dim; i <- 0 until chunk) {
      val high = (c % 2 == 0) != invert
      val flipped = if (flips(c)) !high else high
      out(c * chunk + i) = if (flipped) 200.toByte else 10.toByte
    }
    out
  }

  private def phPairs(rows: Seq[(Long, Array[Byte])], maxHamming: Int = 3) = {
    import spark.implicits._
    Multimodal.perceptualHashPairs(
      Multimodal.perceptualFeaturesStub(
        rows.toDF("asset_id", "content"), dim = 8)
        .select(col("asset_id"), col("features")),
      "asset_id", "features", dim = 8, maxHamming = maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("imageBlockLuma: a re-encoded (visually identical) image still " +
      "pairs; undecodable bytes fall back to the byte fake (r19)") {
    // the r18 verdict's #5: the default bytes → features path decodes
    // REAL pixels (javax.imageio) through the same swap slot the
    // oracle fake flows through. The byte fake could never pair a PNG
    // with its JPEG re-encode (different byte streams); the pixel
    // decoder must — that a visually identical re-encode pairs is the
    // proof the decoder is live, not the fallback.
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def draw(seed: Int): BufferedImage = {
      val im = new BufferedImage(96, 96, BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      // blocky BIMODAL tiles (structure survives JPEG; values far
      // from the global mean so lossy re-encode shifts of a few gray
      // levels cannot flip mean-threshold bits)
      for (ty <- 0 until 8; tx <- 0 until 8) {
        val v = if (rnd.nextBoolean()) 215 + rnd.nextInt(30)
                else 10 + rnd.nextInt(30)
        val rgb = (v << 16) | (v << 8) | v
        for (y <- ty * 12 until (ty + 1) * 12;
             x <- tx * 12 until (tx + 1) * 12) im.setRGB(x, y, rgb)
      }
      im
    }
    def enc(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(im, fmt, bos), s"no $fmt writer in this JVM")
      bos.toByteArray
    }
    val a = draw(1)
    val pngA = enc(a, "png"); val jpgA = enc(a, "jpg")
    val pngB = enc(draw(2), "png")
    assert(!java.util.Arrays.equals(pngA, jpgA),
      "the re-encode must actually change the byte stream")
    import spark.implicits._
    val assets = Seq((1L, pngA), (2L, jpgA), (3L, pngB))
      .toDF("asset_id", "content")
    val feats = Multimodal.perceptualFeatures(assets, dim = 64)
    val pairs = Multimodal
      .perceptualHashPairs(feats, "asset_id", "features", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      s"a PNG and its JPEG re-encode must pair on decoded pixels: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated images must not pair: $pairs")
    // bytes no reader accepts fall back to the byte-chunk fake EXACTLY
    // (vectors stay total + deterministic for the replay contract)
    val junk = Array.tabulate[Byte](999)(i => (i * 31).toByte)
    assert(Multimodal.imageBlockLuma(64)(junk) ==
      Multimodal.byteChunkMeans(64)(junk),
      "undecodable bytes must take the byte-fake fallback verbatim")
    // non-square dims have no grid; dim = 0 passes 0*0 == 0 but has
    // no cells (review r19)
    intercept[IllegalArgumentException] { Multimodal.imageBlockLuma(60) }
    intercept[IllegalArgumentException] { Multimodal.imageBlockLuma(0) }
    intercept[IllegalArgumentException] { Multimodal.byteChunkMeans(0) }
  }

  test("mm decoded entries (r20): every PNG pairs its JPEG sibling, " +
      "raw rows ride the byte fallback — in the driver-gated queries") {
    // the driver-gate twin of the unit pin above: the CORRECTNESS
    // entries' feature column must come from LIVE pixel decodes —
    // proven by the 40 cross-codec (3k, 3k+1) sibling pairs (same
    // drawTiled pixels, disjoint byte streams) that the byte fake
    // could never produce — with the undecodable raw rows (id%3==2,
    // text bytes) flowing through byteChunkMeans in the SAME entry
    val dir = "/root/testdata/sf0.001"
    val pairs = Queries.mmNeardupDecoded(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedSiblings = (0 until Queries.mmDecodedCount by 3)
      .map(k => (k.toLong, (k + 1).toLong)).toSet
    assert(expectedSiblings.subsetOf(pairs),
      s"every PNG must pair its JPEG re-encode sibling; missing: " +
        s"${(expectedSiblings -- pairs).take(5)}")
    val feats = Queries.mmFeaturesDecoded(spark, dir).collect()
    assert(feats.length == Queries.mmDecodedCount)
    assert(feats.map(_.getString(1)).toSet == Set("png", "jpg", "raw"),
      "the entry must carry all three codec classes")
    // a raw row's features ARE the byte fake's (fallback verbatim);
    // HALF_UP to mirror Spark's round()
    val doc2Text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 2).select("text").collect()(0).getString(0)
    val expect2 = Multimodal.byteChunkMeans(64)(
      doc2Text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val row2 = feats.find(_.getLong(0) == 2L).get
    assert(row2.getDouble(2) == BigDecimal(expect2(0).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "raw rows must take the byteChunkMeans fallback verbatim")
  }

  test("perceptualHashPairs: identical, locally-edited, and inverted media") {
    val got = phPairs(Seq(
      1L -> structuredBytes(),            // base
      2L -> structuredBytes(),            // byte-identical -> hamming 0
      3L -> structuredBytes(flipChunk = 2), // one chunk edited -> hamming 1
      4L -> structuredBytes(invert = true)  // complement -> hamming 8, no pair
    ))
    assert(got.contains((1L, 2L, 0)), s"identical media must pair at 0: $got")
    assert(got.contains((1L, 3L, 1)) && got.contains((2L, 3L, 1)),
      s"a single-chunk edit must pair at hamming 1: $got")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      s"the inverted asset must pair with nothing: $got")
  }

  test("perceptualHashPairs: banded pair set equals brute force (pigeonhole recall)") {
    // varied synthetic corpus: every subset-of-chunks edit distance
    val rows = for (k <- 0L until 20L) yield
      k -> structuredBytes(flipChunk = (k % 9).toInt - 1) // -1 = no flip
    val banded = phPairs(rows)
    // brute force in plain Scala over the same chunk-mean fingerprints
    val chunkOf: Array[Byte] => Seq[Double] = { b =>
      b.grouped(16).map(c => c.map(x => (x & 0xFF) / 255f).sum.toDouble / 16).toSeq
    }
    val sigs = rows.map { case (id, b) =>
      val f = chunkOf(b); val m = f.sum / 8
      id -> f.map(_ > m)
    }
    val brute = (for {
      (ia, fa) <- sigs; (ib, fb) <- sigs if ia < ib
      h = fa.zip(fb).count { case (x, y) => x != y } if h <= 3
    } yield (ia, ib, h)).toSet
    assert(banded == brute,
      s"banded must equal brute force: missing=${brute -- banded} extra=${banded -- brute}")
  }

  test("perceptualHashPairs: structureless (constant-vector) assets never pair") {
    // empty content -> all-zero features; uniform content -> constant
    // features; both fingerprint to all-zero bands. Without the
    // degenerate-row guard every such asset shares the (band, 0)
    // buckets and pairs at hamming 0 with every other — a quadratic
    // clique calling an empty file and a solid-gray image near-dups.
    val got = phPairs(Seq(
      1L -> Array.empty[Byte],                 // empty "file"
      2L -> Array.empty[Byte],                 // second empty
      3L -> Array.fill(128)(200.toByte),       // solid "gray" image
      4L -> Array.fill(128)(200.toByte),       // second solid image
      5L -> structuredBytes()                  // one real asset
    ))
    assert(got.isEmpty,
      s"constant-vector assets must be excluded from pairing, got: $got")
  }

  test("perceptualHashPairs: hamming == maxHamming is recalled; shared-band hamming 4 is filtered") {
    // 3 flipped chunks land one differing bit in each of bands 0..2
    // (width 2), leaving band 3 shared — the pigeonhole recall case
    // EXACTLY at the radius. An off-by-one in the band count (bands =
    // maxHamming instead of +1) would lose this pair.
    val atRadius = phPairs(Seq(
      1L -> structuredBytes(),
      2L -> structuredBytesFlips(Set(0, 2, 4))))
    assert(atRadius == Set((1L, 2L, 3)),
      s"a hamming-3 pair must be recalled exactly at the radius: $atRadius")
    // 4 flipped chunks differ in bands 0 and 1 but SHARE bands 2 and
    // 3 — a banded-join candidate that the exact bit_count verify
    // must drop (hamming 4 > maxHamming 3). A '<=' vs '<' slip or a
    // missing verify would emit it.
    val overRadius = phPairs(Seq(
      1L -> structuredBytes(),
      2L -> structuredBytesFlips(Set(0, 1, 2, 3))))
    assert(overRadius.isEmpty,
      s"a shared-band pair at hamming 4 must be verified away: $overRadius")
  }
}
