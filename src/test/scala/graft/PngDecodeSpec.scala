package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Real PNG pixel decode (m19): the inflate + de-filter chain must
  * reproduce the synthesis pixels bit-exactly through all five
  * scanline filters and the split-IDAT stream; poison and malformed
  * payloads degrade to no-row, never an exception; and the dHash
  * banding over DECODED pixels obeys the pigeonhole law. */
class PngDecodeSpec extends SparkSpec {

  import spark.implicits._

  test("round trip: synth -> decode reproduces the recipe pixels through all five filters") {
    val texts = Seq(
      (0L, "hello spark graft engine, the quick brown fox"),
      (1L, "aaaaaaaaaaaaaaaa"),                       // constant rows
      (2L, "héllo wörld — ünïcode çôde pòints"),      // non-ASCII
      (5L, "x"))                                      // len 1: every pixel equal
    val blobs = Multimodal.synthGrayPngs(texts.toDF("doc_id", "text"))
    val decoded = Multimodal.pngGrayPixels(blobs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getSeq[Int](3))).toMap
    assert(decoded.keySet === texts.map(_._1).toSet)
    texts.foreach { case (id, text) =>
      val cps = text.codePoints().toArray
      val expected = (0 until 12 * 22).map(i =>
        math.floorMod(cps(i % cps.length), 256))
      val (w, h, px) = decoded(id)
      assert((w, h) === (22, 12))
      assert(px.toSeq === expected, s"pixel mismatch for doc $id")
    }
  }

  test("decoder agrees with an INDEPENDENT encoder (javax.imageio) on a grayscale PNG") {
    // ImageIO picks its own scanline filters and chunking — a true
    // second implementation; our inflate + de-filter must agree
    val (w, h) = (22, 12)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + 29) % 256)))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val decoded = Multimodal.pngGrayPixels(
        Seq((1L, baos.toByteArray)).toDF("doc_id", "payload"))
      .collect()
    assert(decoded.length === 1)
    val px = decoded(0).getSeq[Int](3)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      assert(px(y * w + x) === img.getRaster.getSample(x, y, 0),
        s"pixel ($x,$y)")
    })
  }

  test("degradation: poison zlib, truncated payloads, and non-PNGs yield no row, never a throw") {
    val texts = Seq((7L, "poison target: doc_id % 10 == 7"),
      (17L, "second poison"), (3L, "healthy"))
    val blobs = Multimodal.synthGrayPngs(texts.toDF("doc_id", "text"))
    val ids = Multimodal.pngGrayPixels(blobs)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids === Set(3L), "poison zlib rows must be skipped")
    // truncated mid-IDAT: the inflate comes up short -> no row
    val truncated = blobs.filter($"doc_id" === 3L)
      .select($"doc_id", expr("substring(payload, 1, 60)").as("payload"))
    assert(Multimodal.pngGrayPixels(truncated).count() === 0)
    // a non-PNG payload never reaches the seam
    val junk = Seq((9L, "plain text, no signature".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(Multimodal.pngGrayPixels(junk).count() === 0)
  }

  test("dHash over decoded pixels: banding pairs equal brute-force Hamming pairs and find the planted dups") {
    val blobs = Multimodal.synthGrayPngs(
      Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    val ph = Caches.persist(Multimodal
      .decodedPhash(Multimodal.pngGrayPixels(blobs))
      .select($"doc_id", $"phash"))
    val banded = Multimodal.phashPairs(ph, maxHamming = 5, maxBucket = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = ph.as("x").join(ph.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id",
        expr("cast(bit_count(x.phash ^ y.phash) as int)").as("h"))
      .filter($"h" <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute,
      "pigeonhole banding must equal exact Hamming at maxHamming <= 5")
    assert(banded.nonEmpty,
      "the corpus's planted near-dup documents must surface as image pairs")
    Caches.releaseAll()
  }
}
