package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("m3 parses PNG IHDR fields back out of the synthesized blobs") {
    import spark.implicits._
    val rows = Multimodal.m3ImageMeta(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"doc $id signature")
      assert(r.getLong(2) == 16 + id % 64, s"doc $id width")
      assert(r.getLong(3) == 16 + (id * 7) % 64, s"doc $id height")
      assert(r.getLong(4) == 8, s"doc $id bit depth")
    }
  }

  test("m3 parser flags non-PNG payloads instead of failing") {
    import spark.implicits._
    val junk = Seq((1L, "not a png at all, just text bytes"))
      .toDF("doc_id", "s")
      .select($"doc_id", $"s".cast("binary").as("payload"))
    val row = Multimodal.parseImageHeader(junk).collect().head
    assert(!row.getBoolean(1))
  }

  test("m4 parser decodes a ByteBuffer-built canonical WAV header") {
    import spark.implicits._
    // header built with java.nio LITTLE_ENDIAN — fully independent of
    // the operator's hex/shift synthesis path
    val data = "0123456789abcdef".getBytes("UTF-8")
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1)
      .putShort(2)            // channels
      .putInt(44100)          // sample rate
      .putInt(44100 * 4)      // byte rate
      .putShort(4)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    val df = Seq((7L, bb.array())).toDF("doc_id", "payload")
    val r = Multimodal.parseAudioHeader(df).collect().head
    assert(r.getBoolean(1), "is_wav")
    assert(r.getLong(2) == 1L, "audio_format")
    assert(r.getLong(3) == 2L, "channels")
    assert(r.getLong(4) == 44100L, "rate")
    assert(r.getLong(5) == 176400L, "byte rate")
    assert(r.getLong(6) == 4L, "block align")
    assert(r.getLong(7) == 16L, "bits")
    assert(r.getLong(8) == data.length.toLong, "data size")
    // 16 bytes at 176400 B/s = 90.7 µs, floored
    assert(r.getLong(9) == (data.length * 1000000L) / 176400L, "duration")
  }

  test("m5 parser decodes a ByteBuffer-built canonical GIF header") {
    import spark.implicits._
    // header built with java.nio LITTLE_ENDIAN — independent of the
    // operator's hex/shift synthesis path
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
      .putShort(640.toShort)            // width LE16
      .putShort(480.toShort)            // height LE16
      // packed: GCT flag + color resolution 7 + GCT size 5 (64 entries)
      .put((128 + 7 * 16 + 5).toByte)
      .put(0.toByte).put(0.toByte)
    val df = Seq((3L, bb.array())).toDF("doc_id", "payload")
    val r = Multimodal.parseGifHeader(df).collect().head
    assert(r.getBoolean(1), "is_gif")
    assert(r.getString(2) == "89a")
    assert(r.getLong(3) == 640L && r.getLong(4) == 480L)
    assert(r.getLong(5) == 1L && r.getLong(6) == 7L && r.getLong(7) == 5L)
    assert(r.getLong(8) == 64L * 3, "palette = 2^(5+1) entries x 3 bytes")

    // non-GIF payload -> typed nulls, never garbage
    val junk = Seq((4L, "notagif-at-all!".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val n = Multimodal.parseGifHeader(junk).collect().head
    assert(!n.getBoolean(1) && n.isNullAt(3) && n.isNullAt(8))
  }

  test("m15 PCM profile decodes ByteBuffer-built samples; non-WAV rows drop") {
    import spark.implicits._
    // samples chosen to pin sign extension, both clip rails, and the
    // abs(-32768) = 32768 peak edge
    val samples = Seq[Short](0, 1000, -1000, 32767, -32768, -1)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val df = Seq((9L, bb.array()),
      (10L, "not audio at all".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.pcmStatsOf(df).collect()
    assert(out.length == 1, "non-WAV payload must drop, not garble")
    val r = out.head
    assert(r.getLong(0) == 9L)
    assert(r.getLong(1) == samples.length.toLong, "n_samples")
    assert(r.getLong(2) == 32768L, "peak is abs(-32768)")
    assert(r.getLong(3) == 2L, "both rails count as clipped")
    val sum = samples.map(_.toLong).sum
    val sumSq = samples.map(s => s.toLong * s.toLong).sum
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    assert(r.getDouble(4) == r6(sum.toDouble / samples.length), "dc_offset")
    assert(r.getDouble(5) ==
      r6(math.sqrt(sumSq.toDouble / samples.length)), "rms")
    // the corpus-shaped operator: every doc profiled, clipping present
    val corpus = Multimodal.m15PcmStats(spark, sfDir).collect()
    assert(corpus.length ==
      Tables.documents(spark, sfDir).count().toInt)
    assert(corpus.exists(_.getLong(3) > 0), "planted ramp must clip somewhere")
    corpus.foreach { c =>
      assert(c.getLong(1) == 48 + c.getLong(0) % 32, "n_samples formula")
      assert(c.getLong(2) <= 32768L)
    }
  }

  test("m16 sample-table walk on a ByteBuffer-built MP4; junk gates; corpus formulas hold") {
    import spark.implicits._
    // hand-built container WITH the optional free + udta siblings, so
    // the declared-size skips are pinned, not just the happy path
    def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(284) // BE by default
    bb.putInt(16).put(tag("ftyp")).put(tag("isom")).putInt(0)
    bb.putInt(12).put(tag("free")).putInt(0)
    bb.putInt(256).put(tag("moov"))
    bb.putInt(108).put(tag("mvhd")).putInt(0).putInt(0).putInt(0)
      .putInt(600).putInt(80).putInt(0x00010000)
      .putShort(0x0100.toShort).putShort(0).putInt(0).putInt(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt)                       // identity matrix
    (1 to 6).foreach(_ => bb.putInt(0))         // pre_defined
    bb.putInt(2)                                // next_track_id
    bb.putInt(16).put(tag("udta")).putInt(0).putInt(0)
    bb.putInt(124).put(tag("trak"))
    bb.putInt(116).put(tag("mdia"))
    bb.putInt(32).put(tag("mdhd")).putInt(0).putInt(0).putInt(0)
      .putInt(90000).putInt(12000).putInt(0x55C40000)
    bb.putInt(76).put(tag("minf"))
    bb.putInt(68).put(tag("stbl"))
    bb.putInt(24).put(tag("stts")).putInt(0).putInt(1).putInt(4).putInt(3000)
    bb.putInt(36).put(tag("stsz")).putInt(0).putInt(0).putInt(4)
    Seq(1000, 2000, 1500, 500).foreach(bb.putInt)
    val brokenFtyp = java.nio.ByteBuffer.allocate(32)
    brokenFtyp.putInt(16).put(tag("ftyp")).put(tag("isom")).putInt(0)
      .put("garbage after..".getBytes("US-ASCII"))
    val df = Seq((9L, bb.array()),
      (11L, "definitely not a video".getBytes("UTF-8")),
      (12L, brokenFtyp.array())).toDF("doc_id", "payload")
    val out = Multimodal.mp4SampleStatsOf(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(11L), "non-ftyp payload must drop at the flat gate")
    assert(!out(12L).getBoolean(1) && out(12L).isNullAt(4),
      "ftyp-but-malformed row must gate to is_video=false with null stats")
    val r = out(9L)
    assert(r.getBoolean(1), "is_video")
    assert(r.getLong(2) == 600L && r.getLong(3) == 80L, "mvhd fields")
    assert(r.getLong(4) == 90000L, "mdhd timescale")
    assert(r.getLong(5) == 4L, "n_samples")
    assert(r.getDouble(6) == 30.0, "fps = timescale/delta")
    assert(r.getDouble(7) == 0.1333, "duration_s")
    assert(r.getLong(8) == 5000L && r.getLong(9) == 2000L &&
      r.getLong(10) == 500L, "stsz table stats")
    assert(r.getDouble(11) == 1250.0, "avg frame bytes")
    assert(r.getDouble(12) == 300000.0, "bitrate_bps")
    // corpus-shaped operator: every doc profiled, formulas hold
    val corpus = Multimodal.m16Mp4Samples(spark, sfDir).collect()
    assert(corpus.length == Tables.documents(spark, sfDir).count().toInt)
    corpus.foreach { c =>
      assert(c.getBoolean(1), "every synthesized container is well-formed")
      assert(c.getLong(5) == 8 + c.getLong(0) % 8, "n_samples formula")
      assert(Set(30.0, 24.0, 20.0, 17.1429).contains(c.getDouble(6)),
        s"fps ${c.getDouble(6)}")
      assert(c.getLong(9) >= c.getLong(10), "max >= min")
    }
  }

  test("m4 parser yields typed nulls on non-WAV payloads") {
    import spark.implicits._
    val junk = Seq((1L, "RIFFnope definitely not audio"))
      .toDF("doc_id", "s")
      .select($"doc_id", $"s".cast("binary").as("payload"))
    val row = Multimodal.parseAudioHeader(junk).collect().head
    assert(!row.getBoolean(1))
    assert(row.isNullAt(4), "sample_rate null-gated")
    assert(row.isNullAt(9), "duration null-gated")
  }

  test("m6 marker walk finds SOF0 behind a ByteBuffer-built segment chain") {
    import spark.implicits._
    // JPEG assembled with java.nio BIG_ENDIAN — independent of the
    // operator's hex-string synthesis. Layout: SOI, APP0(JFIF, 16),
    // COM(9), SOF0 (8-bit, 480x640, 3 components).
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0xFFD8.toShort)                        // SOI
    bb.putShort(0xFFE0.toShort).putShort(16)
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .putShort(0x0101.toShort).put(0.toByte)
      .putShort(72).putShort(72).put(0.toByte).put(0.toByte)
    bb.putShort(0xFFFE.toShort).putShort(9)
      .put("comment".getBytes("US-ASCII"))             // COM, len 2+7
    bb.putShort(0xFFC0.toShort).putShort(17).put(8.toByte)
      .putShort(480).putShort(640).put(3.toByte)
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val df = Seq((9L, bb.array())).toDF("doc_id", "payload")
    val r = Multimodal.parseJpegHeader(df).collect().head
    assert(r.getBoolean(1), "is_jpeg")
    assert(r.getLong(2) == 2L, "APP0 + COM before SOF")
    assert(r.getLong(3) == 3L + 18L + 11L, "sof_pos")
    assert(r.getLong(4) == 8L, "precision")
    assert(r.getLong(5) == 480L, "height")
    assert(r.getLong(6) == 640L, "width")
    assert(r.getLong(7) == 3L, "n_components")
    assert(r.getLong(8) == 480L * 640L * 3L, "est_raw_bytes")
  }

  test("m6 parser yields typed nulls on truncated and non-JPEG payloads") {
    import spark.implicits._
    // truncated: SOI + APP0 marker but the stream ends mid-segment —
    // every bounds-guarded read past the end must null out, not raise
    val trunc = Seq((1L, Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0, 16)))
      .toDF("doc_id", "payload")
    val t = Multimodal.parseJpegHeader(trunc).collect().head
    assert(t.getBoolean(1), "SOI present")
    assert(t.isNullAt(3) && t.isNullAt(5), "no SOF found -> nulls")
    val junk = Seq((2L, "plain text, no jpeg here".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val j = Multimodal.parseJpegHeader(junk).collect().head
    assert(!j.getBoolean(1) && j.isNullAt(5) && j.isNullAt(8))
  }

  test("m8 parser reads a java-built ustar stream (independent of hex synthesis)") {
    import spark.implicits._
    def header(name: String, size: Long): Array[Byte] = {
      val h = new Array[Byte](512)
      val n = name.getBytes("US-ASCII"); System.arraycopy(n, 0, h, 0, n.length)
      val oct = ("%011o".format(size) + "\u0000").getBytes("US-ASCII")
      System.arraycopy(oct, 0, h, 124, oct.length)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)   // checksum spaces
      h(156) = '0'.toByte
      val magic = "ustar\u000000".getBytes("US-ASCII") // magic+version
      System.arraycopy(magic, 0, h, 257, magic.length)
      h
    }
    def padTo512(b: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOf(b, ((b.length + 511) / 512) * 512)
    val fileA = "hello tar".getBytes("US-ASCII")
    val fileB = ("x" * 700).getBytes("US-ASCII")       // spans 2 data blocks
    val tar = header("a.txt", fileA.length) ++ padTo512(fileA) ++
      header("dir/b.bin", fileB.length) ++ padTo512(fileB) ++
      new Array[Byte](1024)                            // EOF marker
    val df = Seq((7L, tar)).toDF("doc_id", "payload")
    val r = Multimodal.parseTarEntries(df).collect().head
    assert(r.getBoolean(1), "is_tar")
    assert(r.getLong(2) === 2L, "n_entries")
    assert(r.getString(3) === "a.txt")
    assert(r.getLong(4) === fileA.length.toLong)
    assert(r.getString(5) === "dir/b.bin")
    assert(r.getLong(6) === fileB.length.toLong)
    assert(r.getLong(7) === (fileA.length + fileB.length).toLong)
  }

  test("m8 parser yields typed nulls on truncated and non-tar payloads") {
    import spark.implicits._
    val junk = Seq((1L, "not a tar stream".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val j = Multimodal.parseTarEntries(junk).collect().head
    assert(!j.getBoolean(1) && j.isNullAt(2) && j.isNullAt(3))
    // header cut off before the magic offset
    val trunc = Seq((2L, new Array[Byte](200))).toDF("doc_id", "payload")
    val t = Multimodal.parseTarEntries(trunc).collect().head
    assert(!t.getBoolean(1) && t.isNullAt(7))
  }

  test("m9 parser lists a REAL java.util.zip-written archive") {
    import spark.implicits._
    // archive produced by the JDK's own writer (deflated entries,
    // data descriptors, real CRCs) — fully independent of the synth
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val payloadA = ("alpha " * 40).getBytes("UTF-8")
    val payloadB = "tiny".getBytes("UTF-8")
    zos.putNextEntry(new java.util.zip.ZipEntry("first/file.txt"))
    zos.write(payloadA); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("second.json"))
    zos.write(payloadB); zos.closeEntry()
    zos.close()
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val r = Multimodal.parseZipEntries(df).collect().head
    assert(r.getBoolean(1), "is_zip")
    assert(r.getLong(2) == 2, "n_entries from EOCD")
    assert(r.getString(4) == "first/file.txt")
    assert(r.getLong(5) == payloadA.length, "uncompressed size from CD")
    assert(r.getString(6) == "second.json")
    assert(r.getLong(7) == payloadB.length)
    assert(r.getLong(8) == payloadA.length + payloadB.length)

    // junk and truncated payloads flag, never throw
    val junk = Seq((2L, "PK but not really a zip".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val j = Multimodal.parseZipEntries(junk).collect().head
    assert(!j.getBoolean(1) && j.isNullAt(2))
    val empty = Seq((3L, new Array[Byte](5))).toDF("doc_id", "payload")
    val e = Multimodal.parseZipEntries(empty).collect().head
    assert(!e.getBoolean(1))
  }

  test("m10 TIFF walk agrees with an independent ByteBuffer reference parser") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    // reference IFD parser built on java.nio's endian machinery —
    // structurally independent of the operator's column arithmetic
    def refParse(b: Array[Byte]): (String, Int, Map[Int, Long]) = {
      val order = new String(b.take(2), "US-ASCII")
      val bb = ByteBuffer.wrap(b).order(
        if (order == "II") ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      assert((bb.getShort(2) & 0xffff) == 42)
      val ifd = bb.getInt(4)
      val n = bb.getShort(ifd) & 0xffff
      val tags = (0 until n).map { i =>
        val off = ifd + 2 + i * 12
        val tag = bb.getShort(off) & 0xffff
        val typ = bb.getShort(off + 2) & 0xffff
        val v = if (typ == 3) (bb.getShort(off + 8) & 0xffff).toLong
                else bb.getInt(off + 8).toLong
        tag -> v
      }.toMap
      (order, n, tags)
    }
    val parsed = Multimodal.m10TiffMeta(spark, sfDir).collect()
    // rebuild each payload with java.nio (synth depends only on
    // doc_id), reference-parse it, and compare to the operator row
    def buildRef(id: Long): Array[Byte] = {
      val little = id % 2 == 0
      val bb = ByteBuffer.allocate(128).order(
        if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      bb.put(if (little) "II".getBytes else "MM".getBytes)
      bb.putShort(42.toShort)
      bb.putInt(8)
      val hasOrient = id % 3 == 0
      bb.putShort(if (hasOrient) 4.toShort else 3.toShort)
      def entry(tag: Int, typ: Int, value: Long): Unit = {
        bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(1)
        if (typ == 3) { bb.putShort(value.toShort); bb.putShort(0) }
        else bb.putInt(value.toInt)
      }
      entry(256, 4, 16 + id % 240)
      entry(257, 4, 16 + id % 180)
      entry(259, 3, 1)
      if (hasOrient) entry(274, 3, 1 + id % 8)
      bb.putInt(0)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val rowsById = parsed.map(r => r.getLong(0) -> r).toMap
    rowsById.keys.toSeq.sorted.take(50).foreach { id =>
      val (order, n, tags) = refParse(buildRef(id))
      val r = rowsById(id)
      assert(r.getBoolean(1))
      assert(r.getString(2) == order)
      assert(r.getLong(3) == n)
      assert(r.getLong(4) == tags(256))
      assert(r.getLong(5) == tags(257))
      assert(r.getLong(6) == tags(259))
      if (tags.contains(274)) assert(r.getLong(7) == tags(274))
      else assert(r.isNullAt(7))
    }
    // non-TIFF payload degrades to nulls, not errors
    val junk = Seq((9L, "not a tiff at all".getBytes)).toDF("doc_id", "payload")
    val j = Multimodal.parseTiff(junk).collect().head
    assert(!j.getBoolean(1) && j.isNullAt(2) && j.isNullAt(4))
  }

  test("extractZipEntries slices exact bytes from a REAL STORED archive") {
    import spark.implicits._
    // STORED (method 0) entries via the JDK writer: sizes and CRCs
    // must be pre-declared — the extraction path f4 relies on
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, data: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(data.length); e.setCompressedSize(data.length)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      e.setCrc(crc.getValue)
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    put("a.txt", "hello stored world".getBytes("UTF-8"))
    // ASCII names (the walker's declared name charset); non-ASCII
    // CONTENT must still round-trip through the UTF-8 slice
    put("b/unicode.txt", "unicode content: déjà vu".getBytes("UTF-8"))
    zos.close()
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val rows = Multimodal.extractZipEntries(df)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(rows("a.txt") == "hello stored world")
    assert(rows("b/unicode.txt") == "unicode content: déjà vu")
    // junk payloads yield zero rows, never throw
    assert(Multimodal.extractZipEntries(
      Seq((2L, "not a zip".getBytes)).toDF("doc_id", "payload")).count() == 0)
  }

  test("m12 tEXt walk reads a REAL javax.imageio-written PNG") {
    import spark.implicits._
    import javax.imageio.metadata.IIOMetadataNode
    // the JDK's own PNG writer with tEXt metadata — fully independent
    // of the driver query's hex synthesis (real IDAT, real CRCs)
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("png").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    val wp = writer.getDefaultWriteParam
    val meta = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), wp)
    val root = new IIOMetadataNode("javax_imageio_png_1.0")
    val t = new IIOMetadataNode("tEXt")
    def entry(k: String, v: String): IIOMetadataNode = {
      val e = new IIOMetadataNode("tEXtEntry")
      e.setAttribute("keyword", k); e.setAttribute("value", v); e
    }
    t.appendChild(entry("Title", "real png title"))
    t.appendChild(entry("Author", "io writer"))
    root.appendChild(t)
    meta.mergeTree("javax_imageio_png_1.0", root)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), wp)
    ios.close(); writer.dispose()
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val r = graft.operators.Multimodal.parsePngText(df, maxChunks = 8)
      .collect().head
    assert(r.getBoolean(1))
    assert(r.getString(2) == "real png title", s"title: ${r.getString(2)}")
    assert(r.getString(3) == "io writer")
    assert(r.getLong(5) >= 2L)
    // junk payloads yield typed nulls, never garbage
    val junk = graft.operators.Multimodal.parsePngText(
      Seq((2L, "not a png".getBytes)).toDF("doc_id", "payload"))
      .collect().head
    assert(!junk.getBoolean(1) && junk.isNullAt(2) && junk.isNullAt(5))
  }

  test("zTXt/iTXt inflate reads a REAL javax.imageio-written PNG") {
    import spark.implicits._
    import javax.imageio.metadata.IIOMetadataNode
    // the JDK's PNG writer compresses zTXt (and compressed iTXt) with
    // its own zlib encoder — fully independent of the synthesis-side
    // Deflater, so this pins the walk + header parse + inflate chain
    // against a foreign producer
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("png").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    val wp = writer.getDefaultWriteParam
    val meta = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), wp)
    val root = new IIOMetadataNode("javax_imageio_png_1.0")
    val z = new IIOMetadataNode("zTXt")
    val ze = new IIOMetadataNode("zTXtEntry")
    ze.setAttribute("keyword", "Software")
    ze.setAttribute("compressionMethod", "deflate")
    ze.setAttribute("text", "compressed by the JDK writer " * 4)
    z.appendChild(ze)
    root.appendChild(z)
    val i = new IIOMetadataNode("iTXt")
    def itxt(kw: String, flag: String, text: String): IIOMetadataNode = {
      val e = new IIOMetadataNode("iTXtEntry")
      e.setAttribute("keyword", kw)
      e.setAttribute("compressionFlag", flag)
      e.setAttribute("compressionMethod", "0")
      e.setAttribute("languageTag", "en")
      e.setAttribute("translatedKeyword", "")
      e.setAttribute("text", text)
      e
    }
    i.appendChild(itxt("Description", "TRUE", "itxt squeezed " * 8))
    i.appendChild(itxt("Source", "FALSE", "plain itxt"))
    root.appendChild(i)
    meta.mergeTree("javax_imageio_png_1.0", root)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), wp)
    ios.close(); writer.dispose()
    val df = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val rows = graft.operators.Multimodal.pngCompressedText(df, maxChunks = 10)
      .collect()
      .map(r => r.getString(2) -> ((r.getString(1), r.getString(3), r.getString(4))))
      .toMap
    assert(rows("Software") ==
      (("zTXt", "", "compressed by the JDK writer " * 4)))
    assert(rows("Description") == (("iTXt", "en", "itxt squeezed " * 8)))
    assert(rows("Source") == (("iTXt", "en", "plain itxt")))
    // junk and truncated chunks are skipped, never thrown
    val junk = Seq(
      (2L, "not a png".getBytes),
      (3L, bos.toByteArray.take(60))).toDF("doc_id", "payload")
    assert(graft.operators.Multimodal.pngCompressedText(junk).count() == 0)
  }

  test("m11 dHash pairs exact copies at hamming 0, small edits nearby, noise apart") {
    import spark.implicits._
    val base = (0 until 400).map(i => ('a' + i % 23).toChar).mkString
    // 1=2 exact copies; 3 = one byte bumped in one grid cell;
    // 4 = unrelated noise (different byte distribution per slice)
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.updated(100, (base(100) + 1).toChar)),
      (4L, (0 until 400).map(i => ('z' - (i * 7) % 20).toChar).mkString)
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("m11").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Multimodal.m11PerceptualDedup(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // byte-identical payloads collapse to the same hash
    assert(pairs((1L, 2L)) == 0)
    // a one-byte edit flips at most the two bits adjacent to its cell
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2)
    // unrelated noise never reaches the <=5 verify
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
    Caches.releaseAll()
  }

  test("parseJpegExif finds Exif behind an XMP APP1, independent byte build") {
    import spark.implicits._
    // hand-assembled JPEG (ByteBuffer, big-endian wire) — an
    // INDEPENDENT construction from the m13 synth's hex concat
    def jpeg(withXmp: Boolean, withExif: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(512)
      bb.putShort(0xFFD8.toShort)
      // APP0/JFIF, 16-byte length
      bb.putShort(0xFFE0.toShort).putShort(16)
      bb.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      bb.put(Array[Byte](1, 1, 0, 0, 72, 0, 72, 0, 0))
      if (withXmp) {
        val ns = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
        bb.putShort(0xFFE1.toShort).putShort((2 + ns.length + 1 + 4).toShort)
        bb.put(ns).put(0.toByte).put("xmp!".getBytes("US-ASCII"))
      }
      if (withExif) {
        // MM TIFF: 2 entries (width LONG 321, orientation SHORT 6)
        val tiff = java.nio.ByteBuffer.allocate(64)
        tiff.order(java.nio.ByteOrder.BIG_ENDIAN)
        tiff.putShort(0x4D4D.toShort).putShort(42).putInt(8)
        tiff.putShort(2)
        tiff.putShort(256.toShort).putShort(4).putInt(1).putInt(321)
        tiff.putShort(274.toShort).putShort(3).putInt(1)
        tiff.putShort(6).putShort(0)
        tiff.putInt(0)
        val t = java.util.Arrays.copyOf(tiff.array(), tiff.position())
        bb.putShort(0xFFE1.toShort).putShort((2 + 6 + t.length).toShort)
        bb.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
        bb.put(t)
      }
      bb.putShort(0xFFC0.toShort).putShort(17)
      bb.put(8.toByte).putShort(240).putShort(320).put(3.toByte)
      bb.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val frames = Seq(
      (1L, jpeg(withXmp = false, withExif = true)),
      (2L, jpeg(withXmp = true, withExif = true)),   // Exif sits PAST the XMP
      (3L, jpeg(withXmp = true, withExif = false)),  // XMP alone is not Exif
      (4L, jpeg(withXmp = false, withExif = false))
    ).toDF("doc_id", "payload")
    val rows = Multimodal.parseJpegExif(frames).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = rows(id)
      assert(r.getBoolean(1), s"doc $id must report EXIF")
      assert(r.getString(3) == "MM")
      assert(r.getLong(4) == 2L)
      assert(r.getLong(5) == 321L, "ImageWidth tag")
      assert(r.isNullAt(6), "no height entry written")
      assert(r.getLong(7) == 6L, "Orientation tag")
    }
    // the XMP APP1 shifts doc 2's Exif offset by the XMP segment size
    assert(rows(2L).getLong(2) - rows(1L).getLong(2) == 2 + 2 + 28 + 1 + 4)
    Seq(3L, 4L).foreach { id =>
      val r = rows(id)
      assert(!r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(5))
    }
  }

  test("m12 keyword pre-filter drops unwanted keys columnar, below the Inflater pass") {
    import spark.implicits._
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val n = data.length
      Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte,
        n.toByte) ++ ctype.getBytes("US-ASCII") ++ data ++ Array.fill(4)(0.toByte)
    }
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    // one wanted key, one unwanted key with a perfectly VALID stream:
    // only the pre-filter (not a decode failure) can explain its absence
    val payload = sig ++
      chunk("zTXt", "Software\u0000\u0000".getBytes("ISO-8859-1") ++ deflate("hello")) ++
      chunk("zTXt", "Junk\u0000\u0000".getBytes("ISO-8859-1") ++ deflate("evil")) ++
      chunk("IEND", Array.emptyByteArray)
    val blobs = Seq((1L, payload)).toDF("doc_id", "payload")
    val df = Multimodal.pngCompressedText(blobs, 8, Seq("Software"))
    val rows = df.collect().map(r => (r.getString(2), r.getString(4)))
    assert(rows.toSeq == Seq(("Software", "hello")))
    // and the filter really sits BELOW the per-task pass in the plan:
    // the keyword prefix is tested columnar on the slice bytes, so
    // unwanted chunks never reach (or allocate) the Inflater
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, MapPartitions}
    val mp = df.queryExecution.optimizedPlan
      .collectFirst { case m: MapPartitions => m }
    assert(mp.nonEmpty, "expected the per-task decode pass in the plan")
    val prefilter = mp.get.child.collectFirst {
      case f: Filter if f.condition.toString.contains("substring_index") => f
    }
    assert(prefilter.nonEmpty,
      "keyword pre-filter must be a columnar Filter below the decode pass")
    // no-filter call still surfaces every decodable chunk
    val all = Multimodal.pngCompressedText(blobs).collect()
      .map(r => r.getString(2)).sorted
    assert(all.toSeq == Seq("Junk", "Software"))
  }

  test("m14 parses a real minimal PDF; junk payloads yield typed nulls") {
    import spark.implicits._
    // a complete, structurally valid single-page PDF written by hand
    val body =
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>\nendobj\n" +
      "4 0 obj\n<< /Title (Hello PDF) /Author (graft) >>\nendobj\n"
    val pre = "%PDF-1.6\n" + body
    val pdf = pre +
      s"trailer << /Size 5 /Root 1 0 R /Info 4 0 R >>\nstartxref\n${pre.length}\n%%EOF"
    val blobs = Seq(
      (1L, pdf.getBytes("US-ASCII")),
      (2L, "not a pdf at all".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val out = Multimodal.parsePdfMeta(blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getString(1) == "1.6")
    assert(ok.getLong(2) == 4L)
    assert(ok.getString(3) == "Hello PDF")
    assert(ok.getLong(4) == 4L, "trailer /Info must resolve to object 4")
    assert(ok.getLong(5) == pre.length.toLong,
      "startxref must carry the true tail offset")
    assert(ok.getBoolean(6))
    val junk = out(2L)
    (1 to 6).foreach(i => assert(junk.isNullAt(i), s"col $i must be null"))
  }

  test("m17 parses JVM-built MP3s: synchsafe skip over a false sync, VBR walk, truncation") {
    import spark.implicits._
    // a REAL byte-level build, independent of the columnar synthesis
    def mp3(tagBody: Array[Byte], frames: Seq[(Int, Int, Int)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      val sz = tagBody.length
      out.write((sz >> 21) & 0x7f); out.write((sz >> 14) & 0x7f)
      out.write((sz >> 7) & 0x7f); out.write(sz & 0x7f)
      out.write(tagBody)
      val kbps = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
        256, 320)
      frames.foreach { case (bi, si, pad) =>
        val sr = Seq(44100, 48000, 32000)(si)
        val flen = 144000 * kbps(bi - 1) / sr + pad
        out.write(0xff); out.write(0xfb)
        out.write((bi << 4) | (si << 2) | (pad << 1)); out.write(0)
        (4 until flen).foreach(_ => out.write(0xaa))
      }
      out.toByteArray
    }
    // tag body 200 bytes (synchsafe spans two bytes: 200 = 0x01 0x48)
    // CONTAINING a false frame sync — a parser that scans for sync
    // instead of skipping by the synchsafe size would lock onto it
    val trap = Array.fill[Byte](200)(0x54)
    trap(50) = 0xff.toByte; trap(51) = 0xfb.toByte; trap(52) = 0x12
    val good = mp3(trap, Seq((9, 0, 0), (14, 0, 1), (1, 0, 0)))
    val truncated = good.dropRight(1)
    val blobs = Seq(
      (1L, good), (2L, truncated),
      (3L, "not an mp3 at all".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val out = Multimodal.parseMp3Meta(blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val g = out(1L)
    assert(g.getBoolean(1), "real MP3 must parse")
    assert(g.getLong(2) == 200L, "synchsafe tag size must decode as 7-bit bytes")
    assert(g.getLong(3) == 211L, "audio starts after header+tag")
    assert(g.getLong(4) == 3L, "all three VBR frames counted")
    // frame lengths: 128k->417, 320k->1045(+1 pad=1045+? pad adds 1)
    val fl = Seq(144000 * 128 / 44100, 144000 * 320 / 44100 + 1,
      144000 * 32 / 44100)
    assert(g.getLong(5) == fl.sum.toLong, "audio bytes = spec frame lengths")
    assert(g.getLong(6) == (128L + 320L + 32L) / 3L)
    assert(g.getLong(7) == 44100L)
    assert(g.getLong(8) == 3L * 1152L * 1000000L / 44100L)
    val t = out(2L)
    assert(t.getBoolean(1) && t.getLong(4) == 2L,
      "truncated final frame must not count")
    assert(t.getLong(6) == (128L + 320L) / 2L)
    val j = out(3L)
    assert(!j.getBoolean(1))
    (2 to 8).foreach(i => assert(j.isNullAt(i), s"col $i must be null"))
  }

  test("m18 parses byte-built FLAC: synchsafe-free bit unpack, 36-bit total, block hops") {
    import spark.implicits._
    // independent byte-level build (not the columnar synthesis)
    def flac(sr: Int, ch: Int, bps: Int, tot: Long,
             pad: Option[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(if (pad.isDefined) 0x00 else 0x80) // STREAMINFO hdr
      out.write(0); out.write(0); out.write(34)
      out.write(0x10); out.write(0x00); out.write(0x10); out.write(0x00)
      out.write(Array[Byte](0, 1, 0x20, 0, 0x0e, 0x10))
      out.write(sr >> 12); out.write((sr >> 4) & 0xff)
      out.write(((sr & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4))
      out.write((((bps - 1) & 0xf) << 4) | (tot >> 32).toInt)
      (3 to 0 by -1).foreach(i => out.write(((tot >> (8 * i)) & 0xff).toInt))
      (1 to 16).foreach(_ => out.write(0xab))
      pad.foreach { n =>
        out.write(0x81); out.write(0); out.write(0); out.write(n)
        (1 to n).foreach(_ => out.write(0))
      }
      out.toByteArray
    }
    val blobs = Seq(
      (1L, flac(44100, 2, 16, 1234567L, None)),
      // total above 2^32: the high nibble of byte 14 is load-bearing
      (2L, flac(96000, 8, 24, (1L << 32) + 99L, Some(5))),
      (3L, "not flac".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val out = Multimodal.parseFlacMeta(blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = out(1L)
    assert(a.getBoolean(1) && a.getLong(2) == 1L)
    assert(a.getLong(3) == 4096L && a.getLong(4) == 44100L)
    assert(a.getLong(5) == 2L && a.getLong(6) == 16L)
    assert(a.getLong(7) == 1234567L)
    assert(a.getLong(8) == 1234567L * 1000000L / 44100L)
    val b = out(2L)
    assert(b.getBoolean(1) && b.getLong(2) == 2L,
      "the padding block must be hopped and counted")
    assert(b.getLong(4) == 96000L && b.getLong(5) == 8L &&
      b.getLong(6) == 24L)
    assert(b.getLong(7) == (1L << 32) + 99L,
      "the 36-bit total must keep its high bits")
    val junk = out(3L)
    assert(!junk.getBoolean(1))
    (2 to 8).foreach(i => assert(junk.isNullAt(i)))
  }
}
