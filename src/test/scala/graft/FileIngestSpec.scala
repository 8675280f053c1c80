package graft

import graft.operators.FileIngest
import graft.streaming.IngestStream

class FileIngestSpec extends SparkSpec {

  test("f1 classifies converter errors and chunks extracted text") {
    val rows = FileIngest.f1FileIngest(spark, sfDir).collect()
    val enc = rows.filter(_.getString(1) == "error_encrypted")
    val emp = rows.filter(_.getString(1) == "error_empty")
    assert(enc.nonEmpty && emp.nonEmpty, "both error classes should appear")
    assert((enc ++ emp).forall(r => r.getInt(2) == -1 && r.getString(3).isEmpty))
    val ok = rows.filter(_.getString(1) == "ok")
    assert(ok.nonEmpty && ok.forall(_.getInt(2) >= 0))
    // title strategy: no converter metadata -> path basename
    assert(rows.forall(r => r.getString(5) == s"file_${r.getLong(0)}.pdf"))
  }

  test("file metadata strategy matches the reference extraction table") {
    import FileIngest.{ConverterDoc, fileMetadata}
    // metadata present wins everything
    val m1 = fileMetadata(Some(ConverterDoc(
      title = Some("Doc Title"), authors = Seq("Alice"),
      creationDate = Some("2023-01-01"), language = Some("fr"),
      numPages = Some(5))), resultPages = 0, filePath = "/tmp/test.pdf")
    assert(m1 == FileIngest.FileMeta("Doc Title", Some("Alice"),
      Some("2023-01-01"), 5, "fr"))
    // metadata missing -> origin filename + converted page count
    val m2 = fileMetadata(Some(ConverterDoc(
      originFilename = Some("origin.pdf"))), resultPages = 3,
      filePath = "/tmp/fallback.pdf")
    assert(m2 == FileIngest.FileMeta("origin.pdf", None, None, 3, "en"))
    // nothing at all -> path basename, zero pages, default language
    val m3 = fileMetadata(None, resultPages = 0, filePath = "/path/to/base.pdf")
    assert(m3 == FileIngest.FileMeta("base.pdf", None, None, 0, "en"))
    // author list joins with ", "
    val m4 = fileMetadata(Some(ConverterDoc(
      title = Some("T"), authors = Seq("Alice", "Bob"), language = Some("en"),
      numPages = Some(1))), resultPages = 0, filePath = "f.pdf")
    assert(m4 == FileIngest.FileMeta("T", Some("Alice, Bob"), None, 1, "en"))
  }

  test("extracted file text flows into the ingestion store seam") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("filestore").toString
    val docs = FileIngest.extractText(FileIngest.fileCorpus(spark, sfDir))
      .filter(_.status == "ok")
      .map(e => (e.doc_id, "files", e.text))
      .toDF("doc_id", "source", "text")
    IngestStream.reingest(docs, store)
    val chunks = spark.read.parquet(s"$store/chunks")
    val n = chunks.count()
    assert(n > 0)
    assert(chunks.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("files"))
    // re-ingesting the same files is idempotent (the page-update path)
    IngestStream.reingest(docs, store)
    assert(spark.read.parquet(s"$store/chunks").count() == n)
  }

  test("f3 detector classifies REAL JDK-encoded byte streams") {
    import spark.implicits._
    // bytes produced by the JDK's own encoders — independent of the
    // driver query's hex synthesis
    def bom(b: Int*) = b.map(_.toByte).toArray
    val text = "hello graft 42"
    val cases = Seq(
      (1L, bom(0xEF, 0xBB, 0xBF) ++ text.getBytes("UTF-8"), "utf8-bom", "ascii"),
      (2L, text.getBytes("UTF-16"), "utf16be-bom", "utf16-like"), // JDK UTF-16 = BE BOM
      (3L, bom(0xFF, 0xFE) ++ text.getBytes("UTF-16LE"), "utf16le-bom", "utf16-like"),
      (4L, text.getBytes("UTF-8"), "none", "ascii"),
      (5L, ("café " * 8).getBytes("UTF-8"), "none", "utf8-like"),
      (6L, Array.empty[Byte], "none", "empty"))
    val out = graft.operators.FileIngest
      .detectEncoding(cases.map(c => (c._1, c._2)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(5))).toMap
    cases.foreach { case (id, _, wantBom, wantGuess) =>
      assert(out(id) == ((wantBom, wantGuess)), s"case $id: ${out(id)}")
    }
  }

  test("expandArchives inflates REAL java.util.zip DEFLATED members") {
    import spark.implicits._
    // an archive the JDK writer compresses for real: a deflated
    // member whose content is long and repetitive (so DEFLATE
    // actually shrinks it), a stored member, and a deflated
    // unicode-content member
    val longText = ("the quick brown fox jumps over the lazy dog. " * 40).trim
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def putDeflated(name: String, data: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.DEFLATED)
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    def putStored(name: String, data: Array[Byte]): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(data.length.toLong); e.setCompressedSize(data.length.toLong)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      e.setCrc(crc.getValue)
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    putDeflated("big.txt", longText.getBytes("UTF-8"))
    putStored("small.txt", "tiny stored".getBytes("UTF-8"))
    putDeflated("uni.txt", "déjà vu — naïve café".getBytes("UTF-8"))
    zos.close()
    val zipBytes = bos.toByteArray
    // the deflated member really was compressed in the archive
    assert(zipBytes.length < longText.length)
    val rows = graft.operators.FileIngest.expandArchives(
        Seq((1L, zipBytes)).toDF("doc_id", "payload"))
      .collect()
      .map(r => r.getString(1) -> ((r.getString(2), r.getString(3)))).toMap
    assert(rows("big.txt") == (("deflated", longText)))
    assert(rows("small.txt") == (("stored", "tiny stored")))
    assert(rows("uni.txt") == (("deflated", "déjà vu — naïve café")))
    // junk and truncated payloads yield zero rows, never throw
    val junk = Seq(
      (2L, "not a zip at all".getBytes("UTF-8")),
      (3L, zipBytes.take(zipBytes.length / 2))).toDF("doc_id", "payload")
    assert(graft.operators.FileIngest.expandArchives(junk).count() == 0)
    // f5 over the corpus: every doc yields its stored+deflated pair
    val f5 = graft.operators.FileIngest.f5DeflateIngest(spark, sfDir)
    val byMethod = f5.groupBy($"method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(byMethod == Map("stored" -> nDocs, "deflated" -> nDocs))
  }

  test("parseWarcRecords walks realistic records: extra headers, embedded blank lines, junk") {
    import spark.implicits._
    // realistic record: headers in a DIFFERENT order than the
    // synthesis, extra headers the parser must skip, and a payload
    // CONTAINING \r\n\r\n — only a length-driven walk survives that
    val body1 = "line one\r\n\r\nline two after a blank line"
    val rec1 =
      "WARC/1.0\r\n" +
        "WARC-Record-ID: <urn:uuid:1234>\r\n" +
        "Content-Length: " + body1.length + "\r\n" +
        "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://real.example.org/a\r\n" +
        "\r\n" + body1 + "\r\n\r\n"
    val body2 = "short"
    val rec2 =
      "WARC/1.0\r\n" +
        "WARC-Type: metadata\r\n" +
        "Content-Length: " + body2.length + "\r\n" +
        "WARC-Target-URI: https://real.example.org/a\r\n" +
        "\r\n" + body2 + "\r\n\r\n"
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: x\r\nContent-Length: 999\r\n\r\nnot enough bytes"
    val blobs = Seq(
      (1L, rec1 + rec2),
      (2L, "HTTP/1.1 200 OK\r\n\r\nnot a warc at all"),
      (3L, rec1 + truncated)).toDF("doc_id", "blob")
    val rows = graft.operators.FileIngest.parseWarcRecords(blobs)
      .orderBy($"doc_id", $"record_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(rows.toSeq == Seq(
      (1L, 1, "response", "https://real.example.org/a", body1.length.toLong, body1),
      (1L, 2, "metadata", "https://real.example.org/a", body2.length.toLong, body2),
      (3L, 1, "response", "https://real.example.org/a", body1.length.toLong, body1)))
  }

  test("expandArchives finds EOCD behind a zip comment and trailing bytes") {
    import spark.implicits._
    // real crawl dumps carry archive comments — the EOCD is then NOT
    // at the fixed b.length-22 offset, so the walker must scan back
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("note.txt")
    e.setMethod(java.util.zip.ZipEntry.DEFLATED)
    zos.putNextEntry(e)
    zos.write(("commented archive body. " * 10).getBytes("UTF-8"))
    zos.closeEntry()
    zos.setComment("mirror=archive.example.org build=2026-08") // EOCD comment
    zos.close()
    val commented = bos.toByteArray
    // sanity: the fixed-offset assumption really is violated here
    assert(!(commented(commented.length - 22) == 0x50.toByte &&
      commented(commented.length - 21) == 0x4b.toByte))
    val rows = graft.operators.FileIngest.expandArchives(
        Seq((1L, commented)).toDF("doc_id", "payload")).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "note.txt" &&
      rows.head.getString(3) == ("commented archive body. " * 10))
    // a downstream limit abandons the iterator mid-partition — the
    // task-completion listener (not iterator exhaustion) releases the
    // Inflater, so this must complete cleanly
    val many = Seq.tabulate(8)(i => (i.toLong, commented))
      .toDF("doc_id", "payload").repartition(1)
    assert(graft.operators.FileIngest.expandArchives(many)
      .limit(1).count() == 1)
  }

  test("f7 extracts REAL flate-compressed and plain PDF streams; poison blobs skipped") {
    import spark.implicits._
    import graft.operators.FileIngest
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("US-ASCII")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    def pdf(content: String, flate: Boolean): Array[Byte] = {
      val body =
        if (flate) deflate(content) else content.getBytes("US-ASCII")
      val filt = if (flate) " /Filter /FlateDecode" else ""
      ("%PDF-1.5\n4 0 obj\n<< /Length " + body.length + filt +
        " >>\nstream\n").getBytes("US-ASCII") ++ body ++
        "\nendstream\nendobj\n%%EOF".getBytes("US-ASCII")
    }
    val blobs = Seq(
      (1L, pdf("BT (compressed words here) Tj ET", flate = true)),
      (2L, pdf("BT (plain words) Tj ET", flate = false)),
      (3L, "no stream marker at all".getBytes("US-ASCII")),
      // valid framing, garbage deflate body: must be skipped, not thrown
      (4L, ("%PDF-1.5\n<< /Length 4 /Filter /FlateDecode >>\nstream\n"
        .getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4) ++
        "\nendstream".getBytes("US-ASCII"))))
      .toDF("doc_id", "payload")
    val out = FileIngest.extractPdfText(blobs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("flate", "compressed words here", 3L)))
    assert(out(2L) == (("plain", "plain words", 2L)))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("f8 gunzips REAL JDK GZIPOutputStream members; FNAME skip; poison members stop clean") {
    import spark.implicits._
    def rec(typ: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: https://x/1\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    // the STANDARD library writer, not our framing code — interop
    // proof that walkGzipMembers reads what real tools write
    def jdkGzip(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    // an FNAME-flagged member (flag bit 3 + NUL-terminated name),
    // which GZIPOutputStream never emits but real .warc.gz writers do
    def fnameGzip(s: String, name: String): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0))
      out.write(name.getBytes("US-ASCII")); out.write(0)
      val buf = new Array[Byte](256)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end()
      val crc = new java.util.zip.CRC32(); crc.update(s.getBytes("UTF-8"))
      def le32(v: Long): Unit = (0 to 3).foreach(i =>
        out.write(((v >> (8 * i)) & 0xff).toInt))
      le32(crc.getValue); le32(s.getBytes("UTF-8").length.toLong)
      out.toByteArray
    }
    val r1 = rec("response", "héllo wörld")  // non-ASCII round trip
    val r2 = rec("metadata", "fetched=1")
    val good = jdkGzip(r1) ++ jdkGzip(r2)
    val corrupted = {
      val c = jdkGzip(r1) ++ jdkGzip(r2)
      c(c.length - 8) = (c(c.length - 8) ^ 0xff).toByte // flip 2nd CRC byte 0
      c
    }
    val truncated = good.dropRight(4) // 2nd member loses half its trailer
    val blobs = Seq(
      (1L, good),
      (2L, fnameGzip(r2, "record.warc")),
      (3L, corrupted),
      (4L, truncated),
      (5L, "plain bytes, not gzip".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val walked = FileIngest.gunzipMembers(blobs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(walked(1L) == ((2, r1 + r2)), "JDK-written members must round-trip")
    assert(walked(2L) == ((1, r2)), "FNAME header must be skipped, not inflated")
    assert(walked(3L) == ((1, r1)),
      "a CRC-failed member must drop, keeping prior members")
    assert(walked(4L) == ((1, r1)),
      "a truncated trailer must drop the member, keeping prior members")
    assert(walked(5L) == ((0, "")), "non-gzip blobs yield the empty walk")
    // the reassembled stream parses as WARC with the member count riding
    val recs = FileIngest.parseWarcRecords(
      FileIngest.gunzipMembers(blobs).filter($"doc_id" === 1L),
      carry = Seq("gz_members")).collect()
    assert(recs.length == 2)
    assert(recs.forall(_.getAs[Int]("gz_members") == 2))
    assert(recs.map(_.getAs[String]("content")).toSet ==
      Set("héllo wörld", "fetched=1"))
  }
}
