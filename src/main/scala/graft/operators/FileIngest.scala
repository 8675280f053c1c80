package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-file ingestion seam (SURVEY.md §2.B) — the reference's
  * converter-pool file path
  * (apps/ingestion-worker/handlers/file.py:26-60 init_worker +
  * extract, exceptions.py error classes): an opaque
  * (payload binary, mime, filename) blob goes through a
  * per-task-initialized converter into markdown text + title
  * metadata (title strategy: metadata > filename > fallback,
  * file.py:66-90), gets classified into the reference's error
  * classes (ERR_ENCRYPTED / ERR_EMPTY), and the extracted text feeds
  * the SAME structural chunker as crawled pages.
  *
  * The converter itself (docling in the reference) needs PDF/OCR
  * libraries this container doesn't have, so the decode is a
  * deterministic stub (UTF-8 decode of the payload). Everything
  * around it — the binary column, the per-partition converter
  * lifecycle, the error taxonomy, the text->chunker handoff, the
  * output schema — is the real seam a docling/tika binding drops
  * into, and the whole stage is oracle-checked because the payloads
  * are the chunker-lite corpus bytes.
  */
object FileIngest {

  final case class Extracted(doc_id: Long, status: String, title: String,
                             text: String)

  /** What the converter (docling) reports about a document — every
    * field optional, mirroring the reference's defensive unwrapping. */
  final case class ConverterDoc(title: Option[String] = None,
                                authors: Seq[String] = Nil,
                                creationDate: Option[String] = None,
                                language: Option[String] = None,
                                numPages: Option[Int] = None,
                                originFilename: Option[String] = None)

  final case class FileMeta(title: String, author: Option[String],
                            createdAt: Option[String], pages: Int,
                            language: String)

  /** Standardized file metadata (file.py:66-140
    * extract_metadata_from_doc): title strategy metadata-title >
    * origin-filename > path basename; authors joined ", "; language
    * defaults "en"; page count num_pages > converted-page count > 0.
    * FileIngestSpec replicates the reference's
    * test_metadata_extraction.py table against this. */
  def fileMetadata(doc: Option[ConverterDoc], resultPages: Int,
                   filePath: String): FileMeta = {
    val title = doc.flatMap(_.title).filter(_.nonEmpty)
      .orElse(doc.flatMap(_.originFilename).filter(_.nonEmpty))
      .getOrElse(filePath.substring(filePath.lastIndexOf('/') + 1))
    val author = doc.map(_.authors).filter(_.nonEmpty).map(_.mkString(", "))
    val createdAt = doc.flatMap(_.creationDate).filter(_.nonEmpty)
    val language = doc.flatMap(_.language).filter(_.nonEmpty).getOrElse("en")
    val pages = doc.flatMap(_.numPages).filter(_ != 0).getOrElse(resultPages)
    FileMeta(title, author, createdAt, pages, language)
  }

  final case class FileChunk(doc_id: Long, status: String, chunk_index: Int,
                             content: String, chunk_type: String, title: String)

  /** What a converter returns for one file: a status from the
    * reference's error taxonomy ("ok" / "error_encrypted" /
    * "error_empty" / "error_conversion", exceptions.py), the
    * converter-reported document metadata (None when the converter
    * has none), the converted page count, and the markdown body. */
  final case class ConverterResult(status: String,
                                   doc: Option[ConverterDoc],
                                   pages: Int,
                                   markdown: String)

  /** The pluggable converter seam (VERDICT R3 wishlist #1): the
    * docling binding's exact surface (file.py:26-60 init_worker +
    * extract) as a Serializable trait a user injects into
    * [[extractText]]/[[ingest]] WITHOUT editing the operator.
    * Lifecycle contract: `open()` once per task before the first
    * convert (the init_worker analog — load models, spawn the
    * converter pool), `convert` per file, `close()` once per task
    * after the last file (even on failure). A JVM binding (tika,
    * pdfbox) implements `convert` directly; an external-process
    * binding (docling) opens the subprocess in `open()` and speaks
    * to it per batch. On PySpark the same contract is a
    * `mapInPandas` UDF whose iterator-of-batches body mirrors
    * open/convert/close — the schema either way is
    * (doc_id, status, title, text), i.e. [[Extracted]]. */
  trait FileConverter extends Serializable {
    def open(): Unit = ()
    def convert(payload: Array[Byte], mime: String,
                filename: String): ConverterResult
    def close(): Unit = ()
  }

  /** Deterministic stand-in converter (this container has no PDF/OCR
    * libraries): rejects encrypted mimes without decoding, flags
    * empty payloads, otherwise UTF-8-decodes the payload as the
    * "converted markdown" and reports no metadata — so the reference
    * title strategy falls through to the path basename. */
  object StubConverter extends FileConverter {
    def convert(payload: Array[Byte], mime: String,
                filename: String): ConverterResult =
      if (mime == "application/x-encrypted")
        ConverterResult("error_encrypted", None, 0, "")
      else if (payload.isEmpty)
        ConverterResult("error_empty", None, 0, "")
      else
        ConverterResult("ok", None, 0, new String(payload, UTF_8))
  }

  /** Synthesized binary-file table (doc_id, payload, mime, filename):
    * payloads are the chunker-lite markdown bytes standing in for
    * converted PDF bodies. doc_id mod 5 == 4 rows carry an
    * "encrypted" mime (converter must reject without decoding);
    * doc_id mod 7 == 3 rows (not already encrypted) have an empty
    * payload (ERR_EMPTY). */
  def fileCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ChunkQueries.chunkLiteCorpus(spark, dir)
      .select($"doc_id",
        when(pmod($"doc_id", lit(7)) === 3, lit("").cast("binary"))
          .otherwise($"text".cast("binary")).as("payload"),
        when(pmod($"doc_id", lit(5)) === 4, lit("application/x-encrypted"))
          .otherwise(lit("application/pdf")).as("mime"),
        concat(lit("file_"), $"doc_id".cast("string"), lit(".pdf")).as("filename"))
  }

  /** The converter stage: one converter lifecycle per task (the
    * init_worker analog — amortized init, process-level isolation on
    * a real cluster), batched per-partition iteration. Returns one
    * row per file with its status, title, and extracted markdown.
    * Inject a real docling/tika binding via `converter`; the default
    * is the deterministic stub the oracle checks. */
  def extractText(files: DataFrame,
                  converter: FileConverter = StubConverter): Dataset[Extracted] = {
    import files.sparkSession.implicits._
    files.select("doc_id", "payload", "mime", "filename")
      .as[(Long, Array[Byte], String, String)]
      .mapPartitions { batch =>
        converter.open()
        val out = batch.map { case (docId, payload, mime, filename) =>
          val r = converter.convert(payload, mime, filename)
          val title = fileMetadata(r.doc, r.pages, filename).title
          Extracted(docId, r.status, title, r.markdown)
        }
        // close after the LAST element is consumed — mapPartitions
        // iterators are lazy, so closing eagerly here would tear the
        // converter down before any convert ran
        new Iterator[Extracted] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) converter.close()
            h
          }
          def next(): Extracted = out.next()
        }
      }
  }

  /** The full blob -> converter -> chunker pipeline stage over any
    * (doc_id, payload, mime, filename) DataFrame. Error files surface
    * as single rows (chunk_index -1) so the error taxonomy is part of
    * the result; ok files emit their real chunker output. */
  def ingest(files: DataFrame, maxTokens: Int = 256,
             converter: FileConverter = StubConverter): DataFrame = {
    import files.sparkSession.implicits._
    extractText(files, converter)
      .flatMap { e =>
        if (e.status != "ok")
          Seq(FileChunk(e.doc_id, e.status, -1, "", "", e.title))
        else
          Chunker.chunkMarkdown(e.text, maxTokens, overlap = 0).zipWithIndex
            .map { case (c, i) =>
              FileChunk(e.doc_id, "ok", i, c.content, c.chunkType, e.title) }
      }
      .toDF()
  }

  /** f1: [[ingest]] over the synthesized corpus, fingerprinted for
    * the driver's oracle compare. */
  def f1FileIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingest(fileCorpus(spark, dir), maxTokens = 32)
      .select($"doc_id", $"status", $"chunk_index",
        when($"status" === "ok", md5($"content")).otherwise(lit("")).as("content_md5"),
        $"chunk_type", $"title")
      .orderBy($"doc_id", $"chunk_index")
  }

  /** Magic-byte MIME sniffing over any binary payload column — the
    * converter-ROUTING step ahead of f1's extract (the reference
    * trusts a client-supplied mime; a 100 TB dump can't — headers
    * are the only trustworthy signal). Match order mirrors magic
    * specificity: container signatures first (PNG 8-byte, GIF
    * 6-byte), then 4-byte (RIFF/WAVE pair, ZIP PK\\x03\\x04, "%PDF-"),
    * then ustar at offset 258, then JPEG's 2-byte SOI last so a
    * longer signature never loses to a prefix collision. Pure
    * codegen CASE over hex prefixes. */
  def sniffMime(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def pfx(from: Int, bytes: Int) = hex(substring(payload, from, bytes))
    when(pfx(1, 8) === "89504E470D0A1A0A", "image/png")
      .when(pfx(1, 6) === "474946383761" || pfx(1, 6) === "474946383961", "image/gif")
      .when(pfx(1, 4) === "52494646" && pfx(9, 4) === "57415645", "audio/wav")
      .when(pfx(1, 4) === "504B0304", "application/zip")
      .when(pfx(1, 5) === "255044462D", "application/pdf")
      .when(pfx(258, 5) === "7573746172", "application/x-tar")
      .when(pfx(1, 2) === "FFD8", "image/jpeg")
      .otherwise("application/octet-stream")
  }

  /** f2: type-sniff routing over a synthesized mixed dump — each doc
    * wrapped in one of 8 container signatures keyed on doc_id, the
    * parser recovers the type from bytes alone; oracle recomputes
    * the expected route from the synth rule. */
  def f2TypeSniff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val body = hex(substring($"text", 1, 64).cast("binary"))
    val wrapped = when(pmod($"doc_id", lit(8)) === 0,
        concat(lit("89504E470D0A1A0A"), body))
      .when(pmod($"doc_id", lit(8)) === 1, concat(lit("474946383961"), body))
      .when(pmod($"doc_id", lit(8)) === 2,
        concat(lit("52494646"), lit("00000000"), lit("57415645"), body))
      .when(pmod($"doc_id", lit(8)) === 3, concat(lit("504B0304"), body))
      .when(pmod($"doc_id", lit(8)) === 4, concat(lit("255044462D"), body))
      .when(pmod($"doc_id", lit(8)) === 5,
        concat(repeat(lit("00"), 257), lit("7573746172"), body))
      .when(pmod($"doc_id", lit(8)) === 6, concat(lit("FFD8FFE0"), body))
      // leading space: no magic starts with 0x20, so the "plain"
      // arm can never collide with a document that happens to begin
      // with a signature string
      .otherwise(concat(lit("20"), body))
    graft.Tables.documents(spark, dir)
      .select($"doc_id", unhex(wrapped).as("payload"))
      .select($"doc_id", sniffMime($"payload").as("mime"))
      .orderBy($"doc_id")
  }

  /** The f3 detector over any (doc_id, payload binary) frame: BOM
    * identification (UTF-8 / UTF-16LE / UTF-16BE byte-order marks)
    * plus content statistics over the first 64 post-BOM bytes — the
    * hex string split into byte pairs, counting 0x00 bytes (UTF-16's
    * signature for ASCII-range text) and high bytes (≥ 0x80,
    * multi-byte UTF-8 / legacy encodings). The guess rule routes:
    * >30% zero bytes → utf16-like, no high bytes → ascii, else
    * utf8-like. */
  def detectEncoding(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    def b(i: Int): Column = call_function("byte_at", $"payload", lit(i.toLong))
    val bom = when(b(1) === 0xEF && b(2) === 0xBB && b(3) === 0xBF, "utf8-bom")
      .when(b(1) === 0xFF && b(2) === 0xFE, "utf16le-bom")
      .when(b(1) === 0xFE && b(2) === 0xFF, "utf16be-bom")
      .otherwise("none")
    val off = when(bom === "utf8-bom", 4)
      .when(bom === "none", 1).otherwise(3)
    val pairs = regexp_extract_all(
      hex(expr("substring(payload, _off, 64)")), lit(".."), lit(0))
    blobs
      .withColumn("_bom", bom)
      .withColumn("_off", off)
      .withColumn("_pairs", pairs)
      .select($"doc_id",
        $"_bom".as("bom"),
        octet_length($"payload").cast("long").as("n_bytes"),
        size(filter($"_pairs", p => p === "00")).cast("long").as("zero_pairs"),
        size(filter($"_pairs", p => substring(p, 1, 1).rlike("[89A-F]")))
          .cast("long").as("high_pairs"),
        size($"_pairs").as("_np"))
      .withColumn("guess",
        when($"_np" === 0, lit("empty"))
          .when($"zero_pairs".cast("double") /
            greatest($"_np", lit(1)) > 0.3, "utf16-like")
          .when($"high_pairs" === 0L, "ascii")
          .otherwise("utf8-like"))
      .drop("_np")
      .orderBy($"doc_id")
  }

  /** f3: text-ENCODING sniffing — the routing step between f2's
    * container detection and any text extraction: a 100 TB dump
    * mixes UTF-8, BOM'd UTF-16 exports, and legacy single-byte
    * files, and decoding with the wrong charset silently corrupts
    * the corpus. Synth: per-doc ASCII bodies (length varying by
    * doc_id) wrapped as UTF-8-BOM / UTF-16LE / UTF-16BE / bare; the
    * oracle recomputes every statistic from the synth rules. */
  def f3EncodingSniff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bodyHex = hex(expr(
      "cast(rpad(cast(doc_id as string), cast(20 + doc_id % 12 as int), 'x') as binary)"))
    val prs = regexp_extract_all(bodyHex, lit(".."), lit(0))
    val leHex = concat(lit("FFFE"),
      array_join(transform(prs, p => concat(p, lit("00"))), ""))
    val beHex = concat(lit("FEFF"),
      array_join(transform(prs, p => concat(lit("00"), p)), ""))
    val wrapped = when(pmod($"doc_id", lit(4)) === 0, concat(lit("EFBBBF"), bodyHex))
      .when(pmod($"doc_id", lit(4)) === 1, leHex)
      .when(pmod($"doc_id", lit(4)) === 2, beHex)
      .otherwise(bodyHex)
    detectEncoding(
      graft.Tables.documents(spark, dir)
        .select($"doc_id", unhex(wrapped).as("payload")))
  }

  /** f4: ARCHIVE ingestion — crawl artifacts frequently arrive as
    * archives, and the ingest plane must expand them into per-entry
    * documents before chunking: the STORED-zip corpus (m9's real
    * PK-header synthesis) is walked via the central directory, each
    * entry's bytes are sliced out at its local-header data offset
    * and UTF-8 decoded (Multimodal.extractZipEntries — byte_at
    * kernel + substr, no UDF), and every entry becomes a document
    * row with its token count. The oracle recomputes entry names and
    * contents first-principles from the synthesis rules (the m10
    * convention), so the whole synthesize→walk→slice→decode round
    * trip is hash-checked. Deflated members are the documented
    * FileConverter-stub boundary (a real inflater slots in there). */
  def f4ArchiveIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Multimodal.extractZipEntries(Multimodal.zipBlobs(spark, dir))
      .select($"doc_id", $"entry", $"content",
        size(expr("regexp_extract_all(content, '\\\\S+', 0)")).cast("long")
          .as("ws_tokens"))
      .orderBy($"doc_id", $"entry")
  }

  /** Real mixed STORED+DEFLATED archives, built per row by the JDK
    * zip writer — DEFLATE bitstreams need a real compressor, so this
    * corpus can't be hex-synthesized like m9's. One archive per
    * document: a STORED text entry (f4's slice convention) plus a
    * DEFLATED entry carrying a longer slice — the layout real crawl
    * dumps overwhelmingly use (file.py's converter pool handles
    * them; our m9/f4 walk covered STORED only until now). */
  def deflatedZipCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", substring($"text", 1, 64).as("s_stored"),
        substring($"text", 1, 160).as("s_deflated"))
      .as[(Long, String, String)]
      .map { case (id, sStored, sDeflated) =>
        val bos = new java.io.ByteArrayOutputStream()
        val zos = new java.util.zip.ZipOutputStream(bos)
        val b1 = sStored.getBytes(UTF_8)
        val e1 = new java.util.zip.ZipEntry(s"doc_$id.txt")
        e1.setMethod(java.util.zip.ZipEntry.STORED)
        e1.setSize(b1.length.toLong); e1.setCompressedSize(b1.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(b1)
        e1.setCrc(crc.getValue)
        zos.putNextEntry(e1); zos.write(b1); zos.closeEntry()
        val e2 = new java.util.zip.ZipEntry(s"doc_$id.deflated.txt")
        e2.setMethod(java.util.zip.ZipEntry.DEFLATED)
        zos.putNextEntry(e2); zos.write(sDeflated.getBytes(UTF_8))
        zos.closeEntry(); zos.close()
        (id, bos.toByteArray)
      }.toDF("doc_id", "payload")
  }

  /** Archive expansion with REAL member extraction — m9's
    * central-directory walk re-run on the JVM so DEFLATED members
    * (method 8, the overwhelming majority in real dumps) inflate
    * through java.util.zip.Inflater. The Inflater follows the
    * [[FileConverter]] per-task lifecycle: allocated once per task
    * (open), reset per member, native zlib state released after the
    * last archive (close) — the same amortized-init discipline as
    * [[extractText]]. STORED members slice exactly like the f4
    * kernel path. Malformed members are skipped, never thrown —
    * poison archives can't kill a 100 TB ingest. */
  def expandArchives(blobs: DataFrame, maxEntries: Int = 4): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val inflater = new java.util.zip.Inflater(true) // open(): per task
        // close(): on task completion, so a downstream limit/take that
        // abandons the iterator still releases the native zlib state
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => inflater.end()))
        it.flatMap { case (id, b) =>
          walkZipMembers(b, maxEntries, inflater).map {
            case (entry, method, content) => (id, entry, method, content)
          }
        }
      }.toDF("doc_id", "entry", "method", "content")
  }

  /** EOCD → central directory → local-header data offsets, one
    * archive; reference behavior:
    * apps/ingestion-worker/handlers/file.py (converter pool expands
    * real archives). `nowrap` Inflater = raw deflate, the zip
    * framing. Returns (entry, method, content); undecodable members
    * are dropped. */
  private[operators] def walkZipMembers(
      b: Array[Byte], maxEntries: Int,
      inflater: java.util.zip.Inflater): Seq[(String, String, String)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      le16(i).toLong | (le16(i + 2).toLong << 16)
    if (b.length < 22) return Nil
    // EOCD is the last PK\x05\x06 in the final 64KB+22 bytes — real
    // archives carry zip comments / trailing bytes, so the record is
    // rarely at the fixed b.length-22 offset. Backward scan, bounded.
    var eocd = -1
    var scan = b.length - 22
    val scanFloor = math.max(0, b.length - 22 - 0xffff)
    while (eocd < 0 && scan >= scanFloor) {
      if (u8(scan) == 0x50 && u8(scan + 1) == 0x4b &&
          u8(scan + 2) == 0x05 && u8(scan + 3) == 0x06 &&
          scan + 22 + le16(scan + 20) <= b.length) eocd = scan
      else scan -= 1
    }
    if (eocd < 0) return Nil
    var ce = le32(eocd + 16).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var i = 0
    while (i < maxEntries && ce >= 0 && ce + 46 <= b.length &&
           u8(ce) == 0x50 && u8(ce + 1) == 0x4b &&
           u8(ce + 2) == 0x01 && u8(ce + 3) == 0x02) {
      val method = le16(ce + 10)
      val csz = le32(ce + 20).toInt
      val usz = le32(ce + 24).toInt
      val nlen = le16(ce + 28); val xlen = le16(ce + 30)
      val clen = le16(ce + 32)
      val loff = le32(ce + 42).toInt
      if (ce + 46 + nlen <= b.length && loff >= 0 && loff + 30 <= b.length) {
        val name = new String(b, ce + 46, nlen, UTF_8)
        val data = loff + 30 + le16(loff + 26) + le16(loff + 28)
        if (csz >= 0 && usz >= 0 && data + csz <= b.length) {
          if (method == 0)
            out += ((name, "stored", new String(b, data, usz.min(csz), UTF_8)))
          else if (method == 8) {
            try {
              inflater.reset()
              inflater.setInput(b, data, csz)
              val dst = new Array[Byte](usz)
              var got = 0
              var stalled = false
              while (got < usz && !inflater.finished() && !stalled) {
                val n = inflater.inflate(dst, got, usz - got)
                if (n == 0)
                  stalled = inflater.needsInput() || inflater.needsDictionary()
                else got += n
              }
              if (got == usz)
                out += ((name, "deflated", new String(dst, UTF_8)))
            } catch { case _: java.util.zip.DataFormatException => () }
          }
        }
      }
      ce += 46 + nlen + xlen + clen
      i += 1
    }
    out.toSeq
  }

  /** f5: DEFLATE archive ingestion — f4's expansion over archives
    * with REAL compressed members: each document's mixed
    * STORED+DEFLATED archive is walked and every member inflated to
    * its exact text; the oracle recomputes names and contents
    * first-principles from the synthesis rules, so the whole
    * compress→walk→inflate round trip is hash-checked. */
  def f5DeflateIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    expandArchives(deflatedZipCorpus(spark, dir))
      .select($"doc_id", $"entry", $"method", $"content",
        size(expr("regexp_extract_all(content, '\\\\S+', 0)")).cast("long")
          .as("ws_tokens"))
      .orderBy($"doc_id", $"entry")
  }

  /** f6: WARC record-stream ingestion — the CommonCrawl container
    * shape: a blob is WARC records back to back, each
    * `WARC/1.0\r\n<headers>\r\n\r\n<Content-Length bytes>\r\n\r\n`,
    * so the walk materializes bounded hop offsets exactly like the
    * m6/m9 marker chains (next = header_end + 4 + Content-Length +
    * 4) and extracts WARC-Type / WARC-Target-URI / Content-Length by
    * regex over the SLICED header block only — headers are
    * order-independent and unknown headers are skipped, which is
    * what real WARCs require. Payload slicing is length-driven
    * (never delimiter-driven), so payloads containing blank lines
    * can't derail the walk. Non-WARC blobs and truncated tails yield
    * typed nothing. Synthesis: two records per document (response
    * carrying a text slice, metadata carrying a fetch note); the
    * oracle recomputes every field from the rules. */
  def f6WarcIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = warcSynthRecords(spark, dir)
      .select($"doc_id", concat($"rec1", $"rec2").as("blob"))
    parseWarcRecords(blobs).orderBy($"doc_id", $"record_idx")
  }

  /** The shared WARC record synthesis (f6's rules): two records per
    * document — a response carrying a doc-text slice and a metadata
    * record carrying a fetch note. f6 concatenates them bare; f8
    * wraps each in its own gzip member (the CommonCrawl wire
    * layout). */
  private def warcSynthRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clean = regexp_replace($"text", "\\r", "")
    val uri = concat(lit("https://host"), pmod($"doc_id", lit(3)),
      lit(".example.com/page/"), $"doc_id")
    def rec(typ: String, u: Column, payload: Column): Column =
      concat(lit("WARC/1.0\r\nWARC-Type: "), lit(typ),
        lit("\r\nWARC-Target-URI: "), u,
        lit("\r\nContent-Length: "), length(payload).cast("string"),
        lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
    graft.Tables.documents(spark, dir)
      .select($"doc_id",
        rec("response", uri,
          clean.substr(lit(1), lit(40) + pmod($"doc_id", lit(25)).cast("int")))
          .as("rec1"),
        rec("metadata", uri, concat(lit("fetched="), $"doc_id")).as("rec2"))
  }

  /** The WARC walker over any (doc_id, blob string) frame: bounded
    * `maxRecords` hops, one row per well-formed record. `carry`
    * names extra input columns to keep on every output row (f8
    * rides its per-doc gzip member count through). */
  def parseWarcRecords(blobs: DataFrame, maxRecords: Int = 4,
                       carry: Seq[String] = Nil): DataFrame = {
    import blobs.sparkSession.implicits._
    // \r\n\r\n as chr-concats so the same literal works in both the
    // Spark plan and the DuckDB replay
    val crlf2 = "concat(chr(13), chr(10), chr(13), chr(10))"
    var df = blobs.withColumn("_len", length($"blob").cast("long"))
    var off: Column = lit(1L)
    (1 to maxRecords).foreach { k =>
      df = df.withColumn(s"_o$k", off)
      df = df.withColumn(s"_rel$k",
        when(col(s"_o$k") <= $"_len",
          expr(s"locate($crlf2, substring(blob, _o$k))").cast("long")))
      df = df.withColumn(s"_he$k",
        when(col(s"_rel$k") > 0L, col(s"_o$k") + col(s"_rel$k") - 1L))
      df = df.withColumn(s"_hdr$k",
        when(col(s"_he$k").isNotNull,
          expr(s"substring(blob, _o$k, _he$k - _o$k)")))
      df = df.withColumn(s"_hdr$k",
        when(col(s"_hdr$k").startsWith("WARC/1.0\r\n"), col(s"_hdr$k")))
      df = df.withColumn(s"_cl$k",
        when(col(s"_hdr$k").isNotNull,
          regexp_extract(col(s"_hdr$k"), "Content-Length: ([0-9]+)", 1)
            .cast("long")))
      df = df.withColumn(s"_ct$k",
        when(col(s"_cl$k").isNotNull &&
             col(s"_he$k") + 3L + col(s"_cl$k") <= $"_len",
          expr(s"substring(blob, _he$k + 4, _cl$k)")))
      df = df.withColumn(s"_ty$k",
        when(col(s"_ct$k").isNotNull,
          regexp_extract(col(s"_hdr$k"), "WARC-Type: ([a-z]+)", 1)))
      df = df.withColumn(s"_ur$k",
        when(col(s"_ct$k").isNotNull,
          regexp_extract(col(s"_hdr$k"), "WARC-Target-URI: (\\S+)", 1)))
      off = col(s"_he$k") + 4L + coalesce(col(s"_cl$k"), lit(0L)) + 4L
    }
    df.select(($"doc_id" +: carry.map(col)) :+
        posexplode(array((1 to maxRecords).map(k =>
          struct(col(s"_ty$k").as("warc_type"), col(s"_ur$k").as("target_uri"),
            col(s"_cl$k").as("content_len"), col(s"_ct$k").as("content"))): _*))
          .as(Seq("record_idx", "r")): _*)
      .filter($"r.content".isNotNull && $"r.warc_type" =!= "")
      .select(($"doc_id" +: carry.map(col)) ++ Seq(
        ($"record_idx" + 1).as("record_idx"),
        $"r.warc_type".as("warc_type"), $"r.target_uri".as("target_uri"),
        $"r.content_len".as("content_len"), $"r.content".as("content")): _*)
  }

  /** One gzip MEMBER around `data`: the RFC 1952 framing CommonCrawl
    * uses per WARC record — 10-byte header (magic 1f 8b, CM deflate,
    * no flags, mtime 0, OS unknown), raw-deflate body from the
    * per-task `defl` (which must be nowrap=true — gzip carries its
    * own framing, not the zlib wrapper f7 uses), CRC32 + ISIZE
    * little-endian trailer. */
  private def gzipMember(defl: java.util.zip.Deflater,
                         data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    defl.reset(); defl.setInput(data); defl.finish()
    val buf = new Array[Byte](512)
    while (!defl.finished()) { val n = defl.deflate(buf); out.write(buf, 0, n) }
    val crc = new java.util.zip.CRC32(); crc.update(data)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue); le32(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** The f8 corpus: each document's two WARC records (f6's synthesis
    * rules), each compressed as its OWN gzip member — CommonCrawl's
    * actual wire layout (one member per record is what lets readers
    * seek to a record by offset without inflating the whole file).
    * Real per-task Deflater, raw-deflate mode (the m12/f7 build
    * discipline), so the round trip exercises real RFC 1952 bytes. */
  def warcGzCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    warcSynthRecords(spark, dir).as[(Long, String, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => defl.end()))
        it.map { case (id, r1, r2) =>
          (id, gzipMember(defl, r1.getBytes(UTF_8)) ++
            gzipMember(defl, r2.getBytes(UTF_8)))
        }
      }.toDF("doc_id", "payload")
  }

  /** Gzip member walk over any (doc_id, payload binary) frame: each
    * blob's concatenated RFC 1952 members inflate through ONE
    * per-task Inflater (nowrap — gzip framing is parsed here, not by
    * zlib) into (doc_id, gz_members, blob text). Header parsing
    * honors the optional fields real .warc.gz writers emit (FEXTRA /
    * FNAME / FCOMMENT / FHCRC skips); every member's CRC32 and ISIZE
    * trailer is VERIFIED against the inflated bytes — a member that
    * fails magic, inflation, or checksum stops the walk with the
    * prior members intact (poison blobs degrade, never throw, the
    * 100 TB ingest rule). Member boundaries come from
    * Inflater.getBytesRead, so payload bytes that look like gzip
    * magic can't derail the hop. */
  def gunzipMembers(blobs: DataFrame, maxMembers: Int = 8): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val inf = new java.util.zip.Inflater(true)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => inf.end()))
        it.map { case (id, b) =>
          val (n, text) = walkGzipMembers(b, maxMembers, inf)
          (id, n, text)
        }
      }.toDF("doc_id", "gz_members", "blob")
  }

  /** One blob's member walk: (members verified, concatenated
    * inflated text). */
  private[operators] def walkGzipMembers(
      b: Array[Byte], maxMembers: Int,
      inf: java.util.zip.Inflater): (Int, String) = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    val out = new java.io.ByteArrayOutputStream()
    var members = 0
    var o = 0
    var ok = true
    while (ok && members < maxMembers && o + 10 <= b.length &&
           u8(o) == 0x1f && u8(o + 1) == 0x8b && u8(o + 2) == 8) {
      val flg = u8(o + 3)
      var ho = o + 10
      if ((flg & 4) != 0) // FEXTRA: 2-byte little-endian length + bytes
        ho = if (ho + 2 <= b.length) ho + 2 + le16(ho) else b.length + 1
      if ((flg & 8) != 0) { // FNAME: NUL-terminated
        while (ho < b.length && b(ho) != 0) ho += 1
        ho += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
        while (ho < b.length && b(ho) != 0) ho += 1
        ho += 1
      }
      if ((flg & 2) != 0) ho += 2 // FHCRC
      if (ho >= b.length) ok = false
      else {
        try {
          inf.reset()
          inf.setInput(b, ho, b.length - ho)
          val mem = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](512)
          var stalled = false
          while (!inf.finished() && !stalled) {
            val n = inf.inflate(buf)
            if (n == 0) stalled = inf.needsInput() || inf.needsDictionary()
            else mem.write(buf, 0, n)
          }
          val consumed = inf.getBytesRead.toInt
          val body = mem.toByteArray
          if (!inf.finished() || ho + consumed + 8 > b.length) ok = false
          else {
            val crc = new java.util.zip.CRC32(); crc.update(body)
            if (le32(ho + consumed) == crc.getValue &&
                le32(ho + consumed + 4) == (body.length.toLong & 0xffffffffL)) {
              out.write(body); members += 1; o = ho + consumed + 8
            } else ok = false
          }
        } catch { case _: java.util.zip.DataFormatException => ok = false }
      }
    }
    (members, new String(out.toByteArray, UTF_8))
  }

  /** f8: GZIP-WRAPPED WARC ingestion — CommonCrawl's wire format
    * (`.warc.gz`, one gzip member per record). The member walk
    * ([[gunzipMembers]]: per-task nowrap Inflater behind the f5
    * lifecycle, header-flag skips, CRC/ISIZE verification per
    * member) reassembles the record stream, which then parses
    * through the SAME bounded-hop walker as bare WARC (f6) — the
    * composition the r10 verdict named: without it a 100 TB crawl
    * dump needs out-of-band pre-decompression. gz_members rides on
    * every row, gating the member-BOUNDARY logic: a walk that
    * inflated across a boundary or missed a member can't report 2.
    * Oracle recomputes every field first-principles from the
    * synthesis rules, hash-gating the compress→walk→inflate→parse
    * round trip even though DuckDB cannot gunzip. */
  def f8WarcGz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    parseWarcRecords(gunzipMembers(warcGzCorpus(spark, dir)),
      carry = Seq("gz_members"))
      .orderBy($"doc_id", $"record_idx")
  }

  /** f7: PDF TEXT extraction — m14 reads the skeleton; this pulls
    * the CONTENT: each document's page stream, FlateDecode-
    * compressed (real zlib) for even ids and stored plain for odd.
    * The walk is the binary discipline the m-family uses:
    * bytes_index_of finds the `stream\n` delimiter (a binary-safe
    * locate — a cast-to-string round trip would corrupt offsets at
    * the first non-UTF-8 deflate byte), /Length and /Filter parse by
    * regexp over the ALL-ASCII dict slice BEFORE the delimiter, and
    * the payload slice is LENGTH-driven, never delimiter-driven —
    * deflate bytes can legally contain 'endstream'. Only the sliced
    * stream bytes reach the per-task Inflater (the f5 lifecycle;
    * PDF FlateDecode uses the zlib wrapper, nowrap=false). The
    * oracle recomputes the plaintext first-principles from the
    * synthesis rules, hash-gating the compress→walk→inflate round
    * trip even though DuckDB cannot inflate. */
  def f7PdfText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val slice = regexp_replace(substring($"text", 1, 60), "[^A-Za-z0-9 ]", "")
    val blobs = graft.Tables.documents(spark, dir)
      .select($"doc_id", concat(lit("BT ("), slice, lit(") Tj ET")).as("c"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => defl.end()))
        it.map { case (id, c) =>
          val head = "%PDF-1.5\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
          val cBytes = c.getBytes("US-ASCII")
          val (body, filt) =
            if (id % 2 == 0)
              (deflateBytes(defl, cBytes), " /Filter /FlateDecode")
            else (cBytes, "")
          val obj = s"4 0 obj\n<< /Length ${body.length}$filt >>\nstream\n"
          (id, head.getBytes("US-ASCII") ++ obj.getBytes("US-ASCII") ++
            body ++ "\nendstream\nendobj\n%%EOF".getBytes("US-ASCII"))
        }
      }.toDF("doc_id", "payload")
    extractPdfText(blobs).orderBy($"doc_id")
  }

  private def deflateBytes(defl: java.util.zip.Deflater,
                           data: Array[Byte]): Array[Byte] = {
    defl.reset(); defl.setInput(data); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) { val n = defl.deflate(buf); out.write(buf, 0, n) }
    out.toByteArray
  }

  /** The content-stream extractor over any (doc_id, payload binary)
    * frame: columnar slice, per-task inflate, BT (…) Tj unwrap.
    * Payloads with no stream, a malformed /Length, or an
    * undecodable body yield no row — poison blobs never throw. */
  def extractPdfText(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val sliced = blobs
      .withColumn("_so", expr(
        "bytes_index_of(payload, cast(concat('stream', chr(10)) as binary), cast(1 as bigint))"))
      .withColumn("_dict", when($"_so" > 0,
        expr("cast(substring(payload, 1, cast(_so as int) - 1) as string)")))
      .withColumn("_len", when($"_dict".isNotNull, expr(
        "cast(nullif(regexp_extract(_dict, '/Length ([0-9]+)', 1), '') as bigint)")))
      .withColumn("_flate",
        coalesce($"_dict".contains("/FlateDecode"), lit(false)))
      .withColumn("_data", when($"_len".isNotNull,
        expr("substring(payload, cast(_so as int) + 7, cast(_len as int))")))
      .filter($"_data".isNotNull)
      .select($"doc_id", $"_flate", $"_data")
    sliced.as[(Long, Boolean, Array[Byte])]
      .mapPartitions { it =>
        val inf = new java.util.zip.Inflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => inf.end()))
        it.flatMap { case (id, flate, d) =>
          val txt =
            if (!flate) Some(new String(d, "US-ASCII"))
            else try {
              inf.reset()
              inf.setInput(d)
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](256)
              var stalled = false
              while (!inf.finished() && !stalled) {
                val n = inf.inflate(buf)
                if (n == 0) stalled = inf.needsInput() || inf.needsDictionary()
                else out.write(buf, 0, n)
              }
              if (inf.finished())
                Some(new String(out.toByteArray, "US-ASCII"))
              else None
            } catch {
              case _: java.util.zip.DataFormatException => None
            }
          txt.map(t => (id, if (flate) "flate" else "plain", t))
        }
      }.toDF("doc_id", "method", "stream_text")
      .select($"doc_id", $"method",
        regexp_extract($"stream_text", "^BT \\((.*)\\) Tj ET$", 1)
          .as("content"))
      .select($"doc_id", $"method", $"content",
        size(expr("regexp_extract_all(content, '\\\\S+', 0)")).cast("long")
          .as("ws_tokens"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f8_warc_gz" -> f8WarcGz _,
    "f7_pdf_text" -> f7PdfText _,
    "f6_warc_ingest" -> f6WarcIngest _,
    "f3_encoding_sniff" -> f3EncodingSniff _,
    "f1_file_ingest" -> f1FileIngest _,
    "f2_type_sniff" -> f2TypeSniff _,
    "f4_archive_ingest" -> f4ArchiveIngest _,
    "f5_deflate_ingest" -> f5DeflateIngest _)

  val oracles: Map[String, String] = Map(
    // first-principles recompute of the .warc.gz synthesis: records
    // and fields derive from the f6 rules, gz_members is the
    // two-members-per-doc layout — a walk that missed a boundary,
    // failed a CRC, or inflated across members can't hash-match
    "f8_warc_gz" ->
      """WITH base AS (
        |  SELECT doc_id, replace(text, chr(13), '') AS clean,
        |    'https://host' || (doc_id % 3) || '.example.com/page/' || doc_id
        |      AS uri
        |  FROM documents),
        |recs AS (
        |  SELECT doc_id, 1 AS record_idx, 'response' AS warc_type,
        |    uri AS target_uri,
        |    substring(clean, 1, 40 + CAST(doc_id % 25 AS INTEGER)) AS content
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, 2, 'metadata', uri, 'fetched=' || doc_id FROM base)
        |SELECT doc_id, CAST(2 AS INTEGER) AS gz_members,
        |  CAST(record_idx AS INTEGER) AS record_idx, warc_type,
        |  target_uri, CAST(length(content) AS BIGINT) AS content_len, content
        |FROM recs
        |ORDER BY doc_id, record_idx""".stripMargin,
    // first-principles recompute of the stream plaintext from the
    // synthesis rules — the compress->walk->inflate round trip is
    // hash-gated without DuckDB ever inflating
    "f7_pdf_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'flate' ELSE 'plain' END AS method,
        |  regexp_replace(substring(text, 1, 60), '[^A-Za-z0-9 ]', '', 'g')
        |    AS content,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(substring(text, 1, 60), '[^A-Za-z0-9 ]', '', 'g'),
        |    '\S+')) AS BIGINT) AS ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the WARC synthesis rules: a
    // mis-stepped hop, bad Content-Length parse, or off-by-one slice
    // hash-mismatches
    "f6_warc_ingest" ->
      """WITH base AS (
        |  SELECT doc_id, replace(text, chr(13), '') AS clean,
        |    'https://host' || (doc_id % 3) || '.example.com/page/' || doc_id
        |      AS uri
        |  FROM documents),
        |recs AS (
        |  SELECT doc_id, 1 AS record_idx, 'response' AS warc_type,
        |    uri AS target_uri,
        |    substring(clean, 1, 40 + CAST(doc_id % 25 AS INTEGER)) AS content
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id, 2, 'metadata', uri, 'fetched=' || doc_id FROM base)
        |SELECT doc_id, CAST(record_idx AS INTEGER) AS record_idx, warc_type,
        |  target_uri, CAST(length(content) AS BIGINT) AS content_len, content
        |FROM recs
        |ORDER BY doc_id, record_idx""".stripMargin,
    // first-principles recompute of the deflated-corpus rules: entry
    // names, methods, and contents all derive from the doc text —
    // a mis-inflated member can't hash-match
    "f5_deflate_ingest" ->
      """SELECT doc_id, entry, method, content,
        |  CAST(len(regexp_extract_all(content, '\S+')) AS BIGINT) AS ws_tokens
        |FROM (
        |  SELECT doc_id, 'doc_' || doc_id || '.txt' AS entry,
        |    'stored' AS method, substring(text, 1, 64) AS content
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'doc_' || doc_id || '.deflated.txt',
        |    'deflated', substring(text, 1, 160)
        |  FROM documents)
        |ORDER BY doc_id, entry""".stripMargin,
    // first-principles recompute of the zip synthesis rules: entry
    // names/contents straight from the doc, tokens over the content
    "f4_archive_ingest" ->
      """SELECT doc_id, entry, content,
        |  CAST(len(regexp_extract_all(content, '\S+')) AS BIGINT) AS ws_tokens
        |FROM (
        |  SELECT doc_id, 'doc_' || doc_id || '.txt' AS entry,
        |    substring(text, 1, 64) AS content
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'meta/' || doc_id || '.json',
        |    '{"id":' || doc_id || '}'
        |  FROM documents WHERE doc_id % 2 = 0)
        |ORDER BY doc_id, entry""".stripMargin,
    // first-principles recompute from the synth rules: BOM class and
    // byte statistics all derive from doc_id
    "f3_encoding_sniff" ->
      """WITH f AS (
        |  SELECT doc_id, CAST(20 + doc_id % 12 AS BIGINT) AS l
        |  FROM documents)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'utf8-bom' WHEN 1 THEN 'utf16le-bom'
        |    WHEN 2 THEN 'utf16be-bom' ELSE 'none' END AS bom,
        |  CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 3 + l WHEN 1 THEN 2 + 2*l
        |    WHEN 2 THEN 2 + 2*l ELSE l END AS n_bytes,
        |  CASE WHEN doc_id % 4 IN (1, 2) THEN l ELSE CAST(0 AS BIGINT) END
        |    AS zero_pairs,
        |  CAST(0 AS BIGINT) AS high_pairs,
        |  CASE WHEN doc_id % 4 IN (1, 2) THEN 'utf16-like' ELSE 'ascii' END
        |    AS guess
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    "f2_type_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 8
        |    WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'image/gif'
        |    WHEN 2 THEN 'audio/wav'
        |    WHEN 3 THEN 'application/zip'
        |    WHEN 4 THEN 'application/pdf'
        |    WHEN 5 THEN 'application/x-tar'
        |    WHEN 6 THEN 'image/jpeg'
        |    ELSE 'application/octet-stream'
        |  END AS mime
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "f1_file_ingest" ->
      s"""WITH ${ChunkQueries.chunkLiteSql},
        |ok AS (
        |  SELECT doc_id, 'ok' AS status, chunk_index, md5(content) AS content_md5,
        |    chunk_type, 'file_' || doc_id || '.pdf' AS title
        |  FROM chunks
        |  WHERE doc_id % 5 <> 4 AND doc_id % 7 <> 3),
        |err AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 4 THEN 'error_encrypted' ELSE 'error_empty' END AS status,
        |    -1 AS chunk_index, '' AS content_md5, '' AS chunk_type,
        |    'file_' || doc_id || '.pdf' AS title
        |  FROM documents
        |  WHERE doc_id % 5 = 4 OR doc_id % 7 = 3)
        |SELECT doc_id, status, CAST(chunk_index AS INTEGER) AS chunk_index,
        |  content_md5, chunk_type, title
        |FROM (SELECT * FROM ok UNION ALL SELECT * FROM err)
        |ORDER BY doc_id, chunk_index""".stripMargin)
}
