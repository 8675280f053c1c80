package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.G).
  *
  * Image/audio/video decode libraries are not in this container, so
  * the DECODE step is a deterministic fake; everything Spark-side —
  * opaque `binary` payload column, typed metadata struct, batched
  * per-partition frame extraction, output schema/partitioning — is
  * real and is exactly the shape a Pandas-UDF/mapInPandas decode
  * would slot into on a full cluster.
  */
object Multimodal {

  final case class Frame(doc_id: Long, frame_idx: Int, frame_md5: String,
                         frame_bytes: Int)

  /** m1: opaque binary column + typed metadata extraction. The
    * payload is the document text bytes standing in for an encoded
    * image; metadata (size, checksum, synthetic mime) is computed
    * without decoding — the scan never materializes pixels. */
  def m1BinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"), $"source")
      .select($"doc_id",
        octet_length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("checksum"),
        concat(lit("application/x-fake-"),
               element_at(split($"source", "src"), 2)).as("mime"))
      .orderBy($"doc_id")
  }

  private def toHex(bytes: Array[Byte], from: Int, until: Int,
                    chars: Array[Char]): String = {
    val out = new Array[Char]((until - from) * 2)
    var i = from
    while (i < until) {
      val b = bytes(i) & 0xff
      out((i - from) * 2) = chars(b >>> 4)
      out((i - from) * 2 + 1) = chars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  private val HexUpper = "0123456789ABCDEF".toCharArray
  private val HexLower = "0123456789abcdef".toCharArray

  /** m2: deterministic fake frame-sampler. Batched per-partition
    * iteration (the mapInPandas analog): every 64-byte stride yields
    * one "frame", fingerprinted as md5 over the frame's uppercase hex
    * encoding — byte-exact yet expressible in ANSI SQL (DuckDB can
    * slice hex text but not blobs), so the whole op is oracle-checked
    * rather than rows-only. Trailing sub-stride bytes fold into the
    * final frame's byte count only when they fill a full stride;
    * a short payload yields one truncated frame. */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stride = 64
    Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition loop == one decoder instance per task, the
        // shape a real codec binding needs (init cost amortized)
        batch.flatMap { case (docId, payload) =>
          val digest = java.security.MessageDigest.getInstance("MD5")
          Iterator.range(0, math.max(1, payload.length / stride)).map { i =>
            val from = i * stride
            val until = math.min(payload.length, from + stride)
            val hexFrame = toHex(payload, from, until, HexUpper)
            digest.reset()
            val d = digest.digest(hexFrame.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            Frame(docId, i, toHex(d, 0, d.length, HexLower), until - from)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  /** m3: REAL image-header parsing — PNG signature check + IHDR
    * width/height/bit-depth/color-type decoded from the payload's
    * first 26 bytes with binary column math (substring on binary →
    * hex → conv base-16), no image library involved. This is the
    * metadata tier production pipelines actually run over 100 TB of
    * images: header fields for the catalog come from a header parse
    * on the scan path, full pixel decode stays behind the
    * mapInPandas seam (m2). The corpus synthesizes well-formed
    * signature+IHDR prefixes (dimensions keyed on doc_id, document
    * bytes as the fake compressed stream); synth and parse are
    * independent expression trees, and the oracle recomputes the
    * expected metadata from first principles. */
  def m3ImageMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = (lit(16) + pmod($"doc_id", lit(64))).cast("long")
    val h = (lit(16) + pmod($"doc_id" * 7, lit(64))).cast("long")
    val colorType = when(pmod($"doc_id", lit(3)) === 0, 2L).otherwise(6L)
    val hexPrefix = concat(
      lit("89504E470D0A1A0A"), // PNG signature
      lit("0000000D"),         // IHDR chunk length = 13
      lit("49484452"),         // "IHDR"
      lpad(hex(w), 8, "0"),
      lpad(hex(h), 8, "0"),
      lit("08"),               // bit depth
      lpad(hex(colorType), 2, "0"),
      lit("000000"),           // compression, filter, interlace
      lit("DEADBEEF"))         // stand-in CRC
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(concat(hexPrefix, hex($"text".cast("binary")))).as("payload"))
    parseImageHeader(blobs).orderBy($"doc_id")
  }

  /** The header parser over any (doc_id, payload binary) frame —
    * byte offsets per the PNG spec (signature 0-7, IHDR data at 16:
    * width BE32, height BE32, bit depth, color type). */
  def parseImageHeader(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    val isPng = hex(substring($"payload", 1, 8)) === "89504E470D0A1A0A"
    // every field is gated on the signature: a non-PNG payload yields
    // nulls instead of garbage ints (whose product would overflow
    // the est_raw_bytes multiply under ANSI mode)
    def be(pos: Int, len: Int) =
      when(isPng, conv(hex(substring($"payload", pos, len)), 16, 10).cast("long"))
    blobs.select($"doc_id",
        isPng.as("is_png"),
        be(17, 4).as("width"),
        be(21, 4).as("height"),
        be(25, 1).as("bit_depth"),
        be(26, 1).as("color_type"))
      .withColumn("channels",
        when($"color_type" === 2, 3L).when($"color_type" === 6, 4L)
          .when($"color_type" === 4, 2L)
          .when($"color_type".isNotNull, 1L))
      .withColumn("est_raw_bytes",
        ($"width" * $"height" * $"channels" * $"bit_depth" / 8).cast("long"))
  }

  /** Little-endian integer synthesis: `v` as `bytes` LE bytes in hex
    * (the WAV header's wire format). */
  private def leHex(v: Column, bytes: Int): Column =
    concat((0 until bytes).map(i =>
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*)

  /** m4: REAL audio-header parsing — the RIFF/WAVE twin of m3's PNG
    * IHDR tier: signature checks ("RIFF", "WAVE", "fmt ", "data") +
    * little-endian field decode (channels, sample rate, byte rate,
    * block align, bits/sample, data size) straight off the binary
    * column, no audio library. The catalog-metadata pass an audio
    * pipeline runs over 100 TB of clips before any sample decode
    * (decode itself stays behind the m2 mapInPandas seam). The
    * corpus synthesizes canonical 44-byte headers (format fields
    * keyed on doc_id, document bytes as the fake sample stream);
    * synth builds bytes little-endian with shift/mask math, the
    * parser re-reads them per-byte with independent expressions, and
    * the oracle recomputes expected fields from first principles. */
  def m4AudioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val channels = (lit(1L) + pmod($"doc_id", lit(2))).cast("long")
    val rate = (lit(8000L) * (lit(1L) + pmod($"doc_id", lit(3)))).cast("long")
    val bits = when(pmod($"doc_id", lit(5)) === 0, 8L).otherwise(16L)
    // division is exact (channels*bits is a multiple of 8); the cast
    // restores long for the shift/mask LE synthesis
    val blockAlign = (channels * bits / lit(8L)).cast("long")
    val byteRate = rate * blockAlign
    val dataSize = octet_length($"text".cast("binary")).cast("long")
    val hexHeader = concat(
      lit("52494646"),              // "RIFF"
      leHex(lit(36L) + dataSize, 4),
      lit("57415645"),              // "WAVE"
      lit("666D7420"),              // "fmt "
      lit("10000000"),              // fmt chunk size = 16 (PCM)
      lit("0100"),                  // audio format = 1 (PCM)
      leHex(channels, 2),
      leHex(rate, 4),
      leHex(byteRate, 4),
      leHex(blockAlign, 2),
      leHex(bits, 2),
      lit("64617461"),              // "data"
      leHex(dataSize, 4))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(concat(hexHeader, hex($"text".cast("binary")))).as("payload"))
    parseAudioHeader(blobs).orderBy($"doc_id")
  }

  /** The header parser over any (doc_id, payload binary) frame —
    * canonical-WAV byte offsets (RIFF 0-3, WAVE 8-11, "fmt " 12-15,
    * format fields LE at 20-35, "data"+size at 36-43). Like m3,
    * every field gates on the signature so non-WAV payloads yield
    * typed nulls, never garbage. */
  def parseAudioHeader(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    val isWav = hex(substring($"payload", 1, 4)) === "52494646" &&
      hex(substring($"payload", 9, 8)) === "57415645666D7420" &&
      hex(substring($"payload", 37, 4)) === "64617461"
    // little-endian decode: per-byte reads combined positionally
    // (substring-on-binary keeps each byte exact; no byte-order swap
    // primitive exists for binary columns)
    def le(pos: Int, len: Int): Column =
      when(isWav, (0 until len).map(i =>
        conv(hex(substring($"payload", pos + i, 1)), 16, 10).cast("long") *
          lit(1L << (8 * i))).reduce(_ + _))
    blobs.select($"doc_id",
        isWav.as("is_wav"),
        le(21, 2).as("audio_format"),
        le(23, 2).as("n_channels"),
        le(25, 4).as("sample_rate"),
        le(29, 4).as("byte_rate"),
        le(33, 2).as("block_align"),
        le(35, 2).as("bits_per_sample"),
        le(41, 4).as("data_bytes"))
      .withColumn("est_duration_us",
        floor($"data_bytes" * lit(1000000.0) / $"byte_rate").cast("long"))
  }

  /** m15: PCM SAMPLE statistics — the first m-family pass that reads
    * the DATA, not just the header: a canonical mono/16-bit/8 kHz
    * WAV is synthesized with REAL little-endian PCM payload bytes
    * (sample values from a deterministic doc_id-keyed ramp, clamped
    * to the int16 rails so ~18% of samples clip — hot audio), and
    * the profile decodes every sample back out of the byte stream to
    * report the loudness/health numbers an audio-curation pass
    * gates on: peak amplitude, RMS level, DC offset, clipped-sample
    * count (reference: the ingestion worker's docling converter
    * seam, apps/ingestion-worker/handlers/file.py:46 — binary media
    * routes through a decode tier before chunking; this is that
    * tier's audio health profile). The per-sample fold (LE pair →
    * sign-extended int16 → running sums) is ONE codegen kernel call
    * per row ([[graft.plans.Expressions Pcm16Stats]]) — no
    * per-sample lambda allocation, no driver loop; at 100 TB this is
    * a map-only scan whose cost is the byte read itself. The oracle
    * replays the sample formula arithmetically (the synthesis IS the
    * ground truth; the Spark side proves the byte round trip — same
    * discipline as m4/m14). */
  def m15PcmStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val n = (lit(48L) + pmod($"doc_id", lit(32L))).cast("long")
    val dataSize = n * 2L
    val hexHeader = concat(
      lit("52494646"),              // "RIFF"
      leHex(lit(36L) + dataSize, 4),
      lit("57415645"),              // "WAVE"
      lit("666D7420"),              // "fmt "
      lit("10000000"),              // fmt chunk size = 16 (PCM)
      lit("0100"),                  // audio format = 1 (PCM)
      leHex(lit(1L), 2),            // mono
      leHex(lit(8000L), 4),         // 8 kHz
      leHex(lit(16000L), 4),        // byte rate
      leHex(lit(2L), 2),            // block align
      leHex(lit(16L), 2),           // 16 bits/sample
      lit("64617461"),              // "data"
      leHex(dataSize, 4))
    // deterministic ramp clamped to the int16 rails, serialized LE
    val samples = transform(sequence(lit(0L), n - 1L), i =>
      greatest(lit(-32768L), least(lit(32767L),
        pmod($"doc_id" * lit(7919L) + i * lit(104729L), lit(80000L))
          - lit(40000L))))
    val hexData = array_join(transform(samples, s => {
      val u = s.bitwiseAND(lit(65535L))
      concat(lpad(hex(pmod(u, lit(256L))), 2, "0"),
        lpad(hex(shiftright(u, 8)), 2, "0"))
    }), "")
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", unhex(concat(hexHeader, hexData)).as("payload"))
    pcmStatsOf(blobs).orderBy($"doc_id")
  }

  /** The PCM profile over any (doc_id, payload binary) frame with a
    * canonical 44-byte WAV header: signature-gated like m4 (non-WAV
    * payloads drop out), one kernel fold from byte 45. */
  def pcmStatsOf(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    val isWav = hex(substring($"payload", 1, 4)) === "52494646" &&
      hex(substring($"payload", 9, 8)) === "57415645666D7420" &&
      hex(substring($"payload", 37, 4)) === "64617461"
    blobs.filter(isWav)
      .select($"doc_id",
        call_function("pcm16_stats", $"payload", lit(45L)).as("st"))
      .select($"doc_id",
        element_at($"st", 1).as("n_samples"),
        element_at($"st", 4).as("peak"),
        element_at($"st", 5).as("n_clipped"),
        round(element_at($"st", 2).cast("double") / element_at($"st", 1), 6)
          .as("dc_offset"),
        round(sqrt(element_at($"st", 3).cast("double") / element_at($"st", 1)), 6)
          .as("rms"))
  }

  /** m5: GIF logical-screen-descriptor parsing — the third header
    * format of the catalog tier (PNG is big-endian, WAV is
    * little-endian, GIF mixes an ASCII version tag with LE16 fields
    * AND a packed bitfield — the three wire layouts a binary catalog
    * pass meets). Signature "GIF87a"/"GIF89a", width/height LE16 at
    * bytes 7-10, then the packed byte: global-color-table flag (bit
    * 7), color resolution (bits 4-6), GCT size (bits 0-2) →
    * palette = 2^(size+1) entries × 3 bytes when the flag is set.
    * Bitfield decode is div/mod column math off one byte read. */
  def m5GifMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = (lit(16) + pmod($"doc_id", lit(1024))).cast("long")
    val h = (lit(16) + pmod($"doc_id" * 11, lit(1024))).cast("long")
    val gctFlag = pmod($"doc_id", lit(4)) =!= 0     // 3 of 4 have a GCT
    val gctSize = pmod($"doc_id", lit(8)).cast("long") // 0-7 -> 2..256 entries
    val version = when(pmod($"doc_id", lit(2)) === 0, "39").otherwise("37")
    val packed = when(gctFlag, lit(128L) + lit(7L * 16) + gctSize)
      .otherwise(lit(7L * 16))
    val hexHeader = concat(
      lit("474946"), lit("38"), version, lit("61"),   // "GIF87a"/"GIF89a"
      leHex(w, 2), leHex(h, 2),
      lpad(hex(packed), 2, "0"),
      lit("00"),                                      // background index
      lit("00"))                                      // aspect ratio
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(concat(hexHeader, hex($"text".cast("binary")))).as("payload"))
    parseGifHeader(blobs).orderBy($"doc_id")
  }

  /** The GIF header parser over any (doc_id, payload binary) frame —
    * signature-gated like m3/m4, LE16 dimension decode, packed-byte
    * bitfield split via div/mod. */
  def parseGifHeader(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    val sig = hex(substring($"payload", 1, 6))
    val isGif = sig === "474946383761" || sig === "474946383961"
    def byteAt(pos: Int): Column =
      conv(hex(substring($"payload", pos, 1)), 16, 10).cast("long")
    def le16(pos: Int): Column =
      when(isGif, byteAt(pos) + byteAt(pos + 1) * 256L)
    val packed = when(isGif, byteAt(11))
    blobs.select($"doc_id",
        isGif.as("is_gif"),
        when(isGif, when(sig === "474946383961", "89a").otherwise("87a")).as("version"),
        le16(7).as("width"),
        le16(9).as("height"),
        (packed / lit(128L)).cast("long").as("has_gct"),
        (pmod(packed, lit(128L)) / lit(16L)).cast("long").as("color_res"),
        pmod(packed, lit(8L)).as("gct_size"))
      .withColumn("palette_bytes",
        when($"has_gct" === 1L,
             expr("cast(shiftleft(1L, cast(gct_size + 1 as int)) as bigint)") * 3L)
          .when($"has_gct" === 0L, 0L))
      .orderBy($"doc_id")
  }

  /** m6: JPEG SOF0 metadata via a MARKER WALK — unlike m3/m4/m5's
    * fixed-offset headers, JPEG's frame header sits after a variable
    * number of variable-length segments (APP0/COM/APP1/...), so the
    * parser must hop marker to marker reading each segment's BE16
    * length. The walk is unrolled to a fixed hop budget (4 here; a
    * production cap is a config) — each hop is a pure codegen
    * expression over dynamic `substr` offsets, CaseWhen-gated so a
    * row stops evaluating hops once its SOF0 is found, and every
    * byte read is bounds-guarded (a truncated payload yields nulls,
    * never an ANSI error). The corpus synthesizes JFIF streams whose
    * COM/APP1 presence AND lengths vary by doc_id, so offsets differ
    * row to row and a fixed-offset cheat cannot pass the oracle. */
  def m6JpegMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = (lit(120) + pmod($"doc_id" * 13, lit(1943))).cast("long")
    val w = (lit(160) + pmod($"doc_id" * 7, lit(2000))).cast("long")
    // segment lengths INCLUDE their own 2 length bytes (JPEG wire rule)
    val comLen = (lit(7) + pmod($"doc_id", lit(11))).cast("long")
    val app1Len = (lit(8) + pmod($"doc_id", lit(5))).cast("long")
    val app0 = concat(lit("FFE00010"),
      lit("4A46494600"), lit("0101"), lit("00"),
      lit("0048"), lit("0048"), lit("00"), lit("00"))
    val com = when(pmod($"doc_id", lit(3)) === 0,
      concat(lit("FFFE"), lpad(hex(comLen), 4, "0"),
        repeat(lit("63"), (comLen - 2).cast("int"))))
      .otherwise(lit(""))
    val app1 = when(pmod($"doc_id", lit(2)) === 0,
      concat(lit("FFE1"), lpad(hex(app1Len), 4, "0"),
        lit("457869660000"), repeat(lit("65"), (app1Len - 8).cast("int"))))
      .otherwise(lit(""))
    val sof0 = concat(lit("FFC0"), lit("0011"), lit("08"),
      lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lit("03"), lit("012200021101031101"))
    // entropy-coded body: a text PREFIX stands in for the scan data —
    // the parser only walks header segments, so synthesizing (and
    // hexing) megabytes of body per row would be pure bench tax
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(concat(lit("FFD8"), app0, com, app1, sof0,
          hex(substring($"text", 1, 64).cast("binary")))).as("payload"))
    parseJpegHeader(blobs).orderBy($"doc_id")
  }

  /** The JPEG header parser over any (doc_id, payload binary) frame.
    * Walks up to `maxHops` marker segments from the byte after SOI,
    * looking for SOF0 (0xFFC0); emits the hop count, the SOF byte
    * offset, and the frame fields. */
  def parseJpegHeader(blobs: DataFrame, maxHops: Int = 4): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    // bounds-guarded byte read (1-based offset): null past the end.
    // byte_at is the codegen kernel — the substr->hex->conv route
    // costs two string allocs + a base-16 parse per byte
    def byteAt(off: Column): Column =
      when(off + 1 <= $"_len", call_function("byte_at", $"payload", off))
    def be16(off: Column): Column = byteAt(off) * 256L + byteAt(off + 1)
    // Each hop offset is MATERIALIZED as a column so deeper hops
    // reference an attribute, not a re-embedded copy of every prior
    // hop's subtree. The naive List.iterate formulation grows the
    // tree exponentially in maxHops (hop4's offset re-evaluates
    // hop3's per byte read, which re-evaluates hop2's, ...), blowing
    // past the codegen method-size limit and dropping the stage to
    // interpreted eval — measured ~2.4 ms/row at sf0.1 vs ~µs for
    // this shape. CollapseProject keeps the layering: a non-trivial
    // alias consumed more than once is not inlined back.
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_off1", lit(3L))
    for (i <- 1 until maxHops)
      walked = walked.withColumn(s"_off${i + 1}",
        col(s"_off$i") + 2L + be16(col(s"_off$i") + 2L))
    val offs = (1 to maxHops).map(i => col(s"_off$i")).toList
    def isSofAt(off: Column): Column =
      byteAt(off) === 255L && byteAt(off + 1) === 192L
    val sofOff = offs.zipWithIndex.foldRight(lit(null).cast("long")) {
      case ((off, _), rest) => when(isSofAt(off), off).otherwise(rest)
    }
    val nSegs = offs.zipWithIndex.foldRight(lit(null).cast("long")) {
      case ((off, i), rest) => when(isSofAt(off), i.toLong).otherwise(rest)
    }
    val isJpeg = hex(substring($"payload", 1, 2)) === "FFD8"
    walked
      .withColumn("_sof", sofOff)
      .select($"doc_id",
        isJpeg.as("is_jpeg"),
        when(isJpeg, nSegs).as("n_segments"),
        when(isJpeg, $"_sof").as("sof_pos"),
        when(isJpeg, byteAt($"_sof" + 4L)).as("precision"),
        when(isJpeg, be16($"_sof" + 5L)).as("height"),
        when(isJpeg, be16($"_sof" + 7L)).as("width"),
        when(isJpeg, byteAt($"_sof" + 9L)).as("n_components"))
      .withColumn("est_raw_bytes",
        ($"height" * $"width" * $"n_components").cast("long"))
      .orderBy($"doc_id")
  }

  /** m7: MP4/ISO-BMFF top-level BOX WALK — the video-container tier:
    * unlike JPEG's marker+BE16 chain (m6), BMFF is a sequence of
    * size-prefixed boxes (BE32 size INCLUDING the 8-byte header,
    * 4-char ASCII type), so the walk hops by declared size and reads
    * the type at each stop. The catalog fields a video pipeline
    * extracts before any codec work: container validity (leading
    * `ftyp`), major brand, box count, `moov` offset, `mdat` payload
    * bytes. The corpus synthesizes containers whose brand count and
    * optional `free` box vary by doc_id (variable offsets, like m6),
    * with the document bytes as the mdat payload. Bounds-guarded
    * unrolled walk; a truncated stream yields nulls. */
  def m7Mp4Meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBrands = (lit(1) + pmod($"doc_id", lit(3))).cast("long")
    val ftypSize = lit(16L) + nBrands * 4L
    val freeSize = (lit(8) + pmod($"doc_id", lit(16))).cast("long")
    val ftyp = concat(lpad(hex(ftypSize), 8, "0"), lit("66747970"),
      lit("69736F6D"), lit("00000000"),
      repeat(lit("69736F6D"), nBrands.cast("int")))
    val free = when(pmod($"doc_id", lit(2)) === 0,
      concat(lpad(hex(freeSize), 8, "0"), lit("66726565"),
        repeat(lit("00"), (freeSize - 8L).cast("int"))))
      .otherwise(lit(""))
    val moov = concat(lit("00000008"), lit("6D6F6F76"))
    // declared mdat size covers the FULL document; the carried body is
    // a prefix (the walker reads box headers only, and the hop past
    // mdat lands beyond payload end either way — same n_boxes)
    val mdat = concat(
      lpad(hex(lit(8L) + octet_length($"text".cast("binary"))), 8, "0"),
      lit("6D646174"), hex(substring($"text", 1, 64).cast("binary")))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", unhex(concat(ftyp, free, moov, mdat)).as("payload"))
    parseMp4Boxes(blobs).orderBy($"doc_id")
  }

  /** The BMFF box walker over any (doc_id, payload binary) frame:
    * up to `maxBoxes` size-prefixed hops from offset 1. */
  def parseMp4Boxes(blobs: DataFrame, maxBoxes: Int = 4): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    // codegen byte read + per-hop materialized offsets — see
    // parseJpegHeader's notes (same exponential-tree hazard)
    def byteAt(off: Column): Column =
      when(off + 1 <= $"_len", call_function("byte_at", $"payload", off))
    def be32(off: Column): Column =
      ((byteAt(off) * 256L + byteAt(off + 1)) * 256L
        + byteAt(off + 2)) * 256L + byteAt(off + 3)
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_off1", lit(1L))
    for (i <- 1 to maxBoxes) {
      // each box's declared size is read once and reused by the next
      // hop's offset, the validity test, and mdat's payload length
      walked = walked.withColumn(s"_size$i", be32(col(s"_off$i")))
      if (i < maxBoxes)
        walked = walked.withColumn(s"_off${i + 1}",
          col(s"_off$i") + col(s"_size$i"))
    }
    val boxes = (1 to maxBoxes)
      .map(i => (col(s"_off$i"), col(s"_size$i"))).toList
    // a box is well-formed if its 8-byte header fits and its declared
    // size covers at least that header
    def valid(off: Column, size: Column): Column =
      (off + 8L <= $"_len" + 1L) && (size >= 8L)
    def boxType(off: Column, size: Column): Column =
      when(valid(off, size), decode($"payload".substr((off + 4L).cast("int"),
        lit(4)), "US-ASCII"))
    def firstAt(tpe: String, out: (Column, Column) => Column): Column =
      boxes.foldRight(lit(null).cast("long")) { case ((off, size), rest) =>
        when(boxType(off, size) === tpe, out(off, size)).otherwise(rest)
      }
    val isMp4 = boxType(col("_off1"), col("_size1")) === "ftyp"
    walked.select($"doc_id",
        isMp4.as("is_mp4"),
        when(isMp4, decode($"payload".substr(9, 4), "US-ASCII"))
          .as("major_brand"),
        when(isMp4, boxes.map { case (o, s) =>
          when(valid(o, s), 1L).otherwise(0L) }.reduce(_ + _)).as("n_boxes"),
        when(isMp4, firstAt("moov", (o, _) => o)).as("moov_pos"),
        when(isMp4, firstAt("mdat", (_, s) => s - 8L)).as("mdat_bytes"))
      .orderBy($"doc_id")
  }

  /** m16: MP4 SAMPLE-TABLE statistics — the video analog of m15's
    * PCM pass: past the top-level catalog (m7), the numbers a video
    * curation pass gates on live in the `stbl` sample tables nested
    * six boxes deep (moov→trak→mdia→minf→stbl→stts/stsz). The
    * synthesized container is structurally real ISO-BMFF — full
    * 108-byte `mvhd` v0, 32-byte `mdhd`, a single-run `stts`
    * (constant frame duration, the overwhelmingly common case) and a
    * per-sample `stsz` whose BE32 entry table carries doc_id-keyed
    * frame sizes — with offsets perturbed by an optional `free` box
    * before `moov` and an optional `udta` between `mvhd` and `trak`,
    * so the walk must follow declared sizes, not fixed positions.
    * Reported: movie/media timescales + durations, fps
    * (timescale/delta), per-frame byte stats over the WHOLE stsz
    * table (one [[graft.plans.Expressions Be32Stats]] codegen fold —
    * no per-entry lambda), and the derived bitrate. Every hop is a
    * materialized offset column (m6/m7's design); at 100 TB this is
    * a map-only header scan, the table fold costs the byte read.
    * Reference scope: the ingestion worker routes binary media
    * through a converter tier before chunking
    * (apps/ingestion-worker/handlers/file.py:46); this is that
    * tier's video stream profile, computed without a decoder. */
  def m16Mp4Samples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = lit(8L) + pmod($"doc_id", lit(8L))
    val delta = lit(3000L) + pmod($"doc_id", lit(4L)) * 750L
    val mediaDur = n * delta
    val movieDur = (mediaDur / lit(150L)).cast("long") // exact: delta % 150 == 0
    def be(v: Column): Column = lpad(hex(v), 8, "0")
    val ftyp = lit("00000010" + "66747970" + "69736F6D" + "00000000")
    val freeSize = lit(8L) + pmod($"doc_id", lit(16L))
    val free = when(pmod($"doc_id", lit(2)) === 0,
      concat(be(freeSize), lit("66726565"),
        repeat(lit("00"), (freeSize - 8L).cast("int"))))
      .otherwise(lit(""))
    val mvhd = concat(be(lit(108L)), lit("6D766864"), lit("00000000"),
      lit("00000000"), lit("00000000"), be(lit(600L)), be(movieDur),
      lit("00010000"), lit("0100"), lit("0000"), lit("00000000" * 2),
      lit("00010000" + "00000000" * 3 + "00010000" + "00000000" * 3
        + "40000000"),                       // identity matrix
      lit("00000000" * 6), lit("00000002"))
    val udtaSize = lit(8L) + pmod($"doc_id", lit(12L))
    val udta = when(pmod($"doc_id", lit(3)) === 0,
      concat(be(udtaSize), lit("75647461"),
        repeat(lit("00"), (udtaSize - 8L).cast("int"))))
      .otherwise(lit(""))
    val stts = concat(be(lit(24L)), lit("73747473"), lit("00000000"),
      be(lit(1L)), be(n), be(delta))
    val sizesHex = array_join(transform(sequence(lit(0L), n - 1L), i =>
      lpad(hex(lit(800L) + pmod($"doc_id" * 131L + i * 7919L,
        lit(4200L))), 8, "0")), "")
    val stszSize = lit(20L) + n * 4L
    val stsz = concat(be(stszSize), lit("7374737A"), lit("00000000"),
      be(lit(0L)), be(n), sizesHex)
    val stblSize = stszSize + 32L                  // 8 hdr + 24 stts
    val stbl = concat(be(stblSize), lit("7374626C"), stts, stsz)
    val minf = concat(be(stblSize + 8L), lit("6D696E66"), stbl)
    val mdhd = concat(be(lit(32L)), lit("6D646864"), lit("00000000"),
      lit("00000000"), lit("00000000"), be(lit(90000L)), be(mediaDur),
      lit("55C40000"))
    val mdiaSize = stblSize + 48L                  // 8 + 32 mdhd + 8 minf + stbl
    val mdia = concat(be(mdiaSize), lit("6D646961"), mdhd, minf)
    val trak = concat(be(mdiaSize + 8L), lit("7472616B"), mdia)
    val moovSize = lit(124L) + mdiaSize +          // 8 + 108 mvhd + 8 trak
      when(pmod($"doc_id", lit(3)) === 0, udtaSize).otherwise(lit(0L))
    val moov = concat(be(moovSize), lit("6D6F6F76"), mvhd, udta, trak)
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", unhex(concat(ftyp, free, moov)).as("payload"))
    mp4SampleStatsOf(blobs).orderBy($"doc_id")
  }

  /** The sample-table profile over any (doc_id, payload binary)
    * frame: a declared-size walk to `stbl` (skipping optional
    * `free`/`udta` siblings), gated on the expected box type at
    * EVERY level plus single-run stts and per-sample stsz — anything
    * malformed drops out, like m15's WAV gate. */
  def mp4SampleStatsOf(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off + 1 <= $"_len", call_function("byte_at", $"payload", off))
    def be32(off: Column): Column =
      ((byteAt(off) * 256L + byteAt(off + 1)) * 256L
        + byteAt(off + 2)) * 256L + byteAt(off + 3)
    def typeAt(off: Column): Column =
      when(off + 8L <= $"_len" + 1L,
        decode($"payload".substr((off + 4L).cast("int"), lit(4)), "US-ASCII"))
    // one materialized hop per nesting level — the declared-size walk
    val walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_o2", lit(1L) + be32(lit(1L)))
      .withColumn("_moov", when(typeAt($"_o2") === "moov", $"_o2")
        .when(typeAt($"_o2") === "free", $"_o2" + be32($"_o2")))
      .withColumn("_mvhd", $"_moov" + 8L)
      .withColumn("_amv", $"_mvhd" + be32($"_mvhd"))
      .withColumn("_trak", when(typeAt($"_amv") === "trak", $"_amv")
        .when(typeAt($"_amv") === "udta", $"_amv" + be32($"_amv")))
      .withColumn("_mdia", $"_trak" + 8L)
      .withColumn("_mdhd", $"_mdia" + 8L)
      .withColumn("_minf", $"_mdhd" + be32($"_mdhd"))
      .withColumn("_stbl", $"_minf" + 8L)
      .withColumn("_stts", $"_stbl" + 8L)
      .withColumn("_stsz", $"_stts" + be32($"_stts"))
    // the ONLY filter is the flat leading-signature test (m15's WAV
    // gate shape): a predicate over the deep hop aliases would be
    // pushed below every Project layer, re-inlining each hop's
    // definition per reference — the exponential-tree hazard again,
    // this time in the OPTIMIZER (measured: driver OOM at sf0.01).
    // The structural checks land in a materialized `_ok` column that
    // gates every output via when(); malformed-but-ftyp rows emit
    // is_video=false with null stats.
    val ok = typeAt(lit(1L)) === "ftyp" &&
      typeAt($"_moov") === "moov" && typeAt($"_mvhd") === "mvhd" &&
      typeAt($"_trak") === "trak" && typeAt($"_mdia") === "mdia" &&
      typeAt($"_mdhd") === "mdhd" && typeAt($"_minf") === "minf" &&
      typeAt($"_stbl") === "stbl" && typeAt($"_stts") === "stts" &&
      typeAt($"_stsz") === "stsz" &&
      be32($"_stts" + 12L) === 1L &&      // single stts run
      be32($"_stsz" + 12L) === 0L         // per-sample size table
    walked.filter(hex(substring($"payload", 5, 4)) === "66747970")
      .withColumn("_ok", coalesce(ok, lit(false)))
      .withColumn("_n", when($"_ok", be32($"_stsz" + 16L)))
      .withColumn("_delta", when($"_ok", be32($"_stts" + 20L)))
      .withColumn("_mts", when($"_ok", be32($"_mdhd" + 20L)))
      .withColumn("_mdur", when($"_ok", be32($"_mdhd" + 24L)))
      .withColumn("_st", when($"_ok",
        call_function("be32_stats", $"payload", $"_stsz" + 20L, $"_n")))
      .select($"doc_id",
        $"_ok".as("is_video"),
        when($"_ok", be32($"_mvhd" + 20L)).as("movie_timescale"),
        when($"_ok", be32($"_mvhd" + 24L)).as("movie_duration"),
        $"_mts".as("media_timescale"),
        $"_n".as("n_samples"),
        round($"_mts".cast("double") / $"_delta", 4).as("fps"),
        round($"_mdur".cast("double") / $"_mts", 4).as("duration_s"),
        element_at($"_st", 2).as("total_sample_bytes"),
        element_at($"_st", 3).as("max_sample_bytes"),
        element_at($"_st", 4).as("min_sample_bytes"),
        round(element_at($"_st", 2).cast("double") / $"_n", 2)
          .as("avg_sample_bytes"),
        round(element_at($"_st", 2).cast("double") * 8D * $"_mts" / $"_mdur", 2)
          .as("bitrate_bps"))
  }

  /** m8: TAR (POSIX ustar) ENTRY WALK — the ARCHIVE tier of the
    * container family: document dumps arrive as tarballs, and the
    * ingestion catalog pass lists entries (names, sizes, count)
    * without unpacking — headers only, like m7's box walk. A ustar
    * stream is 512-byte header blocks with NUL-padded ASCII names,
    * OCTAL-ASCII sizes, and data padded to the next 512 boundary, so
    * the walk hops by 512 + ceil(size/512)*512 and gates each stop
    * on the "ustar" magic at offset +257. Same materialized-hop
    * design as m6/m7. The corpus synthesizes 1-2 entries per doc
    * (text-prefix payload + an optional metadata member, presence
    * varying by doc_id) with a two-block zero EOF marker; the oracle
    * recomputes names/sizes/offsets from the synth rules. */
  def m8TarMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one ustar header as hex: name (100B), mode/uid/gid zeros,
    // size as 11 octal digits + NUL, mtime zeros, checksum spaces
    // (parser does not verify — a catalog pass trusts the magic),
    // type '0', magic "ustar\0" + version "00", zero tail to 512
    def headerHex(name: Column, size: Column): Column = concat(
      rpad(hex(name), 200, "0"),                       // name, NUL-pad
      repeat(lit("00"), 24),                           // mode+uid+gid
      hex(lpad(conv(size, 10, 8), 11, "0")), lit("00"), // size octal+NUL
      hex(lit("00000000000")), lit("00"),              // mtime zeros+NUL
      repeat(lit("20"), 8),                            // chksum spaces
      hex(lit("0")),                                   // typeflag '0'
      repeat(lit("00"), 100),                          // linkname
      lit("757374617200"), lit("3030"),                // "ustar\0" "00"
      repeat(lit("00"), 247))                          // tail to 512
    def padded(contentHex: Column, size: Column): Column = concat(
      contentHex,
      repeat(lit("00"),
        pmod(lit(512) - pmod(size, lit(512)), lit(512)).cast("int")))
    val body1 = substring($"text", 1, 64).cast("binary")
    val sz1 = octet_length(body1).cast("long")
    val name1 = concat(lit("doc_"), $"doc_id", lit(".txt"))
    val meta = concat(lit("{\"id\":"), $"doc_id", lit("}")).cast("binary")
    val sz2 = octet_length(meta).cast("long")
    val name2 = concat(lit("meta/"), $"doc_id", lit(".json"))
    val entry2 = when(pmod($"doc_id", lit(2)) === 0,
      concat(headerHex(name2, sz2), padded(hex(meta), sz2)))
      .otherwise(lit(""))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", unhex(concat(
        headerHex(name1, sz1), padded(hex(body1), sz1),
        entry2,
        repeat(lit("00"), 1024))).as("payload"))      // EOF: 2 zero blocks
    parseTarEntries(blobs).orderBy($"doc_id")
  }

  /** The ustar walker over any (doc_id, payload binary) frame: up to
    * `maxEntries` header hops; emits entry count, first/second names
    * and sizes, and total member bytes. Truncated or non-tar
    * payloads yield false/nulls, never an error. */
  def parseTarEntries(blobs: DataFrame, maxEntries: Int = 3): DataFrame = {
    import blobs.sparkSession.implicits._
    def asciiAt(off: Column, len: Int): Column =
      when(off + len - 1 <= $"_len",
        decode($"payload".substr(off.cast("int"), lit(len)), "US-ASCII"))
    // NUL-padded name -> text before the first NUL
    def nameAt(off: Column): Column =
      substring_index(asciiAt(off, 100), "\u0000", 1)
    // 12-byte octal-ASCII size field (NUL/space terminated)
    def sizeAt(off: Column): Column =
      conv(regexp_extract(asciiAt(off + 124L, 12), "^[0-7]+", 0), 8, 10)
        .cast("long")
    def magicAt(off: Column): Column =
      asciiAt(off + 257L, 5) === "ustar"
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_off1", lit(1L))
    for (i <- 1 to maxEntries) {
      walked = walked
        .withColumn(s"_ok$i", coalesce(magicAt(col(s"_off$i")), lit(false)))
        .withColumn(s"_sz$i",
          when(col(s"_ok$i"), sizeAt(col(s"_off$i"))))
        .withColumn(s"_name$i",
          when(col(s"_ok$i"), nameAt(col(s"_off$i"))))
      if (i < maxEntries)
        // data is padded to the next 512 boundary after the header
        walked = walked.withColumn(s"_off${i + 1}",
          col(s"_off$i") + 512L +
            expr(s"((_sz$i + 511) div 512) * 512"))
    }
    val oks = (1 to maxEntries).map(i => col(s"_ok$i"))
    val isTar = col("_ok1")
    walked.select($"doc_id",
        isTar.as("is_tar"),
        when(isTar, oks.map(_.cast("long")).reduce(_ + _)).as("n_entries"),
        when(isTar, col("_name1")).as("name_1"),
        when(isTar, col("_sz1")).as("bytes_1"),
        when(isTar && col("_ok2"), col("_name2")).as("name_2"),
        when(isTar && col("_ok2"), col("_sz2")).as("bytes_2"),
        when(isTar, (1 to maxEntries)
          .map(i => coalesce(col(s"_sz$i"), lit(0L))).reduce(_ + _))
          .as("total_member_bytes"))
      .orderBy($"doc_id")
  }

  /** m9: ZIP CENTRAL-DIRECTORY WALK — the archive tier's second wire
    * format (m8's tar is sequential headers; ZIP is the INDEXED
    * layout: the authoritative entry list lives in a central
    * directory whose position is published by the End-Of-Central-
    * Directory record at the END of the file). The catalog pass
    * reads exactly what a real unzipper reads: EOCD signature at the
    * tail → entry count + directory offset (LE fields) → hop the
    * 46-byte-plus-name directory entries. No decompression, no local
    * headers touched — listing a 10 GB zip costs the directory
    * bytes. Synth: 1-2 STORED members per doc (names/sizes varying
    * by doc_id); oracle recomputes every field from the synth rules;
    * MultimodalSpec cross-checks the parser against a REAL
    * java.util.zip-written archive. */
  def m9ZipMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    parseZipEntries(zipBlobs(spark, dir)).orderBy($"doc_id")
  }

  /** The synthesized STORED-zip corpus m9 walks and f4 extracts:
    * real PK\x03\x04 local headers + central directory + EOCD, one
    * text entry per doc and a JSON metadata entry on even ids. */
  def zipBlobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def le16hex(v: Column): Column = concat(
      lpad(hex(v.bitwiseAND(lit(255L))), 2, "0"),
      lpad(hex(shiftright(v, 8).bitwiseAND(lit(255L))), 2, "0"))
    def le32hex(v: Column): Column = concat(
      le16hex(v.bitwiseAND(lit(65535L))), le16hex(shiftright(v, 16)))
    val name1 = concat(lit("doc_"), $"doc_id".cast("string"), lit(".txt"))
    val body1 = substring($"text", 1, 64).cast("binary")
    val sz1 = octet_length(body1).cast("long")
    val n1 = octet_length(name1.cast("binary")).cast("long")
    val name2 = concat(lit("meta/"), $"doc_id".cast("string"), lit(".json"))
    val body2 = concat(lit("{\"id\":"), $"doc_id".cast("string"), lit("}"))
      .cast("binary")
    val sz2 = octet_length(body2).cast("long")
    val n2 = octet_length(name2.cast("binary")).cast("long")
    val has2 = pmod($"doc_id", lit(2)) === 0
    // local file header (30B + name) + stored data
    def localHex(name: Column, dataHex: Column, sz: Column, nlen: Column) =
      concat(lit("504B0304"), lit("1400"), repeat(lit("0000"), 4),
        lit("00000000"),                      // crc (catalog pass ignores)
        le32hex(sz), le32hex(sz),             // comp = uncomp (stored)
        le16hex(nlen), lit("0000"),
        hex(name.cast("binary")), dataHex)
    // central-directory entry (46B + name)
    def cdHex(name: Column, sz: Column, nlen: Column, loff: Column) =
      concat(lit("504B0102"), lit("1400"), lit("1400"), repeat(lit("0000"), 4),
        lit("00000000"),
        le32hex(sz), le32hex(sz),
        le16hex(nlen), lit("0000"), lit("0000"),
        lit("0000"), lit("0000"), lit("00000000"),
        le32hex(loff), hex(name.cast("binary")))
    val loff2 = lit(30L) + n1 + sz1
    val cdOff = loff2 + when(has2, lit(30L) + n2 + sz2).otherwise(0L)
    val cdSize = lit(46L) + n1 + when(has2, lit(46L) + n2).otherwise(0L)
    val nEnt = when(has2, 2L).otherwise(1L)
    val eocd = concat(lit("504B0506"), lit("0000"), lit("0000"),
      le16hex(nEnt), le16hex(nEnt), le32hex(cdSize), le32hex(cdOff),
      lit("0000"))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", unhex(concat(
        localHex(name1, hex(body1), sz1, n1),
        when(has2, localHex(name2, hex(body2), sz2, n2)).otherwise(lit("")),
        cdHex(name1, sz1, n1, lit(0L)),
        when(has2, cdHex(name2, sz2, n2, loff2)).otherwise(lit("")),
        eocd)).as("payload"))
    blobs
  }

  /** The ZIP directory walker over any (doc_id, payload binary)
    * frame: EOCD tail record (no archive comment) → central
    * directory hops. Reads uncompressed sizes and names from the
    * directory only — works on any method (stored or deflated)
    * because the directory carries the declared sizes. */
  def parseZipEntries(blobs: DataFrame, maxEntries: Int = 3): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off >= 1L && off <= $"_len", call_function("byte_at", $"payload", off))
    def le16(off: Column): Column = byteAt(off) + byteAt(off + 1L) * 256L
    def le32(off: Column): Column =
      ((byteAt(off + 3L) * 256L + byteAt(off + 2L)) * 256L
        + byteAt(off + 1L)) * 256L + byteAt(off)
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_eocd", $"_len" - 21L)
      .withColumn("_iszip",
        coalesce(byteAt(lit(1L)) === 80 && byteAt(lit(2L)) === 75 &&
          byteAt(lit(3L)) === 3 && byteAt(lit(4L)) === 4 &&
          byteAt($"_eocd") === 80 && byteAt($"_eocd" + 1L) === 75 &&
          byteAt($"_eocd" + 2L) === 5 && byteAt($"_eocd" + 3L) === 6,
          lit(false)))
      .withColumn("_nent", when($"_iszip", le16($"_eocd" + 10L)))
      .withColumn("_cdoff", when($"_iszip", le32($"_eocd" + 16L)))
      .withColumn("_ce1", $"_cdoff" + 1L)
    for (i <- 1 to maxEntries) {
      val ce = col(s"_ce$i")
      walked = walked
        .withColumn(s"_ok$i", coalesce(
          byteAt(ce) === 80 && byteAt(ce + 1L) === 75 &&
            byteAt(ce + 2L) === 1 && byteAt(ce + 3L) === 2 &&
            ce + 45L <= $"_len", lit(false)))
        .withColumn(s"_sz$i", when(col(s"_ok$i"), le32(ce + 24L)))
        .withColumn(s"_nlen$i", when(col(s"_ok$i"), le16(ce + 28L)))
        .withColumn(s"_name$i", when(col(s"_ok$i"),
          decode($"payload".substr((ce + 46L).cast("int"),
            col(s"_nlen$i").cast("int")), "US-ASCII")))
      if (i < maxEntries)
        // next entry hops over name + extra + comment
        walked = walked.withColumn(s"_ce${i + 1}",
          ce + 46L + col(s"_nlen$i") + le16(ce + 30L) + le16(ce + 32L))
    }
    val isZip = col("_iszip")
    walked.select($"doc_id",
        isZip.as("is_zip"),
        when(isZip, $"_nent").as("n_entries"),
        when(isZip, $"_cdoff").as("cd_off"),
        when(isZip, col("_name1")).as("name_1"),
        when(isZip, col("_sz1")).as("bytes_1"),
        when(isZip && col("_ok2"), col("_name2")).as("name_2"),
        when(isZip && col("_ok2"), col("_sz2")).as("bytes_2"),
        when(isZip, (1 to maxEntries)
          .map(i => coalesce(col(s"_sz$i"), lit(0L))).reduce(_ + _))
          .as("total_member_bytes"))
      .orderBy($"doc_id")
  }

  /** ENTRY EXTRACTION from STORED archives — the step beyond m9's
    * catalog walk: the `zip_entries` kernel follows each
    * central-directory entry to its local header, slices the
    * declared (stored) size out of the payload, and decodes UTF-8 —
    * one output row per entry. Only STORED entries carry
    * extractable bytes this way (deflated data would need a real
    * inflater behind the FileConverter seam — the documented stub
    * boundary). */
  def extractZipEntries(blobs: DataFrame, maxEntries: Int = 3): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    // one zip_entries kernel call per row: the column-expression
    // walk this replaced (stacked byte_at/le16/le32 chains per
    // entry) exceeded the codegen method-size limit and dropped the
    // stage to interpreted eval (f4 8.5s at sf0.1; ~0.5s kernelized)
    blobs
      .select($"doc_id",
        expr(s"zip_entries(payload, $maxEntries)").as("es"))
      .filter($"es".isNotNull)
      .select($"doc_id", explode($"es").as("e"))
      .select($"doc_id", $"e.entry".as("entry"), $"e.content".as("content"))
  }

  /** m10: TIFF/EXIF-style IFD walk — the one container family whose
    * byte order is DECLARED IN THE FILE ("II" little-endian vs "MM"
    * big-endian), so the parser must pick its decoder per row. The
    * synth emits a minimal spec-conformant TIFF per document — II for
    * even ids, MM for odd (both orders exercised in one corpus),
    * header (order, magic 42, IFD offset), one IFD with 3-4
    * tag-sorted entries (ImageWidth/ImageLength as LONG, Compression
    * as SHORT, Orientation as SHORT on every third doc — variable
    * entry count drives the walk), SHORT values left-justified in
    * the 4-byte slot per spec. The parse is a bounded-slot codegen
    * byte walk (no UDF): endian selected by a flag column, each tag
    * extracted with a coalesce over slots. Oracle recomputes expected
    * fields from the synth rules (first principles, no SQL byte
    * parsing) — so a parser that mis-walks either byte order
    * hash-mismatches. */
  def m10TiffMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val le = pmod($"doc_id", lit(2)) === 0
    val width = lit(16L) + pmod($"doc_id", lit(240))
    val height = lit(16L) + pmod($"doc_id", lit(180))
    val orient = lit(1L) + pmod($"doc_id", lit(8))
    val hasOrient = pmod($"doc_id", lit(3)) === 0
    val nEntries = when(hasOrient, 4L).otherwise(3L)
    def h8(v: Column): Column = lpad(hex(v.bitwiseAND(lit(255L))), 2, "0")
    def build(little: Boolean): Column = {
      def u16(v: Column): Column =
        if (little) concat(h8(v), h8(shiftright(v, 8)))
        else concat(h8(shiftright(v, 8)), h8(v))
      def u32(v: Column): Column =
        if (little) concat(u16(v.bitwiseAND(lit(65535L))), u16(shiftright(v, 16)))
        else concat(u16(shiftright(v, 16)), u16(v.bitwiseAND(lit(65535L))))
      def entry(tag: Long, typ: Long, valueHex: Column): Column =
        concat(u16(lit(tag)), u16(lit(typ)), u32(lit(1L)), valueHex)
      concat(
        lit(if (little) "4949" else "4D4D"),
        u16(lit(42L)),
        u32(lit(8L)),
        u16(nEntries),
        entry(256L, 4L, u32(width)),
        entry(257L, 4L, u32(height)),
        entry(259L, 3L, concat(u16(lit(1L)), lit("0000"))),
        when(hasOrient, entry(274L, 3L, concat(u16(orient), lit("0000"))))
          .otherwise(lit("")),
        u32(lit(0L)))
    }
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(when(le, build(little = true)).otherwise(build(little = false)))
          .as("payload"))
    parseTiff(blobs).orderBy($"doc_id")
  }

  /** The endian-aware IFD parser over any (doc_id, payload binary)
    * frame: bounded-slot walk (maxEntries), all codegen byte
    * arithmetic. `passthrough` names extra input columns to carry
    * into the output unchanged (m13 threads its APP1 locator columns
    * through without a self-join). */
  def parseTiff(blobs: DataFrame, maxEntries: Int = 6,
                passthrough: Seq[String] = Nil): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off >= 1L && off <= $"_len", call_function("byte_at", $"payload", off))
    def le16(off: Column): Column = byteAt(off) + byteAt(off + 1L) * 256L
    def be16(off: Column): Column = byteAt(off) * 256L + byteAt(off + 1L)
    def le32(off: Column): Column =
      ((byteAt(off + 3L) * 256L + byteAt(off + 2L)) * 256L
        + byteAt(off + 1L)) * 256L + byteAt(off)
    def be32(off: Column): Column =
      ((byteAt(off) * 256L + byteAt(off + 1L)) * 256L
        + byteAt(off + 2L)) * 256L + byteAt(off + 3L)
    def u16(off: Column): Column = when($"_le", le16(off)).otherwise(be16(off))
    def u32(off: Column): Column = when($"_le", le32(off)).otherwise(be32(off))
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_le",
        coalesce(byteAt(lit(1L)) === 0x49L && byteAt(lit(2L)) === 0x49L,
          lit(false)))
      .withColumn("_be",
        coalesce(byteAt(lit(1L)) === 0x4DL && byteAt(lit(2L)) === 0x4DL,
          lit(false)))
      .withColumn("_istiff", coalesce(
        ($"_le" || $"_be") && u16(lit(3L)) === 42L &&
          u32(lit(5L)) + 2L <= $"_len", lit(false)))
      .withColumn("_ifd", when($"_istiff", u32(lit(5L)) + 1L))
      .withColumn("_n", when($"_istiff", u16($"_ifd")))
    for (i <- 0 until maxEntries) {
      val off = $"_ifd" + lit(2L) + lit(i * 12L)
      val inIfd = $"_istiff" && lit(i.toLong) < $"_n" && off + 11L <= $"_len"
      walked = walked
        .withColumn(s"_tag$i", when(inIfd, u16(off)))
        .withColumn(s"_val$i", when(inIfd,
          // SHORT (3) is left-justified in the 4-byte slot; LONG (4)
          // fills it
          when(u16(off + 2L) === 3L, u16(off + 8L)).otherwise(u32(off + 8L))))
    }
    def tagValue(tag: Long): Column = coalesce(
      (0 until maxEntries).map(i =>
        when(col(s"_tag$i") === tag, col(s"_val$i"))): _*)
    walked.select(($"doc_id" +: passthrough.map(col)) ++ Seq(
        $"_istiff".as("is_tiff"),
        when($"_istiff", when($"_le", "II").otherwise("MM")).as("byte_order"),
        when($"_istiff", $"_n").as("n_entries"),
        tagValue(256L).as("width"),
        tagValue(257L).as("height"),
        tagValue(259L).as("compression"),
        tagValue(274L).as("orientation")): _*)
  }

  /** m13: JPEG EXIF — the APP1-embedded TIFF walk, composing the two
    * hardest m-family shapes: m6's variable-offset marker hops (an
    * optional COM segment shifts APP1 per row) locate the Exif APP1,
    * and m10's endian-aware IFD parser (byte order DECLARED in the
    * file — II on even ids, MM on odd) decodes the camera metadata at
    * the located base. EXIF is exactly this on the wire: a TIFF file
    * whose internal offsets are relative to its own base, carried
    * inside a JPEG segment — so the parser SLICES the payload at
    * base (one bounded substr per row) and delegates to the same
    * parseTiff kernel walk m10 uses, locator columns threaded through
    * (no self-join). Some rows carry a non-Exif APP1 in the wild
    * (XMP); the hop predicate checks the "Exif\0\0" header bytes, not
    * just the marker, so those are stepped over. One in five docs has
    * no EXIF at all — the miss branch is part of the oracle. */
  def m13JpegExif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hasExif = pmod($"doc_id", lit(5)) =!= 0
    val hasCom = pmod($"doc_id", lit(3)) === 0
    val comLen = (lit(7) + pmod($"doc_id", lit(11))).cast("long")
    val le = pmod($"doc_id", lit(2)) === 0
    val width = lit(32L) + pmod($"doc_id", lit(500))
    val height = lit(24L) + pmod($"doc_id", lit(400))
    val orient = lit(1L) + pmod($"doc_id", lit(8))
    val hasOrient = pmod($"doc_id", lit(3)) === 0
    val nEntries = when(hasOrient, 3L).otherwise(2L)
    def h8(v: Column): Column = lpad(hex(v.bitwiseAND(lit(255L))), 2, "0")
    def build(little: Boolean): Column = {
      def u16(v: Column): Column =
        if (little) concat(h8(v), h8(shiftright(v, 8)))
        else concat(h8(shiftright(v, 8)), h8(v))
      def u32(v: Column): Column =
        if (little) concat(u16(v.bitwiseAND(lit(65535L))), u16(shiftright(v, 16)))
        else concat(u16(shiftright(v, 16)), u16(v.bitwiseAND(lit(65535L))))
      def entry(tag: Long, typ: Long, valueHex: Column): Column =
        concat(u16(lit(tag)), u16(lit(typ)), u32(lit(1L)), valueHex)
      concat(
        lit(if (little) "4949" else "4D4D"),
        u16(lit(42L)), u32(lit(8L)), u16(nEntries),
        entry(256L, 4L, u32(width)),
        entry(257L, 4L, u32(height)),
        when(hasOrient, entry(274L, 3L, concat(u16(orient), lit("0000"))))
          .otherwise(lit("")),
        u32(lit(0L)))
    }
    // TIFF bytes: 8 header + 2 count + 12/entry + 4 next-IFD pointer;
    // the APP1 length field covers itself (2) + "Exif\0\0" (6) + TIFF
    val tiffLen = lit(14L) + nEntries * lit(12L)
    val app0 = concat(lit("FFE00010"), lit("4A46494600"), lit("0101"),
      lit("00"), lit("0048"), lit("0048"), lit("00"), lit("00"))
    val com = when(hasCom,
      concat(lit("FFFE"), lpad(hex(comLen), 4, "0"),
        repeat(lit("63"), (comLen - 2).cast("int"))))
      .otherwise(lit(""))
    val app1 = when(hasExif,
      concat(lit("FFE1"), lpad(hex(tiffLen + 8L), 4, "0"),
        lit("457869660000"),
        when(le, build(little = true)).otherwise(build(little = false))))
      .otherwise(lit(""))
    val sof0 = concat(lit("FFC0"), lit("0011"), lit("08"),
      lit("00F0"), lit("0140"), lit("03"), lit("012200021101031101"))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id",
        unhex(concat(lit("FFD8"), app0, com, app1, sof0,
          hex(substring($"text", 1, 32).cast("binary")))).as("payload"))
    parseJpegExif(blobs).orderBy($"doc_id")
  }

  /** The EXIF locator+parser over any (doc_id, payload binary) frame:
    * marker hops find the APP1 whose data leads with "Exif\0\0"
    * (non-Exif APP1 segments are stepped over), the payload is sliced
    * at the TIFF base, and the slice runs through parseTiff. */
  def parseJpegExif(blobs: DataFrame, maxHops: Int = 4,
                    maxEntries: Int = 6): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off >= 1L && off <= $"_len", call_function("byte_at", $"payload", off))
    def be16(off: Column): Column = byteAt(off) * 256L + byteAt(off + 1L)
    // m6's hop materialization: each offset is a real column so hop
    // k+1 references an attribute, not a re-embedded copy of the
    // whole prior chain
    var walked = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_off1", lit(3L))
    for (i <- 1 until maxHops)
      walked = walked.withColumn(s"_off${i + 1}",
        col(s"_off$i") + 2L + be16(col(s"_off$i") + 2L))
    def isExifAt(off: Column): Column =
      byteAt(off) === 255L && byteAt(off + 1L) === 225L &&
        hex($"payload".substr((off + 4L).cast("int"), lit(6))) === "457869660000"
    val offs = (1 to maxHops).map(i => col(s"_off$i")).toList
    val exifOff = offs.foldRight(lit(null).cast("long")) {
      case (off, rest) => when(isExifAt(off), off).otherwise(rest)
    }
    val isJpeg = hex(substring($"payload", 1, 2)) === "FFD8"
    val located = walked
      .withColumn("_exif", when(isJpeg, exifOff))
      .withColumn("has_exif", isJpeg && $"_exif".isNotNull)
      .withColumn("exif_off", when($"has_exif", $"_exif"))
      // slice from the TIFF base (marker 2 + length 2 + header 6);
      // 256 bytes bounds the IFD walk like maxEntries bounds the slots
      .withColumn("payload",
        when($"has_exif",
          expr("substr(payload, cast(exif_off + 10 as int), 256)"))
          .otherwise(lit(null).cast("binary")))
      .select($"doc_id", $"has_exif", $"exif_off", $"payload")
    parseTiff(located, maxEntries, passthrough = Seq("has_exif", "exif_off"))
      .drop("is_tiff", "compression")
  }

  /** m11: PERCEPTUAL near-duplicate pairs over the image payloads —
    * dHash (difference hash: downsample to a small grayscale grid,
    * one bit per adjacent-cell comparison; the pHash-family member
    * every image dedup pipeline starts with) with the DECODE step
    * stubbed as the m-family's deterministic fake: grid cell =
    * exact integer sum of the payload's byte codes over its 1/66th
    * slice (a real decoder's resize+grayscale plugs into exactly
    * this column). 6 rows × 10 adjacent comparisons = a 60-bit hash
    * (fits signed ranges in both engines), then d3's pigeonhole
    * serving shape verbatim: 6 chunks of 10 bits — Hamming ≤ 5
    * GUARANTEES a shared chunk — bucket join with oversized buckets
    * dropped before the quadratic stage, exact popcount verify.
    * Integer end to end, so the oracle replays it bit-for-bit. At
    * 100 TB: one scan computes 8-byte hashes (16-66× smaller than
    * payloads), the join shuffles hashes on (chunk_idx, chunk_val)
    * only, and payload bytes never move. */
  def m11PerceptualDedup(spark: SparkSession, dir: String,
                         maxHamming: Int = 5, maxBucket: Int = 64): DataFrame =
    perceptualPairsOf(Tables.documents(spark, dir), maxHamming, maxBucket)

  /** The dHash pipeline over any (doc_id, text-as-payload) frame —
    * the GraftEngine facade's entry point; m11 feeds it the
    * documents table. */
  def perceptualPairsOf(docs: DataFrame,
                        maxHamming: Int = 5, maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    // char_cells codegen kernel: one tight pass per row (the
    // interpreted 66-arm transform/aggregate lambda it replaced put
    // m11 at 4.4s in the sf0.1 bench; the kernel runs the scan at
    // poly-hash speed)
    val cellsExpr = expr("char_cells(text, 66)")
    val phashExpr = expr(phashOverCellsSql)
    val ph = docs
      .select($"doc_id", cellsExpr.as("cells"))
      .select($"doc_id", phashExpr.as("phash"))
    phashPairs(ph, maxHamming, maxBucket)
  }

  /** d3's pigeonhole serving over ANY (doc_id, phash) frame — the
    * banding tail shared by m11 (text-as-payload cells) and the
    * real-pixel dHash path (m19's decoded grids): 6 chunks of 10
    * bits, oversized buckets dropped before the quadratic stage,
    * exact popcount verify. */
  def phashPairs(ph: DataFrame, maxHamming: Int = 5,
                 maxBucket: Int = 64): DataFrame = {
    val spark = ph.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // persist (tracked): the hash scan sits on both sides of the
    // chunk self-join
    val chunks = graft.Caches.persist(ph
      .select($"doc_id", $"phash",
        explode(graft.functions.HashFunctions.simhashChunks($"phash", 6)).as("c"))
      .select($"doc_id", $"phash", $"c.chunk_idx", $"c.chunk_val"))
    val wB = Window.partitionBy($"chunk_idx", $"chunk_val")
    val kept = chunks.withColumn("bcnt", count(lit(1)).over(wB))
      .filter($"bcnt" <= maxBucket)
    kept.as("x").join(kept.as("y"),
        $"x.chunk_idx" === $"y.chunk_idx" && $"x.chunk_val" === $"y.chunk_val" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"),
        expr("bit_count(x.phash ^ y.phash)").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
      .orderBy($"a_id", $"b_id")
  }

  /** m12: PNG tEXt/zTXt/iTXt METADATA walk — the ancillary-chunk
    * chain parse every asset-metadata extractor needs
    * (Title/Author/Comment live in tEXt chunks, not the IHDR m3
    * reads): chunks are [len BE32 | type(4) | data(len) | crc(4)]
    * back to back after the 8-byte signature, so the walk
    * materializes bounded hop offsets (each next offset = prev + 12
    * + len — the m6/m9 marker-chain pattern), decodes tEXt data at
    * the NUL split into (keyword, text), and coalesces the wanted
    * keys across slots (m10's slot pattern). Compressed text
    * (zTXt always, iTXt when its compression flag is set) rides the
    * f5 per-task Inflater seam via [[pngCompressedText]] — real
    * zlib inflate of the data slice, not a stub. Synthesis: IHDR +
    * Title (all docs) + Author (even ids) + Comment (ids%3==0) +
    * zTXt Software (even ids, REALLY deflated at build) + iTXt
    * Description (ids%5==0; zlib-compressed when ids%10==0, plain
    * otherwise) + IEND; the oracle recomputes every field
    * first-principles from the rules — including the zTXt/iTXt
    * plaintexts, which makes the deflate→walk→inflate round trip
    * hash-gated even though DuckDB itself cannot inflate. */
  def m12PngText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def chunkHex(keyAscii: String, value: Column): Column = {
      val keyHex = keyAscii.getBytes("US-ASCII")
        .map(b => f"$b%02X").mkString
      concat(
        lpad(hex(lit(keyAscii.length + 1).cast("long") +
          octet_length(value.cast("binary")).cast("long")), 8, "0"),
        lit("74455874"), // "tEXt"
        lit(keyHex), lit("00"), hex(value.cast("binary")),
        lit("DEADBEEF"))
    }
    val title = concat(lit("doc "), $"doc_id".cast("string"))
    val author = concat(lit("host"), pmod($"doc_id", lit(3)).cast("string"))
    val comment = repeat(lit("c"), (pmod($"doc_id", lit(7)) + 1).cast("int"))
    val hexPrefix = concat(
      lit("89504E470D0A1A0A"),                       // signature
      lit("0000000D4948445200000010000000100806000000DEADBEEF"), // IHDR 16x16 rgba
      chunkHex("Title", title),
      when(pmod($"doc_id", lit(2)) === 0, chunkHex("Author", author))
        .otherwise(lit("")),
      when(pmod($"doc_id", lit(3)) === 0, chunkHex("Comment", comment))
        .otherwise(lit("")))
    // the compressed chunks can't be synthesized columnar (no SQL
    // deflate) — a per-task Deflater splices them in, mirroring the
    // per-task Inflater that will read them back
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", hexPrefix.as("hx"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => defl.end()))
        it.map { case (id, hx) =>
          val out = new java.io.ByteArrayOutputStream()
          out.write(hexDecode(hx))
          if (id % 2 == 0)
            out.write(pngChunk("zTXt",
              "Software\u0000\u0000".getBytes("ISO-8859-1") ++
                deflate(defl, s"graft-${id % 4}".getBytes("UTF-8"))))
          if (id % 5 == 0) {
            val head = "Description\u0000".getBytes("ISO-8859-1")
            val body =
              if (id % 10 == 0)
                Array[Byte](1, 0) ++ "en\u0000\u0000".getBytes("ISO-8859-1") ++
                  deflate(defl, s"desc $id".getBytes("UTF-8"))
              else
                Array[Byte](0, 0) ++ "en\u0000\u0000".getBytes("ISO-8859-1") ++
                  s"desc $id".getBytes("UTF-8")
            out.write(pngChunk("iTXt", head ++ body))
          }
          out.write(hexDecode("0000000049454E44AE426082")) // IEND
          (id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
    // only the served keys pay the Inflater: the pre-filter reads
    // each slice's NUL-terminated keyword prefix columnar
    val comp = pngCompressedText(blobs,
      keywords = Seq("Software", "Description"))
    val software = comp
      .filter($"chunk_type" === "zTXt" && $"keyword" === "Software")
      .select($"doc_id", $"text".as("software"))
    val description = comp
      .filter($"chunk_type" === "iTXt" && $"keyword" === "Description")
      .select($"doc_id", $"text".as("description"))
    parsePngText(blobs, maxChunks = 8)
      .join(software, Seq("doc_id"), "left")
      .join(description, Seq("doc_id"), "left")
      .orderBy($"doc_id")
  }

  private def hexDecode(hx: String): Array[Byte] = {
    val out = new Array[Byte](hx.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** One PNG chunk: len BE32 | type | data | fake CRC (the walkers
    * never check CRCs — real extractors skip them too). */
  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val len = data.length
    Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte) ++
      ctype.getBytes("US-ASCII") ++ data ++
      Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte)
  }

  private def deflate(defl: java.util.zip.Deflater,
                      data: Array[Byte]): Array[Byte] = {
    defl.reset()
    defl.setInput(data)
    defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** The tEXt chunk walker over any (doc_id, payload binary) frame:
    * bounded `maxChunks` hops, non-PNG payloads yield typed nulls,
    * truncated chains stop at the payload edge. */
  def parsePngText(blobs: DataFrame, maxChunks: Int = 6): DataFrame = {
    import blobs.sparkSession.implicits._
    val isPng = hex(substring($"payload", 1, 8)) === "89504E470D0A1A0A"
    var df = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_is", isPng)
    var off: Column = lit(9L)
    (1 to maxChunks).foreach { k =>
      df = df.withColumn(s"_o$k", when($"_is", off))
      df = df.withColumn(s"_l$k",
        when(col(s"_o$k") + 7L <= $"_len",
          conv(hex(expr(s"substring(payload, _o$k, 4)")), 16, 10)
            .cast("long")))
      df = df.withColumn(s"_t$k",
        when(col(s"_l$k").isNotNull &&
             col(s"_o$k") + 11L + col(s"_l$k") <= $"_len",
          expr(s"cast(substring(payload, _o$k + 4, 4) as string)")))
      df = df.withColumn(s"_d$k",
        when(col(s"_t$k") === "tEXt",
          expr(s"cast(substring(payload, _o$k + 8, _l$k) as string)")))
      df = df.withColumn(s"_k$k",
        substring_index(col(s"_d$k"), "\u0000", 1))
      df = df.withColumn(s"_v$k",
        expr(s"substring(_d$k, length(_k$k) + 2)"))
      off = col(s"_o$k") + 12L + coalesce(col(s"_l$k"), lit(0L))
    }
    def keyed(key: String) = coalesce((1 to maxChunks).map(k =>
      when(col(s"_t$k") === "tEXt" && col(s"_k$k") === key,
        col(s"_v$k"))): _*)
    val nText = (1 to maxChunks)
      .map(k => when(col(s"_t$k") === "tEXt", 1L).otherwise(0L))
      .reduce(_ + _)
    df.select($"doc_id", $"_is".as("is_png"),
      keyed("Title").as("title"),
      keyed("Author").as("author"),
      keyed("Comment").as("comment"),
      when($"_is", nText).as("n_text_chunks"))
  }

  /** Columnar chunk SLICER over any (doc_id, payload binary) frame:
    * the same materialized-hop walk as [[parsePngText]], but instead
    * of decoding in place it emits one row per chunk whose type is
    * in `types` — (doc_id, chunk_type, data binary). The slice stays
    * columnar (substring on binary, zero row-level code); whatever
    * per-task imperative step follows (the Inflater seam) receives
    * only the few-hundred-byte data slices, never whole payloads. */
  def pngChunkSlices(blobs: DataFrame, types: Seq[String],
                     maxChunks: Int = 8): DataFrame = {
    import blobs.sparkSession.implicits._
    val isPng = hex(substring($"payload", 1, 8)) === "89504E470D0A1A0A"
    var df = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_is", isPng)
    var off: Column = lit(9L)
    (1 to maxChunks).foreach { k =>
      df = df.withColumn(s"_o$k", when($"_is", off))
      df = df.withColumn(s"_l$k",
        when(col(s"_o$k") + 7L <= $"_len",
          conv(hex(expr(s"substring(payload, _o$k, 4)")), 16, 10)
            .cast("long")))
      df = df.withColumn(s"_t$k",
        when(col(s"_l$k").isNotNull &&
             col(s"_o$k") + 11L + col(s"_l$k") <= $"_len",
          expr(s"cast(substring(payload, _o$k + 4, 4) as string)")))
      df = df.withColumn(s"_d$k",
        when(col(s"_t$k").isin(types: _*),
          expr(s"substring(payload, _o$k + 8, _l$k)")))
      off = col(s"_o$k") + 12L + coalesce(col(s"_l$k"), lit(0L))
    }
    df.select($"doc_id", explode(array((1 to maxChunks).map(k =>
        struct(lit(k).as("pos"), col(s"_t$k").as("chunk_type"),
          col(s"_d$k").as("data"))): _*))
        .as("c"))
      .filter($"c.data".isNotNull)
      .select($"doc_id", $"c.pos".as("pos"),
        $"c.chunk_type".as("chunk_type"), $"c.data".as("data"))
  }

  /** COMPRESSED PNG text (zTXt, iTXt) through the f5 per-task
    * Inflater seam: the columnar walk slices the chunk data, then a
    * per-partition pass parses the tiny header bytes and inflates
    * the zlib stream — Inflater allocated once per task, reset per
    * chunk, released by a task-completion listener (the
    * [[FileIngest.expandArchives]] lifecycle; PNG compresses with
    * the zlib wrapper, so `nowrap = false` here vs the zip walker's
    * raw-deflate `true`). Emits (doc_id, chunk_type, keyword, lang,
    * text); malformed or undecodable chunks are skipped, never
    * thrown — poison blobs can't kill a 100 TB scan. Uncompressed
    * iTXt (compression flag 0) decodes in the same pass.
    *
    * `keywords` pre-filters COLUMNAR, before the per-task pass: the
    * keyword is readable as the NUL-terminated prefix of the slice
    * (both zTXt and iTXt lead with `keyword NUL`), and UTF8String
    * ops are byte-based, so `substring_index(slice, NUL, 1)` reads
    * it without decoding — chunks for unwanted keys never allocate
    * inflate work or cross the codegen boundary. Empty = keep all. */
  def pngCompressedText(blobs: DataFrame, maxChunks: Int = 8,
                        keywords: Seq[String] = Nil): DataFrame = {
    import blobs.sparkSession.implicits._
    val slices = pngChunkSlices(blobs, Seq("zTXt", "iTXt"), maxChunks)
    val wanted =
      if (keywords.isEmpty) slices
      else slices.filter(
        substring_index($"data".cast("string"), "\u0000", 1)
          .isin(keywords: _*))
    wanted
      .select($"doc_id", $"chunk_type", $"data")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val inf = new java.util.zip.Inflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => inf.end()))
        it.flatMap { case (id, ctype, d) =>
          decodePngTextChunk(id, ctype, d, inf)
        }
      }.toDF("doc_id", "chunk_type", "keyword", "lang", "text")
  }

  // ---- m19: REAL PNG pixel decode (IDAT inflate → de-filter) ----

  private val PngW = 22
  private val PngH = 12

  /** The PNG Paeth predictor (spec §9, filter type 4) — shared by
    * the synthesis encoder and [[pngGrayPixels]]' decoder. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Synthesize REAL 8-bit grayscale PNGs from document text — the
    * f8/m12 recipe extended to the pixel tier: pixel(r,c) = the
    * text's code point at position (r·22+c) mod len, taken mod 256
    * (so near-duplicate documents yield near-duplicate images and
    * the dHash tier below has real prey); every scanline carries
    * filter type r mod 5, so ALL five PNG filters (None/Sub/Up/
    * Average/Paeth) are exercised and REALLY applied before the
    * whole filtered stream deflates through the per-task Deflater
    * and splits across TWO IDAT chunks (the spec allows any split —
    * the decoder must concatenate before inflating). Poison blobs
    * (doc_id % 10 == 7) carry garbage where the zlib stream should
    * be: the decoder must skip them, never throw. */
  def synthGrayPngs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => defl.end()))
        it.map { case (id, text) =>
          val cps = text.codePoints().toArray
          val n = math.max(cps.length, 1)
          def pix(r: Int, c: Int): Int =
            if (cps.isEmpty) 0
            else math.floorMod(cps((r * PngW + c) % n), 256)
          val filtered = new java.io.ByteArrayOutputStream()
          val prev = new Array[Int](PngW)
          (0 until PngH).foreach { r =>
            val t = r % 5
            filtered.write(t)
            val cur = Array.tabulate(PngW)(c => pix(r, c))
            var a = 0; var ul = 0
            (0 until PngW).foreach { x =>
              val p = cur(x); val b = prev(x)
              val f = t match {
                case 0 => p
                case 1 => p - a
                case 2 => p - b
                case 3 => p - (a + b) / 2
                case _ => p - paeth(a, b, ul)
              }
              filtered.write(math.floorMod(f, 256))
              a = p; ul = b
            }
            Array.copy(cur, 0, prev, 0, PngW)
          }
          val z =
            if (id % 10 == 7) "NOT A ZLIB STREAM".getBytes("US-ASCII")
            else deflate(defl, filtered.toByteArray)
          val out = new java.io.ByteArrayOutputStream()
          out.write(hexDecode("89504E470D0A1A0A"))
          out.write(pngChunk("IHDR", Array[Byte](
            0, 0, 0, PngW.toByte, 0, 0, 0, PngH.toByte,
            8, 0, 0, 0, 0))) // depth 8, grayscale, no interlace
          val cut = z.length / 2
          out.write(pngChunk("IDAT", z.slice(0, cut)))
          out.write(pngChunk("IDAT", z.slice(cut, z.length)))
          out.write(hexDecode("0000000049454E44AE426082"))
          (id, out.toByteArray)
        }
      }.toDF("doc_id", "payload")
  }

  /** REAL grayscale pixel decode over any (doc_id, payload) frame —
    * the one formerly-stubbed multimodal step, now implementable
    * without image libraries because PNG's pixel tier is exactly
    * zlib + per-scanline filters: the columnar walk gates on the
    * signature + IHDR (8-bit grayscale only — other color types
    * would need palette/channel handling and simply don't decode
    * here), slices the IDAT chunks in order, and a per-task Inflater
    * pass inflates the CONCATENATED stream and reverses the
    * per-scanline filters (types 0-4, the spec's full set). Output:
    * (doc_id, width, height, pixels) with pixels row-major 0-255.
    * Malformed, truncated, or poison payloads yield NO row — never
    * an exception (the 100 TB degradation law). The payload bytes
    * cross the codegen boundary only for rows that passed the
    * columnar gate; at scale this step is I/O-shaped like the zip
    * walker (the f5 seam). */
  def pngGrayPixels(blobs: DataFrame, maxChunks: Int = 8): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val isPng = hex(substring($"payload", 1, 8)) === "89504E470D0A1A0A"
    val hdr = blobs
      .withColumn("_w", conv(hex(substring($"payload", 17, 4)), 16, 10)
        .cast("int"))
      .withColumn("_h", conv(hex(substring($"payload", 21, 4)), 16, 10)
        .cast("int"))
      .withColumn("_d", conv(hex(substring($"payload", 25, 1)), 16, 10)
        .cast("int"))
      .withColumn("_ct", conv(hex(substring($"payload", 26, 1)), 16, 10)
        .cast("int"))
      .filter(isPng && $"_d" === 8 && $"_ct" === 0 &&
        $"_w" > 0 && $"_h" > 0 && $"_w" <= 4096 && $"_h" <= 4096)
      .select($"doc_id", $"_w".as("width"), $"_h".as("height"))
    // IDAT slices in chunk order: sort_array on (pos, data) structs
    // keeps the stream's split order without a window
    val idat = pngChunkSlices(blobs, Seq("IDAT"), maxChunks)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"pos", $"data"))).as("c"))
      .select($"doc_id", $"c.data".as("idat"))
    hdr.join(idat, "doc_id")
      .select($"doc_id", $"width", $"height", $"idat")
      .as[(Long, Int, Int, Seq[Array[Byte]])]
      .mapPartitions { it =>
        val inf = new java.util.zip.Inflater()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => inf.end()))
        it.flatMap { case (id, w, h, z) =>
          decodeGrayPng(id, w, h, z.toArray.flatten, inf)
        }
      }.toDF("doc_id", "width", "height", "pixels")
  }

  /** Inflate + de-filter one grayscale PNG's pixel stream; None on
    * any malformation (bad zlib, short stream, unknown filter). */
  private def decodeGrayPng(id: Long, w: Int, h: Int, z: Array[Byte],
      inf: java.util.zip.Inflater): Option[(Long, Int, Int, Array[Int])] =
    try {
      inf.reset()
      inf.setInput(z)
      val need = h * (w + 1)
      val raw = new Array[Byte](need)
      var got = 0; var stalled = false
      while (got < need && !inf.finished() && !stalled) {
        val n = inf.inflate(raw, got, need - got)
        if (n == 0) stalled = inf.needsInput() || inf.needsDictionary()
        else got += n
      }
      if (got < need) None
      else {
        val px = new Array[Int](w * h)
        var ok = true
        var r = 0
        while (ok && r < h) {
          val t = raw(r * (w + 1)) & 0xFF
          if (t > 4) ok = false
          else {
            var x = 0
            while (x < w) {
              val f = raw(r * (w + 1) + 1 + x) & 0xFF
              val a = if (x > 0) px(r * w + x - 1) else 0
              val b = if (r > 0) px((r - 1) * w + x) else 0
              val c = if (r > 0 && x > 0) px((r - 1) * w + x - 1) else 0
              val p = t match {
                case 0 => f
                case 1 => f + a
                case 2 => f + b
                case 3 => f + (a + b) / 2
                case _ => f + paeth(a, b, c)
              }
              px(r * w + x) = p & 0xFF
              x += 1
            }
            r += 1
          }
        }
        if (ok) Some((id, w, h, px)) else None
      }
    } catch { case _: java.util.zip.DataFormatException => None }

  /** m11's 60-bit dHash fold over a `cells` column — ONE definition
    * for the text-payload path and the real-pixel path, so the two
    * hash tiers cannot drift. */
  private val phashOverCellsSql =
    """aggregate(sequence(0, 59), cast(0 as bigint), (s, b) ->
      |  s + if(element_at(cells, cast((b div 10) * 11 + (b % 10) + 1 as int)) >
      |         element_at(cells, cast((b div 10) * 11 + (b % 10) + 2 as int)),
      |       shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin

  /** dHash over DECODED pixels: 2×2 block sums downsample the 22×12
    * grid to the same 11×6 cell shape m11 hashes, then the shared
    * 60-bit fold. Expects [[pngGrayPixels]]' output at the synth
    * geometry. */
  def decodedPhash(px: DataFrame): DataFrame = {
    import px.sparkSession.implicits._
    px.filter($"width" === PngW && $"height" === PngH)
      .withColumn("cells", expr(
        s"""transform(sequence(0, 65), i ->
           |  cast(element_at(pixels, cast(((i div 11) * 2) * $PngW + (i % 11) * 2 + 1 as int)) as bigint) +
           |  element_at(pixels, cast(((i div 11) * 2) * $PngW + (i % 11) * 2 + 2 as int)) +
           |  element_at(pixels, cast(((i div 11) * 2 + 1) * $PngW + (i % 11) * 2 + 1 as int)) +
           |  element_at(pixels, cast(((i div 11) * 2 + 1) * $PngW + (i % 11) * 2 + 2 as int)))""".stripMargin))
      .withColumn("phash", expr(phashOverCellsSql))
  }

  /** m19: REAL pixel decode gate — synthesize real grayscale PNGs
    * from the documents (all five scanline filters, split IDATs,
    * poison zlib on doc_id % 10 == 7), decode them back through
    * [[pngGrayPixels]] (inflate + de-filter — no image libs), and
    * emit per-doc decode evidence: dimensions, the pixel-sum
    * checksum, and the dHash over the DECODED grid. The oracle
    * recomputes the pixels FIRST-PRINCIPLES from the synthesis rule
    * (text code points — it never touches zlib), so one wrong
    * de-filter step, a missed IDAT concatenation, or a poison row
    * leaking through hash-mismatches. */
  def m19PngPixels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = synthGrayPngs(
      Tables.documents(spark, dir).select($"doc_id", $"text"))
    decodedPhash(pngGrayPixels(blobs))
      .select($"doc_id", $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        expr("aggregate(pixels, cast(0 as bigint), (s, x) -> s + x)")
          .as("pix_sum"),
        $"phash")
      .orderBy($"doc_id")
  }

  /** One zTXt/iTXt data slice → (doc_id, type, keyword, lang, text),
    * or None when malformed. zTXt: keyword NUL method(0) zlib-data.
    * iTXt: keyword NUL compFlag compMethod lang NUL trKeyword NUL
    * text (zlib-data when compFlag=1). */
  private def decodePngTextChunk(
      id: Long, ctype: String, d: Array[Byte],
      inf: java.util.zip.Inflater): Option[(Long, String, String, String, String)] = {
    def nulAt(from: Int): Int = {
      var i = from
      while (i < d.length && d(i) != 0) i += 1
      i
    }
    def inflate(from: Int): Option[String] =
      if (from >= d.length) None
      else try {
        inf.reset()
        inf.setInput(d, from, d.length - from)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var stalled = false
        while (!inf.finished() && !stalled) {
          val n = inf.inflate(buf)
          if (n == 0) stalled = inf.needsInput() || inf.needsDictionary()
          else out.write(buf, 0, n)
        }
        if (inf.finished()) Some(new String(out.toByteArray, UTF_8)) else None
      } catch { case _: java.util.zip.DataFormatException => None }
    val kEnd = nulAt(0)
    if (kEnd == 0 || kEnd >= d.length) return None
    val keyword = new String(d, 0, kEnd, "ISO-8859-1")
    ctype match {
      case "zTXt" =>
        // keyword NUL method; method 0 = deflate is the only defined one
        if (kEnd + 2 > d.length || d(kEnd + 1) != 0) None
        else inflate(kEnd + 2).map(t => (id, ctype, keyword, "", t))
      case "iTXt" =>
        if (kEnd + 3 > d.length) return None
        val compFlag = d(kEnd + 1)
        val langEnd = nulAt(kEnd + 3)
        if (langEnd >= d.length) return None
        val lang = new String(d, kEnd + 3, langEnd - (kEnd + 3), "US-ASCII")
        val trEnd = nulAt(langEnd + 1)
        if (trEnd >= d.length) return None
        val textFrom = trEnd + 1
        if (compFlag == 0)
          Some((id, ctype, keyword, lang,
            new String(d, textFrom, d.length - textFrom, UTF_8)))
        else if (compFlag == 1 && d(kEnd + 2) == 0)
          inflate(textFrom).map(t => (id, ctype, keyword, lang, t))
        else None
      case _ => None
    }
  }

  /** m14: PDF METADATA walk — the one bulk-document format the f/m
    * families didn't cover, and the single biggest non-HTML source
    * in a real crawl: version from the `%PDF-` header, object count
    * from the `N 0 obj` markers, `/Title` from the Info dictionary,
    * the trailer's `/Info N 0 R` reference, the `startxref` tail
    * pointer (how real readers boot: seek tail, read the offset,
    * jump), and the `%%EOF` well-formedness flag. PDF's skeleton is
    * TEXT even when streams are binary, so the walk is pure regexp
    * over the decoded payload — columnar, no per-task pass needed
    * (full content extraction would ride the FileConverter seam like
    * every other rich format). Synthesis: version/object-count/title
    * derive from doc_id arithmetic, the startxref value is the true
    * byte offset of the trailer, and the oracle recomputes the same
    * document first-principles then parses with the same regexps. */
  def m14PdfMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = (pmod($"doc_id", lit(4)) + 4).cast("string")
    val nObjs = (pmod($"doc_id", lit(5)) + 2).cast("int")
    val header = concat(lit("%PDF-1."), v, lit("\n"))
    val body = array_join(
      transform(sequence(lit(1), nObjs), i =>
        concat(i.cast("string"), lit(" 0 obj\n<< /Length "),
          i.cast("string"), lit(" >>\nendobj\n"))), "")
    val infoId = (nObjs + 1).cast("string")
    val info = concat(infoId, lit(" 0 obj\n<< /Title (Doc "),
      $"doc_id".cast("string"), lit(") >>\nendobj\n"))
    val pre = concat(header, body, info)
    val doc = concat(pre,
      lit("trailer << /Root 1 0 R /Info "), infoId, lit(" 0 R >>\nstartxref\n"),
      length(pre).cast("string"), lit("\n%%EOF"))
    val blobs = Tables.documents(spark, dir)
      .select($"doc_id", doc.cast("binary").as("payload"))
    parsePdfMeta(blobs).orderBy($"doc_id")
  }

  /** The PDF skeleton parser over any (doc_id, payload binary)
    * frame; non-PDF payloads yield typed nulls (the m3 rule), and a
    * PDF missing a field yields null for that field, never an ANSI
    * cast error (nullif-guarded). */
  def parsePdfMeta(blobs: DataFrame): DataFrame = {
    import blobs.sparkSession.implicits._
    val s = $"payload".cast("string")
    val isPdf = s.startsWith("%PDF-")
    blobs.select($"doc_id",
      when(isPdf, regexp_extract(s, "^%PDF-([0-9][.][0-9])", 1))
        .as("pdf_version"),
      when(isPdf, expr("regexp_count(cast(payload as string), '[0-9]+ 0 obj')")
        .cast("long")).as("n_objects"),
      when(isPdf, regexp_extract(s, "/Title \\(([^)]*)\\)", 1)).as("title"),
      when(isPdf,
        nullif(regexp_extract(s, "/Info ([0-9]+) 0 R", 1), lit(""))
          .cast("long")).as("info_obj"),
      when(isPdf,
        nullif(regexp_extract(s, "startxref\\s+([0-9]+)", 1), lit(""))
          .cast("long")).as("startxref"),
      when(isPdf, s.endsWith("%%EOF")).as("well_formed"))
  }

  private val Mp3Kbps =
    Seq(32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L, 160L, 192L, 224L,
      256L, 320L)

  /** m17: MP3/ID3 frame-header walk — the audio catalog tier next to
    * m4 (WAV) and m15 (PCM): the last common container the catalog
    * lacked. The m6 marker-walk discipline over MPEG framing: the
    * ID3v2 tag is skipped WHOLESALE by its 28-bit SYNCHSAFE size
    * (four 7-bit bytes — the format's guard against false frame
    * sync inside tag data; naive 32-bit parse lands mid-tag), then
    * up to `maxFrames` MPEG1 Layer III headers hop by the computed
    * frame length (144·bitrate/samplerate + padding, the spec
    * formula) with bitrate/samplerate indexed from the header
    * tables. Per-frame VBR is real (the synthesis varies the bitrate
    * index per frame); a truncated final frame is NOT counted (the
    * fits-fully guard), and non-MP3 blobs yield a typed false row.
    * Oracle recomputes every statistic first-principles from the
    * synthesis rules. */
  def m17Mp3Meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxF = 4
    var df = Tables.documents(spark, dir).select($"doc_id")
      .withColumn("_tag", lit(100L) + pmod($"doc_id", lit(200L)))
      .withColumn("_nf", lit(2L) + pmod($"doc_id", lit(3L)))
      .withColumn("_si", pmod($"doc_id", lit(3L)))
      .withColumn("_sr", when($"_si" === 0L, 44100L)
        .when($"_si" === 1L, 48000L).otherwise(32000L))
    for (k <- 0 until maxF) {
      df = df
        .withColumn(s"_bi$k", lit(1L) + pmod($"doc_id" + k, lit(14L)))
        .withColumn(s"_kbps$k", Mp3Kbps.zipWithIndex.foldLeft(
          lit(null).cast("long")) { case (acc, (v, i)) =>
          when(col(s"_bi$k") === (i + 1).toLong, v).otherwise(acc) })
        .withColumn(s"_pad$k", pmod($"doc_id" + k, lit(2L)))
        .withColumn(s"_fl$k",
          expr(s"(144000 * _kbps$k) div _sr") + col(s"_pad$k"))
        .withColumn(s"_b2$k",
          col(s"_bi$k") * 16L + $"_si" * 4L + col(s"_pad$k") * 2L)
        .withColumn(s"_fr$k",
          when(lit(k.toLong) < $"_nf",
            concat(lit("FFFB"), lpad(hex(col(s"_b2$k")), 2, "0"),
              lit("00"),
              repeat(lit("AA"), (col(s"_fl$k") - 4L).cast("int"))))
            .otherwise(lit("")))
    }
    val ssHex = concat(
      lpad(hex(expr("(_tag div 2097152) % 128")), 2, "0"),
      lpad(hex(expr("(_tag div 16384) % 128")), 2, "0"),
      lpad(hex(expr("(_tag div 128) % 128")), 2, "0"),
      lpad(hex(expr("_tag % 128")), 2, "0"))
    val blobs = df
      .withColumn("_hex", concat(
        lit("494433"), lit("0300"), lit("00"), ssHex,
        repeat(lit("54"), $"_tag".cast("int")),
        (0 until maxF).map(k => col(s"_fr$k")).reduce(concat(_, _))))
      // doc_id%5==4: the final frame loses its last byte (must not
      // count); doc_id%10==7: not MP3 at all (typed false row)
      .withColumn("_hex", when(pmod($"doc_id", lit(5L)) === 4L,
        expr("substring(_hex, 1, length(_hex) - 2)")).otherwise($"_hex"))
      .select($"doc_id",
        when(pmod($"doc_id", lit(10L)) === 7L, unhex(lit("0001020304")))
          .otherwise(unhex($"_hex")).as("payload"))
    parseMp3Meta(blobs).orderBy($"doc_id")
  }

  /** The MP3 walker over any (doc_id, payload binary) frame: ID3v2
    * synchsafe skip, then bounded MPEG1-Layer-III frame hops. */
  def parseMp3Meta(blobs: DataFrame, maxFrames: Int = 4): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off <= $"_len", call_function("byte_at", $"payload", off))
    var w = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_id3", hex(substring($"payload", 1, 3)) === "494433")
      // synchsafe 28-bit size: four 7-bit bytes, high bit clear
      .withColumn("_tagsz", when($"_id3",
        byteAt(lit(7L)) * 2097152L + byteAt(lit(8L)) * 16384L +
          byteAt(lit(9L)) * 128L + byteAt(lit(10L))))
      .withColumn("_o1", when($"_id3", $"_tagsz" + 11L).otherwise(lit(1L)))
    for (k <- 1 to maxFrames) {
      w = w
        .withColumn(s"_h1$k", byteAt(col(s"_o$k")))
        .withColumn(s"_h2$k", byteAt(col(s"_o$k") + 1L))
        .withColumn(s"_h3$k", byteAt(col(s"_o$k") + 2L))
        // sync = 11 set bits; version bits 3-4 (3 = MPEG1), layer
        // bits 1-2 (1 = Layer III)
        .withColumn(s"_sy$k", col(s"_h1$k") === 255L &&
          expr(s"_h2$k div 32") === 7L &&
          expr(s"(_h2$k div 8) % 4") === 3L &&
          expr(s"(_h2$k div 2) % 4") === 1L)
        .withColumn(s"_bix$k", expr(s"_h3$k div 16"))
        .withColumn(s"_six$k", expr(s"(_h3$k div 4) % 4"))
        .withColumn(s"_pdx$k", expr(s"(_h3$k div 2) % 2"))
        .withColumn(s"_kb$k", Mp3Kbps.zipWithIndex.foldLeft(
          lit(null).cast("long")) { case (acc, (v, i)) =>
          when(col(s"_bix$k") === (i + 1).toLong, v).otherwise(acc) })
        .withColumn(s"_srx$k", when(col(s"_six$k") === 0L, 44100L)
          .when(col(s"_six$k") === 1L, 48000L)
          .when(col(s"_six$k") === 2L, 32000L))
        .withColumn(s"_flx$k",
          expr(s"(144000 * _kb$k) div _srx$k") + col(s"_pdx$k"))
        // a frame counts only if its header validates AND it fits
        // fully inside the payload (a truncated tail must not count)
        .withColumn(s"_v$k", coalesce(
          col(s"_sy$k") && col(s"_kb$k").isNotNull &&
            col(s"_srx$k").isNotNull &&
            col(s"_o$k") + col(s"_flx$k") - 1L <= $"_len",
          lit(false)))
        .withColumn(s"_o${k + 1}",
          when(col(s"_v$k"), col(s"_o$k") + col(s"_flx$k")))
    }
    val ks = 1 to maxFrames
    w = w
      .withColumn("_nfr",
        ks.map(k => when(col(s"_v$k"), 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("_skb",
        ks.map(k => when(col(s"_v$k"), col(s"_kb$k")).otherwise(0L))
          .reduce(_ + _))
      .withColumn("_ab",
        ks.map(k => when(col(s"_v$k"), col(s"_flx$k")).otherwise(0L))
          .reduce(_ + _))
      .withColumn("_mp3", col("_v1"))
    w.select($"doc_id",
        $"_mp3".as("is_mp3"),
        when($"_mp3" && $"_id3", $"_tagsz").as("id3_size"),
        when($"_mp3", $"_o1").as("audio_off"),
        when($"_mp3", $"_nfr").as("n_frames"),
        when($"_mp3", $"_ab").as("audio_bytes"),
        when($"_mp3", expr("_skb div _nfr")).as("avg_kbps"),
        when($"_mp3", $"_srx1").as("sr_hz"),
        // MPEG1 Layer III = 1152 samples per frame
        when($"_mp3", expr("(_nfr * 1152 * 1000000) div _srx1"))
          .as("dur_us"))
  }

  /** m18: FLAC STREAMINFO walk — the lossless half of the audio
    * catalog (m4 WAV / m15 PCM / m17 MP3 cover the rest): `fLaC`
    * magic, then metadata-block hops (1-bit last flag + 7-bit type +
    * 24-bit big-endian length — the m6 marker-chain pattern), with
    * STREAMINFO (type 0, mandated FIRST by the spec) bit-unpacked
    * by byte arithmetic: 20-bit sample rate, 3-bit channels−1,
    * 5-bit bits-per-sample−1, 36-bit total samples straddling the
    * byte 13/14 boundary — the synthesis plants totals ABOVE 2³²
    * for some docs so the high nibble is load-bearing. A PADDING
    * block follows for every third doc (the walk must hop it and
    * count it); poison blobs yield a typed false row. Oracle
    * recomputes every field first-principles from the synthesis
    * rules. */
  def m18FlacMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.documents(spark, dir).select($"doc_id")
      .withColumn("_sr", when(pmod($"doc_id", lit(4L)) === 0L, 44100L)
        .when(pmod($"doc_id", lit(4L)) === 1L, 48000L)
        .when(pmod($"doc_id", lit(4L)) === 2L, 32000L)
        .otherwise(96000L))
      .withColumn("_ch", lit(1L) + pmod($"doc_id", lit(8L)))
      .withColumn("_bps", when(pmod($"doc_id", lit(2L)) === 0L, 16L)
        .otherwise(24L))
      .withColumn("_tot", when(pmod($"doc_id", lit(5L)) === 0L,
        lit(4294967296L) + $"doc_id").otherwise(lit(1000L) + $"doc_id"))
      .withColumn("_padlen", pmod($"doc_id", lit(9L)))
      .withColumn("_haspad", pmod($"doc_id", lit(3L)) === 0L)
    def h2(c: Column): Column = lpad(hex(c), 2, "0")
    // the 8 bit-packed bytes: sr(20) ch-1(3) bps-1(5) total(36)
    val b0 = h2(expr("_sr div 4096"))
    val b1 = h2(expr("(_sr div 16) % 256"))
    val b2 = h2(expr("(_sr % 16) * 16 + (_ch - 1) * 2 + (_bps - 1) div 16"))
    val b3 = h2(expr("((_bps - 1) % 16) * 16 + _tot div 4294967296"))
    val b47 = lpad(hex(expr("_tot % 4294967296")), 8, "0")
    val streaminfo = concat(
      // header: type 0, last iff no padding block follows; len 34
      when($"_haspad", lit("00")).otherwise(lit("80")), lit("000022"),
      lit("1000"), lit("1000"),          // min/max blocksize 4096
      lit("000120"), lit("000E10"),      // min/max framesize
      b0, b1, b2, b3, b47,
      repeat(lit("AB"), 16))             // md5 filler
    val padding = when($"_haspad", concat(lit("81"),
      lpad(hex($"_padlen"), 6, "0"),
      repeat(lit("00"), $"_padlen".cast("int")))).otherwise(lit(""))
    val blobs = df
      .withColumn("_hex", concat(lit("664C6143"), streaminfo, padding,
        lit("FFF8")))                    // a frame-sync tail the walk ignores
      .select($"doc_id",
        when(pmod($"doc_id", lit(10L)) === 7L, unhex(lit("0001020304")))
          .otherwise(unhex($"_hex")).as("payload"))
    parseFlacMeta(blobs).orderBy($"doc_id")
  }

  /** The FLAC metadata walker over any (doc_id, payload binary)
    * frame: bounded block hops, STREAMINFO bit-unpack. */
  def parseFlacMeta(blobs: DataFrame, maxBlocks: Int = 3): DataFrame = {
    import blobs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(blobs.sparkSession)
    def byteAt(off: Column): Column =
      when(off <= $"_len", call_function("byte_at", $"payload", off))
    var w = blobs
      .withColumn("_len", octet_length($"payload").cast("long"))
      .withColumn("_magic", hex(substring($"payload", 1, 4)) === "664C6143")
      .withColumn("_o1", lit(5L))
    for (i <- 1 to maxBlocks) {
      w = w
        .withColumn(s"_h$i", byteAt(col(s"_o$i")))
        .withColumn(s"_last$i", expr(s"_h$i div 128") === 1L)
        .withColumn(s"_ty$i", expr(s"_h$i % 128"))
        .withColumn(s"_bl$i",
          byteAt(col(s"_o$i") + 1L) * 65536L +
            byteAt(col(s"_o$i") + 2L) * 256L + byteAt(col(s"_o$i") + 3L))
        .withColumn(s"_ok$i", coalesce($"_magic" && col(s"_h$i").isNotNull &&
          col(s"_o$i") + 3L + col(s"_bl$i") <= $"_len", lit(false)))
      // the walk stops AT the last-flagged block (it still counts)
      w = w.withColumn(s"_o${i + 1}",
        when(col(s"_ok$i") && !col(s"_last$i"),
          col(s"_o$i") + 4L + col(s"_bl$i")))
    }
    // STREAMINFO is block 1 by spec; its body starts at offset 9
    def b(i: Int): Column = byteAt(lit((8 + i).toLong)) // 1-based body byte i
    val isFlac = $"_magic" && $"_ok1" && $"_ty1" === 0L && $"_bl1" === 34L
    val ks = 1 to maxBlocks
    w.withColumn("_nb",
        ks.map(k => when(col(s"_ok$k"), 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("_srx", b(11) * 4096L + b(12) * 16L + expr("byte_at(payload, cast(21 as bigint)) div 16"))
      .withColumn("_flac", isFlac)
      .select($"doc_id",
        $"_flac".as("is_flac"),
        when($"_flac", $"_nb").as("n_blocks"),
        when($"_flac", b(1) * 256L + b(2)).as("min_blocksize"),
        when($"_flac", $"_srx").as("sample_rate"),
        when($"_flac", expr("(byte_at(payload, cast(21 as bigint)) div 2) % 8 + 1"))
          .as("channels"),
        when($"_flac", expr(
          "(byte_at(payload, cast(21 as bigint)) % 2) * 16 + byte_at(payload, cast(22 as bigint)) div 16 + 1"))
          .as("bits_per_sample"),
        when($"_flac", expr("(byte_at(payload, cast(22 as bigint)) % 16) * 4294967296") +
          b(15) * 16777216L + b(16) * 65536L + b(17) * 256L + b(18))
          .as("total_samples"))
      .withColumn("dur_us", when($"is_flac",
        expr("(total_samples * 1000000) div sample_rate")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m18_flac_meta" -> m18FlacMeta _,
    "m17_mp3_meta" -> m17Mp3Meta _,
    "m14_pdf_meta" -> m14PdfMeta _,
    "m13_jpeg_exif" -> m13JpegExif _,
    "m12_png_text" -> m12PngText _,
    "m19_png_pixels" -> m19PngPixels _,
    "m11_perceptual_dedup" -> ((s, d) => m11PerceptualDedup(s, d)),
    "m10_tiff_meta" -> m10TiffMeta _,
    "m9_zip_meta" -> m9ZipMeta _,
    "m1_binary_meta" -> m1BinaryMeta _,
    "m2_frame_sample" -> m2FrameSample _,
    "m3_image_meta" -> m3ImageMeta _,
    "m4_audio_meta" -> m4AudioMeta _,
    "m15_pcm_stats" -> m15PcmStats _,
    "m5_gif_meta" -> m5GifMeta _,
    "m6_jpeg_meta" -> m6JpegMeta _,
    "m7_mp4_meta" -> m7Mp4Meta _,
    "m16_mp4_samples" -> m16Mp4Samples _,
    "m8_tar_meta" -> m8TarMeta _)

  val oracles: Map[String, String] = Map(
    // every field recomputed first-principles from the synthesis
    // rules — a wrong bit boundary in the 20/3/5/36 unpack (esp. the
    // 36-bit total straddling the high nibble) hash-mismatches
    "m18_flac_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 44100 WHEN 1 THEN 48000 WHEN 2 THEN 32000
        |      ELSE 96000 END AS BIGINT) AS sr,
        |    CAST(1 + doc_id % 8 AS BIGINT) AS ch,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS BIGINT)
        |      AS bps,
        |    CAST(CASE WHEN doc_id % 5 = 0 THEN 4294967296 + doc_id
        |         ELSE 1000 + doc_id END AS BIGINT) AS tot,
        |    doc_id % 10 = 7 AS poison,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS nb
        |  FROM documents)
        |SELECT doc_id,
        |  NOT poison AS is_flac,
        |  CASE WHEN poison THEN NULL ELSE nb END AS n_blocks,
        |  CASE WHEN poison THEN NULL ELSE CAST(4096 AS BIGINT) END
        |    AS min_blocksize,
        |  CASE WHEN poison THEN NULL ELSE sr END AS sample_rate,
        |  CASE WHEN poison THEN NULL ELSE ch END AS channels,
        |  CASE WHEN poison THEN NULL ELSE bps END AS bits_per_sample,
        |  CASE WHEN poison THEN NULL ELSE tot END AS total_samples,
        |  CASE WHEN poison THEN NULL ELSE (tot * 1000000) // sr END
        |    AS dur_us
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // every statistic recomputed first-principles from the synthesis
    // rules: synchsafe tag size, per-frame VBR bitrates, the spec
    // frame-length formula, the truncated final frame dropped — a
    // mis-stepped hop or a 32-bit (non-synchsafe) tag parse
    // hash-mismatches
    "m17_mp3_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(100 + doc_id % 200 AS BIGINT) AS tag,
        |    CAST(2 + doc_id % 3 AS BIGINT) AS nf_full,
        |    CAST(CASE CAST(doc_id % 3 AS INTEGER)
        |      WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS BIGINT)
        |      AS sr,
        |    doc_id % 10 = 7 AS poison,
        |    CASE WHEN doc_id % 5 = 4 THEN CAST(2 + doc_id % 3 AS BIGINT) - 1
        |         ELSE CAST(2 + doc_id % 3 AS BIGINT) END AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT f.doc_id, t.k,
        |    CAST(CASE CAST(1 + (f.doc_id + t.k) % 14 AS INTEGER)
        |      WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
        |      WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
        |      WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
        |      WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS BIGINT)
        |      AS kbps,
        |    CAST((f.doc_id + t.k) % 2 AS BIGINT) AS pad,
        |    f.sr
        |  FROM f, unnest(generate_series(0, 3)) AS t(k)
        |  WHERE t.k < f.nf),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(sum(kbps) AS BIGINT) AS skb,
        |    CAST(sum((144000 * kbps) // sr + pad) AS BIGINT) AS ab
        |  FROM fr GROUP BY doc_id)
        |SELECT f.doc_id,
        |  NOT f.poison AS is_mp3,
        |  CASE WHEN f.poison THEN NULL ELSE f.tag END AS id3_size,
        |  CASE WHEN f.poison THEN NULL ELSE f.tag + 11 END AS audio_off,
        |  CASE WHEN f.poison THEN NULL ELSE f.nf END AS n_frames,
        |  CASE WHEN f.poison THEN NULL ELSE agg.ab END AS audio_bytes,
        |  CASE WHEN f.poison THEN NULL ELSE agg.skb // f.nf END AS avg_kbps,
        |  CASE WHEN f.poison THEN NULL ELSE f.sr END AS sr_hz,
        |  CASE WHEN f.poison THEN NULL
        |       ELSE (f.nf * 1152 * 1000000) // f.sr END AS dur_us
        |FROM f JOIN agg USING (doc_id)
        |ORDER BY f.doc_id""".stripMargin,
    // the sample formula replayed arithmetically — the synthesis is
    // the ground truth, the Spark side proves the byte round trip
    "m15_pcm_stats" ->
      """WITH f AS (
        |  SELECT doc_id, 48 + doc_id % 32 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n,
        |    GREATEST(-32768, LEAST(32767,
        |      (doc_id*7919 + g.i*104729) % 80000 - 40000)) AS v
        |  FROM f, LATERAL unnest(generate_series(0, n - 1)) AS g(i))
        |SELECT doc_id,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  CAST(max(abs(v)) AS BIGINT) AS peak,
        |  CAST(sum(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clipped,
        |  round(CAST(sum(v) AS DOUBLE) / max(n), 6) AS dc_offset,
        |  round(sqrt(CAST(sum(v*v) AS DOUBLE) / max(n)), 6) AS rms
        |FROM s GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // the sample-table synthesis replayed arithmetically (m15's
    // discipline): sizes/delta/count from the doc_id formulas, the
    // Spark side proves the nested-box byte round trip
    "m16_mp4_samples" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 8 AS BIGINT) AS n,
        |    CAST(3000 + (doc_id % 4) * 750 AS BIGINT) AS delta
        |  FROM documents),
        |sz AS (
        |  SELECT doc_id, n, delta,
        |    CAST(800 + (doc_id*131 + g.i*7919) % 4200 AS BIGINT) AS s
        |  FROM f, LATERAL unnest(generate_series(0, n - 1)) AS g(i))
        |SELECT doc_id,
        |  true AS is_video,
        |  CAST(600 AS BIGINT) AS movie_timescale,
        |  CAST(max(n) * max(delta) / 150 AS BIGINT) AS movie_duration,
        |  CAST(90000 AS BIGINT) AS media_timescale,
        |  CAST(max(n) AS BIGINT) AS n_samples,
        |  round(90000.0 / max(delta), 4) AS fps,
        |  round(CAST(max(n) * max(delta) AS DOUBLE) / 90000, 4) AS duration_s,
        |  CAST(sum(s) AS BIGINT) AS total_sample_bytes,
        |  CAST(max(s) AS BIGINT) AS max_sample_bytes,
        |  CAST(min(s) AS BIGINT) AS min_sample_bytes,
        |  round(CAST(sum(s) AS DOUBLE) / max(n), 2) AS avg_sample_bytes,
        |  round(CAST(sum(s) AS DOUBLE) * 8 * 90000
        |    / (max(n) * max(delta)), 2) AS bitrate_bps
        |FROM sz GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // the same doc_id-derived synthesis (true trailer byte offset)
    // parsed with the same regexps
    "m14_pdf_meta" ->
      """WITH f AS (
        |  SELECT doc_id, 4 + doc_id % 4 AS v,
        |    CAST(2 + doc_id % 5 AS BIGINT) AS n_objs
        |  FROM documents),
        |syn AS (
        |  SELECT doc_id, n_objs,
        |    '%PDF-1.' || v || chr(10) ||
        |    array_to_string(list_transform(generate_series(1, n_objs),
        |      i -> i || ' 0 obj' || chr(10) || '<< /Length ' || i || ' >>'
        |        || chr(10) || 'endobj' || chr(10)), '') ||
        |    (n_objs + 1) || ' 0 obj' || chr(10) || '<< /Title (Doc '
        |      || doc_id || ') >>' || chr(10) || 'endobj' || chr(10) AS pre
        |  FROM f),
        |d AS (
        |  SELECT doc_id,
        |    pre || 'trailer << /Root 1 0 R /Info ' || (n_objs + 1)
        |      || ' 0 R >>' || chr(10) || 'startxref' || chr(10)
        |      || strlen(pre) || chr(10) || '%%EOF' AS s
        |  FROM syn)
        |SELECT doc_id,
        |  regexp_extract(s, '^%PDF-([0-9][.][0-9])', 1) AS pdf_version,
        |  CAST(len(regexp_extract_all(s, '[0-9]+ 0 obj')) AS BIGINT)
        |    AS n_objects,
        |  regexp_extract(s, '/Title \(([^)]*)\)', 1) AS title,
        |  CAST(nullif(regexp_extract(s, '/Info ([0-9]+) 0 R', 1), '')
        |    AS BIGINT) AS info_obj,
        |  CAST(nullif(regexp_extract(s, 'startxref\s+([0-9]+)', 1), '')
        |    AS BIGINT) AS startxref,
        |  ends_with(s, '%%EOF') AS well_formed
        |FROM d ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the APP1 locator + IFD fields
    // from the synth rules: the variable COM shift, the per-row byte
    // order, and the one-in-five miss branch all replayed from
    // doc_id arithmetic — no SQL byte parsing
    "m13_jpeg_exif" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    (doc_id % 5 <> 0) AS has_exif,
        |    CASE WHEN doc_id % 3 = 0 THEN 7 + doc_id % 11 ELSE 0 END AS com_len,
        |    (doc_id % 3 = 0) AS has_orient
        |  FROM documents)
        |SELECT doc_id, has_exif,
        |  CAST(CASE WHEN has_exif THEN
        |    21 + (CASE WHEN com_len > 0 THEN com_len + 2 ELSE 0 END)
        |  END AS BIGINT) AS exif_off,
        |  CASE WHEN has_exif THEN
        |    CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
        |  END AS byte_order,
        |  CAST(CASE WHEN has_exif THEN
        |    CASE WHEN has_orient THEN 3 ELSE 2 END
        |  END AS BIGINT) AS n_entries,
        |  CAST(CASE WHEN has_exif THEN 32 + doc_id % 500 END AS BIGINT) AS width,
        |  CAST(CASE WHEN has_exif THEN 24 + doc_id % 400 END AS BIGINT) AS height,
        |  CAST(CASE WHEN has_exif AND has_orient THEN 1 + doc_id % 8 END
        |    AS BIGINT) AS orientation
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the tEXt synthesis rules — no
    // SQL byte parsing, so a mis-stepped chunk hop can't be copied
    // the zTXt/iTXt plaintexts are recomputed from the synthesis
    // rules — DuckDB can't inflate, but it doesn't need to: a wrong
    // hop, bad header parse, or broken inflate hash-mismatches
    "m12_png_text" ->
      """SELECT doc_id, TRUE AS is_png,
        |  'doc ' || doc_id AS title,
        |  CASE WHEN doc_id % 2 = 0 THEN 'host' || (doc_id % 3) END
        |    AS author,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN repeat('c', CAST(doc_id % 7 + 1 AS INTEGER)) END
        |    AS comment,
        |  CAST(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
        |         + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_text_chunks,
        |  CASE WHEN doc_id % 2 = 0 THEN 'graft-' || (doc_id % 4) END
        |    AS software,
        |  CASE WHEN doc_id % 5 = 0 THEN 'desc ' || doc_id END
        |    AS description
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // same 66-cell byte-sum grid, same 60-bit dHash, same chunk
    // banding, bucket cap, and popcount verify as the Spark side
    // the pixels recomputed FIRST-PRINCIPLES from the synthesis rule
    // (code points mod 256 — no zlib anywhere): the Spark side must
    // reproduce them through the REAL inflate + de-filter chain, and
    // the poison ids (doc_id % 10 = 7, garbage zlib) must be absent
    "m19_png_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, text, greatest(length(text), 1) AS L
        |  FROM documents WHERE doc_id % 10 <> 7),
        |px AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 263), i ->
        |      CAST(ascii(substring(text, CAST(i % L AS INT) + 1, 1)) % 256
        |        AS BIGINT)) AS pix
        |  FROM d),
        |cl AS (
        |  SELECT doc_id, pix,
        |    list_transform(generate_series(0, 65), i ->
        |      pix[((i // 11) * 2) * 22 + (i % 11) * 2 + 1] +
        |      pix[((i // 11) * 2) * 22 + (i % 11) * 2 + 2] +
        |      pix[((i // 11) * 2 + 1) * 22 + (i % 11) * 2 + 1] +
        |      pix[((i // 11) * 2 + 1) * 22 + (i % 11) * 2 + 2]) AS cells
        |  FROM px),
        |ph AS (
        |  SELECT doc_id, pix,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(0, 59), b ->
        |        CASE WHEN cells[(b // 10) * 11 + (b % 10) + 1] >
        |                  cells[(b // 10) * 11 + (b % 10) + 2]
        |             THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT)
        |        END)),
        |      (s, x) -> s + x) AS phash
        |  FROM cl)
        |SELECT doc_id, CAST(22 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), pix),
        |    (s, x) -> s + x) AS pix_sum,
        |  phash
        |FROM ph
        |ORDER BY doc_id""".stripMargin,
    "m11_perceptual_dedup" ->
      """WITH cl AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 65), i ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(generate_series(i * length(text) // 66 + 1,
        |                                       (i + 1) * length(text) // 66),
        |          j -> CAST(ascii(substring(text, CAST(j AS INT), 1)) AS BIGINT))),
        |        (s, x) -> s + x)) AS cells
        |  FROM documents),
        |ph AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(0, 59), b ->
        |        CASE WHEN cells[(b // 10) * 11 + (b % 10) + 1] >
        |                  cells[(b // 10) * 11 + (b % 10) + 2]
        |             THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
        |      (s, x) -> s + x) AS phash
        |  FROM cl),
        |chunks AS (
        |  SELECT doc_id, phash, c.i - 1 AS chunk_idx,
        |         (phash >> ((c.i - 1) * 10)) & 1023 AS chunk_val
        |  FROM ph, LATERAL unnest(generate_series(1, 6)) AS c(i)),
        |kept AS (
        |  SELECT doc_id, phash, chunk_idx, chunk_val FROM (
        |    SELECT doc_id, phash, chunk_idx, chunk_val,
        |      count(*) OVER (PARTITION BY chunk_idx, chunk_val) AS bcnt
        |    FROM chunks) WHERE bcnt <= 64),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
        |    CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
        |  FROM kept x JOIN kept y
        |    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
        |   AND x.doc_id < y.doc_id)
        |SELECT a_id, b_id, hamming FROM cand
        |WHERE hamming <= 5
        |ORDER BY a_id, b_id""".stripMargin,
    // first-principles recompute from the synth rules — byte order,
    // entry count, and tag values straight from the id arithmetic
    "m10_tiff_meta" ->
      """SELECT doc_id, true AS is_tiff,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 3 END AS BIGINT) AS n_entries,
        |  CAST(16 + doc_id % 240 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 180 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS compression,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 8 END AS BIGINT)
        |    AS orientation
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the directory layout: offsets
    // and sizes rebuilt from the synth's header arithmetic
    "m9_zip_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(substring(text, 1, 64))) AS BIGINT) AS sz1,
        |    CAST(octet_length(encode('doc_' || doc_id || '.txt')) AS BIGINT) AS n1,
        |    CAST(octet_length(encode('{"id":' || doc_id || '}')) AS BIGINT) AS sz2,
        |    CAST(octet_length(encode('meta/' || doc_id || '.json')) AS BIGINT) AS n2,
        |    (doc_id % 2 = 0) AS has_meta
        |  FROM documents)
        |SELECT doc_id, true AS is_zip,
        |  CAST(CASE WHEN has_meta THEN 2 ELSE 1 END AS BIGINT) AS n_entries,
        |  30 + n1 + sz1
        |    + CASE WHEN has_meta THEN 30 + n2 + sz2 ELSE 0 END AS cd_off,
        |  'doc_' || doc_id || '.txt' AS name_1,
        |  sz1 AS bytes_1,
        |  CASE WHEN has_meta THEN 'meta/' || doc_id || '.json' END AS name_2,
        |  CASE WHEN has_meta THEN sz2 END AS bytes_2,
        |  sz1 + CASE WHEN has_meta THEN sz2 ELSE 0 END AS total_member_bytes
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the entry walk: names straight
    // from the synth rules, sizes as byte lengths of the members
    "m8_tar_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(substring(text, 1, 64))) AS BIGINT) AS sz1,
        |    CAST(octet_length(encode('{"id":' || doc_id || '}')) AS BIGINT) AS sz2,
        |    (doc_id % 2 = 0) AS has_meta
        |  FROM documents)
        |SELECT doc_id, true AS is_tar,
        |  CAST(CASE WHEN has_meta THEN 2 ELSE 1 END AS BIGINT) AS n_entries,
        |  'doc_' || doc_id || '.txt' AS name_1,
        |  sz1 AS bytes_1,
        |  CASE WHEN has_meta THEN 'meta/' || doc_id || '.json' END AS name_2,
        |  CASE WHEN has_meta THEN sz2 END AS bytes_2,
        |  sz1 + CASE WHEN has_meta THEN sz2 ELSE 0 END AS total_member_bytes
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the box walk: moov offset and box
    // count rebuilt from the synth's variable ftyp/free sizes
    "m7_mp4_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    16 + 4 * (1 + doc_id % 3) AS ftyp_size,
        |    CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 16 ELSE 0 END AS free_size,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes
        |  FROM documents)
        |SELECT doc_id, true AS is_mp4, 'isom' AS major_brand,
        |  CAST(3 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boxes,
        |  CAST(1 + ftyp_size + free_size AS BIGINT) AS moov_pos,
        |  data_bytes AS mdat_bytes
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the marker-walk result: segment
    // count and SOF offset rebuilt from the synth's presence rules
    // and lengths — a fixed-offset parse cannot reproduce sof_pos
    "m6_jpeg_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 7 + doc_id % 11 ELSE 0 END AS com_len,
        |    CASE WHEN doc_id % 2 = 0 THEN 8 + doc_id % 5 ELSE 0 END AS app1_len,
        |    (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_opt
        |  FROM documents)
        |SELECT doc_id, true AS is_jpeg,
        |  CAST(1 + n_opt AS BIGINT) AS n_segments,
        |  CAST(3 + 18 + (CASE WHEN com_len > 0 THEN com_len + 2 ELSE 0 END)
        |       + (CASE WHEN app1_len > 0 THEN app1_len + 2 ELSE 0 END)
        |    AS BIGINT) AS sof_pos,
        |  CAST(8 AS BIGINT) AS precision,
        |  CAST(120 + (doc_id * 13) % 1943 AS BIGINT) AS height,
        |  CAST(160 + (doc_id * 7) % 2000 AS BIGINT) AS width,
        |  CAST(3 AS BIGINT) AS n_components,
        |  CAST((120 + (doc_id * 13) % 1943)
        |       * (160 + (doc_id * 7) % 2000) * 3 AS BIGINT) AS est_raw_bytes
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the synthesized GIF fields — the
    // oracle checks the bitfield/LE parse inverted the synth exactly
    "m5_gif_meta" ->
      """SELECT doc_id, true AS is_gif,
        |  CASE WHEN doc_id % 2 = 0 THEN '89a' ELSE '87a' END AS version,
        |  CAST(16 + doc_id % 1024 AS BIGINT) AS width,
        |  CAST(16 + (doc_id * 11) % 1024 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END AS BIGINT) AS has_gct,
        |  CAST(7 AS BIGINT) AS color_res,
        |  CAST(CASE WHEN doc_id % 4 <> 0 THEN doc_id % 8 ELSE 0 END AS BIGINT) AS gct_size,
        |  CAST(CASE WHEN doc_id % 4 <> 0
        |            THEN 3 * (1 << CAST(doc_id % 8 + 1 AS INTEGER))
        |            ELSE 0 END AS BIGINT) AS palette_bytes
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the synthesized WAV fields — the
    // oracle checks the LE parse inverted the LE synth exactly
    "m4_audio_meta" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
        |    CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        |    CAST(CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits_per_sample,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes
        |  FROM documents)
        |SELECT doc_id, true AS is_wav,
        |  CAST(1 AS BIGINT) AS audio_format,
        |  n_channels, sample_rate,
        |  sample_rate * (n_channels * bits_per_sample // 8) AS byte_rate,
        |  n_channels * bits_per_sample // 8 AS block_align,
        |  bits_per_sample, data_bytes,
        |  CAST(floor(data_bytes * 1000000.0
        |    / (sample_rate * (n_channels * bits_per_sample // 8))) AS BIGINT)
        |    AS est_duration_us
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    // first-principles recompute of the synthesized header fields —
    // the oracle checks the parse inverted the synth exactly
    "m3_image_meta" ->
      """SELECT doc_id, true AS is_png,
        |  CAST(16 + doc_id % 64 AS BIGINT) AS width,
        |  CAST(16 + (doc_id * 7) % 64 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 6 END AS BIGINT) AS color_type,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 4 END AS BIGINT) AS channels,
        |  CAST((16 + doc_id % 64) * (16 + (doc_id * 7) % 64)
        |       * (CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 4 END) AS BIGINT) AS est_raw_bytes
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  md5(substring(hx, i*128 + 1, 128)) AS frame_md5,
        |  CAST(least(n, (i+1)*64) - i*64 AS INTEGER) AS frame_bytes
        |FROM f, LATERAL unnest(generate_series(0, CAST(greatest(1, n // 64) AS BIGINT) - 1)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum,
        | 'application/x-fake-' || replace(source, 'src', '') AS mime
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
