package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** m2: deterministic fake frame-sampler. Batched per-partition
    * iteration (the mapInPandas analog): every 64-byte stride yields
    * one "frame" whose bytes are hashed in place of a real decode. */
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
            digest.reset()
            digest.update(payload, from, until - from)
            Frame(docId, i, toHex(digest.digest()), until - from)
          }
        }
      }
      .toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> m1BinaryMeta _,
    "m2_frame_sample" -> m2FrameSample _)

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum,
        | 'application/x-fake-' || replace(source, 'src', '') AS mime
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
