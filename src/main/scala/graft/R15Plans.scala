package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Dev/evidence utility for the r15 optimization round: dump the
  * formatted physical plans of the BUILD-side frames the round
  * restructured, before-shape vs after-shape, into `plans/r15/`.
  *
  * The "after" frames come from the live code path
  * (TextIndex.tokenize/termRowsOf, Knn's checkpointed PQ encode);
  * the "before" frames replay the pre-round expressions verbatim
  * (copied from the previous commit of TextIndex.scala) so the two
  * plans are comparable on the same session and corpus. Serving
  * queries are untouched by the round (bit-equal artifacts), so their
  * plans live in PLANS.md as always.
  *
  * Usage: runMain graft.R15Plans [sfDir] [outDir]
  */
object R15Plans {

  /** The pre-r15 tokenize: THREE full-width regex extractions. */
  private def tokenizeBefore(corpus: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    val meta = corpus.columns.filterNot(Set("doc_id", "text")).toSeq
    val pat = lit(operators.HybridSearch.WordTokenPattern)
    val nl = instr($"text", "\n")
    val title = substring_index($"text", "\n", 1)
    val body = when(nl > 0, $"text".substr(nl + lit(1), length($"text")))
      .otherwise(lit(""))
    corpus.select($"doc_id" +: meta.map(col) :+
        regexp_extract_all(lower($"text"), pat, lit(0)).as("tok") :+
        regexp_extract_all(lower(title), pat, lit(0)).as("ttok") :+
        regexp_extract_all(lower(body), pat, lit(0)).as("btok"): _*)
      .withColumn("dl", size($"tok").cast("double"))
      .withColumn("nlt", size($"ttok").cast("long"))
      .withColumn("nlb", size($"btok").cast("long"))
  }

  /** The pre-r15 postings aggregation. */
  private def postingsBefore(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks
      .select($"doc_id", $"dl", posexplode($"tok").as(Seq("p", "term")))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list($"p" + 1)).as("pos"))
  }

  /** The pre-r15 fielded aggregation: a SECOND explode+union+shuffle
    * over the per-field token arrays. */
  private def fieldedBefore(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks.select($"doc_id", $"nlt", $"nlb", explode($"ttok").as("term"),
        lit(1L).as("_t"), lit(0L).as("_b"))
      .unionByName(
        toks.select($"doc_id", $"nlt", $"nlb", explode($"btok").as("term"),
          lit(0L).as("_t"), lit(1L).as("_b")))
      .groupBy($"term", $"doc_id", $"nlt", $"nlb")
      .agg(sum($"_t").as("tt"), sum($"_b").as("bt"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mode = ExplainMode.fromString("formatted")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(mode)
      val clean = plan.trim.flatMap {
        case c if c == '\n' || c == '\t' || c >= ' ' => c.toString
        case c => f"\\x${c.toInt}%02x"
      }
      Files.writeString(Paths.get(s"$outDir/$name.txt"), clean + "\n")
      println(s"[r15plans] wrote $outDir/$name.txt")
    }
    val corpus = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")

    // ---- text-index build kernels: before = 3 regex passes + two
    // aggregations (postings, fielded); after = 2 passes (one
    // title-width) + ONE aggregation serving both artifacts
    val toksB = tokenizeBefore(corpus)
    dump("text_index_postings_before", postingsBefore(toksB))
    dump("text_index_fielded_before", fieldedBefore(toksB))
    val toksA = graft.sources.TextIndex.tokenize(corpus)
    dump("text_index_termrows_after",
      graft.sources.TextIndex.termRowsOf(toksA))

    // ---- PQ-store append: before = the assign+encode pipeline
    // (executed once PER TIER write); after = the same pipeline
    // behind an eager checkpoint, each tier write a cache read.
    // The plan pair shows the full encode subtree vs the
    // LogicalRDD scan the checkpoint leaves behind.
    val pqTmp = Files.createTempDirectory("graft_r15_pq").toString + "/ix"
    operators.Knn.writePqIndex(spark, sfDir, pqTmp)
    val (cents, books) = operators.Knn.pqStoreModel(spark, pqTmp)
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val centMat = typedLit(cents)
    val bookMat = typedLit(books)
    val encodeBefore = operators.Knn.assign(vecs, cents)
      .withColumn("r", zip_with($"v", element_at(centMat, $"cid" + 1),
        (a, b) => a - b))
      .withColumn("code", call_function("pq_encode", $"r", bookMat))
      .select($"vec_id", $"code", $"cid")
    dump("pq_append_codes_tier_before", encodeBefore)
    val encodeAfter = operators.Knn.assign(vecs, cents)
      .withColumn("r", zip_with($"v", element_at(centMat, $"cid" + 1),
        (a, b) => a - b))
      .select($"vec_id", $"v", $"cid",
        call_function("pq_encode", $"r", bookMat).as("code"))
      .localCheckpoint(true)
    dump("pq_append_codes_tier_after",
      encodeAfter.select($"vec_id", $"code", $"cid"))
    spark.stop()
  }
}
