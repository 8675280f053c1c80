package graft

import org.apache.spark.sql.functions._
import graft.functions.ModelAdapters
import graft.functions.ModelAdapters.Instrumented
import graft.operators.FileIngest

/** The production swap-in seams: batched embedder/reranker adapters
  * (the external-API client shape) and the pluggable file converter.
  * Asserts (a) the stubs are bit-equal to the in-plan expression
  * stand-ins — swapping the adapter in/out never changes results —
  * and (b) the batch/lifecycle contract actually holds: one open and
  * one close per task, ceil(rows/batchSize) calls, batches capped. */
class ModelAdaptersSpec extends SparkSpec {

  private def textDf = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select($"doc_id", $"text").limit(200)
  }

  test("adapter embedding is bit-equal to the in-plan poly_bow expression") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val viaAdapter = ModelAdapters.embed(
      textDf, "text", "embedding", new ModelAdapters.PolyBowEmbedder(64))
    val viaExpr = textDf
      .withColumn("tok", expr("regexp_extract_all(lower(text), '\\\\S+', 0)"))
      .withColumn("embedding", expr("poly_bow(tok, 64)"))
      .drop("tok")
    val diff = viaAdapter.select($"doc_id", $"embedding")
      .except(viaExpr.select($"doc_id", $"embedding"))
    assert(diff.isEmpty)
  }

  test("embedder lifecycle: one open/close per task, batched calls") {
    val one = textDf.coalesce(1)
    Instrumented.reset()
    ModelAdapters.embed(one, "text", "embedding",
      new Instrumented.CountingEmbedder(64), batchSize = 32).count()
    assert(Instrumented.opens.get() == 1)
    assert(Instrumented.closes.get() == 1)
    assert(Instrumented.embedCalls.get() == math.ceil(200 / 32.0).toLong)
    assert(Instrumented.embedMaxBatch.get() <= 32)
  }

  test("adapter rerank matches the s4 overlap scorer on its own candidates") {
    import spark.implicits._
    val cands = Seq(
      (1L, "spark joins data"), (2L, "filter the spark rows"),
      (3L, "unrelated words entirely"), (4L, "")).toDF("doc_id", "content")
    val scored = ModelAdapters.rerank(
        cands, "content", "spark join filter", "rr", new ModelAdapters.OverlapReranker)
      .select($"doc_id", round($"rr", 6).as("rr")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // |{spark}| / |{spark,join,filter,joins,data}| = 1/5 etc.
    assert(scored(1L) == 0.2)
    assert(scored(2L) == round6(2.0 / 5.0))
    assert(scored(3L) == 0.0)
    assert(scored(4L) == 0.0)
  }

  private def round6(d: Double): Double = math.rint(d * 1e6) / 1e6

  test("a custom FileConverter drops into ingest without editing the operator") {
    import spark.implicits._
    val files = FileIngest.fileCorpus(spark, sfDir).limit(50)
    // a "real" converter binding: reports document metadata (title,
    // pages), converts the payload, marks everything else ok
    val converter = new FileIngest.FileConverter {
      def convert(payload: Array[Byte], mime: String,
                  filename: String): FileIngest.ConverterResult =
        if (mime == "application/x-encrypted")
          FileIngest.ConverterResult("error_encrypted", None, 0, "")
        else
          FileIngest.ConverterResult("ok",
            Some(FileIngest.ConverterDoc(title = Some(s"Converted $filename"))),
            3, new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    }
    val out = FileIngest.ingest(files, maxTokens = 32, converter = converter)
    val okTitles = out.filter($"status" === "ok")
      .select($"title").distinct().as[String].collect()
    assert(okTitles.nonEmpty)
    // converter-reported metadata wins the reference title strategy
    assert(okTitles.forall(_.startsWith("Converted file_")))
    // encrypted files still surface through the error taxonomy
    assert(out.filter($"status" === "error_encrypted").count() > 0)
  }

  test("index reranker applies permutations with the reference's edge semantics") {
    import graft.functions.ModelAdapters
    // happy path: [1, 0] swaps two docs (service_test.go "Success with Reranker")
    assert(ModelAdapters.applyRerankIndices(Seq("A", "B"), Seq(1, 0)) ===
      Seq(Some("B"), Some("A")))
    // out-of-bounds index leaves an EMPTY slot, in-range ones apply
    // (service_test.go RerankerEdgeCases "Index Out Of Bounds":
    // indices [5, 0] over 2 docs -> [zero-value, docs(0)])
    assert(ModelAdapters.applyRerankIndices(Seq("A", "B"), Seq(5, 0)) ===
      Seq(None, Some("A")))
    // empty docs: reranker must not run (RerankerEdgeCases "Empty Docs")
    object ExplodingReranker extends ModelAdapters.IndexReranker {
      def rerank(q: String, p: Seq[String]): Seq[Int] =
        throw new IllegalStateException("reranker called on empty docs")
    }
    assert(ModelAdapters.rerankServed("q", Seq.empty, 0, ExplodingReranker)
      === Seq.empty)
  }

  test("rerankServed round-trips rows through an index reranker once") {
    import graft.functions.ModelAdapters
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = Seq(("short", 1L), ("a much longer passage", 2L))
      .toDF("text", "id").collect().toSeq
    var calls = 0
    object ByLength extends ModelAdapters.IndexReranker {
      def rerank(q: String, p: Seq[String]): Seq[Int] = {
        calls += 1
        p.indices.sortBy(i => -p(i).length)
      }
    }
    val out = ModelAdapters.rerankServed("q", rows, 0, ByLength)
    assert(calls === 1)
    assert(out.flatten.map(_.getLong(1)) === Seq(2L, 1L))
  }
}
