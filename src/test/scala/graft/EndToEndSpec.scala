package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{ChunkStore, Compaction}

/** The full reference-user journey through the public facade — one
  * scenario exercising the same lifecycle qurio runs (ingest →
  * chunk → embed → hybrid search → logged serving) and the
  * training-data extensions around it (prepare → pack → persist →
  * compact). Each stage is individually oracle- or spec-verified
  * elsewhere; this spec proves they COMPOSE through the public
  * surface with no glue code. */
class EndToEndSpec extends SparkSpec {

  import spark.implicits._

  test("corpus lifecycle: chunk -> embed -> search -> log -> prepare -> pack -> store") {
    val docs = Tables.documents(spark, sfDir)
    val engine = new GraftEngine(spark, docs)

    // 1. ingestion plane: chunk + embed
    val chunks = engine.chunkDocuments(maxTokens = 64)
    assert(chunks.count() > docs.count(), "chunking should split documents")
    val embedded = engine.embedChunks()
    assert(embedded.schema("embedding").dataType.typeName === "array")

    // 2. serving plane: hybrid search end to end, with the query log
    val hits = engine.runSearch("the data pipeline", limit = 5,
      correlationId = "e2e-1")
    assert(hits.nonEmpty && hits.length <= 5)
    assert(engine.queryLog.size === 1)
    val entry = engine.queryLog.snapshot().head
    assert(entry.num_results === hits.length && entry.correlation_id === "e2e-1")
    val stats = engine.queryLog.stats(spark).collect()
    assert(stats.length === 1 && stats.head.getLong(1) === 1L)

    // 3. training-data plane: prepare (lang/quality/dedup) then pack
    val kept = engine.prepareCorpus(minQuality = 0.1)
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= docs.count())
    val packed = engine.packBins(cap = 256L)
    assert(packed.count() === docs.count(), "every doc gets a placement")
    assert(packed.filter(!$"oversize" && $"bin_off" + $"n_tokens" > 256L).isEmpty,
      "non-oversize placements respect the cap")

    // 4. storage plane: persist partitioned, plan compaction, delete
    val tmp = Files.createTempDirectory("graft-e2e").toString
    ChunkStore.writePartitioned(docs.repartition(4), tmp)
    val plan = Compaction.planSummary(
      Compaction.listFiles(spark, tmp), targetBytes = 256 * 1024L)
    assert(plan.count() > 0)
    val survivors = ChunkStore.deleteSourcePartition(spark, tmp, "source", "src0")
    assert(survivors.filter($"source" === "src0").count() === 0)
    assert(survivors.count() === docs.filter($"source" =!= "src0").count())

    engine.releaseCaches()
  }
}
