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

  test("curation lifecycle: score -> sample -> budget -> commit -> skip-read") {
    val dir = sfDir
    // 1. one shared scoring pass feeds the whole selection chain
    val scored = graft.operators.TextAnalysis.scoredDocs(spark, dir)
    val n = scored.count()
    assert(n > 0)

    // 2. quality-weighted shortlist, then exact token budgeting
    val sample = graft.operators.Curation.p17WeightedSample(spark, dir, k = 200)
    assert(sample.count() === 200)
    val budgeted = graft.operators.Curation.p18TokenBudget(spark, dir)
    val keep = budgeted.filter($"kept").select($"doc_id")
    assert(keep.count() > 0 && keep.count() < n)

    // 3. the selected corpus commits as an immutable store version...
    val store = Files.createTempDirectory("graft-e2e2").toString + "/corpus"
    val selected = Tables.documents(spark, dir)
      .join(keep, "doc_id")
      .select($"doc_id", $"source", length($"text").cast("long").as("n_chars"))
    val v1 = ChunkStore.commitVersion(selected, store)
    assert(v1 === 1L)

    // 4. ...gets a skipping manifest, and a narrow range read opens
    // a subset of files while returning exactly the filtered rows
    val vPath = s"$store/v=$v1"
    // re-layout the committed version clustered so file stats are tight
    ChunkStore.writeZordered(ChunkStore.readVersion(spark, store, v1), vPath + "z",
      "doc_id", "n_chars", targetFiles = 8)
    ChunkStore.writeManifest(spark, vPath + "z", Seq("doc_id", "n_chars"))
    val (files, total) = ChunkStore.pruneFiles(spark, vPath + "z", "doc_id", 0L, 50L)
    assert(files.size < total, "z-layout must let the manifest skip files")
    val pruned = ChunkStore.prunedRead(spark, vPath + "z", "doc_id", 0L, 50L)
    val expected = selected.filter($"doc_id" <= 50L)
    assert(pruned.count() === expected.count())

    // 5. a second commit doesn't disturb the audited v1 bytes
    val v2 = ChunkStore.commitVersion(selected.limit(10), store)
    assert(v2 === 2L)
    assert(ChunkStore.readVersion(spark, store, v1).count() === selected.count())
    Caches.releaseAll(); Caches.releaseShared()
  }
}
