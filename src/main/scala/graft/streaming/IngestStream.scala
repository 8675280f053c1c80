package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{ChunkQueries, Chunker}

/** Continuous document ingestion — the reference's queue-worker
  * pipeline (NSQ ingest → chunker → embedder consumer → vector store;
  * apps/backend/internal/worker/{events,embedder_consumer}.go)
  * re-expressed as ONE Structured Streaming query: each arriving
  * document is structurally chunked, given its contextual embed
  * input, embedded (stub hashed-BoW), and appended to the
  * partitioned lakehouse chunk store.
  *
  * foreachBatch gives exactly-once appends per epoch against the
  * checkpointed source offsets; the store layout matches
  * sources.ChunkStore (partitioned by source → per-source reads stay
  * pruned, deletes stay partition drops). At scale the same query
  * runs against a Kafka source with watermarked dedup
  * (EventStream.dedupStream) in front.
  */
object IngestStream {

  /** Chunk + contextualize + embed a (doc_id, source, text) frame —
    * shared by the streaming query and batch backfills (same lambda/
    * kappa pairing as EventStream.windowedAgg). */
  def chunkAndEmbed(docs: DataFrame, maxTokens: Int = 64, dims: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    docs
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)]
      .flatMap { case (docId, source, text) =>
        Chunker.chunkMarkdown(text, maxTokens, overlap = 0).zipWithIndex.map {
          case (c, i) => (docId, source, i, c.content, c.chunkType, c.language)
        }
      }
      .toDF("doc_id", "source", "chunk_index", "content", "chunk_type", "language")
      .withColumn("ctx", ChunkQueries.contextualString(
        $"source", concat(lit("doc-"), $"doc_id"), $"chunk_type", $"content"))
      .withColumn("tok", expr("regexp_extract_all(lower(ctx), '\\\\S+', 0)"))
      .filter(size($"tok") > 0)
      .withColumn("embedding", expr(s"hashed_bow(tok, $dims)"))
      .drop("tok", "ctx")
  }

  /** Start the ingestion stream into `storePath` (chunks under
    * /chunks partitioned by source, offsets under /_checkpoints). */
  def ingest(docs: DataFrame, storePath: String, maxTokens: Int = 64): StreamingQuery = {
    val writeEpoch: (DataFrame, Long) => Unit = (batch, _) =>
      batch.write.mode("append").partitionBy("source")
        .parquet(s"$storePath/chunks")
    chunkAndEmbed(docs, maxTokens)
      .writeStream
      .option("checkpointLocation", s"$storePath/_checkpoints")
      .foreachBatch(writeEpoch)
      .start()
  }
}
