package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def blocks: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.EngineQueries.queries, operators.EngineQueries.oracles),
      (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
      (operators.CorpusFilters.queries, operators.CorpusFilters.oracles),
      (operators.QualityModel.queries, operators.QualityModel.oracles),
      (operators.BpeTrainer.queries, operators.BpeTrainer.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Knn.queries, operators.Knn.oracles),
      (operators.ChunkQueries.queries, operators.ChunkQueries.oracles),
      (operators.FileIngest.queries, operators.FileIngest.oracles),
      (operators.WebMeta.queries, operators.WebMeta.oracles),
      (operators.Robots.queries, operators.Robots.oracles),
      (operators.HybridSearch.queries, operators.HybridSearch.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (operators.Pipeline.queries, operators.Pipeline.oracles),
      (operators.Curation.queries, operators.Curation.oracles),
      (streaming.EventStream.queries, streaming.EventStream.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Hybrid BM25+vector search is the reference's core
    * capability, so it is the smoke-checked pipeline: tokenize →
    * columnwise BM25 leg + hashed-BoW cosine leg → relative-score
    * fusion → top-k. */
  def entry(spark: SparkSession): DataFrame =
    operators.HybridSearch.s3HybridSearch(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    blocks.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    blocks.map(_._2).reduce(_ ++ _)
}
