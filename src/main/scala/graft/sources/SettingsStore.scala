package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftEngine.Settings

/** Settings persistence — the reference's settings service
  * (settings/service.go Get/Update over repo.go's single-row
  * `settings WHERE id = 1` table, migrations 000002/000004/000008)
  * re-expressed for the lakehouse: a single-row parquet a job loads
  * at startup and an admin job overwrites. Absent table = the
  * compiled defaults, the same fallback retrieval.Service.Search
  * applies when settings fail (service.go:74-76).
  *
  * The reference row also carries provider API keys
  * (rerank_api_key, gemini_api_key); credentials do NOT belong in
  * an analytics store, so this surface persists the behavioral
  * knobs — alpha, top-k, and the PROVIDER NAMES for the rerank and
  * embed adapter seams — while keys stay in the secret manager of
  * whatever runs the job.
  *
  * The per-SOURCE typed config (migrations 000005 max_depth +
  * exclusions, 000007 type, 000011 name) lives here too as a keyed
  * table with the migrations' own DEFAULT values resolved for
  * missing sources — so GraftEngine resolves every reference
  * setting without a Postgres. */
/** The persisted single row (public so encoder codegen can reach it). */
final case class SettingsRow(search_alpha: Double, search_top_k: Int,
                             rerank_provider: String,
                             embed_provider: String)

/** One source's typed config row — the `sources` table's config
  * columns with their migration defaults. */
final case class SourceConfigRow(source_id: String, name: String = "",
                                 source_type: String = "web",
                                 max_depth: Int = 0,
                                 exclusions: Seq[String] = Nil)

object SettingsStore {

  def save(spark: SparkSession, path: String, s: Settings): Unit = {
    import spark.implicits._
    Seq(SettingsRow(s.searchAlpha, s.searchTopK, s.rerankProvider,
        s.embedProvider))
      .toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load settings, compiled defaults when the table is absent; a
    * pre-widening store (columns added since it was written) reads
    * with the migration defaults for the missing columns — ADD
    * COLUMN ... DEFAULT semantics, no rewrite. */
  def load(spark: SparkSession, path: String): Settings = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Settings()
    else {
      val d = Settings()
      val df = spark.read.parquet(path)
      def col0(n: String, default: org.apache.spark.sql.Column) =
        if (df.columns.contains(n)) col(n) else default
      df.select(
          col0("search_alpha", lit(d.searchAlpha)).as("a"),
          col0("search_top_k", lit(d.searchTopK)).as("k"),
          col0("rerank_provider", lit(d.rerankProvider)).as("r"),
          col0("embed_provider", lit(d.embedProvider)).as("e"))
        .collect().headOption
        .map(r => Settings(r.getDouble(0), r.getInt(1), r.getString(2),
          r.getString(3)))
        .getOrElse(d)
    }
  }

  /** The stored rerank-provider name ("overlap" when absent). */
  def rerankProvider(spark: SparkSession, path: String): String =
    load(spark, path).rerankProvider

  // ---- per-source config (the sources table's typed columns) ----

  def saveSourceConfigs(spark: SparkSession, path: String,
                        rows: Seq[SourceConfigRow]): Unit = {
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** The source-config table; absent = empty with the typed schema
    * (so callers can join/filter either way). */
  def sourceConfigs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dir)) spark.read.parquet(path)
    else Seq.empty[SourceConfigRow].toDF()
  }

  /** One source's config, the migrations' DEFAULT row when the
    * source has no stored config (ADD COLUMN defaults: name '',
    * type 'web', max_depth 0, exclusions '{}'). */
  def sourceConfig(spark: SparkSession, path: String,
                   sourceId: String): SourceConfigRow = {
    import spark.implicits._
    sourceConfigs(spark, path)
      .filter(col("source_id") === sourceId)
      .as[SourceConfigRow]
      .collect().headOption
      .getOrElse(SourceConfigRow(sourceId))
  }
}
