package graft.sources

import org.apache.spark.sql.SparkSession

import graft.GraftEngine.Settings

/** Settings persistence — the reference's settings service
  * (settings/service.go Get/Update over repo.go's single-row
  * `settings WHERE id = 1` table) re-expressed for the lakehouse: a
  * single-row parquet a job loads at startup and an admin job
  * overwrites. Absent table = the compiled defaults, the same
  * fallback retrieval.Service.Search applies when settings fail
  * (service.go:74-76).
  *
  * The reference row also carries provider API keys; credentials do
  * NOT belong in an analytics store, so this surface deliberately
  * persists only the behavioral knobs (alpha, top-k, rerank
  * provider name) — keys stay in the secret manager of whatever
  * runs the job. */
/** The persisted single row (public so encoder codegen can reach it). */
final case class SettingsRow(search_alpha: Double, search_top_k: Int,
                             rerank_provider: String)

object SettingsStore {
  private type Row = SettingsRow
  private def Row(a: Double, k: Int, p: String) = SettingsRow(a, k, p)

  def save(spark: SparkSession, path: String, s: Settings,
           rerankProvider: String = "overlap"): Unit = {
    import spark.implicits._
    Seq(Row(s.searchAlpha, s.searchTopK, rerankProvider))
      .toDF().coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load settings, compiled defaults when the table is absent. */
  def load(spark: SparkSession, path: String): Settings = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Settings()
    else {
      import spark.implicits._
      spark.read.parquet(path).as[Row].collect().headOption
        .map(r => Settings(r.search_alpha, r.search_top_k))
        .getOrElse(Settings())
    }
  }

  /** The stored rerank-provider name ("" when absent/default). */
  def rerankProvider(spark: SparkSession, path: String): String = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) "overlap"
    else {
      import spark.implicits._
      spark.read.parquet(path).as[Row].collect().headOption
        .map(_.rerank_provider).getOrElse("overlap")
    }
  }
}
