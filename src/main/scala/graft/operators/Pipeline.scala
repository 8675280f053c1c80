package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end training-data preparation pipeline as ONE
  * oracle-checked query (SURVEY.md §2.D capstone; the facade twin is
  * GraftEngine.prepareCorpus): language ID + quality scoring →
  * quality floor → exact dedup (digest-keyed first occurrence) →
  * MinHash-LSH near-dedup (drop the higher doc_id of every pair ≥
  * 0.3). Every stage's hash/score family is SQL-reproducible, so
  * DuckDB replays the WHOLE pipeline — scoring, dedup, sketching —
  * and hash-matches the surviving corpus.
  */
object Pipeline {

  def p1PrepareCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .withColumn("lang_id", TextAnalysis.langId($"text"))
      .withColumn("quality", TextAnalysis.quality($"text"))
      .filter($"quality" >= 0.2)
    // persisted (tracked): the survivor set feeds BOTH the signature
    // semi-join and the final anti-join — three narrow columns, not
    // the corpus
    val exactKept = graft.Caches.persist(scored
      .withColumn("__md5", md5($"text"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"__md5").orderBy($"doc_id")))
      .filter($"__rn" === 1)
      .select($"doc_id", $"lang_id", $"quality"))
    // Near-dedup runs on the EXACT-DEDUP SURVIVORS, not the raw
    // corpus: a duplicate-heavy crawl (the 100 TB normal case) would
    // otherwise put every byte-identical copy into the same LSH band
    // buckets and the band self-join would emit O(copies^2) candidate
    // pairs before a single survivor dropped. The shared signature
    // scan is semi-joined down to survivors BEFORE any band explodes;
    // docs the exact pass already collapsed never reach the sketch.
    val sig = Dedup.minhashSigs(spark, dir)
      .join(exactKept.select($"doc_id"), Seq("doc_id"), "left_semi")
    // no broadcast hint: the loser set scales with the near-dup
    // rate — AQE broadcasts at runtime when it is actually small
    val losers = Dedup.minhashLshPairsOf(sig)
      .select($"b_id".as("doc_id")).distinct()
    exactKept.join(losers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang_id", $"quality")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_prepare_corpus" -> p1PrepareCorpus _)

  val oracles: Map[String, String] = Map(
    "p1_prepare_corpus" ->
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |${TextAnalysis.profileColsSql}
         |   ${TextAnalysis.zhColSql},
         |${TextAnalysis.qualityColsSql}
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, text,
         |    CASE WHEN s_zh > 0 THEN 'zh'
         |      ${TextAnalysis.bestChainSql}
         |      ELSE 'unknown' END AS lang_id,
         |    ${TextAnalysis.qualityExprSql} AS quality
         |  FROM base),
         |flt AS (SELECT * FROM scored WHERE quality >= 0.2),
         |exact AS (
         |  SELECT doc_id, text, lang_id, quality FROM (
         |    SELECT doc_id, text, lang_id, quality,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM flt)
         |  WHERE rn = 1),
         |losers AS (
         |  SELECT DISTINCT b_id FROM (
         |${Dedup.d2SqlOver("exact")}
         |  ))
         |SELECT doc_id, lang_id, quality
         |FROM exact
         |WHERE doc_id NOT IN (SELECT b_id FROM losers)
         |ORDER BY doc_id""".stripMargin)
}
