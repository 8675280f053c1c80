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

  /** Connected components over an undirected (a_id, b_id) pair set
    * via iterative min-label propagation: every vertex starts
    * labeled with its own id; each round a vertex takes the min of
    * its label and its neighbors' labels; at the fixpoint each
    * component carries its minimum id. Convergence is detected by
    * the label SUM (strictly decreasing until the fixpoint — one
    * scalar agg per round, no change-count join), with a safety
    * bound of `maxIter`.
    *
    * Scale shape: per round one equi-join on src + one keyed min agg
    * (map-side combinable) — the textbook distributed-CC loop;
    * rounds = component diameter. Near-dup graphs are
    * boilerplate-cluster shaped (stars/cliques, diameter ~2-3);
    * a corpus with adversarially long chains would want the
    * large-star/small-star variant (same join primitive, fewer
    * rounds). Labels persist per round via the tracked registry. */
  private[graft] def connectedComponents(pairs: DataFrame,
                                         maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = graft.Caches.persist(pairs.select($"a_id", $"b_id"))
    val edges = graft.Caches.persist(
      p.select($"a_id".as("src"), $"b_id".as("dst"))
        .union(p.select($"b_id".as("src"), $"a_id".as("dst"))))
    var labels = graft.Caches.persist(
      edges.select($"src".as("id")).distinct().withColumn("lbl", $"id"))
    var prevSum = Long.MaxValue
    var curSum = labels.agg(sum($"lbl")).as[Long].head()
    var iter = 0
    while (curSum < prevSum && iter < maxIter) {
      val cand = edges.join(labels, $"src" === $"id")
        .groupBy($"dst").agg(min($"lbl").as("nlbl"))
      labels = graft.Caches.persist(
        labels.join(cand, $"id" === $"dst", "left")
          .select($"id", least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl")))
      prevSum = curSum
      curSum = labels.agg(sum($"lbl")).as[Long].head()
      iter += 1
    }
    labels
  }

  /** p5: near-dup CLUSTERS, not pairs — the keep-one-per-cluster
    * semantics a real dedup pass needs (p1's drop-the-higher-id
    * heuristic over-keeps on transitive chains a-b, b-c where (a,c)
    * never pairs). Components over the verified MinHash-LSH pairs;
    * output one row per clustered doc with its component
    * representative (min id), component size, and whether it is the
    * survivor. */
  def p5DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = connectedComponents(
      Dedup.minhashLshPairsOf(Dedup.minhashSigs(spark, dir)))
    val sizes = labels.groupBy($"lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select($"id".as("doc_id"), $"lbl".as("cluster_rep"),
        $"cluster_size", ($"id" === $"lbl").as("is_rep"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_prepare_corpus" -> p1PrepareCorpus _,
    "p5_dedup_clusters" -> p5DedupClusters _)

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
         |ORDER BY doc_id""".stripMargin,
    // the recursive CTE computes, for every vertex, the set of ids
    // that can reach it; min over that set IS the component minimum —
    // the declarative twin of the label-propagation fixpoint
    "p5_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a_id, b_id FROM (
         |${Dedup.d2Sql}
         |  )),
         |edges AS (
         |  SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL
         |  SELECT b_id, a_id FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
         |comp AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id),
         |sizes AS (
         |  SELECT cluster_rep, count(*) AS cluster_size
         |  FROM comp GROUP BY cluster_rep)
         |SELECT comp.id AS doc_id, comp.cluster_rep,
         |  CAST(sizes.cluster_size AS BIGINT) AS cluster_size,
         |  (comp.id = comp.cluster_rep) AS is_rep
         |FROM comp JOIN sizes USING (cluster_rep)
         |ORDER BY doc_id""".stripMargin)
}
