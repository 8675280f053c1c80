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
    // lang-ID / quality / digest come from the SHARED scored-documents
    // scan (TextAnalysis.scoredDocs) — the regex battery runs once per
    // corpus for t1/t2/t5/t15/p1 together, and p1 never touches the
    // text bytes itself: the md5 digest needed for exact dedup is
    // already a cache column.
    val scored = TextAnalysis.scoredDocs(spark, dir)
      .filter($"quality" >= 0.2)
    // persisted (tracked): the survivor set feeds BOTH the signature
    // semi-join and the final anti-join — three narrow columns, not
    // the corpus
    val exactKept = graft.Caches.persist(scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"digest").orderBy($"doc_id")))
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

  /** p22: preparation FUNNEL audit — the per-stage in/out/dropped
    * counts of p1's chain (quality filter → exact dedup → near
    * dedup), the run report every corpus-prep job prints so an
    * operator can see WHERE the corpus went before signing off on
    * the survivor set (a near-dup stage that silently eats 40% is a
    * mis-set τ, not a clean corpus). Same shared scans and the same
    * stage semantics as p1 — the funnel can't drift from the
    * pipeline it audits; three single-row count aggregates unioned,
    * no new corpus scans. */
  def p22PrepareFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.scoredDocs(spark, dir)
    val q = scored.filter($"quality" >= 0.2)
    val exactKept = graft.Caches.persist(q
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"digest").orderBy($"doc_id")))
      .filter($"__rn" === 1)
      .select($"doc_id"))
    val sig = Dedup.minhashSigs(spark, dir)
      .join(exactKept, Seq("doc_id"), "left_semi")
    val losers = Dedup.minhashLshPairsOf(sig)
      .select($"b_id".as("doc_id")).distinct()
    val fin = exactKept.join(losers, Seq("doc_id"), "left_anti")
    def cnt(df: DataFrame) = df.agg(count(lit(1)).as("n"))
    Seq((1, "quality_filter", cnt(scored), cnt(q)),
        (2, "exact_dedup", cnt(q), cnt(exactKept)),
        (3, "near_dedup", cnt(exactKept), cnt(fin)))
      .map { case (i, s, in, out) =>
        in.crossJoin(out.withColumnRenamed("n", "m"))
          .select(lit(i).as("stage_idx"), lit(s).as("stage"),
            $"n".as("docs_in"), $"m".as("docs_out"),
            ($"n" - $"m").as("dropped"))
      }
      .reduce(_ unionByName _)
      .orderBy($"stage_idx")
  }

  /** Connected components over an undirected (a_id, b_id) pair set
    * via the ALTERNATING STAR algorithm (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond" — the algorithm
    * behind GraphFrames/GraphX CC): edges are kept oriented
    * large→small; each round a LARGE-STAR step hangs every
    * strictly-larger neighbor of a node onto the minimum of its
    * neighborhood, then a SMALL-STAR step collapses each node's
    * smaller neighbors (and itself) onto that minimum. The edge set
    * contracts toward stars whose centers are the component minima;
    * star graphs are fixpoints of both steps, so convergence is
    * detected by an edge-set signature (count + hash sum — one
    * scalar agg per round, no set-difference join), with a safety
    * bound of `maxIter`.
    *
    * Scale shape: per round two windowed neighborhood-min passes +
    * a distinct — each a single keyed exchange, no joins at all.
    * Rounds are O(log² n) even for adversarially long chains (the
    * spec drives a 256-node path through in ~6 rounds), where plain
    * min-label propagation needs diameter rounds; on the
    * boilerplate-cluster graphs near-dup dedup produces
    * (stars/cliques) it settles in 2-3 rounds. The edge set SHRINKS
    * as components contract (label propagation re-scans the full
    * edge list every round).
    *
    * Each round's edge frame is materialized with an EAGER
    * lineage-truncating checkpoint ([[graft.Checkpoints.truncate]]),
    * not a plain persist: every round references the previous frame
    * several times, so without lineage TRUNCATION the logical plan
    * grows ~4× per round and the plan string alone OOMs the driver
    * by round ~8 (a persist caches execution but keeps the full
    * logical tree). This is the same checkpoint-interval discipline
    * GraphFrames' CC applies. Set a reliable checkpoint dir
    * (`SparkContext.setCheckpointDir`) for executor-loss recovery on
    * a real cluster; without one the rounds use localCheckpoint and
    * blocks are freed by the ContextCleaner once the loop's frames
    * go out of scope. */
  private[graft] def connectedComponents(pairs: DataFrame,
                                         maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds the alternating
    * loop ran — exposed so the convergence-rate spec can assert the
    * O(log) behavior on a long path. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    var edges = pairs
      .select(greatest($"a_id", $"b_id").as("src"),
              least($"a_id", $"b_id").as("dst"))
      .filter($"src" =!= $"dst").distinct()
      .transform(graft.Checkpoints.truncate)
    // set signature: (row count, XOR of row hashes) — edges are
    // distinct, so equal signatures mean the round was a no-op and
    // the star fixpoint is reached. XOR is order-insensitive and
    // can't overflow (a SUM of 64-bit hashes trips ANSI-mode
    // overflow checks).
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64($"src", $"dst"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(edges)
    var rounds = 0
    var converged = false
    val wU = Window.partitionBy($"src")
    while (!converged && rounds < maxIter) {
      // LARGE-STAR: symmetrize, then for every node u attach each
      // strictly-larger neighbor v to m = min(N(u) ∪ {u}). Every
      // emitted edge has v > u ≥ m, so the output stays oriented
      // large→small.
      val bi = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
      val ls = bi
        .withColumn("m", least(min($"dst").over(wU), $"src"))
        .filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
        .distinct()
      // SMALL-STAR: input is oriented src > dst, so N(u) here is the
      // smaller neighbors; attach them (and u itself) to m = min(N(u)).
      val withMin = ls.withColumn("m", min($"dst").over(wU))
      val next = withMin.filter($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
        .union(withMin.select($"src", $"m".as("dst")))
        .distinct()
        .transform(graft.Checkpoints.truncate)
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      edges = next
      rounds += 1
    }
    // at the fixpoint edges form stars: src → its component minimum;
    // the groupBy-min guards the maxIter-cut case where a node could
    // still carry edges to two candidate minima
    val labels = edges.select($"src".as("id"), $"dst".as("lbl"))
      .union(edges.select($"dst".as("id"), $"dst".as("lbl")))
      .groupBy($"id").agg(min($"lbl").as("lbl"))
    (labels, rounds)
  }

  /** p5: near-dup CLUSTERS, not pairs — the keep-one-per-cluster
    * semantics a real dedup pass needs (p1's drop-the-higher-id
    * heuristic over-keeps on transitive chains a-b, b-c where (a,c)
    * never pairs). Components over the verified MinHash-LSH pairs;
    * output one row per clustered doc with its component
    * representative (min id), component size, and whether it is the
    * survivor. */
  /** SHARED component labels over the corpus's verified MinHash-LSH
    * pairs — the cluster assignment p5 and p12 both consume, computed
    * once per (session, corpus) like the shingle scan it builds on: a
    * real dedup pass labels clusters once and runs every keeper
    * policy against the labels. Persisted via Caches.shared (the
    * label table is two bigint columns — corpus-cardinality rows,
    * tiny relative to the corpus). */
  def componentLabels(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"cc_labels:$dir") {
      connectedComponentsAdaptive(
        Dedup.minhashLshPairsOf(Dedup.minhashSigs(spark, dir)))
    }

  /** Size-adaptive components: the VERIFIED near-dup pair graph is
    * usually tiny relative to the corpus (only actual near-dup
    * members appear in any edge), and the alternating-star loop pays
    * ~log² rounds of fixed job overhead regardless of size — so
    * below `driverLimit` edges the labels come from a driver-local
    * union-find over the collected pair list (bounded by
    * construction: the count gates the collect), and only a
    * genuinely large pair graph (dup-heavy crawl) runs the
    * distributed contraction. Both paths emit identical labels —
    * every member mapped to its component's MIN id — which the
    * equality spec pins on planted graphs. */
  private[graft] def connectedComponentsAdaptive(
      pairs: DataFrame, driverLimit: Long = 1000000L): DataFrame = {
    import pairs.sparkSession.implicits._
    val p = graft.Caches.persist(pairs.select($"a_id", $"b_id"))
    if (p.count() > driverLimit) connectedComponents(p)
    else {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      p.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      pairs.sparkSession.createDataFrame(labels).toDF("id", "lbl")
    }
  }

  def p5DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labels = componentLabels(spark, dir)
    val sizes = labels.groupBy($"lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select($"id".as("doc_id"), $"lbl".as("cluster_rep"),
        $"cluster_size", ($"id" === $"lbl").as("is_rep"))
      .orderBy($"doc_id")
  }

  /** p12: keep-BEST-per-cluster — the keeper policy production
    * pipelines actually want: p5 keeps each near-dup cluster's
    * LOWEST-ID member (deterministic but arbitrary); this ranks the
    * members by t2's quality score and keeps the best copy — a
    * re-crawled page's cleanest version survives, not its oldest.
    * Same component labels (alternating-star contraction), one extra
    * broadcast-friendly quality column and one per-cluster window
    * (clusters are tiny, the window exchange keys on the label);
    * rounded-quality ordering + id tie-break keeps the pick
    * engine-stable. */
  def p12ClusterKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val labels = componentLabels(spark, dir)
    // quality from the shared scored-documents scan (same rounded
    // formula the facade's inline path computes)
    val quality = TextAnalysis.scoredDocs(spark, dir)
      .select($"doc_id", $"quality")
    val w = Window.partitionBy($"cluster_rep")
      .orderBy($"quality".desc, $"doc_id")
    labels
      .join(quality, labels("id") === quality("doc_id"))
      .select($"doc_id", $"lbl".as("cluster_rep"), $"quality")
      .withColumn("keep", row_number().over(w) === 1)
      .orderBy($"doc_id")
  }

  /** d15: DEDUP-SAVINGS report — the audit a dedup pass prints
    * before anyone green-lights the deletion: the cluster-size
    * histogram with exactly what keep-one-per-cluster would drop
    * (docs, tokens, chars) at each size. Composes the two shared
    * materializations (component labels + scored-documents scan) —
    * zero new corpus scans: unclustered docs count as singleton
    * clusters via a left join, the keeper is the component rep (min
    * id, p5's policy), and every figure is an exact integer so the
    * report replays digit-for-digit in the oracle. At 100 TB this is
    * a label⋈scores join on doc_id plus two keyed aggregates over
    * cluster-cardinality rows. */
  def d15DedupSavings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupSavingsOf(
      TextAnalysis.scoredDocs(spark, dir)
        .select($"doc_id", $"n_tok", $"len_chars"),
      componentLabels(spark, dir))
  }

  /** The savings accounting over any (doc_id, n_tok, len_chars)
    * frame + (id, lbl) label table — facade twin seam. */
  def dedupSavingsOf(docs: DataFrame, labels: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val labeled = docs.join(labels, docs("doc_id") === labels("id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("rep"),
        $"n_tok", $"len_chars")
    labeled.groupBy($"rep")
      .agg(count(lit(1)).as("cluster_size"),
           sum($"n_tok").as("toks"), sum($"len_chars").as("chars"),
           sum(when($"doc_id" === $"rep", $"n_tok").otherwise(0L)).as("kept_toks"),
           sum(when($"doc_id" === $"rep", $"len_chars").otherwise(0L)).as("kept_chars"))
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
           sum($"cluster_size" - 1).as("docs_dropped"),
           sum($"toks" - $"kept_toks").as("toks_dropped"),
           sum($"chars" - $"kept_chars").as("chars_dropped"))
      .orderBy($"cluster_size")
  }

  /** p19: CLUSTER-ATOMIC train/val/test split — the leakage fix p3
    * can't express: p3's content-hash key keeps EXACT copies in one
    * split, but a near-duplicate pair (re-crawled page, light edit)
    * hashes differently and can straddle train/test — the classic
    * eval-contamination vector ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022, measures exactly this
    * leak). Here the split key is the CLUSTER's minimum content
    * hash: every member of a verified near-dup component (shared
    * labels) lands in the same split, singletons key on their own
    * hash (≡ p3 for non-duplicated docs), and the key stays
    * content-derived so re-crawls with fresh ids can't reshuffle
    * assignments. Same 80/10/10 buckets as p3; one keyed min-agg
    * over cluster-cardinality rows + a join back on the label. */
  def p19ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val hashed = Tables.documents(spark, dir)
      .select($"doc_id",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
    clusterSplitOf(hashed, componentLabels(spark, dir))
  }

  /** The cluster-atomic split over any (doc_id, h) frame + (id, lbl)
    * label table — the GraftEngine facade feeds it corpus-derived
    * inputs; p19 feeds it the shared scans. */
  def clusterSplitOf(hashed: DataFrame, labels: DataFrame): DataFrame = {
    import hashed.sparkSession.implicits._
    val labeled = hashed.join(labels, hashed("doc_id") === labels("id"), "left")
      .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_rep"), $"h")
    val clusterKey = labeled.groupBy($"cluster_rep")
      .agg(min($"h").as("kh"))
    labeled.join(clusterKey, "cluster_rep")
      .select($"doc_id", $"cluster_rep",
        when(pmod($"kh", lit(100)) < 80, lit("train"))
          .when(pmod($"kh", lit(100)) < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p19_cluster_split" -> p19ClusterSplit _,
    "d15_dedup_savings" -> d15DedupSavings _,
    "p22_prepare_funnel" -> p22PrepareFunnel _,
    "p1_prepare_corpus" -> p1PrepareCorpus _,
    "p12_cluster_keep_best" -> p12ClusterKeepBest _,
    "p5_dedup_clusters" -> p5DedupClusters _)

  val oracles: Map[String, String] = Map(
    // p1's CTE chain, counted per stage
    "p22_prepare_funnel" ->
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
         |  )),
         |fin AS (
         |  SELECT doc_id FROM exact
         |  WHERE doc_id NOT IN (SELECT b_id FROM losers)),
         |counts AS (
         |  SELECT 1 AS stage_idx, 'quality_filter' AS stage,
         |    (SELECT count(*) FROM scored) AS docs_in,
         |    (SELECT count(*) FROM flt) AS docs_out
         |  UNION ALL
         |  SELECT 2, 'exact_dedup',
         |    (SELECT count(*) FROM flt), (SELECT count(*) FROM exact)
         |  UNION ALL
         |  SELECT 3, 'near_dedup',
         |    (SELECT count(*) FROM exact), (SELECT count(*) FROM fin))
         |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
         |  CAST(docs_in AS BIGINT) AS docs_in,
         |  CAST(docs_out AS BIGINT) AS docs_out,
         |  CAST(docs_in - docs_out AS BIGINT) AS dropped
         |FROM counts
         |ORDER BY stage_idx""".stripMargin,
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
    // p5's component CTEs + t2's quality formula + the per-cluster
    // best-pick window
    "p12_cluster_keep_best" ->
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
         |qbase AS (
         |  SELECT doc_id,
         |${TextAnalysis.qualityColsSql}
         |  FROM documents),
         |q AS (SELECT doc_id, ${TextAnalysis.qualityExprSql} AS quality FROM qbase)
         |SELECT comp.id AS doc_id, comp.cluster_rep, q.quality,
         |  (row_number() OVER (PARTITION BY cluster_rep
         |     ORDER BY quality DESC, comp.id) = 1) AS keep
         |FROM comp JOIN q ON q.doc_id = comp.id
         |ORDER BY doc_id""".stripMargin,
    // p5's components + per-cluster min content hash + p3's buckets
    "p19_cluster_split" ->
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
         |docs AS (
         |  SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, length(text)),
         |        i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
         |      (a, c) -> (a*31 + c) % 1000000007) AS h
         |  FROM documents),
         |lab AS (
         |  SELECT docs.doc_id, coalesce(comp.cluster_rep, docs.doc_id) AS rep, h
         |  FROM docs LEFT JOIN comp ON comp.id = docs.doc_id),
         |ck AS (SELECT rep, min(h) AS kh FROM lab GROUP BY rep)
         |SELECT lab.doc_id, lab.rep AS cluster_rep,
         |  CASE WHEN kh % 100 < 80 THEN 'train'
         |       WHEN kh % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lab JOIN ck USING (rep)
         |ORDER BY lab.doc_id""".stripMargin,
    // p5's recursive-CTE components + exact integer doc/token/char
    // accounting per cluster size
    "d15_dedup_savings" ->
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
         |docs AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok,
         |    CAST(length(text) AS BIGINT) AS len_chars
         |  FROM documents),
         |lab AS (
         |  SELECT docs.doc_id, coalesce(comp.cluster_rep, docs.doc_id) AS rep,
         |    n_tok, len_chars
         |  FROM docs LEFT JOIN comp ON comp.id = docs.doc_id),
         |cl AS (
         |  SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size,
         |    CAST(sum(n_tok) AS BIGINT) AS toks,
         |    CAST(sum(len_chars) AS BIGINT) AS chars,
         |    CAST(sum(CASE WHEN doc_id = rep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_toks,
         |    CAST(sum(CASE WHEN doc_id = rep THEN len_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |  FROM lab GROUP BY rep)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(cluster_size - 1) AS BIGINT) AS docs_dropped,
         |  CAST(sum(toks - kept_toks) AS BIGINT) AS toks_dropped,
         |  CAST(sum(chars - kept_chars) AS BIGINT) AS chars_dropped
         |FROM cl GROUP BY cluster_size
         |ORDER BY cluster_size""".stripMargin,
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
