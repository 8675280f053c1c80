package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** A TRAINED quality classifier — the fasttext/CCNet-style learned
  * quality filter (reference: qurio scores content heuristically;
  * production corpus pipelines train a linear classifier against a
  * high-quality seed corpus and score every crawled page with it).
  *
  * Model: logistic regression over hashed bag-of-words features
  * (F=32 token-hash buckets, frequency-normalized, plus a bias), 3
  * full-batch gradient-descent iterations, self-trained against the
  * "above-median t2 quality" label (standing in for the wiki-vs-crawl
  * seed labels a production run feeds in).
  *
  * Determinism discipline (what makes a TRAINED model oracle-able):
  * every arithmetic op in the whole train+score path is IEEE-exact
  * (+, -, *, /, abs — all correctly rounded by both engines), and
  * every float accumulation is an ORDERED fold — the per-document
  * dot product folds feature index 1..33 in order, the per-feature
  * gradient folds documents in doc_id order (the a3/a4 window-frame
  * trick). The activation is the rational fast sigmoid
  * 0.5 + 0.5*z/(1+|z|) (Elliott), NOT exp-based: exp is not
  * correctly-rounded and would diverge between engines after three
  * iterations. DuckDB replays the identical fold sequence, so the
  * trained weights — and every score — hash-match bit for bit.
  *
  * Scale shape: features are one codegen scan (computed once,
  * persisted); each GD iteration is one exchange (the pos-keyed
  * ordered fold; 33 partitions) with k=33 doubles collected per
  * iteration — the MLlib loop shape, lineage kept flat by
  * re-broadcasting weights as literals. Scoring is a zero-join,
  * map-only pass against the weight literal. The ordered gradient
  * fold is the correctness-mode trade a3/a4 already make and bill: a
  * production run swaps the window fold for treeAggregate's unordered
  * sum (same result modulo float association) without touching the
  * model.
  */
object QualityModel {

  /** Hashed-feature buckets (bias excluded). */
  val NumFeatures = 32

  /** Full-batch GD iterations — enough for a sign-correct separator
    * from a zero init; more rounds sharpen but do not flip it. */
  val Iterations = 3

  /** Learning rate: features are ratios <= 1, errors <= 0.5, so the
    * raw gradient is small; 4.0 keeps the 3-round path informative. */
  val LearningRate = 4.0

  /** The rational fast sigmoid — IEEE-exact (no exp). */
  private def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Ordered per-row dot product x·w, folding feature 1..dim in index
    * order (the same left fold the oracle's list_reduce replays). */
  private def dotOrdered(x: Column, w: Column, dim: Int): Column =
    aggregate(sequence(lit(1), lit(dim)), lit(0.0),
      (acc, j) => acc + element_at(x, j) * element_at(w, j))

  /** Feature extraction: (doc_id, x: array<double> of F+1, y: double).
    * x_j = |{tokens hashing to bucket j}| / n_tokens for j < F, bias
    * 1.0 at the end; y = 1.0 iff t2 quality >= corpus median. One
    * codegen scan; the only shuffle is the tiny median aggregate
    * whose one-row result broadcasts back. */
  private[graft] def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val scored = docs
      .select($"doc_id",
        expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tk"),
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("n_tok"),
        expr("cast(regexp_count(text, '[.,;:!?]') as bigint)").as("n_punct"),
        expr(s"cast(regexp_count(lower(text), '${TextAnalysis.stopwordsEn}') as bigint)")
          .as("n_stop"))
      .select($"doc_id", $"tk",
        round(
          lit(0.4) * least($"n_tok".cast("double") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - $"n_punct".cast("double") / greatest($"n_tok", lit(1))) +
          lit(0.3) * ($"n_stop".cast("double") / greatest($"n_tok", lit(1))),
          6).as("quality"))
    val med = scored.agg(expr("percentile(quality, 0.5)").as("med"))
    // bucket counts via the poly_bow codegen kernel (one pass; the
    // 32-filter HOF form was interpreted per element)
    scored.crossJoin(broadcast(med))
      .select($"doc_id",
        concat(
          transform(call_function("poly_bow", $"tk", lit(NumFeatures)),
            c => c / greatest(size($"tk"), lit(1)).cast("double")),
          array(lit(1.0))).as("x"),
        when($"quality" >= $"med", 1.0).otherwise(0.0).as("y"))
  }

  /** Full-batch GD fit over a (doc_id, x, y) frame. Returns the
    * trained weight vector (F+1 doubles). Gradient accumulation is
    * the deterministic ordered fold described above. */
  def lrFit(feats: DataFrame, iters: Int = Iterations,
            lr: Double = LearningRate): Seq[Double] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val dim = NumFeatures + 1
    var w: Seq[Double] = Seq.fill(dim)(0.0)
    val wSum = Window.partitionBy($"pos").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wFirst = Window.partitionBy($"pos").orderBy($"doc_id")
    for (_ <- 1 to iters) {
      val grad = feats
        .select($"doc_id", $"x",
          (fastSigmoid(dotOrdered($"x", typedLit(w), dim)) - $"y").as("err"))
        .select($"doc_id", $"err", posexplode($"x"))
        .select($"doc_id", $"pos", ($"err" * $"col").as("v"))
        .withColumn("g", sum($"v").over(wSum) / count(lit(1)).over(wSum))
        .withColumn("rn", row_number().over(wFirst))
        .filter($"rn" === 1)
        .select($"pos", $"g").as[(Int, Double)].collect().toMap
      w = w.indices.map(j => w(j) - lr * grad(j))
    }
    w
  }

  /** Score a (doc_id, text) corpus with weights `w` (map-only
    * against the weight literal). */
  private def score(feats: DataFrame, w: Seq[Double]): DataFrame = {
    import feats.sparkSession.implicits._
    feats
      .select($"doc_id", $"y".cast("bigint").as("label"),
        round(fastSigmoid(dotOrdered($"x", typedLit(w), NumFeatures + 1)), 6)
          .as("score"))
      .withColumn("pred", ($"score" >= 0.5).cast("boolean"))
      .orderBy($"doc_id")
  }

  /** Train-and-score over any (doc_id, text) corpus — the facade
    * core. */
  def scoreOf(docs: DataFrame): DataFrame = {
    val feats = graft.Caches.persist(features(docs))
    score(feats, lrFit(feats))
  }

  /** Index-build hook for Bench's `_model_training` line. */
  def trainFilter(spark: SparkSession, dir: String): Unit = {
    val feats = graft.Caches.persist(features(Tables.documents(spark, dir)))
    graft.TrainedModels.memo(spark, s"lr_quality:$dir:f=$NumFeatures:it=$Iterations") {
      lrFit(feats)
    }
    ()
  }

  /** t16: train the classifier on the corpus, then score every
    * document with the trained weights — emits the label it was
    * trained against, the model score, and the model's verdict.
    * Train = 3 exchanges; score = map-only against weight literals;
    * weights memoized per (session, corpus) like the other trained
    * models. */
  def t16QualityLr(spark: SparkSession, dir: String): DataFrame = {
    val feats = graft.Caches.persist(features(Tables.documents(spark, dir)))
    val w = graft.TrainedModels.memo(spark, s"lr_quality:$dir:f=$NumFeatures:it=$Iterations") {
      lrFit(feats)
    }
    score(feats, w)
  }

  /** t26: CALIBRATION audit of the trained filter — the reliability
    * diagram every deployed quality gate needs before its scores are
    * used as sampling weights or thresholds (a miscalibrated model
    * ranks fine but lies about probabilities, and p17-style
    * score-weighted sampling inherits the lie): scores binned into 10
    * equal-width cells, each cell reporting predicted-vs-observed
    * positive rate and the gap. Means are computed from FIXED-POINT
    * integer sums (the 6dp-rounded scores scale exactly to int64), so
    * the per-bin aggregation is order-independent — no double-sum
    * nondeterminism — and both engines divide identical integers.
    * One keyed aggregate over the scored output; the model itself is
    * the memoized t16 artifact, not retrained here. */
  def t26QualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t16QualityLr(spark, dir)
      .select(least(floor($"score" * 10).cast("long"), lit(9L)).as("bin"),
        $"label", round($"score" * 1e6, 0).cast("long").as("s6"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"label").as("n_pos"),
        sum($"s6").as("ssum"))
      .select($"bin", ($"bin".cast("double") / 10).as("bin_lo"),
        $"n_docs", $"n_pos",
        round($"ssum".cast("double") /
          ($"n_docs" * 1000000L).cast("double"), 6).as("mean_score"),
        round($"n_pos".cast("double") / $"n_docs".cast("double"), 6)
          .as("frac_pos"))
      .withColumn("gap", round($"frac_pos" - $"mean_score", 6))
      .orderBy($"bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t16_quality_lr" -> t16QualityLr _,
    "t26_calibration" -> t26QualityCalibration _)

  // the poly hash fold, parameterized on the lambda variable `t`
  // (same kernel as Curation's polyFoldSql)
  private val polyFoldSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(t)),
      |        i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
      |      (a, c) -> (a*31 + c) % 1000000007)""".stripMargin

  /** One GD iteration as two CTEs: e<i> scores with w<i-1>, g<i>
    * folds the gradient in doc_id order, w<i> applies the update. */
  private def iterSql(i: Int): String =
    s"""e$i AS (
       |  SELECT f.doc_id, f.x, f.y,
       |    (0.5 + 0.5*z/(1.0+abs(z))) - f.y AS err
       |  FROM (
       |    SELECT doc_id, x, y,
       |      list_reduce(list_prepend(0.0,
       |        list_transform(generate_series(1, 33), j -> x[j]*w[j])),
       |        (a, b) -> a + b) AS z
       |    FROM f, w${i - 1}) f),
       |g$i AS (
       |  SELECT list(g ORDER BY pos) AS g FROM (
       |    SELECT pos,
       |      list_reduce(list_prepend(0.0, list(v ORDER BY doc_id)),
       |        (a, b) -> a + b) / count(*) AS g
       |    FROM (
       |      SELECT doc_id, p.pos AS pos, err * x[p.pos] AS v
       |      FROM e$i, LATERAL unnest(generate_series(1, 33)) AS p(pos))
       |    GROUP BY pos)),
       |w$i AS (
       |  SELECT list_transform(generate_series(1, 33),
       |    j -> w[j] - $LearningRate*g[j]) AS w
       |  FROM w${i - 1}, g$i)""".stripMargin

  private lazy val t16Sql: String =
    s"""WITH q AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tk,
         |    ${TextAnalysis.qualityExprSql.replace("\n", " ")} AS quality
         |  FROM (SELECT doc_id, text, ${TextAnalysis.qualityColsSql.replace("\n", " ")}
         |        FROM documents)),
         |med AS (SELECT quantile_cont(quality, 0.5) AS med FROM q),
         |f AS (
         |  SELECT doc_id,
         |    list_append(
         |      list_transform(generate_series(0, 31), j ->
         |        CAST(len(list_filter(list_transform(tk, t -> $polyFoldSql),
         |                             h -> h % 32 = j)) AS DOUBLE)
         |          / CAST(greatest(len(tk), 1) AS DOUBLE)),
         |      1.0) AS x,
         |    CASE WHEN quality >= med THEN 1.0 ELSE 0.0 END AS y
         |  FROM q, med),
         |w0 AS (SELECT list_transform(generate_series(1, 33), j -> 0.0) AS w),
         |${(1 to Iterations).map(iterSql).mkString(",\n")}
         |SELECT doc_id, CAST(y AS BIGINT) AS label,
         |  round(0.5 + 0.5*z/(1.0+abs(z)), 6) AS score,
         |  (round(0.5 + 0.5*z/(1.0+abs(z)), 6) >= 0.5) AS pred
         |FROM (
         |  SELECT doc_id, y,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(generate_series(1, 33), j -> x[j]*w[j])),
         |      (a, b) -> a + b) AS z
         |  FROM f, w$Iterations)
         |ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "t16_quality_lr" -> t16Sql,
    // t16's full train+score replay, then the identical fixed-point
    // binning — same floor cells, same integer sums, same divisions
    "t26_calibration" ->
      s"""WITH b AS (
         |  SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
         |    label, CAST(round(score * 1000000, 0) AS BIGINT) AS s6
         |  FROM ($t16Sql)),
         |ag AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(label) AS BIGINT) AS n_pos,
         |    CAST(sum(s6) AS BIGINT) AS ssum
         |  FROM b GROUP BY bin)
         |SELECT bin, CAST(bin AS DOUBLE) / 10 AS bin_lo, n_docs, n_pos,
         |  round(CAST(ssum AS DOUBLE)
         |    / CAST(n_docs * 1000000 AS DOUBLE), 6) AS mean_score,
         |  round(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         |    AS frac_pos,
         |  round(round(CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         |    - round(CAST(ssum AS DOUBLE)
         |        / CAST(n_docs * 1000000 AS DOUBLE), 6), 6) AS gap
         |FROM ag
         |ORDER BY bin""".stripMargin)
}
