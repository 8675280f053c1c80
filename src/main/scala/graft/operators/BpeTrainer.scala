package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — the
  * learn-the-merges pass every tokenizer build runs over a corpus
  * before any token counting is meaningful. Reference scope: qurio
  * counts tokens heuristically; a production corpus pipeline trains
  * its own subword vocabulary on the corpus it curates.
  *
  * Shape: the corpus collapses to a WORD-FREQUENCY table first (one
  * groupBy — the table is vocabulary-sized, not corpus-sized, which
  * is what makes BPE training tractable at 100 TB), collected ONCE;
  * the merge loop then runs driver-local with incremental pair-count
  * bookkeeping, so production merge counts (~30k rounds) cost zero
  * Spark jobs after the single distributed aggregate.
  *
  * Determinism trick that makes the whole loop oracle-able: a word's
  * symbol sequence is represented as a string of space-BLOCKED
  * symbols — each symbol carries its own leading and trailing space
  * (" h  e  l  l  o "), so applying merge (L, R) is the plain string
  * replace of " L  R " with " LR ": both engines' replace scans
  * left-to-right non-overlapping, and because the following symbol
  * keeps its own leading space, consecutive merges chain exactly
  * like canonical BPE (" a  a  a  a " -> " aa  aa ", not the
  * boundary-starved " aa a a " a single-space encoding yields). Counts are integers; the best
  * pair ties break lexicographically. No floats anywhere.
  */
object BpeTrainer {

  /** Merge rounds for the driver query (production runs thousands;
    * the loop shape is identical and each round is one aggregate). */
  val Rounds = 3

  /** The initial character-symbol state for a `word` column. */
  private def initState(word: Column): Column =
    concat(lit(" "),
      array_join(
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        "  "),
      lit(" "))

  /** Fit `rounds` merges over any (doc_id, text) corpus. Returns the
    * per-round (left, right, pair_count, total_tokens_after) — the
    * merge table plus the compression trajectory.
    *
    * Scale shape: ONE distributed pass funnels the corpus into the
    * word-frequency table (vocabulary-sized by construction, not
    * corpus-sized — a 100 TB corpus and a 100 GB corpus produce
    * tables of the same order), which is collected ONCE; every merge
    * round after that is driver-local over the collected table. This
    * is the production tokenizer-trainer shape (subword-nmt and the
    * HF trainers do exactly this), and it means 30k merge rounds
    * cost zero Spark jobs instead of two jobs each. */
  def fitMerges(docs: DataFrame, rounds: Int = Rounds)
      : Seq[(String, String, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = docs
      .select(explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)"))
        .as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect()
    fitMergesLocal(words, rounds)
  }

  /** UTF-8 byte order — the collation BOTH engines' string ORDER BY
    * uses (Spark UTF8String and DuckDB compare memcmp-style on UTF-8
    * bytes), so the driver-local tie-break replays the oracle's. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Canonical BPE merge application: left-to-right, non-overlapping
    * (the semantics of the sentinel-space string replace the oracle
    * runs — "aaaa" under merge (a,a) becomes [aa, aa], not [aa, a]). */
  private def mergePair(s: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-local merge loop with incremental pair-count
    * maintenance: a global (pair → weighted count) map plus a
    * (pair → candidate word set) index, so each merge revisits only
    * the words that contain the merged pair (subword-nmt's
    * bookkeeping). Thousands of rounds cost O(words touched), not
    * O(vocabulary) per round. Stops early (returning the merges
    * found so far) when no adjacent pair remains. */
  private[graft] def fitMergesLocal(
      words: Array[(String, Long)], rounds: Int)
      : Seq[(String, String, Long, Long)] = {
    import scala.collection.mutable
    // split by CODE POINT — Spark's and DuckDB's substring both index
    // code points, so a UTF-16 char split would diverge on astral chars
    val syms: Array[Array[String]] = words.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val freqs: Array[Long] = words.map(_._2)
    var totalTokens = 0L
    var i = 0
    while (i < syms.length) { totalTokens += freqs(i) * syms(i).length; i += 1 }
    val stats = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWord(idx: Int, sign: Long): Unit = {
      val s = syms(idx); val f = freqs(idx) * sign
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = stats.getOrElse(p, 0L) + f
        if (c == 0L) stats.remove(p) else stats(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.HashSet.empty) += idx
        j += 1
      }
    }
    var k = 0
    while (k < syms.length) { addWord(k, 1L); k += 1 }
    val results = mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    var round = 1
    while (round <= rounds && stats.nonEmpty) {
      // argmax by (count desc, left, right) — a full scan of the
      // pair-type-sized map, exactly the oracle's ORDER BY ... LIMIT 1
      var best: ((String, String), Long) = null
      stats.foreach { e =>
        if (best == null || e._2 > best._2 ||
            (e._2 == best._2 && (utf8Lt(e._1._1, best._1._1) ||
              (e._1._1 == best._1._1 && utf8Lt(e._1._2, best._1._2)))))
          best = e
      }
      val ((l, r), cnt) = best
      // `where` sets are supersets (they keep words that since lost
      // the pair); the containment re-check below skips stale entries
      where.remove((l, r)).getOrElse(mutable.HashSet.empty).foreach { idx =>
        val old = syms(idx)
        var has = false
        var j = 0
        while (!has && j + 1 < old.length) {
          has = old(j) == l && old(j + 1) == r; j += 1
        }
        if (has) {
          addWord(idx, -1L)
          val merged = mergePair(old, l, r)
          totalTokens -= freqs(idx) * (old.length - merged.length)
          syms(idx) = merged
          addWord(idx, 1L)
        }
      }
      results += ((l, r, cnt, totalTokens))
      round += 1
    }
    results.toSeq
  }

  /** Train `rounds` merges; one row per round (the t17 view of
    * [[fitMerges]]). */
  def trainOf(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    import docs.sparkSession.implicits._
    fitMerges(docs, rounds).zipWithIndex
      .map { case ((l, r, cnt, tot), i) => (i + 1, l, r, cnt, tot) }
      .toDF("round", "left", "right", "pair_count", "total_tokens")
      .orderBy($"round")
  }

  /** APPLY a trained merge list: tokenize the corpus with the learned
    * subword vocabulary and report per-document token counts under
    * whitespace vs BPE. The merges apply to the DISTINCT-word
    * vocabulary (vocabulary-sized work, then a broadcast join back to
    * documents — never per-occurrence string surgery), the same
    * apply-side split every production tokenizer service uses. */
  def tokenizeOf(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val docWords = docs
      .select($"doc_id",
        explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("n"))
    val vocab = merges.foldLeft(
        docWords.select($"word").distinct()
          .withColumn("st", initState($"word"))) {
      case (df, (l, r)) =>
        df.withColumn("st",
          call_function("replace", $"st", lit(s" $l  $r "), lit(s" $l$r ")))
    }.select($"word", size(split(trim($"st"), "  ")).cast("long").as("n_sym"))
    docWords.join(broadcast(vocab), "word")
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_ws_tokens"),
           sum($"n" * $"n_sym").as("n_bpe_tokens"))
      .orderBy($"doc_id")
  }

  /** Index-build hook for Bench's `_model_training` line: train the
    * session's tokenizer once so t17/t18/p15 serve from the memo. */
  def trainTokenizer(spark: SparkSession, dir: String): Unit = {
    merges(spark, dir); ()
  }

  /** The session's trained merge table (memoized like the other
    * trained models). */
  private def merges(spark: SparkSession, dir: String): Seq[(String, String, Long, Long)] =
    graft.TrainedModels.memo(spark, s"bpe:$dir:r=$Rounds") {
      fitMerges(Tables.documents(spark, dir))
    }

  /** t17: the driver query over the documents table. */
  def t17BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    merges(spark, dir).zipWithIndex
      .map { case ((l, r, cnt, tot), i) => (i + 1, l, r, cnt, tot) }
      .toDF("round", "left", "right", "pair_count", "total_tokens")
      .orderBy($"round")
  }

  /** t18: tokenize the corpus with the session's trained merges. */
  def t18BpeTokenize(spark: SparkSession, dir: String): DataFrame =
    tokenizeOf(Tables.documents(spark, dir),
      merges(spark, dir).map { case (l, r, _, _) => (l, r) })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t17_bpe_train" -> t17BpeTrain _,
    "t18_bpe_tokenize" -> t18BpeTokenize _)

  /** One merge round as CTEs: p<i> counts pairs of w<i-1>, b<i>
    * picks the argmax (count desc, pair lexicographic), w<i> applies
    * the merge with the same sentinel-space replace. */
  private def roundSql(i: Int): String =
    s"""p$i AS (
       |  SELECT syms[g.g] AS l, syms[g.g + 1] AS r,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM (SELECT freq, string_split(trim(st), '  ') AS syms FROM w${i - 1}),
       |    LATERAL unnest(generate_series(1, len(syms) - 1)) AS g(g)
       |  GROUP BY l, r),
       |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
       |w$i AS (
       |  SELECT word, freq,
       |    replace(st, ' ' || b$i.l || '  ' || b$i.r || ' ',
       |                ' ' || b$i.l || b$i.r || ' ') AS st
       |  FROM w${i - 1}, b$i),
       |t$i AS (
       |  SELECT CAST(sum(freq * len(string_split(trim(st), '  '))) AS BIGINT)
       |    AS total FROM w$i)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t17_bpe_train" -> {
      val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
      val unions = (1 to Rounds).map(i =>
        s"""SELECT $i AS round, b$i.l AS "left", b$i.r AS "right",
           |  b$i.cnt AS pair_count, t$i.total AS total_tokens
           |FROM b$i, t$i""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH words AS (
         |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w
         |        FROM documents)
         |  GROUP BY w),
         |w0 AS (
         |  SELECT word, freq,
         |    ' ' || array_to_string(
         |      list_transform(generate_series(1, length(word)),
         |        i -> substring(word, i, 1)), '  ') || ' ' AS st
         |  FROM words),
         |$rounds
         |$unions
         |ORDER BY round""".stripMargin
    },
    // t17's CTE chain to the final state, then the per-doc rollup
    "t18_bpe_tokenize" ->
      s"""WITH $tokenizePrefixSql
         |SELECT doc_id, n_ws_tokens, n_bpe_tokens
         |FROM bpe ORDER BY doc_id""".stripMargin)

  /** The t18 tokenization as a reusable CTE prefix ending in
    * `bpe(doc_id, n_ws_tokens, n_bpe_tokens)` — composed by the t18
    * and p15 oracles. */
  private[operators] lazy val tokenizePrefixSql: String = {
    val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
    s"""words AS (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w
       |        FROM documents)
       |  GROUP BY w),
       |w0 AS (
       |  SELECT word, freq,
       |    ' ' || array_to_string(
       |      list_transform(generate_series(1, length(word)),
       |        i -> substring(word, i, 1)), '  ') || ' ' AS st
       |  FROM words),
       |$rounds,
       |docw AS (
       |  SELECT doc_id, w AS word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT doc_id,
       |          unnest(regexp_extract_all(lower(text), '\\S+')) AS w
       |        FROM documents)
       |  GROUP BY doc_id, w),
       |bpe AS (
       |  SELECT doc_id,
       |    CAST(sum(n) AS BIGINT) AS n_ws_tokens,
       |    CAST(sum(n * len(string_split(trim(st), '  '))) AS BIGINT)
       |      AS n_bpe_tokens
       |  FROM docw JOIN w$Rounds USING (word)
       |  GROUP BY doc_id)""".stripMargin
  }
}
