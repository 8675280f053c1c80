package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators (SURVEY.md §2.F) over the `documents`
  * table — the per-document scoring passes a training-data pipeline
  * runs before filtering/dedup.
  *
  * All four are single-scan, shuffle-free, and built from codegen'd
  * built-ins (regexp_count, aggregate, higher-order lambdas) — no
  * UDFs, so they stay inside whole-stage codegen and scale linearly
  * with input splits. Reference behavior being re-expressed: qurio
  * stores per-chunk `language` metadata and filters low-value chunks
  * (apps/backend/internal/text/chunker.go:40-97 IsNoiseChunk).
  */
object TextAnalysis {

  /** Shared stopword profiles; both the Spark expressions and the
    * DuckDB oracle SQL are generated from these so they can't drift. */
  // NOTE: these are spliced into Spark SQL string literals via expr(),
  // which consume one escaping level — hence \\\\b in source => \\b in
  // the literal => \b reaching the regex engine.
  private val profiles: Seq[(String, String)] = Seq(
    "en" -> "\\\\b(the|and|of|to|in)\\\\b",
    "de" -> "\\\\b(der|die|das|und|ist)\\\\b",
    "es" -> "\\\\b(el|la|los|las|que)\\\\b",
    "fr" -> "\\\\b(le|les|et|est|une)\\\\b")
  private val cjkPattern = "[\\\\x{4e00}-\\\\x{9fff}]"
  private[operators] val stopwordsEn = "\\\\b(the|a|an|and|or|of|to|in|is|it)\\\\b"

  /** regexp_count via the function API: `pattern` strings in this
    * file are written for expr() splicing (one extra escaping level),
    * so unescape before handing them to the regex engine directly. */
  private def rc(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern.replace("\\\\", "\\"))).cast("long")

  /** Language-ID as a single column over any text column — the same
    * fixed-priority argmax t1 materializes with intermediate score
    * columns. */
  def langId(text: Column): Column = {
    val scores = profiles.map { case (l, p) => l -> rc(lower(text), p) }
    val zh = rc(text, cjkPattern)
    val best = scores.foldRight(lit("unknown")) { case ((l, s), els) =>
      val laterGe = scores.filter(_._1 != l).map { case (_, o) => s >= o }
        .reduce(_ && _)
      val earlierGt = scores.takeWhile(_._1 != l).map { case (_, o) => s > o }
        .foldLeft(lit(true))(_ && _)
      when(s > 0 && laterGe && earlierGt, lit(l)).otherwise(els)
    }
    when(zh > 0, lit("zh")).otherwise(best)
  }

  /** Quality score as a single column — t2's blend of token count,
    * punctuation ratio, and stopword ratio. */
  def quality(text: Column): Column = {
    val nTok = rc(text, "\\\\S+")
    val nPunct = rc(text, "[.,;:!?]")
    val nStop = rc(lower(text), stopwordsEn)
    round(
      lit(0.4) * least(nTok.cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - nPunct.cast("double") / greatest(nTok, lit(1))) +
      lit(0.3) * (nStop.cast("double") / greatest(nTok, lit(1))), 6)
  }

  /** Fixed-priority argmax over materialized s_<lang> score columns —
    * the one definition t1 and [[scoredDocs]] share (and that
    * [[langId]] mirrors over inline expressions). */
  private def bestFromScoreCols: Column = {
    val best = profiles.map(_._1).foldRight(lit("unknown")) { case (l, els) =>
      when(col(s"s_$l") > 0 &&
        profiles.map(_._1).filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o"))
          .reduce(_ && _) &&
        // fixed priority: an earlier profile that ties wins
        profiles.map(_._1).takeWhile(_ != l)
          .map(o => col(s"s_$l") > col(s"s_$o"))
          .foldLeft(lit(true))(_ && _),
        lit(l)).otherwise(els)
    }
    when(col("s_zh") > 0, lit("zh")).otherwise(best)
  }

  /** SHARED scored-documents scan — the regex battery (per-profile
    * stopword hits, CJK count, token/punct/stopword counts, md5
    * digest) computed ONCE per (session, corpus) and persisted via
    * [[graft.Caches.shared]]; t1/t2/t5/t15 and the p1 pipeline all
    * read from it instead of each re-running the same regexes over
    * the corpus. The cache holds only the SCORES (~100 bytes/doc),
    * never `text` — at 100 TB the scored table is ~1000× smaller
    * than the corpus, so materializing it (here in memory; in
    * production as a parquet signature table next to the shingle
    * scan) is the intended deployment shape: score once, run every
    * downstream filter/mix/card/dedup pass against the scores. */
  def scoredDocs(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"scored_docs:$dir") {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(($"doc_id" +: $"source" +: $"lang" +:
          profiles.map { case (l, p) =>
            expr(s"cast(regexp_count(lower(text), '$p') as bigint)").as(s"s_$l")
          }) ++ Seq(
          expr(s"cast(regexp_count(text, '$cjkPattern') as bigint)").as("s_zh"),
          length($"text").cast("long").as("len_chars"),
          expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("n_tok"),
          expr("cast(regexp_count(text, '[.,;:!?]') as bigint)").as("n_punct"),
          expr(s"cast(regexp_count(lower(text), '$stopwordsEn') as bigint)").as("n_stop"),
          md5($"text").as("digest")): _*)
        .withColumn("lang_id", bestFromScoreCols)
        .withColumn("quality", round(
          lit(0.4) * least($"n_tok".cast("double") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - $"n_punct".cast("double") / greatest($"n_tok", lit(1))) +
          lit(0.3) * ($"n_stop".cast("double") / greatest($"n_tok", lit(1))), 6))
    }

  /** n-gram/stopword-profile language ID. Score = stopword hits per
    * profile; CJK chars trump; ties broken by fixed profile order.
    * Reads the shared [[scoredDocs]] scan. */
  def t1LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredDocs(spark, dir)
      .select(($"doc_id" +: $"lang" +:
        profiles.map(p => col(s"s_${p._1}"))) :+ $"s_zh" :+
        $"lang_id".as("predicted"): _*)
      .orderBy($"doc_id")
  }

  /** Quality scoring: length/punctuation/stopword-ratio blend.
    * Reads the shared [[scoredDocs]] scan. */
  def t2QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredDocs(spark, dir)
      .select($"doc_id", $"len_chars", $"n_tok", $"n_punct", $"n_stop", $"quality")
      .orderBy($"doc_id")
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens
    * (letter runs / digit runs / single punctuation). */
  def t3TokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("ws_tokens"),
        expr("cast(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') as bigint)").as("bpe_tokens"),
        length($"text").cast("long").as("n_chars_calc"))
      .orderBy($"doc_id")
  }

  /** Polynomial rolling-hash fingerprint (h = h*31 + code mod 1e9+7)
    * over the whole document — order-sensitive, unlike a bag hash.
    * At 100 TB you'd reach for xxhash64(text) (one codegen'd call);
    * the polynomial form is the oracle-checkable building block the
    * MinHash/SimHash operators share. */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        when(length($"text") === 0, 0L).otherwise(
          expr("aggregate(sequence(1, length(text)), cast(0 as bigint), " +
               "(h, i) -> (h*31 + ascii(substring(text, i, 1))) % 1000000007)"))
          .as("fp_poly"))
      .orderBy($"doc_id")
  }

  /** t10: unigram log-perplexity quality proxy — the model-based
    * quality tier of published pipelines (CCNet's KenLM filter),
    * re-expressed with a corpus-internal unigram LM so it needs no
    * external model: vocabulary counts in one keyed agg,
    * Laplace-smoothed token surprisal -ln((c+1)/(T+V)), per-document
    * MEAN surprisal (low = templated/common text, high = rare/noisy).
    *
    * Determinism discipline: per-token surprisal rounds to 6dp
    * BEFORE the fold (ln may differ by an ulp across engines;
    * rounding makes the summands bit-identical), and the document
    * sum runs in token order via the ordered-frame window — the same
    * replayable-fold trick c5/a3 use. Scale shape: tokenize scan →
    * one agg keyed on the token → join back on the token (AQE
    * broadcasts the Zipf-compact vocab when it fits; at 100 TB you'd
    * key both sides on xxhash64(token) so the exchange moves 8-byte
    * keys) → one keyed window on doc_id. */
  def t10UnigramLogppl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // persisted (tracked): the token explode feeds both the vocab agg
    // and the scoring join
    val tok = graft.Caches.persist(Tables.documents(spark, dir)
      .select($"doc_id",
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "w"))))
    val vocab = tok.groupBy($"w").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum($"c").cast("double").as("t"),
                        count(lit(1)).cast("double").as("v"))
    val scored = tok.join(vocab, "w").crossJoin(broadcast(tot))
      .select($"doc_id", $"pos",
        round(-log(($"c" + lit(1)).cast("double") / ($"t" + $"v")), 6).as("nll"))
    val wSum = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wFirst = Window.partitionBy($"doc_id").orderBy($"pos")
    scored
      .withColumn("s", sum($"nll").over(wSum))
      .withColumn("n", count(lit(1)).over(wSum))
      .withColumn("rn", row_number().over(wFirst))
      .filter($"rn" === 1)
      .select($"doc_id", $"n".as("n_tok"), round($"s" / $"n", 4).as("mean_nll"))
      .orderBy($"doc_id")
  }

  /** t11: language-ID CONFIDENCE — the margin every production
    * lang-ID ships next to its label (fastText's probability, CLD3's
    * is_reliable): best-profile hits vs the runner-up, normalized to
    * (best-second)/(best+second). A zh call can come back
    * low-confidence (the CJK trump rule fires on a single char even
    * when Latin profiles score higher) — that honesty is the point:
    * downstream filters drop low-confidence rows rather than trust
    * the argmax. Integer hit counts and one exact division — fully
    * engine-stable. Same single-scan shape as t1. */
  def t11LangConfidence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val langs = profiles.map(_._1) :+ "zh"
    def score(l: String): Column = col(s"s_$l")
    val base = t1LangId(spark, dir)
    val bestScore = langs.foldLeft(lit(0L)) { (els, l) =>
      when($"predicted" === l, score(l)).otherwise(els)
    }
    val secondScore = langs.foldLeft(
        greatest(langs.map(score): _*)) { (els, l) =>
      when($"predicted" === l,
           greatest(langs.filter(_ != l).map(score): _*)).otherwise(els)
    }
    base
      .withColumn("best_score", bestScore)
      .withColumn("second_score", secondScore)
      .withColumn("confidence",
        round(($"best_score" - $"second_score").cast("double") /
              greatest($"best_score" + $"second_score", lit(1L)), 6))
      .withColumn("is_reliable", $"confidence" >= 0.2 && $"best_score" >= 3)
      .select($"doc_id", $"predicted", $"best_score", $"second_score",
              $"confidence", $"is_reliable")
      .orderBy($"doc_id")
  }

  /** t12: readability scoring — Flesch reading ease and
    * Flesch-Kincaid grade with the standard regex approximations
    * (sentences = terminal-punctuation runs, words = whitespace
    * tokens, syllables = vowel-group runs in the lowercased text,
    * the floor(1) guards of every published implementation). A
    * training-data curation pass uses the grade band the same way it
    * uses t2's quality score: filter or stratify by difficulty.
    * Map-only single scan, all codegen built-ins; the three counts
    * are int64 and the two scores are derived from identical longs
    * in both engines, so 4dp rounding closes the artifact. */
  def t12Readability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nSent = greatest(
      size(regexp_extract_all($"text", lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val nWord = greatest(
      size(regexp_extract_all($"text", lit("\\S+"), lit(0))), lit(1))
      .cast("long")
    val nSyl = size(
      regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    Tables.documents(spark, dir)
      .select($"doc_id", nSent.as("n_sentences"), nWord.as("n_words"),
        nSyl.as("n_syllables"))
      .withColumn("wps", $"n_words".cast("double") / $"n_sentences")
      .withColumn("spw", $"n_syllables".cast("double") / $"n_words")
      .select($"doc_id", $"n_sentences", $"n_words", $"n_syllables",
        round(lit(206.835) - lit(1.015) * $"wps" - lit(84.6) * $"spw", 4)
          .as("flesch_ease"),
        round(lit(0.39) * $"wps" + lit(11.8) * $"spw" - lit(15.59), 4)
          .as("fk_grade"))
      .orderBy($"doc_id")
  }

  /** t13: KEYWORD EXTRACTION by tf-idf — top-5 terms per document
    * (the per-doc tag/topic signal a curation UI and a BM25 index
    * both read). One tokenize scan feeds BOTH the per-(doc, term)
    * counts and the document-frequency table (tracked persist — the
    * diamond the optimizer would otherwise scan twice); idf is a
    * vocab-sized broadcast join exactly like s1's BM25 idf table;
    * idf rounded 6dp BEFORE the multiply so both engines rank
    * identical doubles (t10's pre-rounded-surprisal rule); top-5 per
    * doc rides the TopKPerKey heap rewrite, never a per-doc sort. */
  def t13KeywordTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).cast("double").as("n_docs"))
    keywordsFrom(termCounts(spark, dir), nDocs, 5)
  }

  /** Persist-once SHARED per-(doc, term) count scan over the corpus —
    * the inverted-index core t13 ranks from; computed once per corpus
    * like the shingle/scored-docs scans (billed as its own Bench
    * line), so repeated keyword passes never re-pay the tokenize. */
  def termCounts(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"term_counts:$dir") {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", explode(
          regexp_extract_all(lower($"text"),
            lit(HybridSearch.WordTokenPattern), lit(0))).as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
    }

  /** The t13 core over any (doc_id, text) corpus (per-call tracked
    * persist — arbitrary corpora don't share the corpus scan). */
  def keywordsOf(docs: DataFrame, k: Int = 5): DataFrame = {
    import docs.sparkSession.implicits._
    val tf = graft.Caches.persist(
      docs
        .select($"doc_id", explode(
          regexp_extract_all(lower($"text"),
            lit(HybridSearch.WordTokenPattern), lit(0))).as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf")))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    keywordsFrom(tf, nDocs, k)
  }

  /** tf-idf top-k per doc from a (doc_id, term, tf) table: vocab-sized
    * broadcast idf (rounded 6dp BEFORE the multiply — t10's rule),
    * top-k per doc on the TopKPerKey heap rewrite. */
  private def keywordsFrom(tf: DataFrame, nDocs: DataFrame,
                           k: Int): DataFrame = {
    import tf.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val idf = tf.groupBy($"term")
      .agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(nDocs))
      .select($"term",
        round(log(($"n_docs" + 1.0) / ($"df" + 1.0)) + 1.0, 6).as("idf"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tfidf".desc, $"term")
    tf.join(broadcast(idf), Seq("term"))
      .select($"doc_id", $"term",
        round($"tf" * $"idf", 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"doc_id", $"rank".cast("long").as("rank"), $"term", $"tfidf")
      .orderBy($"doc_id", $"rank")
  }

  /** t14: CHARACTER-CLASS ENTROPY — the gibberish/encoded-blob
    * detector of the quality tier: natural prose mixes lowercase,
    * space, and punctuation into ~0.7-1.3 bits of 6-class entropy,
    * while single-class blobs (repeated chars, unbroken base64 or
    * minified runs) collapse toward 0. Shannon entropy over SIX character classes
    * (lower/upper/digit/space/punct/other) instead of the raw
    * alphabet: the counts are six codegen regexp passes in ONE scan —
    * no per-char explode, no shuffle — and the six -p·log2(p) terms
    * are summed in a FIXED written order so both engines fold
    * identical doubles (the t10 determinism rule, applied to a
    * 6-term sum). The low-entropy flag compares the ROUNDED value,
    * keeping the threshold engine-stable. */
  def t14CharEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cnt(pat: String): Column =
      size(regexp_extract_all($"text", lit(pat), lit(0))).cast("double")
    val total = greatest(length($"text"), lit(1)).cast("double")
    def term(c: Column): Column =
      when(c > 0.0, -(c / total) * log2(c / total)).otherwise(lit(0.0))
    val lo = cnt("[a-z]"); val up = cnt("[A-Z]"); val di = cnt("[0-9]")
    val sp = cnt("\\s"); val pu = cnt("[.,;:!?]")
    val ot = total - lo - up - di - sp - pu
    val entropy = round(
      term(lo) + term(up) + term(di) + term(sp) + term(pu) + term(ot), 6)
    Tables.documents(spark, dir)
      .select($"doc_id",
        length($"text").cast("long").as("n_chars"),
        entropy.as("entropy_bits"))
      .withColumn("is_low_entropy", $"entropy_bits" < 0.65)
      .orderBy($"doc_id")
  }

  /** t15: per-source DATASET CARD — the datasheet rollup (Gebru et
    * al.'s "Datasheets for Datasets" as a query) a corpus publishes
    * next to its bytes: per source, document/token counts, mean
    * quality, English share, and the exact-duplicate rate (1 −
    * distinct digests / docs). ONE scan computes every per-doc
    * signal (lang id, quality, tokens, md5) and one keyed aggregate
    * folds them — countDistinct on 16-byte digests is the only
    * distinct state, per source. The summary any ingestion run
    * prints before anyone trains on the data. */
  def t15DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scoredDocs(spark, dir)
      .select($"source", $"lang_id", $"quality", $"n_tok", $"digest")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tok").as("n_tokens"),
           round(avg($"quality"), 4).as("mean_quality"),
           round(avg(when($"lang_id" === "en", 1.0).otherwise(0.0)), 4)
             .as("en_share"),
           countDistinct($"digest").as("n_distinct"))
      .select($"source", $"n_docs", $"n_tokens", $"mean_quality", $"en_share",
        round(lit(1.0) - $"n_distinct".cast("double") / $"n_docs", 4)
          .as("dup_rate"))
      .orderBy($"source")
  }

  /** t19: VOCABULARY-GROWTH curve (Heaps' law empirics) — how fast
    * the distinct-word vocabulary grows as the corpus accumulates,
    * the sizing input for tokenizer vocab budgets (t17) and
    * dictionary-backed index planning. Reported by 100 corpus PREFIX
    * BUCKETS, not per document: the per-row cumulative would be a
    * global ordered cumsum (the canonical 100 TB total-order
    * bottleneck); bucketing gives the same curve with a 100-row
    * window. A word's contribution lands in the bucket of its FIRST
    * document (min doc_id — one groupBy over the token explode);
    * everything is integer counts. */
  def t19VocabGrowth(spark: SparkSession, dir: String,
                     buckets: Int = 100): DataFrame = {
    import spark.implicits._
    val docs = graft.Caches.persist(Tables.documents(spark, dir)
      .select($"doc_id",
        expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tk")))
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    val wordFirst = docs
      .select($"doc_id", explode($"tk").as("word"))
      .groupBy($"word").agg(min($"doc_id").as("first_doc"))
    val toks = docs
      .select(bucketOf("doc_id", buckets, maxId).as("bucket"),
        size($"tk").cast("long").as("n"))
      .groupBy($"bucket").agg(sum($"n").as("n_tokens"),
        count(lit(1)).as("n_docs"))
    vocabCurve(wordFirst, toks, buckets, maxId)
  }

  private def bucketOf(name: String, buckets: Int, maxId: Long) =
    expr(s"$name * $buckets div ${maxId + 1}")

  /** Shared curve tail (t19 from-scratch == t23 maintained): bucket
    * each word's first document, join the per-bucket token rollups,
    * run the 100-row cumulative window. */
  private def vocabCurve(wordFirst: DataFrame, toks: DataFrame,
                         buckets: Int, maxId: Long): DataFrame = {
    import wordFirst.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val newWords = wordFirst
      .groupBy(bucketOf("first_doc", buckets, maxId).as("bucket"))
      .agg(count(lit(1)).as("new_words"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(newWords, Seq("bucket"), "left")
      .withColumn("new_words", coalesce($"new_words", lit(0L)))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .withColumn("cum_vocab", sum($"new_words").over(w))
      .select($"bucket", $"n_docs", $"n_tokens", $"new_words",
        $"cum_tokens", $"cum_vocab")
      .orderBy($"bucket")
  }

  /** t23: INCREMENTALLY MAINTAINED vocab-growth curve — t19's curve
    * kept current by MERGING ALGEBRAIC STATE (q54's discipline
    * applied to the vocabulary dictionary): the standing state is a
    * per-word (word → first_doc) table plus per-bucket (n_tokens,
    * n_docs) rollups; a new document batch reduces to the SAME state
    * shape over only its own bytes, and the maintained view is the
    * monoid merge — first_doc under min (a word re-seen in the delta
    * keeps its earlier first sighting), token/doc counts under sum.
    * At 100 TB the nightly delta touches delta bytes plus a
    * vocabulary-sized dictionary, never the full corpus rescan t19
    * pays. The batches here split the corpus at half the id space;
    * the oracle is the FROM-SCRATCH single-pass curve — equality IS
    * the maintenance-correctness proof (q54's rule). */
  def t23VocabMaintained(spark: SparkSession, dir: String,
                         buckets: Int = 100): DataFrame = {
    import spark.implicits._
    val docs = graft.Caches.persist(Tables.documents(spark, dir)
      .select($"doc_id",
        expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tk")))
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    val cutoff = (maxId + 1) / 2
    def wordState(batch: DataFrame): DataFrame = batch
      .select($"doc_id", explode($"tk").as("word"))
      .groupBy($"word").agg(min($"doc_id").as("first_doc"))
    def bucketState(batch: DataFrame): DataFrame = batch
      .select(bucketOf("doc_id", buckets, maxId).as("bucket"),
        size($"tk").cast("long").as("n"))
      .groupBy($"bucket").agg(sum($"n").as("n_tokens"),
        count(lit(1)).as("n_docs"))
    val base = docs.filter($"doc_id" < cutoff)
    val delta = docs.filter($"doc_id" >= cutoff)
    // monoid merges: min for first sightings, sum for counts
    val wordFirst = wordState(base).unionByName(wordState(delta))
      .groupBy($"word").agg(min($"first_doc").as("first_doc"))
    val toks = bucketState(base).unionByName(bucketState(delta))
      .groupBy($"bucket").agg(sum($"n_tokens").as("n_tokens"),
        sum($"n_docs").as("n_docs"))
    vocabCurve(wordFirst, toks, buckets, maxId)
  }

  /** t24: BIGRAM log-perplexity — the CCNet/KenLM-shaped quality
    * filter the big web corpora actually ship (perplexity against a
    * corpus-trained LM separates fluent prose from gibberish better
    * than t10's unigram proxy, which is blind to word ORDER): an
    * add-one-smoothed bigram model is trained on the corpus itself
    * and every document scored by its mean per-bigram negative
    * log-likelihood. Bigrams are built IN ROW (zipped slices of the
    * token array — no positional self-join, no extra shuffle);
    * counts are two keyed aggregates; scoring is two joins against
    * the count tables; per-doc summation follows t10's determinism
    * rule — each NLL pre-rounded 6dp, then an ORDERED per-doc fold,
    * so both engines add identical doubles in identical order. */
  def t24BigramPpl(spark: SparkSession, dir: String): DataFrame =
    bigramPplOf(Tables.documents(spark, dir))

  /** The t24 core over any (doc_id, text) corpus. */
  def bigramPplOf(corpus: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    // persisted (tracked): the tokenized view feeds the unigram
    // counts, the bigram counts, and the scoring pass
    val docs = graft.Caches.persist(corpus
      .select($"doc_id",
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("tk"))
      .filter(size($"tk") >= 2))
    val big = graft.Caches.persist(docs
      .select($"doc_id", posexplode(zip_with(
        slice($"tk", lit(1), size($"tk") - 1),
        slice($"tk", lit(2), size($"tk") - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select($"doc_id", $"pos", $"col.w1".as("w1"), $"col.w2".as("w2")))
    val uni = docs.select(explode($"tk").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val vTot = uni.agg(count(lit(1)).cast("double").as("v"))
    val bg = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val scored = big
      .join(bg, Seq("w1", "w2"))
      .join(uni.select($"w".as("w1"), $"c1"), Seq("w1"))
      .crossJoin(broadcast(vTot))
      .select($"doc_id", $"pos",
        round(-log(($"c12" + 1).cast("double") / ($"c1" + $"v")), 6).as("nll"))
    val wSum = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wFirst = Window.partitionBy($"doc_id").orderBy($"pos")
    scored
      .withColumn("s", sum($"nll").over(wSum))
      .withColumn("n", count(lit(1)).over(wSum))
      .withColumn("rn", row_number().over(wFirst))
      .filter($"rn" === 1)
      .select($"doc_id", $"n".as("n_bigrams"),
        round($"s" / $"n", 4).as("mean_nll"))
      .orderBy($"doc_id")
  }

  /** t25: ZIPF rank-frequency slope per source — the corpus-health
    * regression (natural prose tracks slope ≈ −1 on the log-log
    * rank/frequency curve; machine-generated or templated text bends
    * it) used as a cheap distribution-level quality gate next to the
    * per-document tiers (t2/t9/t10). Reads the SHARED (doc, term)
    * count build (t13's inverted-index core) joined to the doc→source
    * map — the corpus text is scanned once per session, not re-
    * tokenized here. Per-source top-100 ranks via a keyed window;
    * the least-squares slope and r² are computed from FIXED-POINT
    * integer sums (ln pre-rounded to 1e-6 and scaled to int64), so
    * the aggregation is order-independent and exact — no
    * double-summation nondeterminism — and the final divisions run
    * on identical integers in both engines. */
  def t25ZipfSlope(spark: SparkSession, dir: String,
                   topRanks: Int = 100): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sourceOf = Tables.documents(spark, dir).select($"doc_id", $"source")
    val counts = termCounts(spark, dir)
      .join(sourceOf, "doc_id")
      .groupBy($"source", $"term").agg(sum($"tf").as("c"))
    val w = Window.partitionBy($"source").orderBy($"c".desc, $"term")
    val pts = counts
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topRanks)
      .select($"source",
        round(log($"rank".cast("double")) * 1e6, 0).cast("long").as("x"),
        round(log($"c".cast("double")) * 1e6, 0).cast("long").as("y"))
    val num = $"n" * $"sxy" - $"sx" * $"sy"
    val denX = $"n" * $"sxx" - $"sx" * $"sx"
    val denY = $"n" * $"syy" - $"sy" * $"sy"
    pts.groupBy($"source").agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .select($"source", $"n".as("n_ranks"),
        round(num.cast("double") / denX.cast("double"), 6).as("slope"),
        round(num.cast("double") * num.cast("double") /
          (denX.cast("double") * denY.cast("double")), 6).as("r2"))
      .orderBy($"source")
  }

  /** t20: LEXICAL DIVERSITY — type-token ratio and hapax share per
    * document, the corpus-linguistics pair that separates varied
    * prose (high TTR) from templated/repetitive text (low TTR, the
    * t7-adjacent signal) and probes vocabulary freshness (hapax =
    * words used exactly once). Counting rides one (doc, word)
    * aggregate with map-side partial counts — never a per-doc
    * quadratic HOF scan; ratios are single divisions of exact
    * integers. */
  def t20LexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"),
           count(lit(1)).as("n_types"),
           sum(when($"c" === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select($"doc_id", $"n_tokens", $"n_types", $"n_hapax",
        round($"n_types".cast("double") / $"n_tokens", 6).as("ttr"),
        round($"n_hapax".cast("double") / $"n_types", 6).as("hapax_share"))
      .orderBy($"doc_id")
  }

  /** t21: CORPUS DRIFT detection — per-source Jensen–Shannon
    * divergence between two crawl snapshots' token distributions,
    * the statistical monitor a RECURRING ingestion pipeline runs
    * before retraining on a fresh crawl ("did src7's content
    * actually change, or did we just fetch more of it?"). Snapshots
    * here are the deterministic doc_id-parity halves (the stand-in
    * for previous/current crawl; any two frames plug into the same
    * shape). JS is the right divergence for this: symmetric, finite
    * even when a token exists in only one snapshot (KL is infinite
    * there — new vocabulary would blow it up, and new vocabulary is
    * exactly what a fresh crawl brings), bounded by ln 2. Cost
    * shape: one (source, snapshot, token) keyed count with map-side
    * partials, per-source totals joined back on the source key, one
    * keyed sum — no global state, no driver loop; at 100 TB the
    * aggregate is vocabulary-sized per source, not corpus-sized. */
  def t21CorpusDrift(spark: SparkSession, dir: String,
                     threshold: Double = 0.1): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source", pmod(expr("doc_id div 50"), lit(2)).as("snap"),
        explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("w"))
    val cells = toks.groupBy($"source", $"w")
      .agg(sum(when($"snap" === 0, 1L).otherwise(0L)).as("c_old"),
           sum(when($"snap" === 1, 1L).otherwise(0L)).as("c_new"))
    val totals = cells.groupBy($"source")
      .agg(sum($"c_old").as("tok_old"), sum($"c_new").as("tok_new"),
           sum(when($"c_old" > 0, 1L).otherwise(0L)).as("vocab_old"),
           sum(when($"c_new" > 0, 1L).otherwise(0L)).as("vocab_new"))
    val contrib = cells.join(totals, "source")
      .select($"source",
        when($"tok_old" > 0, $"c_old".cast("double") / $"tok_old")
          .otherwise(0.0).as("p"),
        when($"tok_new" > 0, $"c_new".cast("double") / $"tok_new")
          .otherwise(0.0).as("q"))
      .select($"source",
        (when($"p" > 0, $"p" * log(lit(2.0) * $"p" / ($"p" + $"q"))).otherwise(0.0) +
         when($"q" > 0, $"q" * log(lit(2.0) * $"q" / ($"p" + $"q"))).otherwise(0.0))
          .as("term"))
    contrib.groupBy($"source")
      .agg(round(lit(0.5) * sum($"term"), 6).as("js_divergence"))
      .join(totals, "source")
      .select($"source", $"tok_old", $"tok_new", $"vocab_old", $"vocab_new",
        $"js_divergence", ($"js_divergence" > threshold).as("drifted"))
      .orderBy($"source")
  }

  /** t22: TOKENIZER FERTILITY by language — tokens-per-word per
    * detected language, the standard multilingual-tokenizer bias
    * report (a tokenizer that spends 2× the tokens on one language
    * halves that language's effective context and doubles its
    * serving cost — the number every multilingual training effort
    * publishes). Word counts and BPE-ish segment counts ride t3's
    * regex battery; language comes from the shared scored scan —
    * the scan cost is one already-materialized join, and the
    * aggregate is language-cardinality rows. */
  def t22TokenFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"doc_id",
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("ws_tokens"),
        expr("cast(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') as bigint)")
          .as("bpe_tokens"))
    scoredDocs(spark, dir).select($"doc_id", $"lang_id")
      .join(counts, "doc_id")
      .groupBy($"lang_id")
      .agg(count(lit(1)).as("n_docs"),
           sum($"ws_tokens").as("ws_tokens"),
           sum($"bpe_tokens").as("bpe_tokens"))
      .select($"lang_id", $"n_docs", $"ws_tokens", $"bpe_tokens",
        round($"bpe_tokens".cast("double") /
          greatest($"ws_tokens", lit(1L)), 6).as("fertility"))
      .orderBy($"lang_id")
  }

  /** t27: UNICODE NORMALIZATION + MOJIBAKE REPAIR — the two text
    * fixups every real pretraining pipeline runs before hashing or
    * tokenizing (the ftfy + NFC pass): (1) Latin-1 double-encoding
    * repair — text that was UTF-8 encoded, mis-decoded as Latin-1,
    * and re-encoded shows 'é' as the pair U+00C3 U+00A9; the
    * positional C2/C3-pair rule rewrites each pair to its decoded
    * codepoint in ONE codegen pass per row (plans/Expressions.scala
    * MojibakeRepair; the oracle replays the identical lag/lead rule
    * vectorized) — (2) NFC canonical composition, so 'e'+COMBINING
    * ACUTE and precomposed 'é' dedup and tokenize identically
    * (NfcNormalize ↔ DuckDB nfc_normalize). Pairs with f3's encoding
    * sniff: f3 classifies the byte stream, this repairs the damage a
    * mis-classification already baked in. The sf corpus is
    * ASCII-clean, so broken inputs are SYNTHESIZED deterministically
    * from doc_id (the d10 URL-variant pattern) and both engines
    * plant the same chars. Reported per doc: pairs repaired, chars
    * composed away by NFC, the flags, and the CLEANED TEXT itself —
    * the strongest cross-engine check (byte-identical strings). One
    * narrow scan, two chained per-row kernels, no shuffle before the
    * ordered dump. */
  def t27UnicodeClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    // escapes keep the planted chars exact: the mojibake prefix is
    // 'Caf\u00e9 \u00b7 na\u00efve ' after repair; the second prefix is
    // 'r\u00e9sum\u00e9 ' with DECOMPOSED accents (e + U+0301), two chars
    // shorter after NFC composes them
    val moji = "Caf\u00c3\u00a9 \u00c2\u00b7 na\u00c3\u00afve "
    val nfd = "re\u0301sume\u0301 "
    Tables.documents(spark, dir)
      .select($"doc_id",
        concat(
          when(pmod($"doc_id", lit(4)) === 0, lit(moji)).otherwise(lit("")),
          when(pmod($"doc_id", lit(5)) === 0, lit(nfd)).otherwise(lit("")),
          $"text").as("t"))
      .withColumn("repaired", expr("mojibake_repair(t)"))
      .withColumn("clean_text", expr("nfc_normalize(repaired)"))
      .select($"doc_id",
        (length($"t") - length($"repaired")).cast("long").as("n_repaired"),
        (length($"repaired") - length($"clean_text")).cast("long")
          .as("n_composed"),
        (length($"t") > length($"repaired")).as("had_mojibake"),
        length($"clean_text").cast("long").as("clean_len"),
        $"clean_text")
      .orderBy($"doc_id")
  }

  /** t29: UNICODE-SCRIPT profile — the curation router t1's n-gram
    * language ID can't replace: script counts are a DIRECT signal
    * (a "lang=en" page full of Cyrillic is mojibake or spam; a
    * mixed Latin+CJK page needs a different tokenizer), and the
    * per-script histogram is what a 100 TB curation pass buckets
    * on before any model-based language ID runs. Counts per
    * script class (Latin/Cyrillic/Han/Arabic + other letters +
    * digits) via one regex pass each; dominant script picks the
    * max with a FIXED priority tie-break (the when-chain order,
    * mirrored by the oracle's CASE order); `mixed` flags docs
    * whose non-dominant letters reach 20% (integer-exact:
    * (letters − max)·5 ≥ letters). All counts integer — the whole
    * profile replays in DuckDB. */
  def t29ScriptProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cnt(re: String): Column =
      size(regexp_extract_all($"text", lit(re), lit(0))).cast("long")
    graft.Tables.documents(spark, dir)
      .select($"doc_id",
        cnt("\\p{L}").as("letters"),
        cnt("\\p{IsLatin}").as("latin"),
        cnt("\\p{IsCyrillic}").as("cyrillic"),
        cnt("\\p{IsHan}").as("han"),
        cnt("\\p{IsArabic}").as("arabic"),
        cnt("\\p{Nd}").as("digits"))
      .withColumn("other",
        $"letters" - $"latin" - $"cyrillic" - $"han" - $"arabic")
      .withColumn("_m",
        greatest($"latin", $"cyrillic", $"han", $"arabic", $"other"))
      .withColumn("dominant",
        when($"letters" === 0L, "none")
          .when($"latin" === $"_m", "latin")
          .when($"cyrillic" === $"_m", "cyrillic")
          .when($"han" === $"_m", "han")
          .when($"arabic" === $"_m", "arabic")
          .otherwise("other"))
      .withColumn("mixed",
        $"letters" > 0L && ($"letters" - $"_m") * 5L >= $"letters")
      .drop("_m")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t29_script_profile" -> t29ScriptProfile _,
    "t27_unicode_clean" -> t27UnicodeClean _,
    "t22_token_fertility" -> t22TokenFertility _,
    "t21_corpus_drift" -> ((s, d) => t21CorpusDrift(s, d)),
    "t20_lexical_diversity" -> t20LexicalDiversity _,
    "t19_vocab_growth" -> ((s, d) => t19VocabGrowth(s, d)),
    "t23_vocab_maintained" -> ((s, d) => t23VocabMaintained(s, d)),
    "t24_bigram_ppl" -> t24BigramPpl _,
    "t25_zipf_slope" -> ((s, d) => t25ZipfSlope(s, d)),
    "t15_dataset_card" -> t15DatasetCard _,
    "t14_char_entropy" -> t14CharEntropy _,
    "t13_keyword_tfidf" -> t13KeywordTfidf _,
    "t12_readability" -> t12Readability _,
    "t11_lang_confidence" -> t11LangConfidence _,
    "t1_lang_id" -> t1LangId _,
    "t2_quality_score" -> t2QualityScore _,
    "t3_token_count" -> t3TokenCount _,
    "t4_fingerprint" -> t4Fingerprint _,
    "t5_corpus_mix" -> t5CorpusMix _,
    "t10_unigram_logppl" -> t10UnigramLogppl _)

  /** t5: corpus-mixture statistics — the per-(source, lang) inputs a
    * training-data mixing step samples from: document and token
    * counts, mean quality, and each cell's token share of the corpus
    * (the natural proportional sampling weight). One scan + one keyed
    * agg; the global token total joins back as a broadcast scalar,
    * not a partition-less window. */
  def t5CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = graft.Caches.persist(scoredDocs(spark, dir)
      .select($"source", $"lang_id", $"quality", $"n_tok")
      .groupBy($"source", $"lang_id")
      .agg(count(lit(1)).as("docs"),
           sum($"n_tok").as("tokens"),
           round(avg($"quality"), 4).as("mean_quality")))
    val total = cells.agg(sum($"tokens").as("total_tokens"))
    cells.crossJoin(broadcast(total))
      .select($"source", $"lang_id", $"docs", $"tokens", $"mean_quality",
        round($"tokens" / $"total_tokens", 6).as("mix_weight"))
      .orderBy($"source", $"lang_id")
  }

  /** SQL fragments shared by the t1/t2 oracles and the end-to-end
    * pipeline oracle (p1): per-profile score columns, the
    * fixed-priority argmax CASE arms, and the quality formula. */
  private[operators] lazy val profileColsSql: String = profiles
    .map { case (l, p) => s" len(regexp_extract_all(lower(text), '${p.replace("\\\\", "\\")}')) AS s_$l," }
    .mkString("\n")

  private[operators] lazy val zhColSql: String =
    s"len(regexp_extract_all(text, '${cjkPattern.replace("\\\\", "\\")}')) AS s_zh"

  private[operators] lazy val qualityColsSql: String =
    s""" len(regexp_extract_all(text, '\\S+')) AS n_tok,
       | len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       | len(regexp_extract_all(lower(text), '${stopwordsEn.replace("\\\\", "\\")}')) AS n_stop""".stripMargin

  // same fixed-priority argmax as the Spark side
  private[operators] lazy val bestChainSql: String =
    profiles.map(_._1).zipWithIndex.map { case (l, i) =>
      val geLater = profiles.map(_._1).filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      val gtEarlier = profiles.map(_._1).take(i).map(o => s"s_$l > s_$o")
      val cond = (Seq(s"s_$l > 0", geLater) ++ gtEarlier).mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n      ")

  private[operators] val qualityExprSql: String =
    """round(0.4 * least(CAST(n_tok AS DOUBLE)/100.0, 1.0)
      |     + 0.3 * (1.0 - CAST(n_punct AS DOUBLE)/greatest(n_tok, 1))
      |     + 0.3 * (CAST(n_stop AS DOUBLE)/greatest(n_tok, 1)), 6)""".stripMargin

  private val t21Sql: String =
    """WITH toks AS (
      |  SELECT source, (doc_id // 50) % 2 AS snap,
      |    unnest(regexp_extract_all(lower(text), '\S+')) AS w
      |  FROM documents),
      |cells AS (
      |  SELECT source, w,
      |    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
      |    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_new
      |  FROM toks GROUP BY source, w),
      |totals AS (
      |  SELECT source,
      |    CAST(sum(c_old) AS BIGINT) AS tok_old,
      |    CAST(sum(c_new) AS BIGINT) AS tok_new,
      |    CAST(sum(CASE WHEN c_old > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_old,
      |    CAST(sum(CASE WHEN c_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new
      |  FROM cells GROUP BY source),
      |contrib AS (
      |  SELECT cells.source,
      |    CASE WHEN tok_old > 0 THEN CAST(c_old AS DOUBLE) / tok_old ELSE 0.0 END AS p,
      |    CASE WHEN tok_new > 0 THEN CAST(c_new AS DOUBLE) / tok_new ELSE 0.0 END AS q
      |  FROM cells JOIN totals ON cells.source = totals.source),
      |js AS (
      |  SELECT source, round(0.5 * sum(
      |    CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END +
      |    CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END), 6) AS js_divergence
      |  FROM contrib GROUP BY source)
      |SELECT js.source, tok_old, tok_new, vocab_old, vocab_new,
      |  js_divergence, (js_divergence > 0.1) AS drifted
      |FROM js JOIN totals ON js.source = totals.source
      |ORDER BY js.source""".stripMargin

  val oracles: Map[String, String] = {
    val profileCols = profileColsSql
    val bestChain = bestChainSql
    val langs = profiles.map(_._1) :+ "zh"
    val bestScoreSql = langs
      .map(l => s"WHEN predicted = '$l' THEN s_$l").mkString("\n      ")
    val secondScoreSql = langs
      .map(l => s"WHEN predicted = '$l' THEN greatest(${langs.filter(_ != l).map("s_" + _).mkString(", ")})")
      .mkString("\n      ")
    val allGreatest = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val m = Map(
      // same regex script classes (RE2 spells them \p{Latin}, java
      // \p{IsLatin}), same greatest + fixed CASE-order tie-break,
      // same integer 20% mixed rule
      "t29_script_profile" ->
        """WITH c AS (
          |  SELECT doc_id,
          |    CAST(len(regexp_extract_all(text, '\p{L}')) AS BIGINT) AS letters,
          |    CAST(len(regexp_extract_all(text, '\p{Latin}')) AS BIGINT) AS latin,
          |    CAST(len(regexp_extract_all(text, '\p{Cyrillic}')) AS BIGINT) AS cyrillic,
          |    CAST(len(regexp_extract_all(text, '\p{Han}')) AS BIGINT) AS han,
          |    CAST(len(regexp_extract_all(text, '\p{Arabic}')) AS BIGINT) AS arabic,
          |    CAST(len(regexp_extract_all(text, '\p{Nd}')) AS BIGINT) AS digits
          |  FROM documents),
          |o AS (
          |  SELECT *, letters - latin - cyrillic - han - arabic AS other,
          |    greatest(latin, cyrillic, han, arabic,
          |      letters - latin - cyrillic - han - arabic) AS m
          |  FROM c)
          |SELECT doc_id, letters, latin, cyrillic, han, arabic, digits, other,
          |  CASE WHEN letters = 0 THEN 'none'
          |       WHEN latin = m THEN 'latin'
          |       WHEN cyrillic = m THEN 'cyrillic'
          |       WHEN han = m THEN 'han'
          |       WHEN arabic = m THEN 'arabic'
          |       ELSE 'other' END AS dominant,
          |  letters > 0 AND (letters - m) * 5 >= letters AS mixed
          |FROM o
          |ORDER BY doc_id""".stripMargin,
      // same planted bytes, same positional C2/C3 lag/lead repair
      // rule (vectorized: per-char explode + one doc-keyed window),
      // same NFC composition — the cleaned strings must match
      // byte-for-byte
      "t27_unicode_clean" ->
        """WITH planted AS (
          |  SELECT doc_id,
          |    (CASE WHEN doc_id % 4 = 0
          |       THEN 'Caf' || chr(195) || chr(169) || ' ' || chr(194) ||
          |         chr(183) || ' na' || chr(195) || chr(175) || 've '
          |       ELSE '' END) ||
          |    (CASE WHEN doc_id % 5 = 0
          |       THEN 're' || chr(769) || 'sume' || chr(769) || ' '
          |       ELSE '' END) || text AS t
          |  FROM documents),
          |cps AS (
          |  SELECT doc_id,
          |    generate_subscripts(str_split(t, ''), 1) AS i,
          |    unnest(str_split(t, '')) AS ch
          |  FROM planted),
          |marked AS (
          |  SELECT doc_id, i, ch, unicode(ch) AS cp,
          |    (unicode(ch) IN (194, 195)
          |      AND lead(unicode(ch)) OVER w BETWEEN 128 AND 191) AS pfx,
          |    (unicode(ch) BETWEEN 128 AND 191
          |      AND lag(unicode(ch)) OVER w IN (194, 195)) AS cont,
          |    lag(unicode(ch)) OVER w AS prev_cp
          |  FROM cps
          |  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
          |rep AS (
          |  SELECT doc_id,
          |    string_agg(CASE WHEN pfx THEN ''
          |      WHEN cont THEN
          |        chr(cp + CASE WHEN prev_cp = 195 THEN 64 ELSE 0 END)
          |      ELSE ch END, '' ORDER BY i) AS repaired
          |  FROM marked GROUP BY doc_id),
          |o AS (
          |  SELECT p.doc_id, p.t, r.repaired,
          |    nfc_normalize(r.repaired) AS clean_text
          |  FROM planted p JOIN rep r USING (doc_id))
          |SELECT doc_id,
          |  CAST(length(t) - length(repaired) AS BIGINT) AS n_repaired,
          |  CAST(length(repaired) - length(clean_text) AS BIGINT)
          |    AS n_composed,
          |  length(t) > length(repaired) AS had_mojibake,
          |  CAST(length(clean_text) AS BIGINT) AS clean_len,
          |  clean_text
          |FROM o ORDER BY doc_id""".stripMargin,
      // same (doc, word) counts, same integer ratios
      // same lang argmax, same regex token counts, same ratio
      "t22_token_fertility" ->
        s"""WITH base AS (
           |  SELECT doc_id,
           |$profileColsSql
           |   $zhColSql,
           |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
           |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
           |  FROM documents),
           |lng AS (
           |  SELECT doc_id, ws_tokens, bpe_tokens,
           |    CASE WHEN s_zh > 0 THEN 'zh'
           |      $bestChainSql
           |      ELSE 'unknown' END AS lang_id
           |  FROM base)
           |SELECT lang_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
           |  CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens,
           |  round(CAST(sum(bpe_tokens) AS DOUBLE)
           |    / greatest(sum(ws_tokens), 1), 6) AS fertility
           |FROM lng GROUP BY lang_id
           |ORDER BY lang_id""".stripMargin,
      // same parity snapshots, same keyed counts, same JS fold
      "t21_corpus_drift" -> t21Sql,
      "t20_lexical_diversity" ->
        """WITH c AS (
          |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
          |  FROM (SELECT doc_id,
          |          unnest(regexp_extract_all(lower(text), '\S+')) AS w
          |        FROM documents)
          |  GROUP BY doc_id, w)
          |SELECT doc_id,
          |  CAST(sum(c) AS BIGINT) AS n_tokens,
          |  CAST(count(*) AS BIGINT) AS n_types,
          |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
          |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
          |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          |    / count(*), 6) AS hapax_share
          |FROM c GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin,
      // same prefix buckets keyed on each word's first document,
      // integer counts end to end
      "t19_vocab_growth" ->
        """WITH docs AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk
          |  FROM documents),
          |mx AS (SELECT max(doc_id) + 1 AS m FROM docs),
          |nw AS (
          |  SELECT CAST(first_doc * 100 // m AS BIGINT) AS bucket,
          |    CAST(count(*) AS BIGINT) AS new_words
          |  FROM (SELECT w, min(doc_id) AS first_doc
          |        FROM (SELECT doc_id, unnest(tk) AS w FROM docs)
          |        GROUP BY w), mx
          |  GROUP BY bucket),
          |tks AS (
          |  SELECT CAST(doc_id * 100 // m AS BIGINT) AS bucket,
          |    CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
          |    CAST(count(*) AS BIGINT) AS n_docs
          |  FROM docs, mx GROUP BY bucket)
          |SELECT t.bucket, n_docs, n_tokens,
          |  CAST(coalesce(new_words, 0) AS BIGINT) AS new_words,
          |  CAST(sum(n_tokens) OVER (ORDER BY t.bucket) AS BIGINT)
          |    AS cum_tokens,
          |  CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
          |    AS cum_vocab
          |FROM tks t LEFT JOIN nw ON t.bucket = nw.bucket
          |ORDER BY t.bucket""".stripMargin,
      // same six class counts, same fixed-order -p·log2(p) sum
      "t14_char_entropy" ->
        """WITH c AS (
          |  SELECT doc_id,
          |    CAST(length(text) AS BIGINT) AS n_chars,
          |    CAST(greatest(length(text), 1) AS DOUBLE) AS total,
          |    CAST(len(regexp_extract_all(text, '[a-z]')) AS DOUBLE) AS lo,
          |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS up,
          |    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS di,
          |    CAST(len(regexp_extract_all(text, '\s')) AS DOUBLE) AS sp,
          |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS pu
          |  FROM documents),
          |e AS (
          |  SELECT doc_id, n_chars,
          |    round(
          |      (CASE WHEN lo > 0 THEN -(lo/total)*log2(lo/total) ELSE 0 END)
          |    + (CASE WHEN up > 0 THEN -(up/total)*log2(up/total) ELSE 0 END)
          |    + (CASE WHEN di > 0 THEN -(di/total)*log2(di/total) ELSE 0 END)
          |    + (CASE WHEN sp > 0 THEN -(sp/total)*log2(sp/total) ELSE 0 END)
          |    + (CASE WHEN pu > 0 THEN -(pu/total)*log2(pu/total) ELSE 0 END)
          |    + (CASE WHEN total - lo - up - di - sp - pu > 0
          |         THEN -((total-lo-up-di-sp-pu)/total)
          |              *log2((total-lo-up-di-sp-pu)/total) ELSE 0 END), 6)
          |      AS entropy_bits
          |  FROM c)
          |SELECT doc_id, n_chars, entropy_bits,
          |  entropy_bits < 0.65 AS is_low_entropy
          |FROM e
          |ORDER BY doc_id""".stripMargin,
      // same tokenizer, same smoothed idf (pre-rounded 6dp), same
      // rank tie-break
      "t13_keyword_tfidf" ->
        """WITH docs AS (
          |  SELECT doc_id,
          |    regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS tok
          |  FROM documents),
          |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
          |tf AS (
          |  SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
          |  FROM (SELECT doc_id, unnest(tok) AS token FROM docs)
          |  GROUP BY 1, 2),
          |idf AS (
          |  SELECT term,
          |    round(ln((n_docs + 1.0) / (CAST(count(*) AS DOUBLE) + 1.0)) + 1.0, 6) AS idf
          |  FROM tf, n GROUP BY term, n_docs),
          |sc AS (
          |  SELECT doc_id, term, round(tf * idf, 6) AS tfidf
          |  FROM tf JOIN idf USING (term)),
          |rk AS (
          |  SELECT doc_id, term, tfidf,
          |    CAST(row_number() OVER (PARTITION BY doc_id
          |      ORDER BY tfidf DESC, term) AS BIGINT) AS rank
          |  FROM sc)
          |SELECT doc_id, rank, term, tfidf FROM rk
          |WHERE rank <= 5
          |ORDER BY doc_id, rank""".stripMargin,
      "t12_readability" ->
        """WITH c AS (
          |  SELECT doc_id,
          |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
          |    greatest(len(regexp_extract_all(text, '\S+')), 1) AS n_words,
          |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(n_sentences AS BIGINT) AS n_sentences,
          |  CAST(n_words AS BIGINT) AS n_words,
          |  CAST(n_syllables AS BIGINT) AS n_syllables,
          |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
          |        - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
          |    AS flesch_ease,
          |  round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
          |        + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
          |    AS fk_grade
          |FROM c
          |ORDER BY doc_id""".stripMargin,
      "t11_lang_confidence" ->
        s"""WITH scored AS (
           |  SELECT doc_id,
           |$profileCols
           |   ${zhColSql}
           |  FROM documents),
           |labeled AS (
           |  SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
           |    CASE WHEN s_zh > 0 THEN 'zh'
           |      $bestChain
           |      ELSE 'unknown' END AS predicted
           |  FROM scored),
           |m AS (
           |  SELECT doc_id, predicted,
           |    CAST(CASE $bestScoreSql ELSE 0 END AS BIGINT) AS best_score,
           |    CAST(CASE $secondScoreSql ELSE $allGreatest END AS BIGINT) AS second_score
           |  FROM labeled)
           |SELECT doc_id, predicted, best_score, second_score,
           |  round(CAST(best_score - second_score AS DOUBLE)
           |      / greatest(best_score + second_score, 1), 6) AS confidence,
           |  (round(CAST(best_score - second_score AS DOUBLE)
           |      / greatest(best_score + second_score, 1), 6) >= 0.2
           |   AND best_score >= 3) AS is_reliable
           |FROM m
           |ORDER BY doc_id""".stripMargin,
      "t1_lang_id" ->
        s"""SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
           | CASE WHEN s_zh > 0 THEN 'zh'
           |      $bestChain
           |      ELSE 'unknown' END AS predicted
           |FROM (
           |  SELECT doc_id, lang,
           |$profileCols
           |   len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS s_zh
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin,
      "t2_quality_score" ->
        """SELECT doc_id, len_chars, n_tok, n_punct, n_stop,
          | round(0.4 * least(CAST(n_tok AS DOUBLE)/100.0, 1.0)
          |     + 0.3 * (1.0 - CAST(n_punct AS DOUBLE)/greatest(n_tok, 1))
          |     + 0.3 * (CAST(n_stop AS DOUBLE)/greatest(n_tok, 1)), 6) AS quality
          |FROM (
          |  SELECT doc_id, length(text) AS len_chars,
          |   len(regexp_extract_all(text, '\S+')) AS n_tok,
          |   len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
          |   len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
          |  FROM documents)
          |ORDER BY doc_id""".stripMargin,
      "t3_token_count" ->
        """SELECT doc_id,
          | len(regexp_extract_all(text, '\S+')) AS ws_tokens,
          | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
          | length(text) AS n_chars_calc
          |FROM documents
          |ORDER BY doc_id""".stripMargin,
      // same one-scan signals, same per-source fold
      "t15_dataset_card" ->
        s"""WITH base AS (
           |  SELECT doc_id, source, text,
           |$profileCols
           |   ${zhColSql},
           |$qualityColsSql
           |  FROM documents),
           |scored AS (
           |  SELECT source,
           |    CASE WHEN s_zh > 0 THEN 'zh'
           |      $bestChain
           |      ELSE 'unknown' END AS lang_id,
           |    $qualityExprSql AS quality,
           |    CAST(n_tok AS BIGINT) AS n_tok,
           |    md5(text) AS digest
           |  FROM base)
           |SELECT source,
           |  count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  round(avg(quality), 4) AS mean_quality,
           |  round(avg(CASE WHEN lang_id = 'en' THEN 1.0 ELSE 0.0 END), 4)
           |    AS en_share,
           |  round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 4)
           |    AS dup_rate
           |FROM scored
           |GROUP BY source
           |ORDER BY source""".stripMargin,
      "t5_corpus_mix" ->
        s"""WITH base AS (
           |  SELECT doc_id, source, text,
           |$profileCols
           |   ${zhColSql},
           |$qualityColsSql
           |  FROM documents),
           |scored AS (
           |  SELECT source,
           |    CASE WHEN s_zh > 0 THEN 'zh'
           |      $bestChain
           |      ELSE 'unknown' END AS lang_id,
           |    $qualityExprSql AS quality,
           |    CAST(n_tok AS BIGINT) AS n_tok
           |  FROM base),
           |cells AS (
           |  SELECT source, lang_id, count(*) AS docs,
           |    CAST(sum(n_tok) AS BIGINT) AS tokens,
           |    round(avg(quality), 4) AS mean_quality
           |  FROM scored GROUP BY source, lang_id)
           |SELECT source, lang_id, docs, tokens, mean_quality,
           |  round(CAST(tokens AS DOUBLE)
           |    / (SELECT CAST(sum(tokens) AS DOUBLE) FROM cells), 6) AS mix_weight
           |FROM cells
           |ORDER BY source, lang_id""".stripMargin,
      // same top-100 ranks, same 1e-6 fixed-point ln quantization,
      // same exact integer sums feeding the closed-form regression
      "t25_zipf_slope" ->
        """WITH tok AS (
          |  SELECT source,
          |    unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS term
          |  FROM documents),
          |cnt AS (
          |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
          |  FROM tok GROUP BY 1, 2),
          |rk AS (
          |  SELECT source, c,
          |    CAST(row_number() OVER (PARTITION BY source
          |      ORDER BY c DESC, term) AS BIGINT) AS rank
          |  FROM cnt),
          |pts AS (
          |  SELECT source,
          |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x,
          |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT) AS y
          |  FROM rk WHERE rank <= 100),
          |ag AS (
          |  SELECT source, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x * y) AS BIGINT) AS sxy,
          |    CAST(sum(x * x) AS BIGINT) AS sxx,
          |    CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM pts GROUP BY source)
          |SELECT source, n AS n_ranks,
          |  round(CAST(n * sxy - sx * sy AS DOUBLE)
          |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
          |  round(CAST(n * sxy - sx * sy AS DOUBLE)
          |      * CAST(n * sxy - sx * sy AS DOUBLE)
          |    / (CAST(n * sxx - sx * sx AS DOUBLE)
          |      * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
          |FROM ag
          |ORDER BY source""".stripMargin,
      // same add-one bigram model, same 6dp pre-rounded NLLs, same
      // ordered per-doc fold (t10's determinism rule)
      "t24_bigram_ppl" ->
        """WITH tk AS (
          |  SELECT doc_id, tks FROM (
          |    SELECT doc_id,
          |      regexp_extract_all(lower(text), '[a-z0-9]+') AS tks
          |    FROM documents)
          |  WHERE len(tks) >= 2),
          |big AS (
          |  SELECT doc_id, g.i - 1 AS pos, tks[g.i] AS w1, tks[g.i + 1] AS w2
          |  FROM tk, LATERAL unnest(generate_series(1, len(tks) - 1)) AS g(i)),
          |uni AS (
          |  SELECT w, count(*) AS c1 FROM (
          |    SELECT unnest(tks) AS w FROM tk) GROUP BY w),
          |vt AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
          |bg AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
          |scored AS (
          |  SELECT big.doc_id, big.pos,
          |    round(-ln(CAST(bg.c12 + 1 AS DOUBLE) / (uni.c1 + vt.v)), 6) AS nll
          |  FROM big
          |  JOIN bg ON bg.w1 = big.w1 AND bg.w2 = big.w2
          |  JOIN uni ON uni.w = big.w1, vt)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list(nll ORDER BY pos)), (a, x) -> a + x) / count(*), 4)
          |    AS mean_nll
          |FROM scored
          |GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin,
      "t10_unigram_logppl" ->
        """WITH tk AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tks
          |  FROM documents),
          |tok AS (
          |  SELECT doc_id, g.i - 1 AS pos, tks[g.i] AS w
          |  FROM tk, LATERAL unnest(generate_series(1, len(tks))) AS g(i)),
          |vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
          |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t, CAST(count(*) AS DOUBLE) AS v
          |        FROM vocab),
          |scored AS (
          |  SELECT tok.doc_id, tok.pos,
          |    round(-ln(CAST(vocab.c + 1 AS DOUBLE) / (tot.t + tot.v)), 6) AS nll
          |  FROM tok JOIN vocab ON vocab.w = tok.w, tot)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
          |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list(nll ORDER BY pos)), (a, x) -> a + x) / count(*), 4) AS mean_nll
          |FROM scored
          |GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin,
      "t4_fingerprint" ->
        """SELECT doc_id,
          | CASE WHEN length(text) = 0 THEN 0
          |      ELSE list_reduce(
          |        list_prepend(CAST(0 AS BIGINT),
          |          list_transform(generate_series(1, length(text)),
          |            i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))),
          |        (h, c) -> (h*31 + c) % 1000000007)
          | END AS fp_poly
          |FROM documents
          |ORDER BY doc_id""".stripMargin)
    // t23's oracle IS t19's from-scratch single-pass curve: the
    // maintained state merge must land on the identical result
    // (q54's maintenance-correctness rule).
    m + ("t23_vocab_maintained" -> m("t19_vocab_growth"))
  }
}
