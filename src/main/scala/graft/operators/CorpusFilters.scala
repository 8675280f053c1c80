package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-cleaning filters (SURVEY.md §2.F extension) — the
  * document-level cleaning passes every published LLM pretraining
  * pipeline runs between crawl and dedup, re-expressed as single-scan
  * codegen column plans over a synthesized page corpus:
  *
  *  - t6: C4-style line/document rules (Raffel et al. 2020, §2.2 —
  *    keep lines ending in terminal punctuation with ≥5 words; drop
  *    pages with <3 sentences, "lorem ipsum", or curly braces);
  *  - t7: Gopher repetition signals (Rae et al. 2021, A1.1 —
  *    duplicate-line fraction, duplicate-line character fraction,
  *    top-word coverage) with flag thresholds;
  *  - t8: PII redaction (email / NANP phone / IPv4 regex scrub with
  *    typed sentinels + per-class counts).
  *
  * The raw `documents` table is single-line word-soup, so — like
  * c11's sitemap corpus — a deterministic multi-line "web page" is
  * synthesized per document (boilerplate menu line, conditional
  * duplicate-subscribe lines, conditional contact/PII line,
  * conditional lorem-ipsum and code lines, the document text as the
  * body tail), and DuckDB rebuilds the identical pages for the
  * oracle compare.
  *
  * Scale design: every operator here is one narrow projection — no
  * shuffle, no UDF, whole-stage codegen end to end; per-document
  * work is bounded by page size (t7's line-dup and top-word passes
  * are O(lines² + tokens·distinct) WITHIN a row — for pathological
  * multi-MB documents you'd explode lines to a keyed agg instead;
  * crawl pages are KBs). At 100 TB these run as map-only passes over
  * parquet splits, composing with d1-d5/p1 downstream.
  */
object CorpusFilters {

  // PII patterns — written to mean the same thing in java.util.regex
  // (Spark) and RE2 (DuckDB): ASCII classes, \b word boundaries, no
  // backrefs/lookarounds.
  private[graft] val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val PhonePat = """\b\d{3}[-.]\d{3}[-.]\d{4}\b"""
  private[graft] val IpPat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** C4 line-keep rule: ends in terminal punctuation AND ≥5 words. */
  private val LineEndPat = "[.!?\"]$"

  /** The synthesized page for one document — the Spark twin of
    * [[pagesSql]]; every conditional line keys on doc_id so DuckDB
    * rebuilds byte-identical pages. */
  private def pageCol(docId: Column, text: Column): Column = {
    val id = docId.cast("string")
    concat_ws("\n",
      concat(lit("Intro line for document "), id,
             lit(" explains the topic clearly.")),
      lit("Menu Home About"),
      when(pmod(docId, lit(3)) === 0, lit("Subscribe to our newsletter today!"))
        .otherwise(lit("A perfectly fine sentence appears right here.")),
      when(pmod(docId, lit(3)) === 0, lit("Subscribe to our newsletter today!"))
        .otherwise(concat(lit("Another unique body sentence for doc "), id, lit("."))),
      when(pmod(docId, lit(4)) === 0,
          concat(lit("Contact user"), id,
                 lit("@example.com or 555-123-4567 from 10.0.0."),
                 pmod(docId, lit(256)).cast("string"), lit(" today.")))
        .otherwise(lit("No contact details in this line, sadly.")),
      when(pmod(docId, lit(17)) === 0, lit("lorem ipsum dolor sit amet."))
        .otherwise(lit("Closing remarks conclude the document nicely.")),
      when(pmod(docId, lit(13)) === 5, lit("if (x) { return y; }"))
        .otherwise(lit("Trailing short line")),
      concat(substring(text, 1, 120), lit(" ends here.")))
  }

  private[operators] def pages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", pageCol($"doc_id", $"text").as("page"))
  }

  /** The DuckDB twin of [[pageCol]], as a `pages(doc_id, page)` CTE. */
  private[operators] val pagesSql: String =
    """pages AS (
      |  SELECT doc_id,
      |    'Intro line for document ' || doc_id || ' explains the topic clearly.'
      |    || chr(10) || 'Menu Home About'
      |    || chr(10) || CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter today!'
      |                       ELSE 'A perfectly fine sentence appears right here.' END
      |    || chr(10) || CASE WHEN doc_id % 3 = 0 THEN 'Subscribe to our newsletter today!'
      |                       ELSE 'Another unique body sentence for doc ' || doc_id || '.' END
      |    || chr(10) || CASE WHEN doc_id % 4 = 0
      |                       THEN 'Contact user' || doc_id || '@example.com or 555-123-4567 from 10.0.0.' || (doc_id % 256) || ' today.'
      |                       ELSE 'No contact details in this line, sadly.' END
      |    || chr(10) || CASE WHEN doc_id % 17 = 0 THEN 'lorem ipsum dolor sit amet.'
      |                       ELSE 'Closing remarks conclude the document nicely.' END
      |    || chr(10) || CASE WHEN doc_id % 13 = 5 THEN 'if (x) { return y; }'
      |                       ELSE 'Trailing short line' END
      |    || chr(10) || substring(text, 1, 120) || ' ends here.' AS page
      |  FROM documents)""".stripMargin

  /** t6: C4-style cleaning. Line rule: keep lines ending in terminal
    * punctuation with ≥5 whitespace tokens; document rule: drop pages
    * with <3 sentence marks in the cleaned text, a "lorem ipsum"
    * occurrence, or a curly brace. Emits the rule inputs plus the
    * cleaned text's md5 so the oracle checks the actual line edit. */
  def t6C4Filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pages(spark, dir)
      .select($"doc_id", $"page",
        filter(split($"page", "\n"), l =>
          l.rlike(LineEndPat) &&
            size(regexp_extract_all(l, lit("""\S+"""), lit(0))) >= 5)
          .as("kept_lines"))
      .select($"doc_id",
        size(split($"page", "\n")).cast("long").as("n_lines"),
        size($"kept_lines").cast("long").as("n_kept"),
        size(regexp_extract_all(concat_ws("\n", $"kept_lines"),
          lit("[.!?]"), lit(0))).cast("long").as("n_sentences"),
        lower($"page").contains("lorem ipsum").as("has_lorem"),
        $"page".contains("{").as("has_brace"),
        md5(concat_ws("\n", $"kept_lines")).as("cleaned_md5"))
      .withColumn("doc_kept",
        $"n_sentences" >= 3 && !$"has_lorem" && !$"has_brace")
      .orderBy($"doc_id")
  }

  /** t7: Gopher repetition signals. All three fractions are computed
    * within the row (page-bounded), rounded to 6dp, and compared to
    * the flag thresholds on the rounded values so Spark and DuckDB
    * agree bit for bit. */
  def t7GopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chars = (arr: Column) =>
      aggregate(arr, lit(0L), (a, l) => a + length(l))
    pages(spark, dir)
      .select($"doc_id",
        split($"page", "\n").as("lines"),
        regexp_extract_all(lower($"page"), lit("[a-z0-9]+"), lit(0)).as("tok"))
      .select($"doc_id",
        size($"lines").cast("long").as("n_lines"),
        round((size($"lines") - size(array_distinct($"lines")))
          .cast("double") / size($"lines"), 6).as("dup_line_frac"),
        round(chars(filter($"lines", l =>
            size(filter($"lines", x => x === l)) > 1)).cast("double")
          / chars($"lines"), 6).as("dup_char_frac"),
        round(array_max(transform(array_distinct($"tok"), d =>
            size(filter($"tok", t => t === d)))).cast("double")
          / size($"tok"), 6).as("top_word_frac"))
      .withColumn("flagged",
        $"dup_line_frac" > 0.1 || $"top_word_frac" > 0.08)
      .orderBy($"doc_id")
  }

  /** t8: PII redaction — count and scrub emails, NANP phone numbers,
    * and IPv4 addresses with typed sentinels. Email is replaced
    * first so its dotted domain can't collide with the IPv4 pass;
    * the sentinels themselves contain no digits, so replacement
    * order can't manufacture new matches. */
  def t8PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pages(spark, dir)
      .select($"doc_id",
        size(regexp_extract_all($"page", lit(EmailPat), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all($"page", lit(PhonePat), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all($"page", lit(IpPat), lit(0)))
          .cast("long").as("n_ip"),
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace($"page", lit(EmailPat), lit("<EMAIL>")),
              lit(PhonePat), lit("<PHONE>")),
            lit(IpPat), lit("<IP>"))).as("redacted_md5"))
      .orderBy($"doc_id")
  }

  /** Gopher quality-rule stopword set (Rae et al. 2021, A1.1: a page
    * must contain at least two of these to pass the "stop word"
    * filter). Shared between the Spark plan and the oracle SQL. */
  private[graft] val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** t9: the full GOPHER QUALITY rule set (Rae et al. 2021, A1.1) —
    * the document-level filters t7's repetition signals sit next to
    * in the published pipeline:
    *
    *  - word count within [50, 100k];
    *  - mean word length within [3, 10];
    *  - symbol-to-word ratio (# or ellipsis) ≤ 0.1;
    *  - ≤10% of lines start with a bullet, ≤30% end with an ellipsis;
    *  - ≥80% of words contain an alphabetic character;
    *  - at least 2 of the 8 "stop words" present.
    *
    * Every signal is emitted alongside the verdict so downstream
    * sampling can re-threshold without a rescan. Single-scan,
    * shuffle-free, whole-stage codegen; fractions round to 6dp on
    * both sides so the flags compare on identical doubles. */
  def t9GopherQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stopHits = GopherStops.map(s =>
      when(lower($"page").rlike("\\b" + s + "\\b"), 1).otherwise(0))
      .reduce(_ + _)
    pages(spark, dir)
      .select($"doc_id", $"page",
        split($"page", "\n").as("lines"),
        regexp_extract_all($"page", lit("""\S+"""), lit(0)).as("words"))
      .select($"doc_id",
        size($"words").cast("long").as("n_words"),
        round(aggregate($"words", lit(0L), (a, w) => a + length(w))
          .cast("double") / size($"words"), 6).as("mean_word_len"),
        round(size(regexp_extract_all($"page", lit("""#|\.\.\."""), lit(0)))
          .cast("double") / size($"words"), 6).as("symbol_ratio"),
        round(size(filter($"lines", l => l.rlike("""^\s*[-*•]""")))
          .cast("double") / size($"lines"), 6).as("bullet_line_frac"),
        round(size(filter($"lines", l => l.rlike("""\.\.\.$""")))
          .cast("double") / size($"lines"), 6).as("ellipsis_line_frac"),
        round(size(filter($"words", w => w.rlike("[A-Za-z]")))
          .cast("double") / size($"words"), 6).as("alpha_word_frac"),
        stopHits.cast("long").as("n_stop_present"))
      .withColumn("quality_kept",
        $"n_words" >= 50 && $"n_words" <= 100000 &&
        $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
        $"symbol_ratio" <= 0.1 &&
        $"bullet_line_frac" <= 0.1 && $"ellipsis_line_frac" <= 0.3 &&
        $"alpha_word_frac" >= 0.8 && $"n_stop_present" >= 2)
      .orderBy($"doc_id")
  }

  /** t28: INTRA-document repetition STRIP — the remedy for what t7
    * only measures: repeated lines WITHIN one page (nav bars,
    * cookie banners, templated calls-to-action stamped several
    * times into a single crawled page) are dropped, keeping the
    * FIRST occurrence in place; empty lines always survive, so
    * paragraph spacing is untouched. Unlike d6 (which dedups lines
    * ACROSS the corpus and needs a line-keyed exchange), the
    * repetition test here is per row: first-occurrence-wins is
    * `array_position(lines, l) = i+1` inside one columnar HOF over
    * the split array — ZERO shuffle, no window, embarrassingly
    * parallel at any scale; the ≤lines² comparisons per row are
    * bounded by page height, not corpus size. The oracle runs the
    * identical indexed list_filter (list_position is 1-based where
    * Spark's lambda index is 0-based — the +1 keeps them aligned).
    * Emits the rule inputs plus the CLEANED PAGE text itself, so the
    * hash gate checks the actual edit. */
  def t28RepetitionStrip(spark: SparkSession, dir: String): DataFrame =
    repetitionStripOf(pages(spark, dir))

  /** The t28 core over any (doc_id, page) frame. */
  def repetitionStripOf(pagesDf: DataFrame): DataFrame = {
    import pagesDf.sparkSession.implicits._
    pagesDf
      .select($"doc_id", split($"page", "\n").as("lns"))
      .select($"doc_id",
        size($"lns").cast("long").as("n_lines"),
        expr("filter(lns, (l, i) -> l = '' OR array_position(lns, l) = i + 1)")
          .as("kept"))
      .select($"doc_id", $"n_lines",
        ($"n_lines" - size($"kept")).cast("long").as("n_dropped"),
        concat_ws("\n", $"kept").as("clean_page"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t28_repetition_strip" -> t28RepetitionStrip _,
    "t6_c4_filter" -> t6C4Filter _,
    "t7_gopher_repetition" -> t7GopherRepetition _,
    "t8_pii_redact" -> t8PiiRedact _,
    "t9_gopher_quality" -> t9GopherQuality _)

  // NOTE: pagesSql is already margin-stripped — concatenate, never
  // interpolate it into another stripMargin literal (the second
  // stripMargin pass would eat one pipe of every leading '||').
  val oracles: Map[String, String] = Map(
    // the identical indexed first-occurrence filter (list_position
    // is 1-based where Spark's lambda index is 0-based)
    "t28_repetition_strip" ->
      (s"WITH $pagesSql,\n" +
      s"""l AS (SELECT doc_id, string_split(page, chr(10)) AS lns FROM pages),
         |k AS (
         |  SELECT doc_id, lns,
         |    list_filter(lns, (x, i) -> x = '' OR list_position(lns, x) = i)
         |      AS kept
         |  FROM l)
         |SELECT doc_id,
         |  CAST(len(lns) AS BIGINT) AS n_lines,
         |  CAST(len(lns) - len(kept) AS BIGINT) AS n_dropped,
         |  array_to_string(kept, chr(10)) AS clean_page
         |FROM k ORDER BY doc_id""".stripMargin),
    "t6_c4_filter" ->
      (s"WITH $pagesSql,\n" +
      s"""kept AS (
         |  SELECT doc_id, page,
         |    list_filter(string_split(page, chr(10)), l ->
         |      regexp_matches(l, '[.!?"]$$')
         |      AND len(regexp_extract_all(l, '\\S+')) >= 5) AS kept_lines
         |  FROM pages),
         |cols AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(page, chr(10))) AS BIGINT) AS n_lines,
         |    CAST(len(kept_lines) AS BIGINT) AS n_kept,
         |    CAST(len(regexp_extract_all(
         |      array_to_string(kept_lines, chr(10)), '[.!?]')) AS BIGINT) AS n_sentences,
         |    contains(lower(page), 'lorem ipsum') AS has_lorem,
         |    contains(page, '{') AS has_brace,
         |    md5(array_to_string(kept_lines, chr(10))) AS cleaned_md5
         |  FROM kept)
         |SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
         |  cleaned_md5,
         |  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace) AS doc_kept
         |FROM cols
         |ORDER BY doc_id""".stripMargin),
    "t7_gopher_repetition" ->
      (s"WITH $pagesSql,\n" +
      s"""base AS (
         |  SELECT doc_id,
         |    string_split(page, chr(10)) AS lines,
         |    regexp_extract_all(lower(page), '[a-z0-9]+') AS tok
         |  FROM pages),
         |fracs AS (
         |  SELECT doc_id,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
         |      / len(lines), 6) AS dup_line_frac,
         |    round(CAST(coalesce(list_sum(list_transform(
         |        list_filter(lines, l -> len(list_filter(lines, x -> x = l)) > 1),
         |        l -> length(l))), 0) AS DOUBLE)
         |      / CAST(list_sum(list_transform(lines, l -> length(l))) AS DOUBLE),
         |      6) AS dup_char_frac,
         |    round(CAST(list_max(list_transform(list_distinct(tok),
         |        d -> len(list_filter(tok, t -> t = d)))) AS DOUBLE)
         |      / len(tok), 6) AS top_word_frac
         |  FROM base)
         |SELECT doc_id, n_lines, dup_line_frac, dup_char_frac, top_word_frac,
         |  (dup_line_frac > 0.1 OR top_word_frac > 0.08) AS flagged
         |FROM fracs
         |ORDER BY doc_id""".stripMargin),
    "t9_gopher_quality" -> {
      val stopSql = GopherStops
        .map(s => s"(CASE WHEN regexp_matches(lower(page), '\\b$s\\b') THEN 1 ELSE 0 END)")
        .mkString("\n      + ")
      s"WITH $pagesSql,\n" +
      s"""base AS (
         |  SELECT doc_id, page,
         |    string_split(page, chr(10)) AS lines,
         |    regexp_extract_all(page, '\\S+') AS words
         |  FROM pages),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(len(words) AS BIGINT) AS n_words,
         |    round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
         |      / len(words), 6) AS mean_word_len,
         |    round(CAST(len(regexp_extract_all(page, '#|\\.\\.\\.')) AS DOUBLE)
         |      / len(words), 6) AS symbol_ratio,
         |    round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
         |      / len(lines), 6) AS bullet_line_frac,
         |    round(CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$$'))) AS DOUBLE)
         |      / len(lines), 6) AS ellipsis_line_frac,
         |    round(CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
         |      / len(words), 6) AS alpha_word_frac,
         |    CAST($stopSql AS BIGINT) AS n_stop_present
         |  FROM base)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
         |  ellipsis_line_frac, alpha_word_frac, n_stop_present,
         |  (n_words >= 50 AND n_words <= 100000
         |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |   AND symbol_ratio <= 0.1
         |   AND bullet_line_frac <= 0.1 AND ellipsis_line_frac <= 0.3
         |   AND alpha_word_frac >= 0.8 AND n_stop_present >= 2) AS quality_kept
         |FROM sig
         |ORDER BY doc_id""".stripMargin
    },
    "t8_pii_redact" ->
      (s"WITH $pagesSql\n" +
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(page, '$EmailPat')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(page, '$PhonePat')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(page, '$IpPat')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(page,
         |    '$EmailPat', '<EMAIL>', 'g'),
         |    '$PhonePat', '<PHONE>', 'g'),
         |    '$IpPat', '<IP>', 'g')) AS redacted_md5
         |FROM pages
         |ORDER BY doc_id""".stripMargin))
}
