package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HashFunctions => H}

/** Corpus curation operators a large-scale training-data pipeline
  * needs beyond dedup (SURVEY.md §2.D): benchmark decontamination and
  * leakage-safe split assignment.
  *
  * Both are pure hash pipelines over the same tokenize scan the dedup
  * family uses, with every hash ANSI-SQL-reproducible so the driver's
  * DuckDB oracle verifies them end to end.
  */
object Curation {

  /** N-gram size for decontamination: 8-token spans, the common
    * contamination-detection window (long enough that chance
    * collisions are negligible, short enough to catch partial
    * inclusion of a benchmark item). */
  val ContamNgram = 8

  /** p2: benchmark DECONTAMINATION — flag training documents that
    * share any hashed 8-gram with the evaluation set. The eval set
    * here is the deterministic slice doc_id % 97 == 5 (standing in
    * for a held-out benchmark); at scale it is whatever benchmark
    * table the pipeline loads. Candidate generation is an EQUI-join
    * on the n-gram hash — cost tracks shared-shingle frequency,
    * never |train| x |eval| — and only ids cross the shuffle.
    * Output: contaminated training doc ids with the count of
    * distinct shared 8-grams (evidence for audit). */
  def p2Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val isEval = pmod($"doc_id", lit(97)) === 5
    decontaminate(docs.filter(!isEval), docs.filter(isEval))
  }

  /** Parameterized decontamination over arbitrary (doc_id, text)
    * train and eval DataFrames. */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    ngram: Int = ContamNgram): DataFrame = {
    import train.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(train.sparkSession)
    def grams(docs: DataFrame): DataFrame = docs
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= ngram)
      .select($"doc_id", explode(H.hashedShingles($"w", ngram)).as("g"))
    grams(train)
      .join(grams(eval).select($"g").distinct(), Seq("g"), "left_semi")
      .groupBy($"doc_id")
      .agg(countDistinct($"g").as("shared_ngrams"))
      .orderBy($"doc_id")
  }

  /** d18: corpus-wide DUPLICATED-SPAN profile — the boilerplate/
    * plagiarism signal p2 only measures against an eval slice, taken
    * across the WHOLE corpus: for each document, how many of its
    * distinct hashed 8-gram spans appear in at least one OTHER
    * document, the resulting span-dup fraction, and the widest
    * breadth any of its spans reaches (a span in 10k docs is sitewide
    * boilerplate; in 2 docs, a copied paragraph). Never pairwise:
    * spans dedup WITHIN each doc first, one gram-keyed count gives
    * each span's corpus breadth, and the join back is gram-keyed —
    * cost tracks (doc, span) rows, not doc pairs, so a mega-span
    * shared by millions of docs costs its row count, never a
    * quadratic blowup (the d4/d11 posting-cap problem doesn't arise
    * because nothing ever joins doc-to-doc). Docs under 8 words have
    * no spans and no row — the same rule p2 applies. */
  def d18DuplicatedSpans(spark: SparkSession, dir: String): DataFrame =
    duplicatedSpansOf(Tables.documents(spark, dir))

  /** The d18 core over any (doc_id, text) corpus. */
  def duplicatedSpansOf(docs: DataFrame,
                        ngram: Int = ContamNgram): DataFrame = {
    import docs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    val grams = graft.Caches.persist(docs
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= ngram)
      .select($"doc_id",
        explode(array_distinct(H.hashedShingles($"w", ngram))).as("g")))
    val breadth = grams.groupBy($"g").agg(count(lit(1)).as("n_docs_with"))
    grams.join(breadth, "g")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"n_docs_with" > 1, 1L).otherwise(0L)).as("n_shared"),
        max($"n_docs_with").as("max_breadth"))
      .select($"doc_id", $"n_spans", $"n_shared",
        round($"n_shared".cast("double") / $"n_spans".cast("double"), 6)
          .as("dup_frac"),
        $"max_breadth")
      .orderBy($"doc_id")
  }

  /** d19: corpus-wide BOILERPLATE-SPAN STRIP — the transform d18's
    * profile motivates (the CCNet/RefinedWeb boilerplate-removal
    * class): every token covered by an 8-gram span appearing in
    * ≥ `minBreadth` DISTINCT documents (2 = exactly the spans d18
    * counts as shared) is removed, and the report carries what a
    * curation pass audits — token counts before/after, keep
    * fraction, and the kept text's char count + leading tokens so
    * the surgery itself is checkable, not just the arithmetic. Cost
    * shape: positional grams explode to (doc, start) rows, breadth
    * is ONE gram-keyed distinct-doc count, flagged starts fan out
    * ×8 into covered positions (rows track flagged spans, never doc
    * pairs), and the strip is a per-row positional filter against
    * the doc's own covered-position array — map-side after one
    * doc-keyed join, no token ever shuffles. Docs under 8 tokens
    * have no spans and pass through whole. */
  def d19BoilerplateStrip(spark: SparkSession, dir: String): DataFrame =
    boilerplateStripOf(Tables.documents(spark, dir))

  /** The d19 core over any (doc_id, text) corpus. */
  def boilerplateStripOf(docs: DataFrame, ngram: Int = ContamNgram,
                         minBreadth: Long = 2L): DataFrame = {
    import docs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    val toks = graft.Caches.persist(docs
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w")))
    // positional grams: span `start` (1-based) covers tokens
    // start..start+n-1; hashes stay in order (no sort/distinct)
    val gramsPos = graft.Caches.persist(toks
      .filter(size($"w") >= ngram)
      .select($"doc_id", posexplode(
        call_function("poly_hash_all", H.shinglesAll($"w", ngram))))
      .select($"doc_id", ($"pos" + 1).cast("long").as("start"),
        $"col".as("g")))
    val breadth = gramsPos.select($"doc_id", $"g").distinct()
      .groupBy($"g").agg(count(lit(1)).as("n_docs_with"))
    val flagged = gramsPos
      .join(breadth.filter($"n_docs_with" >= minBreadth), "g")
      .select($"doc_id", $"start")
    val covered = flagged
      .select($"doc_id",
        explode(sequence($"start", $"start" + (ngram - 1))).as("p"))
      .distinct()
      .groupBy($"doc_id").agg(sort_array(collect_set($"p")).as("cov"))
    toks.join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce($"cov", typedLit(Seq.empty[Long])))
      .withColumn("kept", expr(
        "filter(w, (t, i) -> NOT array_contains(cov, CAST(i + 1 AS BIGINT)))"))
      .select($"doc_id",
        size($"w").cast("long").as("n_tokens"),
        size($"cov").cast("long").as("n_removed"),
        when(size($"w") > 0,
          round((size($"w") - size($"cov")).cast("double") / size($"w"), 6))
          .otherwise(1.0).as("keep_frac"),
        length(array_join($"kept", " ")).cast("long").as("kept_chars"),
        array_join(slice($"kept", 1, 12), " ").as("kept_prefix"))
      .orderBy($"doc_id")
  }

  /** p21: CONTAMINATION report by source — p2's per-document hits
    * rolled up into the audit a pipeline actually publishes: per
    * source, how many training documents (and what token mass) share
    * eval n-grams, plus the total shared-gram evidence. The number
    * that decides whether a source ships, gets scrubbed, or gets
    * dropped — a 0.2% global rate can hide a 40% rate in one scraped
    * source. One left join of the (small) hit table back onto the
    * train scan + one keyed aggregate; n-gram matching cost is p2's,
    * paid once. */
  def p21ContaminationReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val isEval = pmod($"doc_id", lit(97)) === 5
    val hits = decontaminate(docs.filter(!isEval), docs.filter(isEval))
    docs.filter(!isEval)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tok"))
      .join(hits, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count($"shared_ngrams").as("n_contaminated"),
        sum($"n_tok").as("n_tokens"),
        sum(when($"shared_ngrams".isNotNull, $"n_tok").otherwise(0L))
          .as("tokens_contaminated"),
        sum(coalesce($"shared_ngrams", lit(0L))).as("shared_ngrams_total"))
      .withColumn("doc_rate",
        round($"n_contaminated".cast("double") / $"n_docs", 6))
      .withColumn("token_rate",
        round($"tokens_contaminated".cast("double") / $"n_tokens", 6))
      .orderBy($"source")
  }

  /** p3: leakage-safe deterministic train/val/test SPLIT — the split
    * key is a polynomial hash of the CONTENT (not the id), so exact
    * duplicates always land in the same split (no train/test
    * leakage through copies), assignment is stable across reruns and
    * cluster layouts, and the same SQL replays in the oracle.
    * 80/10/10 by hash bucket; a narrow map-only pass, no shuffle
    * beyond the output ordering. */
  def p3TrainSplit(spark: SparkSession, dir: String): DataFrame =
    splitOf(Tables.documents(spark, dir))

  /** Parameterized split assignment over any (doc_id, text) corpus. */
  def splitOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs
      .select($"doc_id",
        (element_at(call_function("poly_hash_all", array($"text")), 1) % 100).as("bucket"))
      .select($"doc_id",
        when($"bucket" < 80, lit("train"))
          .when($"bucket" < 90, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy($"doc_id")
  }

  /** p4: budgeted per-source SAMPLING — keep at most k documents per
    * source, chosen by deterministic content-hash order: stable
    * across reruns and cluster layouts (no rand()), unbiased w.r.t.
    * ingestion order, and exact copies get identical keys so
    * re-crawled duplicates can't double-dip a budget. The per-group
    * head rides the TopKPerKey heap rewrite (no per-source sort);
    * one shuffle on source. The per-source quota step every corpus
    * mixing plan needs between t5's weights and the final sample. */
  def p4SamplePerSource(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"source", $"rn", $"doc_id")
      .orderBy($"source", $"rn")
  }

  /** p6: mixture-REBALANCING sampler — the pass that turns t5's
    * mixture stats into an actual corpus. Target = uniform token
    * share per source (the parameterized general case broadcasts any
    * target-weight table): each source's acceptance rate is
    * min(1, target_tokens / source_tokens), and a document is kept
    * iff its content-hash uniform draw u falls under its source's
    * rate. Deterministic end to end — the draw is the polynomial
    * content hash scaled to [0,1), so no rand(), reruns are stable,
    * and exact copies draw identically (they can't launder a
    * duplicate through resampling). Cost shape: one scan + one tiny
    * per-source agg whose rates broadcast back; the keep decision is
    * a map-side comparison, so at 100 TB this is scan-bound with no
    * second shuffle. */
  def p6MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_tok"),
        (pmod(element_at(call_function("poly_hash_all", array($"text")), 1),
              lit(1000000L)).cast("double") / 1000000.0).as("u"))
    val bySource = docs.groupBy($"source").agg(sum($"n_tok").as("source_tokens"))
    val totals = bySource.agg(
      sum($"source_tokens").cast("double").as("total_tokens"),
      count(lit(1)).cast("double").as("n_sources"))
    val rates = bySource.crossJoin(broadcast(totals))
      .select($"source",
        least(lit(1.0), $"total_tokens" / $"n_sources" / $"source_tokens").as("rate"))
    docs.join(broadcast(rates), "source")
      .select($"doc_id", $"source", $"n_tok",
        round($"u", 6).as("u"), round($"rate", 6).as("rate"),
        ($"u" < $"rate").as("kept"))
      .orderBy($"doc_id")
  }

  /** p7: sequence PACKING — the concat-and-chunk layout pass that
    * turns a curated corpus into fixed-length training sequences
    * (GPT-style packing): documents are laid out in deterministic
    * content-hash order, token offsets accumulate, and every
    * maxLen-token span becomes one training sequence. Emits each
    * document's placement — sequence id, in-sequence position, and
    * whether it straddles a boundary (the rows an attention-mask
    * builder consumes).
    *
    * Packing is PER SOURCE SHARD: the running offset is a keyed
    * window cumsum, so the layout parallelizes one pack stream per
    * shard — never a single global ordered cumsum (a total order
    * over 100 TB is the canonical scale bottleneck; real pipelines
    * pack per input shard exactly this way). Layout order
    * (content hash, doc_id) is stable across reruns and cluster
    * layouts, and byte-equal copies land adjacently per shard. */
  def p7PackSequences(spark: SparkSession, dir: String,
                      maxLen: Int = 1024): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tokens"),
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
      .withColumn("start_off", sum($"n_tokens").over(w) - $"n_tokens")
      .select($"source", $"doc_id", $"n_tokens", $"start_off",
        expr(s"start_off div $maxLen").as("seq_id"),
        pmod($"start_off", lit(maxLen.toLong)).as("seq_pos"),
        ($"n_tokens" > 0 &&
          expr(s"(start_off div $maxLen) != ((start_off + n_tokens - 1) div $maxLen)"))
          .as("crosses_seq"))
      .orderBy($"source", $"start_off", $"doc_id")
  }

  /** p8: sequence packing WITHOUT document splitting — the greedy
    * next-fit layout real pipelines use when examples must stay
    * whole (SFT/instruction data, where a split document is a
    * corrupted example; p7's concat-and-chunk is the pretraining
    * layout where straddling is fine). Same deterministic per-source
    * stream as p7 — (content hash, doc_id) order — but a document
    * that would straddle the cap closes the bin and opens the next
    * one; oversize documents sit alone in their bin for a downstream
    * truncate-or-drop policy to handle.
    *
    * Rides [[Packing.packNextFit]]: one exchange on source + an
    * in-partition sort + a sequential per-group pass — the running
    * (bin, fill) reset is not window-expressible, so the kernel is
    * the documented legitimate `mapPartitions`. The oracle replays
    * the same greedy recurrence as a DuckDB recursive CTE stepping
    * rank-by-rank within each source. */
  def p8PackBins(spark: SparkSession, dir: String,
                 cap: Long = 1024L): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tokens"),
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
    Packing.packNextFit(docs, Seq("source"), Seq("h", "doc_id"),
        "n_tokens", cap)
      .select($"source", $"doc_id", $"n_tokens",
        $"bin_id", $"bin_off", $"oversize")
      .orderBy($"source", $"bin_id", $"bin_off", $"doc_id")
  }

  /** p9: CURRICULUM staging — every document assigned a quality
    * decile (stage 1 = lowest, 10 = highest), the ordering signal a
    * curriculum-training loader consumes (feed high stages first, or
    * anneal across stages). Deliberately NOT a global ntile: a total
    * order over 100 TB is the canonical scale bottleneck. Instead
    * one aggregate computes the 9 decile boundaries (exact
    * interpolated percentile — the q15-verified Spark/DuckDB-equal
    * kernel; swap approx_percentile at real scale), broadcasts them,
    * and assignment is a map-only boundary count per row. Quality is
    * t2's scoring arithmetic verbatim. */
  def p9Curriculum(spark: SparkSession, dir: String): DataFrame =
    curriculumOf(Tables.documents(spark, dir))

  /** The p9 core over any (doc_id, text) frame. */
  def curriculumOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = docs
      .select($"doc_id",
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("n_tok"),
        expr("cast(regexp_count(text, '[.,;:!?]') as bigint)").as("n_punct"),
        expr(s"cast(regexp_count(lower(text), '${TextAnalysis.stopwordsEn}') as bigint)")
          .as("n_stop"))
      .select($"doc_id",
        round(
          lit(0.4) * least($"n_tok".cast("double") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - $"n_punct".cast("double") / greatest($"n_tok", lit(1))) +
          lit(0.3) * ($"n_stop".cast("double") / greatest($"n_tok", lit(1))),
          6).as("quality"))
    val bounds = scored.agg(
      expr("percentile(quality, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("bounds"))
    scored.crossJoin(broadcast(bounds))
      .select($"doc_id", $"quality",
        (lit(1) + size(filter($"bounds", b => $"quality" > b))).cast("long")
          .as("stage"))
      .orderBy($"doc_id")
  }

  /** p10: EPOCH UPSAMPLING — the data-recipe pass that shows
    * high-quality data to the model more than once (the multi-epoch
    * source weighting of published pretraining mixes): documents in
    * the top quality deciles get extra epochs (stage >= 9 -> 3,
    * >= 6 -> 2, else 1), each repeat emitted as its own row with an
    * epoch ordinal and a repeat-distinct content hash (so downstream
    * packing/shuffling treats epochs as distinct examples, exactly
    * how repeated data is laid out in practice). Map-only on top of
    * p9's broadcast-boundary staging: the fan-out is a deterministic
    * explode, no shuffle beyond p9's one aggregate. */
  def p10EpochUpsample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    p9Curriculum(spark, dir)
      .withColumn("n_epochs",
        when($"stage" >= 9, 3L).when($"stage" >= 6, 2L).otherwise(1L))
      .select($"doc_id", $"stage", $"n_epochs",
        explode(sequence(lit(1L), $"n_epochs")).as("epoch"))
      .withColumn("epoch_key",
        pmod($"doc_id" * 1000003L + $"epoch" * 7919L, lit(1000000007L)))
      .orderBy($"doc_id", $"epoch")
  }

  /** p11: deterministic GLOBAL SHUFFLE — the epoch-shuffle every
    * training run needs, computed WITHOUT a total order (a global
    * row_number over 100 TB is the canonical single-partition driver
    * bottleneck). Shard = content hash mod nShards — so the only
    * exchange is a keyed one and every shard shuffles independently —
    * and the position within a shard orders by the hash's HIGH bits
    * (hv div nShards: independent of the shard-selecting low bits,
    * so within-shard order is itself pseudo-random). Reading shards
    * 0..n-1 in positional order replays one fixed permutation:
    * rerun-stable, layout-independent, and exact copies land
    * adjacent (same hash), which is exactly how copies behave under
    * any content-keyed shuffle. */
  def p11GlobalShuffle(spark: SparkSession, dir: String, nShards: Int = 64): DataFrame =
    globalShuffleOf(Tables.documents(spark, dir), nShards)

  /** The p11 core over any (doc_id, text) corpus. */
  def globalShuffleOf(docs: DataFrame, nShards: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    val w = Window.partitionBy($"shard")
      .orderBy($"sub", $"doc_id")
    docs
      .select($"doc_id",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("hv"))
      .select($"doc_id",
        ($"hv" % nShards).as("shard"),
        expr(s"hv div $nShards").as("sub"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }

  /** p14: packing-efficiency REPORT — the audit a pipeline runs after
    * p8's no-split packing to decide whether the cap/layout is
    * wasting budget: per source, bin count, document count, oversize
    * bins, total tokens, wasted capacity in closed non-oversize bins,
    * and the overall fill rate. Two keyed aggregates on top of the
    * p8 layout (per-bin, then per-source) — the packing pass itself
    * dominates; the report adds no extra scan of the corpus. Only
    * integer outputs plus one single-division rounded ratio, so the
    * oracle (p8's recursive-CTE replay + the same two aggregates)
    * hash-matches exactly. */
  def p14PackReport(spark: SparkSession, dir: String,
                    cap: Long = 1024L): DataFrame =
    packReportOf(p8PackBins(spark, dir, cap), cap)

  /** The p14 core over any packed frame with (source, bin_id,
    * n_tokens, oversize) columns. */
  def packReportOf(packed: DataFrame, cap: Long): DataFrame = {
    import packed.sparkSession.implicits._
    packed
      .groupBy($"source", $"bin_id")
      .agg(sum($"n_tokens").as("fill"), count(lit(1)).as("docs"),
           max($"oversize").as("over"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_bins"),
           sum($"docs").as("n_docs"),
           sum(when($"over", 1L).otherwise(0L)).as("n_oversize_bins"),
           sum($"fill").as("total_tokens"),
           sum(when(!$"over", lit(cap) - $"fill").otherwise(0L)).as("waste_tokens"))
      .withColumn("fill_rate",
        round($"total_tokens".cast("double") /
              ($"n_bins" * lit(cap)).cast("double"), 6))
      .orderBy($"source")
  }

  /** p15: TOKENIZER-AWARE sequence packing — p7's concat-and-chunk
    * layout with offsets measured in the session's TRAINED BPE
    * tokens (t17/t18) instead of whitespace words: the actual
    * composition a pretraining pipeline runs, since sequence budgets
    * are model-tokenizer tokens, not words. Same per-source keyed
    * cumsum (no global order), same deterministic (content-hash,
    * doc_id) stream; the per-doc token counts come from t18's
    * vocabulary-sized apply pass (merges memoized per session, so
    * t17/t18/p15 in one session train ONCE — the train-once
    * serve-many discipline, billed under _model_training's
    * equivalent). */
  def p15PackBpe(spark: SparkSession, dir: String,
                 maxLen: Int = 1024): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val counts = BpeTrainer.t18BpeTokenize(spark, dir)
      .select($"doc_id", $"n_bpe_tokens")
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
      .join(counts, Seq("doc_id"), "left")
      .withColumn("n_tokens", coalesce($"n_bpe_tokens", lit(0L)))
      .withColumn("start_off", sum($"n_tokens").over(w) - $"n_tokens")
      .select($"source", $"doc_id", $"n_tokens", $"start_off",
        expr(s"start_off div $maxLen").as("seq_id"),
        pmod($"start_off", lit(maxLen.toLong)).as("seq_pos"),
        ($"n_tokens" > 0 &&
          expr(s"(start_off div $maxLen) != ((start_off + n_tokens - 1) div $maxLen)"))
          .as("crosses_seq"))
      .orderBy($"source", $"start_off", $"doc_id")
  }

  /** p16: MIXTURE INTERLEAVE — the deterministic read order that
    * keeps the source mix STATIONARY through training (p6 decides
    * which documents; p11 shuffles; this decides the sequence, so
    * the loader doesn't drift through sources and accidentally run a
    * curriculum). Stride scheduling: within a shard, source s's r-th
    * document gets key (2r-1)·10⁶ div w_s (w_s = the source's token
    * mass — one tiny broadcast aggregate), and the shard reads in
    * key order — heavier sources stride shorter, so every prefix
    * holds each source's share ≈ its weight. All integer arithmetic;
    * per-shard keyed windows only (the p11 rule: no global order);
    * content-hash ranks make the layout rerun/layout-stable. */
  def p16MixtureInterleave(spark: SparkSession, dir: String,
                           nShards: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tok"),
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
      .select($"doc_id", $"source", $"n_tok",
        ($"h" % nShards).as("shard"), expr(s"h div $nShards").as("sub"))
    val weights = docs.groupBy($"source").agg(sum($"n_tok").as("w"))
    val wRank = Window.partitionBy($"shard", $"source").orderBy($"sub", $"doc_id")
    val wPos = Window.partitionBy($"shard").orderBy($"key", $"source", $"doc_id")
    docs.join(broadcast(weights), "source")
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("key", expr("((2 * r - 1) * 1000000) div w"))
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .select($"shard", $"pos", $"doc_id", $"source")
      .orderBy($"shard", $"pos")
  }

  /** Hash buckets for p13's importance-weight features. */
  val DsirBuckets = 64

  /** p13: DSIR importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — score every
    * document by how target-like its hashed-unigram distribution is:
    * weight(d) = Σ_j c_dj · (ln p_target[j] − ln p_raw[j]) with
    * add-one smoothing over B=64 token-hash buckets. Target here is
    * the English slice (standing in for the high-quality seed corpus
    * a production run supplies); raw is the whole corpus. kept =
    * weight > 0 (more target-like than raw-like), the deterministic
    * selection rule (published DSIR adds Gumbel noise for sampling
    * without replacement; a seeded variant slots in the same place).
    *
    * Scale shape: ONE codegen scan builds each doc's bucket-count
    * array in-row (no token explode crosses a shuffle); bucket
    * totals are a 64-row positional aggregate (map-side partial);
    * the 64 pre-rounded log-ratios collect to the driver and
    * re-broadcast as a literal — the kmeansFit loop shape — so
    * scoring is a zero-join, map-only fold. The only floats are the
    * 64 λ values (rounded to 9dp before any multiplication — the t10
    * pre-rounded-surprisal rule, since ln is not correctly-rounded)
    * and the per-doc fold, which runs in fixed bucket order with
    * IEEE-exact ops, so the oracle replays it bit for bit. */
  def p13Dsir(spark: SparkSession, dir: String): DataFrame =
    dsirOf(Tables.documents(spark, dir), col("lang") === "en")

  /** The p13 core: importance weights for `docs` against the target
    * slice selected by `isTarget`. */
  def dsirOf(docs: DataFrame, isTarget: org.apache.spark.sql.Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val B = DsirBuckets
    // bucket counts ride the poly_bow codegen kernel (one pass per
    // doc) — the 64-filter HOF form it replaces was interpreted per
    // element and dominated the bench line (4.4s -> ~1s at sf0.1).
    // Counts are integral doubles (< 2^53), so every sum below is
    // exact in any accumulation order.
    val counted = graft.Caches.persist(docs
      .select($"doc_id", isTarget.as("is_target"),
        call_function("poly_bow",
          expr("regexp_extract_all(lower(text), '\\\\S+', 0)"),
          lit(B)).as("c")))
    // bucket totals: positional sums over target and raw (64 rows)
    val totals = counted
      .select($"is_target", posexplode($"c"))
      .groupBy($"pos")
      .agg(sum(when($"is_target", $"col").otherwise(0.0)).as("ct"),
           sum($"col").as("cr"))
      .orderBy($"pos")
      .as[(Int, Double, Double)].collect()
    val grandT = totals.map(_._2).sum
    val grandR = totals.map(_._3).sum
    def r9(v: Double): Double =
      BigDecimal.valueOf(v).setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val lambda: Seq[Double] = totals.map { case (_, ct, cr) =>
      r9(math.log((ct + 1.0) / (grandT + B)) - math.log((cr + 1.0) / (grandR + B)))
    }.toSeq
    counted
      .select($"doc_id", $"is_target",
        round(aggregate(sequence(lit(1), lit(B)), lit(0.0), (acc, j) =>
          acc + element_at($"c", j) *
                element_at(typedLit(lambda), j)), 6).as("weight"))
      .withColumn("kept", $"weight" > 0.0)
      .orderBy($"doc_id")
  }

  /** p17: QUALITY-WEIGHTED sampling WITHOUT replacement — exactly k
    * documents, inclusion probability proportional to quality, via
    * Efraimidis–Spirakis A-ES keys (key = u^(1/w); the global top-k
    * keys ARE a weighted sample without replacement — "Weighted
    * random sampling with a reservoir", IPL 2006). The draw u is the
    * doc's md5 digest (first 48 bits scaled to [0,1)) from the SHARED
    * scored-documents scan, so the sampler reads scores only — never
    * the corpus bytes — and is deterministic: reruns, relayouts, and
    * re-crawled exact copies all draw identically (a duplicate can't
    * re-roll its way into the sample). Global top-k rides
    * TakeOrderedAndProject (per-partition heaps merged on the
    * driver, k rows — never a total-order shuffle), the one safe
    * "global" pattern at 100 TB. Weight floor 0.01 keeps zero-quality
    * docs sampleable-but-rare instead of dividing by zero. */
  def p17WeightedSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    weightedSampleScored(
      TextAnalysis.scoredDocs(spark, dir).select("doc_id", "source", "quality", "digest"), k)

  /** The A-ES selection over any (doc_id, source, quality, digest)
    * frame — the GraftEngine facade feeds it scores computed inline
    * from an arbitrary corpus; p17 feeds it the shared scan. */
  def weightedSampleScored(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .select($"doc_id", $"source", $"quality",
        (conv(substring($"digest", 1, 12), 16, 10).cast("long").cast("double") /
          lit(281474976710656.0)).as("u"))
      .withColumn("es_key", pow($"u", lit(1.0) / greatest($"quality", lit(0.01))))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"source", $"quality",
        round($"u", 6).as("u"), round($"es_key", 6).as("es_key"))
      .orderBy($"doc_id")
  }

  /** p18: TOKEN-BUDGET quota selection — the missing step between
    * t5's mixture weights and a shippable corpus: a total token
    * budget splits into per-source quotas (uniform here; any weight
    * table broadcasts through the same seam), and each source fills
    * its quota GREEDILY in deterministic content-hash order — the
    * same stable, re-crawl-proof order p4 samples in — keeping every
    * doc whose running token cumsum still fits. One scan + a keyed
    * window cumsum per source (never a global order) + a scalar
    * quota broadcast: at 100 TB this is the same cost shape as p6's
    * rate sampler but with EXACT budget semantics instead of
    * expected-value acceptance — what you want when the training
    * recipe says "50 B tokens, equal parts per domain" and overage
    * is not a rounding error you can hand-wave. */
  def p18TokenBudget(spark: SparkSession, dir: String,
                     budget: Long = 16000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_tok"),
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
    val quota = docs.agg(countDistinct($"source").as("ns"))
      .select(expr(s"cast($budget as bigint) div ns").as("quota"))
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.crossJoin(broadcast(quota))
      .withColumn("cum_tok", sum($"n_tok").over(w))
      .select($"doc_id", $"source", $"n_tok", $"cum_tok", $"quota",
        ($"cum_tok" <= $"quota").as("kept"))
      .orderBy($"doc_id")
  }

  /** p20: TEMPERATURE-SCALED mixture weights — the multinomial
    * sampling recipe the big multilingual/multi-source pretraining
    * runs actually use (GPT-3 / PaLM / XLM-R style): raw per-source
    * token shares are flattened by exponent α before renormalizing,
    * upweighting the tail sources a proportional mix would starve.
    * α is fixed at 0.5 so the power IS sqrt — IEEE-exact and
    * correctly rounded in every engine, where a general pow() can
    * drift an ulp between libm implementations (the determinism
    * trade t10 makes with pre-rounding, made structurally here).
    * Output per source: tokens, raw share, temperature weight, the
    * implied upsample factor (weight/share — >1 means the source is
    * boosted), and its token quota from a budget. Two keyed
    * aggregates + two broadcast scalars; rounding happens BEFORE the
    * derived ratios so both engines divide identical doubles. */
  def p20TemperatureMix(spark: SparkSession, dir: String,
                        budget: Long = 1000000L): DataFrame =
    temperatureMixOf(Tables.documents(spark, dir), budget)

  /** The p20 core over any (source, text) corpus. */
  def temperatureMixOf(corpus: DataFrame, budget: Long): DataFrame = {
    import corpus.sparkSession.implicits._
    val bySource = corpus
      .select($"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tok"))
      .groupBy($"source").agg(sum($"n_tok").as("tokens"))
    val tot = bySource.agg(sum($"tokens").cast("double").as("total"))
    val shares = bySource.crossJoin(broadcast(tot))
      .select($"source", $"tokens",
        ($"tokens" / $"total").as("share_raw"),
        sqrt($"tokens" / $"total").as("sq"))
    val z = shares.agg(sum($"sq").as("z"))
    shares.crossJoin(broadcast(z))
      .select($"source", $"tokens",
        round($"share_raw", 6).as("share"),
        round($"sq" / $"z", 6).as("weight"))
      .withColumn("upsample", round($"weight" / $"share", 4))
      .withColumn("token_quota",
        round($"weight" * budget, 0).cast("long"))
      .orderBy($"source")
  }

  /** p23: WATER-FILLING token-budget allocation — the max-min-fair
    * split of a training budget across sources (the allocation rule
    * behind per-domain caps in curated pretraining mixes): every
    * source keeps its tokens up to a common water level λ, and λ is
    * chosen so the capped allocations exactly exhaust the budget.
    * Unlike p18's equal quota (which strands budget on small sources)
    * or p20's temperature weights (which can over-ask a tiny source),
    * water-filling never allocates more than a source has and pours
    * the surplus into the sources that can absorb it.
    *
    * The λ solve is LINEARIZED, not iterated: sort the per-source
    * rollup ascending by tokens; source i is uncapped iff
    * prefix_i + tokens_i·(n−i) ≤ B (that set is a down-set in sorted
    * order — affordability of a level is monotone in the level), so
    * one cumulative-sum window + one conditional aggregate yields
    * m = |uncapped| and λ = (B − prefix_m)/(n − m). The windowed
    * relation is the per-source ROLLUP — cardinality is the number of
    * sources (dozens, thousands at worst), so the single-partition
    * sort is deliberate, not a scale hazard; the corpus scan itself
    * is one keyed aggregate. Capped allocations use floor(λ) so both
    * engines emit identical integers. */
  def p23BudgetWaterfill(spark: SparkSession, dir: String,
                         budget: Long = 26000L): DataFrame =
    waterfillOf(Tables.documents(spark, dir), budget)

  /** The p23 core over any (source, text) corpus. */
  def waterfillOf(corpus: DataFrame, budget: Long): DataFrame = {
    import corpus.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val bySource = corpus
      .select($"source",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tok"))
      .groupBy($"source").agg(sum($"n_tok").as("tokens"))
    val ord = Window.orderBy($"tokens", $"source")
    val ranked = bySource
      .withColumn("prefix", sum($"tokens")
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("n", count(lit(1)).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long"))
      .withColumn("uncapped",
        $"prefix" + $"tokens" * ($"n" - $"i") <= lit(budget))
    val level = ranked.agg(
        sum(when($"uncapped", 1L).otherwise(0L)).as("m"),
        coalesce(sum(when($"uncapped", $"tokens")), lit(0L)).as("pm"),
        max($"n").as("n"))
      .select(when($"n" > $"m",
        round((lit(budget) - $"pm") / ($"n" - $"m").cast("double"), 4))
        .as("level"))
    ranked.crossJoin(broadcast(level))
      .select($"source", $"tokens", (!$"uncapped").as("capped"),
        when($"uncapped", $"tokens")
          .otherwise(floor($"level")).cast("long").as("alloc_tokens"),
        $"level")
      .orderBy($"source")
  }

  /** p24: OUTPUT-SHARD MANIFEST — the terminal step between p11's
    * global shuffle and a training run: assign the shuffled corpus
    * to size-targeted output shards and write the manifest a loader
    * trusts (per-shard row/token/byte counts and a content checksum,
    * the ChunkStore.writeManifest discipline applied to the final
    * artifact). Shard assignment CONSUMES p11's permutation — the
    * corpus splits into p11's hash streams (shard = hv mod
    * nStreams), and each stream packs sequentially in permutation
    * order (hv div nStreams, doc_id) by greedy next-fit against the
    * byte target (packNextFit reuse: one keyed exchange + one
    * in-partition pass, parallel across streams, NO global order —
    * the output shard id is the (stream, shard_ix) pair, exactly how
    * a 1000-executor writer lays files down). The manifest is one
    * keyed aggregate over the packed layout: doc/token/byte sums,
    * XOR content checksum (order-independent, overflow-free, flips
    * if any doc moves between shards), doc-id range, oversize flag.
    * Integer-only, so the oracle (p11's replay + the p8 recursive
    * next-fit recurrence keyed on stream + the same aggregate)
    * hash-matches exactly. */
  def p24ShardManifest(spark: SparkSession, dir: String,
                       nStreams: Int = 64,
                       targetBytes: Long = 1024L): DataFrame = {
    import spark.implicits._
    shardLayout(spark, dir, nStreams, targetBytes)
      .groupBy($"stream", $"bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        sum($"n_bytes").as("n_bytes"),
        expr("bit_xor(hv)").as("checksum"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"),
        max($"oversize").as("has_oversize"))
      .select($"stream", $"bin_id".as("shard_ix"), $"n_docs", $"n_tokens",
        $"n_bytes", $"checksum", $"min_doc", $"max_doc", $"has_oversize")
      .orderBy($"stream", $"shard_ix")
  }

  /** p24's per-doc shard layout — the packed (doc_id → stream,
    * bin_id) assignment with the doc's content hash and sizes; p24
    * aggregates it into the manifest, p25 re-reads it to pin each
    * doc to its WRITTEN shard when verifying. */
  private def shardLayout(spark: SparkSession, dir: String,
                          nStreams: Int, targetBytes: Long): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("hv"),
        octet_length($"text").cast("long").as("n_bytes"),
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("n_tokens"))
      .select($"doc_id", $"hv", ($"hv" % nStreams).as("stream"),
        expr(s"hv div $nStreams").as("sub"), $"n_bytes", $"n_tokens")
    Packing.packNextFit(docs, Seq("stream"), Seq("sub", "doc_id"),
      "n_bytes", targetBytes)
  }

  /** p25: MANIFEST VERIFY — the integrity audit between p24's
    * manifest and a training launch: re-read every shard's members,
    * recompute the per-shard counts and XOR content checksum from
    * CURRENT contents, and diff against the manifest's expectations.
    * The shard a doc was written to is pinned by the manifest-time
    * layout (assignment keys on doc_id, NOT re-derived from current
    * content — a drifted doc must surface as a checksum mismatch in
    * its ORIGINAL shard, not silently migrate to a new one). Drift
    * is planted deterministically so both engines audit the same
    * damage: docs with doc_id % 101 == 7 re-read with ' EDIT'
    * appended (the changed-since-manifest class). Per shard:
    * expected vs actual checksum/bytes/tokens, changed-doc count,
    * and ok/drifted status. Cost shape at 100 TB: the layout is
    * manifest metadata (doc_id-keyed, corpus-cardinality rows, no
    * text), the re-read is the one corpus scan a verify must pay,
    * the join is doc_id-keyed, and the verdict is one keyed
    * aggregate — nothing all-pairs, nothing driver-bound. */
  def p25ManifestVerify(spark: SparkSession, dir: String,
                        nStreams: Int = 64,
                        targetBytes: Long = 1024L): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val layout = shardLayout(spark, dir, nStreams, targetBytes)
      .select($"doc_id", $"stream", $"bin_id",
        $"hv".as("hv0"), $"n_bytes".as("b0"), $"n_tokens".as("t0"))
    // the corpus as the verifier re-reads it: a deterministic slice
    // has changed since the manifest was cut
    val current = Tables.documents(spark, dir)
      .select($"doc_id",
        when(pmod($"doc_id", lit(101)) === 7, concat($"text", lit(" EDIT")))
          .otherwise($"text").as("text"))
      .select($"doc_id",
        element_at(call_function("poly_hash_all", array($"text")), 1).as("hv1"),
        octet_length($"text").cast("long").as("b1"),
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("t1"))
    layout.join(current, "doc_id")
      .groupBy($"stream", $"bin_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"hv1" =!= $"hv0", 1L).otherwise(0L)).as("n_changed"),
        expr("bit_xor(hv0)").as("exp_checksum"),
        expr("bit_xor(hv1)").as("act_checksum"),
        sum($"b0").as("exp_bytes"),
        sum($"b1").as("act_bytes"),
        sum($"t0").as("exp_tokens"),
        sum($"t1").as("act_tokens"))
      .select($"stream", $"bin_id".as("shard_ix"), $"n_docs", $"n_changed",
        $"exp_checksum", $"act_checksum", $"exp_bytes", $"act_bytes",
        $"exp_tokens", $"act_tokens",
        when($"act_checksum" === $"exp_checksum", "ok")
          .otherwise("drifted").as("status"))
      .orderBy($"stream", $"shard_ix")
  }

  /** d20: EXACT SUBSTRING spans — the published heavyweight behind
    * d13's window approximation (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": ExactSubstr finds
    * exact ≥50-token repeats corpus-wide with a suffix array; the
    * distributed re-expression is anchor seeding + diagonal
    * extend-and-merge, the BLAST/MUMmer chaining shape, all keyed
    * aggregates):
    *
    *  1. ANCHORS — positional 8-token window hashes (d19's exact
    *     positional-gram scan), hot anchors capped at `maxPosting`
    *     positions (the MaxPosting boilerplate discipline — an
    *     anchor shared by more positions fans the pair join
    *     quadratically and is d19's prey anyway).
    *  2. SEEDS — cross-doc anchor matches via ONE equi-join on the
    *     hash: (a_id, b_id, ap, bp) rows, ids and positions only.
    *  3. EXTEND — matches on the same (a_id, b_id, ap−bp) DIAGONAL
    *     with consecutive positions are one exact repeat
    *     (gaps-and-islands per diagonal: island = ap − row_number);
    *     a run of m aligned anchors is an exact match of m+7
    *     tokens. Runs below `minLen` tokens drop.
    *  4. MERGE — both sides' spans project to (doc_id, start, len)
    *     and overlapping/abutting spans per doc UNION into disjoint
    *     intervals (running-max islands) — exactly the covered-
    *     position shape d19's strip consumes.
    *
    * Exactness: within an un-capped anchor set, every maximal exact
    * cross-doc repeat of ≥ minLen tokens is found with its true
    * start and length (the planted spec pins starts/lengths, and
    * the d13 cross-check pins consistency with the window profile).
    * Scale shape: the shuffles carry (hash, id, pos) rows, the pair
    * join is posting-capped, the windows are keyed by
    * (a,b,diagonal) and by doc — never a token moves, never doc ×
    * doc. */
  def d20ExactSpans(spark: SparkSession, dir: String): DataFrame =
    exactSpansOf(Tables.documents(spark, dir))

  /** The d20 core over any (doc_id, text) corpus. */
  def exactSpansOf(docs: DataFrame, anchorK: Int = ContamNgram,
                   minLen: Int = 16, maxPosting: Long = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val anchors = graft.Caches.persist(docs
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= anchorK)
      .select($"doc_id", posexplode(
        call_function("poly_hash_all", H.shinglesAll($"w", anchorK))))
      .select($"doc_id", ($"pos" + 1).cast("long").as("p"), $"col".as("g")))
    val kept = anchors
      .withColumn("pcnt", count(lit(1)).over(Window.partitionBy($"g")))
      .filter($"pcnt" <= maxPosting)
      .drop("pcnt")
    val pairs = kept.as("a")
      .join(kept.as("b"), $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        $"a.p".as("ap"), $"b.p".as("bp"))
    val wD = Window.partitionBy($"a_id", $"b_id", $"diag").orderBy($"ap")
    val runs = pairs
      .withColumn("diag", $"ap" - $"bp")
      .withColumn("isl", $"ap" - row_number().over(wD))
      .groupBy($"a_id", $"b_id", $"diag", $"isl")
      .agg(min($"ap").as("a_start"),
        (max($"ap") - min($"ap") + anchorK).as("len"))
      .filter($"len" >= minLen)
    val spans = runs
      .select($"a_id".as("doc_id"), $"a_start".as("start"), $"len")
      .unionByName(runs.select($"b_id".as("doc_id"),
        ($"a_start" - $"diag").as("start"), $"len"))
    // per-doc interval UNION: disjoint covered ranges, merged across
    // partners (running-max gaps-and-islands)
    val wDoc = Window.partitionBy($"doc_id").orderBy($"start", $"e")
    spans
      .select($"doc_id", $"start", ($"start" + $"len" - 1).as("e"))
      .distinct()
      .withColumn("pmax", max($"e").over(
        wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when($"pmax".isNull || $"start" > $"pmax" + 1, 1L).otherwise(0L))
      .withColumn("isl", sum($"brk").over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"isl")
      .agg(min($"start").as("start"),
        (max($"e") - min($"start") + 1L).as("len"))
      .select($"doc_id", $"start", $"len")
      .orderBy($"doc_id", $"start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d20_exact_spans" -> d20ExactSpans _,
    "d18_duplicated_spans" -> d18DuplicatedSpans _,
    "d19_boilerplate_strip" -> d19BoilerplateStrip _,
    "p24_shard_manifest" -> ((s, d) => p24ShardManifest(s, d)),
    "p25_manifest_verify" -> ((s, d) => p25ManifestVerify(s, d)),
    "p23_budget_waterfill" -> ((s, d) => p23BudgetWaterfill(s, d)),
    "p20_temperature_mix" -> ((s, d) => p20TemperatureMix(s, d)),
    "p18_token_budget" -> ((s, d) => p18TokenBudget(s, d)),
    "p17_weighted_sample" -> ((s, d) => p17WeightedSample(s, d)),
    "p16_mixture_interleave" -> ((s, d) => p16MixtureInterleave(s, d)),
    "p15_pack_bpe" -> ((s, d) => p15PackBpe(s, d)),
    "p14_pack_report" -> ((s, d) => p14PackReport(s, d)),
    "p13_dsir" -> p13Dsir _,
    "p11_global_shuffle" -> ((s, d) => p11GlobalShuffle(s, d)),
    "p10_epoch_upsample" -> p10EpochUpsample _,
    "p21_contamination_report" -> p21ContaminationReport _,
    "p2_decontaminate" -> p2Decontaminate _,
    "p3_train_split" -> p3TrainSplit _,
    "p4_sample_per_source" -> ((s, d) => p4SamplePerSource(s, d)),
    "p6_mixture_sample" -> p6MixtureSample _,
    "p7_pack_sequences" -> ((s, d) => p7PackSequences(s, d)),
    "p8_pack_bins" -> ((s, d) => p8PackBins(s, d)),
    "p9_curriculum" -> p9Curriculum _)

  private val polyFoldSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(t)),
      |        i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
      |      (a, c) -> (a*31 + c) % 1000000007)""".stripMargin

  /** p8's bin layout as a reusable CTE prefix (`WITH RECURSIVE ...
    * packed`): the greedy next-fit recurrence stepped rank-by-rank
    * per source. Composed by the p8 and p14 oracles. */
  private lazy val packBinsCteSql =
    s"""WITH RECURSIVE h AS (SELECT doc_id, source, text AS t FROM documents),
       |d AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tokens,
       |    ($polyFoldSql) AS h
       |  FROM h),
       |o AS (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
       |         AS BIGINT) AS rn
       |  FROM d),
       |packed AS (
       |  SELECT source, doc_id, n_tokens, rn,
       |    CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_off,
       |    n_tokens AS fill
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.source, o.doc_id, o.n_tokens, o.rn,
       |    CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 1024
       |         THEN p.bin_id + 1 ELSE p.bin_id END,
       |    CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 1024
       |         THEN CAST(0 AS BIGINT) ELSE p.fill END,
       |    CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 1024
       |         THEN o.n_tokens ELSE p.fill + o.n_tokens END
       |  FROM packed p JOIN o ON o.source = p.source AND o.rn = p.rn + 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same ascending sort, same down-set predicate, same λ division,
    // same floor'd capped allocations
    "p23_budget_waterfill" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |      AS tokens
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT source, tokens,
        |    CAST(sum(tokens) OVER (ORDER BY tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS prefix,
        |    CAST(row_number() OVER (ORDER BY tokens, source) AS BIGINT) AS i,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM s),
        |f AS (
        |  SELECT *, (prefix + tokens * (n - i)) <= 26000 AS uncapped
        |  FROM r),
        |lv AS (
        |  SELECT CAST(sum(CASE WHEN uncapped THEN 1 ELSE 0 END) AS BIGINT) AS m,
        |    CAST(coalesce(sum(CASE WHEN uncapped THEN tokens END), 0)
        |      AS BIGINT) AS pm,
        |    max(n) AS n
        |  FROM f),
        |lev AS (
        |  SELECT CASE WHEN n > m
        |    THEN round((26000 - pm) / CAST(n - m AS DOUBLE), 4) END AS level
        |  FROM lv)
        |SELECT source, tokens, NOT uncapped AS capped,
        |  CASE WHEN uncapped THEN tokens
        |       ELSE CAST(floor(level) AS BIGINT) END AS alloc_tokens,
        |  level
        |FROM f, lev
        |ORDER BY source""".stripMargin,
    // same sqrt-temperature weights, same round-before-derive order
    "p20_temperature_mix" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |      AS tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total FROM s),
        |sh AS (
        |  SELECT source, tokens, tokens / total AS share_raw,
        |    sqrt(tokens / total) AS sq
        |  FROM s, t),
        |z AS (SELECT sum(sq) AS z FROM sh)
        |SELECT source, tokens,
        |  round(share_raw, 6) AS share,
        |  round(sq / z, 6) AS weight,
        |  round(round(sq / z, 6) / round(share_raw, 6), 4) AS upsample,
        |  CAST(round(round(sq / z, 6) * 1000000, 0) AS BIGINT)
        |    AS token_quota
        |FROM sh, z
        |ORDER BY source""".stripMargin,
    // same hash order, same keyed cumsum, same integer quota split
    "p18_token_budget" ->
      s"""WITH raw AS (SELECT doc_id, source, text AS t FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tok,
         |    ($polyFoldSql) AS h
         |  FROM raw),
         |q AS (
         |  SELECT CAST(16000 // count(DISTINCT source) AS BIGINT) AS quota
         |  FROM d),
         |c AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
         |  FROM d)
         |SELECT doc_id, source, n_tok, cum_tok, quota,
         |  (cum_tok <= quota) AS kept
         |FROM c, q
         |ORDER BY doc_id""".stripMargin,
    // same quality weights, same 48-bit digest draw, same A-ES keys
    "p17_weighted_sample" ->
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |${TextAnalysis.qualityColsSql},
         |    CAST(('0x' || substring(md5(text), 1, 12)) AS BIGINT)
         |      / 281474976710656.0 AS u
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    ${TextAnalysis.qualityExprSql} AS quality, u
         |  FROM s),
         |top AS (
         |  SELECT doc_id, source, quality, u,
         |    pow(u, 1.0 / greatest(quality, 0.01)) AS es_key
         |  FROM q
         |  ORDER BY es_key DESC, doc_id
         |  LIMIT 100)
         |SELECT doc_id, source, quality,
         |  round(u, 6) AS u, round(es_key, 6) AS es_key
         |FROM top ORDER BY doc_id""".stripMargin,
    // same hash shard/sub split, same per-source ranks, same integer
    // stride keys, same within-shard order
    "p16_mixture_interleave" ->
      s"""WITH h AS (SELECT doc_id, source, text AS t FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tok,
         |    ($polyFoldSql) AS hv
         |  FROM h),
         |sh AS (
         |  SELECT doc_id, source, n_tok,
         |    hv % 16 AS shard, hv // 16 AS sub
         |  FROM d),
         |wt AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS w
         |       FROM sh GROUP BY source),
         |ranked AS (
         |  SELECT sh.doc_id, sh.source, sh.shard,
         |    CAST(row_number() OVER (PARTITION BY sh.shard, sh.source
         |      ORDER BY sh.sub, sh.doc_id) AS BIGINT) AS r,
         |    wt.w AS w
         |  FROM sh JOIN wt ON sh.source = wt.source),
         |keyed AS (
         |  SELECT doc_id, source, shard,
         |    ((2 * r - 1) * 1000000) // w AS key
         |  FROM ranked)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY key, source, doc_id) AS BIGINT) AS pos,
         |  doc_id, source
         |FROM keyed
         |ORDER BY shard, pos""".stripMargin,
    // t18's tokenization chain + p7's keyed-cumsum layout, offsets
    // in trained-BPE tokens
    "p15_pack_bpe" ->
      s"""WITH ${BpeTrainer.tokenizePrefixSql},
         |d AS (
         |  SELECT doc.doc_id, doc.source,
         |    coalesce(bpe.n_bpe_tokens, 0) AS n_tokens,
         |    ($polyFoldSql) AS h
         |  FROM (SELECT doc_id, source, text AS t FROM documents) doc
         |  LEFT JOIN bpe ON doc.doc_id = bpe.doc_id),
         |o AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |                             ROWS UNBOUNDED PRECEDING) - n_tokens
         |         AS BIGINT) AS start_off
         |  FROM d)
         |SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_off,
         |  CAST(start_off // 1024 AS BIGINT) AS seq_id,
         |  CAST(start_off % 1024 AS BIGINT) AS seq_pos,
         |  (n_tokens > 0 AND
         |   (start_off // 1024) <> ((start_off + n_tokens - 1) // 1024))
         |    AS crosses_seq
         |FROM o
         |ORDER BY source, start_off, doc_id""".stripMargin,
    // same buckets, same add-one smoothing, same 9dp-pre-rounded
    // log-ratios, same fixed-bucket-order fold
    "p13_dsir" ->
      s"""WITH tk AS (
         |  SELECT doc_id, (lang = 'en') AS is_target,
         |    list_transform(regexp_extract_all(lower(text), '\\S+'),
         |      t -> $polyFoldSql) AS hs
         |  FROM documents),
         |tkx AS (SELECT doc_id, unnest(hs) % $DsirBuckets AS j FROM tk),
         |cnt AS (SELECT doc_id, j, count(*) AS c FROM tkx GROUP BY doc_id, j),
         |grid AS (
         |  SELECT tk.doc_id, tk.is_target, g.j
         |  FROM tk, LATERAL unnest(generate_series(0, ${DsirBuckets - 1})) AS g(j)),
         |dense AS (
         |  SELECT grid.doc_id, grid.is_target, grid.j,
         |    CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
         |  FROM grid LEFT JOIN cnt
         |    ON grid.doc_id = cnt.doc_id AND grid.j = cnt.j),
         |tot AS (
         |  SELECT j,
         |    CAST(sum(CASE WHEN is_target THEN c ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(sum(c) AS BIGINT) AS cr
         |  FROM dense GROUP BY j),
         |grand AS (
         |  SELECT CAST(sum(ct) AS DOUBLE) AS gt,
         |         CAST(sum(cr) AS DOUBLE) AS gr FROM tot),
         |lamj AS (
         |  SELECT j,
         |    round(ln((ct + 1.0)/(gt + $DsirBuckets.0))
         |        - ln((cr + 1.0)/(gr + $DsirBuckets.0)), 9) AS l
         |  FROM tot, grand),
         |w AS (
         |  SELECT doc_id, any_value(is_target) AS is_target,
         |    round(list_reduce(list_prepend(0.0,
         |      list(CAST(c AS DOUBLE) * l ORDER BY j)), (a, b) -> a + b), 6)
         |      AS weight
         |  FROM dense JOIN lamj USING (j)
         |  GROUP BY doc_id)
         |SELECT doc_id, is_target, weight, (weight > 0.0) AS kept
         |FROM w ORDER BY doc_id""".stripMargin,
    // p11's hash streams + the p8 next-fit recurrence keyed on
    // stream (byte-capped) + one keyed aggregate with an XOR
    // content checksum
    "p24_shard_manifest" ->
      s"""WITH RECURSIVE h AS (SELECT doc_id, text AS t FROM documents),
         |d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tokens,
         |    CAST(strlen(t) AS BIGINT) AS n_bytes,
         |    ($polyFoldSql) AS hv
         |  FROM h),
         |o AS (
         |  SELECT doc_id, n_tokens, n_bytes, hv, hv % 64 AS stream,
         |    CAST(row_number() OVER (PARTITION BY hv % 64
         |      ORDER BY hv // 64, doc_id) AS BIGINT) AS rn
         |  FROM d),
         |packed AS (
         |  SELECT stream, doc_id, n_tokens, n_bytes, hv, rn,
         |    CAST(0 AS BIGINT) AS bin_id, n_bytes AS fill
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.stream, o.doc_id, o.n_tokens, o.n_bytes, o.hv, o.rn,
         |    CASE WHEN p.fill > 0 AND p.fill + o.n_bytes > 1024
         |         THEN p.bin_id + 1 ELSE p.bin_id END,
         |    CASE WHEN p.fill > 0 AND p.fill + o.n_bytes > 1024
         |         THEN o.n_bytes ELSE p.fill + o.n_bytes END
         |  FROM packed p JOIN o ON o.stream = p.stream AND o.rn = p.rn + 1)
         |SELECT stream, CAST(bin_id AS BIGINT) AS shard_ix,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
         |  bit_xor(hv) AS checksum,
         |  CAST(min(doc_id) AS BIGINT) AS min_doc,
         |  CAST(max(doc_id) AS BIGINT) AS max_doc,
         |  max(n_bytes > 1024) AS has_oversize
         |FROM packed GROUP BY stream, bin_id
         |ORDER BY stream, shard_ix""".stripMargin,
    // p24's packed layout replay + the same deterministic drift
    // slice re-hashed, aggregated per written shard and diffed
    "p25_manifest_verify" ->
      s"""WITH RECURSIVE h AS (SELECT doc_id, text AS t FROM documents),
         |d AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tokens,
         |    CAST(strlen(t) AS BIGINT) AS n_bytes,
         |    ($polyFoldSql) AS hv
         |  FROM h),
         |o AS (
         |  SELECT doc_id, n_tokens, n_bytes, hv, hv % 64 AS stream,
         |    CAST(row_number() OVER (PARTITION BY hv % 64
         |      ORDER BY hv // 64, doc_id) AS BIGINT) AS rn
         |  FROM d),
         |packed AS (
         |  SELECT stream, doc_id, n_tokens, n_bytes, hv, rn,
         |    CAST(0 AS BIGINT) AS bin_id, n_bytes AS fill
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.stream, o.doc_id, o.n_tokens, o.n_bytes, o.hv, o.rn,
         |    CASE WHEN p.fill > 0 AND p.fill + o.n_bytes > 1024
         |         THEN p.bin_id + 1 ELSE p.bin_id END,
         |    CASE WHEN p.fill > 0 AND p.fill + o.n_bytes > 1024
         |         THEN o.n_bytes ELSE p.fill + o.n_bytes END
         |  FROM packed p JOIN o ON o.stream = p.stream AND o.rn = p.rn + 1),
         |cur0 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 101 = 7 THEN text || ' EDIT' ELSE text END AS t
         |  FROM documents),
         |cur AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS t1,
         |    CAST(strlen(t) AS BIGINT) AS b1,
         |    ($polyFoldSql) AS hv1
         |  FROM cur0),
         |agg AS (
         |  SELECT stream, CAST(bin_id AS BIGINT) AS shard_ix,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN hv1 <> hv THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_changed,
         |    bit_xor(hv) AS exp_checksum,
         |    bit_xor(hv1) AS act_checksum,
         |    CAST(sum(n_bytes) AS BIGINT) AS exp_bytes,
         |    CAST(sum(b1) AS BIGINT) AS act_bytes,
         |    CAST(sum(n_tokens) AS BIGINT) AS exp_tokens,
         |    CAST(sum(t1) AS BIGINT) AS act_tokens
         |  FROM packed JOIN cur USING (doc_id)
         |  GROUP BY stream, bin_id)
         |SELECT stream, shard_ix, n_docs, n_changed,
         |  exp_checksum, act_checksum, exp_bytes, act_bytes,
         |  exp_tokens, act_tokens,
         |  CASE WHEN act_checksum = exp_checksum THEN 'ok'
         |       ELSE 'drifted' END AS status
         |FROM agg
         |ORDER BY stream, shard_ix""".stripMargin,
    // same hash, same shard/sub split, same within-shard order
    "p11_global_shuffle" ->
      s"""WITH h AS (SELECT doc_id, text AS t FROM documents),
         |x AS (SELECT doc_id, ($polyFoldSql) AS hv FROM h)
         |SELECT doc_id, hv % 64 AS shard,
         |  CAST(row_number() OVER (PARTITION BY hv % 64
         |    ORDER BY hv // 64, doc_id) AS BIGINT) AS pos
         |FROM x
         |ORDER BY shard, pos""".stripMargin,
    // identical layout: same hash order, same keyed cumsum, same
    // integer div/mod placement
    "p7_pack_sequences" ->
      s"""WITH h AS (SELECT doc_id, source, text AS t FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tokens,
         |    ($polyFoldSql) AS h
         |  FROM h),
         |o AS (
         |  SELECT doc_id, source, n_tokens,
         |    -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas widens
         |    -- to float64 and the driver hash then sees 512.0 vs 512
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |                             ROWS UNBOUNDED PRECEDING) - n_tokens
         |         AS BIGINT) AS start_off
         |  FROM d)
         |SELECT source, doc_id, n_tokens, start_off,
         |  CAST(start_off // 1024 AS BIGINT) AS seq_id,
         |  CAST(start_off % 1024 AS BIGINT) AS seq_pos,
         |  (n_tokens > 0 AND
         |   (start_off // 1024) <> ((start_off + n_tokens - 1) // 1024))
         |    AS crosses_seq
         |FROM o
         |ORDER BY source, start_off, doc_id""".stripMargin,
    // the same two aggregates over p8's recursive-CTE bin replay
    "p14_pack_report" ->
      s"""$packBinsCteSql,
         |bins AS (
         |  SELECT source, bin_id,
         |    CAST(sum(n_tokens) AS BIGINT) AS fill,
         |    CAST(count(*) AS BIGINT) AS docs,
         |    max(n_tokens > 1024) AS ovr
         |  FROM packed GROUP BY source, bin_id)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(docs) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ovr THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize_bins,
         |  CAST(sum(fill) AS BIGINT) AS total_tokens,
         |  CAST(sum(CASE WHEN NOT ovr THEN 1024 - fill ELSE 0 END) AS BIGINT)
         |    AS waste_tokens,
         |  round(CAST(sum(fill) AS DOUBLE) / CAST(count(*) * 1024 AS DOUBLE), 6)
         |    AS fill_rate
         |FROM bins GROUP BY source ORDER BY source""".stripMargin,
    // the same greedy next-fit recurrence, stepped rank-by-rank per
    // source: an item that no longer fits closes the bin
    "p8_pack_bins" ->
      s"""$packBinsCteSql
         |SELECT source, doc_id, n_tokens,
         |  CAST(bin_id AS BIGINT) AS bin_id,
         |  CAST(bin_off AS BIGINT) AS bin_off,
         |  (n_tokens > 1024) AS oversize
         |FROM packed
         |ORDER BY source, bin_id, bin_off, doc_id""".stripMargin,
    // p9's staging + the same epoch ladder and deterministic repeat key
    "p10_epoch_upsample" ->
      s"""WITH q AS (
         |  SELECT doc_id, ${TextAnalysis.qualityExprSql.replace("\n", " ")} AS quality
         |  FROM (SELECT doc_id, ${TextAnalysis.qualityColsSql.replace("\n", " ")}
         |        FROM documents)),
         |b AS (
         |  SELECT quantile_cont(quality,
         |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds
         |  FROM q),
         |staged AS (
         |  SELECT doc_id,
         |    CAST(1 + len(list_filter(b.bounds, x -> q.quality > x)) AS BIGINT)
         |      AS stage
         |  FROM q, b),
         |ep AS (
         |  SELECT doc_id, stage,
         |    CAST(CASE WHEN stage >= 9 THEN 3
         |              WHEN stage >= 6 THEN 2 ELSE 1 END AS BIGINT) AS n_epochs
         |  FROM staged)
         |SELECT doc_id, stage, n_epochs, CAST(e.i AS BIGINT) AS epoch,
         |  CAST((doc_id * 1000003 + e.i * 7919) % 1000000007 AS BIGINT)
         |    AS epoch_key
         |FROM ep, LATERAL unnest(generate_series(1, n_epochs)) AS e(i)
         |ORDER BY doc_id, epoch""".stripMargin,
    // t2's quality arithmetic + quantile_cont boundaries (the
    // q15-verified percentile kernel) + the same boundary count
    "p9_curriculum" ->
      s"""WITH q AS (
         |  SELECT doc_id, ${TextAnalysis.qualityExprSql.replace("\n", " ")} AS quality
         |  FROM (SELECT doc_id, ${TextAnalysis.qualityColsSql.replace("\n", " ")}
         |        FROM documents)),
         |b AS (
         |  SELECT quantile_cont(quality,
         |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds
         |  FROM q)
         |SELECT doc_id, quality,
         |  CAST(1 + len(list_filter(b.bounds, x -> q.quality > x)) AS BIGINT)
         |    AS stage
         |FROM q, b
         |ORDER BY doc_id""".stripMargin,
    // same per-doc distinct 8-gram hashes, same gram-keyed breadth
    // count, same join-back aggregate — never doc-to-doc
    // the anchor hashes, posting cap, diagonal islands, and interval
    // union replayed exactly — a mis-stepped diagonal, an off-by-one
    // in the +k-1 extension, or a missed abutting-span merge shifts a
    // start/len and hash-fails
    "d20_exact_spans" ->
      (s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        |gs AS (
        |  SELECT doc_id, CAST(g.i AS BIGINT) AS p,
        |    array_to_string(w[g.i:g.i+${ContamNgram - 1}], ' ') AS t
        |  FROM w, LATERAL unnest(generate_series(1, len(w) - ${ContamNgram - 1}))
        |    AS g(i)
        |  WHERE len(w) >= $ContamNgram),
        |anch AS (SELECT doc_id, p, ($polyFoldSql) AS g FROM gs),
        |kept AS (
        |  SELECT doc_id, p, g FROM (
        |    SELECT doc_id, p, g, count(*) OVER (PARTITION BY g) AS pcnt
        |    FROM anch) WHERE pcnt <= 64),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.p AS ap, b.p AS bp
        |  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT a_id, b_id, diag, isl, min(ap) AS a_start,
        |    max(ap) - min(ap) + $ContamNgram AS len
        |  FROM (
        |    SELECT a_id, b_id, ap, bp, ap - bp AS diag,
        |      ap - row_number() OVER (PARTITION BY a_id, b_id, ap - bp
        |                              ORDER BY ap) AS isl
        |    FROM pairs)
        |  GROUP BY a_id, b_id, diag, isl
        |  HAVING max(ap) - min(ap) + $ContamNgram >= 16),
        |spans AS (
        |  SELECT DISTINCT doc_id, start, start + len - 1 AS e FROM (
        |    SELECT a_id AS doc_id, a_start AS start, len FROM runs
        |    UNION ALL
        |    SELECT b_id, a_start - diag, len FROM runs)),
        |m AS (
        |  SELECT doc_id, start, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY start, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM spans),
        |i AS (
        |  SELECT doc_id, start, e,
        |    sum(CASE WHEN pmax IS NULL OR start > pmax + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY start, e) AS isl
        |  FROM m)
        |SELECT doc_id, CAST(min(start) AS BIGINT) AS start,
        |  CAST(max(e) - min(start) + 1 AS BIGINT) AS len
        |FROM i GROUP BY doc_id, isl
        |ORDER BY doc_id, start""".stripMargin),
    "d18_duplicated_spans" ->
      (s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    list_transform(generate_series(1, len(w) - ${ContamNgram - 1}),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]),
        |    t -> $polyFoldSql))) AS g
        |  FROM w WHERE len(w) >= $ContamNgram),
        |b AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs_with FROM g GROUP BY g),
        |j AS (SELECT doc_id, n_docs_with FROM g JOIN b USING (g))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  round(CAST(sum(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_frac,
        |  CAST(max(n_docs_with) AS BIGINT) AS max_breadth
        |FROM j GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin),
    // d18's gram machinery with POSITIONS kept, then the covered-set
    // strip replayed: DuckDB's list_filter lambda index is 1-based
    // (Spark's is 0-based — the Spark side adds 1)
    "d19_boilerplate_strip" ->
      (s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        |gl AS (
        |  SELECT doc_id, list_transform(list_transform(
        |    generate_series(1, len(w) - ${ContamNgram - 1}),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]),
        |    t -> $polyFoldSql) AS gs
        |  FROM w WHERE len(w) >= $ContamNgram),
        |g AS (
        |  SELECT doc_id, u.i AS start, gs[u.i] AS g
        |  FROM gl, LATERAL unnest(generate_series(1, len(gs))) AS u(i)),
        |b AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |flag AS (SELECT DISTINCT doc_id, start FROM g JOIN b USING (g)),
        |cov AS (
        |  SELECT DISTINCT doc_id, start + u.o AS p
        |  FROM flag, LATERAL unnest(generate_series(0, ${ContamNgram - 1})) AS u(o)),
        |cl AS (SELECT doc_id, list(p ORDER BY p) AS cov FROM cov GROUP BY doc_id),
        |k AS (
        |  SELECT w.doc_id, len(w.w) AS n_tokens,
        |    coalesce(len(cl.cov), 0) AS n_removed,
        |    list_filter(w.w, (t, i) -> NOT list_contains(
        |      coalesce(cl.cov, CAST([] AS BIGINT[])), CAST(i AS BIGINT))) AS kept
        |  FROM w LEFT JOIN cl USING (doc_id))
        |SELECT doc_id,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_removed AS BIGINT) AS n_removed,
        |  CASE WHEN n_tokens > 0
        |    THEN round(CAST(n_tokens - n_removed AS DOUBLE) / n_tokens, 6)
        |    ELSE 1.0 END AS keep_frac,
        |  CAST(length(coalesce(array_to_string(kept, ' '), ''))
        |    AS BIGINT) AS kept_chars,
        |  coalesce(array_to_string(kept[1:12], ' '), '') AS kept_prefix
        |FROM k ORDER BY doc_id""".stripMargin),
    // p2's hit CTEs rolled up per source against the train scan
    "p21_contamination_report" ->
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    list_transform(generate_series(1, len(w) - ${ContamNgram - 1}),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]),
        |    t -> $polyFoldSql))) AS g
        |  FROM w WHERE len(w) >= $ContamNgram),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 5),
        |hits AS (
        |  SELECT doc_id, count(DISTINCT g.g) AS shared_ngrams
        |  FROM g JOIN ev USING (g)
        |  WHERE doc_id % 97 <> 5
        |  GROUP BY doc_id),
        |tr AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
        |  FROM documents WHERE doc_id % 97 <> 5)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(h.shared_ngrams) AS BIGINT) AS n_contaminated,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN h.shared_ngrams IS NOT NULL THEN n_tok
        |                ELSE 0 END) AS BIGINT) AS tokens_contaminated,
        |  CAST(sum(coalesce(h.shared_ngrams, 0)) AS BIGINT)
        |    AS shared_ngrams_total,
        |  round(count(h.shared_ngrams) / CAST(count(*) AS DOUBLE), 6)
        |    AS doc_rate,
        |  round(sum(CASE WHEN h.shared_ngrams IS NOT NULL THEN n_tok
        |            ELSE 0 END) / CAST(sum(n_tok) AS DOUBLE), 6)
        |    AS token_rate
        |FROM tr LEFT JOIN hits h USING (doc_id)
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "p2_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    list_transform(generate_series(1, len(w) - ${ContamNgram - 1}),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |        || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]),
        |    t -> $polyFoldSql))) AS g
        |  FROM w WHERE len(w) >= $ContamNgram),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 5)
        |SELECT doc_id, count(DISTINCT g.g) AS shared_ngrams
        |FROM g JOIN ev USING (g)
        |WHERE doc_id % 97 <> 5
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "p4_sample_per_source" ->
      s"""WITH h AS (SELECT doc_id, source, text AS t FROM documents),
        |keyed AS (
        |  SELECT doc_id, source, ($polyFoldSql) AS hk FROM h),
        |ranked AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
        |  FROM keyed)
        |SELECT source, rn, doc_id FROM ranked
        |WHERE rn <= 20
        |ORDER BY source, rn""".stripMargin,
    "p3_train_split" ->
      s"""WITH h AS (SELECT doc_id, text AS t FROM documents)
        |SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, ($polyFoldSql) % 100 AS b FROM h)
        |ORDER BY doc_id""".stripMargin,
    "p6_mixture_sample" ->
      s"""WITH h AS (SELECT doc_id, source, text AS t FROM documents),
        |d AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(t, '\\S+')) AS BIGINT) AS n_tok,
        |    CAST(($polyFoldSql) % 1000000 AS DOUBLE) / 1000000.0 AS u
        |  FROM h),
        |bysrc AS (
        |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS source_tokens
        |  FROM d GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(source_tokens) AS DOUBLE) AS total_tokens,
        |         CAST(count(*) AS DOUBLE) AS n_sources
        |  FROM bysrc),
        |rates AS (
        |  SELECT source,
        |    least(1.0, total_tokens / n_sources / source_tokens) AS rate
        |  FROM bysrc, tot)
        |SELECT doc_id, d.source, n_tok,
        |  round(u, 6) AS u, round(rate, 6) AS rate,
        |  (u < rate) AS kept
        |FROM d JOIN rates ON d.source = rates.source
        |ORDER BY doc_id""".stripMargin)
}
