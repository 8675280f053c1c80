package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HybridSearch

/** PERSISTED text-serving index — the Spark analog of the
  * reference's persisted Weaviate hybrid index
  * (adapter/weaviate/store.go:105): the BM25 corpus artifacts are
  * written ONCE at index-build time and every serving query reads
  * them back, instead of recomputing term statistics from the corpus
  * scan per session. Mirrors the ANN side's writeIvfIndex /
  * serveFromIvfIndex discipline (Knn.scala): build once, serve many,
  * and the serving layout IS the pruning story.
  *
  * Layout under `path`:
  *  - `postings/`  (term, doc_id, tf, dl), partitioned by
  *    pbucket = xxhash64(term) mod [[TermBuckets]] — a query of T
  *    terms is a PARTITION-PRUNED scan of ≤T bucket directories
  *    (zero I/O on every other bucket), with the term equality
  *    pushed into parquet row-group stats inside them. Doc length
  *    rides ON the posting row (Lucene's norms pattern), so scoring
  *    needs no doc-table join.
  *  - `fielded/`   (term, doc_id, tt, bt, nlt, nlb), same bucketing —
  *    s13's BM25F per-field term frequencies and lengths.
  *  - `forward/`   (doc_id, term, tf), partitioned by
  *    dbucket = doc_id mod [[DocBuckets]] — the doc-keyed FORWARD
  *    index a more-like-this seed lookup reads (an inverted index
  *    cannot answer "this document's terms" without a full scan).
  *  - `vocab/`     (term, df) — the term dictionary (s11's fuzzy
  *    corrector and idf lookups); vocab-cardinality (Heaps' law).
  *  - `prefixes/`  (prefix, rank, term, df) — s15's completion index,
  *    persisted ALREADY RANKED (what a suggester stores); serving is
  *    a point lookup.
  *  - `stats/`     one row (n_docs, sum_dl, slt, slb) — corpus
  *    counts as EXACT integer-valued sums, so derived averages are
  *    bit-identical to the scan path's regardless of partition
  *    summation order.
  *
  * Every serving method reshapes the loaded artifacts into the SAME
  * base/stats frames the scan path builds and calls the SAME scoring
  * code (HybridSearch.scoreBm25 / scoreFielded), so served scores
  * are bit-equal by construction — TextIndexSpec pins it, and
  * s17_served_bm25 oracle-gates the round trip end to end.
  */
object TextIndex {

  val TermBuckets = 64
  val DocBuckets = 16

  private def pbucket(term: Column): Column =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  /** The shared tokenized view (full/title/body token arrays +
    * lengths) both [[write]] and [[append]] fan out from. */
  private def tokenize(corpus: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    val pat = lit(HybridSearch.WordTokenPattern)
    val nl = instr($"text", "\n")
    val title = substring_index($"text", "\n", 1)
    val body = when(nl > 0, $"text".substr(nl + lit(1), length($"text")))
      .otherwise(lit(""))
    corpus.select($"doc_id",
        regexp_extract_all(lower($"text"), pat, lit(0)).as("tok"),
        regexp_extract_all(lower(title), pat, lit(0)).as("ttok"),
        regexp_extract_all(lower(body), pat, lit(0)).as("btok"))
      .withColumn("dl", size($"tok").cast("double"))
      .withColumn("nlt", size($"ttok").cast("long"))
      .withColumn("nlb", size($"btok").cast("long"))
  }

  /** Build the full index from a (doc_id, text) corpus — ONE
    * tokenized scan fans out into the six artifacts. */
  def write(corpus: DataFrame, path: String, minPrefix: Int = 2,
            maxPrefix: Int = 4, kComplete: Int = 3): Unit = {
    import corpus.sparkSession.implicits._
    val toks = tokenize(corpus).persist()
    try {
      // postings: one (term, doc) row with tf, the doc's length norm,
      // and the sorted 1-based POSITION list (Lucene's positional
      // postings — what phrase queries intersect); parquet columnar
      // means non-positional serving never reads the pos column
      val postings = toks
        .select($"doc_id", $"dl", posexplode($"tok").as(Seq("p", "term")))
        .groupBy($"term", $"doc_id", $"dl")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list($"p" + 1)).as("pos"))
        .persist()
      try {
        postings.withColumn("pbucket", pbucket($"term"))
          .write.mode("overwrite").partitionBy("pbucket")
          .parquet(s"$path/postings")
        // vocab derives from postings: (term, doc) rows are unique,
        // so df is a plain count per term
        val vocab = postings.groupBy($"term").agg(count(lit(1)).as("df"))
          .persist()
        try {
          vocab.write.mode("overwrite").parquet(s"$path/vocab")
          // the completion index is persisted SERVED (ranked top-k
          // per prefix) — what a production suggester stores
          HybridSearch.autocompleteOf(vocab, minPrefix, maxPrefix,
              kComplete)
            .write.mode("overwrite").parquet(s"$path/prefixes")
        } finally vocab.unpersist()
        // forward index: doc-keyed term vectors for MLT seed lookups
        postings.select($"doc_id", $"term", $"tf")
          .withColumn("dbucket", pmod($"doc_id", lit(DocBuckets.toLong)))
          .write.mode("overwrite").partitionBy("dbucket")
          .parquet(s"$path/forward")
      } finally postings.unpersist()
      // fielded postings: per-(doc, term) title/body tfs + per-field
      // lengths — one union + one shuffle, no per-row HOF over explode
      toks.select($"doc_id", $"nlt", $"nlb", explode($"ttok").as("term"),
          lit(1L).as("_t"), lit(0L).as("_b"))
        .unionByName(
          toks.select($"doc_id", $"nlt", $"nlb", explode($"btok").as("term"),
            lit(0L).as("_t"), lit(1L).as("_b")))
        .groupBy($"term", $"doc_id", $"nlt", $"nlb")
        .agg(sum($"_t").as("tt"), sum($"_b").as("bt"))
        .withColumn("pbucket", pbucket($"term"))
        .write.mode("overwrite").partitionBy("pbucket")
        .parquet(s"$path/fielded")
      // corpus stats as exact integer-valued sums: derived averages
      // are order-invariant, so serve-side divisions reproduce the
      // scan path's doubles bit-for-bit
      toks.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"),
          sum($"nlt").as("slt"), sum($"nlb").as("slb"))
        .write.mode("overwrite").parquet(s"$path/stats")
    } finally toks.unpersist()
  }

  /** INCREMENTAL index maintenance — the appendToIvfIndex contract
    * for the text index, with a stronger guarantee the ANN side
    * can't give: the merge is EXACT, so serve-after-append is
    * BIT-EQUAL to a full rebuild (s18's oracle gates it end to end).
    * New documents' postings/fielded/forward rows APPEND into the
    * bucket layout (each row lands in its hash directory — a narrow
    * write of the batch, the dynamic-partition discipline);
    * `vocab` re-aggregates old ∪ batch dfs (term-dictionary
    * cardinality — Heaps' law keeps the rewrite tiny at any corpus
    * size); `stats` adds the batch's exact integer-valued sums; and
    * `prefixes` re-ranks from the merged vocab (vocab-cardinality
    * again). Contract: batch doc_ids are NEW — re-ingesting an
    * existing id needs the reingest delete first, same as every
    * append index here. */
  def append(newDocs: DataFrame, path: String, minPrefix: Int = 2,
             maxPrefix: Int = 4, kComplete: Int = 3): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val toks = tokenize(newDocs).persist()
    try {
      val postings = toks
        .select($"doc_id", $"dl", posexplode($"tok").as(Seq("p", "term")))
        .groupBy($"term", $"doc_id", $"dl")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list($"p" + 1)).as("pos"))
        .persist()
      try {
        postings.withColumn("pbucket", pbucket($"term"))
          .write.mode("append").partitionBy("pbucket")
          .parquet(s"$path/postings")
        postings.select($"doc_id", $"term", $"tf")
          .withColumn("dbucket", pmod($"doc_id", lit(DocBuckets.toLong)))
          .write.mode("append").partitionBy("dbucket")
          .parquet(s"$path/forward")
        // vocab merge: old ∪ batch, df summed — localCheckpoint
        // breaks the read→overwrite cycle (the reingest pattern) AND
        // is the frame the prefix re-rank reads, saving a round trip
        val batchVocab = postings.groupBy($"term")
          .agg(count(lit(1)).as("df"))
        val mergedVocab = spark.read.parquet(s"$path/vocab")
          .unionByName(batchVocab)
          .groupBy($"term").agg(sum($"df").as("df"))
          .localCheckpoint(true)
        mergedVocab.write.mode("overwrite").parquet(s"$path/vocab")
        HybridSearch.autocompleteOf(mergedVocab, minPrefix, maxPrefix,
            kComplete)
          .write.mode("overwrite").parquet(s"$path/prefixes")
      } finally postings.unpersist()
      toks.select($"doc_id", $"nlt", $"nlb", explode($"ttok").as("term"),
          lit(1L).as("_t"), lit(0L).as("_b"))
        .unionByName(
          toks.select($"doc_id", $"nlt", $"nlb", explode($"btok").as("term"),
            lit(0L).as("_t"), lit(1L).as("_b")))
        .groupBy($"term", $"doc_id", $"nlt", $"nlb")
        .agg(sum($"_t").as("tt"), sum($"_b").as("bt"))
        .withColumn("pbucket", pbucket($"term"))
        .write.mode("append").partitionBy("pbucket")
        .parquet(s"$path/fielded")
      // stats: exact integer-valued sums ADD — the merged averages
      // are bit-identical to a full rebuild's
      val batchStats = toks.agg(count(lit(1)).as("n_docs"),
        sum($"dl").as("sum_dl"), sum($"nlt").as("slt"),
        sum($"nlb").as("slb"))
      spark.read.parquet(s"$path/stats")
        .unionByName(batchStats)
        .agg(sum($"n_docs").as("n_docs"), sum($"sum_dl").as("sum_dl"),
          sum($"slt").as("slt"), sum($"slb").as("slb"))
        .localCheckpoint(true)
        .write.mode("overwrite").parquet(s"$path/stats")
    } finally toks.unpersist()
  }

  /** The term-hash buckets of a bounded query-term list, computed
    * through the SAME expression the writer partitioned with (a
    * driver-side reimplementation could drift from Spark's
    * xxhash64). */
  private def bucketsOf(spark: SparkSession, terms: Seq[String]): Seq[Long] = {
    import spark.implicits._
    terms.toDF("term").select(pbucket($"term")).distinct()
      .collect().map(_.getLong(0)).toSeq
  }

  /** Load the query terms' postings — bucket directories pruned via
    * the partition column, term equality pushed into row groups. */
  private def postingsFor(spark: SparkSession, path: String,
                          terms: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$path/postings")
      .filter($"pbucket".isin(bucketsOf(spark, terms): _*) &&
        $"term".isin(terms: _*))
  }

  /** One-row (df_0.., <stats cols>) frame for the query terms: df
    * from the vocab table, corpus counts from the stats row. */
  private def statsFor(spark: SparkSession, path: String,
                       terms: Seq[String], extra: DataFrame => DataFrame)
      : DataFrame = {
    import spark.implicits._
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when($"term" === t, $"df")), lit(0L)).cast("double")
        .as(s"df_$i")
    }
    val vocabDf = spark.read.parquet(s"$path/vocab")
      .filter($"term".isin(terms: _*))
      .agg(dfCols.head, dfCols.tail: _*)
    vocabDf.crossJoin(extra(spark.read.parquet(s"$path/stats")))
  }

  /** s1 served FROM the index: postings of the query terms (pruned
    * scan) reshape into the scan path's (doc_id, dl, tf_i) base, the
    * stats row comes from vocab + the persisted counts, and the
    * SHARED scorer runs — bit-equal to HybridSearch.bm25Scores. */
  def bm25Serve(spark: SparkSession, path: String,
                queryTerms: Seq[String]): DataFrame = {
    import spark.implicits._
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when($"term" === t, $"tf")), lit(0L)).cast("double")
        .as(s"tf_$i")
    }
    val base = postingsFor(spark, path, queryTerms)
      .groupBy($"doc_id", $"dl")
      .agg(tfCols.head, tfCols.tail: _*)
    val stats = statsFor(spark, path, queryTerms, s =>
      s.select($"n_docs".cast("double").as("n_docs"),
        ($"sum_dl" / $"n_docs".cast("double")).as("corpus_avgdl")))
    HybridSearch.scoreBm25(base, stats, queryTerms.size)
  }

  /** s13 served FROM the index — fielded postings reshape into the
    * scan path's base; per-field avgdl derives from the exact
    * integer sums. */
  def fieldedServe(spark: SparkSession, path: String,
                   queryTerms: Seq[String], limit: Int = 10,
                   wTitle: Double = 2.0, wBody: Double = 1.0): DataFrame = {
    import spark.implicits._
    val tfCols = queryTerms.zipWithIndex.flatMap { case (t, i) => Seq(
      coalesce(sum(when($"term" === t, $"tt")), lit(0L)).cast("double")
        .as(s"tt_$i"),
      coalesce(sum(when($"term" === t, $"bt")), lit(0L)).cast("double")
        .as(s"bt_$i"))
    }
    val base = spark.read.parquet(s"$path/fielded")
      .filter($"pbucket".isin(bucketsOf(spark, queryTerms): _*) &&
        $"term".isin(queryTerms: _*))
      .groupBy($"doc_id", $"nlt", $"nlb")
      .agg(tfCols.head, tfCols.tail: _*)
    val stats = statsFor(spark, path, queryTerms, s =>
      s.select($"n_docs".cast("double").as("n_docs"),
        ($"slt".cast("double") / $"n_docs".cast("double")).as("avgdlt"),
        ($"slb".cast("double") / $"n_docs".cast("double")).as("avgdlb")))
    HybridSearch.scoreFielded(base, stats, queryTerms.size,
      wTitle, wBody, limit)
  }

  /** s7 served FROM the positional index — the real Lucene phrase
    * mechanics: the two terms' position lists (bucket-pruned
    * postings reads) intersect per document with a +1 shift
    * (`arrays_overlap` on the shifted list — a codegen set probe,
    * no explode), survivors semi-join the SHARED BM25 scorer over
    * the same two terms. Cost at any corpus size: two pruned
    * posting reads + one doc-keyed join over the RARER term's
    * postings — the corpus text is never touched, which is the
    * whole point of a positional index. */
  def phraseServe(spark: SparkSession, path: String, t1: String,
                  t2: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    val terms = Seq(t1, t2).distinct
    val post = postingsFor(spark, path, terms)
    val p1 = post.filter($"term" === t1).select($"doc_id", $"pos".as("pos1"))
    val p2 = post.filter($"term" === t2).select($"doc_id", $"pos".as("pos2"))
    val survivors = p1.join(p2, "doc_id")
      .filter(arrays_overlap(transform($"pos1", x => x + 1), $"pos2"))
      .select($"doc_id")
    bm25Serve(spark, path, Seq(t1, t2))
      .join(survivors, Seq("doc_id"), "left_semi")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  /** ORDERED-PROXIMITY search from the positional index — Lucene's
    * `"t1 t2"~slop` query mode: t2 must follow t1 within `slop`
    * token positions (slop = 1 degenerates to [[phraseServe]]'s
    * adjacency). The gap test is a nested set probe over the two
    * bounded position lists of docs carrying BOTH terms — never the
    * corpus, never an explode; scoring and ranking are the shared
    * BM25 path, so the only new mechanics the oracle must gate is
    * the windowed intersection itself. */
  def proximityServe(spark: SparkSession, path: String, t1: String,
                     t2: String, slop: Int, k: Int = 20): DataFrame = {
    import spark.implicits._
    val terms = Seq(t1, t2).distinct
    val post = postingsFor(spark, path, terms)
    val p1 = post.filter($"term" === t1).select($"doc_id", $"pos".as("pos1"))
    val p2 = post.filter($"term" === t2).select($"doc_id", $"pos".as("pos2"))
    val survivors = p1.join(p2, "doc_id")
      .filter(exists($"pos1", p =>
        exists($"pos2", q => q - p >= 1 && q - p <= slop)))
      .select($"doc_id")
    bm25Serve(spark, path, Seq(t1, t2))
      .join(survivors, Seq("doc_id"), "left_semi")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }

  /** s11's corrector over the PERSISTED vocabulary. */
  def correctionsServe(spark: SparkSession, path: String,
                       probes: Seq[String], k: Int = 3): DataFrame =
    HybridSearch.fuzzyCorrections(
      spark.read.parquet(s"$path/vocab"), probes, k)

  /** s15's completions from the PERSISTED ranked prefix table — a
    * point lookup, no recompute. */
  def completeServe(spark: SparkSession, path: String,
                    prefixes: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$path/prefixes")
      .filter($"prefix".isin(prefixes: _*))
      .select($"prefix", $"rank", $"term", $"df")
      .orderBy($"prefix", $"rank")
  }

  /** s16 served FROM the index: the seed's term vector comes from
    * the doc-bucket-pruned FORWARD index (tf·ln(N/df) salience,
    * identical types and tie-break to the scan path's mltTerms),
    * then the mined terms serve through [[bm25Serve]]. */
  def moreLikeThisServe(spark: SparkSession, path: String, seedId: Long,
                        nTerms: Int = 5, k: Int = 10): DataFrame = {
    import spark.implicits._
    val seedTf = spark.read.parquet(s"$path/forward")
      .filter($"dbucket" === seedId % DocBuckets && $"doc_id" === seedId)
      .select($"term", $"tf".as("tf_seed"))
    val nDocs = spark.read.parquet(s"$path/stats")
      .select($"n_docs".cast("double").as("n_docs"))
    val terms = spark.read.parquet(s"$path/vocab")
      .join(broadcast(seedTf), "term")
      .crossJoin(broadcast(nDocs))
      .select($"term", ($"tf_seed" * log($"n_docs" / $"df")).as("escore"))
      .orderBy($"escore".desc, $"term").limit(nTerms)
      .collect().map(_.getString(0)).toSeq
    bm25Serve(spark, path, terms)
      .filter($"doc_id" =!= seedId)
      .orderBy($"score".desc, $"doc_id").limit(k)
      .select($"doc_id", $"score")
  }
}
