package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{HybridSearch, Knn}

/** PERSISTED text-serving index — the Spark analog of the
  * reference's persisted Weaviate hybrid index
  * (adapter/weaviate/store.go:105): the BM25 corpus artifacts (and
  * the hybrid leg's document vectors) are written ONCE at index-build
  * time and every serving query reads them back, instead of
  * recomputing term statistics from the corpus scan per session.
  * Mirrors the ANN side's writeIvfIndex / serveFromIvfIndex
  * discipline (Knn.scala): build once, serve many, and the serving
  * layout IS the pruning story.
  *
  * Layout under `path` (every mutation is ONE atomic commit):
  *  - `_commit` — the pointer file readers resolve first: one line
  *    `seq minBatch maxBatch lastEpoch`. Writers stage every artifact
  *    of a change, then flip this marker with an overwrite-rename
  *    (the ChunkStore `_latest` discipline) — a crash at ANY earlier
  *    point leaves readers serving the previous committed state
  *    (garbage files exist but are invisible: batch dirs outside
  *    [minBatch, maxBatch] and artifact versions above `seq` are
  *    never read).
  *  - `postings/batch=B/pbucket=K/` (term, doc_id, tf, dl, pos) —
  *    pbucket = xxhash64(term) mod [[TermBuckets]]: a query of T
  *    terms is a PARTITION-PRUNED scan of ≤T bucket directories per
  *    batch, with the term equality pushed into parquet row-group
  *    stats. Doc length rides ON the posting row (Lucene's norms
  *    pattern) and `pos` is the sorted 1-based position list (what
  *    phrase/proximity queries intersect). The `batch` level is the
  *    append unit: incremental batches land as new `batch=B` dirs (a
  *    narrow write of the batch), and replaying a batch id is a
  *    dynamic-partition overwrite — idempotent, which is what makes
  *    the streaming at-least-once epoch replay safe.
  *  - `fielded/batch=B/pbucket=K/` (term, doc_id, nlt, nlb, tt, bt) —
  *    s13's BM25F per-field term frequencies and lengths.
  *  - `forward/batch=B/dbucket=K/` (doc_id, term, tf), dbucket =
  *    doc_id mod [[DocBuckets]] — the doc-keyed FORWARD index a
  *    more-like-this seed lookup reads, and the table a DELETE uses
  *    to find exactly which term statistics a document contributed.
  *  - `docs/batch=B/dbucket=K/` (doc_id, dl, nlt, nlb, metadata…) —
  *    one row per document: the per-doc length norms a delete must
  *    subtract from `stats`, plus any metadata columns the corpus
  *    carried (source/lang…) — the side table [[filteredServe]]
  *    semi-joins for s5-style equality filters (store.go:133-150).
  *  - `vectors/batch=B/cid=K/` (doc_id, v) — the hybrid leg's
  *    hashed-BoW document embeddings under a coarse quantizer frozen
  *    at build time (`vcents/v=N`), cid-partitioned like the IVF
  *    store so a probed serve reads only its cells; nprobe ≥ cells
  *    degenerates to the exact scan the s21 oracle gates.
  *  - `vocab/v=N` (term, df), `prefixes/v=N` (ranked completions),
  *    `stats/v=N` (exact integer-valued corpus sums),
  *    `tombstones/v=N` (doc_id, upto_batch), `vcents/v=N` — the
  *    SMALL artifacts, rewritten as a fresh version per commit
  *    (vocab cardinality — Heaps' law — so the rewrite stays tiny at
  *    any corpus size) and resolved through the marker's `seq`.
  *
  * DELETE is logical: a tombstone (doc_id, upto_batch=maxBatch at
  * delete time) kills the document's rows in every batch ≤ upto while
  * vocab/stats subtract its exact contributions (read from
  * forward/docs) — so served BM25 after a delete is bit-equal to a
  * rebuild without the document, and a later re-add (upsert) in a
  * HIGHER batch is live again without touching the tombstone. The
  * reference treats DeleteChunksByURL/BySourceID as first-class store
  * ops (store.go); [[upsert]] = delete + append in ONE commit is the
  * c18 change-detection consumer (result_consumer.go:196-198).
  * [[compact]] rewrites the live view into one consolidated batch
  * (physically dropping tombstoned rows and merging per-batch small
  * files — the LSM compaction that bounds both tombstone-list size
  * and file counts), again behind a single marker flip.
  *
  * Every serving method reshapes the loaded artifacts into the SAME
  * base/stats frames the scan path builds and calls the SAME scoring
  * code (HybridSearch.scoreBm25 / scoreFielded / fuseRelative /
  * fuseRanked), so served scores are bit-equal by construction —
  * TextIndexSpec pins it, and s17/s18/s21/s22 oracle-gate the round
  * trips end to end against the scan queries' own oracles.
  */
object TextIndex {

  val TermBuckets = 64
  val DocBuckets = 16

  /** Coarse-quantizer cells for the persisted vector leg (the
    * FAISS/Weaviate IVF dial — small here because the hashed-BoW
    * space is 64-dim; a deployment retunes per corpus). */
  val VectorCells = 8

  /** One committed index state: artifact version `seq`, live batch
    * range [minBatch, maxBatch], and the highest streaming epoch
    * folded in (−1 when the index was never stream-maintained). */
  private[graft] final case class Commit(seq: Long, minBatch: Long,
                                         maxBatch: Long, lastEpoch: Long)

  // ------------------------------------------------------- marker --

  private def hadoop(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private[graft] def readCommit(spark: SparkSession,
                                path: String): Option[Commit] =
    // Markers.read reads to EOF — a short read / empty file would
    // otherwise parse a torn marker line
    Markers.read(spark, s"$path/_commit").map { line =>
      val p = line.split("\\s+")
      require(p.length == 4 && p.forall(_.matches("-?\\d+")),
        s"torn or malformed commit marker at $path/_commit: '$line'")
      Commit(p(0).toLong, p(1).toLong, p(2).toLong, p(3).toLong)
    }

  private def commitOf(spark: SparkSession, path: String): Commit =
    readCommit(spark, path).getOrElse(throw new IllegalArgumentException(
      s"no committed text index at $path"))

  /** The marker flip that makes a staged change visible — an
    * overwrite-rename (create temp, rename over the pointer), so
    * readers either resolve the old commit or the new one, never a
    * torn line; on FileSystems without overwrite-rename semantics
    * the delete+rename fallback applies (single-writer contract,
    * like every store here). */
  private def writeMarker(spark: SparkSession, path: String,
                          c: Commit): Unit =
    Markers.write(spark, s"$path/_commit",
      s"${c.seq} ${c.minBatch} ${c.maxBatch} ${c.lastEpoch}",
      "text-index commit")

  /** True once a first build committed — the existence probe
    * streaming maintenance uses (a marker read, not a directory
    * listing: a crashed half-build must read as absent). */
  def exists(spark: SparkSession, path: String): Boolean =
    readCommit(spark, path).isDefined

  /** Highest streaming epoch folded into the COMMITTED index — the
    * replay guard: an at-least-once foreachBatch redelivery of an
    * already-committed epoch must be skipped, or tf/df/stats would
    * double-count (append is exact, so applying a batch twice is
    * exactly wrong). −1 for a fresh or batch-built index. */
  def lastEpoch(spark: SparkSession, path: String): Long =
    readCommit(spark, path).map(_.lastEpoch).getOrElse(-1L)

  // ---------------------------------------------------- tokenizing --

  private def pbucket(term: Column): Column =
    pmod(xxhash64(term), lit(TermBuckets.toLong))

  private def dbucket(id: Column): Column =
    pmod(id, lit(DocBuckets.toLong))

  /** Driver-side twin of [[dbucket]] — Spark pmod, NOT Scala `%`:
    * for a negative doc_id the two differ and a `%`-computed bucket
    * filter would miss the real partition (silently dropping the
    * row instead of reading it). */
  private def dbucketOf(id: Long): Long =
    ((id % DocBuckets) + DocBuckets) % DocBuckets

  /** The shared tokenized view (full token array + field lengths +
    * pass-through metadata columns) every artifact fans out from.
    * The token pattern cannot match across the title/body `\n`
    * boundary, so the full-text array IS title tokens followed by
    * body tokens: one full-text regex pass plus one first-line-only
    * pass replaces the former three full-width passes, and the
    * per-field token arrays need never materialize — a token's field
    * is `position < nlt`. */
  private[graft] def tokenize(corpus: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    val meta = corpus.columns.filterNot(Set("doc_id", "text")).toSeq
    val pat = lit(HybridSearch.WordTokenPattern)
    val title = substring_index($"text", "\n", 1)
    corpus.select($"doc_id" +: meta.map(col) :+
        regexp_extract_all(lower($"text"), pat, lit(0)).as("tok") :+
        size(regexp_extract_all(lower(title), pat, lit(0)))
          .cast("long").as("nlt"): _*)
      .withColumn("dl", size($"tok").cast("double"))
      .withColumn("nlb", size($"tok").cast("long") - $"nlt")
  }

  /** ONE (term, doc) aggregation feeding BOTH postings and fielded —
    * tf + sorted positions for the positional index, and the per-field
    * counts (tt = occurrences at position < nlt, bt = the rest) that
    * used to cost a second explode + union + shuffle of their own. */
  private[graft] def termRowsOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks
      .select($"doc_id", $"dl", $"nlt", $"nlb",
        posexplode($"tok").as(Seq("p", "term")))
      .groupBy($"term", $"doc_id", $"dl", $"nlt", $"nlb")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list($"p" + 1)).as("pos"),
        sum(when($"p" < $"nlt", 1L).otherwise(0L)).as("tt"),
        sum(when($"p" >= $"nlt", 1L).otherwise(0L)).as("bt"))
  }

  private def postingsView(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select($"term", $"doc_id", $"dl", $"tf", $"pos")
  }

  private def fieldedView(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select($"term", $"doc_id", $"nlt", $"nlb", $"tt", $"bt")
  }

  /** (doc_id, dl, nlt, nlb, meta…) — one row per document, including
    * zero-token documents (they count in n_docs). */
  private def docsOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    val meta = toks.columns
      .filterNot(Set("doc_id", "tok", "ttok", "btok", "dl", "nlt", "nlb"))
    toks.select($"doc_id" +: $"dl" +: $"nlt" +: $"nlb" +: meta.map(col): _*)
  }

  /** The hybrid leg's document embeddings — the SAME raw poly-BoW the
    * scan path hashes per query (HybridSearch.hybrid), persisted so
    * serving never re-tokenizes the corpus. Every doc embeds (a
    * zero-token doc gets the zero vector, cosine 0 — exactly the
    * scan leg's row set, which is what s21's bit-equality needs). */
  private def vectorsOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    graft.plans.GraftFunctions.ensureRegistered(toks.sparkSession)
    toks.select($"doc_id", expr("poly_bow(tok, 64)").as("v"))
  }

  private def batchStatsOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"),
      sum($"nlt").as("slt"), sum($"nlb").as("slb"))
  }

  // -------------------------------------------------- batch writes --

  /** Stage one batch's worth of the four batch-partitioned text
    * artifacts. `dynamic` = replace only this batch's partitions
    * (append/replay); false = wipe the whole artifact (fresh build).
    * Each frame is repartitioned ON its bucket column first so every
    * bucket directory gets exactly ONE file per batch (a bucket value
    * hashes to one task) — without it every shuffle partition writes
    * its own file into every bucket dir it touches, the small-file
    * curve compaction exists to fight.
    *
    * The postings write runs FIRST and alone — it materializes the
    * shared term-rows / tokenized caches exactly once. The three
    * remaining writes (all cache reads + one exchange each, into
    * independent directories) are RETURNED as tasks instead of
    * submitted here, so the caller can merge them into its one
    * commit-wide fan-out — a single concurrent wave after the
    * postings job, not a barrier per artifact group. */
  private def stageBatch(spark: SparkSession, path: String, batch: Long,
                         postings: DataFrame, fielded: DataFrame,
                         docs: DataFrame, dynamic: Boolean)
      : Seq[() => Unit] = {
    import spark.implicits._
    def out(df: DataFrame, name: String, parts: Seq[String]): Unit = {
      val w = df.withColumn("batch", lit(batch))
        .repartition(parts.map(col): _*)
        .write.mode("overwrite")
      (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
        .partitionBy("batch" +: parts: _*)
        .parquet(s"$path/$name")
    }
    out(postings.withColumn("pbucket", pbucket($"term")),
      "postings", Seq("pbucket"))
    Seq(
      () => out(fielded.withColumn("pbucket", pbucket($"term")),
        "fielded", Seq("pbucket")),
      () => out(postings.select($"doc_id", $"term", $"tf")
          .withColumn("dbucket", dbucket($"doc_id")),
        "forward", Seq("dbucket")),
      () => out(docs.withColumn("dbucket", dbucket($"doc_id")),
        "docs", Seq("dbucket")))
  }

  /** Write one batch of STORED FIELDS — the raw (doc_id, text) rows,
    * dbucket-partitioned (Lucene's stored-fields file): what lets the
    * index render SearchResult.Content + snippets per hit
    * (retrieval/service.go:11,114-120) without ever touching the
    * corpus at query time. A top-k serve reads ≤k rows through
    * dbucket partition pruning + doc_id row-group pushdown. */
  private def writeContentBatch(spark: SparkSession, path: String,
                                batch: Long, corpus: DataFrame,
                                dynamic: Boolean): Unit = {
    import spark.implicits._
    val w = corpus.select($"doc_id", $"text")
      .withColumn("dbucket", dbucket($"doc_id"))
      .withColumn("batch", lit(batch))
      .repartition($"dbucket")
      .write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("batch", "dbucket")
      .parquet(s"$path/content")
  }

  /** Assign + write one batch of document vectors against the frozen
    * quantizer (the production IVF add() contract — append never
    * retrains; [[compact]] or a rebuild is where a drifted layout
    * retrains). Empty quantizer (keyword-only index) writes nothing. */
  private def writeVectorBatch(spark: SparkSession, path: String,
                               batch: Long, vectors: DataFrame,
                               cents: Seq[Seq[Double]],
                               dynamic: Boolean): Unit = {
    import spark.implicits._
    if (cents.nonEmpty) {
      val assigned = vectors.withColumn("cid",
        Knn.nearestCentroidCol(spark,
          graft.functions.VectorFunctions.asDouble($"v"), cents))
      val w = assigned.withColumn("batch", lit(batch))
        .repartition($"cid")
        .write.mode("overwrite")
      (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
        .partitionBy("batch", "cid")
        .parquet(s"$path/vectors")
    }
  }

  private def writeVersioned(df: DataFrame, path: String, name: String,
                             seq: Long): Unit =
    df.write.mode("overwrite").parquet(s"$path/$name/v=$seq")

  private def emptyTombstones(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("doc_id", "upto_batch")
  }

  private def writeCents(spark: SparkSession, path: String, seq: Long,
                         cents: Seq[Seq[Double]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cid", "cv")
      .write.mode("overwrite").parquet(s"$path/vcents/v=$seq")
  }

  private def readCents(spark: SparkSession, path: String,
                        c: Commit): Seq[Seq[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$path/vcents/v=${c.seq}")
      .orderBy($"cid").select($"cv").as[Seq[Double]].collect().toSeq
  }

  /** The committed `docs/` schema, persisted as a versioned ZERO-ROW
    * parquet (`dschema/v=seq` — the footer is the schema; nothing
    * else is stored). This is what makes METADATA SCHEMA EVOLUTION
    * (vector/schema.go EnsureSchema's AddProperty: new properties
    * appear, old objects read nil) serveable without per-query
    * footer merging: every docs read applies this schema explicitly,
    * so batches written before a column existed fill it with NULL at
    * scan time — no mergeSchema cost, no backfill rewrite. */
  private def writeDocsSchema(spark: SparkSession, path: String,
                              seq: Long,
                              schema: org.apache.spark.sql.types.StructType)
      : Unit =
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$path/dschema/v=$seq")

  /** [[docsOf]]'s schema plus the two partition columns the batch
    * writer adds — the shape a docs read resolves. */
  private def withPartCols(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    StructType(s.fields ++
      Seq(StructField("dbucket", LongType), StructField("batch", LongType))
        .filterNot(f => s.fieldNames.contains(f.name)))
  }

  /** The committed docs schema — falls back to the raw footer for an
    * index written before the artifact existed, NORMALIZING the
    * partition columns to the long types [[withPartCols]] declares
    * (partition discovery infers them as int, which would trip the
    * evolution type check on every append to a pre-artifact index). */
  private def docsSchemaOf(spark: SparkSession, path: String,
                           c: Commit): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{LongType, StructType}
    val (fs, _) = hadoop(spark, path)
    val d = new org.apache.hadoop.fs.Path(s"$path/dschema/v=${c.seq}")
    if (fs.exists(d)) spark.read.parquet(s"$path/dschema/v=${c.seq}").schema
    else StructType(spark.read.parquet(s"$path/docs").schema.fields.map(f =>
      if (f.name == "batch" || f.name == "dbucket")
        f.copy(dataType = LongType)
      else f))
  }

  // -------------------------------------------------------- build --

  /** Names the index claims on the corpus row: bookkeeping columns
    * written next to the metadata (`batch`, `dbucket`) and the
    * tokenized fan-out's derived columns. A user metadata column
    * with one of these names would be silently REPLACED (`batch` —
    * then store-served filters match internal batch numbers, not
    * the user's values) or raise a duplicate-column error deep in
    * the build — so the public build/mutate entry points reject the
    * collision loudly instead. The reference's chunk rows
    * (store.go:105 — url, title, content, chunk_index…) never
    * collide. */
  private val ReservedCorpusCols =
    Set("batch", "dbucket", "dl", "nlt", "nlb", "tok", "ttok", "btok")

  private def validateCorpus(corpus: DataFrame): Unit = {
    val bad = corpus.columns.filter(c => ReservedCorpusCols(c.toLowerCase))
    require(bad.isEmpty,
      s"corpus metadata column(s) ${bad.mkString(", ")} collide with " +
        s"reserved index bookkeeping names " +
        s"${ReservedCorpusCols.toSeq.sorted.mkString(", ")} — rename " +
        "them before indexing")
  }

  /** Build the full index from a (doc_id, text, metadata…) corpus —
    * ONE tokenized scan fans out into the artifacts, then the commit
    * marker flips. Any extra corpus columns persist as document
    * metadata in `docs/` (what [[filteredServe]] filters on).
    * `withVectors=false` skips the hybrid leg (keyword-only index —
    * half the build cost when vector serving isn't needed). */
  def write(corpus: DataFrame, path: String, minPrefix: Int = 2,
            maxPrefix: Int = 4, kComplete: Int = 3,
            withVectors: Boolean = true, epochId: Long = -1L): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    validateCorpus(corpus)
    val toks = tokenize(corpus).persist()
    try {
      val rows = termRowsOf(toks).persist()
      try {
        // the postings write inside stageBatch materializes toks+rows
        // once; every task below is a cache read writing its own
        // directory, so ALL remaining artifacts — the batch trio and
        // the versioned smalls — submit as ONE wave of concurrent
        // jobs (independent outputs, shared warm cache) and the
        // marker flips only after every one returned.
        val batchTasks = stageBatch(spark, path, 0L, postingsView(rows),
          fieldedView(rows), docsOf(toks), dynamic = false)
        graft.Par.run(batchTasks ++ Seq(
          () => writeContentBatch(spark, path, 0L, corpus, dynamic = false),
          // quantizer trained ONCE at build; appends assign against
          // it. The embeddings are materialized ONCE and shared
          // between the k-means iterations and the batch write —
          // poly_bow over the token arrays is the expensive part,
          // not the tiny assign.
          () =>
            if (withVectors) {
              val vectors = vectorsOf(toks).persist()
              try {
                val cents = Knn.kmeansFit(
                  vectors.select($"doc_id".as("vec_id"),
                    graft.functions.VectorFunctions.asDouble($"v").as("v")),
                  k = VectorCells, iters = 3)
                writeCents(spark, path, 1L, cents)
                writeVectorBatch(spark, path, 0L, vectors, cents,
                  dynamic = false)
              } finally vectors.unpersist(): Unit
            } else {
              writeCents(spark, path, 1L, Seq.empty[Seq[Double]])
            },
          // vocab derives from postings: (term, doc) rows are unique,
          // so df is a plain count per term
          () => {
            val vocab = rows.groupBy($"term").agg(count(lit(1)).as("df"))
              .persist()
            try {
              writeVersioned(vocab, path, "vocab", 1L)
              // the completion index is persisted SERVED (ranked
              // top-k per prefix) — what a production suggester
              // stores
              writeVersioned(
                HybridSearch.autocompleteOf(vocab, minPrefix, maxPrefix,
                  kComplete), path, "prefixes", 1L)
            } finally vocab.unpersist(): Unit
          },
          // corpus stats as exact integer-valued sums: derived
          // averages are order-invariant, so serve-side divisions
          // reproduce the scan path's doubles bit-for-bit
          () => writeVersioned(batchStatsOf(toks), path, "stats", 1L),
          () => writeVersioned(emptyTombstones(spark), path,
            "tombstones", 1L),
          () => writeDocsSchema(spark, path, 1L,
            withPartCols(docsOf(toks).schema))))
      } finally rows.unpersist()
      writeMarker(spark, path, Commit(1L, 0L, 0L, epochId))
    } finally toks.unpersist()
  }

  // ------------------------------------------------------- change --

  private def prefixListOf(term: Column, minPrefix: Int,
                           maxPrefix: Int): Column =
    transform(sequence(lit(minPrefix), least(lit(maxPrefix), length(term))),
      l => term.substr(lit(1), l))

  /** The ONE staged-commit mutation core every incremental op runs
    * through — [[append]] (adds only), [[delete]] (tombstones only),
    * [[upsert]] (both, the c18 CDC consumer): stage every artifact of
    * the change, then flip the marker. `flip=false` is the
    * crash-point test hook: everything staged, nothing visible.
    *
    * Exactness contract (what s18/s22 oracle-gate): the merged
    * vocab/stats are integer-exact old ± delta, deleted documents'
    * contributions are subtracted from exactly the rows they
    * originally added (read back from forward/docs), and the prefix
    * table re-ranks ONLY prefixes whose candidate set changed — so
    * serve-after-change is bit-equal to a full rebuild of the same
    * live corpus.
    *
    * Idempotence contract (the streaming at-least-once replay): batch
    * data writes are dynamic-partition overwrites of batch
    * `maxBatch+1` and versioned artifacts overwrite `seq+1` — both
    * derived from the COMMITTED marker, so re-staging after a crash
    * rewrites the same staging area and the flip commits it once.
    *
    * `compactNow` FUSES the change with a [[compact]] into ONE
    * commit: instead of staging a delta batch that an immediately-due
    * compaction would re-read and rewrite, every batch-partitioned
    * artifact stages its CONSOLIDATED live view — live(old, with the
    * change's deletes applied) ∪ the new batch — into batch
    * `maxBatch+1`, the small artifacts stage their merged values
    * once, tombstones reset, and the marker flips to
    * [newBatch, newBatch]. Serving is bit-equal to apply-then-compact
    * (same live rows, same merged vocab/stats/prefixes — compaction
    * carries those through unchanged); the epoch pays ONE write wave
    * and ONE marker flip, and the maintenance write amplification
    * halves. Same replay idempotence: the decision and the staging
    * targets derive only from the committed marker + the batch. */
  private[graft] def applyChange(path: String, delIds: Option[DataFrame],
                                 newDocs: Option[DataFrame],
                                 minPrefix: Int, maxPrefix: Int,
                                 kComplete: Int, epochId: Long,
                                 flip: Boolean,
                                 compactNow: Boolean = false): Unit = {
    newDocs.foreach(validateCorpus)
    val spark = delIds.orElse(newDocs).map(_.sparkSession)
      .getOrElse(throw new IllegalArgumentException(
        "applyChange needs deletes and/or new documents"))
    import spark.implicits._
    val c = commitOf(spark, path)
    val seq2 = c.seq + 1
    val newBatch = c.maxBatch + 1

    // ---- delete side: the dying docs' exact contributions, read
    // from the LIVE view (already-deleted ids contribute nothing, so
    // a double-delete is a no-op)
    val ids = delIds.map(_.select($"doc_id").distinct()
      .localCheckpoint(true))
    // the dying ids' bucket set prunes BOTH dead-side reads — one
    // tiny collect, shared (≤ DocBuckets values)
    val deadDbs = ids.map(_.select(dbucket($"doc_id")).distinct()
      .collect().map(_.getLong(0)).toSeq)
    val deadFwd = ids.map { i =>
      forwardLive(spark, path, c)
        .filter($"dbucket".isin(deadDbs.get: _*))
        .join(broadcast(i), "doc_id").persist()
    }
    val deadDocs = ids.map { i =>
      docsLive(spark, path, c)
        .filter($"dbucket".isin(deadDbs.get: _*))
        .join(broadcast(i), "doc_id")
        .select($"doc_id", $"dl", $"nlt", $"nlb")
    }

    // ---- add side
    val toks = newDocs.map(tokenize(_).persist())
    val addPost = toks.map(termRowsOf(_).persist())
    // METADATA SCHEMA EVOLUTION (vector/schema.go EnsureSchema's
    // AddProperty): a batch may carry NEW metadata columns — the
    // committed schema widens and older batches read them as NULL
    // (the explicit-schema read in readBatched); a batch may OMIT
    // known columns — its rows read them as NULL the same way. A
    // column re-arriving under a DIFFERENT type is the one illegal
    // shape (Weaviate rejects property type changes too).
    var docsSchema2 = docsSchemaOf(spark, path, c)
    // the frozen quantizer — read ONCE (a small parquet collect) and
    // shared by the vector-batch assign and the carry-forward, which
    // each paid their own read before
    val cents = readCents(spark, path, c)
    // the post-change tombstone view (lazy, tiny): what the
    // tombstones task writes on a plain change, and what the
    // consolidated reads apply when compacting in-commit
    val oldTomb = tombstonesOf(spark, path, c)
    val tomb2 = ids.fold(oldTomb) { i =>
      oldTomb.unionByName(i.withColumn("upto_batch", lit(c.maxBatch)))
        .groupBy($"doc_id").agg(max($"upto_batch").as("upto_batch"))
    }
    // consolidated-mode helpers: the live rows of an old artifact
    // with this change's deletes already applied, and the compact-
    // style one-file-per-bucket write into the consolidated batch
    def oldLive(name: String): DataFrame =
      liveRows(readBatched(spark, path, name, c), tomb2).drop("batch")
    def outConsolidated(df: DataFrame, name: String,
                        bucketCol: String): Unit =
      df.withColumn("batch", lit(newBatch))
        .repartition(col(bucketCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", bucketCol)
        .parquet(s"$path/$name")
    try {
      // driver-side schema-evolution work for the (≤ one) new batch:
      // the type checks, the case-canonical renames, the widened
      // committed schema
      val docsBatches = toks.map { t =>
        val docsBatch0 = docsOf(t)
        val incoming = withPartCols(docsBatch0.schema)
        // a NEW column arriving as all-NULL literals has no
        // resolvable property type (Spark NullType) and parquet
        // cannot write it — reject it at the evolution check with
        // the same loud property-types rule instead of failing
        // mid-append with an unsupported-data-type error
        incoming.fields.filterNot(f =>
            docsSchema2.fields.exists(_.name.equalsIgnoreCase(f.name)))
          .foreach { f =>
            require(f.dataType != org.apache.spark.sql.types.NullType,
              s"metadata column '${f.name}' arrives as untyped NULL " +
                "(NullType) — property types must be concrete; cast " +
                "the column before appending")
          }
        // name matching is CASE-INSENSITIVE, like Spark's own column
        // resolution — a case-variant arrival must hit the type
        // check, not silently commit a duplicate field that makes
        // every later explicit-schema docs read throw; and the batch
        // persists under the COMMITTED name, so the on-disk layout
        // stays canonical even if spark.sql.caseSensitive flips
        val renames = incoming.fields.flatMap { f =>
          docsSchema2.fields.find(_.name.equalsIgnoreCase(f.name))
            .map { ef =>
              require(ef.dataType == f.dataType,
                s"metadata column '${f.name}' arrives as ${f.dataType} " +
                  s"but the index holds ${ef.dataType} — property types " +
                  "cannot change")
              f.name -> ef.name
            }
        }.filter { case (from, to) => from != to }
        val docsBatch = renames.foldLeft(docsBatch0) {
          case (df, (from, to)) => df.withColumnRenamed(from, to)
        }
        docsSchema2 = org.apache.spark.sql.types.StructType(
          docsSchema2.fields ++ incoming.fields.filterNot(f =>
            docsSchema2.fields.exists(_.name.equalsIgnoreCase(f.name))))
        docsBatch
      }

      // per-batch write tasks: the postings write runs FIRST (it
      // materializes the shared toks/termRows caches — in
      // consolidated mode its old-live side rides the same job),
      // OVERLAPPED only with the delete side's forward read (the
      // vocab task's critical-path input, touching a different
      // artifact); the remaining artifacts join the ONE commit-wide
      // fan-out below
      def stagePostings(): Seq[() => Unit] =
        if (!compactNow)
          toks.zip(addPost).zip(docsBatches).toSeq.flatMap {
            case ((t, p), db) =>
              stageBatch(spark, path, newBatch, postingsView(p),
                fieldedView(p), db, dynamic = true) :+
                (() => writeVectorBatch(spark, path, newBatch,
                  vectorsOf(t), cents, dynamic = true))
          }
        else {
          val newPost = addPost.map(postingsView)
          outConsolidated(
            newPost.fold(oldLive("postings"))(p =>
              oldLive("postings").unionByName(
                p.withColumn("pbucket", pbucket($"term")))),
            "postings", "pbucket")
          val (fs, _) = hadoop(spark, path)
          Seq(
            () => outConsolidated(
              addPost.map(fieldedView).fold(oldLive("fielded"))(f =>
                oldLive("fielded").unionByName(
                  f.withColumn("pbucket", pbucket($"term")))),
              "fielded", "pbucket"),
            () => outConsolidated(
              newPost.map(_.select($"doc_id", $"term", $"tf")
                  .withColumn("dbucket", dbucket($"doc_id")))
                .fold(oldLive("forward"))(oldLive("forward").unionByName(_)),
              "forward", "dbucket"),
            () => outConsolidated(
              docsBatches.map(_.withColumn("dbucket", dbucket($"doc_id")))
                .fold(oldLive("docs"))(db => oldLive("docs")
                  .unionByName(db, allowMissingColumns = true)),
              "docs", "dbucket"),
            () => if (cents.nonEmpty && fs.exists(
                new org.apache.hadoop.fs.Path(s"$path/vectors")))
              outConsolidated(
                toks.map(t => vectorsOf(t).withColumn("cid",
                    Knn.nearestCentroidCol(spark,
                      graft.functions.VectorFunctions.asDouble($"v"),
                      cents)))
                  .fold(oldLive("vectors"))(oldLive("vectors").unionByName(_)),
                "vectors", "cid"))
        }
      var batchTasks: Seq[() => Unit] = Seq.empty
      graft.Par.run(Seq(
        () => batchTasks = stagePostings(),
        () => deadFwd.foreach(_.count(): Unit)))

      // Everything below stages an independent artifact of the same
      // commit: the remaining batch artifacts (fielded/forward/docs/
      // vectors — cache reads after the postings write materialized
      // the batch caches), the content batch, the vocab→prefixes
      // delta chain, the stats merge, the tombstone union and the two
      // carry-forwards share no outputs, so the WHOLE commit stages as
      // one wave of concurrent jobs — not a barrier per artifact
      // group — and the marker flips only after all of them returned.
      graft.Par.run(batchTasks ++ Seq(
        () =>
          if (!compactNow)
            newDocs.foreach(nd =>
              writeContentBatch(spark, path, newBatch, nd, dynamic = true))
          else outConsolidated(
            newDocs.map(_.select($"doc_id", $"text")
                .withColumn("dbucket", dbucket($"doc_id")))
              .fold(oldLive("content").select($"doc_id", $"text",
                $"dbucket"))(nd =>
                oldLive("content").select($"doc_id", $"text", $"dbucket")
                  .unionByName(nd)),
            "content", "dbucket"),

        // ---- vocab: old ∪ +batch dfs ∪ −dead dfs, integer-exact;
        // then prefixes: DELTA re-rank — only prefixes of terms
        // whose df changed (added, removed, or re-counted) can rank
        // differently; everything else merges through untouched, so
        // the append cost is batch-vocabulary-sized, not
        // corpus-vocabulary-sized.
        () => {
          val oldVocab = spark.read.parquet(s"$path/vocab/v=${c.seq}")
          val inc = addPost.map(_.groupBy($"term")
            .agg(count(lit(1)).as("df")))
          val dec = deadFwd.map(_.groupBy($"term")
            .agg((count(lit(1)) * -1L).as("df")))
          val mergedVocab = (Seq(oldVocab) ++ inc ++ dec)
            .reduce(_ unionByName _)
            .groupBy($"term").agg(sum($"df").as("df"))
            .filter($"df" > 0)
            .localCheckpoint(true)
          // the vocab write and the prefix delta re-rank both read
          // the checkpointed merge and write disjoint artifacts —
          // two concurrent jobs instead of a serial chain
          graft.Par.run(Seq(
            () => writeVersioned(mergedVocab, path, "vocab", seq2),
            () => {
              val changedTerms = (inc.toSeq ++ dec.toSeq)
                .map(_.select($"term"))
                .reduce(_ unionByName _).distinct()
              val affected = changedTerms
                .filter(length($"term") >= minPrefix)
                .select(explode(prefixListOf($"term", minPrefix,
                  maxPrefix)).as("prefix"))
                .distinct().localCheckpoint(true)
              val cand = mergedVocab.filter(length($"term") >= minPrefix)
                .select($"term", $"df",
                  explode(prefixListOf($"term", minPrefix, maxPrefix))
                    .as("prefix"))
                .join(broadcast(affected), "prefix")
              val wP = Window.partitionBy($"prefix")
                .orderBy($"df".desc, $"term")
              val reRanked = cand
                .withColumn("rank", row_number().over(wP))
                .filter($"rank" <= kComplete)
                .select($"prefix", $"rank".cast("long").as("rank"),
                  $"term", $"df")
              val oldPrefixes =
                spark.read.parquet(s"$path/prefixes/v=${c.seq}")
              writeVersioned(
                oldPrefixes.join(broadcast(affected), Seq("prefix"),
                    "left_anti")
                  .unionByName(reRanked),
                path, "prefixes", seq2)
            }))
        },

        // ---- stats: exact integer-valued sums add and subtract
        () => {
          val oldStats = spark.read.parquet(s"$path/stats/v=${c.seq}")
          val incStats = toks.map(batchStatsOf)
          val decStats = deadDocs.map(_.agg(
            (count(lit(1)) * -1L).as("n_docs"),
            (coalesce(sum($"dl"), lit(0.0)) * -1.0).as("sum_dl"),
            (coalesce(sum($"nlt"), lit(0L)) * -1L).as("slt"),
            (coalesce(sum($"nlb"), lit(0L)) * -1L).as("slb")))
          writeVersioned(
            (Seq(oldStats) ++ incStats ++ decStats)
              .reduce(_ unionByName _)
              .agg(sum($"n_docs").as("n_docs"),
                sum($"sum_dl").as("sum_dl"),
                sum($"slt").as("slt"), sum($"slb").as("slb")),
            path, "stats", seq2)
        },

        // ---- tombstones: deleted ids die in every batch ≤ the
        // commit they were deleted at; a re-add lands in a HIGHER
        // batch and is live without touching the tombstone. A
        // consolidated commit physically dropped every dead row, so
        // its tombstone list resets (compact's contract).
        () => writeVersioned(
          if (compactNow) emptyTombstones(spark) else tomb2,
          path, "tombstones", seq2),

        // quantizer carries forward frozen; the docs schema carries
        // forward possibly WIDENED (the AddProperty merge above)
        () => writeCents(spark, path, seq2, cents),
        () => writeDocsSchema(spark, path, seq2, docsSchema2)))

      if (flip)
        writeMarker(spark, path,
          if (compactNow)
            Commit(seq2, newBatch, newBatch, math.max(epochId, c.lastEpoch))
          else Commit(seq2, c.minBatch,
            if (newDocs.isDefined) newBatch else c.maxBatch,
            math.max(epochId, c.lastEpoch)))
    } finally {
      addPost.foreach(_.unpersist())
      toks.foreach(_.unpersist())
      deadFwd.foreach(_.unpersist())
    }
  }

  /** INCREMENTAL index maintenance — the appendToIvfIndex contract
    * for the text index, with a stronger guarantee the ANN side can't
    * give: the merge is EXACT, so serve-after-append is BIT-EQUAL to
    * a full rebuild (s18's oracle gates it end to end). Contract:
    * batch doc_ids are NEW — re-ingesting an existing id goes through
    * [[upsert]], which tombstones the old copy first. */
  def append(newDocs: DataFrame, path: String, minPrefix: Int = 2,
             maxPrefix: Int = 4, kComplete: Int = 3,
             epochId: Long = -1L): Unit =
    applyChange(path, None, Some(newDocs), minPrefix, maxPrefix,
      kComplete, epochId, flip = true)

  /** DELETE documents from the index — the store's
    * DeleteChunksByURL/BySourceID analog (store.go): tombstone the
    * ids, subtract their exact term/length contributions from
    * vocab/stats, delta-re-rank the touched prefixes. One commit;
    * serving after it is bit-equal to a rebuild without the docs. */
  def delete(ids: DataFrame, path: String, minPrefix: Int = 2,
             maxPrefix: Int = 4, kComplete: Int = 3): Unit =
    applyChange(path, Some(ids), None, minPrefix, maxPrefix,
      kComplete, epochId = -1L, flip = true)

  /** Resolve live doc_ids by ANDed metadata equalities on the
    * index's OWN `docs/` side table — how the reference addresses
    * its store mutations (DeleteChunksByURL store.go:73,
    * DeleteChunksBySourceID store.go:93, both keyed on metadata):
    * one narrow pruned read with the equalities pushed to parquet,
    * zero corpus access. Materialized (localCheckpoint) because the
    * caller is about to MUTATE the same store the ids came from. */
  def idsByMeta(spark: SparkSession, path: String,
                filters: Map[String, String]): DataFrame = {
    import spark.implicits._
    require(filters.nonEmpty, "idsByMeta needs at least one equality")
    val c = commitOf(spark, path)
    filters.foldLeft(docsLive(spark, path, c)) {
      case (df, (kc, v)) => df.filter(col(kc) === v)
    }.select($"doc_id").localCheckpoint(true)
  }

  /** DELETE BY METADATA — the reference's actual mutation addressing
    * (store.go:73 DeleteChunksByURL = source+url equality, :93
    * DeleteChunksBySourceID = source equality) composed end to end:
    * [[idsByMeta]] resolves the doc_ids from the index's own
    * metadata, then the standard tombstone [[delete]] applies them
    * in ONE commit. Returns the number of documents deleted (the
    * affected-count the reference's handlers report); zero matches
    * is a no-op, not an error. */
  def deleteByMeta(spark: SparkSession, path: String,
                   filters: Map[String, String], minPrefix: Int = 2,
                   maxPrefix: Int = 4, kComplete: Int = 3): Long = {
    val ids = idsByMeta(spark, path, filters)
    val n = ids.count()
    if (n > 0) delete(ids, path, minPrefix, maxPrefix, kComplete)
    n
  }

  /** UPSERT — delete + append in ONE commit: the consumer of c18's
    * change detection (result_consumer.go:196-198 re-processes
    * `changed` pages), closing the CDC loop a pure append index
    * can't. Existing copies of the batch's doc_ids are tombstoned
    * (ids absent from the index tombstone vacuously) and the new
    * text lands as a fresh batch; vocab/stats/prefixes carry the
    * exact net change. s22 gates serve-after-upsert against the
    * scan query's own oracle. */
  /** SYNC — a CDC consumer's WHOLE epoch in one commit
    * (result_consumer.go:196-198: re-process changed/new pages, drop
    * deleted ones): the upsert batch's ids AND the delete ids
    * tombstone together, the fresh docs land as one new batch, one
    * marker flips. Splitting this into upsert-then-delete would
    * leave a crash window where half the epoch is visible and the
    * replay guard (which records one epoch id per commit) cannot
    * cover the other half. */
  def sync(docs: DataFrame, delIds: DataFrame, path: String,
           minPrefix: Int = 2, maxPrefix: Int = 4, kComplete: Int = 3,
           epochId: Long = -1L): Unit = {
    import docs.sparkSession.implicits._
    applyChange(path,
      Some(docs.select($"doc_id").unionByName(delIds.select($"doc_id"))),
      Some(docs), minPrefix, maxPrefix, kComplete, epochId, flip = true)
  }

  def upsert(docs: DataFrame, path: String, minPrefix: Int = 2,
             maxPrefix: Int = 4, kComplete: Int = 3,
             epochId: Long = -1L): Unit = {
    import docs.sparkSession.implicits._
    applyChange(path, Some(docs.select($"doc_id")), Some(docs),
      minPrefix, maxPrefix, kComplete, epochId, flip = true)
  }

  /** The count-gated auto-compaction decision of [[maybeCompact]]
    * evaluated on the WOULD-BE post-commit state of a change (exact:
    * the batch count is arithmetic off the marker, the post-commit
    * tombstone id set is old ∪ deletes distinct), fused into the
    * change's OWN commit when due (`compactNow`) — the streaming
    * epoch's entry: one write wave and one marker flip instead of
    * apply + a full compact that re-reads every artifact the apply
    * just wrote. Serving is bit-equal either way ([[compact]]'s
    * contract); returns whether the commit consolidated. */
  private[graft] def applyChangeAuto(path: String,
                                     delIds: Option[DataFrame],
                                     newDocs: Option[DataFrame],
                                     epochId: Long,
                                     maxTombstones: Long,
                                     maxBatches: Long,
                                     minPrefix: Int = 2, maxPrefix: Int = 4,
                                     kComplete: Int = 3): Boolean = {
    val spark = delIds.orElse(newDocs).map(_.sparkSession)
      .getOrElse(throw new IllegalArgumentException(
        "applyChangeAuto needs deletes and/or new documents"))
    import spark.implicits._
    val c = commitOf(spark, path)
    val batchesAfter =
      (if (newDocs.isDefined) c.maxBatch + 1 else c.maxBatch) -
        c.minBatch + 1
    val due = batchesAfter > maxBatches || {
      val oldIds = tombstonesOf(spark, path, c).select($"doc_id")
      delIds.fold(oldIds)(i =>
          oldIds.unionByName(i.select($"doc_id")).distinct())
        .count() > maxTombstones
    }
    applyChange(path, delIds, newDocs, minPrefix, maxPrefix, kComplete,
      epochId, flip = true, compactNow = due)
    due
  }

  /** [[append]] with the auto-compaction decision fused into the same
    * commit — [[graft.streaming.IngestStream.indexStream]]'s epoch. */
  def appendAuto(newDocs: DataFrame, path: String, epochId: Long,
                 maxTombstones: Long = 10000L,
                 maxBatches: Long = 16L): Boolean =
    applyChangeAuto(path, None, Some(newDocs), epochId, maxTombstones,
      maxBatches)

  /** [[upsert]] with the auto-compaction decision fused into the same
    * commit — the update stream's epoch. */
  def upsertAuto(docs: DataFrame, path: String, epochId: Long,
                 maxTombstones: Long = 10000L,
                 maxBatches: Long = 16L): Boolean = {
    import docs.sparkSession.implicits._
    applyChangeAuto(path, Some(docs.select($"doc_id")), Some(docs),
      epochId, maxTombstones, maxBatches)
  }

  /** [[sync]] with the auto-compaction decision fused into the same
    * commit — the CDC stream's epoch. */
  def syncAuto(docs: DataFrame, delIds: DataFrame, path: String,
               epochId: Long, maxTombstones: Long = 10000L,
               maxBatches: Long = 16L): Boolean = {
    import docs.sparkSession.implicits._
    applyChangeAuto(path,
      Some(docs.select($"doc_id").unionByName(delIds.select($"doc_id"))),
      Some(docs), epochId, maxTombstones, maxBatches)
  }

  // --------------------------------------------------- live reads --

  private def tombstonesOf(spark: SparkSession, path: String,
                           c: Commit): DataFrame =
    spark.read.parquet(s"$path/tombstones/v=${c.seq}")

  /** Tombstone semantics: a row (from partition `batch`) is live iff
    * no tombstone for its doc_id covers that batch. Broadcast left
    * join — the tombstone list is bounded by deletes-since-compaction
    * and [[compact]] resets it. */
  private def liveRows(df: DataFrame, tomb: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.join(broadcast(tomb), Seq("doc_id"), "left")
      .filter($"upto_batch".isNull || $"batch" > $"upto_batch")
      .drop("upto_batch")
  }

  private def readBatched(spark: SparkSession, path: String, name: String,
                          c: Commit): DataFrame = {
    import spark.implicits._
    val r =
      if (name == "docs")
        // the COMMITTED schema applies explicitly: batches written
        // before a metadata column evolved into the index read it as
        // NULL (parquet's missing-column contract), and the plan
        // never pays per-query mergeSchema footer reads
        spark.read.schema(docsSchemaOf(spark, path, c))
          .parquet(s"$path/docs")
      else spark.read.parquet(s"$path/$name")
    r.filter($"batch".between(c.minBatch, c.maxBatch))
  }

  private[graft] def forwardLive(spark: SparkSession, path: String,
                                 c: Commit): DataFrame =
    liveRows(readBatched(spark, path, "forward", c),
      tombstonesOf(spark, path, c))

  private[graft] def docsLive(spark: SparkSession, path: String,
                              c: Commit): DataFrame =
    liveRows(readBatched(spark, path, "docs", c),
      tombstonesOf(spark, path, c))

  // accessor views for specs/tools — resolved at the current commit
  def vocabTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/vocab/v=${commitOf(spark, path).seq}")

  def statsTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats/v=${commitOf(spark, path).seq}")

  def prefixesTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/prefixes/v=${commitOf(spark, path).seq}")

  def forwardTable(spark: SparkSession, path: String): DataFrame =
    forwardLive(spark, path, commitOf(spark, path))

  def docsTable(spark: SparkSession, path: String): DataFrame =
    docsLive(spark, path, commitOf(spark, path))

  /** The term-hash buckets of a bounded query-term list, computed
    * through the SAME expression the writer partitioned with (a
    * driver-side reimplementation could drift from Spark's
    * xxhash64). */
  private def bucketsOf(spark: SparkSession, terms: Seq[String]): Seq[Long] = {
    import spark.implicits._
    terms.toDF("term").select(pbucket($"term")).distinct()
      .collect().map(_.getLong(0)).toSeq
  }

  /** Load the query terms' live postings — batch range + bucket
    * directories pruned via the partition columns, term equality
    * pushed into row groups, tombstones applied. */
  private def postingsFor(spark: SparkSession, path: String,
                          terms: Seq[String], c: Commit): DataFrame = {
    import spark.implicits._
    liveRows(
      readBatched(spark, path, "postings", c)
        .filter($"pbucket".isin(bucketsOf(spark, terms): _*) &&
          $"term".isin(terms: _*)),
      tombstonesOf(spark, path, c))
  }

  /** One-row (df_0.., <stats cols>) frame for the query terms: df
    * from the vocab table, corpus counts from the stats row. */
  private def statsFor(spark: SparkSession, path: String,
                       terms: Seq[String], c: Commit,
                       extra: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(max(when($"term" === t, $"df")), lit(0L)).cast("double")
        .as(s"df_$i")
    }
    val vocabDf = spark.read.parquet(s"$path/vocab/v=${c.seq}")
      .filter($"term".isin(terms: _*))
      .agg(dfCols.head, dfCols.tail: _*)
    vocabDf.crossJoin(
      extra(spark.read.parquet(s"$path/stats/v=${c.seq}")))
  }

  // ------------------------------------------------------- serving --

  /** s1 served FROM the index: postings of the query terms (pruned
    * scan) reshape into the scan path's (doc_id, dl, tf_i) base, the
    * stats row comes from vocab + the persisted counts, and the
    * SHARED scorer runs — bit-equal to HybridSearch.bm25Scores. */
  def bm25Serve(spark: SparkSession, path: String,
                queryTerms: Seq[String]): DataFrame = {
    import spark.implicits._
    require(queryTerms.nonEmpty, "bm25Serve needs at least one query term")
    val c = commitOf(spark, path)
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when($"term" === t, $"tf")), lit(0L)).cast("double")
        .as(s"tf_$i")
    }
    val base = postingsFor(spark, path, queryTerms, c)
      .groupBy($"doc_id", $"dl")
      .agg(tfCols.head, tfCols.tail: _*)
    val stats = statsFor(spark, path, queryTerms, c, s =>
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
    val c = commitOf(spark, path)
    val tfCols = queryTerms.zipWithIndex.flatMap { case (t, i) => Seq(
      coalesce(sum(when($"term" === t, $"tt")), lit(0L)).cast("double")
        .as(s"tt_$i"),
      coalesce(sum(when($"term" === t, $"bt")), lit(0L)).cast("double")
        .as(s"bt_$i"))
    }
    val base = liveRows(
        readBatched(spark, path, "fielded", c)
          .filter($"pbucket".isin(bucketsOf(spark, queryTerms): _*) &&
            $"term".isin(queryTerms: _*)),
        tombstonesOf(spark, path, c))
      .groupBy($"doc_id", $"nlt", $"nlb")
      .agg(tfCols.head, tfCols.tail: _*)
    val stats = statsFor(spark, path, queryTerms, c, s =>
      s.select($"n_docs".cast("double").as("n_docs"),
        ($"slt".cast("double") / $"n_docs".cast("double")).as("avgdlt"),
        ($"slb".cast("double") / $"n_docs".cast("double")).as("avgdlb")))
    HybridSearch.scoreFielded(base, stats, queryTerms.size,
      wTitle, wBody, limit)
  }

  /** s5's metadata-filtered term search served FROM the index
    * (store.go:133-150's equality filters in the store-served mode):
    * the term's postings are a bucket-pruned read; the ANDed equality
    * filters evaluate on the `docs/` metadata side table (a
    * doc-count-sized narrow scan with the equalities pushed into
    * parquet) and semi-join the postings BEFORE ranking — so the
    * result is filter-then-rank, the a16 filtered-ANN rule applied to
    * the text side. Returns (doc_id, tf, metadata…) ranked by tf. */
  def filteredServe(spark: SparkSession, path: String, term: String,
                    filters: Map[String, String], k: Int = 20): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val post = postingsFor(spark, path, Seq(term), c)
      .select($"doc_id", $"tf")
    val meta = filters.foldLeft(docsLive(spark, path, c)) {
      case (df, (kc, v)) => df.filter(col(kc) === v)
    }
    val metaCols = meta.columns.filterNot(InternalDocCols)
    post.join(meta.select($"doc_id" +: metaCols.map(col): _*), "doc_id")
      .orderBy($"tf".desc, $"doc_id")
      .limit(k)
  }

  /** Bookkeeping columns of the `docs/` side table — everything else
    * is user metadata that rides through the serving calls. */
  private val InternalDocCols =
    Set("doc_id", "dl", "nlt", "nlb", "dbucket", "batch")

  /** Store-served CHUNK RETRIEVAL — GetChunksByURL's read shape
    * (store.go:311-335) answered from the persisted artifacts with
    * ZERO corpus access: the ANDed metadata equalities evaluate on
    * the narrow `docs/` side table (equalities pushed to parquet),
    * and only the surviving ids join the STORED FIELDS for their
    * text. Returns (doc_id, metadata…, text); callers order by their
    * chunk-index column (doc_id here — the c6 convention). */
  def chunksServe(spark: SparkSession, path: String,
                  filters: Map[String, String]): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val meta = filters.foldLeft(docsLive(spark, path, c)) {
      case (df, (kc, v)) => df.filter(col(kc) === v)
    }
    val metaCols = meta.columns.filterNot(InternalDocCols)
    meta.select($"doc_id" +: metaCols.map(col): _*)
      .join(liveRows(readBatched(spark, path, "content", c),
        tombstonesOf(spark, path, c)).select($"doc_id", $"text"), "doc_id")
  }

  /** One KEYSET PAGE of store-served chunks — GetChunks(sourceID,
    * limit, offset)'s cursor form (store.go:238-270): rows strictly
    * after `after` in doc_id order. The top-n cut runs on the NARROW
    * `docs/` scan (no global sort, no content read), then only the
    * ≤`limit` page rows join the stored fields — the page cost is
    * independent of the source's size. */
  def pageChunksServe(spark: SparkSession, path: String,
                      filters: Map[String, String],
                      after: Option[Long], limit: Int): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val meta = filters.foldLeft(docsLive(spark, path, c)) {
      case (df, (kc, v)) => df.filter(col(kc) === v)
    }
    val metaCols = meta.columns.filterNot(InternalDocCols)
    val page = after.fold(meta)(a => meta.filter($"doc_id" > a))
      .select($"doc_id" +: metaCols.map(col): _*)
      .orderBy($"doc_id").limit(limit)
    page.join(liveRows(readBatched(spark, path, "content", c),
        tombstonesOf(spark, path, c)).select($"doc_id", $"text"), "doc_id")
      .orderBy($"doc_id")
  }

  /** Store-served per-group chunk counts — CountChunks(+BySource)
    * (store.go:407/:440) from the `docs/` side table alone: a
    * narrow grouped count over live metadata rows, no content read,
    * no corpus access. */
  def countChunksServe(spark: SparkSession, path: String,
                       groupCol: String): DataFrame = {
    import spark.implicits._
    docsLive(spark, path, commitOf(spark, path))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_chunks"))
  }

  /** The stored-vector rows a serve's vector leg reads: ALL cells
    * when `nprobe` covers them (the exact mode every vector oracle
    * replays), else only the union of the query vectors' nprobe
    * nearest cell partitions — `cid IN (...)` reaches the scan as a
    * PartitionFilter, so at 100 TB a pruned serve touches nprobe
    * directories per query instead of the whole vectors artifact.
    * `qvec` may carry MANY rows (the batch serve): the probe set is
    * the distinct union, so each query's own cells are always
    * included (per-query results are a superset of single-query
    * pruning — recall only improves). Bounded collect: ≤ |cells|. */
  private def probedVectorRows(spark: SparkSession, path: String,
                               c: Commit, qvec: DataFrame,
                               cents: Seq[Seq[Double]],
                               nprobe: Int): DataFrame = {
    import spark.implicits._
    val cells0 = readBatched(spark, path, "vectors", c)
    if (nprobe >= cents.length) cells0
    else {
      // (−score, index) ascending = score desc, index ASC on ties —
      // the same first-max tie-break assign() writes cells with, so
      // a probe of a duplicated/tied centroid reads the cell the
      // rows actually landed in
      val probed = qvec
        .select(explode(slice(array_sort(zip_with(
          Knn.centroidScoresCol(spark,
            graft.functions.VectorFunctions.asDouble($"qv"), cents),
          sequence(lit(0), lit(cents.length - 1)),
          (s, i) => Knn.probeKey(s, i))), 1, nprobe)).as("pr"))
        .select($"pr"("i"))
        .distinct()
        .collect().map(_.getInt(0)).toSeq
      cells0.filter($"cid".isin(probed: _*))
    }
  }

  /** The persisted hybrid VECTOR leg: cosine of the stored poly-BoW
    * document vectors against the query-term vector, top-`candidates`
    * — the serve-from-store twin of HybridSearch.hybrid's vector leg.
    * `nprobe` < [[VectorCells]] reads only the query's nearest cells
    * (partition-pruned, the IVF trade); `nprobe` ≥ cells is the exact
    * scan the s21 oracle replays. */
  def vectorServe(spark: SparkSession, path: String,
                  queryTerms: Seq[String], candidates: Int = 50,
                  nprobe: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val c = commitOf(spark, path)
    val cents = readCents(spark, path, c)
    val queryTok = array(queryTerms.map(lit): _*)
    val qvec = spark.range(1)
      .select(queryTok.as("tok"))
      .select(expr("poly_bow(tok, 64)").as("qv"))
    if (cents.isEmpty)
      // keyword-only index: empty leg (fusion treats it as absent)
      return spark.range(0).select($"id".as("doc_id"),
        lit(0.0).as("v_score"))
    val cells = probedVectorRows(spark, path, c, qvec, cents, nprobe)
    liveRows(cells, tombstonesOf(spark, path, c))
      .crossJoin(broadcast(qvec))
      .select($"doc_id",
        graft.functions.VectorFunctions.cosineD($"v", $"qv").as("v_score"))
      .orderBy($"v_score".desc, $"doc_id").limit(candidates)
  }

  /** HYBRID search served FROM the persisted index — the reference's
    * actual serving call (retrieval/service.go:23-47 over the
    * persisted Weaviate index, store.go:105): the BM25 leg reads the
    * postings artifacts, the vector leg reads the stored document
    * vectors, and the two fuse with the SAME alpha-weighted fusion
    * expression the scan path runs (HybridSearch.fuseRelative /
    * fuseRanked — Weaviate's relativeScoreFusion and rankedFusion),
    * so store-served hybrid is bit-equal to the scan-path hybrid and
    * s21/s24 reuse s3/s6's oracles verbatim. */
  def hybridServe(spark: SparkSession, path: String,
                  queryTerms: Seq[String], alpha: Double = 0.5,
                  limit: Int = 10, fusion: String = "relative",
                  candidates: Int = 50,
                  nprobe: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    require(fusion == "relative" || fusion == "ranked",
      s"fusion must be 'relative' or 'ranked', got '$fusion'")
    val kw = bm25Serve(spark, path, queryTerms)
      .orderBy($"score".desc, $"doc_id").limit(candidates)
      .select($"doc_id", $"score".as("kw_score"))
    val vec = vectorServe(spark, path, queryTerms, candidates, nprobe)
    if (fusion == "ranked") HybridSearch.fuseRanked(kw, vec, alpha, limit)
    else HybridSearch.fuseRelative(kw, vec, alpha, limit)
  }

  /** The reference's FULL serving signature from the store —
    * Search(query, alpha, limit, FILTERS) (retrieval/service.go:23-47
    * passes the filter set into the hybrid Weaviate query,
    * store.go:133-150): ANDed metadata equalities restrict BOTH legs
    * BEFORE ranking, and — matching GraftEngine.search's
    * filter-first semantics — the BM25 statistics (n_docs, avgdl,
    * df) are those of the FILTERED corpus, computed here entirely
    * from the store artifacts: the filtered doc set and its exact
    * length sums come from the `docs/` side table (one narrow scan,
    * equalities pushed to parquet), per-term df from the semi-joined
    * postings base — no corpus scan, no global-stats approximation.
    * Both legs then fuse through the scan path's shared fusion
    * expression, so the filtered store-serve is bit-equal to the
    * scan pipeline over the filtered corpus (s25's oracle). */
  def filteredHybridServe(spark: SparkSession, path: String,
                          queryTerms: Seq[String],
                          filters: Map[String, String],
                          alpha: Double = 0.5, limit: Int = 10,
                          fusion: String = "relative",
                          candidates: Int = 50,
                          nprobe: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    require(fusion == "relative" || fusion == "ranked",
      s"fusion must be 'relative' or 'ranked', got '$fusion'")
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val c = commitOf(spark, path)
    // the filtered doc set, persisted once per serve call: both legs
    // and both stats aggregates read it
    val fdocs = graft.Caches.persist(
      filters.foldLeft(docsLive(spark, path, c)) {
        case (df, (kc, v)) => df.filter(col(kc) === v)
      }.select($"doc_id", $"dl"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when($"term" === t, $"tf")), lit(0L)).cast("double")
        .as(s"tf_$i")
    }
    val base = graft.Caches.persist(
      postingsFor(spark, path, queryTerms, c)
        .join(fdocs.select($"doc_id"), Seq("doc_id"), "left_semi")
        .groupBy($"doc_id", $"dl")
        .agg(tfCols.head, tfCols.tail: _*))
    // filtered-corpus stats: exact integer-valued sums, so avg(dl)
    // over the filtered scan reproduces bit-for-bit
    val corpus = fdocs.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum($"dl") / count(lit(1)).cast("double")).as("corpus_avgdl"))
    val dfAggs = queryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val stats = base.agg(dfAggs.head, dfAggs.tail: _*).crossJoin(corpus)
    val kw = HybridSearch.scoreBm25(base, stats, queryTerms.size)
      .orderBy($"score".desc, $"doc_id").limit(candidates)
      .select($"doc_id", $"score".as("kw_score"))
    val queryTok = array(queryTerms.map(lit): _*)
    val qvec = spark.range(1)
      .select(queryTok.as("tok"))
      .select(expr("poly_bow(tok, 64)").as("qv"))
    val cents = readCents(spark, path, c)
    val vec =
      if (cents.isEmpty)
        // keyword-only index: empty leg (fusion treats it as absent —
        // the vectorServe degrade, so a filtered serve on an
        // indexStream-built index answers its BM25 leg instead of
        // throwing on the missing vectors artifact)
        spark.range(0).select($"id".as("doc_id"), lit(0.0).as("v_score"))
      else
        liveRows(probedVectorRows(spark, path, c, qvec, cents, nprobe),
            tombstonesOf(spark, path, c))
          .join(fdocs.select($"doc_id"), Seq("doc_id"), "left_semi")
          .crossJoin(broadcast(qvec))
          .select($"doc_id",
            graft.functions.VectorFunctions.cosineD($"v", $"qv").as("v_score"))
          .orderBy($"v_score".desc, $"doc_id").limit(candidates)
    if (fusion == "ranked") HybridSearch.fuseRanked(kw, vec, alpha, limit)
    else HybridSearch.fuseRelative(kw, vec, alpha, limit)
  }

  /** Per-term live position lists of a phrase/proximity query,
    * inner-joined doc-keyed RAREST TERM FIRST (df ascending from the
    * persisted vocab — Lucene's conjunction-order heuristic: the
    * first join's build side is the smallest posting list, so every
    * later join only probes docs already carrying the rarest term).
    * Each UNIQUE term contributes one pruned postings read; a
    * repeated term reuses its column. Returns the joined frame plus
    * the term → position-column map the chain predicate reads in
    * TEXT order (join order and chain order are independent — the
    * joins are all inner on doc_id, so reordering them is safe). */
  private def positionsJoined(spark: SparkSession, path: String,
                              terms: Seq[String], c: Commit)
      : (DataFrame, Map[String, String]) = {
    import spark.implicits._
    val uniq = terms.distinct
    val post = postingsFor(spark, path, uniq, c)
    val dfs = spark.read.parquet(s"$path/vocab/v=${c.seq}")
      .filter($"term".isin(uniq: _*))
      .select($"term", $"df".cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val colOf = uniq.zipWithIndex
      .map { case (t, i) => t -> s"pos_$i" }.toMap
    val frames = uniq.sortBy(t => (dfs.getOrElse(t, 0L), t)).map { t =>
      post.filter($"term" === t).select($"doc_id", $"pos".as(colOf(t)))
    }
    (frames.reduce(_.join(_, "doc_id")), colOf)
  }

  /** s7/s19 served FROM the positional index — Lucene PhraseQuery's
    * n-term mechanics (the reference's phrase mode generalised past
    * two terms): the candidate set starts as term 1's position list
    * and each hop keeps only positions one past a surviving prefix
    * end (`array_intersect` of the +1-shifted candidates with the
    * next term's list — a codegen set probe per hop, no explode),
    * so after the last hop a non-empty set marks a doc carrying the
    * FULL adjacent phrase. Survivors semi-join the SHARED BM25
    * scorer over the phrase's distinct terms. Cost at any corpus
    * size: one pruned posting read per unique term + (n-1) doc-keyed
    * joins ordered rarest-first — the corpus text is never touched,
    * which is the whole point of a positional index. */
  def phraseServe(spark: SparkSession, path: String,
                  terms: Seq[String], k: Int = 20): DataFrame = {
    import spark.implicits._
    require(terms.nonEmpty, "phraseServe needs at least one term")
    val c = commitOf(spark, path)
    val (joined, colOf) = positionsJoined(spark, path, terms, c)
    val chain = terms.tail.foldLeft(col(colOf(terms.head))) { (prev, t) =>
      array_intersect(transform(prev, p => p + 1), col(colOf(t)))
    }
    val survivors = joined.filter(size(chain) > 0).select($"doc_id")
    bm25Serve(spark, path, terms.distinct)
      .join(survivors, Seq("doc_id"), "left_semi")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }


  /** ORDERED-PROXIMITY search from the positional index — Lucene's
    * `"t1 t2 … tn"~slop` query mode chained term by term: each term
    * must follow a surviving occurrence of the PREVIOUS term within
    * `slop` token positions (slop = 1 degenerates to
    * [[phraseServe]]'s adjacency). Each hop is a positional filter
    * keeping the next term's positions inside some candidate's slop
    * window (a nested set probe over two bounded position lists —
    * never the corpus, never an explode), so candidates stay REAL
    * match endpoints and a later term cannot pair with a prefix that
    * already failed. Scoring and ranking are the shared BM25 path;
    * the oracle replays the windowed chain from token arrays. */
  def proximityServe(spark: SparkSession, path: String,
                     terms: Seq[String], slop: Int,
                     k: Int = 20): DataFrame = {
    import spark.implicits._
    require(terms.nonEmpty, "proximityServe needs at least one term")
    require(slop >= 1, s"slop must be >= 1, got $slop")
    val c = commitOf(spark, path)
    val (joined, colOf) = positionsJoined(spark, path, terms, c)
    // fully qualified: the local `exists(spark, path)` index probe
    // shadows the sql.functions HOF
    val F = org.apache.spark.sql.functions
    val chain = terms.tail.foldLeft(col(colOf(terms.head))) { (prev, t) =>
      F.filter(col(colOf(t)), q =>
        F.exists(prev, p => q - p >= 1 && q - p <= slop))
    }
    val survivors = joined.filter(size(chain) > 0).select($"doc_id")
    bm25Serve(spark, path, terms.distinct)
      .join(survivors, Seq("doc_id"), "left_semi")
      .orderBy($"score".desc, $"doc_id")
      .limit(k)
  }


  /** s11's corrector over the PERSISTED vocabulary. */
  def correctionsServe(spark: SparkSession, path: String,
                       probes: Seq[String], k: Int = 3): DataFrame =
    HybridSearch.fuzzyCorrections(vocabTable(spark, path), probes, k)

  /** s15's completions from the PERSISTED ranked prefix table — a
    * point lookup, no recompute. */
  def completeServe(spark: SparkSession, path: String,
                    prefixes: Seq[String]): DataFrame = {
    import spark.implicits._
    prefixesTable(spark, path)
      .filter($"prefix".isin(prefixes: _*))
      .select($"prefix", $"rank", $"term", $"df")
      .orderBy($"prefix", $"rank")
  }

  /** s16 served FROM the index: the seed's term vector comes from
    * the doc-bucket-pruned FORWARD index (tf·ln(N/df) salience,
    * identical types and tie-break to the scan path's mltTerms),
    * then the mined terms serve through [[bm25Serve]]. A seed absent
    * from the index (or fully deleted) yields the empty result, not
    * an error. */
  def moreLikeThisServe(spark: SparkSession, path: String, seedId: Long,
                        nTerms: Int = 5, k: Int = 10): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val seedTf = forwardLive(spark, path, c)
      .filter($"dbucket" === dbucketOf(seedId) && $"doc_id" === seedId)
      .select($"term", $"tf".as("tf_seed"))
    val nDocs = spark.read.parquet(s"$path/stats/v=${c.seq}")
      .select($"n_docs".cast("double").as("n_docs"))
    val terms = spark.read.parquet(s"$path/vocab/v=${c.seq}")
      .join(broadcast(seedTf), "term")
      .crossJoin(broadcast(nDocs))
      .select($"term", ($"tf_seed" * log($"n_docs" / $"df")).as("escore"))
      .orderBy($"escore".desc, $"term").limit(nTerms)
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty)
      spark.range(0).select($"id".as("doc_id"), lit(0.0).as("score"))
    else
      bm25Serve(spark, path, terms)
        .filter($"doc_id" =!= seedId)
        .orderBy($"score".desc, $"doc_id").limit(k)
        .select($"doc_id", $"score")
  }

  /** Stored-fields view at the current commit (doc_id, text). */
  def contentTable(spark: SparkSession, path: String): DataFrame =
    liveRows(readBatched(spark, path, "content", commitOf(spark, path)),
      tombstonesOf(spark, path, commitOf(spark, path)))

  /** The stored-fields rows of an id SET (DataFrame form — the CDC
    * stream's change-detect read, where the batch can be too large
    * to collect): the ids' dbuckets collect (bounded ≤ [[DocBuckets]]
    * values) into partition filters and the id match stays a
    * DISTRIBUTED semi join inside the pruned buckets —
    * contentForIds' pruning without its driver-side id collect. */
  def contentForIdSet(spark: SparkSession, path: String,
                      ids: DataFrame): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val idCol = ids.select($"doc_id")
    val dbs = idCol.select(dbucket($"doc_id").as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    liveRows(readBatched(spark, path, "content", c)
        .filter($"dbucket".isin(dbs: _*)),
      tombstonesOf(spark, path, c))
      .join(idCol, Seq("doc_id"), "left_semi")
      .select($"doc_id", $"text")
  }

  /** RENDER a ranked hit list from the STORED FIELDS — the
    * SearchResult.Content contract (retrieval/service.go:11,114-120:
    * every hit returns chunk content to the client and the reranker)
    * served without the corpus: the top-k ids become dbucket
    * partition filters + doc_id row-group pushdown on `content/`
    * (≤k rows read), then the SHARED snippet windowing runs
    * (HybridSearch.snippetsOf — best `window`-token span of query-
    * term coverage, head fallback for vector-only hits). `ranked`
    * must carry doc_id; all its columns ride through. The id
    * collect is k-bounded — the request/response boundary, same as
    * the query-term bucket hashes. */
  def renderHits(spark: SparkSession, path: String, ranked: DataFrame,
                 queryTerms: Seq[String], window: Int = 10): DataFrame = {
    import spark.implicits._
    val ids = ranked.select($"doc_id").collect().map(_.getLong(0)).toSeq
    val content = contentForIds(spark, path, commitOf(spark, path), ids)
    HybridSearch.snippetsOf(content, ranked, queryTerms, window)
  }

  /** The ≤|ids| live stored-fields rows for a ranked hit list —
    * dbucket partition filters + doc_id row-group pushdown on
    * `content/`, so a render/rerank pass reads k rows, never the
    * artifact. */
  private def contentForIds(spark: SparkSession, path: String,
                            c: Commit, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val dbs = ids.map(dbucketOf).distinct
    liveRows(
        readBatched(spark, path, "content", c)
          .filter($"dbucket".isin(dbs: _*) && $"doc_id".isin(ids: _*)),
        tombstonesOf(spark, path, c))
      .select($"doc_id", $"text")
  }

  /** Store-served RERANK — the reference service's LAST serving
    * stage (retrieval/service.go:112-130: extract Content from the
    * hits, rerank, reorder) with zero corpus access: the hybrid
    * candidates come from the persisted legs ([[hybridServe]]), each
    * hit's content from the STORED FIELDS (≤`limit` pruned rows,
    * [[contentForIds]]), and the SHARED token-overlap rerank
    * expression scores the re-tokenized content — the same word-
    * class tokenizer the index was built with, so the store-served
    * rerank is bit-equal to the scan path's
    * (GraftEngine.searchReranked; s30 hash-gates it against s4's
    * oracle). Returns (doc_id, hybrid_score, rerank_score) ordered
    * by (rerank_score desc, hybrid_score desc, doc_id). */
  def rerankServe(spark: SparkSession, path: String,
                  queryTerms: Seq[String], alpha: Double = 0.5,
                  limit: Int = 10, fusion: String = "relative",
                  candidates: Int = 50,
                  nprobe: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    // the service reranks whatever the store SEARCH returned
    // (service.go:112-130); at alpha = 0 that is the BM25 leg alone —
    // routing through the hybrid fusion there would let vector-only
    // candidates (hybrid_score 0 via the full outer join) fill the
    // limit and be reranked above genuine keyword hits
    val ranked0 =
      if (alpha > 0.0)
        hybridServe(spark, path, queryTerms, alpha, limit, fusion,
          candidates, nprobe)
      else {
        val kw = bm25Serve(spark, path, queryTerms)
          .orderBy($"score".desc, $"doc_id").limit(candidates)
          .select($"doc_id", $"score".as("kw_score"))
        val emptyVec = spark.range(0)
          .select($"id".as("doc_id"), lit(0.0).as("v_score"))
        // the SHARED fusion expression with an absent vector leg —
        // keyword docs only (the ranked form scores rank-reciprocal,
        // the relative form min-max-normalized; both carry through
        // as `hybrid_score` below)
        if (fusion == "ranked")
          HybridSearch.fuseRanked(kw, emptyVec, alpha, limit)
        else HybridSearch.fuseRelative(kw, emptyVec, alpha, limit)
      }
    // fuseRanked names its fused column rrf_score; the rerank stage
    // (and the returned schema) reads one canonical hybrid_score
    val cands = (if (fusion == "ranked")
        ranked0.withColumnRenamed("rrf_score", "hybrid_score")
      else ranked0)
      .localCheckpoint(true) // ranked once; read for ids AND the join
    val ids = cands.select($"doc_id").collect().map(_.getLong(0)).toSeq
    val toks = contentForIds(spark, path, commitOf(spark, path), ids)
      .select($"doc_id",
        regexp_extract_all(lower($"text"),
          lit(HybridSearch.WordTokenPattern), lit(0)).as("tok"))
    cands.join(toks, "doc_id")
      .select($"doc_id", $"hybrid_score",
        HybridSearch.rerankScore($"tok", queryTerms).as("rerank_score"))
      .orderBy($"rerank_score".desc, $"hybrid_score".desc, $"doc_id")
  }

  /** s10 served FROM the index: s1's ranking through [[bm25Serve]]
    * and the snippets rendered from the stored fields — the full
    * "query in, renderable results out" serving call with zero
    * corpus access. */
  def snippetServe(spark: SparkSession, path: String,
                   queryTerms: Seq[String], k: Int = 10,
                   window: Int = 10): DataFrame = {
    import spark.implicits._
    val top = bm25Serve(spark, path, queryTerms)
      .orderBy($"score".desc, $"doc_id").limit(k)
      .select($"doc_id", $"score")
    renderHits(spark, path, top, queryTerms, window)
      .select($"doc_id", $"score", $"start_pos", $"n_terms", $"snippet")
      .orderBy($"score".desc, $"doc_id")
  }

  /** BATCHED multi-query BM25 serving — the throughput shape a
    * serving tier actually runs at 100 TB: a whole batch of queries
    * answers in ONE job instead of a job per query. The union of the
    * batch's terms prunes the postings read once (≤|distinct terms|
    * bucket dirs); a broadcast (qid, term) join fans each posting
    * row out to the queries that want it; per-(qid, doc) scores
    * aggregate with the SAME BM25 formula (idf from the persisted
    * vocab, norms from the persisted exact sums); one qid-keyed
    * window ranks all queries' top-k together. Per-query serving
    * ([[bm25Serve]]) is the latency shape; this is the batch shape —
    * same artifacts, one shuffle for the whole batch. */
  def bm25ServeBatch(spark: SparkSession, path: String,
                     queries: Seq[(Long, Seq[String])],
                     k: Int = 5): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25ServeBatch needs at least one query, each with terms")
    val c = commitOf(spark, path)
    val allTerms = queries.flatMap(_._2).distinct
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("qid", "term")
    val post = postingsFor(spark, path, allTerms, c)
      .select($"term", $"doc_id", $"tf".cast("double").as("tf"), $"dl")
    val vocab = spark.read.parquet(s"$path/vocab/v=${c.seq}")
      .filter($"term".isin(allTerms: _*))
      .select($"term", $"df".cast("double").as("df"))
    val stats = spark.read.parquet(s"$path/stats/v=${c.seq}")
      .select($"n_docs".cast("double").as("n_docs"),
        ($"sum_dl" / $"n_docs".cast("double")).as("corpus_avgdl"))
    val contrib = post
      .join(broadcast(qterms), "term")
      .join(broadcast(vocab), "term")
      .crossJoin(broadcast(stats))
      .select($"qid", $"doc_id",
        (log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)) *
          ($"tf" * (HybridSearch.K1 + 1.0)) /
          ($"tf" + lit(HybridSearch.K1) * (lit(1.0 - HybridSearch.B) +
            lit(HybridSearch.B) * $"dl" / $"corpus_avgdl"))).as("w"))
    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")
    contrib.groupBy($"qid", $"doc_id")
      .agg(round(sum($"w"), 6).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= k)
      .orderBy($"qid", $"rnk")
  }

  /** BATCHED multi-query HYBRID serving — [[bm25ServeBatch]]'s
    * throughput shape for the reference's PRIMARY call: every query
    * in the batch gets the full alpha-weighted fusion of its BM25
    * leg and its vector leg, computed in ONE job — one pruned
    * postings read feeds all keyword legs, ONE vectors scan scores
    * every query's cosine (|batch| broadcast query vectors ride the
    * scan), and the fusion normalizes/ranks per qid through
    * qid-partitioned windows. Per-query [[hybridServe]] is the
    * latency shape; TextIndexSpec pins that each qid block here is
    * BIT-EQUAL to it. */
  def hybridServeBatch(spark: SparkSession, path: String,
                       queries: Seq[(Long, Seq[String])],
                       alpha: Double = 0.5, limit: Int = 10,
                       fusion: String = "relative",
                       candidates: Int = 50,
                       nprobe: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    require(fusion == "relative" || fusion == "ranked",
      s"fusion must be 'relative' or 'ranked', got '$fusion'")
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val c = commitOf(spark, path)
    val wKw = Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id")
    val kw = bm25ServeBatch(spark, path, queries, k = candidates)
      .select($"qid", $"doc_id", $"score".as("kw_score"))
    val qvecs = queries.map { case (q, ts) => (q, ts) }
      .toDF("qid", "terms")
      .select($"qid", expr("poly_bow(terms, 64)").as("qv"))
    val wV = Window.partitionBy($"qid").orderBy($"v_score".desc, $"doc_id")
    val cents = readCents(spark, path, c)
    val vec =
      if (cents.isEmpty)
        // keyword-only index: every query's vector leg is empty
        // (fusion treats it as absent — the vectorServe degrade)
        spark.range(0).select($"id".as("qid"), $"id".as("doc_id"),
          lit(0.0).as("v_score"))
      else
        liveRows(probedVectorRows(spark, path, c, qvecs, cents, nprobe),
            tombstonesOf(spark, path, c))
          .crossJoin(broadcast(qvecs))
          .select($"qid", $"doc_id",
            graft.functions.VectorFunctions.cosineD($"v", $"qv").as("v_score"))
          .withColumn("rnk", row_number().over(wV))
          .filter($"rnk" <= candidates)
          .select($"qid", $"doc_id", $"v_score")
    val cand = kw.join(vec, Seq("qid", "doc_id"), "full_outer")
    if (fusion == "ranked") {
      val wKr = Window.partitionBy($"qid")
        .orderBy($"kw_score".desc, $"doc_id")
      val wVr = Window.partitionBy($"qid")
        .orderBy($"v_score".desc, $"doc_id")
      val kwR = kw.withColumn("kw_rank",
        row_number().over(wKr).cast("long")).select($"qid", $"doc_id", $"kw_rank")
      val vecR = vec.withColumn("v_rank",
        row_number().over(wVr).cast("long")).select($"qid", $"doc_id", $"v_rank")
      val wF = Window.partitionBy($"qid")
        .orderBy($"rrf_score".desc, $"doc_id")
      kwR.join(vecR, Seq("qid", "doc_id"), "full_outer")
        .select($"qid", $"doc_id",
          round(
            when($"v_rank".isNull, 0.0)
              .otherwise(lit(alpha) / (lit(60.0) + $"v_rank")) +
            when($"kw_rank".isNull, 0.0)
              .otherwise(lit(1 - alpha) / (lit(60.0) + $"kw_rank")), 6)
            .as("rrf_score"))
        .withColumn("rnk", row_number().over(wF).cast("long"))
        .filter($"rnk" <= limit)
        .orderBy($"qid", $"rnk")
    } else {
      def normalized(score: Column, lo: Column, hi: Column): Column =
        when(score.isNull, 0.0)
          .when(hi === lo, 0.5)
          .otherwise((score - lo) / (hi - lo))
      val bounds = cand.groupBy($"qid").agg(
        min($"kw_score").as("kmin"), max($"kw_score").as("kmax"),
        min($"v_score").as("vmin"), max($"v_score").as("vmax"))
      val wF = Window.partitionBy($"qid")
        .orderBy($"hybrid_score".desc, $"doc_id")
      cand.join(broadcast(bounds), "qid")
        .select($"qid", $"doc_id",
          round(
            lit(alpha) * normalized($"v_score", $"vmin", $"vmax") +
            lit(1 - alpha) * normalized($"kw_score", $"kmin", $"kmax"), 6)
            .as("hybrid_score"))
        .withColumn("rnk", row_number().over(wF).cast("long"))
        .filter($"rnk" <= limit)
        .orderBy($"qid", $"rnk")
    }
  }

  /** The index's STATS endpoint (the reference's stats handler over
    * the store instead of the corpus): corpus counts from the exact
    * persisted sums, vocabulary size from the term dictionary —
    * vocab-cardinality reads only, no data scan. The corpus-derived
    * columns are SQL-replayable, which is what lets s27 oracle-gate
    * the endpoint against the raw documents table. */
  def indexStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val c = commitOf(spark, path)
    spark.read.parquet(s"$path/stats/v=${c.seq}")
      .crossJoin(broadcast(
        spark.read.parquet(s"$path/vocab/v=${c.seq}")
          .agg(count(lit(1)).as("vocab_size"))))
      .select($"n_docs", $"sum_dl".cast("long").as("sum_tokens"),
        $"slt".as("sum_title_tokens"), $"slb".as("sum_body_tokens"),
        $"vocab_size")
  }

  // ---------------------------------------------------- compaction --

  /** The small-file compaction PLAN over this index's batch-
    * partitioned artifacts — [[Compaction.listFiles]]' metadata walk
    * + packNextFit grouped per leaf directory: which files would
    * merge into which output, decided from the LISTING alone (never
    * from reading data). One row per planned output file. This is
    * the budget an OPTIMIZE scheduler reads before [[compact]] pays
    * for the rewrite. */
  def compactionPlan(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val (fs, _) = hadoop(spark, path)
    val arts = Seq("postings", "fielded", "forward", "docs", "content",
        "vectors")
      .filter(a => fs.exists(new org.apache.hadoop.fs.Path(s"$path/$a")))
    val listed = arts.map { a =>
        Compaction.listFiles(spark, s"$path/$a")
          .withColumn("artifact", lit(a))
      }.reduce(_ unionByName _)
      .withColumn("dir",
        coalesce(nullif(regexp_extract($"path", "^(.*)/[^/]+$", 1),
          lit("")), lit("")))
    graft.operators.Packing
      .packNextFit(listed, Seq("artifact", "dir"), Seq("path"), "bytes",
        targetBytes)
      .groupBy($"artifact", $"dir", $"bin_id")
      .agg(count(lit(1)).as("n_files"), sum($"bytes").as("total_bytes"))
      .orderBy($"artifact", $"dir", $"bin_id")
  }

  /** COMPACT the index: rewrite the LIVE view of every batch-
    * partitioned artifact into one consolidated batch (one file per
    * bucket directory — the repartition-by-partition-column write),
    * physically dropping tombstoned rows and per-batch file
    * fragmentation in one pass, reset the tombstone list, and flip
    * the marker. Readers either resolve the old commit (old batches,
    * old tombstones — intact) or the new one; serving is bit-equal
    * across the swap (the spec pins it). Old batch directories and
    * artifact versions become garbage; [[vacuum]] reclaims them. */
  def compact(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val c = commitOf(spark, path)
    val seq2 = c.seq + 1
    val nb = c.maxBatch + 1
    val tomb = tombstonesOf(spark, path, c)
    def rewrite(name: String, bucketCol: String): Unit = {
      val (fs, _) = hadoop(spark, path)
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/$name"))) {
        liveRows(readBatched(spark, path, name, c), tomb)
          .withColumn("batch", lit(nb))
          .repartition(col(bucketCol))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch", bucketCol)
          .parquet(s"$path/$name")
      }
    }
    // every rewrite reads its own artifact and writes its own
    // directory; the small-artifact carry-forwards are tiny
    // independent copies — all of it submits concurrently (the
    // "overlap independent jobs" rule) and the marker flips only
    // after every job returned. Tombstones reset — every
    // logically-deleted row is now physically gone.
    graft.Par.run(Seq(
      () => rewrite("postings", "pbucket"),
      () => rewrite("fielded", "pbucket"),
      () => rewrite("forward", "dbucket"),
      () => rewrite("docs", "dbucket"),
      () => rewrite("content", "dbucket"),
      () => rewrite("vectors", "cid"),
      () => writeVersioned(spark.read.parquet(s"$path/vocab/v=${c.seq}"),
        path, "vocab", seq2),
      () => writeVersioned(spark.read.parquet(s"$path/prefixes/v=${c.seq}"),
        path, "prefixes", seq2),
      () => writeVersioned(spark.read.parquet(s"$path/stats/v=${c.seq}"),
        path, "stats", seq2),
      () => writeVersioned(emptyTombstones(spark), path, "tombstones", seq2),
      () => writeCents(spark, path, seq2, readCents(spark, path, c)),
      () => writeDocsSchema(spark, path, seq2, docsSchemaOf(spark, path, c))))
    writeMarker(spark, path, Commit(seq2, nb, nb, c.lastEpoch))
  }

  /** COUNT-GATED auto-compaction — the OPTIMIZE trigger a deployment
    * actually schedules (the Pipeline.connectedComponentsAdaptive
    * pattern applied to storage): two cheap signals decide, never a
    * data scan — the tombstone-list row count (a vocab-free tiny
    * table) and the committed batch count (straight off the marker:
    * every append adds one file per touched bucket, so batches-since-
    * compaction IS the small-file curve). Compacts when either
    * exceeds its bound; returns whether a rewrite ran. Serving is
    * bit-equal either way ([[compact]]'s contract), so callers can
    * drop this after any commit. */
  def maybeCompact(spark: SparkSession, path: String,
                   maxTombstones: Long = 10000L,
                   maxBatches: Long = 16L): Boolean = {
    val c = commitOf(spark, path)
    val nBatches = c.maxBatch - c.minBatch + 1
    val due = nBatches > maxBatches ||
      tombstonesOf(spark, path, c).count() > maxTombstones
    if (due) compact(spark, path)
    due
  }

  /** Retention: physically remove batch directories outside the
    * committed [minBatch, maxBatch] range and artifact versions
    * below the committed seq — the garbage [[compact]] and staged-
    * but-replaced commits leave behind. Never touches live state. */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    val c = commitOf(spark, path)
    val (fs, _) = hadoop(spark, path)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    def clean(sub: String, prefix: String, keep: Long => Boolean): Unit = {
      val d = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (fs.exists(d)) fs.listStatus(d).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith(prefix)) {
          val v = n.stripPrefix(prefix).toLong
          if (!keep(v)) {
            fs.delete(s.getPath, true): Unit
            dropped += s"$sub/$n"
          }
        }
      }
    }
    Seq("postings", "fielded", "forward", "docs", "content", "vectors")
      .foreach(a =>
        clean(a, "batch=", b => b >= c.minBatch && b <= c.maxBatch))
    Seq("vocab", "prefixes", "stats", "tombstones", "vcents", "dschema")
      .foreach(a => clean(a, "v=", v => v == c.seq))
    dropped.toSeq
  }
}
