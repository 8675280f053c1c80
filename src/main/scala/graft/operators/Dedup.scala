package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HashFunctions => H, JoinUtils, VectorFunctions => V}

/** Deduplication operators (SURVEY.md §2.D) over `documents` /
  * `embeddings` — the core of any 100 TB training-data pipeline.
  *
  * Scale design: the only all-pairs comparison happens INSIDE a
  * blocking bucket (LSH band, simhash chunk, cluster label). The
  * candidate-generation shuffles key on the bucket hash, so cost is
  * O(n * sig) + O(sum of bucket^2), never O(n^2). d4 is the
  * verification kernel — at 100 TB its candidate pairs come from d2's
  * LSH output, not from a global self-join (documented on the query).
  */
object Dedup {

  /** doc_id + sorted distinct poly-hashed 3-word shingles (docs with
    * < 3 tokens drop out: they can't participate in shingle-based
    * dedup). The hashed-set form is what every downstream stage
    * consumes: minhash eats the hash values directly, jaccard
    * merge-walks 8-byte longs instead of shingle strings, and the
    * 1-perm blocking min/max are uniform hash order statistics
    * instead of skewed lexicographic ones. */
  private[graft] def hashedShingleSetsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // one regexp pass: token count = size of the extracted array
    // (regexp_count would re-scan the full text a second time)
    docs
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", H.hashedShingles($"w", 3).as("hs"))
  }

  /** SHARED hashed-shingle scan over the `documents` table — the
    * materialized intermediate d2, d4, and p1 all read. Persisted
    * once per (dir) via Caches.shared: in a corpus-prep run the
    * signature scan is computed once, not once per dedup pass. */
  def hashedShingleSets(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"shingles:$dir") {
      hashedShingleSetsOf(Tables.documents(spark, dir))
    }

  /** SHARED minhash signatures on top of [[hashedShingleSets]]:
    * (doc_id, hs, mh). The 128-perm sketch kernel is the dominant
    * dedup compute — shared between d2 and p1's embedded near-dedup. */
  def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    graft.Caches.shared(spark, s"mhsig:$dir") {
      hashedShingleSets(spark, dir).withColumn("mh", expr("minhash_sig(hs)"))
    }

  // shingle-hash arrays are sorted+distinct, so the merge-walk kernel
  // is exact set jaccard (identical to intersect/union sizes)
  private def jaccard(a: Column, b: Column): Column =
    call_function("jaccard_sorted_long", a, b)

  /** Exact dedup: group identical content, keep the lowest doc_id.
    * Grouping key is the md5 fingerprint, not the text itself — the
    * exchange moves 16-byte digests instead of whole documents, which
    * at 100 TB is the difference between shuffling hashes and
    * shuffling the corpus. (Content-hash identity is the same
    * contract every production exact-dedup uses.) */
  def d1Exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(md5($"text").as("text_md5"), $"doc_id")
      .groupBy($"text_md5")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("copies"))
      .orderBy($"keep_id")
  }

  /** Band-bucket cap for the LSH self-join — the d2 analog of
    * [[MaxBlock]]: a (band_idx, band_hash) bucket shared by more
    * documents than this is a boilerplate cluster (at 100 TB:
    * thousands of near-identical template pages), and its self-join
    * is quadratic in the cluster size. Buckets over the cap are
    * dropped BEFORE pairing; recall for ordinary near-dups is
    * untouched because a true near-dup pair collides in ~many of the
    * 64 bands and only the degenerate mega-buckets are cut. The cap
    * is mirrored in the d2 oracle SQL. */
  val MaxBandBucket = 64

  /** LSH band-bucket candidate pairs over a (doc_id, mh) signature
    * frame: band explode -> windowed bucket count -> drop buckets >
    * maxBucket -> equi-self-join. The window count is linear even for
    * a mega-bucket (one sorted partition), so the degenerate case
    * never reaches the quadratic stage. Exposed for the skew spec. */
  private[graft] def lshCandidates(sig: DataFrame, maxBucket: Int,
                                   nBands: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    import sig.sparkSession.implicits._
    val bands = sig
      .select($"doc_id",
              posexplode(H.bandHashes($"mh", bands = nBands, rowsPerBand = rowsPerBand)))
      .select($"doc_id", $"pos".as("band_idx"), $"col".as("band_hash"))
    val wB = Window.partitionBy($"band_idx", $"band_hash")
    // NOT persisted, measured: both join sides reference this subtree,
    // but its exchange is byte-identical on both, so runtime exchange
    // reuse serves side two from side one's shuffle files — an explicit
    // persist re-measured SLOWER (adds materialization, saves nothing)
    val kept = bands
      .withColumn("bcnt", count(lit(1)).over(wB))
      .filter($"bcnt" <= maxBucket)
      .drop("bcnt")
    kept.as("x")
      .join(kept.as("y"),
            $"x.band_idx" === $"y.band_idx" && $"x.band_hash" === $"y.band_hash" &&
            $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
      .distinct()
  }

  /** Verified MinHash-LSH near-dup pairs over any (doc_id, hs, mh)
    * signature frame — the reusable core d2 and p1 share (p1 feeds it
    * the exact-dedup SURVIVORS' signatures, so duplicate-heavy corpora
    * never reach the band join with their copies). Unordered: callers
    * sort or aggregate as needed. */
  private[graft] def minhashLshPairsOf(sig: DataFrame,
                                       maxBucket: Int = MaxBandBucket,
                                       threshold: Double = 0.3,
                                       nBands: Int = 64,
                                       rowsPerBand: Int = 2): DataFrame = {
    import sig.sparkSession.implicits._
    val candidates = lshCandidates(sig, maxBucket, nBands, rowsPerBand)
    val sets = sig.select($"doc_id", $"hs")
    candidates
      .join(sets.as("sa"), $"a_id" === $"sa.doc_id")
      .join(sets.as("sb"), $"b_id" === $"sb.doc_id")
      .select($"a_id", $"b_id",
        round(call_function("jaccard_sorted_long", $"sa.hs", $"sb.hs"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** MinHash + LSH near-dup pairs.
    * shingle -> xxhash64 -> 128-perm signature -> 64 bands x 2 rows
    * -> capped bucket join on (band, hash) -> verify Jaccard >= 0.3.
    * b=64/r=2 puts the S-curve threshold at (1/64)^(1/2) ~ 0.125, so
    * recall at j >= 0.3 is ~0.998+; false candidates are killed by the
    * verify stage. The shared scan already holds the hashed shingle
    * sets + 128-perm signatures (persisted once; the band explode and
    * both verify sides all read the same cached blocks). */
  def d2MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashLshPairsOf(minhashSigs(spark, dir)).orderBy($"a_id", $"b_id")
  }

  /** d14: TUNED MinHash-LSH — the banding knob actually driving a
    * dedup run, now at the MEASURED geometry: d17's sweep grades
    * every divisor split of the same 128-perm signatures against
    * exact ground truth, and serving runs at the pick (fewest
    * candidate pairs among geometries clearing the recall floor) —
    * at 100 TB that is the difference between a band join that fits
    * and one that doesn't. No re-sketch: the shared signature scan
    * serves every layout, and the sweep itself is the shared
    * [[bandSweepStats]] build billed once per corpus.
    * [[optimalBands]]' closed-form pick remains the a-priori
    * default where no truth sample exists; the oracle replays the
    * full sweep, the pick rule, and the serve at the chosen
    * geometry. */
  def d14TunedLsh(spark: SparkSession, dir: String,
                  target: Double = 0.5): DataFrame = {
    import spark.implicits._
    val (b, r) = pickBandGeometry(bandSweepStats(spark, dir, target))
    minhashLshPairsOf(minhashSigs(spark, dir), MaxBandBucket, target, b, r)
      .orderBy($"a_id", $"b_id")
  }

  /** SimHash near-dup pairs: 60-bit token-level simhash (token hash =
    * two independent SQL-reproducible poly hashes packed 30+30 bits),
    * 6x10-bit chunk blocking (pigeonhole: hamming <= 5 always shares
    * a chunk), verified by bit_count(xor) <= 5. The hash family being
    * ANSI-SQL-expressible lets DuckDB replay the whole sketch. */
  def d3Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sim = Tables.documents(spark, dir)
      .select($"doc_id", expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tok"))
      .filter(size($"tok") > 0)
      // 60-bit token hash: two independent poly hashes, each
      // scrambled by multiplicative wrap-around (h * 2654435761 mod
      // 2^30 — short tokens' raw poly values are magnitude-bounded,
      // so without the wrap their top bits are all zero and the
      // simhash bit votes correlate), packed 30+30
      .withColumn("th", zip_with(
        expr("poly_hash_all(tok, 31)"), expr("poly_hash_all(tok, 37)"),
        (a, b) => (a * 2654435761L % 1073741824L) * 1073741824L +
                  (b * 2654435761L % 1073741824L)))
      .select($"doc_id", expr("graft_simhash64(th)").as("simhash"))
    // persist (tracked; released post-action): chunks sits on both
    // sides of the blocking self-join — the tokenize+simhash pipeline
    // would otherwise run twice
    val chunks = graft.Caches.persist(sim
      .select($"doc_id", $"simhash", explode(H.simhashChunks($"simhash", 6)).as("c"))
      .select($"doc_id", $"simhash", $"c.chunk_idx", $"c.chunk_val"))
    chunks.as("x")
      .join(chunks.as("y"),
            $"x.chunk_idx" === $"y.chunk_idx" && $"x.chunk_val" === $"y.chunk_val" &&
            $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"),
              expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter($"hamming" <= 5)
      .orderBy($"a_id", $"b_id")
  }

  /** Default d4 block-size cap: a shingle shared by more documents
    * than this is boilerplate ("the end of the", license headers) —
    * it carries no near-dup signal, and its bucket's self-join is
    * quadratic. Dropping oversized buckets is the standard blocking
    * cap every production record-linkage system applies. */
  val MaxBlock = 64

  /** Candidate pairs for [[ngramJaccardPairs]]: 1-perm minhash
    * blocking — candidates share the min OR max shingle HASH
    * (uniform order statistics of the poly hash; P(miss) ~ (1-j)^2,
    * <1% at j>=0.9) — with buckets larger than maxBlock dropped
    * BEFORE the self-join, so the mega-bucket skew class never
    * reaches the quadratic stage. Exposed for the skew spec. */
  private[graft] def ngramCandidates(sets: DataFrame, maxBlock: Int): DataFrame = {
    import sets.sparkSession.implicits._
    // hs is sorted ascending, so the 1-perm minhash block keys are
    // its first and last elements — no extra array scan
    val blocks = sets
      .select($"doc_id",
              explode(array(
                struct(lit(0).as("bidx"), element_at($"hs", 1).as("bkey")),
                struct(lit(1).as("bidx"), element_at($"hs", -1).as("bkey")))).as("b"))
      .select($"doc_id", $"b.bidx".as("bidx"), $"b.bkey".as("bkey"))
    // bucket sizes via a window count on the block key: the count is
    // linear even for a mega-bucket (one sorted partition), and the
    // oversized bucket is discarded before any pairing
    val wB = Window.partitionBy($"bidx", $"bkey")
    val kept = blocks
      .withColumn("bcnt", count(lit(1)).over(wB))
      .filter($"bcnt" <= maxBlock)
      .drop("bcnt")
    kept.as("a")
      .join(kept.as("b"),
            $"a.bidx" === $"b.bidx" && $"a.bkey" === $"b.bkey" &&
            $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
  }

  /** Verified n-gram Jaccard pairs >= 0.3 with capped 1-perm minhash
    * blocking: never a global self-join; buckets over maxBlock are
    * dropped (see [[MaxBlock]]) so cost tracks capped bucket sizes,
    * not n^2. The shingle-set fetch joins run through
    * JoinUtils.saltedJoin: near-dup clusters make the same doc_id
    * appear in up to 2*(maxBlock-1) candidate pairs, and the salt
    * spreads those hot ids across reducers (row-identical to the
    * plain join). Kept SQL-expressible so the oracle can verify —
    * including the cap; d2 is the higher-recall multi-band variant. */
  private def ngramJaccardFrom(sets: DataFrame, maxBlock: Int): DataFrame = {
    import sets.sparkSession.implicits._
    exactScoredPairs(sets, maxBlock)
      .filter($"jaccard" >= 0.3)
      .orderBy($"a_id", $"b_id")
  }

  /** Exact-Jaccard-scored candidate pairs under the capped 1-perm
    * blocking — the unthresholded core d4, d16's τ sweep, and d17's
    * band-sweep ground truth all read. */
  private def exactScoredPairs(sets: DataFrame, maxBlock: Int): DataFrame = {
    import sets.sparkSession.implicits._
    val candidates = ngramCandidates(sets, maxBlock)
    val withA = JoinUtils.saltedJoin(candidates,
      sets.select($"doc_id".as("a_id"), $"hs".as("sha")), "a_id", salt = 8)
    val withB = JoinUtils.saltedJoin(withA,
      sets.select($"doc_id".as("b_id"), $"hs".as("shb")), "b_id", salt = 8)
    withB
      .select($"a_id", $"b_id", round(jaccard($"sha", $"shb"), 6).as("jaccard"))
  }

  /** Same pipeline over an arbitrary (doc_id, text) corpus — the
    * shingle scan is persisted per-query (tracked, released
    * post-action) since there is no shared table to pin it to. */
  def ngramJaccardPairs(docs: DataFrame, maxBlock: Int = MaxBlock): DataFrame =
    ngramJaccardFrom(graft.Caches.persist(hashedShingleSetsOf(docs)), maxBlock)

  /** d16b: PER-SOURCE τ sweep — the same measured curve, one per
    * corpus source: a boilerplate-heavy source (template pages,
    * license headers) wants a different cut than prose, and a single
    * corpus-global τ silently over-deletes one source while leaving
    * another untouched. Pairs are graded WITHIN-source (both ends in
    * the source — the dup structure a per-source knob governs;
    * cross-source pairs stay the global d16's business), and
    * doc_share is relative to the source's own shingled population.
    * Same one-pass shape as d16: the candidate set is threshold-
    * independent, so the whole per-source family is one broadcast
    * theta-join + two keyed aggregates — never |sources|·|τ| dedup
    * runs. */
  def d16bSourceSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val sets = hashedShingleSets(spark, dir)
    val scored = graft.Caches.persist(
      exactScoredPairs(sets, MaxBlock)
        .join(docs.select($"doc_id".as("a_id"), $"source".as("sa")), "a_id")
        .join(docs.select($"doc_id".as("b_id"), $"source".as("sb")), "b_id")
        .filter($"sa" === $"sb")
        .select($"sa".as("source"), $"a_id", $"b_id", $"jaccard"))
    val taus = SweepTaus.toDF("tau")
    val hit = scored.join(broadcast(taus), $"jaccard" >= $"tau")
    val nPairs = hit.groupBy($"source", $"tau")
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = hit
      .select($"source", $"tau", explode(array($"a_id", $"b_id")).as("dd"))
      .groupBy($"source", $"tau")
      .agg(countDistinct($"dd").as("n_docs_affected"))
    val totals = sets.join(docs, "doc_id")
      .groupBy($"source").agg(count(lit(1)).as("n_total"))
    totals.select($"source").crossJoin(broadcast(taus))
      .join(nPairs, Seq("source", "tau"), "left")
      .join(nDocs, Seq("source", "tau"), "left")
      .join(broadcast(totals), "source")
      .select($"source", $"tau",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        coalesce($"n_docs_affected", lit(0L)).as("n_docs_affected"),
        round(coalesce($"n_docs_affected", lit(0L)).cast("double")
          / $"n_total", 6).as("doc_share"))
      .orderBy($"source", $"tau")
  }

  /** Candidate band geometries the d17 sweep measures: the divisor
    * splits of the shared 128-perm signatures bracketing realistic
    * serving thresholds (S-curve midpoints (1/b)^(1/r) from ~0.90
    * down to ~0.125). */
  val SweepGeometries: Seq[(Int, Int)] =
    Seq(4 -> 32, 8 -> 16, 16 -> 8, 32 -> 4, 64 -> 2)

  /** Recall floor for the measured band pick. */
  val BandRecallFloor = 0.9

  /** SHARED band-geometry sweep grid — a17's measure-first pattern
    * applied to d2's LSH: every [[SweepGeometries]] split of the
    * SAME cached 128-perm signatures generates its capped band-bucket
    * candidates in one unioned plan (no re-sketch — five band folds
    * over one persisted signature scan), and each candidate set is
    * graded against the exact ground truth (d4's threshold-
    * independent blocking, verified Jaccard >= `target`) with ONE
    * left join + keyed aggregate. Per geometry: candidate count
    * (the cost a 100 TB band join actually pays), truth hits,
    * recall. Persisted once per (dir, target) via Caches.shared —
    * the calibration is billed once, then both the d17 report and
    * d14's measured serving geometry read it. */
  def bandSweepStats(spark: SparkSession, dir: String,
                     target: Double = 0.5): DataFrame =
    graft.Caches.shared(spark, s"bandsweep:$dir:$target") {
      import spark.implicits._
      val sig = minhashSigs(spark, dir)
      val truth = graft.Caches.persist(
        exactScoredPairs(hashedShingleSets(spark, dir), MaxBlock)
          .filter($"jaccard" >= target).select($"a_id", $"b_id"))
      val total = truth.agg(count(lit(1)).as("possible"))
      // ONE geometry-tagged band pipeline for the whole grid instead
      // of five separate explode→window→self-join chains: the
      // geometry columns join the bucket key, so the per-geometry
      // bucket cap and candidate sets are SET-IDENTICAL to running
      // [[lshCandidates]] per split — but the sweep pays one keyed
      // exchange (reused by both self-join sides) over the combined
      // frame, not five.
      val bandsAll = SweepGeometries.map { case (b, r) =>
        sig.select($"doc_id", lit(b).as("bands"),
            lit(r).as("rows_per_band"),
            posexplode(H.bandHashes($"mh", bands = b, rowsPerBand = r)))
          .select($"doc_id", $"bands", $"rows_per_band",
            $"pos".as("band_idx"), $"col".as("band_hash"))
      }.reduce(_ unionByName _)
      val wSw = Window.partitionBy($"bands", $"rows_per_band",
        $"band_idx", $"band_hash")
      val keptAll = bandsAll
        .withColumn("bcnt", count(lit(1)).over(wSw))
        .filter($"bcnt" <= MaxBandBucket)
        .drop("bcnt")
      val perGeom = keptAll.as("x")
        .join(keptAll.as("y"),
          $"x.bands" === $"y.bands" &&
          $"x.rows_per_band" === $"y.rows_per_band" &&
          $"x.band_idx" === $"y.band_idx" &&
          $"x.band_hash" === $"y.band_hash" &&
          $"x.doc_id" < $"y.doc_id")
        .select($"x.bands".as("bands"),
          $"x.rows_per_band".as("rows_per_band"),
          $"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
        .distinct()
      val counted = perGeom
        .join(truth.withColumn("t", lit(1)), Seq("a_id", "b_id"), "left")
        .groupBy($"bands", $"rows_per_band")
        .agg(count(lit(1)).as("n_candidates"), count($"t").as("hits"))
      SweepGeometries.toDF("bands", "rows_per_band")
        .join(counted, Seq("bands", "rows_per_band"), "left")
        .crossJoin(broadcast(total))
        .select($"bands", $"rows_per_band",
          round(pow(lit(1.0) / $"bands", lit(1.0) / $"rows_per_band"), 4)
            .as("s_curve_t"),
          coalesce($"n_candidates", lit(0L)).as("n_candidates"),
          coalesce($"hits", lit(0L)).as("hits"),
          $"possible",
          round(coalesce($"hits", lit(0L)).cast("double")
            / greatest($"possible", lit(1L)), 4).as("recall"))
    }

  /** The measured pick over the sweep grid: fewest candidates among
    * geometries reaching the recall floor; if none qualifies,
    * highest recall; ties prefer more bands. 5-row k-bounded collect
    * (the a17 pick pattern); the key arithmetic replays verbatim in
    * the oracle's ORDER BY. */
  def pickBandGeometry(stats: DataFrame,
                       floor: Double = BandRecallFloor): (Int, Int) = {
    val rows = stats
      .select("bands", "rows_per_band", "n_candidates", "recall")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val (b, r, _, _) = rows.minBy { case (b, _, nc, rec) =>
      (if (rec >= floor) nc.toDouble else 1e18 * (1.0 - rec), -b)
    }
    (b, r)
  }

  /** d17: LSH band-geometry SWEEP report — the knob-measurement a
    * deployment runs before committing a banding layout fleet-wide
    * (the serving-time twin of [[optimalBands]]' closed-form pick:
    * theory centres the S-curve, the sweep shows what the cap and
    * the corpus's actual similarity mass do to recall and join
    * size). One row per geometry + the measured choice. */
  def d17BandSweep(spark: SparkSession, dir: String,
                   target: Double = 0.5): DataFrame = {
    import spark.implicits._
    val stats = bandSweepStats(spark, dir, target)
    val (pb, pr) = pickBandGeometry(stats)
    stats
      .withColumn("chosen", $"bands" === pb && $"rows_per_band" === pr)
      .orderBy($"bands")
  }

  def d4NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardFrom(hashedShingleSets(spark, dir), MaxBlock)

  /** Candidate thresholds the d16 sweep measures. */
  val SweepTaus: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.5, 0.7)

  /** d16: dedup THRESHOLD SWEEP — a17's "measure before choosing the
    * knob" discipline applied to the near-dup cut: every candidate τ
    * scored in ONE pass over the exact-Jaccard candidate pairs (d4's
    * threshold-independent first/last-shingle blocking — the
    * candidate set does not depend on τ, so the sweep is a 5-row
    * broadcast theta-join + two keyed aggregates, NOT five dedup
    * runs). Per τ: surviving pair count, distinct documents touched,
    * and the corpus share they represent — the curve an operator
    * reads before committing a threshold that silently deletes ten
    * percent of the corpus (or nothing at all). */
  def d16ThresholdSweep(spark: SparkSession, dir: String): DataFrame =
    thresholdSweepFrom(
      graft.Caches.persist(hashedShingleSets(spark, dir)))

  /** The d16 sweep over any (doc_id, text) corpus. */
  def thresholdSweepOf(corpus: DataFrame): DataFrame =
    thresholdSweepFrom(graft.Caches.persist(hashedShingleSetsOf(corpus)))

  private def thresholdSweepFrom(sets: DataFrame): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val scored = graft.Caches.persist(exactScoredPairs(sets, MaxBlock))
    val taus = SweepTaus.toDF("tau")
    val hit = scored.join(broadcast(taus), $"jaccard" >= $"tau")
    val nPairs = hit.groupBy($"tau").agg(count(lit(1)).as("n_pairs"))
    val nDocs = hit
      .select($"tau", explode(array($"a_id", $"b_id")).as("d"))
      .groupBy($"tau").agg(countDistinct($"d").as("n_docs_affected"))
    val total = sets.agg(count(lit(1)).cast("double").as("n_total"))
    taus.join(nPairs, Seq("tau"), "left")
      .join(nDocs, Seq("tau"), "left")
      .crossJoin(broadcast(total))
      .select($"tau",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        coalesce($"n_docs_affected", lit(0L)).as("n_docs_affected"),
        round(coalesce($"n_docs_affected", lit(0L)).cast("double")
          / $"n_total", 6).as("doc_share"))
      .orderBy($"tau")
  }

  /** Label-cell cap for d5's within-cell self-join: a cell larger
    * than this means the coarse quantizer is too coarse for the data
    * (the IVF answer is to grow k / re-quantize, not to run the
    * quadratic comparison anyway). Dropped cells are the same
    * degenerate class as d4's mega-buckets; the cap is mirrored in
    * the oracle. Generous: legitimate IVF cells are O(n/k)-sized and
    * far below it at any sane k. */
  val MaxCell = 1024

  /** Within-label all-pairs cosine over a (vec_id, label, v) frame,
    * cells larger than maxCell dropped before the self-join (the
    * windowed count is linear even on a hot cell). Exposed for the
    * skew spec. */
  private[graft] def embeddingCosinePairsOf(e: DataFrame, tau: Double,
                                            maxCell: Int): DataFrame = {
    import e.sparkSession.implicits._
    val wC = Window.partitionBy($"label")
    val kept = e
      .withColumn("ccnt", count(lit(1)).over(wC))
      .filter($"ccnt" <= maxCell)
      .drop("ccnt")
    kept.as("a").join(kept.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("a_id"), $"b.vec_id".as("b_id"),
              round(V.cosineD($"a.v", $"b.v"), 6).as("cosine"))
      .filter($"cosine" >= tau)
  }

  /** Embedding-cosine near-dup pairs >= 0.4, blocked by cluster
    * label (the IVF-style pre-partition: at scale the label comes
    * from a2/a3's coarse quantizer, keeping the pairwise work inside
    * cells), hot cells capped at [[MaxCell]]. */
  def d5EmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", V.asDouble($"embedding").as("v"))
    embeddingCosinePairsOf(e, tau = 0.4, maxCell = MaxCell)
      .orderBy($"a_id", $"b_id")
  }

  /** d6: CCNet-style cross-document line (paragraph) dedup — the
    * boilerplate-removal pass (Wenzek et al. 2020 §3.1: hash every
    * paragraph, keep the first occurrence corpus-wide, drop the
    * rest) that removes shared template lines ("Subscribe to our
    * newsletter") every page carries. Over the synthesized page
    * corpus: explode lines with their in-document index, keep each
    * distinct line's first (doc_id, line_idx) occurrence via one
    * windowed rank over the line key, reassemble the surviving
    * document in original line order.
    *
    * Scale shape: two shuffles — one on the line key (the dedup
    * exchange; at 100 TB you'd key on xxhash64(line) so the exchange
    * moves 8-byte hashes + payload only for winners, and the window
    * is a per-key top-1, never a global sort), one on doc_id for the
    * reassembly agg. Both map-side combinable; no self-joins, no
    * quadratic cells. */
  def d6LineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = CorpusFilters.pages(spark, dir)
      .select($"doc_id", posexplode(split($"page", "\n")).as(Seq("line_idx", "line")))
    val w = Window.partitionBy($"line").orderBy($"doc_id", $"line_idx")
    lines
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(struct($"line_idx", $"line"))),
            s => s("line")))).as("kept_md5"))
      .orderBy($"doc_id")
  }

  /** d7: SEMANTIC dedup, SemDeDup-shape (Abbas et al. 2023): cluster
    * the embedding space with a TRAINED k-means quantizer (a4's
    * spherical Lloyd build — at 100 TB this is the same index-build
    * pass the IVF serving path already pays for), compare pairs only
    * WITHIN a cluster, and keep the lowest id of every cosine ≥ τ
    * pair. Unlike d5 (which trusts a pre-assigned label column), the
    * blocking structure here is learned from the data — the
    * clustering IS the candidate-generation step, so the pairwise
    * work tracks cell sizes, never n². Emits one verdict row per
    * vector (cell, kept flag) — the per-document drop list a corpus
    * prep pass consumes directly. The oracle replays the ENTIRE
    * 3-iteration Lloyd loop (a4's CTE stages), the cell assignment,
    * the within-cell pair scan, and the keep rule. */
  /** The session's trained SemDeDup quantizer (k=64 — finer than
    * a4's serving quantizer, see d7's cell-size note): memoized per
    * (session, corpus) via [[graft.TrainedModels]]. */
  private[graft] def semCentroids(spark: SparkSession, dir: String,
                                  all: DataFrame): Seq[Seq[Double]] =
    graft.TrainedModels.memo(spark, s"kmeans:$dir:k=64:it=3") {
      Knn.kmeansFit(all, k = 64, iters = 3)
    }

  /** Index-build pass for the dedup family's trained quantizer
    * (Bench's `_model_training` line, next to Knn's). */
  def trainSemModels(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val all = graft.Caches.persist(
      Tables.embeddings(spark, dir)
        .select($"vec_id", V.asDouble($"embedding").as("v")))
    semCentroids(spark, dir, all)
    // release only this chain's scan (Bench overlaps the trainers —
    // a global releaseAll would drop a concurrent chain's caches)
    all.unpersist(false): Unit
  }

  def d7SemDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tau = 0.4
    val all = graft.Caches.persist(
      Tables.embeddings(spark, dir)
        .select($"vec_id", V.asDouble($"embedding").as("v")))
    // k=64, finer than a4's k=8 serving quantizer: the pairwise stage
    // is quadratic in cell size, so SemDeDup wants many small cells
    // (cells ~n/k; at n=5000, k=8 meant ~600-vector cells and a
    // ~1.5M-pair self-join shuffling full vectors — k=64 cuts the
    // pair count ~8×, and at 100 TB k grows with n to hold cell size
    // roughly constant)
    val cents = semCentroids(spark, dir, all)
    val cells = Knn.assign(all, cents)
      .select($"vec_id", $"cid".as("label"), $"v")
    val losers = embeddingCosinePairsOf(cells, tau = tau, maxCell = MaxCell)
      .select($"b_id".as("vec_id")).distinct()
    cells.join(losers, Seq("vec_id"), "left_anti").withColumn("is_kept", lit(true))
      .unionByName(
        cells.join(losers, Seq("vec_id"), "left_semi").withColumn("is_kept", lit(false)))
      .select($"vec_id", $"label".cast("long").as("cid"), $"is_kept")
      .orderBy($"vec_id")
  }

  /** d8: INCREMENTAL near-dedup — today's batch against the standing
    * corpus, the shape a 100 TB pipeline actually runs nightly: the
    * historical signature STORE is already sketched (computed once,
    * kept alongside the corpus), only the incoming slice is
    * re-sketched, and the band join probes incoming × (store ∪
    * earlier-incoming) — NEVER store × store, whose pairs were
    * settled when the store was built. Here the split is the id
    * midpoint (store = doc_id < max/2, incoming = the rest), so
    * "earlier" is simply the smaller doc_id and the probe-side
    * filter `y.doc_id >= cut` is the entire asymmetry. Output: one
    * row per incoming loser with its best prior match (highest
    * jaccard, ties to the lowest prior id). Bucket caps and the
    * verify threshold are d2's. */
  def d8IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSigs(spark, dir)
    val cut = Tables.documents(spark, dir)
      .agg(expr("max(doc_id) div 2").as("cut"))
    val withCut = sig.crossJoin(broadcast(cut))
    incrementalLosersOf(
        withCut.filter($"doc_id" < $"cut").select($"doc_id", $"hs", $"mh"),
        withCut.filter($"doc_id" >= $"cut").select($"doc_id", $"hs", $"mh"))
      .orderBy($"doc_id")
  }

  /** The reusable incremental core d8 and the GraftEngine facade
    * share: band join = incoming × (store ∪ earlier-incoming), never
    * store × store. "Earlier" among incoming docs is the smaller
    * doc_id; a store doc is prior to every incoming doc by
    * definition. The bucket cap is computed over the UNION (a
    * boilerplate bucket is quadratic however it is split across
    * store and batch). Returns one row per incoming loser with its
    * best prior match (highest jaccard, ties to the lowest prior
    * id); unordered — callers sort. Assumes disjoint id spaces. */
  private[graft] def incrementalLosersOf(storeSig: DataFrame, incSig: DataFrame,
                                         maxBucket: Int = MaxBandBucket,
                                         threshold: Double = 0.3): DataFrame = {
    import storeSig.sparkSession.implicits._
    val tagged = storeSig.select($"doc_id", $"hs", $"mh", lit(false).as("is_new"))
      .unionByName(incSig.select($"doc_id", $"hs", $"mh", lit(true).as("is_new")))
    val bands = tagged
      .select($"doc_id", $"is_new",
              posexplode(H.bandHashes($"mh", bands = 64, rowsPerBand = 2)))
      .select($"doc_id", $"is_new", $"pos".as("band_idx"), $"col".as("band_hash"))
    val wB = Window.partitionBy($"band_idx", $"band_hash")
    val kept = bands
      .withColumn("bcnt", count(lit(1)).over(wB))
      .filter($"bcnt" <= maxBucket)
      .drop("bcnt")
    val probe = kept.filter($"is_new")
    val cands = kept.as("x")
      .join(probe.as("y"),
            $"x.band_idx" === $"y.band_idx" && $"x.band_hash" === $"y.band_hash" &&
            (!$"x.is_new" || $"x.doc_id" < $"y.doc_id"))
      .select($"x.doc_id".as("dup_of"), $"y.doc_id".as("new_id"))
      .distinct()
    val sets = tagged.select($"doc_id", $"hs")
    val verified = cands
      .join(sets.as("sa"), $"dup_of" === $"sa.doc_id")
      .join(sets.as("sb"), $"new_id" === $"sb.doc_id")
      .select($"new_id".as("doc_id"), $"dup_of",
        round(call_function("jaccard_sorted_long", $"sa.hs", $"sb.hs"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
    val wBest = Window.partitionBy($"doc_id").orderBy($"jaccard".desc, $"dup_of")
    verified
      .withColumn("rn", row_number().over(wBest))
      .filter($"rn" === 1)
      .select($"doc_id", $"dup_of", $"jaccard")
  }

  /** Sketch any (doc_id, text) frame into the (doc_id, hs, mh)
    * signature form the dedup family consumes — the store/batch
    * sketch builder behind [[incrementalLosersOf]]. */
  private[graft] def sigOf(docs: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.ensureRegistered(docs.sparkSession)
    hashedShingleSetsOf(docs).withColumn("mh", expr("minhash_sig(hs)"))
  }

  /** d9: sketch-QUALITY accounting for the MinHash estimator — the
    * d2 candidate set scored BOTH ways: estimated Jaccard from
    * 128-perm signature agreement (matches/128, the similarity the
    * sketch would report without ever touching shingle sets) and the
    * exact verify value, with the absolute error per pair. The q25
    * pattern (sketch + exact + observed error in one artifact)
    * applied to the dedup family: it quantifies what d2's verify
    * stage buys, and at 100 TB it is the estimator-calibration job
    * run on a sample before trusting sketch-only thresholds. The
    * estimate is k/128 (exact binary rational), so both engines
    * compute bit-equal doubles. */
  def d9JaccardEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSigs(spark, dir)
    val cand = lshCandidates(sig, MaxBandBucket)
    val sets = sig.select($"doc_id", $"hs", $"mh")
    cand
      .join(sets.select($"doc_id".as("a_id"), $"hs".as("a_hs"), $"mh".as("a_mh")), "a_id")
      .join(sets.select($"doc_id".as("b_id"), $"hs".as("b_hs"), $"mh".as("b_mh")), "b_id")
      .select($"a_id", $"b_id",
        (expr("aggregate(zip_with(a_mh, b_mh, (x, y) -> IF(x = y, 1, 0)), 0, (s, v) -> s + v)")
          .cast("double") / 128.0).as("est_raw"),
        call_function("jaccard_sorted_long", $"a_hs", $"b_hs").as("exact_raw"))
      .select($"a_id", $"b_id",
        round($"est_raw", 6).as("est_jaccard"),
        round($"exact_raw", 6).as("jaccard"),
        round(abs($"est_raw" - $"exact_raw"), 6).as("abs_err"))
      .orderBy($"a_id", $"b_id")
  }

  /** d12: b-BIT MINWISE HASHING (Li & König 2010) — the signature-
    * STORE footprint cut: d2/d9 keep 128 64-bit minima = 1 KB per
    * document; storing only the low b=2 bits of each minimum packs
    * the same 128 permutations into 32 bytes — 32× smaller, which at
    * 100 TB is the difference between a sketch store that fits in
    * cluster memory and one that doesn't. Two UNRELATED minima still
    * agree on their low 2 bits with probability ~1/4, so raw
    * agreement is biased up; the estimator removes the collision
    * floor: est = (agree − 1/4) / (3/4), clamped at 0. Emitted next
    * to the exact Jaccard with per-pair error — the d9 calibration
    * pattern for the compressed sketch, run before trusting 2-bit
    * thresholds fleet-wide. Candidates are d2's capped-band pairs;
    * only the tiny verified-candidate set ever unpacks both
    * signatures. */
  def d12BbitMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSigs(spark, dir)
    val cand = lshCandidates(sig, MaxBandBucket)
    val sets = sig.select($"doc_id", $"hs", $"mh")
    val est = greatest(
      ($"agree2" - lit(0.25)) / lit(0.75), lit(0.0))
    cand
      .join(sets.select($"doc_id".as("a_id"), $"hs".as("a_hs"), $"mh".as("a_mh")), "a_id")
      .join(sets.select($"doc_id".as("b_id"), $"hs".as("b_hs"), $"mh".as("b_mh")), "b_id")
      .select($"a_id", $"b_id",
        (expr("aggregate(zip_with(a_mh, b_mh, (x, y) -> IF(x % 4 = y % 4, 1, 0)), 0, (s, v) -> s + v)")
          .cast("double") / 128.0).as("agree2"),
        call_function("jaccard_sorted_long", $"a_hs", $"b_hs").as("exact_raw"))
      .select($"a_id", $"b_id",
        round(est, 6).as("est_b2"),
        round($"exact_raw", 6).as("jaccard"),
        round(abs(est - $"exact_raw"), 6).as("abs_err"))
      .orderBy($"a_id", $"b_id")
  }

  /** LSH TUNING: choose (bands, rowsPerBand) for a target Jaccard
    * threshold — the knob-setting a 100 TB deployment does BEFORE
    * launching a fleet-wide dedup (re-sketching a corpus because the
    * S-curve was mis-centred is the expensive mistake). Candidate
    * probability for similarity s under (b bands × r rows) is
    * p(s) = 1 − (1 − s^r)^b; the error of a configuration is the
    * false-positive mass below the threshold plus the false-negative
    * mass above it (uniform integration — the standard MMDS
    * criterion). Exhaustive over the divisor pairs of `perms`; used
    * with d9/d12's measured calibration, not instead of it. */
  def optimalBands(threshold: Double, perms: Int = 128): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold: $threshold")
    val pairs = (1 to perms).filter(perms % _ == 0).map(b => (b, perms / b))
    pairs.minBy { case (b, r) => sCurveError(threshold, b, r) }
  }

  /** The integrated S-curve error of one (bands, rows) setting. */
  private[graft] def sCurveError(threshold: Double, b: Int, r: Int): Double = {
    val n = 1000
    var acc = 0.0
    var i = 0
    while (i < n) {
      val s = (i + 0.5) / n
      val p = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      acc += (if (s < threshold) p else 1.0 - p) / n
      i += 1
    }
    acc
  }

  /** d13: cross-document duplicated-SPAN detection — the window-
    * granular form of the ExactSubstr pass (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * document-level dedup (d1/d2) keeps one copy of a page but
    * cannot see a paragraph quoted across otherwise-distinct pages;
    * span-level detection can. Every 32-token window is poly-hashed
    * POSITIONALLY (the full suffix-array machinery reduces to
    * window hashing at fixed granularity — the standard distributed
    * approximation); a window hash appearing in >1 document marks a
    * duplicated span. Output per doc: window/dup-window counts and
    * the duplicated fraction — the signal a span-removal pass cuts
    * on. Scale shape: two map-side-combinable shuffles (window hash
    * → distinct-doc count; doc → fraction) — NEVER a pairwise
    * comparison, and the shuffle carries 8-byte hashes, not spans.
    * The flag compares the ROUNDED fraction (boundary-stable). */
  def d13WindowDedup(spark: SparkSession, dir: String, w: Int = 32): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= w)
    val wins = graft.Caches.persist(
      toks.select($"doc_id",
        explode(call_function("poly_hash_all", H.shinglesAll($"w", w))).as("h")))
    val hf = wins.select($"doc_id", $"h").distinct()
      .groupBy($"h").agg(count(lit(1)).as("ndocs"))
    wins.join(hf, Seq("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when($"ndocs" > 1, 1L).otherwise(0L)).as("dup_windows"))
      .select($"doc_id", $"n_windows", $"dup_windows",
        round($"dup_windows".cast("double") / $"n_windows", 6).as("dup_fraction"))
      .withColumn("is_duplicated", $"dup_fraction" >= 0.5)
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d17_band_sweep" -> ((sp, d) => d17BandSweep(sp, d)),
    "d16b_source_sweep" -> d16bSourceSweep _,
    "d16_threshold_sweep" -> d16ThresholdSweep _,
    "d13_window_dedup" -> ((s, d) => d13WindowDedup(s, d)),
    "d12_bbit_minhash" -> d12BbitMinhash _,
    "d9_jaccard_estimate" -> d9JaccardEstimate _,
    "d8_incremental_dedup" -> d8IncrementalDedup _,
    "d1_dedup_exact" -> d1Exact _,
    "d2_dedup_minhash_lsh" -> d2MinhashLsh _,
    "d14_tuned_lsh" -> ((sp, d) => d14TunedLsh(sp, d)),
    "d3_dedup_simhash" -> d3Simhash _,
    "d4_ngram_jaccard" -> d4NgramJaccard _,
    "d5_dedup_embedding" -> d5EmbeddingCosine _,
    "d6_line_dedup" -> d6LineDedup _,
    "d7_semdedup" -> d7SemDedup _,
    "d11_containment" -> d11Containment _)

  /** Posting-list cap for d11's inverted index — the hot-shingle
    * analog of [[MaxBandBucket]]: a shingle shared by more docs than
    * this is boilerplate and its postings would fan the probe join
    * out quadratically; mirrored in the oracle. */
  val MaxPosting = 64

  /** d11: CONTAINMENT near-dup — asymmetric Jaccard |A∩B| / |A|, the
    * relation symmetric Jaccard (d2/d4) structurally CANNOT see: a
    * short document quoted whole inside a long one has tiny Jaccard
    * (the union is the long doc) but containment ≈ 1. This is the
    * quote/subset/boilerplate-extraction detector a crawl corpus
    * needs next to its near-dup pass. Candidates come from a
    * smallest-hash inverted index: each doc PROBES with its two
    * smallest shingle hashes (hs is sorted, so that's a slice, not a
    * sort — and a contained doc's smallest shingles are, with high
    * probability, somewhere in its container), while the posting
    * side indexes every shingle, capped at [[MaxPosting]] per key so
    * a boilerplate shingle never fans out quadratically. The probe
    * shuffle carries 2 keys per doc; verification fetches the two
    * hashed sets by equi-join and checks the exact containment —
    * never an all-pairs pass. */
  def d11Containment(spark: SparkSession, dir: String): DataFrame =
    containmentOf(hashedShingleSets(spark, dir))

  /** The d11 core over any (doc_id, hs sorted-distinct hashed
    * shingle set) frame — [[hashedShingleSetsOf]] produces the
    * input shape from a raw (doc_id, text) corpus. */
  def containmentOf(d: DataFrame, tau: Double = 0.8,
                    cap: Int = MaxPosting): DataFrame = {
    import d.sparkSession.implicits._
    val probe = d.select($"doc_id".as("a_id"), explode(slice($"hs", 1, 2)).as("h"))
    val wP = Window.partitionBy($"h")
    val kept = d.select($"doc_id".as("b_id"), explode($"hs").as("h"))
      .withColumn("pcnt", count(lit(1)).over(wP))
      .filter($"pcnt" <= cap)
      .drop("pcnt")
    val cand = probe.join(kept, Seq("h"))
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id").distinct()
    val setsA = d.select($"doc_id".as("a_id"), $"hs".as("ha"))
    val setsB = d.select($"doc_id".as("b_id"), $"hs".as("hb"))
    cand.join(setsA, Seq("a_id")).join(setsB, Seq("b_id"))
      .select($"a_id", $"b_id",
        (size(array_intersect($"ha", $"hb")).cast("double") / size($"ha"))
          .as("cont_raw"),
        (size(array_intersect($"ha", $"hb")).cast("double")
          / size(array_union($"ha", $"hb"))).as("jac_raw"))
      .filter($"cont_raw" >= tau)
      .select($"a_id".as("contained_id"), $"b_id".as("container_id"),
        round($"cont_raw", 6).as("containment"),
        round($"jac_raw", 6).as("jaccard"))
      .orderBy($"contained_id", $"container_id")
  }

  /** Shared oracle CTEs (w + d): tokenized docs -> sorted distinct
    * poly-hashed 3-gram shingle sets over any (doc_id, text) relation
    * — the SQL twin of [[hashedShingleSetsOf]], reused by the d2, d4,
    * and p1 oracles so the replays can't drift apart. */
  private[operators] def hashedSetSqlOver(rel: String): String =
    s"""w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM $rel),
      |d AS (
      |  SELECT doc_id, list_sort(list_distinct(list_transform(
      |    list_transform(generate_series(1, len(w)-2),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
      |    t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(t)),
      |        i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
      |      (a, c) -> (a*31 + c) % 1000000007)))) AS hs
      |  FROM w WHERE len(w) >= 3)""".stripMargin

  private val hashedSetSql: String = hashedSetSqlOver("documents")

  /** The full DuckDB replay of [[minhashLshPairsOf]] over any
    * (doc_id, text) relation: poly-hashed shingle sets, the 128-perm
    * minhash with the SAME (a,b) constants the kernel uses (spliced
    * as literals), the band fold, the [[MaxBandBucket]] cap, the
    * bucket self-join, and the hashed-set jaccard verify. p1 splices
    * this over its exact-dedup survivor CTE. */
  /** Shared LSH oracle CTEs up through `keptb` (capped band buckets)
    * over any (doc_id, text) relation — the common prefix of the d2
    * and d8 replays. */
  private def lshKeptSqlOver(rel: String): String = {
    val (pa, pb) = H.permConstants(128)
    val aList = pa.mkString("[", ", ", "]")
    val bList = pb.mkString("[", ", ", "]")
    s"""${hashedSetSqlOver(rel)},
       |sigm AS (
       |  -- set-based minhash: explode shingles x 128 perms into a
       |  -- vectorized min aggregate (the nested list_reduce fold this
       |  -- replaces evaluated 128*|hs| interpreted lambdas per doc —
       |  -- ~300s at sf0.01; this form runs in seconds, same values)
       |  SELECT e.doc_id, p.p AS p,
       |    min((($aList)[p.p] * (e.h % 2147483647) + ($bList)[p.p]) % 2147483647) AS m
       |  FROM (SELECT doc_id, unnest(hs) AS h FROM d) e,
       |       LATERAL unnest(generate_series(1, 128)) AS p(p)
       |  GROUP BY e.doc_id, p.p),
       |sig AS (
       |  SELECT doc_id, list(m ORDER BY p) AS mh FROM sigm GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b.i - 1 AS band_idx,
       |    (((CAST(b.i - 1 AS BIGINT) * 31 + mh[2*b.i - 1] % 1000000007) % 1000000007) * 31
       |      + mh[2*b.i] % 1000000007) % 1000000007 AS band_hash
       |  FROM sig, LATERAL unnest(generate_series(1, 64)) AS b(i)),
       |keptb AS (
       |  SELECT doc_id, band_idx, band_hash FROM (
       |    SELECT doc_id, band_idx, band_hash,
       |      count(*) OVER (PARTITION BY band_idx, band_hash) AS bcnt
       |    FROM bands) WHERE bcnt <= $MaxBandBucket)""".stripMargin
  }

  private[operators] def d2SqlOver(rel: String): String =
    s"""WITH ${lshKeptSqlOver(rel)},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM keptb x JOIN keptb y
       |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |   AND x.doc_id < y.doc_id)
       |SELECT a_id, b_id, jaccard FROM (
       |  SELECT a_id, b_id,
       |    round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
       |        / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
       |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
       |WHERE jaccard >= 0.3
       |ORDER BY a_id, b_id""".stripMargin

  private[operators] lazy val d2Sql: String = d2SqlOver("documents")

  /** Shared CTE block for the d17/d14 replays: shingles, the 128-perm
    * signatures, one generalized band fold per [[SweepGeometries]]
    * entry (the same list_reduce H.bandHashes runs) with the bucket
    * cap, the tagged candidate union, d4-style exact ground truth at
    * `target`, the stats grid, and the measured pick — the whole
    * sweep replayed so a drifted band fold, cap, grade, or pick rule
    * hash-mismatches. */
  private def bandSweepSqlCtes(target: Double): String = {
    val (pa, pb) = H.permConstants(128)
    val aList = pa.mkString("[", ", ", "]")
    val bList = pb.mkString("[", ", ", "]")
    val perGeom = SweepGeometries.map { case (b, r) =>
      s"""bands_$b AS (
         |  SELECT doc_id, g.i - 1 AS band_idx,
         |    list_reduce(
         |      list_prepend(CAST(g.i - 1 AS BIGINT),
         |        mh[((g.i - 1) * $r + 1):(g.i * $r)]),
         |      (h, v) -> (h * 31 + v % 1000000007) % 1000000007) AS band_hash
         |  FROM sig, LATERAL unnest(generate_series(1, $b)) AS g(i)),
         |kept_$b AS (
         |  SELECT doc_id, band_idx, band_hash FROM (
         |    SELECT doc_id, band_idx, band_hash,
         |      count(*) OVER (PARTITION BY band_idx, band_hash) AS bcnt
         |    FROM bands_$b) WHERE bcnt <= $MaxBandBucket),
         |cand_$b AS (
         |  SELECT DISTINCT $b AS bands, $r AS rows_per_band,
         |    x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM kept_$b x JOIN kept_$b y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
         |   AND x.doc_id < y.doc_id)""".stripMargin
    }.mkString(",\n")
    val union = SweepGeometries
      .map { case (b, _) => s"  SELECT * FROM cand_$b" }
      .mkString("\n  UNION ALL\n")
    val gridVals = SweepGeometries
      .map { case (b, r) => s"($b, $r)" }.mkString(", ")
    s"""$hashedSetSql,
       |sigm AS (
       |  SELECT e.doc_id, p.p AS p,
       |    min((($aList)[p.p] * (e.h % 2147483647) + ($bList)[p.p]) % 2147483647) AS m
       |  FROM (SELECT doc_id, unnest(hs) AS h FROM d) e,
       |       LATERAL unnest(generate_series(1, 128)) AS p(p)
       |  GROUP BY e.doc_id, p.p),
       |sig AS (
       |  SELECT doc_id, list(m ORDER BY p) AS mh FROM sigm GROUP BY doc_id),
       |$perGeom,
       |allcand AS (
       |$union),
       |blocks_t AS (
       |  SELECT doc_id, 0 AS bidx, hs[1] AS bkey FROM d
       |  UNION ALL
       |  SELECT doc_id, 1 AS bidx, hs[len(hs)] AS bkey FROM d),
       |kept_t AS (
       |  SELECT doc_id, bidx, bkey FROM (
       |    SELECT doc_id, bidx, bkey,
       |      count(*) OVER (PARTITION BY bidx, bkey) AS bcnt
       |    FROM blocks_t) WHERE bcnt <= $MaxBlock),
       |cand_t AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM kept_t a JOIN kept_t b
       |    ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |truth AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT a_id, b_id,
       |      round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
       |          / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
       |    FROM cand_t JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
       |  WHERE jaccard >= $target),
       |grid AS (SELECT * FROM (VALUES $gridVals) AS g(bands, rows_per_band)),
       |tot AS (SELECT count(*) AS possible FROM truth),
       |stats0 AS (
       |  SELECT c.bands, c.rows_per_band,
       |    count(*) AS n_candidates, count(t.a_id) AS hits
       |  FROM allcand c LEFT JOIN truth t
       |    ON c.a_id = t.a_id AND c.b_id = t.b_id
       |  GROUP BY c.bands, c.rows_per_band),
       |stats AS (
       |  SELECT g.bands, g.rows_per_band,
       |    round(pow(1.0 / g.bands, 1.0 / g.rows_per_band), 4) AS s_curve_t,
       |    coalesce(s.n_candidates, 0) AS n_candidates,
       |    coalesce(s.hits, 0) AS hits, tot.possible,
       |    round(coalesce(s.hits, 0) / greatest(tot.possible, 1), 4) AS recall
       |  FROM grid g LEFT JOIN stats0 s
       |    ON g.bands = s.bands AND g.rows_per_band = s.rows_per_band, tot),
       |pick AS (
       |  SELECT bands, rows_per_band FROM stats
       |  ORDER BY CASE WHEN recall >= $BandRecallFloor
       |                THEN CAST(n_candidates AS DOUBLE)
       |                ELSE 1e18 * (1.0 - recall) END, bands DESC
       |  LIMIT 1)""".stripMargin
  }

  /** d17's replay: the sweep grid + the chosen flag. */
  private def d17Sql(target: Double): String =
    s"""WITH ${bandSweepSqlCtes(target)}
       |SELECT s.bands, s.rows_per_band, s.s_curve_t, s.n_candidates,
       |  s.hits, s.possible, s.recall,
       |  (s.bands = p.bands AND s.rows_per_band = p.rows_per_band) AS chosen
       |FROM stats s, pick p
       |ORDER BY s.bands""".stripMargin

  /** d14's replay: the sweep, the pick, and the serve — verified
    * pairs of the MEASURED geometry only. */
  private def d14Sql(target: Double): String =
    s"""WITH ${bandSweepSqlCtes(target)}
       |SELECT a_id, b_id, jaccard FROM (
       |  SELECT c.a_id AS a_id, c.b_id AS b_id,
       |    round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
       |        / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
       |  FROM allcand c
       |  JOIN pick p ON c.bands = p.bands AND c.rows_per_band = p.rows_per_band
       |  JOIN d da ON da.doc_id = c.a_id
       |  JOIN d db ON db.doc_id = c.b_id)
       |WHERE jaccard >= $target
       |ORDER BY a_id, b_id""".stripMargin

  /** d8's replay: d2's capped-band prefix, the id-midpoint cut, the
    * probe-side asymmetry (y.doc_id >= cut), and the best-prior-match
    * window. */
  private lazy val d8Sql: String =
    s"""WITH ${lshKeptSqlOver("documents")},
       |cut AS (SELECT max(doc_id) // 2 AS cut FROM documents),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS dup_of, y.doc_id AS new_id
       |  FROM keptb x JOIN keptb y
       |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |   AND x.doc_id < y.doc_id, cut
       |  WHERE y.doc_id >= cut.cut),
       |ver AS (
       |  SELECT new_id AS doc_id, dup_of,
       |    round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
       |        / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
       |  FROM cand JOIN d da ON da.doc_id = dup_of JOIN d db ON db.doc_id = new_id)
       |SELECT doc_id, dup_of, jaccard FROM (
       |  SELECT doc_id, dup_of, jaccard,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, dup_of) AS rn
       |  FROM ver WHERE jaccard >= 0.3)
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** d3's DuckDB replay: 60-bit packed poly token hashes, the
    * bit-vote simhash, 6x10-bit chunk blocking, hamming verify. */
  private lazy val d3Sql: String = {
    def fold(m: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(generate_series(1, length(t)),
         |          i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
         |        (a, c) -> (a*$m + c) % 1000000007)""".stripMargin
    s"""WITH tk AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tok
       |  FROM documents
       |  WHERE len(regexp_extract_all(lower(text), '\\S+')) > 0),
       |th AS (
       |  SELECT doc_id, list_transform(tok, t ->
       |      ((${fold(31)} * 2654435761) % 1073741824) * 1073741824
       |    + ((${fold(37)} * 2654435761) % 1073741824)) AS th
       |  FROM tk),
       |sim AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(0, 59), b ->
       |      CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(th, h -> CASE WHEN (h >> b) & 1 = 1
       |                                     THEN CAST(1 AS BIGINT)
       |                                     ELSE CAST(-1 AS BIGINT) END)),
       |        (s, v) -> s + v) > 0
       |      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
       |    (s, v) -> s + v) AS simhash
       |  FROM th),
       |chunks AS (
       |  SELECT doc_id, simhash, c.i - 1 AS chunk_idx,
       |         (simhash >> ((c.i - 1) * 10)) & 1023 AS chunk_val
       |  FROM sim, LATERAL unnest(generate_series(1, 6)) AS c(i)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
       |    CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |  FROM chunks x JOIN chunks y
       |    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
       |   AND x.doc_id < y.doc_id)
       |SELECT a_id, b_id, hamming FROM cand
       |WHERE hamming <= 5
       |ORDER BY a_id, b_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // d4's threshold-independent candidates, the τ grid applied as a
    // theta join — same caps, same rounding, same zero-fill
    // the per-source twin: same candidates/scoring CTEs, pairs kept
    // within-source, shares against per-source shingled totals
    "d16b_source_sweep" ->
      s"""WITH $hashedSetSql,
         |blocks AS (
         |  SELECT doc_id, 0 AS bidx, hs[1] AS bkey FROM d
         |  UNION ALL
         |  SELECT doc_id, 1 AS bidx, hs[len(hs)] AS bkey FROM d),
         |kept AS (
         |  SELECT doc_id, bidx, bkey FROM (
         |    SELECT doc_id, bidx, bkey,
         |      count(*) OVER (PARTITION BY bidx, bkey) AS bcnt
         |    FROM blocks) WHERE bcnt <= $MaxBlock),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM kept a JOIN kept b
         |    ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT a_id, b_id,
         |   round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |       / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
         |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id),
         |src AS (SELECT doc_id, source FROM documents),
         |sscored AS (
         |  SELECT sa.source AS source, s.a_id, s.b_id, s.jaccard
         |  FROM scored s
         |  JOIN src sa ON sa.doc_id = s.a_id
         |  JOIN src sb ON sb.doc_id = s.b_id
         |  WHERE sa.source = sb.source),
         |taus(tau) AS (VALUES ${SweepTaus.map(t => s"($t)").mkString(", ")}),
         |hit AS (
         |  SELECT s.source, t.tau, s.a_id, s.b_id FROM sscored s
         |  JOIN taus t ON s.jaccard >= t.tau),
         |np AS (SELECT source, tau, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM hit GROUP BY source, tau),
         |nd AS (SELECT source, tau,
         |         CAST(count(DISTINCT dd) AS BIGINT) AS n_docs_affected
         |       FROM (SELECT source, tau, unnest([a_id, b_id]) AS dd FROM hit)
         |       GROUP BY source, tau),
         |tot AS (SELECT src.source, CAST(count(*) AS DOUBLE) AS n_total
         |        FROM d JOIN src ON src.doc_id = d.doc_id
         |        GROUP BY src.source)
         |SELECT g.source, g.tau,
         |  coalesce(np.n_pairs, 0) AS n_pairs,
         |  coalesce(nd.n_docs_affected, 0) AS n_docs_affected,
         |  round(coalesce(nd.n_docs_affected, 0) / tot.n_total, 6) AS doc_share
         |FROM (SELECT tot.source, t.tau FROM tot, taus t) g
         |LEFT JOIN np ON np.source = g.source AND np.tau = g.tau
         |LEFT JOIN nd ON nd.source = g.source AND nd.tau = g.tau
         |JOIN tot ON tot.source = g.source
         |ORDER BY g.source, g.tau""".stripMargin,
    "d16_threshold_sweep" ->
      s"""WITH $hashedSetSql,
         |blocks AS (
         |  SELECT doc_id, 0 AS bidx, hs[1] AS bkey FROM d
         |  UNION ALL
         |  SELECT doc_id, 1 AS bidx, hs[len(hs)] AS bkey FROM d),
         |kept AS (
         |  SELECT doc_id, bidx, bkey FROM (
         |    SELECT doc_id, bidx, bkey,
         |      count(*) OVER (PARTITION BY bidx, bkey) AS bcnt
         |    FROM blocks) WHERE bcnt <= $MaxBlock),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM kept a JOIN kept b
         |    ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT a_id, b_id,
         |   round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |       / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
         |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id),
         |taus(tau) AS (VALUES ${SweepTaus.map(t => s"($t)").mkString(", ")}),
         |hit AS (
         |  SELECT t.tau, s.a_id, s.b_id FROM scored s
         |  JOIN taus t ON s.jaccard >= t.tau),
         |np AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM hit GROUP BY tau),
         |nd AS (SELECT tau, CAST(count(DISTINCT dd) AS BIGINT) AS n_docs_affected
         |       FROM (SELECT tau, unnest([a_id, b_id]) AS dd FROM hit)
         |       GROUP BY tau),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM d)
         |SELECT t.tau,
         |  COALESCE(np.n_pairs, 0) AS n_pairs,
         |  COALESCE(nd.n_docs_affected, 0) AS n_docs_affected,
         |  round(COALESCE(nd.n_docs_affected, 0) / tot.n_total, 6) AS doc_share
         |FROM taus t
         |LEFT JOIN np ON np.tau = t.tau
         |LEFT JOIN nd ON nd.tau = t.tau, tot
         |ORDER BY t.tau""".stripMargin,
    "d2_dedup_minhash_lsh" -> d2Sql,
    "d14_tuned_lsh" -> d14Sql(0.5),
    "d17_band_sweep" -> d17Sql(0.5),
    "d8_incremental_dedup" -> d8Sql,
    // d2's capped-band candidates, scored by signature agreement AND
    // the exact set Jaccard; est = k/128 is an exact binary rational
    "d9_jaccard_estimate" ->
      s"""WITH ${lshKeptSqlOver("documents")},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM keptb x JOIN keptb y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
         |   AND x.doc_id < y.doc_id),
         |scored AS (
         |  SELECT a_id, b_id,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, 128), i ->
         |        CASE WHEN sa.mh[i] = sb.mh[i] THEN CAST(1 AS BIGINT)
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (s, v) -> s + v) AS DOUBLE) / 128.0 AS est_raw,
         |    CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(da.hs, db.hs))) AS exact_raw
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = a_id
         |  JOIN sig sb ON sb.doc_id = b_id
         |  JOIN d da ON da.doc_id = a_id
         |  JOIN d db ON db.doc_id = b_id)
         |SELECT a_id, b_id,
         |  round(est_raw, 6) AS est_jaccard,
         |  round(exact_raw, 6) AS jaccard,
         |  round(abs(est_raw - exact_raw), 6) AS abs_err
         |FROM scored
         |ORDER BY a_id, b_id""".stripMargin,
    // same smallest-hash probe, same capped postings, same exact
    // containment verify
    "d11_containment" ->
      s"""WITH $hashedSetSql,
         |probe AS (SELECT doc_id AS a_id, unnest(hs[1:2]) AS h FROM d),
         |post AS (SELECT doc_id AS b_id, unnest(hs) AS h FROM d),
         |kept AS (
         |  SELECT b_id, h FROM (
         |    SELECT b_id, h, count(*) OVER (PARTITION BY h) AS pcnt
         |    FROM post) WHERE pcnt <= $MaxPosting),
         |cand AS (
         |  SELECT DISTINCT a_id, b_id FROM probe JOIN kept USING (h)
         |  WHERE a_id <> b_id),
         |ver AS (
         |  SELECT a_id, b_id,
         |    CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |      / len(da.hs) AS cont_raw,
         |    CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(da.hs, db.hs))) AS jac_raw
         |  FROM cand JOIN d da ON da.doc_id = a_id
         |  JOIN d db ON db.doc_id = b_id)
         |SELECT a_id AS contained_id, b_id AS container_id,
         |  round(cont_raw, 6) AS containment, round(jac_raw, 6) AS jaccard
         |FROM ver WHERE cont_raw >= 0.8
         |ORDER BY contained_id, container_id""".stripMargin,
    // same positional 32-token window hashes, same distinct-doc
    // counts, same rounded-fraction flag
    "d13_window_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        |ws AS (
        |  SELECT doc_id, array_to_string(w[g.i:g.i+31], ' ') AS t
        |  FROM w, LATERAL unnest(generate_series(1, len(w) - 31)) AS g(i)
        |  WHERE len(w) >= 32),
        |wins AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, length(t)),
        |        j -> CAST(ascii(substring(t, j, 1)) AS BIGINT))),
        |      (a, c) -> (a*31 + c) % 1000000007) AS h
        |  FROM ws),
        |hf AS (
        |  SELECT h, count(DISTINCT doc_id) AS ndocs FROM wins GROUP BY h),
        |per AS (
        |  SELECT wins.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_windows,
        |    CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS dup_windows
        |  FROM wins JOIN hf USING (h) GROUP BY wins.doc_id)
        |SELECT doc_id, n_windows, dup_windows,
        |  round(CAST(dup_windows AS DOUBLE) / n_windows, 6) AS dup_fraction,
        |  round(CAST(dup_windows AS DOUBLE) / n_windows, 6) >= 0.5
        |    AS is_duplicated
        |FROM per
        |ORDER BY doc_id""".stripMargin,
    // same capped-band candidates, same low-2-bit agreement, same
    // collision-floor correction
    "d12_bbit_minhash" ->
      s"""WITH ${lshKeptSqlOver("documents")},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM keptb x JOIN keptb y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
         |   AND x.doc_id < y.doc_id),
         |scored AS (
         |  SELECT a_id, b_id,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(1, 128), i ->
         |        CASE WHEN sa.mh[i] % 4 = sb.mh[i] % 4 THEN CAST(1 AS BIGINT)
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (s, v) -> s + v) AS DOUBLE) / 128.0 AS agree2,
         |    CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
         |      / len(list_distinct(list_concat(da.hs, db.hs))) AS exact_raw
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = a_id
         |  JOIN sig sb ON sb.doc_id = b_id
         |  JOIN d da ON da.doc_id = a_id
         |  JOIN d db ON db.doc_id = b_id)
         |SELECT a_id, b_id,
         |  round(greatest((agree2 - 0.25) / 0.75, 0.0), 6) AS est_b2,
         |  round(exact_raw, 6) AS jaccard,
         |  round(abs(greatest((agree2 - 0.25) / 0.75, 0.0) - exact_raw), 6)
         |    AS abs_err
         |FROM scored
         |ORDER BY a_id, b_id""".stripMargin,
    "d3_dedup_simhash" -> d3Sql,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_id""".stripMargin,
    "d4_ngram_jaccard" ->
      s"""WITH $hashedSetSql,
        |blocks AS (
        |  SELECT doc_id, 0 AS bidx, hs[1] AS bkey FROM d
        |  UNION ALL
        |  SELECT doc_id, 1 AS bidx, hs[len(hs)] AS bkey FROM d),
        |kept AS (
        |  SELECT doc_id, bidx, bkey FROM (
        |    SELECT doc_id, bidx, bkey,
        |      count(*) OVER (PARTITION BY bidx, bkey) AS bcnt
        |    FROM blocks) WHERE bcnt <= $MaxBlock),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM kept a JOIN kept b
        |    ON a.bidx = b.bidx AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, jaccard FROM (
        |  SELECT a_id, b_id,
        |   round(CAST(len(list_intersect(da.hs, db.hs)) AS DOUBLE)
        |       / len(list_distinct(list_concat(da.hs, db.hs))), 6) AS jaccard
        |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
        |WHERE jaccard >= 0.3
        |ORDER BY a_id, b_id""".stripMargin,
    "d5_dedup_embedding" ->
      s"""WITH e0 AS (
        |  SELECT vec_id, label,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |e AS (
        |  SELECT vec_id, label, v FROM (
        |    SELECT vec_id, label, v,
        |      count(*) OVER (PARTITION BY label) AS ccnt
        |    FROM e0) WHERE ccnt <= $MaxCell)
        |SELECT a_id, b_id, cosine FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |   round(
        |     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |       list_transform(generate_series(1, len(a.v)), i -> a.v[i]*b.v[i])), (s,x) -> s+x)
        |     / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(a.v, x -> x*x)), (s,x) -> s+x))
        |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(b.v, x -> x*x)), (s,x) -> s+x))), 6) AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    // the full Lloyd build (a4's CTE prefix at d7's finer k=64)
    // feeds the within-cell pair scan and the keep-lowest-id rule
    "d7_semdedup" ->
      (s"WITH ${Knn.kmeansCellsSqlFor(64)},\n" +
      s"""cellv AS (
         |  SELECT c.vec_id, c.cid, e.v
         |  FROM cells c JOIN e ON e.vec_id = c.vec_id),
         |capped AS (
         |  SELECT vec_id, cid, v FROM (
         |    SELECT vec_id, cid, v,
         |      count(*) OVER (PARTITION BY cid) AS ccnt
         |    FROM cellv) WHERE ccnt <= $MaxCell),
         |prs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |   round(
         |     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |       list_transform(generate_series(1, len(a.v)), i -> a.v[i]*b.v[i])), (s,x) -> s+x)
         |     / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(a.v, x -> x*x)), (s,x) -> s+x))
         |      * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(b.v, x -> x*x)), (s,x) -> s+x))), 6) AS cosine
         |  FROM capped a JOIN capped b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |losers AS (SELECT DISTINCT b_id FROM prs WHERE cosine >= 0.4)
         |SELECT vec_id, cid,
         |  (vec_id NOT IN (SELECT b_id FROM losers)) AS is_kept
         |FROM cellv
         |ORDER BY vec_id""".stripMargin),
    "d6_line_dedup" ->
      (s"WITH ${CorpusFilters.pagesSql},\n" +
      s"""lines AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(string_split(page, chr(10))) - 1)) AS line_idx,
         |    unnest(string_split(page, chr(10))) AS line
         |  FROM pages),
         |kept AS (
         |  SELECT doc_id, line_idx, line FROM (
         |    SELECT doc_id, line_idx, line,
         |      row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
         |    FROM lines) WHERE rn = 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |  md5(string_agg(line, chr(10) ORDER BY line_idx)) AS kept_md5
         |FROM kept
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin))
}
