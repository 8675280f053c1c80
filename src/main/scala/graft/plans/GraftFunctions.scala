package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions as SQL functions.
  *
  * Two entry points:
  *  - `GraftSparkExtensions` for `spark.sql.extensions=` config
  *    (the library-user path via SparkSessionExtensions);
  *  - `ensureRegistered(spark)` for programmatic use — idempotent,
  *    called by the operators that need the kernels so any session
  *    (driver-created included) can run them.
  */
object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[Kernels.type].getName, null, name, usage, "")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig", "minhash_sig(hashes) - 128-perm MinHash signature",
      (args: Seq[Expression]) => MinHashSig(args.head)),
    ("graft_simhash64", "graft_simhash64(hashes) - 64-bit SimHash",
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("hyperplane_sig", "hyperplane_sig(vec, tables, bits) - hyperplane LSH signatures",
      (args: Seq[Expression]) => {
        require(args.length == 3, "hyperplane_sig(vec, tables, bits)")
        HyperplaneSig(args.head,
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())
      }),
    ("cosine_sim", "cosine_sim(a, b) - sequential-fold cosine similarity",
      (args: Seq[Expression]) => CosineSim(args.head, args(1))),
    ("jaccard_sorted", "jaccard_sorted(a, b) - jaccard of sorted distinct string arrays",
      (args: Seq[Expression]) => JaccardSorted(args.head, args(1))),
    ("jaccard_sorted_long", "jaccard_sorted_long(a, b) - jaccard of sorted distinct bigint arrays",
      (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1))),
    ("hashed_bow", "hashed_bow(tokens, dims) - hashed bag-of-words vector",
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_bow(tokens, dims)")
        HashedBow(args.head, args(1).eval().asInstanceOf[Number].intValue())
      }),
    ("poly_bow", "poly_bow(tokens, dims) - SQL-reproducible polynomial-hash bag-of-words",
      (args: Seq[Expression]) => {
        require(args.length == 2, "poly_bow(tokens, dims)")
        PolyBow(args.head, args(1).eval().asInstanceOf[Number].intValue())
      }),
    ("poly_hash_all", "poly_hash_all(strings[, mult]) - element-wise SQL-reproducible polynomial hash",
      (args: Seq[Expression]) =>
        if (args.length >= 2)
          PolyHashArr(args.head, args(1).eval().asInstanceOf[Number].longValue())
        else PolyHashArr(args.head)),
    ("byte_at", "byte_at(binary, pos) - 1-based unsigned byte read, -1 out of range",
      (args: Seq[Expression]) => ByteAt(args.head, args(1))),
    ("char_cells", "char_cells(text, cells) - bucketed char-code sums over equal-width slices",
      (args: Seq[Expression]) => CharCells(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
    ("bytes_index_of", "bytes_index_of(payload, pattern, from) - 1-based byte-pattern find in binary, -1 absent",
      (args: Seq[Expression]) => BytesIndexOf(args.head, args(1), args(2))),
    ("mojibake_repair", "mojibake_repair(text) - positional Latin-1 double-encoding repair (C2/C3 pairs)",
      (args: Seq[Expression]) => MojibakeRepair(args.head)),
    ("pcm16_stats", "pcm16_stats(payload, off) - [n, sum, sum_sq, peak_abs, n_clip] over 16-bit LE PCM from off",
      (args: Seq[Expression]) => Pcm16Stats(args.head, args(1))),
    ("be32_stats", "be32_stats(payload, off, count) - [n, sum, max, min] over a BE32 table from off",
      (args: Seq[Expression]) => Be32Stats(args.head, args(1), args(2))),
    ("nfc_normalize", "nfc_normalize(text) - Unicode canonical composition (NFC)",
      (args: Seq[Expression]) => NfcNormalize(args.head)),
    ("sign_words", "sign_words(vec) - two 32-bit sign-pattern words of a 64-dim vector",
      (args: Seq[Expression]) => SignWords(args.head)),
    ("sq8_dequant", "sq8_dequant(vec, los, his) - SQ8 quantize+dequantize round trip",
      (args: Seq[Expression]) => Sq8Dequant(args.head, args(1), args(2))),
    ("zip_entries", "zip_entries(payload, max) - STORED zip entry (name, content) array",
      (args: Seq[Expression]) => ZipEntries(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
    ("pq_encode", "pq_encode(vec, books) - per-subspace PQ codes (argmin, first-min ties)",
      (args: Seq[Expression]) => PqEncode(args.head, args(1))),
    ("pq_adc", "pq_adc(qv, code, books) - PQ asymmetric squared-L2 distance",
      (args: Seq[Expression]) => PqAdc(args.head, args(1), args(2))),
    ("nearest_centroid", "nearest_centroid(vec, cents) - argmax-cosine centroid id (first-max ties)",
      (args: Seq[Expression]) => NearestCentroid(args.head, args(1))),
    ("nearest_centroid_bc", "nearest_centroid_bc(vec, handle) - nearest_centroid against broadcast centroids",
      (args: Seq[Expression]) => NearestCentroidBcast(args.head,
        CentroidBroadcasts.get(args(1).eval().asInstanceOf[Number].longValue()))),
    ("centroid_scores_bc", "centroid_scores_bc(vec, handle) - per-centroid cosine scores against broadcast centroids",
      (args: Seq[Expression]) => CentroidScoresBcast(args.head,
        CentroidBroadcasts.get(args(1).eval().asInstanceOf[Number].longValue()))))

  /** Idempotent per-session registration. */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, usage, builder) =>
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info(name, usage), builder)
      }
    }
  }
}

/** `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions` */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Seq[(String, Seq[Expression] => Expression)](
      ("minhash_sig", args => MinHashSig(args.head)),
      ("graft_simhash64", args => SimHash64(args.head)),
      ("cosine_sim", args => CosineSim(args.head, args(1))),
      ("jaccard_sorted", args => JaccardSorted(args.head, args(1))),
      ("jaccard_sorted_long", args => JaccardSortedLong(args.head, args(1))),
      ("hyperplane_sig", args => HyperplaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())),
      ("hashed_bow", args => HashedBow(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
      ("poly_bow", args => PolyBow(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
      ("poly_hash_all", args =>
        if (args.length >= 2)
          PolyHashArr(args.head, args(1).eval().asInstanceOf[Number].longValue())
        else PolyHashArr(args.head)),
      ("byte_at", args => ByteAt(args.head, args(1))),
      ("char_cells", args => CharCells(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
      ("bytes_index_of", args => BytesIndexOf(args.head, args(1), args(2))),
      ("mojibake_repair", args => MojibakeRepair(args.head)),
      ("pcm16_stats", args => Pcm16Stats(args.head, args(1))),
      ("be32_stats", args => Be32Stats(args.head, args(1), args(2))),
      ("nfc_normalize", args => NfcNormalize(args.head)),
      ("sign_words", args => SignWords(args.head)),
      ("sq8_dequant", args => Sq8Dequant(args.head, args(1), args(2))),
      ("zip_entries", args => ZipEntries(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
      ("pq_encode", args => PqEncode(args.head, args(1))),
      ("pq_adc", args => PqAdc(args.head, args(1), args(2))),
      ("nearest_centroid", args => NearestCentroid(args.head, args(1))),
      ("nearest_centroid_bc", args => NearestCentroidBcast(args.head,
        CentroidBroadcasts.get(args(1).eval().asInstanceOf[Number].longValue()))),
      ("centroid_scores_bc", args => CentroidScoresBcast(args.head,
        CentroidBroadcasts.get(args(1).eval().asInstanceOf[Number].longValue())))
    ).foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[Kernels.type].getName, null, name),
        builder))
    }
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}
