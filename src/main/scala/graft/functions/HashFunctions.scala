package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash/sketch primitives for the dedup operators (SURVEY.md §2.D),
  * all expressed as codegen'd built-ins (xxhash64, higher-order
  * lambdas, bit ops) so the sketch computation happens inside
  * whole-stage codegen on the scan — the only shuffle a dedup job
  * pays is the band/bucket exchange.
  */
object HashFunctions {

  /** 2^31-1, Mersenne prime. Permutation arithmetic stays below 2^62
    * so it never overflows a long even under ANSI mode. */
  val MersennePrime: Long = 2147483647L

  /** Deterministic (a,b) pairs for the minhash permutation family
    * h_i(x) = (a_i*x + b_i) mod p — plain LCG-derived constants,
    * fixed seed, odd a. */
  def permConstants(n: Int): (Array[Long], Array[Long]) = {
    var state = 88172645463325252L
    def next(): Long = { // xorshift64
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      state & 0x7fffffffL
    }
    val a = Array.fill(n)(next() | 1L)
    val b = Array.fill(n)(next())
    (a, b)
  }

  /** Word n-gram shingles from a token array column (1-based
    * element_at; guarded by the sequence bound), duplicates kept —
    * dedup on the cheaper downstream representation when possible. */
  def shinglesAll(words: Column, n: Int): Column =
    transform(sequence(lit(0), size(words) - n), i =>
      concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*))

  /** Distinct word n-gram shingles. */
  def shingles(words: Column, n: Int): Column =
    array_distinct(shinglesAll(words, n))

  /** Sorted distinct polynomial hashes of the shingles — the
    * hashed-set form for minhash and merge-walk jaccard (distinct on
    * 8-byte longs, not strings). The poly hash (h*31+codepoint mod
    * 1e9+7, the codegen poly_hash_all kernel) is ANSI-SQL
    * reproducible, so sketches built on it stay oracle-checkable. */
  def hashedShingles(words: Column, n: Int): Column =
    array_sort(array_distinct(
      call_function("poly_hash_all", shinglesAll(words, n))))

  /** MinHash signature (`numPerms` longs in [0, p)) from a column of
    * shingle hashes. O(numPerms * |shingles|) inside codegen. */
  def minhashSignature(shingleHashes: Column, numPerms: Int): Column = {
    val (a, b) = permConstants(numPerms)
    val aCol = array(a.map(lit(_)): _*)
    val bCol = array(b.map(lit(_)): _*)
    transform(sequence(lit(0), lit(numPerms - 1)), i =>
      aggregate(shingleHashes, lit(Long.MaxValue), (m, h) =>
        least(m, pmod(element_at(aCol, i + 1) * pmod(h, lit(MersennePrime)) +
                      element_at(bCol, i + 1), lit(MersennePrime)))))
  }

  /** LSH band hashes: split a signature into `bands` bands of
    * `rowsPerBand` and hash each band with a polynomial fold seeded
    * by the band index (SQL-reproducible, unlike xxhash64 over the
    * slice). Join key = (band_idx, hash); ~1e9 buckets per band. */
  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    val m = 1000000007L
    transform(sequence(lit(0), lit(bands - 1)), bnd =>
      aggregate(
        slice(signature, bnd * rowsPerBand + 1, lit(rowsPerBand)),
        bnd.cast("long"),
        (h, v) => (h * 31 + v % m) % m))
  }

  /** 64-bit SimHash over a token-hash array: per bit, sum +-1 votes
    * across token hashes; sign becomes the bit. Disjoint-bit adds
    * can't overflow. Column shift amounts need the SQL form (the
    * Scala-API shiftleft/shiftright overloads only accept Int). */
  def simhash64Expr(tokenHashesCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
         |  acc + shiftleft(CASE WHEN
         |    aggregate($tokenHashesCol, cast(0 as bigint), (s, h) ->
         |      s + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END) > 0
         |  THEN cast(1 as bigint) ELSE cast(0 as bigint) END, i))""".stripMargin)

  /** Split a 64-bit simhash into `chunks` equal bit-chunks for
    * pigeonhole candidate blocking (hamming <= chunks-1 guaranteed
    * to share a chunk). */
  def simhashChunks(simhash: Column, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    transform(sequence(lit(0), lit(chunks - 1)), c =>
      struct(c.as("chunk_idx"),
             shiftRightCol(simhash, c * width).bitwiseAND(lit(mask)).as("chunk_val")))
  }

  /** shiftright with a Column amount (the functions.shiftright
    * overload only accepts Int). */
  private def shiftRightCol(v: Column, amount: Column): Column = {
    // logical shift via SQL: shiftright is arithmetic, so mask after.
    // For chunked extraction the sign bits are masked off anyway.
    call_function("shiftright", v, amount)
  }
}
