package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HashFunctions

/** Analysis-time input type checks for the kernels. Spark 4 hides
  * ExpectsInputTypes.inputTypes from external packages, so each kernel
  * overrides checkInputDataTypes via this helper instead — misuse
  * (e.g. cosine_sim over array<float>, whose 4-byte slots
  * ArrayData.getDouble would silently misread) fails at analysis time
  * rather than returning garbage. */
private[plans] object KernelTypes {
  def requireArrays(pretty: String, elem: DataType,
                    args: Expression*): TypeCheckResult = {
    args.zipWithIndex.collectFirst {
      case (e, i) if !(e.dataType match {
        case ArrayType(et, _) => et == elem
        case _ => false
      }) =>
        TypeCheckResult.TypeCheckFailure(
          s"$pretty argument ${i + 1} requires array<${elem.simpleString}>, " +
            s"got ${e.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}

/** Native Catalyst expressions for the sketch/vector hot kernels.
  *
  * Spark's higher-order functions (transform/aggregate lambdas) are
  * evaluated interpretively — fine for composition, but a 128-perm
  * minhash over shingle arrays walks the expression tree ~40k times
  * per document. These expressions generate tight Java loops via
  * doGenCode (with an equivalent interpreted eval), keeping the whole
  * stage inside codegen. Semantics are bit-identical to the
  * higher-order formulations they replace (same constants, same fold
  * order), so results are unchanged.
  */
object Kernels {
  val P: Long = HashFunctions.MersennePrime
  val NumPerms = 128
  val (permA, permB) = HashFunctions.permConstants(NumPerms)
}

/** MinHash signature: array<bigint> shingle hashes -> array<bigint>
  * of NumPerms permutation minima. h_i = (a_i * (h mod p) + b_i) mod
  * p with a_i < 2^31 so products never overflow a long. */
case class MinHashSig(child: Expression)
    extends UnaryExpression {
  import Kernels._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, LongType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = new Array[Long](NumPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val hm = java.lang.Math.floorMod(arr.getLong(i), P)
      var j = 0
      while (j < NumPerms) {
        val v = java.lang.Math.floorMod(permA(j) * hm + permB(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val hm = ctx.freshName("hm"); val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$NumPerms];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $hm = java.lang.Math.floorMod($c.getLong($i), ${P}L);
         |  for (int $j = 0; $j < $NumPerms; $j++) {
         |    long $v = java.lang.Math.floorMod($aRef[$j] * $hm + $bRef[$j], ${P}L);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<bigint> of token hashes: per-bit
  * +-1 votes, sign becomes the bit. Matches the HOF formulation
  * ((h >> b) & 1 votes). */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, LongType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures: array<double> vector ->
  * array<bigint> of `tables` bucket signatures (`bits` bits each).
  * Weight(plane q, dim d) = +-1 from bit 16 of (q*64+d) * 2654435761
  * (Knuth's multiplicative hash) — deterministic, well-mixed, and
  * ANSI-SQL-reproducible (integer divide + mod), so the whole LSH
  * bucket pipeline is oracle-checkable. */
case class HyperplaneSig(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, DoubleType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < bits) {
        val q = t * bits + p
        var s = 0.0
        var d = 1
        while (d <= dim) {
          val w = (((q.toLong * 64 + d) * 2654435761L) >> 16) & 1L
          val x = arr.getDouble(d - 1)
          s += (if (w == 0L) x else -x)
          d += 1
        }
        if (s > 0) sig += (1L << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val sig = ctx.freshName("sig"); val w = ctx.freshName("w")
      val dim = ctx.freshName("dim")
      s"""
         |int $dim = $c.numElements();
         |long[] $sigs = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $bits; $p++) {
         |    double $s = 0.0;
         |    for (int $d = 1; $d <= $dim; $d++) {
         |      long $w = ((((long)($t * $bits + $p)) * 64 + $d) * 2654435761L >> 16) & 1L;
         |      $s += ($w == 0L) ? $c.getDouble($d - 1) : -$c.getDouble($d - 1);
         |    }
         |    if ($s > 0) $sig += (1L << $p);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Sequential-fold cosine similarity over two array<double> columns.
  * Fold order matches VectorFunctions.cosine (and the DuckDB oracle):
  * dot and norms accumulate left-to-right, so results are
  * bit-identical to the HOF formulation. Zero-norm -> 0.0. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, DoubleType, left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: vector lengths differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector lengths differ (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Hashed bag-of-words embedding: array<string> tokens ->
  * array<double> of `dims` bucket counts (bucket = xxhash64(token)
  * mod dims, seed 42 — identical to the HOF/c5 formulation).
  * Normalization stays a DataFrame op. */
case class HashedBow(child: Expression, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_bow"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, StringType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](dims)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      v(java.lang.Math.floorMod(h, dims.toLong).toInt) += 1.0
      i += 1
    }
    new GenericArrayData(v)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |double[] $v = new double[$dims];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  $utf8 $s = $c.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  $v[(int) java.lang.Math.floorMod($h, ${dims}L)] += 1.0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($v);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
}

/** Polynomial-hash bag-of-words: array<string> tokens ->
  * array<double> of `dims` bucket counts, bucket = (fold of
  * h*31 + codepoint mod 1e9+7) mod dims. Unlike [[HashedBow]]
  * (xxhash64), the hash is ANSI-SQL-expressible — DuckDB reproduces
  * it with ascii(substring(...)) folds — so embeddings built from it
  * are oracle-checkable end to end. Code points are walked as UTF-16
  * units (== code points for the BMP; the corpus' scripts are BMP). */
case class PolyBow(child: Expression, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "poly_bow"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, StringType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](dims)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i).toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        h = (h * 31 + s.charAt(j)) % 1000000007L
        j += 1
      }
      v((h % dims).toInt) += 1.0
      i += 1
    }
    new GenericArrayData(v)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      s"""
         |double[] $v = new double[$dims];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  String $s = $c.getUTF8String($i).toString();
         |  long $h = 0L;
         |  for (int $j = 0; $j < $s.length(); $j++) {
         |    $h = ($h * 31 + $s.charAt($j)) % 1000000007L;
         |  }
         |  $v[(int) ($h % $dims)] += 1.0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($v);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyBow =
    copy(child = newChild)
}

/** Element-wise polynomial hash: array<string> -> array<bigint>,
  * h(s) = fold of h*mult + codepoint mod 1e9+7 — the scalar twin of
  * [[PolyBow]], used where downstream set logic (minhash, jaccard,
  * simhash) wants the hash VALUES and the oracle must reproduce
  * them. Distinct multipliers give independent hash families. */
case class PolyHashArr(child: Expression, mult: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_hash_all"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, StringType, child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i).toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        h = (h * mult + s.charAt(j)) % 1000000007L
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      s"""
         |long[] $out = new long[$c.numElements()];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  String $s = $c.getUTF8String($i).toString();
         |  long $h = 0L;
         |  for (int $j = 0; $j < $s.length(); $j++) {
         |    $h = ($h * ${mult}L + $s.charAt($j)) % 1000000007L;
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashArr =
    copy(child = newChild)
}

/** Jaccard similarity of two pre-sorted, distinct array<bigint>
  * columns (hashed shingle sets) via a single merge walk — the
  * long-keyed twin of [[JaccardSorted]]: identical set semantics,
  * 8-byte compares instead of string compares. */
case class JaccardSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_long"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, LongType, left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val union = ctx.freshName("union")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedLong =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two pre-sorted, distinct array<string>
  * columns via a single merge walk — set semantics identical to
  * size(array_intersect)/size(array_union) (and the DuckDB oracle's
  * list_intersect/list_distinct(list_concat) counts), without
  * materializing either set. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, StringType, left, right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |int $union = $na + $nb - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Bounds-safe byte read from a binary column: byte_at(payload, pos)
  * with 1-based pos -> unsigned byte value as bigint, -1 past either
  * end. The binary-header parsers (Multimodal m3-m7) hop marker to
  * marker with DYNAMIC offsets; the built-in route for one such read
  * is substr(binary)->hex->conv — two string allocations and a
  * base-16 parse per byte, and the unrolled walks re-evaluate each
  * hop's offset subtree at every deeper hop, multiplying that churn.
  * This kernel makes the per-byte cost one array index, so even the
  * duplicated subtrees are cheap integer math inside codegen. */
case class ByteAt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_at"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"byte_at requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val bytes = l.asInstanceOf[Array[Byte]]
    val pos = r.asInstanceOf[Long]
    if (pos < 1L || pos > bytes.length) -1L
    else (bytes(pos.toInt - 1) & 0xff).toLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) =>
      s"""
         |${ev.value} = ($p < 1L || $p > $b.length)
         |  ? -1L : (long) ($b[(int) $p - 1] & 0xff);
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteAt =
    copy(left = newLeft, right = newRight)
}

/** First occurrence of a byte pattern in a binary payload:
  * (haystack, needle, from 1-based) -> 1-based position, or -1 when
  * absent — `locate` for BINARY, which Spark only ships for strings
  * (and a binary-cast-to-string round trip would corrupt offsets the
  * moment a payload byte isn't valid UTF-8). The marker hop every
  * framed binary walk needs when the next offset isn't
  * length-prefixed (PDF 'stream' delimiters, free-form tag scans);
  * naive scan, needle lengths here are single digits. */
case class BytesIndexOf(bytes: Expression, pat: Expression,
                        from: Expression) extends TernaryExpression {

  override def first: Expression = bytes
  override def second: Expression = pat
  override def third: Expression = from
  override def dataType: DataType = LongType
  override def prettyName: String = "bytes_index_of"
  override def checkInputDataTypes(): TypeCheckResult =
    (bytes.dataType, pat.dataType, from.dataType) match {
      case (BinaryType, BinaryType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (b, p, f) => TypeCheckResult.TypeCheckFailure(
        s"bytes_index_of requires (binary, binary, bigint), got " +
          s"(${b.simpleString}, ${p.simpleString}, ${f.simpleString})")
    }

  override def nullSafeEval(b0: Any, p0: Any, f0: Any): Any = {
    val b = b0.asInstanceOf[Array[Byte]]
    val p = p0.asInstanceOf[Array[Byte]]
    // clamp in LONG space before narrowing: a from beyond Int range
    // would wrap under .toInt and scan from the start, returning a
    // match BEFORE the requested offset
    var i = math.min(math.max(f0.asInstanceOf[Long] - 1L, 0L),
      b.length.toLong).toInt
    if (p.length == 0) return -1L
    while (i + p.length <= b.length) {
      var j = 0
      while (j < p.length && b(i + j) == p(j)) j += 1
      if (j == p.length) return (i + 1).toLong
      i += 1
    }
    -1L
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p, f) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |${ev.value} = -1L;
         |if ($p.length > 0) {
         |  for (int $i = (int) Math.min(Math.max($f - 1L, 0L), (long) $b.length);
         |       $i + $p.length <= $b.length; $i++) {
         |    int $j = 0;
         |    while ($j < $p.length && $b[$i + $j] == $p[$j]) $j++;
         |    if ($j == $p.length) { ${ev.value} = $i + 1; break; }
         |  }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BytesIndexOf =
    copy(bytes = f, pat = s, from = t)
}

/** Big-endian UINT32 table statistics over a binary payload:
  * be32_stats(bytes, off 1-based, count) folds up to `count`
  * complete 4-byte big-endian unsigned entries from `off` into
  * [n_read, sum, max, min] — the ISO-BMFF sample-table aggregation
  * (stsz sample sizes, stts deltas, and stco chunk offsets are all
  * BE32 tables; m16 reads the first two). Values are unsigned
  * (< 2³²) summed in long: 2²¹ entries fit before overflow even at
  * max value, far past any real per-file sample table. The fold
  * stops at the first entry that would run past the payload end;
  * n_read reports how many were read, and an empty fold yields
  * [0, 0, 0, 0]. Same one-codegen-loop design as [[Pcm16Stats]] —
  * the built-in route is an interpreted transform() lambda with a
  * boxed array per row. */
case class Be32Stats(bytes: Expression, off: Expression,
                     cnt: Expression) extends TernaryExpression {

  override def first: Expression = bytes
  override def second: Expression = off
  override def third: Expression = cnt
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "be32_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    (bytes.dataType, off.dataType, cnt.dataType) match {
      case (BinaryType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (b, o, c) => TypeCheckResult.TypeCheckFailure(
        s"be32_stats requires (binary, bigint, bigint), got " +
          s"(${b.simpleString}, ${o.simpleString}, ${c.simpleString})")
    }

  override def nullSafeEval(b0: Any, o0: Any, c0: Any): Any = {
    val b = b0.asInstanceOf[Array[Byte]]
    val start = o0.asInstanceOf[Long] - 1L
    val cnt = c0.asInstanceOf[Long]
    var n = 0L; var sum = 0L; var max = 0L; var min = 0L
    if (start >= 0L && start <= b.length.toLong) {
      var i = start.toInt
      while (n < cnt && i + 4 <= b.length) {
        val v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
        if (n == 0L) { max = v; min = v }
        else { if (v > max) max = v; if (v < min) min = v }
        n += 1; sum += v; i += 4
      }
    }
    new GenericArrayData(Array(n, sum, max, min))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, c) => {
      val i = ctx.freshName("i"); val v = ctx.freshName("v")
      val acc = ctx.freshName("acc"); val st = ctx.freshName("start")
      s"""
         |long[] $acc = new long[4];
         |long $st = $o - 1L;
         |if ($st >= 0L && $st <= (long) $b.length) {
         |  for (int $i = (int) $st;
         |       $acc[0] < $c && $i + 4 <= $b.length; $i += 4) {
         |    long $v = $b[$i] & 0xffL;
         |    $v = ($v << 8) | ($b[$i + 1] & 0xffL);
         |    $v = ($v << 8) | ($b[$i + 2] & 0xffL);
         |    $v = ($v << 8) | ($b[$i + 3] & 0xffL);
         |    if ($acc[0] == 0L) { $acc[2] = $v; $acc[3] = $v; }
         |    else { if ($v > $acc[2]) $acc[2] = $v;
         |           if ($v < $acc[3]) $acc[3] = $v; }
         |    $acc[0]++; $acc[1] += $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Be32Stats =
    copy(bytes = f, off = s, cnt = t)
}

/** 16-bit little-endian PCM sample statistics over a binary payload:
  * pcm16_stats(bytes, off 1-based) folds every complete 2-byte
  * sample from `off` to the end into [n, sum, sum_sq, peak_abs,
  * n_clip] (clip = the int16 rails ±32767/−32768). The m15 audio
  * profile reads ~dozens of samples per row; the built-in route is a
  * transform() lambda over a sequence() doing two byte_at calls and
  * sign math per sample — interpreted, with a boxed array per row.
  * Here the whole fold is one codegen loop over the raw byte array;
  * sums stay in long: a JVM byte array is capped at 2³¹ bytes, so a
  * payload holds ≤ 2³⁰ samples and sum_sq ≤ 2³⁰·2³⁰ = 2⁶⁰ < 2⁶³ —
  * the array-length bound, not a sample-count assumption, is what
  * makes overflow impossible. A trailing odd byte is ignored, off
  * out of range yields the empty fold (n=0). */
case class Pcm16Stats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pcm16_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pcm16_stats requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val bytes = l.asInstanceOf[Array[Byte]]
    val off = r.asInstanceOf[Long]
    val start = off - 1L
    var n = 0L; var sum = 0L; var sumSq = 0L; var peak = 0L; var clip = 0L
    if (start >= 0L && start <= bytes.length.toLong) {
      var i = start.toInt
      while (i + 2 <= bytes.length) {
        val s = ((bytes(i + 1).toInt << 8) | (bytes(i) & 0xff)).toLong
        n += 1; sum += s; sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        if (s == 32767L || s == -32768L) clip += 1
        i += 2
      }
    }
    new GenericArrayData(Array(n, sum, sumSq, peak, clip))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val a = ctx.freshName("a"); val acc = ctx.freshName("acc")
      val st = ctx.freshName("start")
      s"""
         |long[] $acc = new long[5];
         |long $st = $p - 1L;
         |if ($st >= 0L && $st <= (long) $b.length) {
         |  for (int $i = (int) $st; $i + 2 <= $b.length; $i += 2) {
         |    long $s = (long) (((int) $b[$i + 1] << 8) | ($b[$i] & 0xff));
         |    $acc[0]++; $acc[1] += $s; $acc[2] += $s * $s;
         |    long $a = Math.abs($s);
         |    if ($a > $acc[3]) $acc[3] = $a;
         |    if ($s == 32767L || $s == -32768L) $acc[4]++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Pcm16Stats =
    copy(left = newLeft, right = newRight)
}

/** Latin-1 mojibake repair (the ftfy bread-and-butter class): text
  * that was UTF-8 encoded, mis-decoded as Latin-1, and re-encoded
  * shows each non-ASCII char as a 2-char pair — a prefix char
  * U+00C2/U+00C3 (the Latin-1 reading of UTF-8 lead bytes 0xC2/0xC3)
  * followed by a continuation char in [U+0080, U+00BF]. Repair is
  * POSITIONAL, one pass, no cascade: char i is dropped iff it is
  * such a prefix with an in-range successor; char i is rewritten to
  * the decoded codepoint (cp, or cp+64 when the prefix was U+00C3 —
  * exactly (lead&0x1F)<<6 | cont&0x3F) iff its predecessor is such a
  * prefix; every other char passes through. The same lag/lead rule
  * replays vectorized in the oracle (t27), so both engines agree on
  * pathological inputs (chained prefixes, bare continuations). All
  * involved chars are < U+0100, so UTF-16 charAt positions ARE
  * codepoint positions. */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "mojibake_repair"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val pfx = (c == 0xC2 || c == 0xC3) && i + 1 < n &&
        s.charAt(i + 1) >= 0x80 && s.charAt(i + 1) <= 0xBF
      val cont = c >= 0x80 && c <= 0xBF && i > 0 &&
        (s.charAt(i - 1) == 0xC2 || s.charAt(i - 1) == 0xC3)
      if (pfx) {} // dropped: consumed as the pair's lead
      else if (cont)
        sb.append((c + (if (s.charAt(i - 1) == 0xC3) 64 else 0)).toChar)
      else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val sb = ctx.freshName("sb"); val i = ctx.freshName("i")
      val ch = ctx.freshName("ch"); val pfx = ctx.freshName("pfx")
      val cont = ctx.freshName("cont")
      s"""
         |String $s = $c.toString();
         |int $n = $s.length();
         |StringBuilder $sb = new StringBuilder($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  char $ch = $s.charAt($i);
         |  boolean $pfx = ($ch == 0xC2 || $ch == 0xC3) && $i + 1 < $n
         |    && $s.charAt($i + 1) >= 0x80 && $s.charAt($i + 1) <= 0xBF;
         |  boolean $cont = $ch >= 0x80 && $ch <= 0xBF && $i > 0
         |    && ($s.charAt($i - 1) == 0xC2 || $s.charAt($i - 1) == 0xC3);
         |  if ($pfx) { }
         |  else if ($cont) {
         |    $sb.append((char) ($ch + ($s.charAt($i - 1) == 0xC3 ? 64 : 0)));
         |  } else { $sb.append($ch); }
         |}
         |${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepair = copy(child = newChild)
}

/** Unicode canonical composition (NFC) via java.text.Normalizer —
  * the normalization every pretraining pipeline runs before hashing
  * or tokenizing, so 'e'+COMBINING ACUTE and the precomposed 'é'
  * dedup/tokenize identically. DuckDB's nfc_normalize replays it in
  * the oracle (both sides implement Unicode canonical composition,
  * so results are byte-identical). NFKC is available through the
  * same Normalizer in library code, but the oracle-gated query uses
  * NFC — the only form DuckDB ships. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));
         |""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** Bucketed character sums: string -> array<bigint> of `cells`
  * partial sums, cell i summing the char codes of the equal-width
  * slice [i*len/cells, (i+1)*len/cells) — the downsample grid of the
  * m11 perceptual hash (Multimodal.scala), which evaluated an
  * interpreted 66-arm transform/aggregate lambda per row before this
  * kernel. One tight pass per row; same charAt-vs-ascii(substring)
  * BMP equivalence as poly_hash_all (the corpus convention every
  * string kernel in this file shares). */
case class CharCells(child: Expression, cells: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_cells"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_cells requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length.toLong
    val out = new Array[Long](cells)
    var i = 0
    while (i < cells) {
      var j = (i * n / cells).toInt
      val hi = ((i + 1) * n / cells).toInt
      var acc = 0L
      while (j < hi) { acc += s.charAt(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val hi = ctx.freshName("hi")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $n = $s.length();
         |long[] $out = new long[$cells];
         |for (int $i = 0; $i < $cells; $i++) {
         |  int $j = (int) (($i * $n) / $cells);
         |  int $hi = (int) ((($i + 1) * $n) / $cells);
         |  long $acc = 0L;
         |  for (; $j < $hi; $j++) { $acc += $s.charAt($j); }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharCells =
    copy(child = newChild)
}

/** Binary sign words: array<double> -> array<bigint> of two 32-bit
  * words (bit d of word w set iff v[w*32+d] > 0) — the a14/a15
  * signature build, one pass instead of two 32-arm aggregate
  * lambdas. Bit-identical to the HOF formulation (same > 0 test,
  * same bit order). */
case class SignWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_words"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, DoubleType, child)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](2)
    var i = 0
    val n = math.min(v.numElements(), 64)
    while (i < n) {
      if (v.getDouble(i) > 0d) out(i >>> 5) |= 1L << (i & 31)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[2];
         |int $n = java.lang.Math.min($c.numElements(), 64);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.getDouble($i) > 0d) $out[$i >>> 5] |= 1L << ($i & 31);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignWords =
    copy(child = newChild)
}

/** SQ8 round-trip values: (v, los, his) -> array<double> of
  * dequantized codes, dq[i] = lo + floor((v-lo)/(hi-lo)*255+0.5)/255
  * *(hi-lo) (0 when hi == lo) — the a5/a15 representation build with
  * the exact double arithmetic (operation order included) of the HOF
  * chain it replaces, so oracle replays are unchanged. */
case class Sq8Dequant(vec: Expression, los: Expression, his: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = los
  override def third: Expression = his
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_dequant"
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, DoubleType, vec, los, his)

  override def nullSafeEval(v0: Any, l0: Any, h0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val lo = l0.asInstanceOf[ArrayData]
    val hi = h0.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val l = lo.getDouble(i); val h = hi.getDouble(i)
      if (h == l) out(i) = l
      else {
        val q = math.floor((v.getDouble(i) - l) / (h - l) * 255.0 + 0.5).toInt
        out(i) = l + q.toDouble / 255.0 * (h - l)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val l = ctx.freshName("l"); val h = ctx.freshName("h")
      val q = ctx.freshName("q")
      s"""
         |double[] $out = new double[$v.numElements()];
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  double $l = $lo.getDouble($i);
         |  double $h = $hi.getDouble($i);
         |  if ($h == $l) { $out[$i] = $l; }
         |  else {
         |    int $q = (int) java.lang.Math.floor(($v.getDouble($i) - $l) / ($h - $l) * 255.0 + 0.5);
         |    $out[$i] = $l + (double) $q / 255.0 * ($h - $l);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Dequant =
    copy(vec = f, los = s, his = t)
}

/** Full STORED-zip entry walk: payload -> array<struct<entry,
  * content>> — EOCD tail → central directory → per entry: name
  * (US-ASCII) and data bytes (local-header follow, declared size,
  * UTF-8). The column-expression formulation of this walk (byte_at /
  * le16 / le32 chains stacked per entry) exceeded the codegen
  * method-size limit and dropped the f4 stage to interpreted eval;
  * one kernel call per row keeps the stage compiled. Returns null
  * for non-zip payloads; entries with broken headers or bounds are
  * skipped. */
case class ZipEntries(child: Expression, maxEntries: Int)
    extends UnaryExpression {

  private val entryType = StructType(Seq(
    StructField("entry", StringType), StructField("content", StringType)))
  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def prettyName: String = "zip_entries"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zip_entries requires binary, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    val eocd = b.length - 22
    if (eocd < 0 || u8(0) != 0x50 || u8(1) != 0x4b ||
        u8(eocd) != 0x50 || u8(eocd + 1) != 0x4b ||
        u8(eocd + 2) != 0x05 || u8(eocd + 3) != 0x06) return null
    var ce = le32(eocd + 16).toInt
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var i = 0
    while (i < maxEntries && ce >= 0 && ce + 46 <= b.length &&
           u8(ce) == 0x50 && u8(ce + 1) == 0x4b &&
           u8(ce + 2) == 0x01 && u8(ce + 3) == 0x02) {
      val sz = le32(ce + 24).toInt
      val nlen = le16(ce + 28)
      val xlen = le16(ce + 30)
      val clen = le16(ce + 32)
      val loff = le32(ce + 42).toInt
      if (ce + 46 + nlen <= b.length && loff >= 0 && loff + 30 <= b.length) {
        val name = UTF8String.fromBytes(b, ce + 46, nlen)
        val data = loff + 30 + le16(loff + 26) + le16(loff + 28)
        if (sz >= 0 && data + sz <= b.length)
          out += org.apache.spark.sql.catalyst.InternalRow(
            name, UTF8String.fromBytes(b, data, sz))
      }
      ce += 46 + nlen + xlen + clen
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  // one virtual dispatch per row; the win is tree SIZE (stays in WSC)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val ref = ctx.addReferenceObj("zipEntriesExpr", this,
        classOf[ZipEntries].getName)
      val r = ctx.freshName("zipEntriesRes")
      s"""
         |Object $r = $ref.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

/** Shared helpers for the PQ kernels: materialize a foldable
  * array<array<array<double>>> literal (per-subspace codebooks,
  * layout books(s)(j)(d)) into a JVM table once per expression
  * instance. */
private[plans] object PqTable {
  def fromLiteral(books: Expression): Array[Array[Array[Double]]] = {
    require(books.foldable, "PQ codebooks must be a literal")
    val sArr = books.eval().asInstanceOf[ArrayData]
    Array.tabulate(sArr.numElements()) { s =>
      val jArr = sArr.getArray(s)
      Array.tabulate(jArr.numElements())(j => jArr.getArray(j).toDoubleArray())
    }
  }
  def check(pretty: String, vecOk: Boolean, books: Expression): TypeCheckResult =
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(s"$pretty: vector args must be array<double>")
    else if (!books.foldable || !(books.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$pretty: codebooks must be a foldable array<array<array<double>>>")
    else TypeCheckResult.TypeCheckSuccess
}

/** Product-quantization ENCODE: vector -> array<int> of per-subspace
  * nearest-codeword ids (code(s) = argmin_j ||v_sub(s) - books(s)(j)||²,
  * first minimum on ties — array_position semantics). Bit-identical
  * fold order to the HOF formulation it replaces (left-to-right
  * (x-c)² accumulation per codeword), which evaluated ~m·k·sub
  * element_at lambdas per row INTERPRETED — the PQ build pass was
  * the slowest ANN bench line before this kernel. */
case class PqEncode(vec: Expression, books: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = books
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult =
    PqTable.check(prettyName, vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }, books)

  @transient private lazy val table = PqTable.fromLiteral(books)

  override def nullSafeEval(v: Any, ignored: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = table.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = table(s); val sub = cb(0).length
      var best = 0; var bestD = Double.MaxValue; var first = true
      var j = 0
      while (j < cb.length) {
        var acc = 0.0; var d = 0
        while (d < sub) {
          val diff = arr.getDouble(s * sub + d) - cb(j)(d)
          acc += diff * diff
          d += 1
        }
        if (first || acc < bestD) { bestD = acc; best = j; first = false }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("pqBooks", table, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val m = ctx.freshName("m"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val cb = ctx.freshName("cb"); val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val out = ctx.freshName("out")
      s"""
         |int $m = $tbl.length;
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $cb = $tbl[$s];
         |  int $sub = $cb[0].length;
         |  int $best = 0; double $bestD = Double.MAX_VALUE; boolean first_$s = true;
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      double $diff = $v.getDouble($s * $sub + $d) - $cb[$j][$d];
         |      $acc += $diff * $diff;
         |    }
         |    if (first_$s || $acc < $bestD) { $bestD = $acc; $best = $j; first_$s = false; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, books = newRight)
}

/** Asymmetric-distance computation for PQ serving: approximate
  * squared L2 between a raw query vector and a CODED base vector —
  * Σ_s ||q_sub(s) - books(s)(code(s))||², accumulated subspace by
  * subspace from a 0.0 seed exactly like the aggregate() HOF chain
  * it replaces, so ADC rankings (and the driver's hash check) are
  * unchanged. */
case class PqAdc(qv: Expression, code: Expression, books: Expression)
    extends TernaryExpression {
  override def first: Expression = qv
  override def second: Expression = code
  override def third: Expression = books
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def checkInputDataTypes(): TypeCheckResult =
    PqTable.check(prettyName, (qv.dataType, code.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => true
      case _ => false
    }, books)

  @transient private lazy val table = PqTable.fromLiteral(books)

  override def nullSafeEval(q: Any, c: Any, ignored: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    while (s < table.length) {
      val cw = table(s)(ca.getInt(s)); val sub = cw.length
      var sacc = 0.0; var d = 0
      while (d < sub) {
        val diff = qa.getDouble(s * sub + d) - cw(d)
        sacc += diff * diff
        d += 1
      }
      acc += sacc
      s += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("pqBooks", table, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c, _) => {
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val cw = ctx.freshName("cw"); val sub = ctx.freshName("sub")
      val acc = ctx.freshName("acc"); val sacc = ctx.freshName("sacc")
      val diff = ctx.freshName("diff")
      s"""
         |double $acc = 0.0;
         |for (int $s = 0; $s < $tbl.length; $s++) {
         |  double[] $cw = $tbl[$s][$c.getInt($s)];
         |  int $sub = $cw.length;
         |  double $sacc = 0.0;
         |  for (int $d = 0; $d < $sub; $d++) {
         |    double $diff = $q.getDouble($s * $sub + $d) - $cw[$d];
         |    $sacc += $diff * $diff;
         |  }
         |  $acc += $sacc;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdc =
    copy(qv = newFirst, code = newSecond, books = newThird)
}

/** Nearest-centroid assignment: argmax of cosine similarity against
  * a foldable array<array<double>> centroid matrix, first maximum on
  * ties (array_position-on-array_max semantics, NaN ordered
  * greatest like Spark's ordering). Per-centroid cosine replicates
  * [[CosineSim]]'s single-pass dot/na/nb fold bit for bit, so the
  * k-means oracles' CTE replays are unchanged — the transform()
  * lambda this replaces evaluated k interpreted cosine calls per
  * row per Lloyd iteration. */
case class NearestCentroid(vec: Expression, cents: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def checkInputDataTypes(): TypeCheckResult =
    if (!(vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vector must be array<double>")
    else if (!cents.foldable || !(cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: centroids must be a foldable array<array<double>>")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table: Array[Array[Double]] = {
    val ad = cents.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(j => ad.getArray(j).toDoubleArray())
  }

  override def nullSafeEval(v: Any, ignored: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var best = 0; var bestS = 0.0; var first = true
    var j = 0
    while (j < table.length) {
      val c = table(j); val n = c.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = arr.getDouble(i); val y = c(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val s = if (denom == 0.0) 0.0 else dot / denom
      if (first || java.lang.Double.compare(s, bestS) > 0) {
        bestS = s; best = j; first = false
      }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("centroids", table, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val firstV = ctx.freshName("first")
      s"""
         |int $best = 0; double $bestS = 0.0; boolean $firstV = true;
         |for (int $j = 0; $j < $tbl.length; $j++) {
         |  double[] $c = $tbl[$j];
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    double $x = $v.getDouble($i); double $y = $c[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  double $s = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  if ($firstV || java.lang.Double.compare($s, $bestS) > 0) {
         |    $bestS = $s; $best = $j; $firstV = false;
         |  }
         |}
         |${ev.value} = $best;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(vec = newLeft, cents = newRight)
}

/** Driver-side registry of broadcast centroid matrices, keyed by a
  * small handle the PLAN carries instead of the matrix itself.
  *
  * [[NearestCentroid]] embeds the k·dims table as a foldable literal
  * — the fastest path for small quantizers, but at IVF scale (a
  * coarse quantizer over 100 TB wants k in the tens of thousands)
  * k·dims literals blow up analyzed-plan size, plan serialization,
  * and constant-folding time. Above [[graft.operators.Knn
  * .LiteralCentroidBudget]] the operators register the matrix here as
  * a `SparkContext.broadcast` (shipped to executors once via torrent
  * blocks, NOT once per task in the serialized plan) and the plan
  * carries only `centroid_kernel(v, <handle>)`. The builder closure
  * resolves the handle to the Broadcast at expression-construction
  * time, which runs on the driver. */
object CentroidBroadcasts {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[
      Long, org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  /** Broadcast `cents` and return its plan handle. */
  def register(spark: org.apache.spark.sql.SparkSession,
               cents: Seq[Seq[Double]]): Long = {
    val bc = spark.sparkContext.broadcast(cents.map(_.toArray).toArray)
    val id = ctr.incrementAndGet()
    reg.put(id, bc)
    id
  }

  def get(id: Long): org.apache.spark.broadcast.Broadcast[Array[Array[Double]]] =
    Option(reg.get(id)).getOrElse(
      throw new IllegalArgumentException(s"no broadcast centroids for handle $id"))
}

/** Shared scoring loop for the broadcast-centroid kernels — the
  * identical sequential fold as [[CosineSim]]/[[NearestCentroid]],
  * so literal and broadcast paths are bit-equal. */
private[plans] trait CentroidBcastLike extends UnaryExpression {
  def vec: Expression
  def bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]
  override def child: Expression = vec
  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypes.requireArrays(prettyName, DoubleType, vec)

  // resolved lazily on whichever JVM evaluates — the executor pulls
  // torrent blocks, the plan carries only the handle
  @transient protected lazy val table: Array[Array[Double]] = bc.value

  /** Generated-code expression for the table, reading through the
    * BROADCAST reference (embedding `table` itself via
    * addReferenceObj would put the matrix right back into the
    * serialized plan). `Broadcast.value` memoizes after the first
    * block fetch, so the per-row cost is a field read. */
  protected def tableRef(ctx: CodegenContext): String = {
    val bcRef = ctx.addReferenceObj("centroidsBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    s"((double[][]) $bcRef.value())"
  }
}

/** `nearest_centroid_bc(vec, handle)` — [[NearestCentroid]] with the
  * centroid matrix read from a broadcast variable. */
case class NearestCentroidBcast(
    vec: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends CentroidBcastLike {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_bc"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var best = 0; var bestS = 0.0; var first = true
    var j = 0
    while (j < table.length) {
      val c = table(j); val n = c.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = arr.getDouble(i); val y = c(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val s = if (denom == 0.0) 0.0 else dot / denom
      if (first || java.lang.Double.compare(s, bestS) > 0) {
        bestS = s; best = j; first = false
      }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.freshName("tbl")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val firstV = ctx.freshName("first")
      s"""
         |double[][] $tbl = ${tableRef(ctx)};
         |int $best = 0; double $bestS = 0.0; boolean $firstV = true;
         |for (int $j = 0; $j < $tbl.length; $j++) {
         |  double[] $c = $tbl[$j];
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    double $x = $v.getDouble($i); double $y = $c[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  double $s = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  if ($firstV || java.lang.Double.compare($s, $bestS) > 0) {
         |    $bestS = $s; $best = $j; $firstV = false;
         |  }
         |}
         |${ev.value} = $best;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroidBcast = copy(vec = newChild)
}

/** `centroid_scores_bc(vec, handle)` — per-centroid cosine scores as
  * array<double>, the broadcast replacement for the probe side's
  * `transform(<literal matrix>, c -> cosine_sim(v, c))`. Element j
  * is bit-equal to CosineSim(v, cents[j]). */
case class CentroidScoresBcast(
    vec: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends CentroidBcastLike {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_scores_bc"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Double](table.length)
    var j = 0
    while (j < table.length) {
      val c = table(j); val n = c.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = arr.getDouble(i); val y = c(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      out(j) = if (denom == 0.0) 0.0 else dot / denom
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.freshName("tbl")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val out = ctx.freshName("out")
      s"""
         |double[][] $tbl = ${tableRef(ctx)};
         |double[] $out = new double[$tbl.length];
         |for (int $j = 0; $j < $tbl.length; $j++) {
         |  double[] $c = $tbl[$j];
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    double $x = $v.getDouble($i); double $y = $c[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  $out[$j] = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CentroidScoresBcast = copy(vec = newChild)
}
