package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, VectorFunctions => V}

/** Parity proofs: each native codegen kernel must produce exactly
  * the values of the composable higher-order-function formulation it
  * replaced (same constants, same fold order). The HOF versions in
  * functions/ stay as the executable specification. */
class KernelSpec extends SparkSpec {

  test("minhash_sig kernel == HOF minhashSignature") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).limit(50)
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", array_sort(H.shingles($"w", 3)).as("sh"))
      .withColumn("hs", transform($"sh", s => xxhash64(s)))
    val rows = docs.select(
        expr("minhash_sig(hs)").as("kernel"),
        H.minhashSignature($"hs", 128).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_simhash64 kernel == HOF simhash64Expr") {
    import spark.implicits._
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select(expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tok"))
      .filter(size($"tok") > 0)
      .withColumn("th", transform($"tok", t => xxhash64(t)))
      .select(expr("graft_simhash64(th)").as("kernel"),
              H.simhash64Expr("th").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("char_cells kernel == HOF bucket-sum formulation") {
    import spark.implicits._
    val hof = expr(
      """transform(sequence(0, 65), i ->
        |  aggregate(
        |    if(cast(i as bigint) * length(text) div 66 >=
        |       cast(i + 1 as bigint) * length(text) div 66,
        |       cast(array() as array<bigint>),
        |       sequence(cast(i as bigint) * length(text) div 66 + 1,
        |                cast(i + 1 as bigint) * length(text) div 66)),
        |    cast(0 as bigint),
        |    (s, j) -> s + ascii(substring(text, cast(j as int), 1))))""".stripMargin)
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select(expr("char_cells(text, 66)").as("kernel"), hof.as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // short strings: empty slices contribute zero cells
    val tiny = Seq("ab", "").toDF("text")
      .select(expr("char_cells(text, 66)").as("k")).collect()
    assert(tiny(0).getSeq[Long](0).sum == 'a'.toLong + 'b'.toLong)
    assert(tiny(1).getSeq[Long](0).forall(_ == 0L))
  }

  test("sign_words / sq8_dequant kernels == HOF formulations (bit-identical)") {
    import spark.implicits._
    import graft.functions.{VectorFunctions => V}
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id", V.asDouble($"embedding").as("v"))
    def word(off: Int) = expr(
      s"aggregate(sequence(1, 32), cast(0 as bigint), (s, d) -> " +
      s"s + if(element_at(v, d + $off) > 0d, " +
      s"shiftleft(cast(1 as bigint), d - 1), cast(0 as bigint)))")
    val wRows = all.select(expr("sign_words(v)").as("k"),
        word(0).as("h0"), word(32).as("h1")).collect()
    assert(wRows.nonEmpty)
    wRows.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2))) }
    // SQ8 round trip vs the transform/element_at chain, double for double
    val scales = all.select(posexplode($"v"))
      .groupBy($"pos").agg(min($"col").as("lo"), max($"col").as("hi"))
      .agg(array_sort(collect_list(struct($"pos", $"lo", $"hi"))).as("plh"))
      .select(transform($"plh", p => p("lo")).as("los"),
              transform($"plh", p => p("hi")).as("his"))
    val hofDq = expr(
      """transform(sequence(1, 64), i ->
        |  element_at(los, i) +
        |  cast(if(element_at(his, i) = element_at(los, i), 0,
        |          cast(floor((element_at(v, i) - element_at(los, i)) /
        |            (element_at(his, i) - element_at(los, i)) * 255.0 + 0.5) as int))
        |       as double) / 255.0 *
        |  (element_at(his, i) - element_at(los, i)))""".stripMargin)
    val dqRows = all.crossJoin(broadcast(scales))
      .select(expr("sq8_dequant(v, los, his)").as("k"), hofDq.as("h")).collect()
    dqRows.foreach(r => assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
  }

  test("cosine_sim kernel == HOF cosine (bit-identical doubles)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir).limit(50)
      .select(V.asDouble($"embedding").as("v"))
    val rows = e.as("a").crossJoin(e.as("b")).limit(500)
      .select(V.cosineD($"a.v", $"b.v").as("kernel"),
              V.cosine($"a.v", $"b.v").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("kernels reject wrong input types at analysis time") {
    import spark.implicits._
    // array<float> would be silently misread by getDouble — must fail
    // when the plan is analyzed, not return garbage
    val floats = Tables.embeddings(spark, sfDir)
      .select($"embedding".as("f"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      floats.select(expr("cosine_sim(f, f)")).schema
    }
    assert(err.getMessage.contains("cosine_sim"))
    val err2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(expr("minhash_sig(array('a','b'))")).schema
    }
    assert(err2.getMessage.contains("minhash_sig"))
  }

  test("cosine_sim rejects mismatched vector lengths at runtime") {
    val e = intercept[Exception] {
      spark.range(1).selectExpr(
        "cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d))").collect()
    }
    assert(e.getMessage.contains("lengths differ") ||
           Option(e.getCause).exists(_.getMessage.contains("lengths differ")))
  }

  test("jaccard_sorted_long kernel == set intersect/union sizes on hashes") {
    import spark.implicits._
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select(expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= 3)
      .select(H.hashedShingles($"w", 3).as("hs"))
    val paired = rows.as("a").crossJoin(rows.as("b")).limit(300)
      .select(
        expr("jaccard_sorted_long(a.hs, b.hs)").as("kernel"),
        (size(array_intersect($"a.hs", $"b.hs")).cast("double") /
         size(array_union($"a.hs", $"b.hs"))).as("setops"))
      .collect()
    paired.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("jaccard_sorted kernel == set intersect/union sizes") {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir).limit(30)
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", array_sort(H.shingles($"w", 3)).as("sh"))
    val rows = d.as("a").crossJoin(d.as("b")).limit(400)
      .select(call_function("jaccard_sorted", $"a.sh", $"b.sh").as("kernel"),
              (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
               size(array_union($"a.sh", $"b.sh"))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("hashed_bow kernel == HOF bucket-count formulation") {
    import spark.implicits._
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select(expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("tok"))
      .select(expr("hashed_bow(tok, 64)").as("kernel"),
        expr("""transform(sequence(0, 63), b ->
                aggregate(tok, cast(0.0 as double), (s, t) ->
                  s + CASE WHEN pmod(xxhash64(t), 64) = b THEN 1.0 ELSE 0.0 END))""")
          .as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
  }

  test("pq_encode/pq_adc kernels == HOF argmin-encode and aggregate-ADC") {
    import spark.implicits._
    val m = 4; val sub = 4; val k = 5
    val vecs = Tables.embeddings(spark, sfDir).limit(40)
      .select($"vec_id", slice($"embedding", 1, m * sub).cast("array<double>").as("v"))
    val seeds = vecs.orderBy($"vec_id").limit(k)
      .select($"v").as[Seq[Double]].collect().toSeq
    val books = (0 until m).map(s => seeds.map(_.slice(s * sub, (s + 1) * sub)))
    val bookMat = typedLit(books)
    def l2sqH(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)), lit(0.0), _ + _)
    def subSlice(v: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =
      slice(v, s * sub + 1, lit(sub))
    val rows = vecs
      .withColumn("code", call_function("pq_encode", $"v", bookMat))
      .withColumn("code_hof",
        transform(sequence(lit(0), lit(m - 1)), s => {
          val dists = transform(sequence(lit(0), lit(k - 1)), j =>
            l2sqH(subSlice($"v", s), element_at(element_at(bookMat, s + 1), j + 1)))
          (array_position(dists, array_min(dists)) - 1).cast("int")
        }))
      .withColumn("adc", call_function("pq_adc", $"v", $"code", bookMat))
      .withColumn("adc_hof",
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, s) => acc + l2sqH(subSlice($"v", s),
            element_at(element_at(bookMat, s + 1),
                       element_at($"code", s + 1) + 1))))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](r.fieldIndex("code")) ==
             r.getSeq[Int](r.fieldIndex("code_hof")))
      assert(r.getDouble(r.fieldIndex("adc")) ==
             r.getDouble(r.fieldIndex("adc_hof")))
    }
  }

  test("two zip_entries calls compile into one codegen stage (fresh temp names)") {
    import spark.implicits._
    // Regression: ZipEntries.doGenCode used a FIXED local name, so a
    // projection with two zip_entries calls produced a Janino
    // duplicate-variable error and dropped to interpreted fallback.
    // fallback=false makes any codegen failure throw instead.
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val data = "stored".getBytes("UTF-8")
    val e = new java.util.zip.ZipEntry("a.txt")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(data.length); e.setCompressedSize(data.length)
    val crc = new java.util.zip.CRC32(); crc.update(data); e.setCrc(crc.getValue)
    zos.putNextEntry(e); zos.write(data); zos.closeEntry(); zos.close()
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
        .select(
          expr("zip_entries(payload, 10)").as("e10"),
          expr("zip_entries(payload, 1)").as("e1"))
        .collect().head
      assert(r.getSeq[Any](0).size == 1 && r.getSeq[Any](1).size == 1)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("pq_encode breaks distance ties toward the lowest code") {
    import spark.implicits._
    // two identical codewords: argmin must pick the FIRST (code 0)
    val books = Seq(Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(9.0, 9.0)))
    val r = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
      .select(call_function("pq_encode", $"v", typedLit(books)).as("c"))
      .collect().head.getSeq[Int](0)
    assert(r == Seq(0))
  }

  test("mojibake_repair kernel: positional C2/C3 pair rule, edge cases exact") {
    import spark.implicits._
    val cases = Seq(
      "Caf\u00c3\u00a9",       // one pair -> Caf\u00e9
      "\u00c2\u00b7 x",        // C2 pair -> bare middle dot
      "\u00c3\u00c3\u00a9",   // chained prefixes: first kept, second repaired
      "\u00a9 bare",            // bare continuation, no prefix -> untouched
      "\u00c3 gap",             // prefix with out-of-range successor -> untouched
      "plain ascii",
      "")
    val out = cases.toDF("t")
      .select($"t", expr("mojibake_repair(t)").as("r")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("Caf\u00c3\u00a9") == "Caf\u00e9")
    assert(out("\u00c2\u00b7 x") == "\u00b7 x")
    assert(out("\u00c3\u00c3\u00a9") == "\u00c3\u00e9")
    assert(out("\u00a9 bare") == "\u00a9 bare")
    assert(out("\u00c3 gap") == "\u00c3 gap")
    assert(out("plain ascii") == "plain ascii")
    assert(out("") == "")
  }

  test("nfc_normalize kernel == java.text.Normalizer NFC; NFC text is a fixpoint") {
    import spark.implicits._
    val cases = Seq("re\u0301sume\u0301", "r\u00e9sum\u00e9", "ascii only",
      "A\u030a ring", "")
    val out = cases.toDF("t")
      .select($"t", expr("nfc_normalize(t)").as("n")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(out(c) == java.text.Normalizer.normalize(c,
        java.text.Normalizer.Form.NFC), s"mismatch for '$c'")
    }
    assert(out("re\u0301sume\u0301") == "r\u00e9sum\u00e9")
    assert(out("A\u030a ring") == "\u00c5 ring")
    assert(out("r\u00e9sum\u00e9") == "r\u00e9sum\u00e9")
  }

  test("pcm16_stats kernel == HOF byte_at formulation; edges exact") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    // HOF reference: per-sample byte_at pair, sign-extend, fold
    val hof = expr(
      """aggregate(
        |  if(cast((length(p) - off + 1) div 2 as int) <= 0,
        |     cast(array() as array<bigint>),
        |     transform(sequence(0, cast((length(p) - off + 1) div 2 as int) - 1),
        |    i -> cast(if(byte_at(p, off + cast(i as bigint)*2 + 1) >= 128,
        |            byte_at(p, off + cast(i as bigint)*2 + 1) - 256,
        |            byte_at(p, off + cast(i as bigint)*2 + 1)) * 256
        |         + byte_at(p, off + cast(i as bigint)*2) as bigint))),
        |  array(cast(0 as bigint), cast(0 as bigint), cast(0 as bigint),
        |        cast(0 as bigint), cast(0 as bigint)),
        |  (a, s) -> array(a[0] + 1, a[1] + s, a[2] + s*s,
        |    greatest(a[3], abs(s)),
        |    a[4] + if(s = 32767 or s = -32768, 1, 0)))""".stripMargin)
    // payloads: planted samples incl. both rails, a negative, a
    // trailing odd byte, and an empty tail
    def le(ss: Seq[Int]): Array[Byte] =
      ss.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val planted = Seq(
      le(Seq(0, 1, -1, 32767, -32768, -2, 12345)),
      le(Seq(100, -100)) :+ 0x7f.toByte, // odd trailing byte ignored
      Array.empty[Byte])
      .map(Tuple1(_)).toDF("p").withColumn("off", lit(1L))
    planted.select(expr("pcm16_stats(p, off)").as("k"), hof.as("h"))
      .collect().foreach(r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // corpus-shaped payloads (m15's synthesis) agree too
    val rows = operators.Multimodal.m15PcmStats(spark, sfDir)
    assert(rows.count() > 0)
    val n = Tables.documents(spark, sfDir).limit(40)
      .select($"doc_id",
        expr("unhex(repeat('ab', 90))").as("p"), lit(45L).as("off"))
      .select(expr("pcm16_stats(p, off)").as("k"), hof.as("h"))
      .collect()
    n.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // out-of-range offset: empty fold, never an exception
    val oob = Seq(Tuple1(le(Seq(7)))).toDF("p")
      .selectExpr("pcm16_stats(p, cast(99 as bigint)) as k",
        "pcm16_stats(p, cast(-3 as bigint)) as neg").collect().head
    assert(oob.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(oob.getSeq[Long](1) == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("be32_stats kernel == HOF byte_at formulation; edges exact") {
    import spark.implicits._
    graft.plans.GraftFunctions.ensureRegistered(spark)
    // HOF reference: per-entry BE32 read via four byte_at calls,
    // folded to [n, sum, max, min] (max/min seeded from the first)
    val hof = expr(
      """aggregate(
        |  if(cast(least((length(p) - off + 1) div 4, cnt) as int) <= 0,
        |     cast(array() as array<bigint>),
        |     transform(sequence(0, cast(least((length(p) - off + 1) div 4,
        |                                      cnt) as int) - 1),
        |       i -> ((byte_at(p, off + cast(i as bigint)*4) * 256
        |              + byte_at(p, off + cast(i as bigint)*4 + 1)) * 256
        |              + byte_at(p, off + cast(i as bigint)*4 + 2)) * 256
        |              + byte_at(p, off + cast(i as bigint)*4 + 3))),
        |  array(cast(0 as bigint), cast(0 as bigint), cast(0 as bigint),
        |        cast(0 as bigint)),
        |  (a, v) -> array(a[0] + 1, a[1] + v,
        |    if(a[0] = 0, v, greatest(a[2], v)),
        |    if(a[0] = 0, v, least(a[3], v))))""".stripMargin)
    def be(vs: Seq[Long]): Array[Byte] = vs.flatMap(v => Seq(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    // planted: high-bit values (unsigned reads), a truncated tail
    // entry, a count smaller than the table, an empty payload
    val planted = Seq(
      (be(Seq(1L, 0xFFFFFFFFL, 0x80000000L, 42L)), 1L, 10L),
      (be(Seq(7L, 9L)) :+ 0x01.toByte, 1L, 10L), // trailing 1 byte ignored
      (be(Seq(5L, 6L, 7L)), 1L, 2L),             // count-bounded
      (Array.empty[Byte], 1L, 4L))
      .toDF("p", "off", "cnt")
    planted.select(expr("be32_stats(p, off, cnt)").as("k"), hof.as("h"))
      .collect().foreach(r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // out-of-range offsets: empty fold, never an exception
    val oob = Seq(Tuple1(be(Seq(3L)))).toDF("p")
      .selectExpr("be32_stats(p, cast(99 as bigint), cast(4 as bigint)) as k",
        "be32_stats(p, cast(-3 as bigint), cast(4 as bigint)) as neg")
      .collect().head
    assert(oob.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L))
    assert(oob.getSeq[Long](1) == Seq(0L, 0L, 0L, 0L))
  }

  test("bytes_index_of: binary-safe locate, 1-based, from-offset, -1 absent") {
    import spark.implicits._
    // payload contains a 0xFF byte that would corrupt a UTF-8 cast
    val payload = Array[Byte]('a', 'b', 0xFF.toByte, 'a', 'b', 'c')
    val r = Seq(Tuple1(payload)).toDF("p").selectExpr(
      "bytes_index_of(p, cast('ab' as binary), cast(1 as bigint)) as first",
      "bytes_index_of(p, cast('ab' as binary), cast(2 as bigint)) as second",
      "bytes_index_of(p, cast('abc' as binary), cast(1 as bigint)) as abc",
      "bytes_index_of(p, cast('zz' as binary), cast(1 as bigint)) as missing",
      "bytes_index_of(p, cast('' as binary), cast(1 as bigint)) as empty")
      .collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 4L, "match must be found past the invalid byte")
    assert(r.getLong(3) == -1L)
    assert(r.getLong(4) == -1L)
    // a from beyond Int range must NOT wrap negative and scan from the
    // start — it is past the payload, so no match exists
    val big = Seq(Tuple1(payload)).toDF("p").selectExpr(
      s"bytes_index_of(p, cast('ab' as binary), cast(${1L << 33} as bigint)) as huge",
      s"bytes_index_of(p, cast('ab' as binary), cast(${Long.MaxValue} as bigint)) as max")
      .collect().head
    assert(big.getLong(0) == -1L, "past-Int-range from must find nothing")
    assert(big.getLong(1) == -1L)
  }
}
