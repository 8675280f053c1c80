package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** d20 exact-substring spans: planted geometry (true starts and
  * lengths), per-doc merge of overlapping partner spans, the
  * exactness law on the real corpus (every reported span's token
  * slice occurs verbatim in another document), and consistency with
  * d13's window profile. */
class ExactSpansSpec extends SparkSpec {

  import spark.implicits._

  test("planted repeat found with true start and length; no false spans") {
    val common = (1 to 20).map(i => s"c$i")
    val doc1 = ((1 to 10).map(i => s"x$i") ++ common ++
      (1 to 10).map(i => s"y$i")).mkString(" ")
    val doc2 = ((1 to 5).map(i => s"p$i") ++ common ++
      (1 to 7).map(i => s"q$i")).mkString(" ")
    // same vocabulary as the shared run but reversed: no 8-token
    // window survives, so no span may be reported
    val doc3 = (common.reverse ++ (1 to 9).map(i => s"z$i")).mkString(" ")
    val spans = Curation.exactSpansOf(
        Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSet === Set((1L, 11L, 20L), (2L, 6L, 20L)))
  }

  test("overlapping spans from different partners merge into one covered interval") {
    val toks = (1 to 40).map(i => s"t$i")
    val a = toks.mkString(" ")                               // 1..40
    val b = (toks.take(20) ++ (1 to 10).map(i => s"u$i")).mkString(" ")
    val c = ((1 to 10).map(i => s"v$i") ++ toks.drop(14)).mkString(" ")
    val spans = Curation.exactSpansOf(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"))
      .filter($"doc_id" === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // B covers 1..20, C covers 15..40 — doc A reports ONE interval
    assert(spans.toSeq === Seq((1L, 40L)))
  }

  test("exactness law on the corpus: every span's token slice occurs verbatim in another doc") {
    val spans = Curation.exactSpansOf(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt))
    assert(spans.nonEmpty, "the corpus's planted duplicates must yield spans")
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    spans.take(20).foreach { case (id, start, len) =>
      val slice = toks(id).slice(start - 1, start - 1 + len)
      assert(slice.length === len, s"span past doc end: $id/$start/$len")
      val needle = " " + slice.mkString(" ") + " "
      val found = toks.exists { case (oid, w) =>
        oid != id && (" " + w.mkString(" ") + " ").contains(needle)
      }
      assert(found, s"span ($id, $start, $len) has no verbatim twin")
    }
  }

  test("consistency with d13: a doc carrying a >=32-token exact span has dup windows") {
    val longSpans = Curation.exactSpansOf(Tables.documents(spark, sfDir))
      .filter($"len" >= 32).select($"doc_id").distinct()
    val d13 = Dedup.d13WindowDedup(spark, sfDir)
      .filter($"dup_windows" > 0).select($"doc_id")
    assert(longSpans.join(d13, Seq("doc_id"), "left_anti").count() === 0,
      "a 32-token exact repeat must surface in the 32-token window profile")
    Caches.releaseAll()
  }
}
