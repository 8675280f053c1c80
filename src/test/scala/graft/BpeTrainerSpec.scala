package graft

import graft.operators.BpeTrainer

/** t17: distributed BPE tokenizer training. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE (Sennrich): word-freq map in, merges
    * out — structurally independent of the DataFrame loop. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long, Long)] = {
    var state = words.map { case (w, f) => (w.map(_.toString).toList, f) }.toSeq
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      state.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val ((l, r), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      def mergeWord(syms: List[String]): List[String] = syms match {
        case a :: b :: rest if a == l && b == r => (a + b) :: mergeWord(rest)
        case a :: rest => a :: mergeWord(rest)
        case Nil => Nil
      }
      state = state.map { case (syms, f) => (mergeWord(syms), f) }
      val total = state.map { case (syms, f) => syms.length * f }.sum
      (l, r, cnt, total)
    }
  }

  test("t17 equals the sequential reference on a mixed corpus") {
    val docs = Seq(
      (1L, "the theme theater then the"),
      (2L, "there other the them"),
      (3L, "aaaa banana bandana the")).toDF("doc_id", "text")
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expect = refBpe(words, 3)
    val got = BpeTrainer.trainOf(docs, 3).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expect)
  }

  test("overlapping pairs merge left-to-right non-overlapping") {
    // "aaaa" has 3 (a,a) positions but only 2 non-overlapping merges
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r1 = BpeTrainer.trainOf(docs, 1).collect().head
    assert((r1.getString(1), r1.getString(2)) == ("a", "a"))
    assert(r1.getLong(3) == 3L, "count sees all 3 positions")
    assert(r1.getLong(4) == 2L, "merge leaves exactly 2 'aa' symbols")
  }

  test("t18 apply: more merges never inflate the token count") {
    val docs = Seq(
      (1L, "the theme theater then the"),
      (2L, "there other the them aaaa")).toDF("doc_id", "text")
    val merges = BpeTrainer.fitMerges(docs, 3).map { case (l, r, _, _) => (l, r) }
    val none = BpeTrainer.tokenizeOf(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = BpeTrainer.tokenizeOf(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(none.keySet == full.keySet)
    none.foreach { case (id, (ws, chars)) =>
      val (ws2, bpe) = full(id)
      assert(ws2 == ws, "whitespace count is merge-independent")
      // zero merges tokenizes to characters; merges only compress
      assert(bpe <= chars)
      // every word is at least one symbol
      assert(bpe >= ws)
    }
    Caches.releaseAll()
  }

  test("early-stops with the merges found so far when no pair remains") {
    // single-character words have no adjacent pairs at all
    val bare = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(BpeTrainer.fitMerges(bare, 5).isEmpty)
    // one mergeable pair, then the vocabulary is fully merged
    val one = Seq((1L, "ab c ab")).toDF("doc_id", "text")
    val merges = BpeTrainer.fitMerges(one, 5)
    assert(merges.map { case (l, r, _, _) => (l, r) } == Seq(("a", "b")))
  }

  test("driver-local loop matches the sequential reference at production round counts") {
    // vocabulary large enough that 200 rounds of merges all exist
    val words = (0 until 300).map { i =>
      val w = s"prefix${i % 17}stem${i % 29}suffix${i % 7}"
      (w, (i % 13 + 1).toLong)
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val expect = refBpe(words, 200)
    val got = BpeTrainer.fitMergesLocal(
      words.toArray.map { case (w, f) => (w, f) }, 200)
    assert(got == expect)
  }

  test("training is layout-invariant") {
    val docs = (0 until 120)
      .map(i => (i.toLong, s"alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    val a = BpeTrainer.trainOf(docs, 3).collect().map(_.toSeq).toSeq
    val b = BpeTrainer.trainOf(docs.repartition(7), 3).collect()
      .map(_.toSeq).toSeq
    assert(a == b)
    Caches.releaseAll()
  }
}
