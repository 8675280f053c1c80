package graft

import graft.operators.CorpusFilters

class CorpusFiltersSpec extends SparkSpec {

  test("t6 C4 rules: boilerplate lines dropped, lorem/brace docs rejected") {
    import spark.implicits._
    val rows = CorpusFilters.t6C4Filter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // every page has 8 lines; 'Menu Home About' and the trailing short
    // line never survive the line rule
    rows.foreach { r =>
      assert(r.getLong(1) == 8)
      assert(r.getLong(2) <= 6)
    }
    // lorem docs are flagged and dropped
    byId.keys.filter(_ % 17 == 0).foreach { id =>
      assert(byId(id).getBoolean(4), s"doc $id should flag lorem")
      assert(!byId(id).getBoolean(7), s"doc $id should be dropped")
    }
    // brace docs (id % 13 == 5) are dropped even with enough sentences
    byId.keys.filter(id => id % 13 == 5 && id % 17 != 0).foreach { id =>
      assert(byId(id).getBoolean(5) && !byId(id).getBoolean(7))
    }
    // a plain doc survives
    byId.keys.filter(id => id % 17 != 0 && id % 13 != 5).take(5).foreach { id =>
      assert(byId(id).getBoolean(7), s"doc $id should be kept")
    }
  }

  test("t7 Gopher signals: duplicate-subscribe docs carry dup-line mass") {
    import spark.implicits._
    val rows = CorpusFilters.t7GopherRepetition(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    byId.foreach { case (id, r) =>
      val dupLine = r.getDouble(2)
      val dupChar = r.getDouble(3)
      val topWord = r.getDouble(4)
      if (id % 3 == 0) {
        // exactly one duplicated line pair out of 8
        assert(math.abs(dupLine - 1.0 / 8) < 1e-9, s"doc $id dup_line=$dupLine")
        assert(dupChar > 0)
        assert(r.getBoolean(5), s"doc $id should be flagged")
      } else {
        assert(dupLine == 0.0 && dupChar == 0.0, s"doc $id")
      }
      assert(topWord > 0 && topWord < 1)
    }
  }

  test("t9 Gopher quality signals are sane and the verdict composes them") {
    import spark.implicits._
    val rows = CorpusFilters.t9GopherQuality(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val nWords = r.getLong(1)
      val meanLen = r.getDouble(2)
      val alphaFrac = r.getDouble(6)
      val nStop = r.getLong(7)
      assert(nWords > 0, s"doc $id")
      assert(meanLen > 1 && meanLen < 20, s"doc $id mean_word_len=$meanLen")
      assert(r.getDouble(4) == 0.0, s"doc $id: no bullet lines in the corpus")
      assert(alphaFrac > 0.5 && alphaFrac <= 1.0, s"doc $id alpha=$alphaFrac")
      // every page contains at least 'the' (intro line); only the
      // duplicate-subscribe docs add 'to' — the signal that ends up
      // deciding the verdict on this corpus
      assert(nStop >= 1, s"doc $id stop hits=$nStop")
      // verdict re-derivable from the emitted signals
      val expect = nWords >= 50 && nWords <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        r.getDouble(3) <= 0.1 && r.getDouble(4) <= 0.1 &&
        r.getDouble(5) <= 0.3 && alphaFrac >= 0.8 && nStop >= 2
      assert(r.getBoolean(8) == expect, s"doc $id verdict")
    }
    // both verdicts occur: short docs fail the 50-word floor
    assert(rows.exists(_.getBoolean(8)) && rows.exists(!_.getBoolean(8)))
  }

  test("t8 PII: contact docs have one of each class, redaction removes them") {
    import spark.implicits._
    val out = CorpusFilters.t8PiiRedact(spark, sfDir)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    byId.foreach { case (id, r) =>
      val expected = if (id % 4 == 0) 1L else 0L
      assert(r.getLong(1) == expected, s"doc $id emails")
      assert(r.getLong(2) == expected, s"doc $id phones")
      assert(r.getLong(3) == expected, s"doc $id ips")
    }
    // every doc keeps a row (redaction rewrites, never drops)
    assert(out.count() == byId.size)
  }

  test("d6 line dedup keeps one global copy of shared boilerplate") {
    import spark.implicits._
    val rows = graft.operators.Dedup.d6LineDedup(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every document survives (its intro line is unique to it)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs)
    // doc 0 keeps everything except its own in-document duplicate
    // (the repeated subscribe line); later docs also lose the shared
    // 'Menu Home About' / 'Trailing short line' boilerplate
    assert(byId(0L) == 7L)
    assert(byId.filter(_._1 > 0).values.forall(_ <= 6L))
  }

  test("t28 strips intra-page repeats in place, keeps empties and order") {
    import spark.implicits._
    val hand = Seq(
      (1L, "nav bar\nbody one\nnav bar\nbody two\nnav bar"),
      (2L, "a\n\nb\n\na"),   // empty lines always survive, even repeated
      (3L, "x\ny\nz"),          // no repeats -> untouched
      (4L, ""))                  // degenerate single empty line
      .toDF("doc_id", "page")
    val out = CorpusFilters.repetitionStripOf(hand).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((5L, 2L, "nav bar\nbody one\nbody two")))
    assert(out(2L) == ((5L, 1L, "a\n\nb\n")))
    assert(out(3L) == ((3L, 0L, "x\ny\nz")))
    assert(out(4L) == ((1L, 0L, "")))
    // on the synthesized corpus: exactly the planted duplicated
    // newsletter line drops (doc_id % 3 == 0), first copy kept in place
    val real = CorpusFilters.t28RepetitionStrip(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(real.nonEmpty)
    real.foreach { case (id, dropped, clean) =>
      if (id % 3 == 0) {
        assert(dropped == 1L, s"doc $id should drop its duplicated line")
        assert("Subscribe to our newsletter today!".r
          .findAllIn(clean).size == 1)
      } else assert(dropped == 0L, s"doc $id dropped $dropped unexpectedly")
    }
  }
}
