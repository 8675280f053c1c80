package graft

import graft.operators.Curation
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, sum}

class CurationSpec extends SparkSpec {

  test("p3 split is total, deterministic, and duplicate-safe") {
    import spark.implicits._
    val docs = ((0 until 200).map(i => (i.toLong, s"unique document number $i with body text")) ++
      // exact duplicates of doc 0 under different ids — must co-split
      Seq((900L, "unique document number 0 with body text"),
          (901L, "unique document number 0 with body text"))).toDF("doc_id", "text")
    val s = Curation.splitOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s.size == 202)
    assert(Set(s(0L), s(900L), s(901L)).size == 1, "copies must share a split")
    assert(s.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly 80/10/10: train strictly dominates on 200+ docs
    val frac = s.values.count(_ == "train").toDouble / s.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac out of range")
    // rerun -> identical assignment (content-hash, not rand/monotonic id)
    val s2 = Curation.splitOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s == s2)
  }

  test("p4 per-source sampling caps the budget and rides the TopK heap") {
    val df = operators.Curation.p4SamplePerSource(spark, sfDir, k = 3)
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.values.foreach(rs => assert(rs.length <= 3))
    // deterministic: a rerun yields the identical sample
    val again = operators.Curation.p4SamplePerSource(spark, sfDir, k = 3).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the row_number filter is rewritten to the heap-based top-k
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopK"), s"expected TopKPerKey rewrite in plan")
  }

  test("p2 decontamination flags exactly the docs sharing an 8-gram with eval") {
    import spark.implicits._
    val evalDoc = "the quick brown fox jumps over the lazy dog tonight"
    val train = Seq(
      // contains the eval doc's opening 8-gram verbatim
      (1L, "prefix words then the quick brown fox jumps over the lazy suffix"),
      // shares vocabulary but no 8-token span
      (2L, "the quick brown cat sleeps under the lazy dog tonight"),
      (3L, "completely unrelated content about spark physical planning")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val flagged = Curation.decontaminate(train, eval).collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(1L))
    assert(flagged.head.getLong(1) == 1L, "one shared 8-gram expected")
  }

  test("p6 mixture sampler equalizes token share via per-source rates") {
    import spark.implicits._
    val rows = graft.operators.Curation.p6MixtureSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getString(1))
    // rates are per-source constants in (0, 1]
    bySource.foreach { case (src, rs) =>
      val rates = rs.map(_.getDouble(4)).distinct
      assert(rates.length == 1, s"$src rate not constant")
      assert(rates.head > 0 && rates.head <= 1.0)
    }
    // under-represented sources (rate = 1) keep everything
    rows.filter(_.getDouble(4) == 1.0).foreach(r => assert(r.getBoolean(5)))
    // the kept decision matches u < rate on every row
    rows.foreach(r => assert(r.getBoolean(5) == (r.getDouble(3) < r.getDouble(4))
      || math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-6))
  }

  test("p7 lays out each source shard contiguously with exact boundary flags") {
    val maxLen = 64L
    val rows = Curation.p7PackSequences(spark, sfDir, maxLen = maxLen.toInt)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val laid = rs.sortBy(_.getLong(3))
      var expect = 0L
      laid.foreach { r =>
        val (nTok, start, seqId, seqPos, crosses) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6))
        assert(start == expect, s"$src gap/overlap at doc ${r.getLong(1)}")
        expect += nTok
        assert(seqId == start / maxLen && seqPos == start % maxLen)
        val spans = nTok > 0 &&
          start / maxLen != (start + nTok - 1) / maxLen
        assert(crosses == spans)
      }
    }
  }

  test("p11 global shuffle is a layout-stable permutation with dense shards") {
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (i.toLong, s"document body number ${i % 97} variant ${i / 7}"))
      .toDF("doc_id", "text")
    val out = Curation.globalShuffleOf(docs, nShards = 8).collect()
    // a permutation: every doc placed exactly once
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 200L))
    // dense positions 1..count inside every shard
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length))
    }
    // layout-independent: a different physical partitioning yields
    // the byte-identical permutation
    val re = Curation.globalShuffleOf(docs.repartition(13), nShards = 8)
      .collect()
    assert(re.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq ==
      out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
    // content-keyed: exact copies land in the same shard
    val copies = Seq((1L, "same text"), (2L, "same text"), (3L, "other words here"))
      .toDF("doc_id", "text")
    val sh = Curation.globalShuffleOf(copies, nShards = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
  }

  test("p16 interleave keeps source shares stationary across prefixes") {
    val rows = Curation.p16MixtureInterleave(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(rows.nonEmpty)
    val byShard = rows.groupBy(_._1)
    byShard.values.foreach { shard =>
      val ordered = shard.sortBy(_._2).map(_._3)
      // dense positions
      assert(shard.map(_._2).sorted.toSeq == (1L to shard.length))
      if (ordered.length >= 40) {
        // no curriculum drift: each source's share in the first half
        // tracks its overall share (within a tolerance that a
        // source-grouped order would blow past)
        val half = ordered.take(ordered.length / 2)
        ordered.distinct.foreach { src =>
          val overall = ordered.count(_ == src).toDouble / ordered.length
          val early = half.count(_ == src).toDouble / half.length
          assert(math.abs(early - overall) < 0.15,
            s"source $src drifts: first-half $early vs overall $overall")
        }
      }
    }
  }

  test("p13 DSIR weights rank target-vocabulary docs above off-target docs") {
    import spark.implicits._
    // target slice (is_target) speaks vocab A; the raw remainder
    // speaks vocab B; two held-out probes (not in the target slice)
    // speak pure A and pure B respectively
    val vocabA = "alpha beta gamma delta epsilon zeta"
    val vocabB = "zork quux fnord blarg wibble grue"
    val docs = (
      (0 until 20).map(i => (i.toLong, s"$vocabA $i", true)) ++
      (20 until 40).map(i => (i.toLong, s"$vocabB $i", false)) ++
      Seq((100L, vocabA, false), (101L, vocabB, false))
    ).toDF("doc_id", "text", "tgt")
    val out = Curation.dsirOf(docs, col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // pure-A probe scores positive (kept), pure-B probe negative
    assert(out(100L)._1 > 0 && out(100L)._2)
    assert(out(101L)._1 < 0 && !out(101L)._2)
    // every target doc outweighs every vocab-B doc
    val minTgt = (0L until 20L).map(out(_)._1).min
    val maxOff = (20L until 40L).map(out(_)._1).max
    assert(minTgt > maxOff)
    // determinism across physical layouts
    val re = Curation.dsirOf(docs.repartition(7), col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(re == out)
  }

  test("p18 token budget: per-source quota respected, greedy prefix, stable") {
    val rows = Curation.p18TokenBudget(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val quota = rows.head._5
    rows.groupBy(_._2).foreach { case (src, rs) =>
      // kept tokens never exceed the quota
      val keptToks = rs.filter(_._6).map(_._3).sum
      assert(keptToks <= quota, s"$src kept $keptToks > quota $quota")
      // greedy prefix: ordered by cumsum, keeps form a prefix
      val ordered = rs.sortBy(_._4)
      assert(!ordered.map(_._6).dropWhile(identity).contains(true),
        s"$src kept set is not a cumsum prefix")
      // cumsum is consistent with the per-doc token counts
      assert(ordered.map(_._3).sum == ordered.last._4)
    }
    // the budget must actually bind somewhere on the real corpus
    assert(rows.exists(!_._6) && rows.exists(_._6))
  }

  test("p17 weighted sample: exact k, quality-biased, heap-based global top-k") {
    import graft.operators.TextAnalysis
    val df = Curation.p17WeightedSample(spark, sfDir, k = 100)
    val rows = df.collect()
    assert(rows.length == 100)
    // weighting must bias the sample toward quality: sample mean
    // strictly above the corpus mean
    val sampleMean = rows.map(_.getDouble(2)).sum / rows.length
    val corpusMean = TextAnalysis.scoredDocs(spark, sfDir)
      .agg(org.apache.spark.sql.functions.avg("quality")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
    // deterministic across reruns
    assert(Curation.p17WeightedSample(spark, sfDir, k = 100)
      .collect().map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    // global top-k must be the TakeOrderedAndProject heap merge, not
    // a total-order shuffle
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$physical")
    Caches.releaseShared()
  }

  test("p20 temperature mix flattens shares toward the tail, quotas tile the budget") {
    val rows = Curation.p20TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
                 r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.length > 1)
    // weights renormalize to 1; quotas tile the budget up to rounding
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._6).sum - 1000000L) < rows.length * 2L)
    // temperature flattens: the upsample factor is strictly
    // DECREASING in share (sqrt is concave), the smallest source is
    // boosted at least as much as the largest, and the share-weighted
    // mean of upsample is 1 (sum s_i * up_i = sum w_i) — so the mix
    // straddles 1: tails above, heads below
    val byShare = rows.sortBy(_._3)
    val ups = byShare.map(_._5)
    assert(ups.zip(ups.tail).forall { case (a, b) => a >= b },
      "upsample must decrease with share")
    assert(ups.head >= ups.last)
    assert(ups.head >= 1.0 - 1e-6 && ups.last <= 1.0 + 1e-6)
    // weight order follows share order (monotone transform)
    val ws = byShare.map(_._4)
    assert(ws.sameElements(ws.sorted), "weight order must follow share order")
    Caches.releaseAll()
  }

  test("p21 contamination report tiles p2's hits exactly, rates bounded") {
    val rep = Curation.p21ContaminationReport(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rep.nonEmpty)
    val p2 = Curation.p2Decontaminate(spark, sfDir).collect()
      .map(r => r.getLong(1))
    // the rollup is a partition of p2's per-document evidence
    assert(rep.map(_._3).sum == p2.length, "contaminated docs must tile p2")
    assert(rep.map(_._6).sum == p2.sum, "shared-gram totals must tile p2")
    rep.foreach { case (src, nd, nc, nt, tc, _, dr, tr) =>
      assert(nc <= nd && tc <= nt, s"$src counts exceed totals")
      assert(dr >= 0.0 && dr <= 1.0 && tr >= 0.0 && tr <= 1.0)
    }
    Caches.releaseAll()
  }

  test("p23 water-filling exhausts the budget at a common level, max-min fair") {
    import spark.implicits._
    // sources with 10/20/30/100 tokens
    val corpus = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "sa"),
      (2L, Seq.fill(20)("w").mkString(" "), "sb"),
      (3L, Seq.fill(30)("w").mkString(" "), "sc"),
      (4L, Seq.fill(100)("w").mkString(" "), "sd")
    ).toDF("doc_id", "text", "source")
    def run(b: Long) = Curation.waterfillOf(corpus, b).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).sortBy(_._1)
    // budget 100: only the largest source is capped, λ = 40
    val r100 = run(100L)
    assert(r100.map(_._4).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(r100.map(_._3).toSeq == Seq(false, false, false, true))
    assert(r100.forall(_._5 == 40.0))
    assert(r100.map(_._4).sum == 100L, "budget must be exhausted exactly")
    // budget 70: level 20 caps sc and sd; sb sits exactly AT the level
    val r70 = run(70L)
    assert(r70.map(_._4).toSeq == Seq(10L, 20L, 20L, 20L))
    assert(r70.map(_._4).sum == 70L)
    // budget above the corpus: nobody is capped, level undefined
    val rAll = run(1000L)
    assert(rAll.map(_._4).toSeq == Seq(10L, 20L, 30L, 100L))
    assert(rAll.forall(!_._3) && rAll.forall(_._5.isNaN))
    // every allocation is bounded by what the source has
    (r100 ++ r70 ++ rAll).foreach { case (_, tok, _, alloc, _) =>
      assert(alloc <= tok)
    }
    Caches.releaseAll()
  }

  test("p24 manifest tiles the corpus exactly: docs, tokens, bytes, xor checksum") {
    import spark.implicits._
    val m = Curation.p24ShardManifest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(m.nonEmpty)
    // conservation: the manifest must account for EVERY document
    val corpus = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text",
        expr("element_at(poly_hash_all(array(text)), 1)").as("hv"),
        expr("cast(octet_length(text) as bigint)").as("b"),
        expr("cast(regexp_count(text, '\\\\S+') as bigint)").as("tok"))
      .agg(count(lit(1)), sum($"b"), sum($"tok"),
        expr("bit_xor(hv)"), min($"doc_id"), max($"doc_id"))
      .collect().head
    assert(m.map(_._3).sum == corpus.getLong(0), "doc count must tile")
    assert(m.map(_._5).sum == corpus.getLong(1), "byte count must tile")
    assert(m.map(_._4).sum == corpus.getLong(2), "token count must tile")
    assert(m.map(_._6).reduce(_ ^ _) == corpus.getLong(3),
      "xor of shard checksums must equal the corpus checksum")
    assert(m.map(_._7).min == corpus.getLong(4) &&
      m.map(_._8).max == corpus.getLong(5))
    // layout: shard_ix contiguous from 0 per stream; size target
    // respected except single-oversize-doc shards
    m.groupBy(_._1).foreach { case (s, shards) =>
      val ixs = shards.map(_._2).sorted
      assert(ixs.toSeq == (0L until ixs.length).toSeq, s"stream $s gaps")
    }
    m.filter(!_._9).foreach { case row =>
      assert(row._5 <= 1024L, s"non-oversize shard over target: $row")
    }
    // deterministic rerun
    val again = Curation.p24ShardManifest(spark, sfDir).collect()
      .map(r => r.toSeq)
    assert(again.toSeq == Curation.p24ShardManifest(spark, sfDir)
      .collect().map(r => r.toSeq).toSeq)
    Caches.releaseAll()
  }

  test("p25 verify: drift localized to edited docs' shards, clean shards byte-identical") {
    val m = Curation.p24ShardManifest(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap // (stream, shard_ix) -> (n_docs, n_tokens, n_bytes, checksum)
    val v = Curation.p25ManifestVerify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getString(10)))
    // the verify report covers exactly the manifest's shards, with
    // the manifest's expectations echoed verbatim
    assert(v.map(r => (r._1, r._2)).toSet == m.keySet)
    v.foreach { case (s, ix, nDocs, nChanged, expCk, actCk,
        expB, actB, expT, actT, status) =>
      val (mDocs, mToks, mBytes, mCk) = m((s, ix))
      assert(nDocs == mDocs && expT == mToks && expB == mBytes
        && expCk == mCk, s"shard ($s,$ix) expectations diverge from manifest")
      // a checksum mismatch is exactly the changed-doc condition:
      // every edited doc appends ' EDIT' (hash + 5 bytes + 1 token)
      if (nChanged == 0) {
        assert(status == "ok" && actCk == expCk
          && actB == expB && actT == expT, s"clean shard ($s,$ix) flagged")
      } else {
        assert(status == "drifted" && actCk != expCk, s"($s,$ix) not flagged")
        assert(actB == expB + 5 * nChanged && actT == expT + nChanged)
      }
    }
    // the planted drift class is doc_id % 101 == 7 — count must agree
    val expectedChanged = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(101)) === 7).count()
    assert(v.map(_._4).sum == expectedChanged)
    assert(v.exists(_._11 == "drifted"), "no drift surfaced at this sf")
    Caches.releaseAll()
  }

  test("d18 span profile: a copied 8-gram flags both docs, short docs have no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta unique tail one"),
      (2L, "prefix alpha beta gamma delta epsilon zeta eta theta different end"),
      (3L, "totally different words that no other document shares at all here"),
      (4L, "short doc"))
      .toDF("doc_id", "text")
    val out = Curation.duplicatedSpansOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // 11 words -> 4 spans each; exactly the copied 8-gram is shared
    assert(out(1L) == ((4L, 1L, 0.25, 2L)))
    assert(out(2L) == ((4L, 1L, 0.25, 2L)))
    assert(out(3L)._2 == 0L && out(3L)._4 == 1L)
    assert(!out.contains(4L), "docs under the n-gram width have no spans")
    Caches.releaseAll()
    // real corpus: total, bounded, breadth >= 1 everywhere
    val real = Curation.d18DuplicatedSpans(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(4) >= 1L)
    }
    Caches.releaseAll()
  }

  test("d19 strip removes exactly the cross-doc span tokens, positionally") {
    import spark.implicits._
    val docs = Seq(
      // docs 1/2 share the 8-gram "alpha..theta"; their unique words
      // survive; doc 2's copy sits mid-text so the strip is positional
      (1L, "alpha beta gamma delta epsilon zeta eta theta unique tail one"),
      (2L, "prefix alpha beta gamma delta epsilon zeta eta theta different end"),
      (3L, "totally different words that no other document shares at all here"),
      (4L, "short doc"))
      .toDF("doc_id", "text")
    val out = Curation.boilerplateStripOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: tokens 1..8 covered -> kept = the 3-token tail
    assert(out(1L).getLong(1) == 11L && out(1L).getLong(2) == 8L)
    assert(out(1L).getString(5) == "unique tail one")
    // doc 2: tokens 2..9 covered -> kept = first + last two
    assert(out(2L).getLong(2) == 8L)
    assert(out(2L).getString(5) == "prefix different end")
    // untouched docs pass through whole, keep_frac 1.0
    assert(out(3L).getLong(2) == 0L && out(3L).getDouble(3) == 1.0)
    assert(out(4L).getLong(2) == 0L && out(4L).getLong(1) == 2L,
      "short docs have no spans and pass through whole")
    // kept_chars counts the kept text exactly
    assert(out(1L).getLong(4) == "unique tail one".length.toLong)
    Caches.releaseAll()
    // real corpus: the strip and the d18 profile agree on WHO is
    // touched (a doc loses tokens iff it has a shared span)
    val stripped = Curation.d19BoilerplateStrip(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    Caches.releaseAll()
    val profile = Curation.d18DuplicatedSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    profile.foreach { case (id, nShared) =>
      assert((stripped(id) > 0L) == (nShared > 0L),
        s"doc $id: strip/profile disagree ($nShared shared, ${stripped(id)} removed)")
    }
    assert(stripped.values.exists(_ > 0L), "corpus must contain boilerplate")
    Caches.releaseAll()
  }
}
