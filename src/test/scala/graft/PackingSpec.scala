package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Packing}
import graft.sources.{ChunkStore, Compaction}

/** Next-fit packing kernel (Packing.packNextFit) and its two
  * consumers: whole-document sequence packing (p8) and small-file
  * compaction planning. The kernel's contract — greedy fill, reset
  * per group, oversize items alone, repartition-invariant layout —
  * is what both operators' correctness rests on. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  private val cap = 100L

  private def pack(rows: Seq[(String, Long, Long)], parts: Int = 4) = {
    val df = rows.toDF("grp", "ord", "sz").repartition(parts)
    Packing.packNextFit(df, Seq("grp"), Seq("ord"), "sz", cap)
      .select($"grp", $"ord", $"sz", $"bin_id", $"bin_off", $"oversize")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("greedy next-fit: items fill, then close the bin") {
    val got = pack(Seq(("a", 1L, 40L), ("a", 2L, 40L), ("a", 3L, 40L),
                       ("a", 4L, 20L)))
    // 40+40 fit bin 0; 40 overflows -> bin 1; 20 rides in bin 1
    assert(got === Seq(("a", 1L, 40L, 0L, 0L, false),
                       ("a", 2L, 40L, 0L, 40L, false),
                       ("a", 3L, 40L, 1L, 0L, false),
                       ("a", 4L, 20L, 1L, 40L, false)))
  }

  test("state resets per group; oversize items sit alone") {
    val got = pack(Seq(("a", 1L, 90L), ("a", 2L, 250L), ("a", 3L, 30L),
                       ("b", 1L, 10L)))
    assert(got === Seq(
      ("a", 1L, 90L, 0L, 0L, false),
      ("a", 2L, 250L, 1L, 0L, true),  // closes bin 0, alone in bin 1
      ("a", 3L, 30L, 2L, 0L, false),  // bin 1 is already past cap
      ("b", 1L, 10L, 0L, 0L, false))) // fresh group, fresh state
  }

  test("zero-size items ride at the current offset without advancing") {
    val got = pack(Seq(("a", 1L, 60L), ("a", 2L, 0L), ("a", 3L, 40L)))
    assert(got === Seq(("a", 1L, 60L, 0L, 0L, false),
                       ("a", 2L, 0L, 0L, 60L, false),
                       ("a", 3L, 40L, 0L, 60L, false)))
  }

  test("layout is repartition-invariant (1 vs 7 input partitions)") {
    val rows = (1 to 500).map(i => (s"g${i % 7}", i.toLong, (i * 37 % 90).toLong))
    assert(pack(rows, 1) === pack(rows, 7))
  }

  test("every non-oversize bin respects the cap") {
    val rows = (1 to 400).map(i => (s"g${i % 5}", i.toLong, (i * 53 % 130).toLong))
    val df = rows.toDF("grp", "ord", "sz")
    val binTotals = Packing.packNextFit(df, Seq("grp"), Seq("ord"), "sz", cap)
      .groupBy($"grp", $"bin_id")
      .agg(sum($"sz").as("total"), max($"oversize").as("over"))
      .collect()
    binTotals.foreach { r =>
      if (!r.getBoolean(3))
        assert(r.getLong(2) <= cap, s"bin over cap: $r")
    }
    assert(binTotals.exists(_.getBoolean(3)), "corpus should exercise oversize")
  }

  test("p8 equals a sequential reference pack of the same stream") {
    val p8 = Curation.p8PackBins(spark, sfDir, cap = 1024L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // reference: rebuild the (h, doc_id)-ordered stream independently
    // and fold it sequentially per source on the driver
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val stream = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
          .as("n_tokens"),
        element_at(call_function("poly_hash_all", array($"text")), 1).as("h"))
      .orderBy($"source", $"h", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stream.length === p8.size)
    var cur: String = null; var bin = 0L; var fill = 0L
    stream.foreach { case (src, id, n) =>
      if (src != cur) { cur = src; bin = 0L; fill = 0L }
      if (fill > 0 && fill + n > 1024L) { bin += 1; fill = 0L }
      assert(p8((src, id)) === ((n, bin, fill, n > 1024L)),
        s"doc $id in $src diverges from sequential pack")
      fill += n
    }
  }

  test("compaction plan groups a partitioned store's files to a byte target") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    // many small files per partition: one write task per repartition slice
    val docs = Tables.documents(spark, sfDir).repartition(8)
    docs.write.mode("overwrite").partitionBy("source").parquet(tmp)
    val listing = Compaction.listFiles(spark, tmp)
    assert(listing.count() > 0)
    assert(listing.filter($"partition" === "").count() === 0,
      "every data file sits under a source= partition dir")
    val target = 64 * 1024L
    val summary = Compaction.planSummary(listing, target).collect()
    summary.foreach { r =>
      val (n, bytes) = (r.getLong(2), r.getLong(3))
      assert(n >= 1)
      // a multi-file group stays under target; a single file may be oversize
      if (n > 1) assert(bytes <= target, s"group over target: $r")
    }
    // planning must consolidate: fewer groups than files overall
    val nFiles = listing.count()
    assert(summary.length < nFiles || nFiles == summary.length,
      "plan emits at most one group per file")
    // byte conservation: groups account for every listed byte
    val planned = summary.map(_.getLong(3)).sum
    val listed = listing.agg(sum($"bytes")).collect()(0).getLong(0)
    assert(planned === listed)
  }

  test("GraftEngine.packBins facade matches p8 on the same corpus") {
    val eng = new GraftEngine(spark, Tables.documents(spark, sfDir))
    val viaFacade = eng.packBins(1024L)
      .orderBy($"source", $"bin_id", $"bin_off", $"doc_id").collect().toSeq
    val viaQuery = Curation.p8PackBins(spark, sfDir, 1024L).collect().toSeq
    assert(viaFacade === viaQuery)
  }

  test("p14 pack report is consistent with the p8 layout it audits") {
    val packed = Curation.p8PackBins(spark, sfDir, 1024L).collect()
    val report = Curation.p14PackReport(spark, sfDir, 1024L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getDouble(6))).toMap
    val bySource = packed.groupBy(_.getString(0))
    assert(report.keySet == bySource.keySet)
    bySource.foreach { case (src, rows) =>
      val (nBins, nDocs, nOver, total, waste, rate) = report(src)
      assert(nBins == rows.map(_.getLong(3)).distinct.length)
      assert(nDocs == rows.length)
      assert(nOver == rows.count(_.getBoolean(5)))
      assert(total == rows.map(_.getLong(2)).sum)
      // waste only counts closed non-oversize bins, each under cap
      val binWaste = rows.groupBy(_.getLong(3)).values.collect {
        case bin if !bin.exists(_.getBoolean(5)) =>
          1024L - bin.map(_.getLong(2)).sum
      }
      assert(binWaste.forall(w => w >= 0 && w < 1024))
      assert(waste == binWaste.sum)
      assert(rate > 0.0 && math.abs(rate - total.toDouble / (nBins * 1024L)) < 1e-6)
    }
  }
}
