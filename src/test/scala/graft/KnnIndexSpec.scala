package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Persisted IVF index: the build-once/serve-from-disk layout. The
  * probe must be a PARTITION-PRUNED scan (nprobe directories read,
  * everything else zero I/O) and must return exactly what the
  * in-memory a4 path returns for the same quantizer and nprobe. */
class KnnIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-ivf").toString

  test("written index serves a4's exact results through pruned partitions") {
    val path = s"$tmp/ivf"
    val cents = Knn.writeIvfIndex(spark, sfDir, path)
    assert(cents.length === 8)
    // the layout on disk is one directory per cell
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("cid=\\d+")))

    val queries = Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val served = Knn.serveFromIvfIndex(spark, path, cents, queries)

    // partition pruning: the scan carries a PartitionFilters entry on
    // cid, and the in-plan read touches probed cells only
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"probe scan is not partition-pruned:\n${plan.take(1200)}")

    // result parity with the in-memory IVF serve at the same settings
    val fromIndex = served.collect().map(_.toSeq).toSeq
    val inMemory = Knn.a4IvfKmeans(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromIndex === inMemory)

    // the RANGE serve from the same store: partition-pruned probe,
    // bit-equal to the in-memory a27 path at the same geometry
    val rServed = Knn.rangeFromIvfIndex(spark, path, cents, queries,
      minCosine = 0.30, nprobe = 3)
    val rPlan = rServed.queryExecution.executedPlan.toString
    assert(rPlan.contains("PartitionFilters") && rPlan.contains("cid"),
      s"range probe scan is not partition-pruned:\n${rPlan.take(1200)}")
    val rMem = Knn.a27RangeSearch(spark, sfDir, minCosine = 0.30,
      nprobe = 3).collect().map(_.toSeq).toSeq
    assert(rServed.collect().map(_.toSeq).toSeq === rMem)
    Caches.releaseAll()
  }

  test("filtered index pushes the label predicate into PartitionFilters") {
    val path = s"$tmp/fivf"
    val cents = Knn.writeFilteredIvfIndex(spark, sfDir, path)
    // layout: label dirs OUTERMOST, cid dirs nested inside
    val labelDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("label=")).map(_.getName).sorted
    assert(labelDirs.nonEmpty && labelDirs.forall(_.matches("label=\\d+")))
    assert(new java.io.File(s"$path/${labelDirs.head}").listFiles()
      .exists(_.getName.startsWith("cid=")))

    val queries = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        graft.functions.VectorFunctions.asDouble($"embedding").as("qv"),
        $"label".as("q_label"))
    val served = Knn.serveFilteredFromIvfIndex(spark, path, cents, queries)

    // the LABEL predicate (and the cid probe) reach the scan as
    // PartitionFilters — the tenant filter prunes directories, it is
    // not a post-scan filter
    val plan = served.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("label") && l.contains("cid")),
      s"label predicate not in PartitionFilters:\n${plan.take(1500)}")

    // pruned serve == the SAME pipeline over in-memory assignments
    val inMemCells = Knn.assignedCells(spark, sfDir, cents)
    val inMemory = Knn.filteredIvfServe(inMemCells, cents, queries, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    assert(served.collect().map(_.toSeq).toSeq === inMemory)

    // full probe degenerates to EXACT filtered search: bit-equal to
    // the in-memory a16 operator
    val full = Knn.serveFilteredFromIvfIndex(spark, path, cents, queries,
        nprobe = cents.length)
      .collect().map(_.toSeq).toSeq
    val a16 = Knn.a16KnnFiltered(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(full === a16)
    Caches.releaseAll()
  }

  test("appendToIvfIndex: incremental adds serve identically to a full build") {
    val fullPath = s"$tmp/ivf_full"
    val incPath = s"$tmp/ivf_inc"
    val cents = Knn.writeIvfIndex(spark, sfDir, fullPath)
    // grow the incremental index in two appended batches under the
    // SAME frozen quantizer — no rebuild
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    Knn.appendToIvfIndex(incPath, cents, all.filter($"vec_id" % 7 =!= 0))
    Knn.appendToIvfIndex(incPath, cents, all.filter($"vec_id" % 7 === 0))
    val queries = all.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val full = Knn.serveFromIvfIndex(spark, fullPath, cents, queries)
      .collect().map(_.toSeq).toSeq
    val inc = Knn.serveFromIvfIndex(spark, incPath, cents, queries)
      .collect().map(_.toSeq).toSeq
    assert(full === inc, "appended index must serve the full build's results")
    Caches.releaseAll()
  }

  test("IVF delete/upsert/compact: lifecycle symmetric with the text index") {
    import spark.implicits._
    val path = s"$tmp/ivf_life"
    val cents = Knn.writeIvfIndex(spark, sfDir, path)
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val queries = all.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    def served(p: String) = Knn
      .serveFromIvfIndex(spark, p, cents, queries, nprobe = cents.length)
      .collect().map(_.toSeq).toSeq
    val before = served(path)
    // DELETE: tombstoned ids vanish from every serve
    val dead = Seq(11L, 12L, 13L).toDF("vec_id")
    Knn.deleteFromIvfIndex(spark, path, dead)
    val afterDel = served(path)
    assert(!afterDel.exists(r => Set(11L, 12L, 13L)(r(1).asInstanceOf[Long])),
      "deleted ids must not serve")
    // ...and exactly match a store rebuilt without them
    val rebuilt = s"$tmp/ivf_life_rb"
    Knn.appendToIvfIndex(rebuilt, cents,
      all.filter(!$"vec_id".isin(11L, 12L, 13L)))
    assert(afterDel === served(rebuilt),
      "delete must equal a rebuild without the ids")
    // COMPACT: physical drop, serve identical, tombstones cleared
    Knn.compactIvfIndex(spark, path)
    assert(served(path) === afterDel, "compaction must not change a serve")
    assert(spark.read.parquet(path)
      .filter($"vec_id".isin(11L, 12L, 13L)).count() == 0,
      "compaction physically removes tombstoned rows")
    // UPSERT: re-add 11 with a SHIFTED vector (lands in any cell);
    // old copies of 20..22 replaced by new values too
    val newVecs = all.filter($"vec_id".isin(11L, 20L, 21L, 22L))
      .select($"vec_id", transform($"v", x => x + 1.0).as("v"))
    Knn.upsertIvfIndex(spark, path, cents, newVecs)
    val expect = s"$tmp/ivf_life_exp"
    Knn.appendToIvfIndex(expect, cents,
      all.filter(!$"vec_id".isin(11L, 12L, 13L, 20L, 21L, 22L))
        .unionByName(newVecs))
    assert(served(path) === served(expect),
      "upsert must serve as if the store were rebuilt with the new vectors")
    // no duplicate copies survive anywhere
    assert(spark.read.parquet(path).groupBy($"vec_id").count()
      .filter($"count" > 1).count() == 0)
    Caches.releaseAll()
  }

  test("graph delete: FreshDiskANN consolidation bridges the hole; store twin matches") {
    import spark.implicits._
    // smooth 1-D angular chain (cosine monotone in chain distance):
    // node i's true 2-NN graph is {i-1, i+1}
    val vecs = (0 to 9).map(i =>
      (i.toLong, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
      .toDF("vec_id", "v")
    val edges = (0 to 9).flatMap { i =>
      val nb =
        if (i == 0) Seq(1, 2)
        else if (i == 9) Seq(8, 7)
        else Seq(i - 1, i + 1)
      nb.map(j => (i.toLong, j.toLong))
    }.toDF("q_id", "vec_id")
    val after = Knn.deleteFromNnGraph(edges, Seq(5L).toDF("vec_id"),
      vecs, k = 2)
    def neighborMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val m = neighborMap(after)
    assert(!m.contains(5L), "dead node's own rows must vanish")
    assert(m.values.forall(!_.contains(5L)),
      "no surviving edge may point at the dead node")
    // the consolidation BRIDGES across the hole: 4 and 6, which both
    // pointed at 5, now see each other through 5's out-neighbors
    assert(m(4L) == Set(3L, 6L), s"node 4 must bridge to 6: ${m(4L)}")
    assert(m(6L) == Set(4L, 7L), s"node 6 must bridge to 4: ${m(6L)}")
    // every node that never pointed at the dead one is bit-unchanged
    val before = neighborMap(edges)
    (0 to 9).map(_.toLong).filterNot(Set(4L, 5L, 6L)).foreach(i =>
      assert(m(i) == before(i), s"node $i must pass through untouched"))
    // the persisted-store twin produces the same graph
    val p = s"$tmp/graph_del"
    Knn.writeNnGraphStore(edges, p)
    Knn.deleteFromNnGraphStore(spark, p, Seq(5L).toDF("vec_id"), vecs, k = 2)
    assert(neighborMap(Knn.readNnGraphStore(spark, p)) == m,
      "store delete must equal the in-memory consolidation")
    Caches.releaseAll()
  }

  test("filtered index serves STRING tenant labels (the docstring's use case)") {
    // the tenant key is usually a string, not an int — the persisted
    // serve must collect labels untyped, like the in-memory twin
    val cents = Knn.writeFilteredIvfIndex(spark, sfDir, s"$tmp/fivf_tmp")
    val cells = Knn.assignedCells(spark, sfDir, cents)
      .withColumn("label", concat(lit("tenant-"), $"label"))
    val path = s"$tmp/fivf_str"
    cells.write.mode("overwrite").partitionBy("label", "cid").parquet(path)
    val queries = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        graft.functions.VectorFunctions.asDouble($"embedding").as("qv"),
        concat(lit("tenant-"), $"label").as("q_label"))
    val served = Knn.serveFilteredFromIvfIndex(spark, path, cents, queries)
      .collect().map(_.toSeq).toSeq
    assert(served.nonEmpty)
    val inMemory = Knn.filteredIvfServe(cells, cents, queries, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    assert(served === inMemory)
    Caches.releaseAll()
  }

  test("kNN-graph store: bucket upsert of the append delta equals the in-memory graph") {
    import graft.functions.VectorFunctions
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id", VectorFunctions.asDouble($"embedding").as("v"))
    val newIds = all.filter($"vec_id" < 40).select($"vec_id")
    val oldVecs = all.filter($"vec_id" >= 40)
    val k = 3
    val (oldGraph0, _) = Knn.nnDescentBuild(oldVecs,
      Knn.knnJoinOf(oldVecs, tables = 4, bits = 6, k = k, bucketCap = 256)
        .select($"q_id", $"vec_id"), k, maxRounds = 2)
    val oldGraph = oldGraph0.localCheckpoint()
    val path = s"$tmp/nngraph"
    Knn.writeNnGraphStore(oldGraph, path)
    // the on-disk layout is node-hash bucket directories
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("nbucket=")).map(_.getName)
    assert(dirs.nonEmpty)
    // one batch arrives: upsert ONLY the delta
    val delta = Knn.appendToNnGraphDelta(oldGraph, all, newIds, k)
      .localCheckpoint()
    Knn.upsertNnGraphStore(spark, path, delta)
    val stored = Knn.readNnGraphStore(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Knn.appendToNnGraph(oldGraph, all, newIds, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == expected,
      "the upserted store must equal the in-memory appended graph")
    // and the stored graph serves the walk identically
    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val entries = all.select($"vec_id").filter($"vec_id" < 16)
    def serve(g: org.apache.spark.sql.DataFrame) =
      Knn.graphSearchOf(all.select($"vec_id", $"v"), g, queries, entries,
        k = 5, beam = 8, hops = 2).collect().map(_.toSeq).toSeq
    assert(serve(Knn.readNnGraphStore(spark, path)) ==
      serve(Knn.appendToNnGraph(oldGraph, all, newIds, k)))
    Caches.releaseAll()
  }

  test("IVF compact/upsert clean a cell whose EVERY row was removed") {
    // dynamic partition overwrite only replaces partitions present in
    // the written data — a fully-emptied cell writes nothing and its
    // old files would survive, resurrecting deletes once compaction
    // clears the tombstone list (or serving a stale duplicate after
    // an upsert that moved every vector out of the cell).
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    def freshStore(p: String): Unit =
      Knn.appendToIvfIndex(p, cents, Seq(
        (1L, Seq(0.9, 0.1)), (2L, Seq(0.95, 0.05)), // cell 0
        (3L, Seq(0.1, 0.9)), (4L, Seq(0.05, 0.95))  // cell 1
      ).toDF("vec_id", "v"))

    // COMPACT: delete ALL of cell 0, then compact — the ids must be
    // physically gone (not resurrected by the tombstone reset)
    val pc = s"$tmp/ivf_emptycell_c"
    freshStore(pc)
    Knn.deleteFromIvfIndex(spark, pc, Seq(1L, 2L).toDF("vec_id"))
    Knn.compactIvfIndex(spark, pc)
    assert(spark.read.parquet(pc).filter($"vec_id".isin(1L, 2L)).count() == 0,
      "compacting a fully-tombstoned cell must drop its files")
    assert(!new java.io.File(s"$pc/cid=0").exists(),
      "the emptied cell's directory must be deleted")
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "qv")
    val servedC = Knn.serveFromIvfIndex(spark, pc, cents, q, nprobe = 2)
      .collect().map(_.getLong(1)).toSet
    assert(servedC == Set(3L, 4L), s"served $servedC after empty-cell compact")

    // UPSERT: move EVERY vector of cell 0 into cell 1 — no stale
    // duplicate may survive in the old cell
    val pu = s"$tmp/ivf_emptycell_u"
    freshStore(pu)
    Knn.upsertIvfIndex(spark, pu, cents, Seq(
      (1L, Seq(0.1, 0.9)), (2L, Seq(0.05, 0.95))).toDF("vec_id", "v"))
    val rows = spark.read.parquet(pu)
    assert(rows.groupBy($"vec_id").count().filter($"count" > 1).count() == 0,
      "no duplicate copies after a whole-cell upsert")
    assert(rows.filter($"cid" === 0).count() == 0 &&
      !new java.io.File(s"$pu/cid=0").exists(),
      "the vacated cell must be physically cleaned")
    Caches.releaseAll()
  }

  test("ANN auto-compaction: count-gated triggers, serve bit-equal, files consolidate") {
    import graft.sources.Compaction
    // an OPTIMIZE/COMPACT commits a NEW GENERATION — file-layout
    // assertions read the current generation's data dir, like the
    // store's own maintenance signals do
    def maxFilesPer(p: String): Long =
      Compaction.listFiles(spark, Knn.storeDataDir(spark, p))
        .filter($"partition" =!= "")
        .groupBy($"partition").count()
        .agg(max($"count")).head().getLong(0)

    // ---- IVF: three appends fragment each cell to ~3 files
    val p = s"$tmp/ivf_auto"
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    (0 until 3).foreach { b =>
      Knn.appendToIvfIndex(p, cents, Seq(
        (b * 4 + 1L, Seq(0.9, 0.1)), (b * 4 + 2L, Seq(0.95, 0.05)),
        (b * 4 + 3L, Seq(0.1, 0.9)), (b * 4 + 4L, Seq(0.05, 0.95))
      ).toDF("vec_id", "v"))
    }
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "qv")
    def served = Knn.serveFromIvfIndex(spark, p, cents, q, nprobe = 2, k = 12)
      .collect().map(_.toSeq).toSeq
    assert(maxFilesPer(p) >= 3, "appends must have fragmented the cells")
    assert(!Knn.maybeCompactIvf(spark, p, maxTombstones = 10L,
      maxFilesPerCell = 10.0), "under both bounds: must not compact")
    val before = served
    assert(Knn.maybeCompactIvf(spark, p, maxTombstones = 10L,
      maxFilesPerCell = 2.0), "file bound exceeded: must compact")
    assert(served == before, "OPTIMIZE must not change a serve")
    assert(maxFilesPer(p) == 1, "one file per cell after the rewrite")
    // tombstone signal: a delete past the bound fires and drops rows
    Knn.deleteFromIvfIndex(spark, p, Seq(1L).toDF("vec_id"))
    val afterDel = served
    assert(Knn.maybeCompactIvf(spark, p, maxTombstones = 0L,
      maxFilesPerCell = 10.0), "tombstone bound exceeded: must compact")
    assert(served == afterDel)
    assert(spark.read.parquet(Knn.storeDataDir(spark, p))
      .filter($"vec_id" === 1L).count() == 0,
      "the optimize pass physically drops tombstoned rows")
    assert(!Knn.maybeCompactIvf(spark, p, maxTombstones = 0L,
      maxFilesPerCell = 2.0), "a fresh rewrite cleared both signals")

    // ---- graph store: the small-file curve is the only signal
    val gp = s"$tmp/graph_auto"
    val edges = (0 until 64)
      .map(i => (i.toLong, ((i + 1) % 64).toLong))
      .toDF("q_id", "vec_id").repartition(4)
    Knn.writeNnGraphStore(edges, gp)
    val edgeSet = Knn.readNnGraphStore(spark, gp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!Knn.maybeCompactNnGraph(spark, gp, maxFilesPerBucket = 100.0))
    assert(Knn.maybeCompactNnGraph(spark, gp, maxFilesPerBucket = 0.5))
    assert(Knn.readNnGraphStore(spark, gp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == edgeSet,
      "graph compaction must not change the edge set")
    assert(maxFilesPer(gp) == 1, "one file per bucket after the rewrite")
    Caches.releaseAll()
  }

  test("ANN store OPTIMIZE is a staged generation commit: torn staging invisible, swap bit-equal, old gens swept") {
    // ---- IVF tier
    val p = s"$tmp/ivf_genz"
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    Knn.appendToIvfIndex(p, cents, Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.95, 0.05)),
      (3L, Seq(0.1, 0.9)), (4L, Seq(0.05, 0.95))).toDF("vec_id", "v"))
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "qv")
    def served = Knn.serveFromIvfIndex(spark, p, cents, q, nprobe = 2, k = 4)
      .collect().map(_.toSeq).toSeq
    val s0 = served
    // a crashed OPTIMIZE: the staging dir exists — even with
    // garbage content — but the marker never flipped; readers must
    // stay on generation 0, bit-exactly
    Seq((999L, Seq(1.0, 1.0), 0)).toDF("vec_id", "v", "cid")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$p/_gen_1")
    assert(Knn.storeGen(spark, p) == 0L)
    assert(served == s0, "staged-but-uncommitted must be invisible")
    // the torn staging is invisible to the MAINTENANCE SIGNAL too:
    // the recursive file walk must not count _gen_1's files into the
    // files-per-cell average (a crash mid-OPTIMIZE would otherwise
    // trigger a spurious full rewrite on the next auto-compaction)
    assert(graft.sources.Compaction
      .listFiles(spark, Knn.storeDataDir(spark, p))
      .filter($"path".contains("_gen_")).count() == 0,
      "torn staging files must not feed the compaction signal")
    // the retried OPTIMIZE overwrites the torn staging and commits
    Knn.deleteFromIvfIndex(spark, p, Seq(2L).toDF("vec_id"))
    val s1 = served
    Knn.optimizeIvfIndex(spark, p)
    assert(Knn.storeGen(spark, p) == 1L)
    assert(served == s1, "serve must be bit-equal across the swap")
    assert(!new java.io.File(s"$p/cid=0").exists() &&
      !new java.io.File(s"$p/cid=1").exists(),
      "the old generation's root cells are swept after the flip")
    assert(spark.read.parquet(Knn.storeDataDir(spark, p))
      .filter($"vec_id".isin(2L, 999L)).count() == 0,
      "the committed generation drops tombstones and torn garbage")
    // a second OPTIMIZE advances the generation and sweeps _gen_1
    Knn.optimizeIvfIndex(spark, p)
    assert(Knn.storeGen(spark, p) == 2L)
    assert(!new java.io.File(s"$p/_gen_1").exists(), "older gens swept")
    assert(served == s1)
    // incremental mutation lands in the CURRENT generation
    Knn.appendToIvfIndex(p, cents, Seq((5L, Seq(0.9, 0.2)))
      .toDF("vec_id", "v"))
    assert(served.map(_(1)).toSet == Set(1L, 3L, 4L, 5L))

    // ---- graph tier
    val gp = s"$tmp/graph_genz"
    val edges = (0 until 16).map(i => (i.toLong, ((i + 1) % 16).toLong))
      .toDF("q_id", "vec_id").repartition(4)
    Knn.writeNnGraphStore(edges, gp)
    def edgeSet = Knn.readNnGraphStore(spark, gp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e0 = edgeSet
    Seq((777L, 778L, 0L)).toDF("q_id", "vec_id", "nbucket")
      .write.mode("overwrite").partitionBy("nbucket").parquet(s"$gp/_gen_1")
    assert(Knn.storeGen(spark, gp) == 0L && edgeSet == e0,
      "torn graph staging must be invisible")
    Knn.compactNnGraphStore(spark, gp)
    assert(Knn.storeGen(spark, gp) == 1L)
    assert(edgeSet == e0, "graph edge set bit-equal across the swap")
    assert(!new java.io.File(s"$gp/nbucket=0").exists(),
      "old root buckets swept after the flip")
    Knn.compactNnGraphStore(spark, gp)
    assert(Knn.storeGen(spark, gp) == 2L &&
      !new java.io.File(s"$gp/_gen_1").exists() && edgeSet == e0)
    Caches.releaseAll()
  }

  test("probe tie-break matches assign's first-max on duplicated centroids") {
    // a degenerate quantizer (an emptied Lloyd cluster duplicates a
    // centroid) ties every query's centroid scores; assign() lands
    // all rows in the LOWER-index cell, so the probe must rank that
    // cell first — the higher-index twin is empty and an index-DESC
    // tie-break would serve nothing at nprobe=1
    val p = s"$tmp/ivf_ties"
    val cents = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0))
    val vecs = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)),
      (3L, Seq(0.7, 0.3))).toDF("vec_id", "v")
    Knn.appendToIvfIndex(p, cents, vecs)
    val dirs = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSeq
    assert(dirs == Seq("cid=0"), s"assign must land every row in cell 0: $dirs")
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "qv")
    val pruned = Knn.serveFromIvfIndex(spark, p, cents, q, nprobe = 1, k = 3)
      .collect().map(_.toSeq).toSeq
    val exhaustive = Knn.serveFromIvfIndex(spark, p, cents, q,
      nprobe = 2, k = 3).collect().map(_.toSeq).toSeq
    assert(pruned.length == 3 && pruned == exhaustive,
      "nprobe=1 must probe the populated tied cell")
  }

  test("probe ranks a NaN-scoring centroid first, where assign landed the rows") {
    // a centroid carrying a NaN COMPONENT (a corrupt retrain
    // artifact — the zero-denominator case is guarded to 0.0 in the
    // kernels, NaN components are not) scores NaN against every
    // query; NearestCentroid orders NaN greatest, so assign() lands
    // ALL rows in that cell — the probe must rank it first (−NaN
    // would sort LAST in the ascending (−score, index) key; the
    // probeKey −∞ mapping keeps them aligned)
    val p = s"$tmp/ivf_nan"
    val cents = Seq(Seq(Double.NaN, 0.0), Seq(1.0, 0.0))
    val vecs = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)))
      .toDF("vec_id", "v")
    Knn.appendToIvfIndex(p, cents, vecs)
    val dirs = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSeq
    assert(dirs == Seq("cid=0"),
      s"assign must land every row in the NaN cell: $dirs")
    val got = Knn.serveFromIvfIndex(spark, p, cents,
        Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "qv"), nprobe = 1, k = 2)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L),
      s"nprobe=1 must probe the NaN cell rows landed in, got $got")
  }

  test("IVF replay converges: re-applying an epoch's mutations is serve-identical") {
    // the streaming replay contract in one spec: a crashed epoch
    // re-runs its remove-then-add — applying the SAME upsert (and
    // the same delete) twice must leave the store serve-identical
    // with single physical copies, or the at-least-once guard is a
    // lie
    val p = s"$tmp/ivf_replay"
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    Knn.appendToIvfIndex(p, cents, Seq(
      (1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)), (3L, Seq(0.95, 0.05))
    ).toDF("vec_id", "v"))
    // the epoch: vector 1 re-embeds ACROSS cells, vector 2 deletes
    val ups = Seq((1L, Seq(0.05, 0.9))).toDF("vec_id", "v")
    def applyEpoch(): Unit = {
      Knn.upsertIvfIndex(spark, p, cents, ups)
      Knn.deleteFromIvfIndex(spark, p, Seq(2L).toDF("vec_id"))
    }
    applyEpoch()
    val q = Seq((100L, Seq(0.0, 1.0)), (101L, Seq(1.0, 0.0)))
      .toDF("q_id", "qv")
    def served = Knn.serveFromIvfIndex(spark, p, cents, q, nprobe = 2,
      k = 5).collect().map(_.toSeq).toSeq
    val once = served
    applyEpoch() // the replay
    assert(served == once, "replayed epoch must be serve-identical")
    assert(spark.read.parquet(p).filter($"vec_id" === 1L).count() == 1,
      "remove-then-add must leave exactly one physical copy")
    assert(spark.read.parquet(s"$p/_tombstones").count() == 1,
      "the delete's tombstone is idempotent under replay")
  }
}
