package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ChunkStore

/** Physical-layout guarantees of the chunk store: partition pruning,
  * metadata deletes, and exchange-free co-bucketed joins — the layout
  * decisions the 100 TB design rests on. */
class ChunkStoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-store").toString

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned store: per-source reads prune to one partition") {
    val path = s"$tmp/part"
    ChunkStore.writePartitioned(Tables.documents(spark, sfDir), path)
    val one = ChunkStore.read(spark, path).filter($"source" === "src3")
    val p = plan(one)
    assert(p.contains("PartitionFilters") && p.contains("src3"),
      s"source filter must prune partitions:\n$p")
    assert(one.count() ===
      Tables.documents(spark, sfDir).filter($"source" === "src3").count())
  }

  test("delete-by-source is a partition drop; survivors unaffected") {
    val path = s"$tmp/del"
    val docs = Tables.documents(spark, sfDir)
    ChunkStore.writePartitioned(docs, path)
    val survivors = ChunkStore.deleteSourcePartition(spark, path, "source", "src1")
    assert(survivors.filter($"source" === "src1").count() === 0)
    assert(survivors.count() === docs.filter($"source" =!= "src1").count())
  }

  test("dropping the LAST partition returns an empty frame that keeps the schema") {
    val path = s"$tmp/del_last"
    val docs = Tables.documents(spark, sfDir).filter($"source" === "src1")
    ChunkStore.writePartitioned(docs, path)
    val survivors = ChunkStore.deleteSourcePartition(spark, path, "source", "src1")
    // the documented 'surviving view' must stay addressable by column
    // even when the store just went empty — callers select/filter it
    assert(survivors.count() === 0)
    assert(survivors.columns.contains("doc_id"))
    assert(survivors.filter($"source" === "src1").count() === 0)
  }

  test("keyset pages tile the full per-source listing, no global sort") {
    val path = s"$tmp/pages"
    // per-source unique (chunkIndex, doc_id): several docs share an
    // index so the id tie-break must carry pages across index ties
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        ($"doc_id" % 7).cast("int").as("chunkIndex"), $"n_chars")
    ChunkStore.writePartitioned(docs, path)
    val src = "src3"
    val full = docs.filter($"source" === src)
      .orderBy($"chunkIndex", $"doc_id")
      .collect().map(r => (r.getInt(2), r.getLong(0))).toSeq
    assert(full.size >= 20, "fixture must span several pages")
    var cursor: Option[(Int, Long)] = None
    var pages = Vector.empty[Seq[(Int, Long)]]
    var done = false
    while (!done) {
      val page = ChunkStore.pageChunks(spark, path, src, cursor, limit = 7)
        .collect().map(r =>
          (r.getAs[Int]("chunkIndex"), r.getAs[Long]("doc_id"))).toSeq
      if (page.isEmpty) done = true
      else {
        pages :+= page
        cursor = Some(page.last)
      }
    }
    assert(pages.flatten == full, "pages must tile the ordered listing")
    assert(pages.init.forall(_.size == 7))
    // plan shape: partition-pruned scan + top-n, no global Sort
    val p = ChunkStore.pageChunks(spark, path, src, Some((3, 100L)), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains(src),
      s"source must prune partitions:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"page must plan as top-n, not sort+limit:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"no global sort exchange allowed:\n$p")
    assert(p.contains("PushedFilters") && p.contains("chunkIndex"),
      s"cursor predicate must push to the scan:\n$p")
  }

  test("writeZordered fails fast on empty input and null cluster keys") {
    val path = s"$tmp/zfail"
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      ChunkStore.writeZordered(empty, path, "a", "b")
    }
    assert(e1.getMessage.contains("empty input or all-null"))
    val withNulls = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      ChunkStore.writeZordered(withNulls, path, "a", "b")
    }
    assert(e2.getMessage.contains("null"))
  }

  test("compact collapses append-fragmented partitions to one file each") {
    val path = s"$tmp/compact"
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"source", $"n_chars")
    // two appends -> several files per partition dir
    docs.write.mode("append").partitionBy("source").parquet(path)
    docs.withColumn("doc_id", $"doc_id" + 10000L)
      .write.mode("append").partitionBy("source").parquet(path)
    def filesIn(dir: String): Int =
      new java.io.File(dir).listFiles((_, n) => n.endsWith(".parquet")).length
    val aDir = new java.io.File(path).listFiles((f, n) => n.startsWith("source="))
      .head.getAbsolutePath
    assert(filesIn(aDir) > 1, "appends must fragment before compaction")
    val before = spark.read.parquet(path).count()

    ChunkStore.compact(spark, path)
    new java.io.File(path).listFiles((_, n) => n.startsWith("source=")).foreach { d =>
      assert(filesIn(d.getAbsolutePath) == 1, s"expected 1 file in $d")
    }
    assert(spark.read.parquet(path).count() === before, "compaction must not lose rows")
  }

  test("co-bucketed join on doc_id plans with no exchange") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"source", $"n_chars")
    val emb = Tables.documents(spark, sfDir)
      .select($"doc_id", length($"text").as("len"))
    ChunkStore.writeBucketed(docs, "graft_chunks_b", s"$tmp/chunks_b", buckets = 4)
    ChunkStore.writeBucketed(emb, "graft_embs_b", s"$tmp/embs_b", buckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_chunks_b")
        .join(spark.table("graft_embs_b"), "doc_id")
      val p = plan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$p")
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$p")
      assert(joined.count() === docs.count())

      // bucket pruning: equality on the bucket key reads one bucket
      // (autoBucketedScan turns bucketed reads off for join-free scans
      // by default — disable it to observe the pruning)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      try {
        val pruned = plan(spark.table("graft_chunks_b").filter($"doc_id" === 42L))
        assert(pruned.contains("SelectedBucketsCount: 1 out of 4"),
          s"expected bucket pruning:\n$pruned")
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ensureSchema creates the canonical DocumentChunk store when absent") {
    val path = s"$tmp/schema-new"
    val missing = ChunkStore.ensureSchema(spark, path)
    assert(missing.isEmpty)
    val df = ChunkStore.read(spark, path)
    assert(df.schema === ChunkStore.DocumentChunkSchema)
    assert(df.count() === 0)
    // idempotent like the reference EnsureSchema
    assert(ChunkStore.ensureSchema(spark, path).isEmpty)
  }

  test("ensureSchema surfaces canonical columns old files predate; readCanonical aligns") {
    import spark.implicits._
    val path = s"$tmp/schema-old"
    // a store written before author/pageCount/embedding existed
    Seq(("hello world", "src-1", 0, "t"))
      .toDF("content", "sourceId", "chunkIndex", "title")
      .write.mode("overwrite").parquet(path)
    val missing = ChunkStore.ensureSchema(spark, path)
    assert(missing.contains("author") && missing.contains("pageCount")
      && missing.contains("embedding"))
    assert(!missing.contains("content"))
    val aligned = ChunkStore.readCanonical(spark, path)
    assert(aligned.columns.take(ChunkStore.DocumentChunkSchema.length).toSeq ===
      ChunkStore.DocumentChunkSchema.fieldNames.toSeq)
    val row = aligned.collect().head
    assert(row.getAs[String]("content") === "hello world")
    assert(row.isNullAt(row.fieldIndex("author")))
    assert(row.isNullAt(row.fieldIndex("pageCount")))
  }

  test("readCanonical keeps extra stored columns after the canonical set") {
    import spark.implicits._
    val path = s"$tmp/schema-extra"
    Seq(("c", "s", "custom-value"))
      .toDF("content", "sourceId", "my_extra")
      .write.mode("overwrite").parquet(path)
    val aligned = ChunkStore.readCanonical(spark, path)
    assert(aligned.columns.last === "my_extra")
    assert(aligned.select("my_extra").collect().head.getString(0) === "custom-value")
  }

  test("settings store: save/load round trip; absent table = defaults") {
    import graft.sources.SettingsStore
    val path = s"$tmp/settings"
    // absent -> compiled defaults (the service.go fallback)
    assert(SettingsStore.load(spark, path) === GraftEngine.Settings())
    SettingsStore.save(spark, path,
      GraftEngine.Settings(searchAlpha = 0.7, searchTopK = 25,
        rerankProvider = "cohere", embedProvider = "gemini"))
    val loaded = SettingsStore.load(spark, path)
    assert(loaded === GraftEngine.Settings(0.7, 25, "cohere", "gemini"))
    assert(SettingsStore.rerankProvider(spark, path) === "cohere")
    // an engine constructed from loaded settings serves those defaults
    val eng = new GraftEngine(spark, Tables.documents(spark, sfDir), loaded)
    assert(eng.runSearch("data").length <= 25)
  }

  test("settings store: a pre-widening row reads with migration defaults for new columns") {
    import graft.sources.SettingsStore
    val path = s"$tmp/settings_old"
    // a store written before embed_provider existed (migration 000004
    // not yet applied): ADD COLUMN ... DEFAULT semantics on read
    Seq((0.9, 15, "voyage")).toDF(
        "search_alpha", "search_top_k", "rerank_provider")
      .coalesce(1).write.parquet(path)
    assert(SettingsStore.load(spark, path) ===
      GraftEngine.Settings(0.9, 15, "voyage", "hash"))
  }

  test("source-config store: round trip with typed defaults for unknown sources") {
    import graft.sources.{SettingsStore, SourceConfigRow}
    val path = s"$tmp/source_cfg"
    // absent table: empty typed frame, defaults per source
    assert(SettingsStore.sourceConfigs(spark, path).count() === 0)
    assert(SettingsStore.sourceConfig(spark, path, "srcX") ===
      SourceConfigRow("srcX", "", "web", 0, Nil))
    SettingsStore.saveSourceConfigs(spark, path, Seq(
      SourceConfigRow("src1", "Docs site", "web", 3,
        Seq("/private/*", "*.pdf")),
      SourceConfigRow("src2", source_type = "file")))
    val c1 = SettingsStore.sourceConfig(spark, path, "src1")
    assert(c1.max_depth === 3 &&
      c1.exclusions === Seq("/private/*", "*.pdf"))
    assert(SettingsStore.sourceConfig(spark, path, "src2").source_type
      === "file")
    // unknown source still resolves the migrations' DEFAULT row
    assert(SettingsStore.sourceConfig(spark, path, "srcZ") ===
      SourceConfigRow("srcZ"))
  }

  test("z-ordered write keeps per-file ranges tight on BOTH dimensions") {
    val zPath = Files.createTempDirectory("graft-z").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    ChunkStore.writeZordered(li, zPath, "l_partkey", "l_suppkey",
      targetFiles = 8)
    def spread(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val perFile = df
        .withColumn("f", input_file_name())
        .groupBy($"f")
        .agg((max(col(c)) - min(col(c))).cast("double").as("w"))
        .agg(avg($"w")).head.getDouble(0)
      val global = df.agg((max(col(c)) - min(col(c))).cast("double"))
        .head.getDouble(0)
      perFile / global
    }
    val z = spark.read.parquet(zPath)
    assert(z.count() == li.count())
    // both dimensions cluster: average per-file width well under the
    // global width (a single-column sort would leave the OTHER
    // column's per-file width ~ the full range)
    val sa = spread(z, "l_partkey")
    val sb = spread(z, "l_suppkey")
    assert(sa < 0.6, s"l_partkey per-file spread $sa")
    assert(sb < 0.6, s"l_suppkey per-file spread $sb")
    // baseline: the same data written unclustered has ~full-range
    // files on both dimensions
    val basePath = Files.createTempDirectory("graft-z0").toString + "/li"
    li.repartition(8).write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    assert(spread(base, "l_partkey") > 0.9)
    assert(spread(base, "l_suppkey") > 0.9)
  }

  test("versioned commits: snapshot isolation, time travel, safe vacuum") {
    val path = Files.createTempDirectory("graft-ver").toString + "/store"
    val v1data = Seq((1L, "a"), (2L, "b")).toDF("id", "x")
    val v2data = Seq((1L, "a2"), (3L, "c")).toDF("id", "x")
    assert(ChunkStore.currentVersion(spark, path).isEmpty)
    assert(ChunkStore.commitVersion(v1data, path) == 1L)
    // pin a reader at v1, then commit v2 UNDER it
    val pinned = ChunkStore.readLatest(spark, path)
    assert(ChunkStore.commitVersion(v2data, path) == 2L)
    // the pinned snapshot is untouched by the later commit
    assert(pinned.orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "b"))
    // a fresh reader sees v2; time travel still serves v1 exactly
    assert(ChunkStore.readLatest(spark, path).orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(1L -> "a2", 3L -> "c"))
    assert(ChunkStore.readVersion(spark, path, 1L).count() == 2)
    // vacuum keeps the window, never the current version
    assert(ChunkStore.commitVersion(v1data, path) == 3L)
    assert(ChunkStore.vacuumVersions(spark, path, keep = 2) == Seq(1L))
    assert(ChunkStore.readVersion(spark, path, 2L).count() == 2)
    assert(ChunkStore.currentVersion(spark, path).contains(3L))
    // version directories are immutable: re-committing the same id fails
    intercept[Exception] {
      v1data.write.mode("errorifexists").parquet(s"$path/v=3")
    }
  }

  test("currentVersion: pointer-less store without v=* dirs answers without retrying") {
    // a crashed first commit can leave the store dir with no pointer
    // and no version dir — that state never changes, so reads must
    // not pay the delete→rename retry window for it
    val path = s"$tmp/crashed"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_tmp_attempt"))
    val t0 = System.nanoTime()
    assert(ChunkStore.currentVersion(spark, path).isEmpty)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 50, s"pointer-less no-version probe took ${ms}ms — retried?")
    // with a v=* sibling (evidence of a commit) the retry window IS
    // taken, and still resolves to None when no pointer ever appears
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/v=1"))
    assert(ChunkStore.currentVersion(spark, path).isEmpty)
  }

  test("manifest skipping: pruned read is exact, opens a fraction of files, rejects stale") {
    val zPath = Files.createTempDirectory("graft-mf").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    ChunkStore.writeZordered(li, zPath, "l_partkey", "l_suppkey",
      targetFiles = 8)
    val mf = ChunkStore.writeManifest(spark, zPath,
      Seq("l_partkey", "l_suppkey"))
    assert(mf.count() == 8)
    // per-file row counts in the manifest tile the store exactly
    assert(mf.agg(sum($"rows")).head.getLong(0) == li.count())
    val (loQ, hiQ) = (1L, 20L)
    val (kept, total) = ChunkStore.pruneFiles(spark, zPath, "l_partkey", loQ, hiQ)
    assert(total == 8)
    // the z-layout must make a narrow range skip most files
    assert(kept.size < total, s"no pruning: ${kept.size}/$total")
    // pruning must be EXACT: pruned read == full-scan filter
    val pruned = ChunkStore.prunedRead(spark, zPath, "l_partkey", loQ, hiQ)
      .collect().map(_.toSeq).sortBy(_.toString)
    val full = spark.read.parquet(zPath)
      .filter($"l_partkey" >= loQ && $"l_partkey" <= hiQ)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)
    // an out-of-range predicate opens zero files but keeps the schema
    val empty = ChunkStore.prunedRead(spark, zPath, "l_partkey", -100L, -50L)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // a write the manifest didn't see must fail fast, not lose rows
    li.limit(5).coalesce(1).write.mode("append").parquet(zPath)
    val err = intercept[IllegalArgumentException] {
      ChunkStore.pruneFiles(spark, zPath, "l_partkey", loQ, hiQ)
    }
    assert(err.getMessage.contains("stale manifest"))
  }

  test("manifest pruning covers PARTITIONED (nested-dir) layouts") {
    val pPath = Files.createTempDirectory("graft-mfp").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_returnflag")
    // key=value partition dirs: data files live one level down — the
    // staleness check must walk them, not just the root
    li.write.partitionBy("l_returnflag").parquet(pPath)
    ChunkStore.writeManifest(spark, pPath, Seq("l_partkey"))
    val (kept, total) = ChunkStore.pruneFiles(spark, pPath, "l_partkey", 1L, 20L)
    assert(total > 0 && kept.nonEmpty) // no spurious stale-manifest throw
    val pruned = ChunkStore.prunedRead(spark, pPath, "l_partkey", 1L, 20L)
      .select($"l_orderkey", $"l_partkey")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = li.filter($"l_partkey".between(1L, 20L))
      .select($"l_orderkey", $"l_partkey")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(pruned.nonEmpty && pruned == full)
    // a file appended into a NESTED partition dir is still caught
    li.filter($"l_returnflag" === "N").limit(3).coalesce(1)
      .drop("l_returnflag")
      .write.mode("append").parquet(s"$pPath/l_returnflag=N")
    val err = intercept[IllegalArgumentException] {
      ChunkStore.pruneFiles(spark, pPath, "l_partkey", 1L, 20L)
    }
    assert(err.getMessage.contains("stale manifest"))
  }

  test("compactCommitted: rewrite + manifest + version bump in ONE commit") {
    val path = Files.createTempDirectory("graft-opt").toString + "/store"
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      .repartition(8) // the small-file mess OPTIMIZE exists for
    assert(ChunkStore.commitVersion(li, path, Seq("l_partkey")) == 1L)
    val before = ChunkStore.prunedRead(
        spark, s"$path/v=1", "l_partkey", 1L, 20L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(before.nonEmpty)
    // OPTIMIZE: one call, one pointer swap
    assert(ChunkStore.compactCommitted(spark, path, Seq("l_partkey")) == 2L)
    assert(ChunkStore.currentVersion(spark, path).contains(2L))
    // the new snapshot's manifest is fresh: prunedRead serves
    // bit-equal rows from the compacted files, no stale fail-fast
    val after = ChunkStore.prunedRead(
        spark, s"$path/v=2", "l_partkey", 1L, 20L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(after == before)
    // compaction actually compacted: one data file now
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(v: Long) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/v=$v")).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(dataFiles(2L).size == 1 && dataFiles(1L).size == 8)
    // the old version still time-travels, data and manifest intact
    assert(ChunkStore.readVersion(spark, path, 1L).count() == li.count())
    assert(ChunkStore.prunedRead(spark, s"$path/v=1", "l_partkey", 1L, 20L)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == before)
  }
}
