package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction PLANNING over a partitioned store — the
  * metadata pass that decides which files merge into which output
  * file before [[ChunkStore.compact]] (or an OPTIMIZE job) rewrites
  * bytes. Streaming foreachBatch appends leave one file per (epoch,
  * partition, task); at 100 TB the rewrite itself is the expensive
  * step, so the plan must come from the listing alone — never from
  * reading data — and group files to a byte target (one parquet
  * rowgroup-friendly output file each).
  *
  * The grouping is [[graft.operators.Packing.packNextFit]] keyed on
  * the partition directory and ordered by path: deterministic,
  * parallel across partitions, one exchange over the LISTING (a
  * metadata-sized table even when the store is 100 TB). On
  * Delta/Iceberg the listing comes from the manifest instead of the
  * FileSystem walk; the planning pass is identical.
  */
object Compaction {

  /** File listing of a partitioned parquet store as a DataFrame:
    * (partition, path, bytes). Partition = the first-level
    * `key=value` directory (ChunkStore.writePartitioned layout);
    * files at the root list under partition "". Driver-side walk —
    * the listing is metadata, and object-store listings at real
    * scale page through the same API. */
  def listFiles(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    // a store that hasn't had its first build yet (e.g. a stream
    // whose first epochs carried only delete notices) lists empty
    if (!fs.exists(rootPath))
      return Seq.empty[(String, String, Long)]
        .toDF("partition", "path", "bytes")
    val it = fs.listFiles(rootPath, true)
    // relativize against the QUALIFIED root (same scheme as the
    // listed paths): URI.relativize silently returns the absolute
    // form on a scheme mismatch, and the partition extraction below
    // would then pick up "="-named ancestors ABOVE the root (e.g.
    // partition dirs of an enclosing store when the root is a
    // `_gen_N` generation dir)
    val rootQ = fs.makeQualified(rootPath).toString
    // the scheme-free PATH part as a second relativization key: on a
    // scheme/authority mismatch between the qualified root and the
    // listed paths (federated/view filesystems), the string-prefix
    // strip fails even though the file IS below the root — the URI
    // path parts still nest, so stripping there keeps the listing
    // root-relative instead of falling back to the absolute form
    val rootP = fs.makeQualified(rootPath).toUri.getPath
    val rows = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile)
      .map { f =>
        val abs = f.getPath.toString
        val absP = f.getPath.toUri.getPath
        val rel =
          if (abs.startsWith(rootQ + "/")) Some(abs.stripPrefix(rootQ + "/"))
          else if (absP.startsWith(rootP + "/"))
            Some(absP.stripPrefix(rootP + "/"))
          else None
        (rel, abs, f.getLen)
      }
      // hidden names filtered on EVERY root-relative component, not
      // just the file basename: the recursive walk descends into
      // underscore-prefixed dirs Spark readers ignore — a torn
      // `_gen_N` staging layout (crash mid-OPTIMIZE) would otherwise
      // feed its invisible files into the files-per-cell compaction
      // signal and trigger a spurious full rewrite. Only the
      // components BELOW the root are judged (an underscore-prefixed
      // ANCESTOR of the root must not blank the listing). In the
      // can't-relativize fallback (foreign path that nests under
      // neither form of the root) only the leaf is judged and no
      // partition is extracted — ancestor components above an
      // unknown root are not partition evidence.
      .filter { case (rel, abs, _) =>
        rel match {
          case Some(r) => r.split('/')
            .forall(c => !c.startsWith("_") && !c.startsWith("."))
          case None =>
            val base = abs.split('/').last
            !base.startsWith("_") && !base.startsWith(".")
        }
      }
      .map { case (rel, abs, len) =>
        val part = rel.map(_.split('/').dropRight(1).find(_.contains("="))
          .getOrElse("")).getOrElse("")
        (part, rel.getOrElse(abs), len)
      }
      .toSeq
    rows.toDF("partition", "path", "bytes")
  }

  /** Assign every file to an output group: next-fit to `targetBytes`
    * per group within its partition, in path order. Output adds
    * `bin_id` (output-file ordinal within the partition), `bin_off`
    * (byte offset the file's data starts at in its group) and
    * `oversize` (file already beyond the target — left alone, a
    * rewrite would only burn I/O). */
  def planFiles(files: DataFrame, targetBytes: Long): DataFrame =
    graft.operators.Packing.packNextFit(
      files, Seq("partition"), Seq("path"), "bytes", targetBytes)

  /** One row per planned output file: file count and total bytes —
    * the summary an OPTIMIZE scheduler budgets tasks from. */
  def planSummary(files: DataFrame, targetBytes: Long): DataFrame =
    planFiles(files, targetBytes)
      .groupBy(col("partition"), col("bin_id"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"))
      .orderBy(col("partition"), col("bin_id"))
}
