package graft.sources

import org.apache.spark.sql.SparkSession

/** Lakehouse persistence for DRIVER-SIDE trained artifacts — the
  * restart seam [[graft.TrainedModels]]'s session memo lacks: a
  * production serving deployment trains its models once (LR quality
  * weights, BPE merge table, k-means centroids — kilobytes each),
  * persists them next to the data, and every later session LOADS
  * instead of re-running the training scans. The a8 IVF index
  * persists its ASSIGNMENTS; this store persists the MODELS that
  * produced them.
  *
  * Layout: one parquet directory per named artifact under the store
  * root, positional rows (ordinal columns, value) — schema-stable,
  * mergeable into any catalog, readable by anything. Writes stage
  * into a temp sibling directory and RENAME into place (Spark's
  * overwrite mode deletes the target before writing, so a crash
  * mid-write would lose the previous artifact for the whole write
  * duration; staging shrinks the exposed window to the final
  * delete+rename instant, and a crash during the write itself
  * leaves the previous artifact untouched). Loads return None when
  * absent so callers fall back to training.
  */
object ModelStore {

  private def dir(root: String, name: String) = s"$root/model=$name"

  /** Stage-then-rename write: `write` produces the artifact in a
    * temp dir under the root; the previous artifact survives until
    * the new one is fully committed. */
  private def writeStaged(spark: SparkSession, root: String, name: String)
                         (write: String => Unit): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(dir(root, name))
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/.staging-model=$name-${java.util.UUID.randomUUID()}")
    val fs = target.getFileSystem(conf)
    write(tmp.toString)
    try {
      if (fs.exists(target)) fs.delete(target, true): Unit
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"rename $tmp -> $target failed")
    } finally {
      if (fs.exists(tmp)) fs.delete(tmp, true): Unit
    }
  }

  /** Persist a weight/centroid-style vector (pos, value). */
  def saveVector(spark: SparkSession, root: String, name: String,
                 v: Seq[Double]): Unit = {
    import spark.implicits._
    writeStaged(spark, root, name) { p =>
      v.zipWithIndex.map { case (x, i) => (i, x) }
        .toDF("pos", "value")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
  }

  /** Load a vector saved by [[saveVector]]; None when absent. */
  def loadVector(spark: SparkSession, root: String,
                 name: String): Option[Seq[Double]] = {
    import spark.implicits._
    val d = new org.apache.hadoop.fs.Path(dir(root, name))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) None
    else Some(spark.read.parquet(dir(root, name))
      .orderBy($"pos").select($"value").as[Double].collect().toSeq)
  }

  /** Persist a centroid matrix (cid, pos, value). */
  def saveMatrix(spark: SparkSession, root: String, name: String,
                 m: Seq[Seq[Double]]): Unit = {
    import spark.implicits._
    writeStaged(spark, root, name) { out =>
      m.zipWithIndex.flatMap { case (row, cid) =>
        row.zipWithIndex.map { case (x, p) => (cid, p, x) }
      }.toDF("cid", "pos", "value")
        .coalesce(1).write.mode("overwrite").parquet(out)
    }
  }

  /** Load a matrix saved by [[saveMatrix]]; None when absent. */
  def loadMatrix(spark: SparkSession, root: String,
                 name: String): Option[Seq[Seq[Double]]] = {
    import spark.implicits._
    val d = new org.apache.hadoop.fs.Path(dir(root, name))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) None
    else Some(spark.read.parquet(dir(root, name))
      .orderBy($"cid", $"pos").as[(Int, Int, Double)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq))
  }

  /** Persist a BPE merge table (rank-ordered pairs). */
  def saveMerges(spark: SparkSession, root: String, name: String,
                 merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    writeStaged(spark, root, name) { p =>
      merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
  }

  /** Load a merge table saved by [[saveMerges]]; None when absent. */
  def loadMerges(spark: SparkSession, root: String,
                 name: String): Option[Seq[(String, String)]] = {
    import spark.implicits._
    val d = new org.apache.hadoop.fs.Path(dir(root, name))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) None
    else Some(spark.read.parquet(dir(root, name))
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq)
  }

  /** Persist an ordered id/hash list (pos, value BIGINT) — exact 64
    * bits, which a double-backed vector would corrupt past 2⁵³ (the
    * frozen-span hashes are full-range). */
  def saveLongs(spark: SparkSession, root: String, name: String,
                v: Seq[Long]): Unit = {
    import spark.implicits._
    writeStaged(spark, root, name) { p =>
      v.zipWithIndex.map { case (x, i) => (i, x) }
        .toDF("pos", "value")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
  }

  /** Load a list saved by [[saveLongs]]; None when absent. */
  def loadLongs(spark: SparkSession, root: String,
                name: String): Option[Seq[Long]] = {
    import spark.implicits._
    val d = new org.apache.hadoop.fs.Path(dir(root, name))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) None
    else Some(spark.read.parquet(dir(root, name))
      .orderBy($"pos").select($"value").as[Long].collect().toSeq)
  }

  /** Load-or-train: the restart discipline in one call — disk hit
    * loads (no training scan), miss trains via `build` and persists
    * for the next session. */
  def vectorOrTrain(spark: SparkSession, root: String, name: String)
                   (build: => Seq[Double]): Seq[Double] =
    loadVector(spark, root, name).getOrElse {
      val v = build; saveVector(spark, root, name, v); v
    }

  /** [[vectorOrTrain]] for exact long lists. */
  def longsOrBuild(spark: SparkSession, root: String, name: String)
                  (build: => Seq[Long]): Seq[Long] =
    loadLongs(spark, root, name).getOrElse {
      val v = build; saveLongs(spark, root, name, v); v
    }
}
