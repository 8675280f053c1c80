package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.functions._

/** The reliable-checkpoint knob for the iterative fixed-point loops:
  * with a checkpoint dir configured the rounds materialize through
  * reliable `checkpoint()` (executor-loss-safe on a real cluster),
  * without one through `localCheckpoint()` — and the results are
  * bit-equal either way. */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def setCheckpointDirOption(sc: SparkContext, v: Option[String]): Unit =
    // checkpointDir is private[spark]; bytecode-public setter via
    // reflection so the suite can RESTORE the no-dir default after
    v match {
      case Some(d) => sc.setCheckpointDir(d)
      case None =>
        classOf[SparkContext]
          .getMethod("checkpointDir_$eq", classOf[Option[_]])
          .invoke(sc, None)
    }

  test("p5 connected components: reliable checkpoint dir yields bit-equal labels") {
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite assumes no ambient checkpoint dir")
    // two chains + an isolated pair: enough rounds to checkpoint twice
    val pairs = ((0L until 63L).map(i => (i + 1, i)) ++
      Seq((100L, 101L), (101L, 102L))).toDF("a_id", "b_id")
    val local = graft.operators.Pipeline.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      setCheckpointDirOption(sc, Some(dir))
      assert(sc.getCheckpointDir.isDefined)
      val reliable = graft.operators.Pipeline.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(reliable == local)
      // the reliable path actually wrote checkpoint data (under a
      // UUID subdir of the configured dir; getCheckpointDir is a URI)
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint written")
      // every node of each chain labeled by its minimum
      assert(reliable.filter(_._1 <= 63).forall(_._2 == 0L))
      assert(reliable.filter(_._1 >= 100).forall(_._2 == 100L))
    } finally {
      setCheckpointDirOption(sc, None)
      assert(sc.getCheckpointDir.isEmpty, "failed to restore no-dir default")
    }
  }

  test("c20 redirect resolution: bit-equal under the reliable mode") {
    val sc = spark.sparkContext
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),         // chain to terminal d
      ("x", "y"), ("y", "x")).toDF("src", "dst")  // loop, stays unresolved
    val local = graft.operators.ChunkQueries.resolveRedirects(edges, rounds = 3)
      .orderBy($"url").collect().map(_.toSeq).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      setCheckpointDirOption(sc, Some(dir))
      val reliable = graft.operators.ChunkQueries.resolveRedirects(edges, rounds = 3)
        .orderBy($"url").collect().map(_.toSeq).toSeq
      assert(reliable == local)
    } finally {
      setCheckpointDirOption(sc, None)
    }
  }
}
