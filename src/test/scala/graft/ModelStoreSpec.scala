package graft

import java.nio.file.Files

import graft.operators.{BpeTrainer, QualityModel}
import graft.sources.ModelStore

/** Persistence of trained artifacts: exact round trips and the
  * load-don't-retrain restart discipline. */
class ModelStoreSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-models").toString

  test("vector/matrix/merges round-trip bit-exact; absent loads None") {
    val w = Seq(0.25, -1.5, 3.125e-7, 0.0, 42.0)
    ModelStore.saveVector(spark, root, "lr", w)
    assert(ModelStore.loadVector(spark, root, "lr").contains(w))
    val m = Seq(Seq(1.0, 2.0), Seq(-0.5, 0.25), Seq(7.0, 8.0))
    ModelStore.saveMatrix(spark, root, "cents", m)
    assert(ModelStore.loadMatrix(spark, root, "cents").contains(m))
    val mg = Seq(("t", "h"), ("th", "e"), ("a", "n"))
    ModelStore.saveMerges(spark, root, "bpe", mg)
    assert(ModelStore.loadMerges(spark, root, "bpe").contains(mg))
    assert(ModelStore.loadVector(spark, root, "nope").isEmpty)
    // overwrite replaces, not appends
    ModelStore.saveVector(spark, root, "lr", Seq(9.0))
    assert(ModelStore.loadVector(spark, root, "lr").contains(Seq(9.0)))
    // long lists keep ALL 64 bits — full-range hashes would corrupt
    // through a double-backed vector
    val hs = Seq(Long.MaxValue, Long.MinValue, (1L << 53) + 1, -7L, 0L)
    ModelStore.saveLongs(spark, root, "spans", hs)
    assert(ModelStore.loadLongs(spark, root, "spans").contains(hs))
    assert(ModelStore.loadLongs(spark, root, "nope").isEmpty)
    // load-or-build: miss builds + persists, hit skips the build
    var built = 0
    val b1 = ModelStore.longsOrBuild(spark, root, "lob") { built += 1; Seq(5L, 6L) }
    val b2 = ModelStore.longsOrBuild(spark, root, "lob") { built += 1; Seq(9L) }
    assert(b1 == Seq(5L, 6L) && b2 == Seq(5L, 6L) && built == 1)
  }

  test("staged saves leave no staging dirs and keep the artifact readable") {
    val r = Files.createTempDirectory("graft-models-staged").toString
    ModelStore.saveVector(spark, r, "w", Seq(1.0, 2.0))
    ModelStore.saveVector(spark, r, "w", Seq(3.0, 4.0))
    assert(ModelStore.loadVector(spark, r, "w").contains(Seq(3.0, 4.0)))
    val leftovers = new java.io.File(r).listFiles()
      .map(_.getName).filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging dirs not cleaned: ${leftovers.toSeq}")
  }

  test("persisted models serve a restarted session without retraining") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog " * 5),
      (2L, "!!! ??? ;;; noise ### ..."),
      (3L, "a fine day it is to be in the sun " * 4)).toDF("doc_id", "text")
    // session 1 trains and persists
    val feats = QualityModel.features(docs)
    val trained = QualityModel.lrFit(feats)
    ModelStore.saveVector(spark, root, "lr_quality", trained)
    val merges = BpeTrainer.fitMerges(docs, 2).map { case (l, r, _, _) => (l, r) }
    ModelStore.saveMerges(spark, root, "bpe_merges", merges)
    // "session 2": load-or-train must NOT invoke the build
    var built = false
    val served = ModelStore.vectorOrTrain(spark, root, "lr_quality") {
      built = true; QualityModel.lrFit(feats)
    }
    assert(!built && served == trained)
    // the loaded merges tokenize identically to the fresh ones
    val loaded = ModelStore.loadMerges(spark, root, "bpe_merges").get
    assert(loaded == merges)
    val a = BpeTrainer.tokenizeOf(docs, loaded).collect().map(_.toSeq).toSeq
    val b = BpeTrainer.tokenizeOf(docs, merges).collect().map(_.toSeq).toSeq
    assert(a == b)
    Caches.releaseAll()
  }
}
