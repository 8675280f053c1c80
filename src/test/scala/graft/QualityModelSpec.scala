package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** t16: trained logistic-regression quality classifier. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // Separable two-class corpus: "good" docs are long, stopword-rich,
  // punctuation-light prose; "bad" docs are short punctuation noise.
  // Distinct vocabularies land in distinct hash buckets, so a linear
  // model over hashed BoW separates them.
  private def corpus = {
    val good = (0 until 30).map { i =>
      (i.toLong,
        s"the quick brown fox $i jumps over the lazy dog and it is a fine day " * 8)
    }
    val bad = (30 until 60).map { i =>
      (i.toLong, s"!!! ??? ;;; ,,, $i ### ... :: !!")
    }
    (good ++ bad).toDF("doc_id", "text")
  }

  test("t16 separates a planted good/bad corpus with high accuracy") {
    val feats = QualityModel.features(corpus)
    val w = QualityModel.lrFit(feats)
    assert(w.length == QualityModel.NumFeatures + 1)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
    val scored = feats.select($"doc_id", $"y",
      expr(s"aggregate(sequence(1, ${w.length}), cast(0.0 as double), " +
        s"(acc, j) -> acc + element_at(x, j) * element_at(${w.mkString("array(", ",", ")")}, j))").as("z"))
      .select($"doc_id", $"y", (lit(0.5) + lit(0.5) * $"z" / (lit(1.0) + abs($"z"))).as("p"))
    val acc = scored.select(
      avg(when(($"p" >= 0.5) === ($"y" === 1.0), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc >= 0.9, s"training accuracy $acc")
  }

  test("t16 training is deterministic across runs") {
    val feats = QualityModel.features(corpus)
    val w1 = QualityModel.lrFit(feats)
    val w2 = QualityModel.lrFit(feats)
    assert(w1 == w2)
  }

  test("t16 driver query: schema, score bounds, pred consistency") {
    val out = QualityModel.t16QualityLr(spark, sfDir)
    assert(out.columns.toSeq == Seq("doc_id", "label", "score", "pred"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getDouble(2)
      s >= 0.0 && s <= 1.0 && r.getBoolean(3) == (s >= 0.5)
    })
    // both classes exist and the model is not a constant predictor
    assert(out.select(countDistinct($"label")).head.getLong(0) == 2)
    assert(out.select(countDistinct($"pred")).head.getLong(0) == 2)
  }

  test("t26 calibration bins tile the corpus with in-range bin means") {
    import spark.implicits._
    val scored = graft.operators.QualityModel.t16QualityLr(spark, sfDir)
    val n = scored.count()
    val bins = graft.operators.QualityModel.t26QualityCalibration(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(bins.nonEmpty)
    assert(bins.map(_._3).sum == n, "bins must tile every scored doc")
    bins.foreach { case (bin, lo, nDocs, nPos, mean, frac, gap) =>
      assert(lo == bin / 10.0)
      assert(nPos >= 0 && nPos <= nDocs)
      // a bin's mean score must sit inside the bin (top bin includes 1.0)
      assert(mean >= lo - 1e-6 && mean < lo + 0.1 + 1e-6,
        s"bin $bin mean $mean outside [$lo, ${lo + 0.1})")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(math.abs(gap - BigDecimal(frac - mean)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // bin means are strictly increasing — the diagram's x axis is sane
    val means = bins.sortBy(_._1).map(_._5)
    assert(means.zip(means.tail).forall { case (a, b) => a < b })
    Caches.releaseAll()
  }
}
