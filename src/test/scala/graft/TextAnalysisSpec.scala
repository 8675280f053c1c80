package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("t11 confidence is the normalized best-vs-second margin") {
    val rows = TextAnalysis.t11LangConfidence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val best = r.getLong(2); val second = r.getLong(3)
      val conf = r.getDouble(4); val reliable = r.getBoolean(5)
      assert(conf >= -1.0 && conf <= 1.0)
      // non-zh predictions are argmax winners: margin never negative
      if (r.getString(1) != "zh" && r.getString(1) != "unknown")
        assert(best >= second)
      // the reliability gate composes exactly as documented
      assert(reliable == (conf >= 0.2 && best >= 3))
    }
    // the flag must be doing real work: both classes present
    val flags = rows.map(_.getBoolean(5)).toSet
    assert(flags == Set(true, false) || rows.length < 10)
  }
}
