package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("m3 parses PNG IHDR fields back out of the synthesized blobs") {
    import spark.implicits._
    val rows = Multimodal.m3ImageMeta(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"doc $id signature")
      assert(r.getLong(2) == 16 + id % 64, s"doc $id width")
      assert(r.getLong(3) == 16 + (id * 7) % 64, s"doc $id height")
      assert(r.getLong(4) == 8, s"doc $id bit depth")
    }
  }

  test("m3 parser flags non-PNG payloads instead of failing") {
    import spark.implicits._
    val junk = Seq((1L, "not a png at all, just text bytes"))
      .toDF("doc_id", "s")
      .select($"doc_id", $"s".cast("binary").as("payload"))
    val row = Multimodal.parseImageHeader(junk).collect().head
    assert(!row.getBoolean(1))
  }
}
