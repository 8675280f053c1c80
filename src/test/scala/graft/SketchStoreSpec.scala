package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Persisted sketch-state serving across a restart: the stream
  * appends closed windows' CMS/HLL cells to a parquet store; a
  * restarted stream (same checkpoint, file source) processes ONLY
  * new input, historical windows' estimates serve from disk
  * unchanged. */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("user_id", LongType)))

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(String, String, Long)]): Unit =
    rows.map { case (ts, et, uid) => (Timestamp.valueOf(ts), et, uid) }
      .toDF("ts", "event_type", "user_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")

  test("CMS store: restart serves closed windows from disk, processes only new files") {
    val src = Files.createTempDirectory("graft-sketch-src").toString
    val store = Files.createTempDirectory("graft-sketch-store").toString
    // window W10 = [10:00, 11:00); the 13:05 row pushes the watermark
    // (max ts - 10 min) past W10's end so it closes and emits
    writeBatch(src, "b1", Seq(
      ("2024-03-01 10:05:00", "click", 1L),
      ("2024-03-01 10:15:00", "click", 2L),
      ("2024-03-01 10:25:00", "view", 3L),
      ("2024-03-01 13:05:00", "click", 4L)))
    def events = spark.readStream.schema(schema).parquet(s"$src/*")
    val q1 = EventStream.sketchStoreStart(events, store)
    q1.processAllAvailable(); q1.stop()
    val keys = Seq((Timestamp.valueOf("2024-03-01 10:00:00"), "click"),
      (Timestamp.valueOf("2024-03-01 10:00:00"), "view"))
      .toDF("window_start", "event_type")
    val est1 = EventStream.serveSketchFrom(spark, store, keys).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est1 == Map("click" -> 2L, "view" -> 1L),
      s"CMS at this load has no collisions, est must equal exact: $est1")
    val w10Cells = spark.read.parquet(s"$store/cms")
      .filter($"window_start" === "2024-03-01 10:00:00").count()
    assert(w10Cells > 0)

    // restart: new file closes W13; W10 must not be recomputed
    writeBatch(src, "b2", Seq(
      ("2024-03-01 13:20:00", "click", 5L),
      ("2024-03-01 15:00:00", "click", 6L)))
    val q2 = EventStream.sketchStoreStart(events, store)
    q2.processAllAvailable()
    val processed = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    assert(processed == 2, s"restart must read only the new file, got $processed rows")
    val est2 = EventStream.serveSketchFrom(spark, store, keys).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(est2 == est1, "historical window estimates must survive the restart")
    assert(spark.read.parquet(s"$store/cms")
      .filter($"window_start" === "2024-03-01 10:00:00").count() == w10Cells,
      "closed window's cells must not be rewritten or duplicated")
    // the newly closed window (13:00) is now servable too
    val w13 = EventStream.serveSketchFrom(spark, store,
      Seq((Timestamp.valueOf("2024-03-01 13:00:00"), "click"))
        .toDF("window_start", "event_type")).collect()
    assert(w13.length == 1 && w13.head.getLong(2) == 2L)
  }

  test("HLL store: distinct estimates equal before and after restart") {
    val src = Files.createTempDirectory("graft-hll-src").toString
    val store = Files.createTempDirectory("graft-hll-store").toString
    writeBatch(src, "b1",
      (1L to 40L).map(u => ("2024-03-01 10:05:00", "click", u)) :+
        (("2024-03-01 13:05:00", "click", 99L)))
    def events = spark.readStream.schema(schema).parquet(s"$src/*")
    val q1 = EventStream.hllStoreStart(events, store)
    q1.processAllAvailable(); q1.stop()
    val est1 = EventStream.serveHllFrom(spark, store).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    val w10 = Timestamp.valueOf("2024-03-01 10:00:00")
    assert(est1.contains(w10))
    // ~6% standard error sketch over 40 distinct users
    assert(math.abs(est1(w10) - 40.0) < 10.0, s"estimate off: ${est1(w10)}")

    writeBatch(src, "b2", Seq(("2024-03-01 15:00:00", "click", 100L)))
    val q2 = EventStream.hllStoreStart(events, store)
    q2.processAllAvailable(); q2.stop()
    val est2 = EventStream.serveHllFrom(spark, store).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    assert(est2(w10) == est1(w10),
      "closed window's estimate must be bit-identical after restart")
  }
}
