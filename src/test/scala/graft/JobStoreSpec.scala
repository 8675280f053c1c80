package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sources.{ChunkStore, JobStore}

/** Failed-jobs store lifecycle: versioned commits, the stuck sweep
  * applied as a mutation, and the batch retry's publish-then-delete
  * contract (transient errors requeue, blocked never does; requeued
  * rows leave the store; older versions stay for time travel). */
class JobStoreSpec extends SparkSpec {

  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-jobs").toString

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

  private def plant(path: String): Unit = {
    val jobs = Seq(
      // (job_id, source, handler, status, attempts, error, updated_at)
      (1L, 10L, "web", "failed", 1,
        "Page.goto: net::ERR_TIMED_OUT at https://a", ts(9)),
      (2L, 10L, "file", "failed", 2,
        "Page.goto: net::ERR_CONNECTION_REFUSED at https://b", ts(9)),
      (3L, 11L, "web", "failed", 1, "blocked by robots.txt", ts(9)),
      (4L, 11L, "web", "failed", 3,
        "Page.goto: net::ERR_TIMED_OUT at https://c", ts(9)),
      (5L, 12L, "web", "processing", 1, "", ts(1)),   // stale -> reset
      (6L, 12L, "file", "processing", 3, "", ts(1)),  // stale, exhausted
      (7L, 12L, "web", "processing", 0, "", ts(10)),  // fresh: untouched
      (8L, 13L, "web", "completed", 1, "", ts(10)))
      .toDF("job_id", "source_id", "handler", "status", "attempts",
        "error", "updated_at")
      .withColumn("payload",
        concat(lit("{\"type\":\""), $"handler", lit("\"}")))
    JobStore.write(jobs, path): Unit
  }

  test("resetStuck applies q53's sweep as one commit; fresh rows untouched") {
    val p = s"$tmp/sweep"
    plant(p)
    val v = JobStore.resetStuck(spark, p)
    assert(v === 2L)
    val after = JobStore.read(spark, p)
      .select($"job_id", $"status", $"attempts", $"error").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(after(5L) === (("pending", 2, "timeout_reset")))
    assert(after(6L) === (("failed", 3, "retries_exhausted")))
    assert(after(7L) === (("processing", 0, "")), "fresh processing row untouched")
    assert(after(8L)._1 === "completed")
    // time travel: version 1 still serves the pre-sweep snapshot
    assert(ChunkStore.readVersion(spark, p, 1L)
      .filter($"job_id" === 5L).head().getString(3) === "processing")
  }

  test("retryJobs: transient failed below the cap requeue and leave the store; blocked/exhausted stay") {
    val p = s"$tmp/retry"
    plant(p)
    JobStore.resetStuck(spark, p): Unit
    val (requeued, v) = JobStore.retryJobs(spark, p)
    assert(v === 3L)
    val batch = requeued.collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // 1 (timeout, a=1) and 2 (refused, a=2) requeue; 3 is BLOCKED
    // (permanent), 4 is at the attempt cap, 6 exhausted post-sweep
    // BUT its error text no longer matches a transient class only by
    // the default — attempts 3 >= cap keeps it out either way
    assert(batch.keySet === Set(1L, 2L))
    assert(batch(1L) === "ingest-web" && batch(2L) === "ingest-file",
      "topic routes from the handler like the reference payload sniff")
    val left = JobStore.read(spark, p).select($"job_id").as[Long]
      .collect().toSet
    assert(left === Set(3L, 4L, 5L, 6L, 7L, 8L),
      "requeued rows are deleted by the commit")
    // idempotence: a second retry pass finds nothing eligible
    val (again, _) = JobStore.retryJobs(spark, p)
    assert(again.count() === 0)
  }

  test("GraftEngine facade delegates the jobs lifecycle") {
    val p = s"$tmp/facade"
    plant(p)
    val eng = new GraftEngine(spark, Tables.documents(spark, sfDir))
    assert(eng.failedJobs(p).count() === 8)
    assert(eng.resetStuckJobs(p) === 2L)
    val batch = eng.retryFailedJobs(p)
    assert(batch.count() === 2)
    assert(eng.failedJobs(p).count() === 6)
  }
}
