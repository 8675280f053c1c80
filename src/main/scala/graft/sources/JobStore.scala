package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FAILED-JOBS store + retry requeue — the last reference *data*
  * surface (migration 000009_create_failed_jobs.up.sql: id,
  * source_id, handler, payload, error, retries, created_at;
  * features/job/service.go:31 Retry = get → publish to the
  * handler-routed topic → delete; :86 ResetStuckJobs) re-expressed
  * set-at-a-time over [[ChunkStore]]'s versioned-commit discipline:
  * every mutation is one snapshot commit behind the `_latest`
  * pointer swap, so a reader always resolves a complete jobs table
  * and older versions stay for time travel. The reference retries
  * one job per HTTP call; a 100 TB ingest retries in BATCHES — the
  * whole eligible set classifies, requeues, and deletes in one
  * commit, with the publish rows returned as a DataFrame the queue
  * adapter drains (the ModelAdapters seam pattern: the NSQ client
  * itself is transport, out of the data plane's scope). */
object JobStore {

  /** Commit a jobs snapshot (columns: job_id, source_id, handler,
    * payload, status, attempts, error, updated_at). */
  def write(jobs: DataFrame, path: String): Long =
    ChunkStore.commitVersion(jobs, path)

  /** The committed jobs table. */
  def read(spark: SparkSession, path: String): DataFrame =
    ChunkStore.readLatest(spark, path)

  /** ResetStuckJobs as ONE commit — q53's sweep applied as the
    * mutation it audits (source.go:326 ResetStuckPages' shape on the
    * jobs table): rows `processing` whose updated_at is older than
    * max(updated_at) − `timeoutHours` either reset to `pending` with
    * attempts+1 (attempts < maxAttempts) or land in `failed` with
    * error='retries_exhausted'. The cutoff is a one-row scalar
    * broadcast off the table's own clock — never wall-time, so
    * replays are deterministic. Returns the new version. */
  def resetStuck(spark: SparkSession, path: String,
                 timeoutHours: Int = 1, maxAttempts: Int = 3): Long = {
    import spark.implicits._
    val jobs = read(spark, path)
    val cutoff = jobs.agg(
      (max($"updated_at") - expr(s"INTERVAL $timeoutHours HOUR"))
        .as("cutoff"))
    val swept = jobs.crossJoin(broadcast(cutoff))
      .withColumn("stuck",
        $"status" === "processing" && $"updated_at" < $"cutoff")
      .select($"job_id", $"source_id", $"handler", $"payload",
        when($"stuck" && $"attempts" < maxAttempts, "pending")
          .when($"stuck", "failed")
          .otherwise($"status").as("status"),
        when($"stuck" && $"attempts" < maxAttempts, $"attempts" + 1)
          .otherwise($"attempts").cast("int").as("attempts"),
        when($"stuck" && $"attempts" < maxAttempts, "timeout_reset")
          .when($"stuck", "retries_exhausted")
          .otherwise($"error").as("error"),
        $"updated_at")
    write(swept.localCheckpoint(true), path)
  }

  /** Retry as ONE publish-then-delete commit (service.go:31, batch):
    * the eligible set — status `failed`, a TRANSIENT error class
    * (c14's taxonomy: blocked/forbidden never retries), attempts
    * below the cap — becomes the REQUEUE batch, with the topic
    * routed from the handler exactly like the reference's payload
    * sniff (type "file" → ingest-file, else ingest-web); the new
    * version commits WITHOUT those rows. Returns (requeue batch,
    * new version); the batch is what a queue adapter publishes —
    * the data-plane half of the reference's NSQ hop. */
  def retryJobs(spark: SparkSession, path: String,
                maxAttempts: Int = 3): (DataFrame, Long) = {
    import spark.implicits._
    val jobs = read(spark, path)
    val classified = jobs.withColumn("err_code",
      graft.operators.WebMeta.classifyCrawlError($"error"))
    val eligible = $"status" === "failed" &&
      $"err_code".isin(graft.operators.WebMeta.TransientErrors: _*) &&
      $"attempts" < maxAttempts
    val requeued = classified.filter(eligible)
      .select($"job_id", $"source_id", $"handler",
        when($"handler" === "file", "ingest-file")
          .otherwise("ingest-web").as("topic"),
        $"payload")
      .localCheckpoint(true)
    val survivors = classified.filter(!eligible)
      .drop("err_code").localCheckpoint(true)
    val v = write(survivors, path)
    (requeued, v)
  }
}
