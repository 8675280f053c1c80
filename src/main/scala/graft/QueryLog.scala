package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-path observability — the batch re-expression of the
  * reference's QueryLogger (apps/backend/internal/retrieval/
  * logger.go QueryLogEntry: timestamp, query, num_results,
  * duration_ns, latency_ms, correlation_id; service.go Search logs
  * each successful call via a deferred Log).
  *
  * The Go service appends JSONL to a file under a mutex; here the
  * log is a bounded in-memory ring on the DRIVER (entries are tiny
  * and serving calls are driver-initiated, so there is no executor
  * path to instrument) exposed as a DataFrame for the same
  * downstream use — latency dashboards, slow-query triage, top-query
  * reports. At fleet scale each driver ships its ring via
  * [[snapshot]]/[[toDF]] into the lakehouse; the analytics over it
  * are ordinary Spark.
  */
final class QueryLog(maxEntries: Int = QueryLog.DefaultMaxEntries) {
  require(maxEntries > 0)

  private val buf = new java.util.ArrayDeque[QueryLog.Entry]()

  /** Append one entry; the ring drops the oldest beyond capacity
    * (an unbounded buffer in a long-lived session is a leak). */
  def log(entry: QueryLog.Entry): Unit = synchronized {
    if (buf.size >= maxEntries) buf.pollFirst(): Unit
    buf.addLast(entry): Unit
  }

  def size: Int = synchronized(buf.size)

  def clear(): Unit = synchronized(buf.clear())

  /** Point-in-time copy, oldest first. */
  def snapshot(): Seq[QueryLog.Entry] = synchronized {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toList
  }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(snapshot()).toDF()
  }

  /** The ops rollup a latency dashboard reads: per-query call count,
    * mean/p50/p95 latency, mean result count — grouped on the query
    * string like the reference's log analysis. */
  def stats(spark: SparkSession): DataFrame = {
    toDF(spark)
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_calls"),
        round(avg(col("latency_ms")), 3).as("avg_latency_ms"),
        expr("percentile(latency_ms, 0.5)").as("p50_latency_ms"),
        expr("percentile(latency_ms, 0.95)").as("p95_latency_ms"),
        round(avg(col("num_results")), 3).as("avg_results"))
      .orderBy(col("n_calls").desc, col("query"))
  }
}

object QueryLog {
  val DefaultMaxEntries = 10000

  /** One logged call — field-for-field the reference's QueryLogEntry
    * (logger.go:14-21), with latency_ms derived from duration_ns the
    * same way (integer milliseconds). */
  final case class Entry(timestamp_ms: Long, query: String,
                         num_results: Int, duration_ns: Long,
                         latency_ms: Long, correlation_id: String)

  def entry(query: String, numResults: Int, durationNs: Long,
            correlationId: String = ""): Entry =
    Entry(System.currentTimeMillis(), query, numResults, durationNs,
      durationNs / 1000000L, correlationId)
}
