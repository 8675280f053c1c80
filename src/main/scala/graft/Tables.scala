package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators take an `sfDir` and read through here so the parquet
  * scan benefits from Catalyst pushdown (filters/column pruning reach
  * the scan node). At cluster scale the same code reads a partitioned
  * table root; nothing here assumes single-file input.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every operator reads through here, so this is the one choke
    // point that guarantees graft's native kernels and planner rules
    // exist in whatever session the driver hands us
    graft.plans.GraftFunctions.ensureRegistered(spark)
    graft.plans.GraftPlanner.ensureInjected(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
    * generations and TIMESTAMP(MICROS) in others; normalize both to
    * Spark's native TimestampType so downstream operators see one
    * type. NANOS would be rejected by the vectorized reader, so it is
    * read as raw nanos (`nanosAsLong`) and truncated with integer
    * `div` (ns epoch values exceed double's exact 2^53 range). MICROS
    * arrives as TIMESTAMP_NTZ; the session timezone is pinned to UTC
    * so the cast to TimestampType is value-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    // read-time conf, so it cannot be scoped tighter than the session;
    // guard to avoid re-mutating shared-session conf on every read
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
