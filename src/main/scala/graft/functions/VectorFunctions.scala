package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>`
  * embedding columns, built from Spark's codegen'd higher-order
  * functions (zip_with / aggregate) — no UDFs, no row-by-row JVM
  * boxing beyond what codegen emits.
  *
  * Op order is a strict left fold so results are bit-identical with
  * the DuckDB oracle's list_reduce(list_prepend(0.0, ...)) form.
  *
  * Re-expresses the vector side of qurio's hybrid search
  * (apps/backend/internal/adapter/weaviate/store.go:105 Search takes
  * a query vector; Weaviate computes cosine distance internally).
  */
object VectorFunctions {

  /** Elementwise cast to double — float inputs are widened exactly,
    * keeping Spark and DuckDB arithmetic identical. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs (instead of NaN) so
    * downstream filters behave under ANSI mode. Generic (casts
    * elementwise); prefer [[cosineD]] on hot paths. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    val denom = norm(ad) * norm(bd)
    when(denom === 0.0, lit(0.0)).otherwise(dot(ad, bd) / denom)
  }

  /** Native-kernel cosine for array<double> inputs: a single
    * codegen'd loop (graft.plans.CosineSim) with the same
    * left-to-right fold order as [[cosine]] and the DuckDB oracle —
    * bit-identical results, ~interpreter-free. Requires
    * GraftFunctions.ensureRegistered (Tables does this). */
  def cosineD(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)
}
