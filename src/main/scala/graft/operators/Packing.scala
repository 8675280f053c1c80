package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Greedy NEXT-FIT bin packing over a partitioned, ordered stream —
  * the layout kernel shared by sequence packing without document
  * splitting (Curation.p8) and small-file compaction planning
  * (sources/Compaction). The reference's ingestion plane batches
  * chunks into fixed-size embed calls the same way (one stream per
  * worker, greedy fill, oversize items alone); here the stream is a
  * per-group sorted scan.
  *
  * SCALE SHAPE: one hash exchange on the group key + an in-partition
  * sort — the same bill as any groupBy — then a single sequential
  * pass per partition. The running (bin, fill) state is inherently
  * order-dependent (a window function cannot express the reset), so
  * this is the documented legitimate `mapPartitions` case: per-group
  * imperative state, zero driver involvement, parallel across groups.
  * One pathological mega-group serializes within its own task only —
  * callers shard hot groups by adding a derived column to `grpCols`
  * (p8's per-source pack streams are exactly that design).
  *
  * Determinism: `grpCols ++ orderCols` must totally order rows within
  * a group (callers pass a unique tie-break key); given that, output
  * is identical across partition counts and reruns — asserted by
  * PackingSpec's repartition-invariance case.
  */
object Packing {

  /** Appends `bin_id` (0-based per group), `bin_off` (running offset
    * inside the bin) and `oversize` (item alone in its bin because it
    * exceeds `cap`) to `rows`. An item closes the current bin when it
    * no longer fits; zero-size items ride at the current offset. */
  def packNextFit(rows: DataFrame, grpCols: Seq[String],
                  orderCols: Seq[String], sizeCol: String,
                  cap: Long): DataFrame = {
    require(grpCols.nonEmpty && orderCols.nonEmpty && cap > 0)
    val inSchema = rows.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("bin_id", LongType, nullable = false),
      StructField("bin_off", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    val gIdx = grpCols.map(inSchema.fieldIndex)
    val sIdx = inSchema.fieldIndex(sizeCol)
    rows
      .repartition(grpCols.map(col): _*)
      .sortWithinPartitions((grpCols ++ orderCols).map(col): _*)
      .mapPartitions { it =>
        // group changes are contiguous after the in-partition sort;
        // state resets on every key change
        var curKey: Seq[Any] = null
        var bin = 0L
        var fill = 0L
        it.map { r =>
          val key = gIdx.map(r.get)
          if (key != curKey) { curKey = key; bin = 0L; fill = 0L }
          val sz = r.getLong(sIdx)
          if (fill > 0 && fill + sz > cap) { bin += 1; fill = 0L }
          val off = fill
          fill += sz
          Row.fromSeq(r.toSeq ++ Seq(bin, off, sz > cap))
        }
      }(Encoders.row(outSchema))
  }
}
