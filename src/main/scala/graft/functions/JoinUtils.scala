package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting
  * is for the pathological case AQE can't fix — one join key carrying
  * a double-digit percentage of a 100 TB fact table. The salt is
  * deterministic (hash of the whole row, not rand()), so plans stay
  * reproducible and retries are safe.
  */
object JoinUtils {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways: the big
    * side gets a per-row deterministic salt, the small side is
    * replicated `salt` times, and the join key becomes (key, salt).
    * Result is row-identical to the plain join; the exchange of the
    * big side spreads each hot key over `salt` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val bigCols = big.columns
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(salt)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key))
      .drop("__salt")
  }
}
