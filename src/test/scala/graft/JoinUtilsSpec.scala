package graft

import graft.functions.JoinUtils

class JoinUtilsSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    val plain = li.join(ord, "l_orderkey")
      .groupBy($"o_orderpriority").agg(
        org.apache.spark.sql.functions.sum($"l_quantity").as("q"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy($"o_orderpriority").collect().toSeq

    val salted = JoinUtils.saltedJoin(li, ord, "l_orderkey", salt = 8)
      .groupBy($"o_orderpriority").agg(
        org.apache.spark.sql.functions.sum($"l_quantity").as("q"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy($"o_orderpriority").collect().toSeq

    assert(plain.map(_.toString) == salted.map(_.toString))
  }
}
