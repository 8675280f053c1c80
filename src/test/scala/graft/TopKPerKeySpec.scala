package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{EngineQueries, Knn}

/** The custom TopKPerKey physical operator (plans/TopKPerKey.scala):
  * result parity with the window formulation it replaces, rewrite
  * trigger conditions, and plan-shape guarantees (no sorts, pruned
  * shuffle). */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withTopK[T](f: => T): T = {
    graft.plans.GraftPlanner.ensureInjected(spark)
    f
  }

  private def sample: DataFrame =
    spark.range(1000).select(
      (col("id") % 7).as("grp"),
      (col("id") * 37 % 101).as("score"),
      col("id"))

  test("rewrite fires: row_number window filter plans as Partial/FinalTopK, no Sort") {
    withTopK {
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
      val df = sample.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      val p = physical(df)
      assert(p.contains("FinalTopK") && p.contains("PartialTopK"), s"rewrite did not fire:\n$p")
      assert(!p.contains("Sort "), s"TopK plan must not sort:\n$p")
      assert(!p.contains("Window"), s"Window node should be gone:\n$p")
    }
  }

  test("results match the built-in window operator exactly") {
    withTopK {
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
      val topk = sample.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .orderBy($"grp", $"rnk")
      // reference: same logical query planned WITHOUT the rewrite
      val session2 = spark.newSession()
      import org.apache.spark.sql.{functions => F}
      val ref = session2.range(1000).select(
          (F.col("id") % 7).as("grp"),
          (F.col("id") * 37 % 101).as("score"),
          F.col("id"))
        .withColumn("rnk", F.row_number().over(
          Window.partitionBy(F.col("grp")).orderBy(F.col("score").desc, F.col("id"))))
        .filter(F.col("rnk") <= 3)
        .orderBy(F.col("grp"), F.col("rnk"))
      assert(physical(ref).contains("Window"), "reference session must use the window plan")
      assert(topk.collect().toSeq.map(_.toSeq) === ref.collect().toSeq.map(_.toSeq))
    }
  }

  test("k=1 and rnk < n and rnk = 1 bounds all rewrite correctly") {
    withTopK {
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
      val ranked = sample.withColumn("rnk", row_number().over(w))
      val le = ranked.filter($"rnk" <= 1).select($"grp", $"id")
      val lt = ranked.filter($"rnk" < 2).select($"grp", $"id")
      val eq = ranked.filter($"rnk" === 1).select($"grp", $"id")
      val expected = le.collect().map(_.toSeq).toSet
      assert(physical(le).contains("FinalTopK"))
      assert(physical(lt).contains("FinalTopK"))
      assert(physical(eq).contains("FinalTopK"))
      assert(lt.collect().map(_.toSeq).toSet === expected)
      assert(eq.collect().map(_.toSeq).toSet === expected)
      assert(expected.size === 7)
    }
  }

  test("rnk = n keeps only rank n (filter re-applies above TopK)") {
    withTopK {
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
      val ranked = sample.withColumn("rnk", row_number().over(w))
      val eq3 = ranked.filter($"rnk" === 3)
      assert(physical(eq3).contains("FinalTopK"))
      val rows = eq3.collect()
      assert(rows.length === 7 && rows.forall(_.getAs[Int]("rnk") == 3))
    }
  }

  test("no rewrite for rank/lag windows or multi-expression windows") {
    withTopK {
      // q7 uses row_number + lag in one window: must stay a Window plan
      val p = physical(EngineQueries.q7Window(spark, sfDir))
      assert(p.contains("Window"), s"q7 must not be rewritten:\n$p")
      assert(!p.contains("FinalTopK"))
    }
  }

  test("q10 and a1 production queries ride the TopK operator and match oracle shape") {
    withTopK {
      val q10 = EngineQueries.q10TopkPerGroup(spark, sfDir)
      assert(physical(q10).contains("FinalTopK"))
      val rows = q10.collect()
      assert(rows.nonEmpty)
      // each brand contributes at most 5, ranks are 1..5 in order
      val byBrand = rows.groupBy(_.getAs[String]("p_brand"))
      assert(byBrand.values.forall(g => g.map(_.getAs[Int]("rnk")).toSeq == (1 to g.length)))

      val a1 = Knn.a1BruteForce(spark, sfDir)
      assert(physical(a1).contains("FinalTopK"))
      assert(a1.collect().length === 50)
    }
  }

  test("null group keys and null order values match the window operator") {
    withTopK {
      val data = spark.range(200).select(
        when(col("id") % 5 === 0, lit(null)).otherwise(col("id") % 7).as("grp"),
        when(col("id") % 11 === 0, lit(null)).otherwise(col("id") * 37 % 101).as("score"),
        col("id"))
      val w = Window.partitionBy($"grp").orderBy($"score".desc_nulls_last, $"id")
      val topk = data.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
        .orderBy($"grp".asc_nulls_first, $"rnk")
      assert(physical(topk).contains("FinalTopK"), "rewrite must fire on nullable keys")

      val s2 = spark.newSession()
      import org.apache.spark.sql.{functions => F}
      val ref = s2.range(200).select(
          F.when(F.col("id") % 5 === 0, F.lit(null)).otherwise(F.col("id") % 7).as("grp"),
          F.when(F.col("id") % 11 === 0, F.lit(null)).otherwise(F.col("id") * 37 % 101).as("score"),
          F.col("id"))
        .withColumn("rnk", F.row_number().over(
          Window.partitionBy(F.col("grp")).orderBy(F.col("score").desc_nulls_last, F.col("id"))))
        .filter(F.col("rnk") <= 3)
        .orderBy(F.col("grp").asc_nulls_first, F.col("rnk"))
      assert(physical(ref).contains("Window"))
      assert(topk.collect().toSeq.map(_.toSeq) === ref.collect().toSeq.map(_.toSeq))
    }
  }

  test("partial stage prunes shuffle input to <= k rows per key per partition") {
    withTopK {
      val w = Window.partitionBy($"grp").orderBy($"score".desc, $"id")
      val df = sample.repartition(4).withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
      df.collect()
      // 7 groups x 3 rows x <= 4 partitions = <= 84 rows ever shuffled
      // (vs 1000 in the window plan); assert via the partial operator's
      // presence below the exchange in the final plan
      val p = physical(df)
      val exchangeIdx = p.indexOf("Exchange hashpartitioning(grp")
      val partialIdx = p.indexOf("PartialTopK")
      assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
        s"PartialTopK must sit below the hash exchange:\n$p")
    }
  }
}
