package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HashFunctions => H}

/** Relational engine core (SURVEY.md §2.A).
  *
  * TPC-H-shaped analytics queries proving scan/filter/join/agg/window
  * semantics at scale. Scale notes per query inline: dims are
  * broadcast, aggregations are partial (map-side combine comes free
  * with groupBy on declarative plans), top-k never does a global sort
  * (TakeOrderedAndProject or per-group window after hash repartition).
  *
  * Every query sorts by a unique key and rounds float aggregates (2dp
  * for money sums, 4dp for averages) so the DuckDB oracle hash-match
  * is robust to accumulation-order differences.
  */
object EngineQueries {

  /** TPC-H Q1 shape: scan + filter + groupBy agg. Pure map-side
    * partial agg on 6 columns; scan should prune to ReadSchema of 7
    * columns and push the shipdate filter. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Selective filter + narrow projection: the point is pushdown.
    * PushedFilters must show p_size + p_brand; ReadSchema only 4 cols. */
  def q2FilterPushdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_size" >= 10 && $"p_size" <= 15 && $"p_brand" === "Brand#12")
      .select($"p_partkey", $"p_name", $"p_size", round($"p_retailprice", 2).as("p_retailprice"))
      .orderBy($"p_partkey")
  }

  /** TPC-H Q3 shape: 3-way join + agg + top-10. customer is the small
    * side (1.5k rows/SF) -> broadcast; orders⋈lineitem shuffles on
    * orderkey only. Global top-k via orderBy.limit =
    * TakeOrderedAndProject (no full sort at scale). */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: star join. region/nation/supplier/customer are
    * dims -> broadcast; only orders⋈lineitem is a shuffle join. */
  def q5StarJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asia = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nat = Tables.nation(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q6 shape: scan-heavy conditional agg, fully pushed filters,
    * single-row result — the whole query is one codegen stage. */
  def q6ScanAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
           count(lit(1)).as("n"))
  }

  /** Window functions: top-3 orders per customer by price. Tie-broken
    * by o_orderkey so row_number is deterministic. One shuffle on
    * o_custkey; no global sort until the final (small) output. */
  def q7Window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"),
              row_number().over(w).as("rnk"),
              round(lag($"o_totalprice", 1).over(w), 2).as("prev_price"))
      .filter($"rnk" <= 3)
      .orderBy($"o_custkey", $"rnk")
  }

  /** Multi-level agg via ROLLUP on (priority, status). */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Semi + anti join: customers with at least one order but none in
    * status 'F'. Both sides shuffle on custkey; at scale the orders
    * side is pre-aggregated by the semi/anti join itself. */
  def q9SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    cust
      .join(ord, $"c_custkey" === $"o_custkey", "left_semi")
      .join(ord.filter($"o_orderstatus" === "F"),
            $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Top-k per group: 5 priciest parts per brand. Window after a
    * single hash repartition on p_brand — the building block reused by
    * the ANN operators. */
  def q10TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.part(spark, dir)
      .select($"p_brand", $"p_partkey", round($"p_retailprice", 2).as("price"),
              row_number().over(w).as("rnk"))
      .filter($"rnk" <= 5)
      .orderBy($"p_brand", $"rnk")
  }

  /** Exact distinct counts (the approx_count_distinct twin lives in
    * the bench path; oracle covers the exact side). */
  def q11Distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .agg(countDistinct($"o_custkey").as("distinct_cust"),
           countDistinct($"o_orderpriority").as("distinct_prio"),
           count(lit(1)).as("total"))
  }

  /** Sessionization: 30-min-gap sessions per user via lag + windowed
    * sum. One shuffle on user_id; at 100 TB this is the canonical
    * "sessionize clickstream" shape (or mapGroupsWithState when
    * streaming — see graft.streaming). */
  def q12EventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id",
              lag($"ts", 1).over(w).as("prev_ts"))
      .select($"user_id",
              when($"prev_ts".isNull ||
                   unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1)
                .otherwise(0).as("new_session"))
      .groupBy($"user_id")
      .agg(sum($"new_session").as("sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Event funnel view->click->purchase per user (min-timestamp
    * ordering), plus converted flag. Single shuffle on user_id. */
  def q13EventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("first_view"),
        min(when($"event_type" === "click", $"ts")).as("first_click"),
        min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
      .select($"user_id",
        ($"first_view".isNotNull && $"first_click".isNotNull &&
         $"first_purchase".isNotNull &&
         $"first_view" < $"first_click" && $"first_click" < $"first_purchase")
          .cast("int").as("converted"))
      .orderBy($"user_id")
  }

  /** JSON extraction from events.props (semi-structured column) +
    * agg. get_json_object is codegen'd; no UDF. */
  def q14JsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
              get_json_object($"props", "$.k").cast("long").as("k"),
              $"value")
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), round(avg($"k"), 4).as("avg_k"),
           round(sum($"value"), 4).as("sum_value"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Exact interpolated percentiles per group (the distribution-shape
    * query every pipeline-health dashboard needs). Spark's percentile
    * and DuckDB's quantile_cont share the same linear-interpolation
    * definition, so this stays oracle-checkable; scalar columns per
    * quantile keep the output array-free. At scale: one shuffle on
    * the group key; exact percentile holds per-group sorted buffers —
    * swap to approx_percentile when groups grow past memory. */
  def q15Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q4 shape: priority counts for a date window of orders
    * having at least one late-shipped line — a correlated EXISTS
    * whose extra inequality rides inside the semi join condition, so
    * the probe side short-circuits on first match and no lineitem
    * columns survive the join. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01") &&
              $"o_orderdate" < lit("1996-04-01"))
    o.join(Tables.lineitem(spark, dir),
        $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Full CUBE over two dimensions (rollup's lattice completion —
    * q8 covers ROLLUP; CUBE adds the cross-dimension subtotals).
    * Same shuffle shape: one exchange on the expanded grouping keys
    * with map-side partial aggregation. */
  def q16Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Explicit GROUPING SETS — the general lattice q8 (ROLLUP) and
    * q16 (CUBE) specialize: per-priority and per-status subtotals
    * plus the grand total in ONE pass. Plans as a single Expand +
    * one keyed exchange with map-side partial aggregation — never a
    * union of repeated scans. */
  def q17GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq($"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
        $"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** AS-OF join — the time-series lookup Spark has no native operator
    * for (DuckDB/kdb/QuestDB ship it built-in): for each probe row,
    * the latest event at or before its timestamp, per key. Plan: tag
    * both sides, union, ONE shuffle on the key, and a running
    * `last(ignoreNulls)` over (time, tag) — events sort before
    * probes at equal timestamps, giving inclusive <= semantics. This
    * is the standard distributed as-of: no per-row binary search, no
    * inequality join (which Spark would plan as a broadcast nested
    * loop), cost = one exchange + one per-key sort, identical shape
    * at 100 TB. Events are pre-aggregated to one row per (key, ts)
    * so tie-breaks are deterministic on both engines. */
  def q18AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // probe side: one lookup per order, mapped into the events
    // stream's key/time domain (o_custkey -> user, orderkey -> hour)
    val probes = Tables.orders(spark, dir).select(
      $"o_orderkey",
      pmod($"o_custkey", lit(150)).as("user_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, cast(o_orderkey % 720 as int), 0, 0)").as("t"))
    val ev = Tables.events(spark, dir)
      .groupBy($"user_id", $"ts".as("t"))
      .agg(max($"event_id").as("event_id"))
    val tagged = ev
      .select($"user_id", $"t", lit(0).as("tag"), $"event_id",
              lit(null).cast("long").as("o_orderkey"))
      .unionByName(probes
        .select($"user_id", $"t", lit(1).as("tag"),
                lit(null).cast("long").as("event_id"), $"o_orderkey"))
    val w = Window.partitionBy($"user_id").orderBy($"t", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_event_id", last($"event_id", ignoreNulls = true).over(w))
      .filter($"tag" === 1 && $"last_event_id".isNotNull)
      .select($"o_orderkey", $"user_id", $"last_event_id")
      .orderBy($"o_orderkey")
  }

  /** Binned RANGE join — interval containment between two large
    * tables. The naive `e.ts BETWEEN r.start AND r.end` join has no
    * equi-key, so Spark plans a broadcast-nested-loop (O(n*m), OOM
    * at scale). Binning fixes it: each range explodes into the day
    * bins it covers (bounded fanout = range length / bin width),
    * events map to their day bin, and the join becomes an EQUI-join
    * on (key, bin) — one hash shuffle — with the exact range
    * predicate re-applied as a cheap post-filter. The standard
    * interval-join strategy in every streaming/temporal engine. */
  def q19RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = Tables.orders(spark, dir).select(
        $"o_orderkey",
        pmod($"o_custkey", lit(150)).as("user_id"),
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, cast(o_orderkey % 27 as int), 0, 0, 0)").as("r_start"),
        (lit(1) + pmod($"o_orderkey", lit(3))).cast("int").as("d_days"))
      .withColumn("r_end", expr("r_start + make_interval(0, 0, 0, d_days, 0, 0, 0)"))
    val binned = ranges
      .select($"o_orderkey", $"user_id", $"r_start", $"r_end",
              explode(expr("sequence(0, d_days - 1)")).as("off"))
      .withColumn("bin", expr("date_add(cast(r_start as date), off)"))
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"ts", to_date($"ts").as("bin"))
    // PRE-AGGREGATE events per (user_id, bin) before the fanout join:
    // the (key, bin) equi-join then carries ONE row per touched bin
    // instead of one per event — the join input shrinks by the
    // per-bin event multiplicity (the dominant factor at scale).
    // Exactness is preserved by per-bin min/max stats: a bin whose
    // events all fall inside [r_start, r_end) contributes its count
    // outright; only bins the stats can't resolve (range boundary
    // cuts through the bin's event span) re-join the raw events —
    // empty for day-aligned ranges, and never more than the two
    // boundary bins of a range otherwise.
    val evAgg = ev.groupBy($"user_id", $"bin")
      .agg(count(lit(1)).as("n_bin"),
           min($"ts").as("ts_min"), max($"ts").as("ts_max"))
    val joined = binned.join(evAgg, Seq("user_id", "bin"))
    val fullIn = $"ts_min" >= $"r_start" && $"ts_max" < $"r_end"
    val fullOut = $"ts_max" < $"r_start" || $"ts_min" >= $"r_end"
    val resolved = joined.filter(fullIn)
      .select($"o_orderkey", $"n_bin".as("n"))
    val straddling = joined.filter(!fullIn && !fullOut)
      .select($"o_orderkey", $"user_id", $"bin", $"r_start", $"r_end")
    val residual = straddling.join(ev, Seq("user_id", "bin"))
      .filter($"ts" >= $"r_start" && $"ts" < $"r_end")
      .select($"o_orderkey", lit(1L).as("n"))
    resolved.unionByName(residual)
      .groupBy($"o_orderkey")
      .agg(sum($"n").as("n_events"))
      .orderBy($"o_orderkey")
  }

  /** q20: correlated scalar subquery, decorrelated — "orders above
    * the customer's own average order value" (the TPC-H Q17/Q20
    * inner-query shape). SQL writes `o_totalprice > (SELECT avg(...)
    * WHERE o2.o_custkey = o.o_custkey)`; the Spark-first plan is the
    * decorrelation every optimizer targets: ONE window aggregate
    * over the o_custkey partition, no self-join, no per-row
    * subquery — one hash exchange total. Output rounds money to 2dp;
    * the filter compares raw doubles in both engines. */
  def q20Correlated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        avg($"o_totalprice").over(w).as("cust_avg"))
      .filter($"o_totalprice" > $"cust_avg")
      // cust_avg itself is NOT emitted: a repeating-decimal average
      // can land on a .xx5 rounding boundary where Spark and DuckDB
      // disagree by an ulp — the filter uses the raw double, the
      // output keeps only exactly-representable columns
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice", 2).as("o_totalprice"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** q21: TPC-H Q21 shape ("suppliers who kept orders waiting")
    * adapted to this schema — sole-blame suppliers: R-flagged line
    * items of finished orders where the order involved MULTIPLE
    * suppliers but no OTHER supplier has an R line. SQL states it as
    * a correlated EXISTS + NOT EXISTS pair over lineitem (the oracle
    * keeps that form); the Spark-first plan DECORRELATES both into
    * ONE per-order aggregate — distinct suppliers, distinct
    * R-flagged suppliers — joined back on l_orderkey. Two scans of
    * the filtered fact, one exchange each on l_orderkey, supplier
    * dim broadcast; never a per-row subquery or a triple lineitem
    * self-join. */
  def q21SoleBlame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fOrders = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    // persisted (tracked): the F-order line items feed both the
    // per-order supplier stats and the blamed-line scan
    val li = graft.Caches.persist(
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
        .join(fOrders, $"l_orderkey" === $"o_orderkey", "left_semi"))
    val ordStats = li.groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
           countDistinct(when($"l_returnflag" === "R", $"l_suppkey")).as("n_supp_r"))
    li.filter($"l_returnflag" === "R")
      .join(ordStats.filter($"n_supp" > 1 && $"n_supp_r" === 1), Seq("l_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  /** q22: TPC-H Q22 shape — wealthy customers gone quiet: account
    * balance above the global positive average AND no order since
    * the cutoff, aggregated per nation. The global average is ONE
    * scalar broadcast back (never a partition-less window); "no
    * recent order" is a LEFT ANTI join against the recent orders'
    * distinct customer keys; nation is a broadcast dim. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg(avg($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey").distinct()
    cust.crossJoin(broadcast(avgBal))
      // raw-double comparison on both sides; avg_bal itself is never
      // emitted (see q20's rounding-boundary note)
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("total_bal"))
      .orderBy($"n_name")
  }

  /** q23: TPC-H Q18 shape — large-volume orders: orders whose total
    * line quantity exceeds 300, with customer detail. SQL states it
    * as an IN over a grouped-HAVING subquery plus a second outer
    * aggregate (the oracle keeps that form); the Spark-first plan
    * computes the per-order quantity aggregate ONCE — shuffle on
    * l_orderkey, map-side partial sums — filters the survivors, and
    * joins them to orders with the customer dim broadcast. The
    * HAVING subquery and the output column collapse into the same
    * aggregate, so lineitem is scanned once, not twice. Quantities
    * are whole numbers, so the sums are FP-exact and the >300
    * boundary is engine-stable. */
  def q23LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 300.0)
    Tables.orders(spark, dir)
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        round($"o_totalprice", 2).as("o_totalprice"),
        round($"sum_qty", 2).as("sum_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  /** q24: rolling 7-day revenue per customer — a RANGE-frame window
    * (every frame bound is an event-time offset, not a row count;
    * the frame a rows-frame can NOT express when order counts per
    * day vary). Spark's rangeBetween needs a numeric ordering
    * column, so the frame rides epoch seconds with a ±7-day offset —
    * exactly how an event-time sliding aggregate deploys at scale:
    * one hash exchange on o_custkey, one sort per partition, frames
    * evaluated by two moving pointers (no per-row rescan). Peers
    * with the same timestamp share a frame in both engines by RANGE
    * semantics. */
  def q24RollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"ts")
      .rangeBetween(-7L * 86400, 0)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        unix_timestamp($"o_orderdate").as("ts"))
      .withColumn("rev_7d", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice", 2).as("o_totalprice"), $"rev_7d")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** q25: distinct-count SKETCH — HyperLogLog (Flajolet et al. 2007)
    * with m=256 registers, built from md5 nibbles so the WHOLE sketch
    * replays in DuckDB: register = first 2 hex nibbles (8 bits), rho =
    * leading-zero count of the next 52 bits + 1, register merge =
    * max(rho) (the HLL union — the same merge that combines per-
    * partition sketches on a cluster), estimate = αm·m²/Σ2^-Mj with
    * the small-range ln correction. THIS is how distinct-counting
    * survives 100 TB: the shuffle carries 256 ints instead of every
    * distinct key, partial maxes combine map-side, and sketches from
    * different days/partitions union losslessly. Exact distinct rides
    * alongside so the artifact shows the observed error (~1.04/√m ≈
    * 6.5% standard error). Every arithmetic step (the α constant
    * included) is written as the same IEEE op sequence in both
    * engines; 2^-Mj terms fold in register order. */
  /** The HLL register build over any single-column key frame: md5 the
    * key, first 2 hex nibbles pick the register, rho = leading-zero
    * bits of the next 52 + 1, merge = max(rho) per register. Exposed
    * so the mergeability spec can prove sketch(A∪B) ==
    * merge(sketch(A), sketch(B)) — the property that lets partial
    * sketches union across partitions/days at 100 TB. */
  private[graft] def hllRegistersOf(keys: DataFrame): DataFrame = {
    import keys.sparkSession.implicits._
    // The first 15 md5 nibbles as ONE 60-bit int via codegen'd conv:
    // the top 8 bits are the register (== the first two nibbles), the
    // low 52 feed a leading-zero when-ladder (== the nibble-wise
    // first-nonzero scan). Bit-identical to the original interpreted
    // array-HOF build — the DuckDB replay is untouched — but the hot
    // path stays inside whole-stage codegen (measured 9.3s -> ~0.6s
    // for 600k keys; array HOFs have no doGenCode and cost ~15µs/row
    // when the estimate is actually consumed downstream).
    withHllRegRho(keys.toDF("k"), col("k"))
      .groupBy($"register").agg(max($"rho").as("mj"))
  }

  /** Append per-row HLL (register, rho) columns for `key` — the
    * per-event form streaming state (st12) shares with the batch
    * sketch above. */
  private[graft] def withHllRegRho(df: DataFrame,
                                   key: Column): DataFrame = {
    import df.sparkSession.implicits._
    val withV = df
      .withColumn("_h", md5(key.cast("string")))
      .withColumn("_v", conv(substring($"_h", 1, 15), 16, 10).cast("long"))
    val w = $"_v".bitwiseAND(lit((1L << 52) - 1))
    var bitlen: Column = lit(0)
    for (nb <- 1 to 52)
      bitlen = when(w >= lit(1L << (nb - 1)), lit(nb)).otherwise(bitlen)
    withV
      .withColumn("register", shiftright($"_v", 52).cast("int"))
      .withColumn("rho", (lit(53) - bitlen).cast("int"))
      .drop("_h", "_v")
  }

  /** The αm bias-corrected estimate over a (register, mj) frame —
    * one row, column `e`. Shared by q25 and the facade's
    * approxDistinct. */
  private[graft] def hllEstimateOf(regs: DataFrame): DataFrame = {
    import regs.sparkSession.implicits._
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0)
    regs
      .agg(array_sort(collect_list(struct($"register", $"mj"))).as("rm"),
           count(lit(1)).cast("double").as("present"))
      .select(aggregate(transform($"rm", p => pow(lit(2.0), -p("mj"))),
                        lit(0.0), _ + _).as("inv_present"),
              (lit(256.0) - $"present").as("zeros"))
      .select((alphaM2 / ($"inv_present" + $"zeros")).as("e_raw"), $"zeros")
      .select(when($"e_raw" <= lit(2.5 * 256) && $"zeros" > 0,
                   lit(256.0) * log(lit(256.0) / $"zeros"))
                .otherwise($"e_raw").as("e"))
  }

  def q25HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey")
    val sketch = hllEstimateOf(hllRegistersOf(li))
    sketch.crossJoin(li.agg(countDistinct($"l_orderkey").as("exact_distinct")))
      .select(round($"e", 4).as("approx_distinct"), $"exact_distinct",
        round(abs($"e" / $"exact_distinct" - 1.0) * 100.0, 2).as("err_pct"))
  }

  /** q26: Pareto cut — the smallest prefix of customers (by revenue,
    * descending) that covers 80% of total revenue. Composes the two
    * window modes the engine serves: a per-customer aggregate, a
    * CUMULATIVE rows-frame sum over the revenue-descending order, and
    * the grand total as one scalar broadcast (never a partition-less
    * window over the full frame). The boundary customer (the one that
    * crosses 80%) is included — `cum - rev < 0.8 * total`. Cumulative
    * share is recomputed from exact 2dp-rounded parts in the output;
    * Per-customer revenue is rounded to 2dp BEFORE any ordering or
    * accumulation, so both engines fold bit-identical values in the
    * same sorted sequence — every downstream double is then
    * engine-identical by construction, not by rounding luck. */
  def q26ParetoCut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("rev"))
    val total = rev.agg(sum($"rev").as("total_rev"))
    val w = Window.orderBy($"rev".desc, $"o_custkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.crossJoin(broadcast(total))
      .withColumn("cum", sum($"rev").over(w))
      .filter($"cum" - $"rev" < lit(0.8) * $"total_rev")
      .select($"o_custkey", $"rev",
        round($"cum" / $"total_rev" * 100.0, 4).as("cum_share_pct"))
      .orderBy($"cum_share_pct", $"o_custkey")
  }

  /** The Count-Min sketch cell build (Cormode & Muthukrishnan 2005)
    * over any single-column integer-key frame: d=4 hash rows ×
    * w=4096 buckets, the bucket picked by the same multiplicative
    * hash family the minhash kernel uses — ((a_j·(k mod p) + b_j)
    * mod p) mod w with p=2^31-1 — pure codegen int64 arithmetic
    * (no md5/string ops on the 4×N hot path) that replays exactly
    * in DuckDB. Cells combine map-side (groupBy count) and two
    * sketches union by per-cell ADDITION — the linearity that lets
    * per-day/per-partition sketches merge at 100 TB (mergeability
    * spec proves it). Exposed for that spec, like
    * [[hllRegistersOf]]. */
  private val (cmA, cmB) = H.permConstants(4)

  private[graft] def cmCellsOf(keys: DataFrame): DataFrame = {
    import keys.sparkSession.implicits._
    cmBuckets(keys).groupBy($"j", $"bucket").agg(count(lit(1)).as("c"))
  }

  /** (key, hash row j, bucket) triples — the shared bucket arithmetic
    * of the build (all rows) and the probe (distinct keys). */
  private def cmBuckets(keys: DataFrame): DataFrame = {
    import keys.sparkSession.implicits._
    val arms = (0 until 4).map { j =>
      struct(lit(j).as("j"),
        (((lit(cmA(j)) * ($"k" % 2147483647L) + lit(cmB(j))) % 2147483647L)
          % 4096L).cast("int").as("bucket"))
    }
    keys.toDF("k").select($"k", explode(array(arms: _*)).as("jb"))
      .select($"k", $"jb.j".as("j"), $"jb.bucket".as("bucket"))
  }

  /** q27: heavy hitters — the Count-Min sketch next to q25's HLL.
    * Which parts appear unusually often in lineitem:
    *
    *   1. CM cells (4×4096 ints) built with map-side combine — the
    *      shuffle carries ≤16k cells per partition, never the keys;
    *   2. threshold = 1.4× the mean key frequency N/D, with D taken
    *      exactly off the SAME distinct-key frame the probe stage
    *      already materializes — the denominator costs nothing extra;
    *   3. candidates = distinct keys whose CM estimate ≥ threshold,
    *      decided against the BROADCAST sketch (CM overestimates only
    *      → no false negatives, the one-sided error that makes the
    *      prune safe);
    *   4. exact verify counts ONLY candidate occurrences (broadcast
    *      semi-join before the keyed agg) — at 100 TB the verify
    *      shuffle carries the heavy tail, not the whole key stream.
    *
    * Every count is an integer and the one double (the threshold)
    * follows the identical IEEE op sequence in DuckDB, so the
    * artifact hash-matches with zero rounding slack. */
  def q27HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted (tracked): one column scan feeds the count, the CM
    // cells, and the probe/verify passes
    val keys = graft.Caches.persist(
      Tables.lineitem(spark, dir).select($"l_partkey".as("k")))
    val cells = cmCellsOf(keys)
    // persisted (tracked): the distinct key set feeds the threshold
    // count AND the probe — the exact mean-frequency denominator is
    // free because the probe already enumerates the keys
    val dk = graft.Caches.persist(keys.distinct())
    val thr = keys.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(dk.agg(count(lit(1)).cast("double").as("d")))
      .select(($"n" / $"d" * lit(1.4)).as("thr"))
    val est = cmBuckets(dk)
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy($"k").agg(min($"c").as("est"))
    // persisted (tracked): cand feeds BOTH the verify semi-join and
    // the final join — without it each broadcast re-runs the whole
    // sketch lineage from scratch
    val cand = graft.Caches.persist(
      est.crossJoin(broadcast(thr)).filter($"est" >= $"thr"))
    val exact = keys
      .join(broadcast(cand.select($"k")), Seq("k"), "left_semi")
      .groupBy($"k").agg(count(lit(1)).as("cnt"))
    exact.join(broadcast(cand), "k")
      .filter($"cnt" >= $"thr")
      .select($"k".as("l_partkey"), $"cnt", $"est",
        round($"thr", 4).as("threshold"))
      .orderBy($"cnt".desc, $"l_partkey")
  }

  /** Bloom-filter hash family: k=3 multiplicative arms over m=8192
    * bits (≈1.2 bits/key/arm at the sf build-side cardinality; the
    * 100 TB deployment sizes m off the build-side count the same
    * way Spark's own runtime filter does). Same int64 arithmetic as
    * the CM sketch — replays exactly in DuckDB. */
  private val (bfA, bfB) = H.permConstants(3)

  private def bloomPos(k: Column, j: Int): Column =
    ((lit(bfA(j)) * (k % 2147483647L) + lit(bfB(j))) % 2147483647L) % 8192L

  /** q28: Bloom-pruned join — the explicit form of the runtime row-
    * level filter (Spark's `runtime.bloomFilter`): build a Bloom
    * sketch of the dimension keys that survive the region filter,
    * prune the fact scan BEFORE any join shuffle, then verify
    * exactly. At 100 TB the win is that the probe-side filter is a
    * map-side codegen predicate against a BROADCAST bit set — the
    * join shuffle carries only true matches plus the measured
    * false-positive tail, never the full fact table. The artifact
    * exposes the sketch's accounting (probe/pass/true counts + FP
    * rate), so the oracle must replay the bit arithmetic arm for
    * arm — a pass-through join result would let a wrong sketch hide
    * behind the exact verify. Membership = three chained left-semi
    * joins on the distinct bit-position set (≤8192 rows, broadcast);
    * Bloom semantics (all k arms present), no row-id bookkeeping. */
  def q28BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted (tracked): the build keys feed the bit set AND the
    // exact verify
    val buildKeys = graft.Caches.persist(
      Tables.supplier(spark, dir)
        .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
        .join(Tables.region(spark, dir).filter($"r_name" === "EUROPE"),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey"))
    val bits = graft.Caches.persist(buildKeys
      .select(explode(array(
        (0 until 3).map(j => bloomPos($"s_suppkey", j)): _*)).as("pos"))
      .distinct())
    val li = Tables.lineitem(spark, dir).select($"l_suppkey", $"l_extendedprice")
    var passed = li
    for (j <- 0 until 3)
      passed = passed.join(broadcast(bits.withColumnRenamed("pos", "p")),
        bloomPos($"l_suppkey", j) === $"p", "left_semi")
    val nProbe = li.agg(count(lit(1)).as("n_probe"))
    val nPass = passed.agg(count(lit(1)).as("n_pass"))
    val trueSide = li
      .join(broadcast(buildKeys), $"l_suppkey" === $"s_suppkey", "left_semi")
      .agg(count(lit(1)).as("n_true"),
        round(sum($"l_extendedprice"), 2).as("matched_revenue"))
    nProbe.crossJoin(nPass).crossJoin(trueSide)
      .select($"n_probe", $"n_pass", $"n_true", $"matched_revenue",
        when($"n_probe" === $"n_true", lit(0.0))
          .otherwise(round(($"n_pass" - $"n_true").cast("double")
            / ($"n_probe" - $"n_true") * 100.0, 4)).as("fp_pct"))
  }

  /** Per-row discounted volume in INTEGER CENTS: price and discount
    * are 2dp-exact, so cents×basis-points is exact int64 and the
    * sub-cent truncates by integer `div` — every accumulation is
    * then associative integer addition, bit-equal in any engine and
    * ANY order (c15's fixed-point rule; a per-row 2dp float round
    * still drifts a cent when thousands of parts sum in different
    * orders). */
  private def volCents: Column =
    expr("""(cast(round(l_extendedprice * 100.0, 0) as bigint)
           | * (100 - cast(round(l_discount * 100.0, 0) as bigint)))
           | div 100""".stripMargin)

  /** q29: TPC-H Q8 shape — a supplier nation's market share inside
    * one region's market, by year. Five-way star join where BOTH
    * ends of the fact table resolve through the same dimension
    * (nation twice, disambiguated by projection rename, never a
    * self-join hint): customer side gates the market (region
    * filter), supplier side labels the competitor. All four dims
    * broadcast under AQE; the only shuffle is the o_year groupBy.
    * The share is a conditional-sum ratio computed inside one
    * aggregate pass — no second scan, no join of two aggregates. */
  def q29MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val custNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("cn_key"), $"n_regionkey".as("cn_region"))
    val suppNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(custNation, $"c_nationkey" === $"cn_key")
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"cn_region" === $"r_regionkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(suppNation, $"s_nationkey" === $"sn_key")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        round(sum(when($"supp_nation" === "NATION_2", volCents)
          .otherwise(lit(0L))).cast("double")
          / sum(volCents).cast("double") * 100.0, 4).as("mkt_share_pct"),
        round(sum(volCents).cast("double") / 100.0, 2).as("total_volume"))
      .orderBy($"o_year")
  }

  /** q30: TPC-H Q14 shape — promo revenue share as a monthly time
    * series. lineitem joins the part dim (broadcast) and aggregates
    * by ship month; the promo/total ratio is a conditional sum in
    * the same pass. The canonical "campaign effectiveness" scan: at
    * 100 TB it is one fact-table pass, one broadcast, one
    * partial-aggregated shuffle on ~hundreds of month keys. */
  def q30PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .groupBy(date_trunc("month", $"l_shipdate").as("ship_month"))
      .agg(
        round(sum(when($"p_type" === "PROMO", volCents).otherwise(lit(0L)))
          .cast("double") / sum(volCents).cast("double") * 100.0, 4)
          .as("promo_pct"),
        round(sum(volCents).cast("double") / 100.0, 2).as("total_volume"))
      .orderBy($"ship_month")
  }

  /** q31: TPC-H Q7 shape — bilateral shipping volume between two
    * nations by year: supplier in one, customer in the other, both
    * directions kept as separate groups. The OR-of-two-directions
    * predicate lands AFTER the nation joins as a codegen filter on
    * two broadcast-resolved labels — never a UNION of two
    * fact-table scans. */
  def q31VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val custNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
    val suppNation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(custNation, $"c_nationkey" === $"cn_key")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(suppNation, $"s_nationkey" === $"sn_key")
      .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_8")
        || ($"supp_nation" === "NATION_8" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(round(sum(volCents).cast("double") / 100.0, 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** q32: TPC-H Q15 shape — top supplier(s) by quarterly revenue:
    * aggregate a date-sliced fact scan per supplier, take the max as
    * one broadcast scalar, keep every supplier hitting it (ties
    * preserved, as in Q15's view formulation). Integer-cent volume
    * end to end — the max comparison is long vs long, so the
    * tie edge case is exact, not float-blurred. Scan → one keyed
    * agg → broadcast scalar filter → dim join for the name. */
  def q32TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1997-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(volCents).as("total_cents"))
    val top = rev.agg(max($"total_cents").as("max_cents"))
    rev.crossJoin(broadcast(top))
      .filter($"total_cents" === $"max_cents")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        round($"total_cents".cast("double") / 100.0, 2).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** q33: TPC-H Q17 shape — revenue that would be lost by refusing
    * small orders: lineitems of one brand's parts whose quantity is
    * under 20% of that part's own average. The correlated scalar
    * subquery (avg per part, re-evaluated per row in the textbook
    * form) is decorrelated to ONE aggregate over the brand's
    * lineitems joined back — and the brand filter prunes via a
    * broadcast semi shape BEFORE either aggregate touches the fact
    * table, so the per-part avg is computed only for the ~1/25 of
    * parts that can matter. Integer-cent revenue (volCents rule). */
  def q33SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brandParts = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#23").select($"p_partkey")
    val brandItems = graft.Caches.persist(
      Tables.lineitem(spark, dir)
        .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
        .select($"l_partkey", $"l_quantity",
          expr("cast(round(l_extendedprice * 100.0, 0) as bigint)")
            .as("price_cents")))
    val cuts = brandItems.groupBy($"l_partkey")
      .agg((avg($"l_quantity") * 0.2).as("qty_cut"))
    brandItems.join(cuts, "l_partkey")
      .filter($"l_quantity" < $"qty_cut")
      .agg(round(sum($"price_cents").cast("double") / 100.0 / 7.0, 2)
        .as("avg_yearly"))
  }

  /** q34: TPC-H Q19 shape — revenue under an OR-of-ANDs predicate
    * spanning both join sides (three brand/size/quantity bands). The
    * single-side conjuncts (p_size bounds, quantity bounds, brand
    * IN-list) are what Catalyst's constraint extraction pushes to
    * each scan, so the join probes only band-eligible rows; the
    * cross-side disjunction evaluates post-join as one codegen
    * filter. The canonical "complex promo eligibility" scan. */
  def q34Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
          $"l_quantity".between(20, 30)))
      .agg(coalesce(sum(volCents), lit(0L)).as("rev_cents"))
      .select(round($"rev_cents".cast("double") / 100.0, 2).as("revenue"))
  }

  /** q35: TPC-H Q13 shape — customer order-count distribution: how
    * many customers placed 0, 1, 2, … qualifying orders (urgent
    * orders excluded as the stand-in for Q13's comment filter). SQL
    * states it as a LEFT OUTER join then a double aggregate; the
    * Spark-first plan aggregates orders per custkey FIRST (map-side
    * partial counts — the shuffle carries one row per customer, not
    * one per order) and left-joins customer to the counts, keeping
    * zero-order customers via coalesce. The second aggregate groups
    * on the tiny count domain. */
  def q35OrderCountDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnts = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir)
      .select($"c_custkey")
      .join(cnts, $"c_custkey" === $"o_custkey", "left")
      .select(coalesce($"n_orders", lit(0L)).as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** q36: TPC-H Q16 shape — supplier diversity per part class:
    * distinct suppliers shipping each (brand, size) combination in a
    * size IN-list, excluding one brand and excluding suppliers on a
    * denylist (negative account balance stands in for Q16's
    * complaints subquery). The NOT IN is a LEFT ANTI join against
    * the tiny denylist (broadcast — s_suppkey is never null so anti
    * ≡ NOT IN); the part dim is broadcast with brand/size predicates
    * pushed into its scan; the only exchange is the
    * countDistinct's. */
  def q36SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29)
    val deny = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey")
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey")
      .join(deny, $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_brand" =!= "Brand#5" && $"p_size".isin(sizes: _*))
          .select($"p_partkey", $"p_brand", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
  }

  /** q37: TPC-H Q2 shape — cheapest supplier per part: for parts in
    * a size band, the supplier(s) whose best observed unit price (min
    * line extendedprice, exact cents) equals the part's global
    * minimum. SQL states the per-part minimum as a correlated scalar
    * subquery (the oracle keeps that form); the Spark-first plan
    * decorrelates it into ONE pass: repartition the fact by
    * l_partkey, per-(part, supplier) min — the composite-key
    * aggregate reuses the partkey partitioning (HashPartitioning on
    * partkey already clusters every (part, supplier) pair) — then a
    * min window over the SAME partitioning, so the whole
    * agg+window+filter chain runs on one exchange. The size-band
    * part dim broadcasts and prunes the fact before any shuffle. */
  def q37MinCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val parts = Tables.part(spark, dir)
      .filter($"p_size".between(10, 15))
      .select($"p_partkey", $"p_name")
    val costs = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        expr("cast(round(l_extendedprice * 100.0, 0) as bigint)").as("price_cents"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .repartition($"l_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"price_cents").as("cost_cents"), first($"p_name").as("p_name"))
    costs
      .withColumn("best_cents", min($"cost_cents")
        .over(Window.partitionBy($"l_partkey")))
      .filter($"cost_cents" === $"best_cents")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"l_partkey".as("p_partkey"), $"p_name", $"s_name", $"n_name",
        round($"cost_cents".cast("double") / 100.0, 2).as("cost"))
      .orderBy($"p_partkey", $"s_name")
      .limit(100)
  }

  /** q38: TPC-H Q10 shape — returned-item revenue report: the top 20
    * customers by revenue lost to R-flagged returns in one quarter.
    * Fact filtered on returnflag before the join; orders gate the
    * quarter; customer + nation broadcast; revenue accumulated in
    * exact integer cents (volCents) so the top-20 cut is
    * engine-stable; global top-k via TakeOrderedAndProject, never a
    * full sort. */
  def q38ReturnedTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ords = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", volCents.as("vc"))
      .join(ords, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"vc").as("rev_cents"))
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name",
        round($"c_acctbal", 2).as("c_acctbal"),
        round($"rev_cents".cast("double") / 100.0, 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** q39: TPC-H Q9 shape — nation profit by year: for parts in a
    * name class, profit = revenue minus a cost proxy (10% of retail,
    * the schema's stand-in for ps_supplycost), grouped by the
    * SUPPLIER's nation and order year. The one genuine fact-fact
    * join (lineitem ⋈ orders for the year) shuffles on l_orderkey;
    * part (name-filtered), supplier, and nation all broadcast. All
    * money stays integer cents until the final round — the
    * sum-order-independence rule every ratio query here follows. */
  def q39NationProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_name".contains("red"))
      .select($"p_partkey",
        expr("cast(round(p_retailprice * 100.0, 0) as bigint) div 10")
          .as("unit_cost_cents"))
    val amount = Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_suppkey",
        (volCents - $"unit_cost_cents" * $"l_quantity".cast("long"))
          .as("amount_cents"))
    amount
      .join(Tables.orders(spark, dir).select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", $"o_year")
      .agg(round(sum($"amount_cents").cast("double") / 100.0, 2).as("profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  /** q40: TPC-H Q20 shape — excess suppliers: suppliers who shipped
    * MORE than 1.5× the per-part average of a promo part during one
    * year. SQL nests a correlated per-part average inside an IN
    * subquery (the oracle keeps that form); the Spark-first plan is
    * one (part, supplier) aggregate — promo part keys broadcast-semi
    * pruning the fact scan first — with the per-part average as a
    * window over the SAME partitioning, then a distinct-supplier
    * semi join into the broadcast supplier/nation dims. Whole-number
    * quantities keep the 1.5× boundary FP-exact. */
  def q40ExcessSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val promo = Tables.part(spark, dir)
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val qty = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1999-01-01").cast("timestamp"))
      .join(broadcast(promo), $"l_partkey" === $"p_partkey")
      .repartition($"l_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").cast("long").as("qty"))
    val excess = qty
      .withColumn("part_avg", avg($"qty")
        .over(Window.partitionBy($"l_partkey")))
      .filter($"qty" > $"part_avg" * 1.5)
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(excess, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  /** q41: HISTOGRAM QUANTILE SKETCH — the fourth member of the
    * sketch family (q25 HLL = cardinality, q27 CMS = frequency, q28
    * Bloom = membership; this = quantiles): exact percentiles need
    * every group's values in one place (q15's sort), which at 100 TB
    * is the shuffle you refuse; a 128-bin equi-width histogram is
    * MERGEABLE state — per-partition maps combine by cell addition,
    * the shuffle carries 128 longs per group. Two broadcast-scalar
    * passes (min/max, then binned counts), cumulative window over
    * the 128-row-per-group histogram, estimate = upper edge of the
    * first bin whose cumulative count covers the target rank.
    * Emitted NEXT TO the exact q15 kernel with per-quantile error —
    * the q25/q27/d9 sketch-accounting pattern: measure the sketch
    * against truth before trusting it fleet-wide. */
  def q41QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice")
    val ranges = li.groupBy($"l_returnflag")
      .agg(min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"),
           count(lit(1)).as("n"))
    val binned = li.join(broadcast(ranges), Seq("l_returnflag"))
      .select($"l_returnflag", $"n",
        least(floor(($"l_extendedprice" - $"lo") / (($"hi" - $"lo") / 128.0)),
          lit(127.0)).cast("long").as("bin"))
      .groupBy($"l_returnflag", $"n", $"bin")
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"l_returnflag").orderBy($"bin")
    val cum = binned.withColumn("cum", sum($"c").over(w))
    val est = cum
      .join(broadcast(ranges.select($"l_returnflag", $"lo", $"hi")), Seq("l_returnflag"))
      .groupBy($"l_returnflag", $"lo", $"hi")
      .agg(min(when($"cum" >= lit(0.5) * $"n", $"bin")).as("b50"),
           min(when($"cum" >= lit(0.9) * $"n", $"bin")).as("b90"))
      .select($"l_returnflag",
        round($"lo" + ($"b50" + 1L) * (($"hi" - $"lo") / 128.0), 4).as("est_p50"),
        round($"lo" + ($"b90" + 1L) * (($"hi" - $"lo") / 128.0), 4).as("est_p90"))
    val exact = li.groupBy($"l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_p50"),
           round(expr("percentile(l_extendedprice, 0.9)"), 4).as("exact_p90"))
    est.join(exact, Seq("l_returnflag"))
      .select($"l_returnflag", $"est_p50", $"exact_p50",
        round(abs($"est_p50" - $"exact_p50"), 4).as("err_p50"),
        $"est_p90", $"exact_p90",
        round(abs($"est_p90" - $"exact_p90"), 4).as("err_p90"))
      .orderBy($"l_returnflag")
  }

  /** The 32-bit Morton (Z-order) key of two 16-bit coordinates: bit
    * i of x lands at position 2i, bit i of y at 2i+1. The terms are
    * bit-disjoint so integer ADDITION equals OR — every step is a
    * codegen shift/mask, and the same fold replays in ANSI SQL. */
  private[graft] def mortonKey(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** q42: Z-ORDER layout key — the multi-dimensional clustering a
    * lakehouse table needs when queries filter on EITHER of two
    * columns: a sort by (partkey) clusters partkey ranges but
    * scatters suppkey; sorting by the Morton interleave clusters
    * BOTH, so per-file min/max stats prune either predicate (the
    * OPTIMIZE ZORDER BY of Delta/Iceberg, as an engine primitive).
    * The key is pure codegen bit math — a map-only pass — and the
    * global order here is a top-k (TakeOrdered), not a full sort;
    * the write path would range-partition by zkey instead. */
  def q42ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        mortonKey(pmod($"l_partkey", lit(65536L)),
                  pmod($"l_suppkey", lit(65536L))).as("zkey"))
      .orderBy($"zkey", $"l_orderkey", $"l_linenumber")
      .limit(200)
  }

  /** q43: EVENT-RATE ANOMALY detection — the monitoring query every
    * ingestion/crawl pipeline runs over its own event bus: per
    * (event_type, hour) counts, each hour judged against its own
    * TRAILING-24h baseline. The baseline frame is a RANGE window on
    * epoch seconds (q24's event-time frame — trailing 86400s through
    * 3600s ago, so the current hour never smooths its own spike, and
    * empty hours correctly shrink the window rather than sliding
    * over phantom rows). Integer counts make the baseline average
    * exactly determined (long sum / long count), so the 3× spike
    * boundary is engine-stable without rounding tricks; the warm-up
    * guard (≥ 12 baseline hours) keeps cold starts from flagging.
    * One keyed agg + one keyed window — nothing global. */
  def q43RateAnomaly(spark: SparkSession, dir: String): DataFrame =
    rateAnomalyOf(Tables.events(spark, dir))

  /** The q43 core over any (event_type, ts) event frame. */
  def rateAnomalyOf(events: DataFrame, spikeFactor: Double = 3.0,
                    minBaseline: Int = 12): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .select($"event_type", date_trunc("hour", $"ts").as("hour"))
      .groupBy($"event_type", $"hour")
      .agg(count(lit(1)).as("n"))
      .withColumn("m", unix_timestamp($"hour"))
    val w = Window.partitionBy($"event_type").orderBy($"m")
      .rangeBetween(-86400L, -3600L)
    counts
      .withColumn("base_avg", avg($"n").over(w))
      .withColumn("base_n", count($"n").over(w))
      .select($"event_type", $"hour", $"n",
        round(coalesce($"base_avg", lit(0.0)), 4).as("trailing_avg"),
        $"base_n".as("baseline_hours"),
        ($"base_n" >= minBaseline.toLong &&
          $"n" > $"base_avg" * spikeFactor).as("is_spike"))
      .orderBy($"event_type", $"hour")
  }

  /** q44: distribution-rank report — the remaining window-function
    * family next to q7's rank/lag, q24/q43's RANGE frames, and
    * q26's rows-frame cumsum: ntile deciles, percent_rank, and
    * cume_dist per return-flag partition. ntile assigns by ROW
    * POSITION, so the window ordering carries unique tie-break keys
    * (price, orderkey, linenumber) — without them, equal prices
    * land in different buckets per engine and per run. One keyed
    * exchange + one sort; the brand filter broadcasts and prunes
    * the fact scan first. */
  def q44RankReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"price_cents", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter($"p_brand" === "Brand#11").select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
        expr("cast(round(l_extendedprice * 100.0, 0) as bigint)").as("price_cents"))
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"price_cents",
        ntile(10).over(w).cast("long").as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy($"l_returnflag", $"price_cents", $"l_orderkey", $"l_linenumber")
  }

  /** q45: REFERENTIAL-INTEGRITY audit — the data-quality pass every
    * warehouse runs before trusting joins: for each foreign-key
    * edge, child rows vs rows with a matching parent vs orphans.
    * Each edge is one LEFT SEMI (matched) and the orphan count is
    * the complement — the parent key sets broadcast, the fact is
    * scanned once per edge with only the key column read. A healthy
    * synthetic corpus reports zero orphans; the exact matched counts
    * are what the hash gate pins. */
  def q45IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def edge(name: String, child: DataFrame, key: Column,
             parent: DataFrame, pkey: Column): DataFrame = {
      val keys = child.select(key.as("k"))
      val matched = keys.join(broadcast(parent.select(pkey.as("p"))),
        $"k" === $"p", "left_semi")
      keys.agg(count(lit(1)).as("n_child"))
        .crossJoin(matched.agg(count(lit(1)).as("n_matched")))
        .select(lit(name).as("relation"), $"n_child", $"n_matched",
          ($"n_child" - $"n_matched").as("n_orphans"))
    }
    val li = Tables.lineitem(spark, dir)
    edge("lineitem->orders", li, $"l_orderkey",
        Tables.orders(spark, dir), $"o_orderkey")
      .unionAll(edge("lineitem->part", li, $"l_partkey",
        Tables.part(spark, dir), $"p_partkey"))
      .unionAll(edge("lineitem->supplier", li, $"l_suppkey",
        Tables.supplier(spark, dir), $"s_suppkey"))
      .unionAll(edge("orders->customer", Tables.orders(spark, dir), $"o_custkey",
        Tables.customer(spark, dir), $"c_custkey"))
      .unionAll(edge("customer->nation", Tables.customer(spark, dir), $"c_nationkey",
        Tables.nation(spark, dir), $"n_nationkey"))
      .orderBy($"relation")
  }

  /** q46: CONVERSION-LATENCY cohort report — the composite the
    * funnel (q13), enrichment (st5), and percentile (q15) pieces
    * exist for: per customer segment, how long converting users take
    * from first view to first purchase. One keyed aggregate computes
    * each user's first-view/first-purchase timestamps (conditional
    * min — no self-join, no ordered scan), converting users filter
    * map-side, the customer dim broadcasts, and the per-segment
    * percentiles are DISCRETE rank-selects (the latency at rank
    * ceil(q·n) of the sorted group) with the target rank computed in
    * INTEGER arithmetic ((n·9+9) div 10 ≡ ceil(0.9n)) — integer in,
    * integer out, engine-stable by construction. Both float forms
    * failed here first: interpolated percentiles blend repeating
    * decimals whose final rounding digit sits on an ulp boundary,
    * and even ceil(n*0.9) splits engines (a DECIMAL-typed 0.9 is
    * exact where a double 0.9 is not). One keyed
    * window (segment) carries both quantiles. */
  def q46ConversionLatency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val firsts = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("first_view"),
           min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
      .filter($"first_view".isNotNull && $"first_purchase".isNotNull &&
              $"first_purchase" >= $"first_view")
      .select($"user_id",
        (unix_timestamp($"first_purchase") - unix_timestamp($"first_view"))
          .as("latency_s"))
    val wOrd = Window.partitionBy($"c_mktsegment")
      .orderBy($"latency_s", $"user_id")
    val wAll = Window.partitionBy($"c_mktsegment")
    firsts
      .join(broadcast(Tables.customer(spark, dir)), $"user_id" === $"c_custkey")
      .select($"c_mktsegment", $"latency_s", $"user_id")
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_converted"),
           max(when($"rn" <= expr("(n + 1) div 2"), $"latency_s")).as("p50_latency_s"),
           max(when($"rn" <= expr("(n * 9 + 9) div 10"), $"latency_s")).as("p90_latency_s"))
      .orderBy($"c_mktsegment")
  }

  /** q47: SCD2 dimension build — turn a change log into
    * slowly-changing-dimension TYPE-2 history rows: per entity, each
    * run of an unchanged attribute becomes one versioned interval
    * [valid_from, valid_to), open-ended (is_current) on the latest.
    * The standard warehouse backfill every CDC feed (c18's change
    * detection) lands into. Change collapse is a keyed lag-filter,
    * interval close a keyed lead — both windows share the one
    * user_id exchange and its sort (no second shuffle), so at 100 TB
    * the cost is exactly one keyed exchange of the change log.
    * Deterministic: the window order (ts, event_id) is unique. */
  def q47Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2Of(Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("attr")))
  }

  /** The q47 core over any change log with (user_id, ts, event_id,
    * attr) columns — the facade seam a CDC feed lands into. */
  def scd2Of(log: DataFrame): DataFrame = {
    import log.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    log
      .withColumn("prev_attr", lag($"attr", 1).over(w))
      .filter($"prev_attr".isNull || $"attr" =!= $"prev_attr")
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"version", $"attr", $"ts".as("valid_from"),
        $"valid_to", $"valid_to".isNull.as("is_current"))
      .orderBy($"user_id", $"version")
  }

  /** q48: ROBUST OUTLIER detection via median absolute deviation —
    * the data-quality screen that survives the outliers it hunts
    * (mean/stddev z-scores are dragged by the very rows they should
    * flag; the median/MAD pair is 50%-breakdown robust). Per
    * stratum: med = median(x), MAD = median(|x - med|),
    * modified z = 0.6745·(x-med)/MAD
    * (Iglewicz-Hoaglin), flag |z| > 3.5 — over the heavy-tailed
    * events.value metric per event_type stratum. Two tiny stratum
    * aggregates
    * (the q15-verified exact-percentile kernel) broadcast back;
    * flagging is map-only — at 100 TB this is two scans and zero
    * wide shuffles (swap approx_percentile in at real scale, same
    * plan). */
  def q48MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Caches.persist(Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"value"))
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy($"event_type")
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
           first($"med").as("med"))
    // MAD = 0 (≥50% identical values in a stratum) would make every
    // deviating row ±Infinity (and x == med a 0/0 NaN) and pass the
    // filter wholesale — such a stratum has no meaningful robust
    // z-score, so it contributes no outlier rows (guard mirrored in
    // the oracle)
    ev.join(broadcast(mad.filter($"mad" > 0.0)), Seq("event_type"))
      .withColumn("z", lit(0.6745) * ($"value" - $"med") / $"mad")
      .filter(abs($"z") > 3.5)
      .select($"event_type", $"event_id", round($"value", 4).as("value"),
        round($"z", 4).as("robust_z"))
      .orderBy($"event_type", $"event_id")
  }

  /** q49: PIVOT — the wide cross-tab every BI layer asks of an
    * engine: revenue by returnflag pivoted across linestatus columns.
    * The pivot VALUES ARE DECLARED (not discovered): Spark's
    * two-phase pivot with an explicit value list is a single
    * groupBy — no extra distinct-scan to find the columns and no
    * nondeterministic column order; at 100 TB an undeclared pivot
    * pays a full pre-scan and risks a column explosion. Declared
    * values also make the oracle a plain conditional aggregation. */
  def q49Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum($"l_extendedprice"), 2))
      .select($"l_returnflag",
        coalesce($"F", lit(0.0)).as("rev_f"),
        coalesce($"O", lit(0.0)).as("rev_o"))
      .orderBy($"l_returnflag")
  }

  /** q50: UNPIVOT (melt) — the inverse reshape: the wide per-status
    * revenue columns stacked back to (flag, status, revenue) rows.
    * Map-only (each input row emits its column-value pairs; no
    * shuffle at all beyond q49's), the shape a metrics exporter
    * needs when a wide table feeds a long-format sink. */
  def q50Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    q49Pivot(spark, dir)
      .select($"l_returnflag",
        explode(map(lit("F"), $"rev_f", lit("O"), $"rev_o"))
          .as(Seq("status", "revenue")))
      .orderBy($"l_returnflag", $"status")
  }

  /** q51: session PATH analysis — the first-order Markov transition
    * matrix of event types within sessions (the product-analytics
    * staple behind "where do users go after X"): per (from, to)
    * event-type pair, how many adjacent same-session transitions the
    * corpus contains. Session cut = q12's 30-minute gap. One keyed
    * window (user) computes both the predecessor and the gap, so the
    * whole matrix costs one exchange + one small aggregate —
    * transition matrices at 100 TB are exactly this shape. */
  def q51SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("gap_us",
        unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .filter($"prev_type".isNotNull && $"gap_us" <= 1800000000L)
      .groupBy($"prev_type".as("from_type"), $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy($"from_type", $"to_type")
  }

  /** q52: RETENTION COHORTS — the warehouse staple: users grouped by
    * first-activity day (their cohort), tracked by how many are
    * still active N days later. Two keyed aggregates (first-seen per
    * user, then distinct-user counts per (cohort_day, day_offset));
    * the first-seen table joins back BROADCAST at this scale and
    * keyed at 100 TB — either way the matrix is |cohorts|·|offsets|
    * rows, never user-sized. Integer day arithmetic end to end. */
  def q52RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // FLOOR division, not `div`: Spark's div truncates toward zero
    // while the oracle's `//` floors, so pre-1970 timestamps
    // (negative epoch micros) would bucket one day apart. The
    // explicit %-adjust keeps the arithmetic in exact int64 (a
    // float floor(a/b) is correct here but this never rounds).
    val ev = graft.Caches.persist(Tables.events(spark, dir)
      .select($"user_id",
        expr("""unix_micros(ts) div 86400000000
               | - (case when unix_micros(ts) % 86400000000 < 0
               |    then 1 else 0 end)""".stripMargin).as("day")))
    val cohort = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    ev.join(broadcast(cohort), "user_id")
      .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** q53: STUCK-JOB SWEEP — the job-lifecycle state machine an
    * operator runs when a crawl wedges, from the reference's
    * background sweeper (source/repo.go:183 ResetStuckPages: UPDATE
    * status='pending', error='timeout_reset' WHERE
    * status='processing' AND updated_at < cutoff; main.go:118 runs
    * it on a timer) plus the failed-jobs retry accounting
    * (job/repo.go:25 `retries`, job/service.go:31 Retry). Jobs are
    * SYNTHESIZED deterministically from events (no jobs table ships
    * in the test data): status/attempts derived from event_id,
    * updated_at from ts. The sweep verdicts in ONE scan:
    * processing-too-long with attempts remaining → `reset`
    * (status back to pending, error='timeout_reset', attempts+1 —
    * the reference's transition verbatim); processing-too-long with
    * attempts exhausted → `failed` (error='retries_exhausted');
    * everything else untouched. The cutoff is max(ts) − 1 hour — a
    * one-row scalar broadcast (q22's pattern), never now(), so both
    * engines see the same clock. Scale: one scan + one scalar agg;
    * no shuffle beyond the broadcast. */
  def q53StuckJobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statusNames = array(lit("pending"), lit("processing"),
      lit("processing"), lit("completed"), lit("failed"))
    val jobs = Tables.events(spark, dir).select(
      $"event_id".as("job_id"),
      $"user_id".as("source_id"),
      element_at(statusNames, ($"event_id" % 5).cast("int") + 1).as("status"),
      ($"event_id" % 4).cast("int").as("attempts"),
      $"ts".as("updated_at"))
    val cutoff = Tables.events(spark, dir)
      .agg((max($"ts") - expr("INTERVAL 1 HOUR")).as("cutoff"))
    jobs.crossJoin(broadcast(cutoff))
      .withColumn("stuck",
        $"status" === "processing" && $"updated_at" < $"cutoff")
      .select($"job_id", $"source_id", $"status", $"attempts",
        when($"stuck" && $"attempts" < 3, "reset")
          .when($"stuck", "failed")
          .otherwise("untouched").as("verdict"),
        when($"stuck" && $"attempts" < 3, "pending")
          .when($"stuck", "failed")
          .otherwise($"status").as("new_status"),
        when($"stuck" && $"attempts" < 3, $"attempts" + 1)
          .otherwise($"attempts").cast("int").as("new_attempts"),
        when($"stuck" && $"attempts" < 3, "timeout_reset")
          .when($"stuck", "retries_exhausted").as("new_error"))
      .orderBy($"job_id")
  }

  /** The session's FAILED-JOBS store for `dir` — q53's synthesized
    * jobs table (status/attempts off event_id, updated_at off ts)
    * widened with the reference failed_jobs columns (handler routed
    * web/file off event_id parity, error from c14's REAL failure
    * templates, a JSON-ish payload), committed as version 1, then
    * mutated through the two lifecycle ops: [[graft.sources.JobStore
    * .resetStuck]] (version 2 — the stuck sweep APPLIED, not just
    * audited) and [[graft.sources.JobStore.retryJobs]] (version 3 —
    * the transient-error failed set requeued and deleted). Returns
    * (path, requeue batch). Built once per (session, corpus). */
  private[graft] def failedJobsStore(spark: SparkSession, dir: String)
      : (String, DataFrame) =
    graft.TrainedModels.memo(spark, s"failed_jobs:$dir") {
      import spark.implicits._
      val p = java.nio.file.Files
        .createTempDirectory("graft_jobs").toString + "/jobs"
      val statusNames = array(lit("pending"), lit("processing"),
        lit("processing"), lit("completed"), lit("failed"))
      val msgArr = array(graft.operators.WebMeta.ErrorTemplates.map(lit): _*)
      val jobs = Tables.events(spark, dir).select(
        $"event_id".as("job_id"),
        $"user_id".as("source_id"),
        element_at(array(lit("web"), lit("file")),
          ($"event_id" % 2).cast("int") + 1).as("handler"),
        concat(lit("{\"type\":\""),
          element_at(array(lit("web"), lit("file")),
            ($"event_id" % 2).cast("int") + 1),
          lit("\",\"job\":"), $"event_id".cast("string"), lit("}"))
          .as("payload"),
        element_at(statusNames, ($"event_id" % 5).cast("int") + 1)
          .as("status"),
        ($"event_id" % 4).cast("int").as("attempts"),
        element_at(msgArr, (pmod($"event_id", lit(8)) + 1).cast("int"))
          .as("error"),
        $"ts".as("updated_at"))
      graft.sources.JobStore.write(jobs.localCheckpoint(true), p)
      graft.sources.JobStore.resetStuck(spark, p)
      val (requeued, _) = graft.sources.JobStore.retryJobs(spark, p)
      (p, requeued)
    }

  /** q55: FAILED-JOBS lifecycle report — the per-(handler, status)
    * job counts AFTER the planted reset-stuck + retry-requeue
    * commits, with the requeued batch counted under its own
    * `requeued` status line (those rows left the store — the
    * reference's publish-then-delete). One wrong transition (a
    * blocked error requeued, a stale processing row left untouched,
    * a reset row double-counted) shifts a count and hash-fails.
    * Scale: the report is a groupBy over the committed snapshot —
    * metadata-sized output; the store mutations behind it are each
    * one keyed commit. */
  def q55FailedJobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (path, requeued) = failedJobsStore(spark, dir)
    graft.sources.JobStore.read(spark, path)
      .groupBy($"handler", $"status")
      .agg(count(lit(1)).as("n_jobs"))
      .unionByName(requeued.groupBy($"handler")
        .agg(count(lit(1)).as("n_jobs"))
        .select($"handler", lit("requeued").as("status"), $"n_jobs"))
      .orderBy($"handler", $"status")
  }

  /** q54: INCREMENTAL AGGREGATE MAINTENANCE — a materialized
    * per-(priority, year) rollup kept current by MERGING ALGEBRAIC
    * STATE, never rescanning the base: the pre-cutoff "snapshot" and
    * the post-cutoff "delta batch" each reduce to (count, sum, min,
    * max) state rows, and the view is the monoid merge of the two
    * state tables (counts add, sums add, mins min, maxs max; avg
    * DERIVES from sum/count — averaging averages is the classic
    * wrong answer). This is Spark's own partial-aggregation contract
    * lifted across BATCHES: at 100 TB the nightly delta touches only
    * delta bytes plus a state table of group cardinality, which is
    * the only way a standing rollup stays affordable. Money rides
    * decimal(18,2) through the states — algebraic maintenance needs
    * an exactly-associative monoid, and float addition isn't one
    * (the merge order differs from the oracle's single pass by
    * construction); decimal makes merge order irrelevant, then the
    * OUTPUT casts back to double. The oracle aggregates the full
    * table in one pass — equality IS the maintenance-correctness
    * proof. */
  def q54IncrementalAgg(spark: SparkSession, dir: String,
                        cutoff: String = "1996-01-01"): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir).select(
      $"o_orderpriority", year($"o_orderdate").cast("long").as("o_year"),
      $"o_totalprice".cast("decimal(18,2)").as("price"), $"o_orderdate")
    def stateOf(df: DataFrame): DataFrame = df
      .groupBy($"o_orderpriority", $"o_year")
      .agg(count(lit(1)).as("cnt"), sum($"price").as("sm"),
           min($"price").as("mn"), max($"price").as("mx"))
    val cut = lit(cutoff).cast("timestamp")
    val baseState = stateOf(orders.filter($"o_orderdate" < cut))
    val deltaState = stateOf(orders.filter($"o_orderdate" >= cut))
    baseState.unionByName(deltaState)
      .groupBy($"o_orderpriority", $"o_year")
      .agg(sum($"cnt").cast("long").as("n_orders"),
           sum($"sm").as("sm"), min($"mn").as("mn"), max($"mx").as("mx"))
      .select($"o_orderpriority", $"o_year", $"n_orders",
        round($"sm".cast("double"), 2).as("total_price"),
        round($"sm".cast("double") / $"n_orders", 4).as("avg_price"),
        $"mn".cast("double").as("min_price"),
        $"mx".cast("double").as("max_price"))
      .orderBy($"o_orderpriority", $"o_year")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_incremental_agg" -> ((s, d) => q54IncrementalAgg(s, d)),
    "q53_stuck_jobs" -> q53StuckJobs _,
    "q55_failed_jobs" -> q55FailedJobs _,
    "q52_retention_cohorts" -> q52RetentionCohorts _,
    "q51_session_paths" -> q51SessionPaths _,
    "q50_unpivot" -> q50Unpivot _,
    "q49_pivot" -> q49Pivot _,
    "q48_mad_outliers" -> q48MadOutliers _,
    "q47_scd2" -> q47Scd2 _,
    "q46_conversion_latency" -> q46ConversionLatency _,
    "q45_integrity_audit" -> q45IntegrityAudit _,
    "q44_rank_report" -> q44RankReport _,
    "q43_rate_anomaly" -> q43RateAnomaly _,
    "q42_zorder_layout" -> q42ZorderLayout _,
    "q41_quantile_sketch" -> q41QuantileSketch _,
    "q39_nation_profit" -> q39NationProfit _,
    "q40_excess_supplier" -> q40ExcessSupplier _,
    "q35_order_count_dist" -> q35OrderCountDist _,
    "q36_supplier_cnt" -> q36SupplierCnt _,
    "q37_min_cost" -> q37MinCost _,
    "q38_returned_top" -> q38ReturnedTop _,
    "q34_disjunctive" -> q34Disjunctive _,
    "q33_small_qty" -> q33SmallQty _,
    "q32_top_supplier" -> q32TopSupplier _,
    "q31_volume_shipping" -> q31VolumeShipping _,
    "q30_promo_share" -> q30PromoShare _,
    "q29_market_share" -> q29MarketShare _,
    "q28_bloom_join" -> q28BloomJoin _,
    "q27_heavy_hitters" -> q27HeavyHitters _,
    "q26_pareto_cut" -> q26ParetoCut _,
    "q25_hll_distinct" -> q25HllDistinct _,
    "q24_rolling_revenue" -> q24RollingRevenue _,
    "q23_large_orders" -> q23LargeOrders _,
    "q20_correlated" -> q20Correlated _,
    "q21_sole_blame" -> q21SoleBlame _,
    "q22_idle_customers" -> q22IdleCustomers _,
    "q18_asof_join" -> q18AsofJoin _,
    "q19_range_join" -> q19RangeJoin _,
    "q4_order_priority" -> q4OrderPriority _,
    "q16_cube" -> q16Cube _,
    "q17_grouping_sets" -> q17GroupingSets _,
    "q15_percentiles" -> q15Percentiles _,
    "q1_agg" -> q1Agg _,
    "q2_filter_pushdown" -> q2FilterPushdown _,
    "q3_join_agg" -> q3JoinAgg _,
    "q5_star_join" -> q5StarJoin _,
    "q6_scan_agg" -> q6ScanAgg _,
    "q7_window" -> q7Window _,
    "q8_rollup" -> q8Rollup _,
    "q9_semi_anti" -> q9SemiAnti _,
    "q10_topk_per_group" -> q10TopkPerGroup _,
    "q11_distinct" -> q11Distinct _,
    "q12_events_sessionize" -> q12EventsSessionize _,
    "q13_events_funnel" -> q13EventsFunnel _,
    "q14_json_props" -> q14JsonProps _)

  private lazy val cmALit = cmA.mkString("[", ", ", "]")
  private lazy val cmBLit = cmB.mkString("[", ", ", "]")

  private def bloomPosSql(k: String, j: Int): String =
    s"(((${bfA(j)} * ($k % 2147483647) + ${bfB(j)}) % 2147483647) % 8192)"

  val oracles: Map[String, String] = Map(
    // same deterministic job synthesis, same max(ts)-1h cutoff
    // one full-table pass: equality with the Spark side's
    // base-state + delta-state monoid merge proves the maintenance
    "q54_incremental_agg" ->
      """SELECT o_orderpriority,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders
        |GROUP BY o_orderpriority, o_year
        |ORDER BY o_orderpriority, o_year""".stripMargin,
    // the full lifecycle replayed: synth -> stuck sweep APPLIED ->
    // transient-failed retry requeued-and-deleted -> counts; the
    // taxonomy CASE is c14's, applied to the post-sweep error text
    "q55_failed_jobs" ->
      """WITH jobs AS (
        |  SELECT event_id AS job_id, user_id AS source_id,
        |    (['web','file'])[CAST(event_id % 2 AS INT) + 1] AS handler,
        |    (['pending','processing','processing','completed','failed'])
        |      [CAST(event_id % 5 AS INT) + 1] AS status,
        |    CAST(event_id % 4 AS INT) AS attempts,
        |    (['Failed on navigating ACS-GOTO: Page.goto: net::ERR_TIMED_OUT at https://example.com',
        |      'Page.goto: net::ERR_NAME_NOT_RESOLVED at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_REFUSED at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_RESET at https://example.com',
        |      'Page.goto: net::ERR_CONNECTION_CLOSED at https://example.com',
        |      'blocked by robots.txt',
        |      '403 Forbidden',
        |      'some unknown error'])[CAST(event_id % 8 AS INT) + 1] AS error,
        |    ts AS updated_at
        |  FROM events),
        |c AS (SELECT max(ts) - INTERVAL 1 HOUR AS cutoff FROM events),
        |swept AS (
        |  SELECT job_id, handler,
        |    CASE WHEN stuck AND attempts < 3 THEN 'pending'
        |         WHEN stuck THEN 'failed' ELSE status END AS status,
        |    CASE WHEN stuck AND attempts < 3 THEN attempts + 1
        |         ELSE attempts END AS attempts,
        |    CASE WHEN stuck AND attempts < 3 THEN 'timeout_reset'
        |         WHEN stuck THEN 'retries_exhausted'
        |         ELSE error END AS error
        |  FROM (SELECT j.*,
        |          (status = 'processing' AND updated_at < c.cutoff) AS stuck
        |        FROM jobs j, c)),
        |cls AS (
        |  SELECT *,
        |    CASE
        |      WHEN contains(upper(error), 'TIMED_OUT')
        |        OR contains(upper(error), 'TIMEOUT') THEN 'ERR_CRAWL_TIMEOUT'
        |      WHEN contains(upper(error), 'ERR_NAME_NOT_RESOLVED')
        |        OR contains(upper(error), 'DNS') THEN 'ERR_CRAWL_DNS'
        |      WHEN contains(upper(error), 'ERR_CONNECTION_REFUSED')
        |        OR contains(upper(error), 'ERR_CONNECTION_RESET')
        |        OR contains(upper(error), 'ERR_CONNECTION_CLOSED')
        |        OR contains(upper(error), 'ECONNREFUSED')
        |        OR contains(upper(error), 'ECONNRESET') THEN 'ERR_CRAWL_REFUSED'
        |      WHEN contains(upper(error), 'ROBOTS')
        |        OR contains(upper(error), 'BLOCKED')
        |        OR contains(upper(error), 'FORBIDDEN') THEN 'ERR_CRAWL_BLOCKED'
        |      ELSE 'ERR_CRAWL_TIMEOUT' END AS err_code
        |  FROM swept),
        |flagged AS (
        |  SELECT *,
        |    (status = 'failed'
        |     AND err_code IN ('ERR_CRAWL_TIMEOUT', 'ERR_CRAWL_DNS',
        |                      'ERR_CRAWL_REFUSED')
        |     AND attempts < 3) AS requeue
        |  FROM cls)
        |SELECT handler, status, CAST(count(*) AS BIGINT) AS n_jobs
        |FROM flagged WHERE NOT requeue GROUP BY handler, status
        |UNION ALL
        |SELECT handler, 'requeued' AS status, CAST(count(*) AS BIGINT)
        |FROM flagged WHERE requeue GROUP BY handler
        |ORDER BY handler, status""".stripMargin,
    "q53_stuck_jobs" ->
      """WITH jobs AS (
        |  SELECT event_id AS job_id, user_id AS source_id,
        |    (['pending','processing','processing','completed','failed'])
        |      [CAST(event_id % 5 AS INT) + 1] AS status,
        |    CAST(event_id % 4 AS INT) AS attempts,
        |    ts AS updated_at
        |  FROM events),
        |c AS (SELECT max(ts) - INTERVAL 1 HOUR AS cutoff FROM events),
        |swept AS (
        |  SELECT j.*,
        |    (status = 'processing' AND updated_at < c.cutoff) AS stuck
        |  FROM jobs j, c)
        |SELECT job_id, source_id, status, attempts,
        |  CASE WHEN stuck AND attempts < 3 THEN 'reset'
        |       WHEN stuck THEN 'failed'
        |       ELSE 'untouched' END AS verdict,
        |  CASE WHEN stuck AND attempts < 3 THEN 'pending'
        |       WHEN stuck THEN 'failed'
        |       ELSE status END AS new_status,
        |  CASE WHEN stuck AND attempts < 3 THEN attempts + 1
        |       ELSE attempts END AS new_attempts,
        |  CASE WHEN stuck AND attempts < 3 THEN 'timeout_reset'
        |       WHEN stuck THEN 'retries_exhausted' END AS new_error
        |FROM swept
        |ORDER BY job_id""".stripMargin,
    // same keyed lag window, same 30-minute session cut
    "q51_session_paths" ->
      """WITH lagged AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER w AS prev_type,
        |    date_diff('microsecond',
        |      lag(CAST(ts AS TIMESTAMP)) OVER w,
        |      CAST(ts AS TIMESTAMP)) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT prev_type AS from_type, event_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS n_transitions
        |FROM lagged
        |WHERE prev_type IS NOT NULL AND gap_us <= 1800000000
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    // same integer epoch-day cohorts and offsets
    "q52_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
        |  CAST(ev.day - cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    // declared-value pivot = conditional aggregation
    "q49_pivot" ->
      """SELECT l_returnflag,
        |  coalesce(round(sum(CASE WHEN l_linestatus = 'F'
        |    THEN l_extendedprice END), 2), 0.0) AS rev_f,
        |  coalesce(round(sum(CASE WHEN l_linestatus = 'O'
        |    THEN l_extendedprice END), 2), 0.0) AS rev_o
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the stack of the same two declared columns
    "q50_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    coalesce(round(sum(CASE WHEN l_linestatus = 'F'
        |      THEN l_extendedprice END), 2), 0.0) AS rev_f,
        |    coalesce(round(sum(CASE WHEN l_linestatus = 'O'
        |      THEN l_extendedprice END), 2), 0.0) AS rev_o
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, s.status, s.revenue FROM wide,
        |  LATERAL (VALUES ('F', rev_f), ('O', rev_o)) AS s(status, revenue)
        |ORDER BY l_returnflag, status""".stripMargin,
    // same exact-percentile med/MAD, same modified-z cut
    "q48_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type,
        |    quantile_cont(abs(e.value - med.med), 0.5) AS mad,
        |    any_value(med.med) AS med
        |  FROM events e JOIN med USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT e.event_type, e.event_id, round(e.value, 4) AS value,
        |  round(0.6745 * (e.value - mad.med) / mad.mad, 4) AS robust_z
        |FROM events e JOIN mad USING (event_type)
        |WHERE mad.mad > 0
        |  AND abs(0.6745 * (e.value - mad.med) / mad.mad) > 3.5
        |ORDER BY e.event_type, e.event_id""".stripMargin,
    // same unique window order, same lag-collapse, same lead-close
    "q47_scd2" ->
      """WITH ch AS (
        |  SELECT user_id, ts, event_id, attr FROM (
        |    SELECT user_id, ts, event_id, event_type AS attr,
        |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |        AS prev_attr
        |    FROM events)
        |  WHERE prev_attr IS NULL OR attr <> prev_attr)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  attr, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // same conditional-min firsts, same integer-second latencies,
    // same discrete rank-select quantiles
    "q46_conversion_latency" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |        THEN CAST(ts AS TIMESTAMP) END) AS first_view,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
        |  FROM events GROUP BY user_id),
        |conv AS (
        |  -- per-timestamp floor BEFORE subtracting: Spark's
        |  -- unix_timestamp truncates each instant to seconds, and the
        |  -- events carry microseconds
        |  SELECT user_id,
        |    CAST(floor(epoch(first_purchase)) AS BIGINT)
        |      - CAST(floor(epoch(first_view)) AS BIGINT) AS latency_s
        |  FROM f
        |  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        |    AND first_purchase >= first_view),
        |ranked AS (
        |  SELECT c_mktsegment, latency_s,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY latency_s, user_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM conv JOIN customer ON user_id = c_custkey)
        |SELECT c_mktsegment,
        |  count(*) AS n_converted,
        |  max(CASE WHEN rn <= (n + 1) // 2 THEN latency_s END) AS p50_latency_s,
        |  max(CASE WHEN rn <= (n * 9 + 9) // 10 THEN latency_s END) AS p90_latency_s
        |FROM ranked
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q45_integrity_audit" ->
      """SELECT 'lineitem->orders' AS relation,
        |  (SELECT count(*) FROM lineitem) AS n_child,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS n_matched,
        |  (SELECT count(*) FROM lineitem)
        |  - (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IN (SELECT o_orderkey FROM orders)) AS n_orphans
        |UNION ALL
        |SELECT 'lineitem->part',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_partkey IN (SELECT p_partkey FROM part)),
        |  (SELECT count(*) FROM lineitem)
        |  - (SELECT count(*) FROM lineitem
        |     WHERE l_partkey IN (SELECT p_partkey FROM part))
        |UNION ALL
        |SELECT 'lineitem->supplier',
        |  (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_suppkey IN (SELECT s_suppkey FROM supplier)),
        |  (SELECT count(*) FROM lineitem)
        |  - (SELECT count(*) FROM lineitem
        |     WHERE l_suppkey IN (SELECT s_suppkey FROM supplier))
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey IN (SELECT c_custkey FROM customer)),
        |  (SELECT count(*) FROM orders)
        |  - (SELECT count(*) FROM orders
        |     WHERE o_custkey IN (SELECT c_custkey FROM customer))
        |UNION ALL
        |SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer),
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey IN (SELECT n_nationkey FROM nation)),
        |  (SELECT count(*) FROM customer)
        |  - (SELECT count(*) FROM customer
        |     WHERE c_nationkey IN (SELECT n_nationkey FROM nation))
        |ORDER BY relation""".stripMargin,
    // same unique-keyed window order, so ntile buckets are
    // position-deterministic in both engines
    "q44_rank_report" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS price_cents,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#11'
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY CAST(round(l_extendedprice * 100.0, 0) AS BIGINT),
        |           l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, price_cents, l_orderkey, l_linenumber""".stripMargin,
    // same per-minute counts, same trailing event-time RANGE frame,
    // same exactly-determined integer-average baseline
    "q43_rate_anomaly" ->
      """WITH c AS (
        |  SELECT event_type,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS m
        |  FROM events GROUP BY 1, 2),
        |wdw AS (
        |  SELECT event_type, hour, n,
        |    avg(n) OVER (PARTITION BY event_type ORDER BY m
        |      RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS base_avg,
        |    CAST(count(n) OVER (PARTITION BY event_type ORDER BY m
        |      RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING) AS BIGINT) AS base_n
        |  FROM c)
        |SELECT event_type, hour, n,
        |  round(coalesce(base_avg, 0.0), 4) AS trailing_avg,
        |  base_n AS baseline_hours,
        |  (base_n >= 12 AND n > base_avg * 3.0) AS is_spike
        |FROM wdw
        |ORDER BY event_type, hour""".stripMargin,
    // the same interleave as a generate_series fold (terms are
    // bit-disjoint, so the sum is the OR)
    "q42_zorder_layout" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(0, 15), i ->
        |      ((((l_partkey % 65536) >> i) & 1) << (2*i))
        |      + ((((l_suppkey % 65536) >> i) & 1) << (2*i + 1)))),
        |    (a, b) -> a + b) AS BIGINT) AS zkey
        |FROM lineitem
        |ORDER BY zkey, l_orderkey, l_linenumber
        |LIMIT 200""".stripMargin,
    // the whole sketch replayed: same bins, same cumulative ranks,
    // same upper-edge estimate, exact via the q15-proven kernel
    "q41_quantile_sketch" ->
      """WITH li AS (SELECT l_returnflag, l_extendedprice FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, min(l_extendedprice) AS lo,
        |    max(l_extendedprice) AS hi, count(*) AS n
        |  FROM li GROUP BY 1),
        |b AS (
        |  SELECT li.l_returnflag, n,
        |    CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 128.0)),
        |      127.0) AS BIGINT) AS bin
        |  FROM li JOIN r USING (l_returnflag)),
        |h AS (SELECT l_returnflag, n, bin, count(*) AS c FROM b GROUP BY 1, 2, 3),
        |cumt AS (
        |  SELECT l_returnflag, n, bin,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum
        |  FROM h),
        |e AS (
        |  SELECT l_returnflag,
        |    min(CASE WHEN cum >= 0.5 * n THEN bin END) AS b50,
        |    min(CASE WHEN cum >= 0.9 * n THEN bin END) AS b90
        |  FROM cumt GROUP BY 1),
        |est AS (
        |  SELECT e.l_returnflag,
        |    round(lo + (b50 + 1) * ((hi - lo) / 128.0), 4) AS est_p50,
        |    round(lo + (b90 + 1) * ((hi - lo) / 128.0), 4) AS est_p90
        |  FROM e JOIN r USING (l_returnflag)),
        |ex AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |    round(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90
        |  FROM li GROUP BY 1)
        |SELECT l_returnflag, est_p50, exact_p50,
        |  round(abs(est_p50 - exact_p50), 4) AS err_p50,
        |  est_p90, exact_p90,
        |  round(abs(est_p90 - exact_p90), 4) AS err_p90
        |FROM est JOIN ex USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q39_nation_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(CAST(sum(
        |    (CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100
        |    - (CAST(round(p_retailprice * 100.0, 0) AS BIGINT) // 10)
        |      * CAST(l_quantity AS BIGINT)
        |  ) AS DOUBLE) / 100.0, 2) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    // the textbook correlated-IN form — proves the one-aggregate
    // window decorrelation
    "q40_excess_supplier" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM q q1
        |  WHERE qty > 1.5 * (
        |    SELECT avg(qty) FROM q q2 WHERE q2.l_partkey = q1.l_partkey))
        |ORDER BY s_suppkey""".stripMargin,
    // the textbook outer-join double-aggregate form — proves the
    // aggregate-before-join rewrite
    "q35_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // the textbook NOT IN form — proves the anti-join rewrite
    "q36_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // the textbook correlated-scalar-min form — proves the one-pass
    // window decorrelation
    "q37_min_cost" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS cost_cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_size BETWEEN 10 AND 15
        |  GROUP BY 1, 2)
        |SELECT c.l_partkey AS p_partkey, p_name, s_name, n_name,
        |  round(CAST(cost_cents AS DOUBLE) / 100.0, 2) AS cost
        |FROM cost c
        |JOIN part ON p_partkey = c.l_partkey
        |JOIN supplier ON s_suppkey = c.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost_cents = (
        |  SELECT min(cost_cents) FROM cost c2
        |  WHERE c2.l_partkey = c.l_partkey)
        |ORDER BY p_partkey, s_name
        |LIMIT 100""".stripMargin,
    "q38_returned_top" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(c_acctbal, 2) AS c_acctbal,
        |  round(CAST(sum((CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100)
        |    AS DOUBLE) / 100.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= '1998-01-01' AND o_orderdate < '1998-04-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // the textbook correlated form — proves the decorrelation
    "q33_small_qty" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT))
        |       AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#23'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * avg(l2.l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    "q34_disjunctive" ->
      """SELECT round(CAST(coalesce(sum(
        |    (CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100),
        |    0) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q32_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum((CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |         * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100)
        |      AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  round(CAST(total_cents AS DOUBLE) / 100.0, 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // integer-cent volume in all three ratio queries: cents×bp is
    // exact int64, sums are order-independent, the one double ratio
    // is computed from identical longs in both engines
    "q29_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(CAST(sum(CASE WHEN sn.n_name = 'NATION_2' THEN vc ELSE 0 END)
        |             AS DOUBLE)
        |        / CAST(sum(vc) AS DOUBLE) * 100.0, 4) AS mkt_share_pct,
        |  round(CAST(sum(vc) AS DOUBLE) / 100.0, 2) AS total_volume
        |FROM (SELECT l_orderkey, l_suppkey,
        |        (CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |         * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100
        |          AS vc
        |      FROM lineitem) l
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q30_promo_share" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
        |  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN vc ELSE 0 END)
        |             AS DOUBLE)
        |        / CAST(sum(vc) AS DOUBLE) * 100.0, 4) AS promo_pct,
        |  round(CAST(sum(vc) AS DOUBLE) / 100.0, 2) AS total_volume
        |FROM (SELECT l_partkey, l_shipdate,
        |        (CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |         * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100
        |          AS vc
        |      FROM lineitem) l
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(CAST(sum((CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100.0, 0) AS BIGINT))) // 100)
        |    AS DOUBLE) / 100.0, 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
        |   OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // the Bloom sketch replayed arm for arm: same bit positions, same
    // all-k membership rule, same FP accounting
    "q28_bloom_join" ->
      s"""WITH bk AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |bits AS (
         |  SELECT DISTINCT ${bloomPosSql("s_suppkey", 0)} AS pos FROM bk
         |  UNION SELECT DISTINCT ${bloomPosSql("s_suppkey", 1)} FROM bk
         |  UNION SELECT DISTINCT ${bloomPosSql("s_suppkey", 2)} FROM bk),
         |probe AS (SELECT l_suppkey, l_extendedprice FROM lineitem),
         |pass AS (
         |  SELECT count(*) AS n_pass FROM probe
         |  WHERE ${bloomPosSql("l_suppkey", 0)} IN (SELECT pos FROM bits)
         |    AND ${bloomPosSql("l_suppkey", 1)} IN (SELECT pos FROM bits)
         |    AND ${bloomPosSql("l_suppkey", 2)} IN (SELECT pos FROM bits)),
         |tm AS (
         |  SELECT count(*) AS n_true,
         |    round(sum(l_extendedprice), 2) AS matched_revenue
         |  FROM probe WHERE l_suppkey IN (SELECT s_suppkey FROM bk)),
         |np AS (SELECT count(*) AS n_probe FROM probe)
         |SELECT n_probe, n_pass, n_true, matched_revenue,
         |  CASE WHEN n_probe = n_true THEN 0.0
         |       ELSE round(CAST(n_pass - n_true AS DOUBLE)
         |                  / (n_probe - n_true) * 100.0, 4) END AS fp_pct
         |FROM np, pass, tm""".stripMargin,
    // the same sketch, hash for hash: the CM cell/probe arithmetic
    // with the multiplicative-hash constants spliced as literals
    "q27_heavy_hitters" ->
      s"""WITH keys AS (SELECT l_partkey AS k FROM lineitem),
         |thr AS (
         |  SELECT CAST(n AS DOUBLE) / CAST(d AS DOUBLE) * 1.4 AS thr
         |  FROM (SELECT count(*) AS n FROM keys),
         |       (SELECT count(DISTINCT k) AS d FROM keys)),
         |cm AS (
         |  SELECT j,
         |    (((${cmALit})[j + 1] * (k % 2147483647) + (${cmBLit})[j + 1])
         |      % 2147483647) % 4096 AS bucket,
         |    count(*) AS c
         |  FROM keys, LATERAL unnest(generate_series(0, 3)) AS t(j)
         |  GROUP BY 1, 2),
         |kb AS (
         |  SELECT k, j,
         |    (((${cmALit})[j + 1] * (k % 2147483647) + (${cmBLit})[j + 1])
         |      % 2147483647) % 4096 AS bucket
         |  FROM (SELECT DISTINCT k FROM keys), LATERAL unnest(generate_series(0, 3)) AS t(j)),
         |est AS (
         |  SELECT k, min(c) AS est
         |  FROM kb JOIN cm USING (j, bucket) GROUP BY k),
         |cand AS (SELECT k, est FROM est, thr WHERE est >= thr),
         |exact AS (
         |  SELECT k, count(*) AS cnt FROM keys
         |  WHERE k IN (SELECT k FROM cand) GROUP BY k)
         |SELECT k AS l_partkey, cnt, est, round(thr, 4) AS threshold
         |FROM exact JOIN cand USING (k), thr
         |WHERE cnt >= thr
         |ORDER BY cnt DESC, l_partkey""".stripMargin,
    "q26_pareto_cut" ->
      """WITH rev AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY o_custkey),
        |total AS (SELECT sum(rev) AS total_rev FROM rev),
        |cum AS (
        |  SELECT o_custkey, rev,
        |    sum(rev) OVER (ORDER BY rev DESC, o_custkey
        |                   ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM rev)
        |SELECT o_custkey, rev,
        |  round(cum / total_rev * 100.0, 4) AS cum_share_pct
        |FROM cum, total
        |WHERE cum - rev < 0.8 * total_rev
        |ORDER BY cum_share_pct, o_custkey""".stripMargin,
    // the same sketch, nibble for nibble: md5 register/rho extraction,
    // max-merge, ordered 2^-Mj fold, identical α op sequence
    "q25_hll_distinct" ->
      """WITH hashed AS (
        |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
        |rr AS (
        |  SELECT
        |    (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) AS register,
        |    coalesce(list_position(
        |      list_transform(generate_series(3, 15),
        |        i -> instr('0123456789abcdef', substr(h, i, 1)) - 1 > 0),
        |      true), 0) AS fnz,
        |    list_transform(generate_series(3, 15),
        |      i -> instr('0123456789abcdef', substr(h, i, 1)) - 1) AS nibs
        |  FROM hashed),
        |rho AS (
        |  SELECT register,
        |    CASE WHEN fnz = 0 THEN 53
        |      ELSE (fnz - 1) * 4
        |        + CASE WHEN nibs[fnz] = 1 THEN 3
        |               WHEN nibs[fnz] <= 3 THEN 2
        |               WHEN nibs[fnz] <= 7 THEN 1
        |               ELSE 0 END + 1 END AS rho
        |  FROM rr),
        |regs AS (SELECT register, max(rho) AS mj FROM rho GROUP BY register),
        |sk AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(power(2.0, -mj) ORDER BY register)), (a, x) -> a + x)
        |      AS inv_present,
        |    256.0 - CAST(count(*) AS DOUBLE) AS zeros
        |  FROM regs),
        |est AS (
        |  SELECT zeros,
        |    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
        |      / (inv_present + zeros) AS e_raw
        |  FROM sk),
        |fin AS (
        |  SELECT CASE WHEN e_raw <= 640.0 AND zeros > 0
        |              THEN 256.0 * ln(256.0 / zeros)
        |              ELSE e_raw END AS e
        |  FROM est),
        |exact AS (SELECT count(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
        |SELECT round(e, 4) AS approx_distinct, exact_distinct,
        |  round(abs(e / exact_distinct - 1.0) * 100.0, 2) AS err_pct
        |FROM fin, exact""".stripMargin,
    "q24_rolling_revenue" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // deliberately the textbook Q18 statement — IN over a
    // grouped-HAVING subquery plus a separate outer aggregate — to
    // prove the Spark plan's single-aggregate reuse is equivalent
    "q23_large_orders" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  round(o.o_totalprice, 2) AS o_totalprice,
        |  round(sum(l.l_quantity), 2) AS sum_qty
        |FROM customer c, orders o, lineitem l
        |WHERE o.o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |  AND c.c_custkey = o.o_custkey
        |  AND o.o_orderkey = l.l_orderkey
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY round(o.o_totalprice, 2) DESC, o.o_orderdate, o.o_orderkey
        |LIMIT 100""".stripMargin,
    // deliberately the CORRELATED form: the oracle proves the Spark
    // plan's per-order aggregate decorrelation is equivalent to the
    // textbook EXISTS / NOT EXISTS statement
    "q21_sole_blame" ->
      """WITH f AS (
        |  SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
        |  FROM lineitem l JOIN orders o
        |    ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
        |SELECT s.s_name, count(*) AS numwait
        |FROM f l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM f l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM f l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      """SELECT n.n_name, count(*) AS n_cust,
        |  round(sum(c.c_acctbal), 2) AS total_bal
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
    // the correlated form on purpose — DuckDB decorrelates it the
    // same way Spark's window formulation does by construction
    "q20_correlated" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice, 2) AS o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
        |  FROM orders)
        |WHERE o_totalprice > cust_avg
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_asof_join" ->
      """WITH probes AS (
        |  SELECT o_orderkey, o_custkey % 150 AS user_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + (o_orderkey % 720) * INTERVAL 1 HOUR AS t
        |  FROM orders),
        |ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, max(event_id) AS event_id
        |  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT p.o_orderkey, p.user_id, e.event_id AS last_event_id
        |FROM probes p ASOF JOIN ev e
        |  ON e.user_id = p.user_id AND e.t <= p.t
        |ORDER BY p.o_orderkey""".stripMargin,
    "q19_range_join" ->
      """WITH ranges AS (
        |  SELECT o_orderkey, o_custkey % 150 AS user_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + (o_orderkey % 27) * INTERVAL 1 DAY AS r_start,
        |    TIMESTAMP '2024-01-01 00:00:00'
        |      + (o_orderkey % 27 + 1 + o_orderkey % 3) * INTERVAL 1 DAY AS r_end
        |  FROM orders)
        |SELECT r.o_orderkey, count(*) AS n_events
        |FROM ranges r JOIN events e
        |  ON e.user_id = r.user_id
        | AND CAST(e.ts AS TIMESTAMP) >= r.r_start
        | AND CAST(e.ts AS TIMESTAMP) < r.r_end
        |GROUP BY r.o_orderkey
        |ORDER BY r.o_orderkey""".stripMargin,
    "q17_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_pushdown" ->
      """SELECT p_partkey, p_name, p_size, round(p_retailprice,2) AS p_retailprice
        |FROM part
        |WHERE p_size BETWEEN 10 AND 15 AND p_brand = 'Brand#12'
        |ORDER BY p_partkey""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_star_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_scan_agg" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price, rnk,
        |       round(prev_price_raw,2) AS prev_price
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |   lag(o_totalprice,1) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price_raw
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q8_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q9_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q10_topk_per_group" ->
      """SELECT p_brand, p_partkey, round(p_retailprice,2) AS price, rnk
        |FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |   row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part)
        |WHERE rnk <= 5
        |ORDER BY p_brand, rnk""".stripMargin,
    "q11_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS distinct_cust,
        |       count(DISTINCT o_orderpriority) AS distinct_prio,
        |       count(*) AS total
        |FROM orders""".stripMargin,
    "q12_events_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tsu,
        |   lag(CAST(ts AS TIMESTAMP),1) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        | CAST(sum(CASE WHEN prev_ts IS NULL
        |          OR date_diff('microsecond', prev_ts, tsu) > 1800000000
        |          THEN 1 ELSE 0 END) AS BIGINT) AS sessions,
        | count(*) AS n_events
        |FROM lagged
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q13_events_funnel" ->
      """SELECT user_id,
        | CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
        |       AND first_purchase IS NOT NULL
        |       AND first_view < first_click AND first_click < first_purchase
        |      THEN 1 ELSE 0 END AS converted
        |FROM (
        |  SELECT user_id,
        |   min(CASE WHEN event_type='view' THEN CAST(ts AS TIMESTAMP) END) AS first_view,
        |   min(CASE WHEN event_type='click' THEN CAST(ts AS TIMESTAMP) END) AS first_click,
        |   min(CASE WHEN event_type='purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
        |  FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q16_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q15_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q14_json_props" ->
      """SELECT event_type,
        | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(props->>'$.k' AS BIGINT)),4) AS avg_k,
        | round(sum(value),4) AS sum_value,
        | count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
