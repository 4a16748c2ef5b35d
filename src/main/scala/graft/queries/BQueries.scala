package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * B-tier relational repertoire (SURVEY.md §2 B1-B12): plain declarative
 * DataFrame plans over the TPC-H-ish tables — Catalyst owns pushdown,
 * partial aggregation, broadcast selection and AQE. Every query has a
 * value-identical DuckDB oracle; double aggregates go through
 * DECIMAL(38,6) for order-independent exactness, timestamps are emitted
 * as formatted strings, and every output is deterministically ordered.
 */
object BQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.t(s, dir, name)

  /** SUM over DECIMAL(38,6), surfaced as DOUBLE (exact, order-independent). */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1: filter + project with parquet pushdown
    "q_b1_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // B2: groupBy aggregates
    "q_b2_status_counts" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("value")).as("sum_value"),
          min("user_id").as("min_user"),
          max("user_id").as("max_user"))
        .orderBy("event_type")
    }),

    // B3: top-K — TakeOrderedAndProject, no full sort
    "q_b3_top_paths" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)
    }),

    // B4: time bucketing
    "q_b4_hourly_traffic" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .orderBy("hour")
    }),

    // B5a: broadcast dim join (customer ⋈ nation ⋈ region; dims broadcast)
    "q_b5_join_broadcast" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(count(lit(1)).as("num_customers"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("n_name")
    }),

    // B5b: multi-way shuffle join (TPC-H q3-flavored)
    "q_b5_join_multi" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // B6a: running window aggregates
    "q_b6_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(
          col("user_id"),
          col("event_id"),
          row_number().over(w).as("rn"),
          sum(col("value").cast(DecimalType(38, 6))).over(w).cast(DoubleType).as("running_value"))
        .orderBy("user_id", "rn")
    }),

    // B6b: lag/lead context around error events
    "q_b6_error_context" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(
          col("event_id"),
          col("event_type"),
          lag("event_type", 1).over(w).as("prev_type"),
          lead("event_type", 1).over(w).as("next_type"))
        .filter(col("event_type") === "error")
        .select("event_id", "prev_type", "next_type")
        .orderBy("event_id")
    }),

    // B7: exact distinct counts
    "q_b7_distinct_users" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("distinct_users"))
        .orderBy("event_type")
    }),

    // B8: percentiles (cents-scaled to dodge float interpolation skew)
    "q_b8_percentiles" -> ((s, dir) => {
      // sort-based exact quantiles (operators/ExactQuantiles): same
      // percentile_cont values as the builtin aggregate, but no
      // single-reducer value->count map — the formulation that
      // survives high-cardinality columns at 100 TB (and is 2.5x
      // faster already at sf0.1)
      // NOTE: ofAsRow runs its Spark jobs eagerly, during builder
      // invocation. graft.Bench starts its timer BEFORE calling the
      // builder, so the measured q_b8 latency includes this work;
      // any harness that times only the action on the returned
      // DataFrame would under-report it.
      graft.operators.ExactQuantiles
        .ofAsRow(t(s, dir, "lineitem"), "l_extendedprice", Seq(0.5, 0.9, 0.99))
        .select(
          round(col("q_50") * 100).cast(LongType).as("p50_cents"),
          round(col("q_90") * 100).cast(LongType).as("p90_cents"),
          round(col("q_99") * 100).cast(LongType).as("p99_cents"))
    }),

    // B9: TPC-H q1 pricing summary (decimal-exact)
    "q_b9_tpch_q1" -> ((s, dir) => {
      // 6-decimal fixed-point sums over longs: decimal-exact like
      // DECIMAL(38,6) aggregation but stays in whole-stage codegen
      // (Decimal with precision > 18 falls back to BigDecimal per row)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(floor(col("l_quantity") * 1000000L).cast(LongType)).as("sum_qty_fp6"),
          sum(floor(col("l_extendedprice") * 1000000L).cast(LongType)).as("sum_base_price_fp6"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 1000000L)
            .cast(LongType)).as("sum_disc_price_fp6"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 1000000L)
            .cast(LongType)).as("sum_charge_fp6"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // B10: anti join — orders with no high-quantity lineitem
    "q_b10_anti_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(
          t(s, dir, "lineitem").filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("sum_keys"))
    }),

    // B11: gap-based sessionization (30-min inactivity splits)
    "q_b11_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(
          col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .select(
          col("user_id"),
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L).as("new_sess"))
        .groupBy("user_id")
        .agg(sum("new_sess").as("sessions"))
        .orderBy("user_id")
    }),

    // B11b: same sessionization via Spark's native session_window
    // (gap-close semantics match the lag/cumsum formulation exactly)
    "q_b11b_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("sessions"))
        .orderBy("user_id")
    }),

    // B12: rollup hierarchy
    "q_b12_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 10).as("ub"))
        .rollup("event_type", "ub")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("event_type"), lit("(all)")).as("etype"),
          coalesce(col("ub").cast(StringType), lit("(all)")).as("ubucket"),
          col("cnt"))
        .orderBy("etype", "ubucket")
    }),

    // B13: as-of (point-in-time) join — each purchase event sees the
    // user's previous-day activity checkpoint (available at next
    // midnight; first-day purchases see NULLs). One shuffle on the key,
    // one window pass — operators/AsOfJoin.
    "q_b13_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val build = ev
        .groupBy(
          col("user_id"),
          (date_trunc("day", col("ts")) + expr("INTERVAL 1 DAY")).as("avail_ts"))
        .agg(count(lit(1)).as("day_cnt"), dsum(col("value")).as("day_sum"))
      val probe = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.operators.AsOfJoin
        .asOf(probe, build, Seq("user_id"), "ts", "avail_ts", Seq("day_cnt", "day_sum"))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_avail_ts")).as("asof_avail_us"),
          col("asof_day_cnt"), col("asof_day_sum"))
        .orderBy("event_id")
    }),

    // B14: interval-containment join — event values classified into
    // overlapping per-nation value bands, as a bucket-explode equi-join
    // (no BNL/cartesian) — operators/IntervalJoin.
    "q_b14_interval" -> ((s, dir) => {
      val iv = t(s, dir, "nation").select(
        col("n_nationkey"), col("n_name"),
        (col("n_nationkey") * lit(18.0d)).as("lo"),
        (col("n_nationkey") * lit(18.0d) + lit(30.0d)).as("hi"))
      val probe = t(s, dir, "events").select("event_id", "value")
      graft.operators.IntervalJoin
        .overlap(probe, "value", iv, "lo", "hi", bucketWidth = 25.0)
        .groupBy("n_nationkey", "n_name")
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
        .orderBy("n_nationkey")
    }),

    // B15: pivot (long→wide) — event counts per user bucket spread over
    // an explicit event_type column list (explicit values keep the plan
    // a single pass: groupBy + pivot-agg, no extra distinct job).
    "q_b15_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .select((col("user_id") % 10).as("ub"), col("event_type"))
        .groupBy("ub")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("ub") +: types.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)
        .orderBy("ub")
    }),

    // B16: time-RANGE window frame — per event, how many of the same
    // user's events fall in the trailing hour (no bucketing: a true
    // sliding interval, the frame SQL feature B4's date_trunc can't
    // express). RANGE frames include all epoch-second peers on both
    // engines, so the result is deterministic without a unique sort key.
    "q_b16_range_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3599L, 0L)
      t(s, dir, "events")
        .withColumn("es", unix_timestamp(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("cnt_1h"),
          min(col("event_id")).over(w).as("first_eid"))
        .orderBy("event_id")
    }),

    // B17: robust traffic-burst detection — per (event_type, hour)
    // counts, then median/MAD OUTLIER flags per type. Integer-exact
    // across engines via the doubling device: med2 = median(2·cnt) and
    // mad4 = median(|4·cnt − 2·med2|) are always integers (an
    // interpolated median of even integers is an integer), so the
    // burst predicate dev4 > 3·mad4 never touches a float. Plan: one
    // map-combining aggregate, then two windows on the SAME
    // event_type key — the exchange is reused, no joins, one scan.
    "q_b17_burst_detect" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("med2", expr(
          "cast(percentile(2 * cnt, 0.5) over (partition by event_type) as bigint)"))
        .withColumn("dev4", expr("4 * cnt - 2 * med2"))
        .withColumn("mad4", expr(
          "cast(percentile(abs(dev4), 0.5) over (partition by event_type) as bigint)"))
        .filter(col("dev4") > lit(3L) * col("mad4"))
        .select(col("event_type"), col("hour"), col("cnt"), col("dev4"), col("mad4"))
        .orderBy("event_type", "hour")
    }),

    // B18: ordered funnel analysis (view → click → purchase, each step
    // strictly after the previous in the per-user (ts, event_id) total
    // order) — cumulative window flags make "click after a view" a
    // one-pass computation: sv = any view so far, c2 = click with
    // sv set, sc = any valid click so far, p3 = purchase with sc set.
    // Plan: two same-key windows (one sort, exchange reused) + the
    // per-user aggregate on the SAME key + a one-row rollup; integer
    // conversion ppms.
    "q_b18_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("sv",
          max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
        .withColumn("c2",
          when(col("event_type") === "click" && col("sv") === 1, 1).otherwise(0))
        .withColumn("sc", max(col("c2")).over(w))
        .withColumn("p3",
          when(col("event_type") === "purchase" && col("sc") === 1, 1).otherwise(0))
      flagged.groupBy("user_id").agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("r1"),
          max(col("c2")).as("r2"),
          max(col("p3")).as("r3"))
        .agg(
          count(lit(1)).as("users"),
          sum(col("r1").cast(LongType)).as("reached_view"),
          sum(col("r2").cast(LongType)).as("reached_click"),
          sum(col("r3").cast(LongType)).as("reached_purchase"))
        .withColumn("click_conv_ppm", expr(
          "CASE WHEN reached_view = 0 THEN 0L ELSE reached_click * 1000000L div reached_view END"))
        .withColumn("purchase_conv_ppm", expr(
          "CASE WHEN reached_click = 0 THEN 0L ELSE reached_purchase * 1000000L div reached_click END"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_b16_range_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS cnt_1h,
        |  MIN(event_id) OVER w AS first_eid
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // B17 oracle: percentile_cont == Spark's exact interpolated
    // percentile; the ×2/×4 doubling keeps every median integral.
    "q_b17_burst_detect" ->
      """WITH mc AS (SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type,
        |    CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY 2*cnt) AS BIGINT) AS med2
        |  FROM mc GROUP BY 1),
        |dv AS (SELECT mc.event_type, mc.hour, mc.cnt, 4*mc.cnt - 2*st.med2 AS dev4
        |       FROM mc JOIN st USING (event_type)),
        |md AS (SELECT event_type,
        |    CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(dev4)) AS BIGINT) AS mad4
        |  FROM dv GROUP BY 1)
        |SELECT d.event_type, d.hour, CAST(d.cnt AS BIGINT) AS cnt,
        |  CAST(d.dev4 AS BIGINT) AS dev4, md.mad4
        |FROM dv d JOIN md USING (event_type)
        |WHERE d.dev4 > 3 * md.mad4
        |ORDER BY event_type, hour""".stripMargin,
    // B18 oracle: identical cumulative-flag windows; sums cast to
    // BIGINT before the ppm division (HUGEINT rule).
    "q_b18_funnel" ->
      """WITH f AS (SELECT user_id, ts, event_id, event_type,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w AS sv
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |g AS (SELECT *, CASE WHEN event_type = 'click' AND sv = 1
        |        THEN 1 ELSE 0 END AS c2 FROM f),
        |h AS (SELECT *, max(c2) OVER w2 AS sc FROM g
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |i AS (SELECT *, CASE WHEN event_type = 'purchase' AND sc = 1
        |        THEN 1 ELSE 0 END AS p3 FROM h),
        |pu AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS r1,
        |    max(c2) AS r2, max(p3) AS r3 FROM i GROUP BY user_id),
        |tot AS (SELECT count(*) AS users,
        |    CAST(sum(r1) AS BIGINT) AS reached_view,
        |    CAST(sum(r2) AS BIGINT) AS reached_click,
        |    CAST(sum(r3) AS BIGINT) AS reached_purchase FROM pu)
        |SELECT users, reached_view, reached_click, reached_purchase,
        |  CAST(CASE WHEN reached_view = 0 THEN 0
        |    ELSE reached_click * 1000000 // reached_view END AS BIGINT) AS click_conv_ppm,
        |  CAST(CASE WHEN reached_click = 0 THEN 0
        |    ELSE reached_purchase * 1000000 // reached_click END AS BIGINT) AS purchase_conv_ppm
        |FROM tot""".stripMargin,
    "q_b1_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_b2_status_counts" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
        |  min(user_id) AS min_user, max(user_id) AS max_user
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_b3_top_paths" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin,
    "q_b4_hourly_traffic" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  count(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "q_b5_join_broadcast" ->
      """SELECT n_name, count(*) AS num_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_b5_join_multi" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_b6_window_running" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running_value
        |FROM events WHERE user_id < 20 ORDER BY user_id, rn""".stripMargin,
    "q_b6_error_context" ->
      """SELECT event_id, prev_type, next_type FROM (
        |  SELECT event_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events) WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "q_b7_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_b8_percentiles" ->
      """SELECT CAST(round(quantile_cont(l_extendedprice, 0.5) * 100) AS BIGINT) AS p50_cents,
        |  CAST(round(quantile_cont(l_extendedprice, 0.9) * 100) AS BIGINT) AS p90_cents,
        |  CAST(round(quantile_cont(l_extendedprice, 0.99) * 100) AS BIGINT) AS p99_cents
        |FROM lineitem""".stripMargin,
    "q_b9_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(floor(l_quantity * 1000000) AS BIGINT)) AS BIGINT) AS sum_qty_fp6,
        |  CAST(SUM(CAST(floor(l_extendedprice * 1000000) AS BIGINT)) AS BIGINT) AS sum_base_price_fp6,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS sum_disc_price_fp6,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_fp6,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_b10_anti_join" ->
      """SELECT count(*) AS cnt, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,
    "q_b11_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS sessions FROM (
        |  SELECT user_id,
        |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id,
        |      epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |    FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_b11b_session_window" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS sessions FROM (
        |  SELECT user_id,
        |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id,
        |      epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |    FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_b12_rollup" ->
      """SELECT coalesce(event_type, '(all)') AS etype,
        |  coalesce(CAST(ub AS VARCHAR), '(all)') AS ubucket, count(*) AS cnt
        |FROM (SELECT event_type, user_id % 10 AS ub FROM events)
        |GROUP BY ROLLUP(event_type, ub) ORDER BY etype, ubucket""".stripMargin,
    "q_b13_asof" ->
      """WITH build AS (
        |  SELECT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS avail_ts,
        |    count(*) AS day_cnt,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS day_sum
        |  FROM events GROUP BY 1, 2),
        |probe AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  epoch_us(b.avail_ts) AS asof_avail_us,
        |  b.day_cnt AS asof_day_cnt, b.day_sum AS asof_day_sum
        |FROM probe p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND p.ts >= b.avail_ts
        |ORDER BY p.event_id""".stripMargin,
    "q_b14_interval" ->
      """WITH iv AS (
        |  SELECT n_nationkey, n_name,
        |    CAST(n_nationkey * 18.0 AS DOUBLE) AS lo,
        |    CAST(n_nationkey * 18.0 + 30.0 AS DOUBLE) AS hi
        |  FROM nation)
        |SELECT n_nationkey, n_name, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "q_b15_pivot" ->
      """SELECT user_id % 10 AS ub,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY ub""".stripMargin
  )
}
