package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.SnapshotDiff
import Q.{moneySum, t}

/** Temporal + statistical analytics breadth: calendar gap-fill with
  * forward-fill, CDC snapshot diff, exact distribution moments, per-group
  * mode, fixed-width histograms, and exact interpolated quartiles.
  *
  * These are the reporting/validation queries the reference's analysts run
  * downstream of the marts (SURVEY §2.6/§2.8); each is expressed so the
  * DuckDB oracle replays the arithmetic bit-for-bit: decimal-exact sums
  * before any double op, identical parenthesization on both sides, and
  * integer/IEEE-exact operations only (sqrt is IEEE-correctly-rounded, so
  * even stddev hash-matches).
  */
object StatsQueries {

  val all: Seq[Q] = Seq(

    // Calendar date-spine gap-fill + forward-fill: dense daily revenue per
    // order priority, missing days carried forward (the standard reporting
    // densification every BI layer needs). The spine is generated IN-PLAN
    // from the global min/max bounds (1-row broadcast, no collect); daily
    // aggregation reduces the fact table before the tiny spine join, so at
    // 100 TB the only large-data work is the one groupBy shuffle.
    Q("q_date_spine",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val daily = o.groupBy(
            col("o_orderpriority").as("priority"),
            to_date(col("o_orderdate")).as("d"))
          .agg(moneySum(col("o_totalprice")).as("revenue"))
        val spine = o.agg(to_date(min(col("o_orderdate"))).as("d0"),
            to_date(max(col("o_orderdate"))).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("d"))
          .crossJoin(o.select(col("o_orderpriority").as("priority")).distinct())
        val w = Window.partitionBy(col("priority")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(broadcast(daily), Seq("priority", "d"), "left")
          .select(
            col("priority"),
            col("d").cast("timestamp_ntz").as("d"),
            col("revenue"),
            last(col("revenue"), ignoreNulls = true).over(w).as("revenue_ff"),
            col("revenue").isNull.as("is_gap"))
      },
      Some("""
        WITH daily AS (
          SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2),
        bounds AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
                          CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
                  FROM bounds),
        pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders)
        SELECT pr.priority, CAST(spine.d AS TIMESTAMP) AS d, daily.revenue,
               last_value(daily.revenue IGNORE NULLS) OVER (
                 PARTITION BY pr.priority ORDER BY spine.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ff,
               daily.revenue IS NULL AS is_gap
        FROM spine CROSS JOIN pr
        LEFT JOIN daily ON daily.priority = pr.priority AND daily.d = spine.d""")),

    // CDC snapshot diff: the per-user latest event value in the first half
    // of the month vs the second half — added / removed / changed /
    // unchanged per user. One full-outer key join; deterministic snapshot
    // rows via (ts, event_id) latest-wins.
    Q("q_cdc_diff",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def snap(lo: String, hi: String) = {
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)
          ev.filter(col("ts") >= lit(lo).cast("timestamp_ntz") &&
              col("ts") < lit(hi).cast("timestamp_ntz"))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(col("user_id"), col("value"))
        }
        SnapshotDiff.diff(
          snap("2024-01-01", "2024-01-16"), snap("2024-01-16", "2024-02-01"),
          keys = Seq("user_id"), compareCols = Seq("value"))
      },
      Some("""
        WITH a AS (
          SELECT user_id, value FROM (
            SELECT user_id, value, row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-16')
          WHERE rn = 1),
        b AS (
          SELECT user_id, value FROM (
            SELECT user_id, value, row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-16' AND ts < TIMESTAMP '2024-02-01')
          WHERE rn = 1)
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
               a.value AS old_value, b.value AS new_value,
               CASE WHEN a.user_id IS NULL THEN 'added'
                    WHEN b.user_id IS NULL THEN 'removed'
                    WHEN a.value IS NOT DISTINCT FROM b.value THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.user_id = b.user_id""")),

    // Exact distribution moments per event type: decimal-exact n / sum /
    // sum-of-squares, then mean, sample variance, and stddev through ONE
    // fixed sequence of IEEE double ops (identical parenthesization in the
    // oracle). Map-side partial aggregation; one shuffle of 3 numbers per
    // group — the canonical moments-sketch shape.
    Q("q_dist_moments",
      (s, dir) => {
        val d = col("value").cast(DecimalType(18, 2))
        val nd = count(lit(1)).cast("double")
        val sd = sum(d).cast("double")
        val ssd = sum((d * d).cast(DecimalType(38, 4))).cast("double")
        t(s, dir, "events").groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            (sd / nd).as("mean"),
            ((ssd - ((sd * sd) / nd)) / (nd - lit(1.0))).as("variance"),
            sqrt((ssd - ((sd * sd) / nd)) / (nd - lit(1.0))).as("stddev"))
      },
      Some("""
        SELECT event_type, count(*) AS n,
               (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) AS mean,
               ((CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
                   - ((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
                      / CAST(count(*) AS DOUBLE)))
                / (CAST(count(*) AS DOUBLE) - 1.0)) AS variance,
               sqrt(((CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
                   - ((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
                      / CAST(count(*) AS DOUBLE)))
                / (CAST(count(*) AS DOUBLE) - 1.0))) AS stddev
        FROM events GROUP BY event_type""")),

    // Mode (most frequent value) per group with a deterministic tie-break —
    // the most common order priority per market segment. Two shuffles:
    // count aggregation, then a window over the (small) group-count frame.
    Q("q_mode_priority",
      (s, dir) => {
        val counts = t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("n_orders").desc, col("o_orderpriority"))
        counts.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
            col("n_orders"))
      },
      Some("""
        SELECT c_mktsegment, o_orderpriority AS mode_priority, n_orders
        FROM (
          SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
                 row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY count(*) DESC, o_orderpriority) AS rn
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment, o_orderpriority)
        WHERE rn = 1""")),

    // Fixed-width histogram of order totals: floor-division binning (exact
    // IEEE division + floor, bit-portable), count + exact revenue + bounds
    // per bin. Pure map-side binning then one aggregation shuffle.
    Q("q_histogram",
      (s, dir) => t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / lit(25000.0)).cast("long").as("bin"))
        .agg(
          count(lit(1)).as("n"),
          moneySum(col("o_totalprice")).as("total"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi")),
      Some("""
        SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM orders GROUP BY 1""")),

    // Exact interpolated quartiles of an integer-valued measure. On
    // integer-valued doubles every interpolation step (frac * (hi - lo),
    // quarter fractions) is IEEE-exact, so Spark's percentile and DuckDB's
    // quantile_cont agree bit-for-bit. For the general-double case the
    // approx sketch family is q_percentiles / q_approx_stats.
    //
    // SCALE CONTRACT — small-group-only, same as q_percentiles: exact
    // `percentile` holds all group values in one single-reducer buffer;
    // beyond bounded groups switch to approx_percentile (q_approx_stats),
    // whose sketch state is fixed-size and mergeable map-side.
    Q("q_quartiles",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.75)").as("q3"),
          count(lit(1)).as("n")),
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q1,
               quantile_cont(l_quantity, 0.5) AS med,
               quantile_cont(l_quantity, 0.75) AS q3,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // Quantile-bucket assignment (equi-depth bucketing done the
    // distributed way): quartile boundaries per BOUNDED group (3 return
    // flags — inside the exact-percentile small-group contract), then a
    // broadcast join + map-only CASE assigns every row its bucket. No
    // global sort, no single-partition window — the shape that survives
    // 100x while `ntile` over a global window does not. Boundaries on
    // integer-valued doubles are IEEE-exact (q_quartiles precedent).
    Q("q_quantile_buckets",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val bounds = li.groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("q1"),
            expr("percentile(l_quantity, 0.5)").as("q2"),
            expr("percentile(l_quantity, 0.75)").as("q3"))
        li.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .join(broadcast(bounds), Seq("l_returnflag"))
          .withColumn("bucket",
            when(col("l_quantity") <= col("q1"), 1)
              .when(col("l_quantity") <= col("q2"), 2)
              .when(col("l_quantity") <= col("q3"), 3)
              .otherwise(4))
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("bucket"))
      },
      Some("""
        WITH b AS (
          SELECT l_returnflag,
                 quantile_cont(l_quantity, 0.25) AS q1,
                 quantile_cont(l_quantity, 0.5) AS q2,
                 quantile_cont(l_quantity, 0.75) AS q3
          FROM lineitem GROUP BY l_returnflag)
        SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_quantity,
               CASE WHEN l.l_quantity <= b.q1 THEN 1
                    WHEN l.l_quantity <= b.q2 THEN 2
                    WHEN l.l_quantity <= b.q3 THEN 3
                    ELSE 4 END AS bucket
        FROM lineitem l JOIN b USING (l_returnflag)""")),

    // Time-RANGE window frame: trailing-24-hour activity per user by actual
    // event time (the ROWS-frame cousin is q_moving_avg). Spark's range
    // frame runs over unix_micros — the same inclusive [t-24h, t] interval
    // DuckDB's RANGE INTERVAL frame uses; the running sum is decimal-exact
    // so peer-order within the frame cannot change the hash.
    Q("q_rolling_24h",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts").cast("timestamp")))
          .rangeBetween(-86400000000L, Window.currentRow)
        t(s, dir, "events").select(
          col("user_id"), col("event_id"), col("ts"),
          count(lit(1)).over(w).as("n_24h"),
          sum(Q.dec2(col("value"))).over(w).cast("double").as("sum_24h"))
      },
      Some("""
        SELECT user_id, event_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_24h,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_24h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)"""))
  )
}
