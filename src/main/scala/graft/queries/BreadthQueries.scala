package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, ZOrder}
import Q.{dec2, t}

/** SQL-surface breadth beyond the reference's own queries: the ranking /
  * distribution window family, GROUPING SETS, UNPIVOT (wide→long melt),
  * and higher-order array functions over the embedding column.
  *
  * The reference's analysts reach these through Snowflake/Trino SQL
  * (SURVEY §2.6/§2.8 lists the subset its models use); a user switching to
  * this engine keeps the full surface. All four are single-pass,
  * shuffle-minimal plans: the window suite is one shuffle on the partition
  * key, GROUPING SETS expands inside one aggregate (no re-scan per set),
  * UNPIVOT is a shuffle-free generator, and the array HOFs are map-only
  * codegen'd expressions — each shape survives a 100× scale-up unchanged.
  */
object BreadthQueries {

  val all: Seq[Q] = Seq(

    // Ranking + distribution window functions (dense_rank / ntile /
    // percent_rank / cume_dist / first_value / lead) in one window pass.
    // The order key (o_orderdate, o_orderkey) is unique per partition, so
    // every function is deterministic; percent_rank and cume_dist are
    // small-integer divisions — bit-portable across engines.
    Q("q_window_suite",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          first(col("o_totalprice")).over(w).as("first_price"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(dense_rank() OVER w AS INT) AS drank,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               percent_rank() OVER w AS prank,
               cume_dist() OVER w AS cdist,
               first_value(o_totalprice) OVER w AS first_price,
               lead(o_orderkey, 1) OVER w AS next_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // GROUPING SETS with two non-hierarchical sets — one aggregate expand,
    // not a union of re-scans (rollup/cube are the hierarchical cousins,
    // q_rollup_customers / q_cube_orders).
    Q("q_grouping_sets",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupingSets(
            Seq(Seq(col("c_mktsegment")), Seq(col("n_name"))),
            col("c_mktsegment"), col("n_name"))
          .agg(
            grouping(col("c_mktsegment")).as("g_seg"),
            grouping(col("n_name")).as("g_nation"),
            count(lit(1)).as("n_customers"),
            sum(dec2(col("c_acctbal"))).cast("double").as("total_acctbal"))
      },
      Some("""
        SELECT c_mktsegment, n_name,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))""")),

    // UNPIVOT (wide→long melt) — feature-table normalization for training
    // pipelines. Shuffle-free: each input row expands in place.
    Q("q_unpivot",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")),
          "metric", "value"),
      Some("""
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part""")),

    // Higher-order array functions over the embedding column — transform /
    // filter / exists / aggregate (sequential left fold) / zip_with, all
    // codegen'd map-only expressions (zero shuffle, zero UDFs). The folds
    // replay bit-exact in DuckDB's list_reduce (same left-to-right order);
    // every fold term is non-negative so no -0.0 ambiguity can enter the
    // first fold step (DuckDB's 2-arg list_reduce has no explicit init).
    Q("q_array_hof",
      (s, dir) => {
        val vec = transform(col("embedding"), x => x.cast("double"))
        t(s, dir, "embeddings").select(
          col("vec_id"),
          size(filter(vec, x => x > 0)).as("n_pos"),
          exists(vec, x => x > lit(3.0)).as("has_big"),
          aggregate(transform(vec, x => abs(x)), lit(0.0), (a, x) => a + x).as("l1"),
          aggregate(zip_with(vec, reverse(vec), (a, b) => (a - b) * (a - b)),
            lit(0.0), (a, x) => a + x).as("dist_rev_sq"),
          array_max(vec).as("vmax"),
          element_at(vec, 1).as("first_val"))
      },
      Some("""
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
                   FROM embeddings)
        SELECT vec_id,
               CAST(len(list_filter(vec, x -> x > 0)) AS INT) AS n_pos,
               len(list_filter(vec, x -> x > 3.0)) > 0 AS has_big,
               list_reduce(list_transform(vec, x -> abs(x)), (a, x) -> a + x) AS l1,
               list_reduce(list_transform(range(1, 65),
                             i -> (vec[i] - vec[65 - i]) * (vec[i] - vec[65 - i])),
                           (a, x) -> a + x) AS dist_rev_sq,
               list_max(vec) AS vmax,
               vec[1] AS first_val
        FROM v""")),

    // Bloom-accelerated new-key detection: event actors never seen in the
    // customer dimension. The broadcast Bloom bitmap prunes provably-absent
    // keys map-side; only "maybe" keys reach the exact anti-join — same
    // result as the plain anti-join (the oracle), radically less shuffle
    // at 100 TB. No-false-negative + pruning-rate contracts: BloomPruneSpec.
    // (The registered-key set is restricted to c_custkey % 5 != 0 so both
    // paths carry rows: known actors get Bloom-pruned map-side, the ~20%
    // unknown slice flows through certain-new or the exact verify join.)
    Q("q_bloom_new_keys",
      (s, dir) => BloomPrune.newKeys(
        t(s, dir, "events"), "user_id",
        t(s, dir, "customer").filter(col("c_custkey") % 5 =!= 0), "c_custkey"),
      Some("""
        SELECT DISTINCT user_id FROM events
        WHERE user_id IS NOT NULL
          AND user_id NOT IN (SELECT c_custkey FROM customer
                              WHERE c_custkey IS NOT NULL AND c_custkey % 5 <> 0)""")),

    // Z-order (Morton) clustering key over (customer, order-day) — the
    // multi-dimensional layout step that gives parquet min/max pruning
    // locality on BOTH dimensions (see operators/ZOrder). The mask-spread
    // construction is pure `& | <<` integer arithmetic, map-only and
    // codegen'd, so the oracle replays every z-value bit-for-bit.
    Q("q_zorder_keys",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        ZOrder.zvalue2(
          col("o_custkey") % 65536,
          (datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date")) % 65536)
            .cast("long")).as("zval")),
      Some("""
        WITH b0 AS (
          SELECT o_orderkey,
                 CAST(o_custkey % 65536 AS BIGINT) AS x,
                 CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) % 65536 AS BIGINT) AS y
          FROM orders),
        b1 AS (SELECT o_orderkey, ((x | (x << 8)) & 16711935) AS x,
                      ((y | (y << 8)) & 16711935) AS y FROM b0),
        b2 AS (SELECT o_orderkey, ((x | (x << 4)) & 252645135) AS x,
                      ((y | (y << 4)) & 252645135) AS y FROM b1),
        b3 AS (SELECT o_orderkey, ((x | (x << 2)) & 858993459) AS x,
                      ((y | (y << 2)) & 858993459) AS y FROM b2),
        b4 AS (SELECT o_orderkey, ((x | (x << 1)) & 1431655765) AS x,
                      ((y | (y << 1)) & 1431655765) AS y FROM b3)
        SELECT o_orderkey, (x | (y << 1)) AS zval FROM b4"""))
  )
}
