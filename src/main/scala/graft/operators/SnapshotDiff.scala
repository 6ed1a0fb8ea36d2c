package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style diff of two keyed snapshots: which keys were added, removed,
  * changed, or unchanged between version A and version B.
  *
  * The reference maintains change history implicitly through hashdiff
  * satellites and SCD2 intervals (`models/warehouse/sats/sat_customer_details
  * .sql:18-31`); this operator answers the converse operational question —
  * "what changed between yesterday's snapshot and today's?" — that every
  * incremental pipeline asks when validating a load.
  *
  * Design for 100 TB: ONE full-outer shuffle join on the key columns (both
  * sides shuffle-partitioned by key; with both snapshots bucketed by key it
  * is zero-shuffle, see `core/Bucketing`). Comparison is null-safe (`<=>`)
  * per compared column, all inside codegen — no UDFs, no row materialization.
  */
object SnapshotDiff {

  /** Diff `newSnap` against `oldSnap` on `keys`, comparing `compareCols`.
    * Output: keys*, old_/new_-prefixed compare columns, and `status` ∈
    * {added, removed, changed, unchanged}.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")

    val o = compareCols.foldLeft(oldSnap.select((keys ++ compareCols).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"old_$c")
    }.withColumn("__in_old", lit(true))
    val n = compareCols.foldLeft(newSnap.select((keys ++ compareCols).map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"new_$c")
    }.withColumn("__in_new", lit(true))

    val same = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)

    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__in_old", "__in_new")
  }
}
