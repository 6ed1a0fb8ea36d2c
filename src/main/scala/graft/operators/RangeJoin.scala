package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join: match point rows to interval rows with
  * `start <= point < end` (optionally sharing equi-keys).
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin — O(n*m)
  * comparisons even when intervals are short. The scalable formulation
  * BUCKETIZES time: every interval is exploded to the buckets it overlaps,
  * points map to exactly one bucket, and the join becomes an equi-join on
  * (keys..., bucket) with the exact range predicate as a residual filter.
  * Work drops to O(points + intervals x avg_buckets_per_interval), one hash
  * shuffle, no nested loop. `bucketWidth` should be on the order of the
  * typical interval length (wider: more residual comparisons; narrower:
  * more interval replication).
  */
object RangeJoin {

  /** @param points       rows with `ptCol` (numeric/epoch)
    * @param intervals    rows with [`startCol`, `endCol`) half-open
    * @param keys         extra equi-join keys (may be empty)
    * @param bucketWidth  bucket size in the units of `ptCol`
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        // end is exclusive: the end-boundary bucket is only needed when the
        // interval extends into it
        floor((col(endCol) - 1) / bucketWidth))))
    p.join(i, keys :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
