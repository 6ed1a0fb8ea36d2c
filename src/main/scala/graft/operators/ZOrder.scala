package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional data layout: interleave the bits of
  * several clustering keys into one sort key so that range predicates on
  * ANY of the dimensions map to a bounded number of contiguous z-ranges.
  *
  * Why it matters at 100 TB: parquet scan pruning is driven by per-file
  * min/max statistics. A table sorted by (a) alone prunes predicates on
  * `a` but scatters `b` uniformly through every file; z-ordering by (a, b)
  * gives BOTH predicates locality, so a selective filter on either
  * dimension skips most files. This is the layout step the reference
  * cannot express at all (Postgres heap / Snowflake auto-cluster are
  * opaque); here it is an explicit, testable operator.
  *
  * The encoding is pure integer bit arithmetic (the classic mask-spread
  * Morton construction — public domain bit-twiddling), expressed as
  * codegen'd Column operations: no UDF, map-only, and bit-for-bit
  * reproducible in any engine with `& | <<` — which is what lets the
  * oracle hash-verify the z-values.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (0 <= c < 65536; caller masks).
    */
  private def part1by1(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(65535L))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit dimensions: x bits at even positions,
    * y bits at odd. Total order over the (x, y) grid; bijective on
    * [0, 65536)². */
  def zvalue2(x: Column, y: Column): Column =
    part1by1(x).bitwiseOR(shiftleft(part1by1(y), 1))

  /** Re-layout `df` clustered by the z-order of two integer dimensions:
    * range-partition on the z-value (contiguous z-ranges per partition →
    * tight per-file min/max on BOTH dimensions), sort within partitions.
    * The z-value column is kept (`zCol`) so downstream writers can range
    * prune on it; drop it after write if undesired.
    */
  def layoutBy2(
      df: DataFrame,
      x: Column,
      y: Column,
      numPartitions: Int,
      zCol: String = "zval"): DataFrame = {
    val withZ = df.withColumn(zCol, zvalue2(x, y))
    withZ.repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
