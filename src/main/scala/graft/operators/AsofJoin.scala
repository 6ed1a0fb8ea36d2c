package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding-key) join: attach to each left row the most
  * recent right row with `rightTs <= leftTs` within the same key group —
  * the standard way to join events to the prevailing quote/price/state.
  *
  * Spark has no native ASOF JOIN; the scalable formulation here is the
  * union-and-carry-forward pattern:
  *   1. tag and union both sides (cheap, no shuffle);
  *   2. ONE shuffle+sort per key on (ts, side-order);
  *   3. `last(value, ignoreNulls)` over rows-unbounded-preceding carries the
  *      latest right-side payload forward to each left row.
  *
  * Compared to the naive approach (theta join `r.ts <= l.ts` + max
  * per-pair), which explodes to O(|L|x|R|) per key, this is O(|L|+|R|)
  * with a single exchange — the same cost profile as a window function.
  * Right-side ties on (key, ts): the LAST by `tieBreak` wins.
  */
object AsofJoin {

  /** @param left      probe side (keeps all rows and columns)
    * @param right     quote side: (keys..., rightTs, payload columns)
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   right-side columns to carry onto left rows
    * @param tieBreak  right-side tiebreaker for equal timestamps
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val k = keys.map(col)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal ts
      .withColumn("__tie", lit(null).cast("long"))
      .select(k ++ Seq(col("__ts"), col("__side"), col("__tie")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)

    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.cast("long"))
      .select(k ++ Seq(col("__ts"), col("__side"), col("__tie")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(k: _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)

    l.unionByName(r)
      .select((col("*") +: payload.map(c =>
        last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => col(s"asof_$c")): _*)
  }
}
