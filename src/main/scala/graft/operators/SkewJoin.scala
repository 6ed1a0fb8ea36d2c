package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual escape hatch for key
  * distributions too extreme for AQE's skew-join splitting (AQE only splits
  * sort-merge partitions; a single hot key hashed to one task can still
  * straggle).
  *
  * Mechanics: the skewed (large) side gets a random salt in [0, factor);
  * the small side is replicated `factor` times with every salt value; the
  * join key becomes (key, salt), spreading each hot key over `factor`
  * tasks. Correctness: every (key, salt) pair on the left finds exactly the
  * one replicated right row with that salt -> same join result, `factor`-way
  * parallel.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `keys`, spreading each left key
    * over `factor` tasks. `small` is replicated factor-fold — keep it the
    * dimension side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(monotonically_increasing_id(), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Skew-safe aggregation: two-phase partial/final over a salted key. The
    * first groupBy spreads a hot key across `factor` partial groups, the
    * second merges the partials — sum/count/min/max compose; avg must be
    * decomposed by the caller into sum+count.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column, factor: Int): DataFrame = {
    val k = keys.map(col)
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(factor)).cast("int"))
      .groupBy(k :+ col("__salt"): _*)
      .agg(sum(valueCol).as("__s"), count(lit(1)).as("__c"))
      .groupBy(k: _*)
      .agg(sum(col("__s")).as("total"), sum(col("__c")).as("n"))
  }
}
