package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * Design notes (100 TB posture):
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and dynamic broadcast conversion replace hand-tuned partition counts.
  *   - `spark.sql.shuffle.partitions` is a *starting* value (32 locally; on a
  *     real cluster set ~2-3x total cores and let AQE coalesce down).
  *   - Session timezone pinned to UTC: the reference stores naive wall-clock
  *     timestamps (reference `scripts/kafka/kafka_consumer.py:210-245`), so all
  *     timestamp arithmetic must be timezone-stable for oracle parity.
  */
object Graft {

  def session(master: String = "local[*]", app: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(app)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Load one of the driver-provided testdata tables (TESTDATA.md).
    * Explicit parquet scan; Catalyst handles column pruning + filter pushdown.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
