package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-table persistence: date-partitioned parquet layout so incremental
  * watermark scans partition-prune.
  *
  * Mirrors the reference's TimescaleDB hypertable chunking on
  * `load_timestamp` (`a1_5_batch_s3_to_postgres.py:383-411`) — SURVEY §4:
  * a table partitioned by `load_date=date(load_timestamp)` turns the
  * watermark predicate `load_timestamp > wm` into a directory-level prune
  * (the scan's PartitionFilters), so a daily incremental run reads one or
  * two partitions of a years-deep table instead of all of it. The optional
  * sort-within-partitions mirrors the hypertable's
  * `segmentby/orderby` compression layout (`compress_hypertable.sql:15-19`)
  * for run-length-friendly parquet encoding.
  */
object TablePersist {

  /** Append `df` partitioned by the date of `tsCol`.
    *
    * Rows are CLUSTERED by the partition value before the write (guide §6:
    * hash write distribution): a partitionBy writer opens one file per
    * date value per task, so an N-way-parallel upstream otherwise writes
    * up to N small files into every date directory — paid again by every
    * later scan (listing + per-file open). One shuffle at write time keeps
    * file count ≈ date count at any upstream parallelism.
    */
  def appendPartitioned(
      df: DataFrame,
      path: String,
      tsCol: String,
      sortCols: Seq[String] = Seq()): Unit = {
    val withDate = df.withColumn("load_date", to_date(col(tsCol)))
      .repartition(col("load_date"))
    val arranged =
      if (sortCols.nonEmpty) withDate.sortWithinPartitions(sortCols.map(col): _*)
      else withDate
    arranged.write.mode("append").partitionBy("load_date").parquet(path)
  }

  /** Read a partitioned table; `load_date` predicates prune directories. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental watermark scan over a partitioned table: adds the
    * date-level predicate derived from the watermark so pruning applies,
    * then the exact timestamp filter.
    */
  def aboveWatermarkPruned(
      source: DataFrame,
      wmCol: String,
      watermark: java.sql.Timestamp): DataFrame =
    source
      .filter(col("load_date") >= to_date(lit(watermark)))
      .filter(col(wmCol) > lit(watermark))
}
