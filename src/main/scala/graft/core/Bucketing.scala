package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * repeated equi-joins/aggregations on the bucket key run with NO exchange.
  *
  * This is the Spark equivalent of the reference's decision to cluster
  * storage by entity (TimescaleDB hypertables segmented by `company_id`,
  * `scripts/compress_hypertable.sql:15-19`): pay the partitioning cost once
  * at load, amortize it over every downstream join. At 100 TB a bucketed
  * fact ⋈ bucketed dim on the bucket key is a zero-shuffle zip of
  * co-located buckets — the single biggest join win available.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so one bucket of the LARGEST table fits an executor's memory
    * comfortably (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket pre-pruning).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — planner emits
    * SortMergeJoin with NO ShuffleExchange on either side.
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
