package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion with cast-or-null permissive loading — the engine twin of
  * the reference's Snowflake stage COPY with per-column `TRY_TO_*` casts and
  * `ON_ERROR='CONTINUE'` (reference
  * `scripts/data_generation/a1_4_batch_s3_to_snowflake.py:372-467`) and of
  * its header-CSV contract with enforced column order
  * (`a2_0_crypto_common.py:63-84`).
  *
  * Strategy: read every field as string (header-named), then `try_cast`
  * each column to its target type — a malformed cell becomes NULL in that
  * column instead of nulling the whole row (exactly TRY_TO_* semantics,
  * which PERMISSIVE mode alone does not give). Input column order is
  * irrelevant; missing columns become typed nulls, extra columns are
  * dropped — the fixed-column-list alignment of `a1_5:597-613`.
  */
object CsvSource {

  /** Read a header CSV permissively against a target schema. */
  def readPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    val present = raw.columns.toSet
    raw.select(schema.fields.map { f =>
      if (present.contains(f.name))
        col(f.name).try_cast(f.dataType.sql).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Rows that lost at least one non-null raw cell to a failed cast —
    * the load-error audit (`ON_ERROR='CONTINUE'` visibility).
    */
  def castFailures(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    val present = raw.columns.toSet
    val failed = schema.fields.filter(f => present.contains(f.name)).map { f =>
      col(f.name).isNotNull && col(f.name).try_cast(f.dataType.sql).isNull
    }
    if (failed.isEmpty) raw.filter(lit(false))
    else raw.filter(failed.reduce(_ || _))
  }

  /** Write with the reference's enforced-column-order header-CSV contract
    * (`a2_0_crypto_common.py:63-84` — S8).
    */
  def writeOrdered(df: DataFrame, columns: Seq[String], path: String): Unit =
    df.select(columns.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
}
