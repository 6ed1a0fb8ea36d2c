package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Newline-delimited JSON ingestion with cast-or-null permissive loading —
  * the engine twin of the reference's REST-payload JSON landing (crypto /
  * stock / news API responses are JSON before they become raw tables,
  * reference `scripts/data_generation/a2_1_crypto_api_binance.py:60-118`)
  * under the same TRY_TO_* and ON_ERROR='CONTINUE' discipline as `CsvSource`:
  * a malformed line yields a row of typed nulls instead of killing the
  * load, a type-mismatched field yields null in THAT field with the rest
  * of the record intact, and the raw line stays visible in an audit view.
  */
object JsonSource {

  /** Read newline-delimited JSON permissively against a target schema. */
  def readPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Lines that failed to parse cleanly (whole-line garbage or any
    * type-mismatched field), with the original text — the load-error
    * audit (`ON_ERROR='CONTINUE'` visibility).
    */
  def corruptRecords(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val audit = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    // cache() is Spark's sanctioned workaround for
    // UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN: a query that
    // references only the corrupt column against the raw file is
    // disallowed, the parsed-and-cached frame is not. The audit frame is
    // error-sized, so the cache is small by construction.
    spark.read.schema(audit)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
      .filter(col("_corrupt_record").isNotNull)
  }
}
