package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka JSON source/sink wiring — the Structured-Streaming twin of the
  * reference's producer/consumer pair (`scripts/kafka/kafka_producer.py:
  * 456-563`, `kafka_consumer.py:447-569`): JSON message values keyed by
  * business id, four topics, micro-batched idempotent ingestion.
  *
  * Requires the `spark-sql-kafka` connector on the classpath at deploy
  * time (not bundled in this build environment — exercised in tests via
  * MemoryStream through the same downstream operators instead).
  */
object KafkaJson {

  /** `readStream` a topic of JSON values into typed columns
    * (`from_json` flattening — the consumer's `json.loads` + column
    * alignment, `kafka_consumer.py:203-245`).
    */
  def stream(spark: SparkSession, servers: String, topic: String, schema: StructType): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .load()
      .select(
        col("key").cast("string").as("message_key"),
        from_json(col("value").cast("string"), schema).as("v"),
        col("timestamp").as("kafka_timestamp"))
      .select(col("message_key"), col("v.*"), col("kafka_timestamp"))

  /** Batch-write rows to a topic keyed by a business-id column
    * (`to_json(struct(*))` — the producer's `json.dumps`,
    * `kafka_producer.py:457-461`).
    */
  def writeBatch(df: DataFrame, servers: String, topic: String, keyCol: String): Unit =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()
}
