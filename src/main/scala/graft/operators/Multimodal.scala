package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata travelling
  * alongside; decode / feature extraction runs as a *batched* per-partition
  * stage so a real decoder (JNI image lib, ffmpeg bindings, ONNX runtime)
  * amortizes model/library init once per partition, not per row.
  *
  * The decode step itself is STUBBED (this container has no media
  * libraries): `decodeStub` derives deterministic pseudo-features from the
  * bytes. Everything around it — the schema contract, the partitioning, the
  * batched iterator shape, the feature schema — is the real production
  * plumbing and is tested.
  *
  * Scale notes: payload columns dominate I/O, so feature extraction selects
  * only (id, content) before the mapPartitions stage (column pruning reaches
  * the parquet scan), and the stage is map-only — no shuffle. Repartition
  * upstream only if payload skew demands it.
  */
object Multimodal {

  /** Schema of an extracted-feature row. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("feature_0", DoubleType, nullable = true)))

  /** Wrap a text corpus as binary media rows (id, media_type, content).
    * Stands in for reading real image/audio blobs; `encode` produces the
    * opaque byte payload.
    */
  def asBinaryMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"))

  /** STUB decoder — stands in for image decode / audio resample / frame
    * sampling. Deterministic: first byte scaled to [0,1]. A real deployment
    * replaces only this function.
    */
  private def decodeStub(content: Array[Byte]): Option[Double] =
    if (content.isEmpty) None else Some((content(0) & 0xff) / 255.0)

  /** Batched per-partition feature extraction over (doc_id, media_type,
    * content) rows. The md5 checksum is computed Spark-side (codegen) before
    * the partition stage; byte-dependent features inside it.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val withMeta = media.select(
      col("doc_id"), col("media_type"),
      col("content"),
      md5(col("content")).as("checksum"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    withMeta.mapPartitions { rows =>
      // one decoder init per partition would go here (model load, etc.)
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        Row(
          r.getAs[Long]("doc_id"),
          r.getAs[String]("media_type"),
          content.length.toLong,
          r.getAs[String]("checksum"),
          decodeStub(content).orNull)
      }
    }(enc)
  }
}
