package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /** Deterministic stub for media frame-count probing (stands in for
    * reading a container header): derived from payload length.
    */
  private def frameCount(nBytes: Column): Column = pmod(nBytes, lit(7)) + 1

  /** Frame sampling for video-like payloads: emit one row per sampled frame
    * (every `stride`-th of the payload's frames), with a per-frame content
    * key. The real decoder would emit frame bytes; the stub emits a
    * deterministic frame checksum. One-to-many generator shape: a pure
    * codegen explode, no shuffle — at 100 TB this is the stage that
    * multiplies rows, so it must never force a pre-shuffle.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("__nf", frameCount(length(col("content"))))
      .select(
        col("doc_id"), col("media_type"),
        explode(sequence(lit(0), col("__nf") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_checksum",
        md5(concat(col("doc_id").cast("string"), lit("|"), col("frame_idx").cast("string"))))

  /** Resize declaration for image-like payloads: records target geometry
    * alongside the payload; the batched decode stage (`extractFeatures`)
    * is where a real implementation would apply it. Plumbing contract:
    * geometry travels as columns, not closure state, so it survives
    * serialization and per-partition batching.
    */
  def withResizeSpec(media: DataFrame, width: Int, height: Int): DataFrame =
    media
      .withColumn("target_width", lit(width))
      .withColumn("target_height", lit(height))

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
