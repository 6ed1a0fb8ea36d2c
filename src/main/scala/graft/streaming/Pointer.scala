package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic current-version pointer for versioned parquet publishes: readers
  * follow a `_current` marker file that is repointed with an atomic rename,
  * so they never observe a partially-written version directory. Shared by
  * the mart `Refresh` runner and the streaming SCD2 sink.
  */
object Pointer {

  /** Atomically (re)point `markerPath` at `target`. */
  def write(spark: SparkSession, markerPath: String, target: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(markerPath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(marker.toString + ".tmp")
    val os = fs.create(tmp, true)
    os.write(target.getBytes("UTF-8"))
    os.close()
    // atomic replace (plain FileSystem.rename refuses existing targets)
    org.apache.hadoop.fs.FileContext.getFileContext(marker.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The path `markerPath` currently points at, if the marker exists. */
  def read(spark: SparkSession, markerPath: String): Option[String] = {
    val marker = new org.apache.hadoop.fs.Path(markerPath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  /** Read the parquet version the marker points at. */
  def currentTable(spark: SparkSession, markerPath: String): Option[DataFrame] =
    read(spark, markerPath).map(spark.read.parquet(_))
}
