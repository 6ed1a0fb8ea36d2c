package graft
import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds:
  * `runMain graft.PlanDump <name>[,<name>...] <outDir> <tag> [sfDir]`
  * writes `<outDir>/<name>_<tag>.txt` with the formatted physical plan of
  * each registered query (the `.explain("formatted")` text the judge checks
  * plan claims against), under Bench's own session config so join
  * strategies/partition counts match what the bench actually runs.
  * Measurement tooling only — not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val tag = args(2)
    val sfDir = if (args.length > 3) args(3) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) + "\n")
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
