package graft
import org.apache.spark.sql.SparkSession

/** Plan auditing: `runMain graft.Explain <query_name> [sfDir]` prints the
  * formatted physical plan of a registered query (see tools/explain.md).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // run THIS QueryExecution (df.write would plan a fresh one), then print
    // the FINAL adaptive plan — exchange/stage reuse and AQE join/skew
    // re-planning only appear after stage materialization
    df.queryExecution.toRdd.foreach(_ => ())
    println("\n== Final adaptive plan ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
