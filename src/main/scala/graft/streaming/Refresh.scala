package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Downstream refresh runner — the engine twin of the reference's 5-minute
  * incremental dbt deployment (`prefect.yaml:37-42`,
  * `scripts/flow/b1_1_trino_incremental_dbt.py:64-120`): after new raw data
  * lands, recompute the affected downstream closure (vault + marts are
  * *recomputed views* in the reference — SURVEY §7.4.6 — so a refresh is a
  * plain batch rebuild, which is also the only ordering under which SCD2
  * `lead` stays correct).
  *
  * The mart set is declared as names -> builder functions over the current
  * session; `tick()` rebuilds and atomically republishes each mart (write to
  * a versioned directory, then repoint — readers of the published path never
  * observe partial output). A production deployment drives `tick` from its
  * scheduler (the reference uses cron); tests drive it directly.
  */
final class Refresh(
    spark: SparkSession,
    marts: Map[String, SparkSession => DataFrame],
    publishBase: String) {

  @volatile private var version = 0L

  /** Rebuild every mart and republish. Returns the published paths. */
  def tick(): Map[String, String] = {
    val v = version + 1
    val out = marts.map { case (name, build) =>
      val path = s"$publishBase/$name/v$v"
      build(spark).write.mode("overwrite").parquet(path)
      name -> path
    }
    version = v
    // repoint the "current" markers only after every mart of this version
    // landed, so a refresh is all-or-nothing for downstream readers
    out.foreach { case (name, path) =>
      Pointer.write(spark, s"$publishBase/$name/_current", path)
    }
    out
  }

  /** Read the currently-published version of a mart. */
  def current(name: String): DataFrame =
    Pointer.currentTable(spark, s"$publishBase/$name/_current")
      .getOrElse(sys.error(s"no published version of $name"))
}
