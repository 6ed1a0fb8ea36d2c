package graft
import org.apache.spark.sql.SparkSession

/** Per-query timing harness for optimization work:
  * `runMain graft.TimeOne <name>[,<name>...] [reps]` times the named
  * registered queries in isolation with EXACTLY Bench's methodology (same
  * session config, sf0.001 warmup pass, noop sink) so a single query can be
  * measured before/after a change without paying the full 172-line surface.
  * Not part of the driver contract — measurement tooling only (guide §1.1:
  * isolate the expensive query, then optimize that one thing).
  *
  * Memoized-family queries (q_dag_*, the groups family) are preceded by the
  * same warm fills Bench runs when `--warm-shared` is passed, so their lines
  * measure the query, not the shared cache fill; pass `q_dag_warm` /
  * `q_groups_warm` as names to time the fills themselves.
  */
object TimeOne {
  private def run(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val warmShared = args.contains("--warm-shared")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-rep structural metrics (jobs/stages/tasks + shuffle and scan
    // bytes): the quantitative evidence for shuffle-removal claims —
    // sf0.1 wall-clock alone is fixed-cost- and host-noise-dominated
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val inBytes = new java.util.concurrent.atomic.AtomicLong
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]
    val jobStartTs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet()
        jobStartTs.put(e.jobId, (e.time,
          Option(e.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")))
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStartTs.remove(e.jobId)).foreach { case (t0, desc) =>
          jobLog.add((e.jobId, t0, e.time, desc)); ()
        }
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        Option(e.taskMetrics).foreach { m =>
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          ()
        }
      }
    })
    def metricsSnapshot(): Map[String, Long] = {
      // listener events are async; a short settle keeps rep-boundary reads
      // honest (the bus drains in ms at these event volumes)
      Thread.sleep(300)
      Map("jobs" -> nJobs.get, "stages" -> nStages.get, "tasks" -> nTasks.get,
        "shuffle_read" -> shufRead.get, "shuffle_write" -> shufWrite.get,
        "input_bytes" -> inBytes.get)
    }

    val warmDir = "/root/testdata/sf0.001"
    def timeFill(label: String, fill: () => Unit): Unit = {
      val t0 = System.nanoTime()
      fill()
      println(f"[timeone] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    names.filterNot(_.startsWith("--")).foreach { name =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        name match {
          case "q_dag_warm" => (s, d) => { queries.DagQueries.warmShared(s, d); s.emptyDataFrame }
          case "q_groups_warm" => (s, d) => { queries.CorpusQueries.warmGroups(s, d); s.emptyDataFrame }
          case n => SparkEntry.queries(n)
        }
      // warmup at sf0.001 (JIT/codegen), then release warm-dir memos
      if (new java.io.File(warmDir).isDirectory) {
        try run(fn(spark, warmDir)) catch { case _: Throwable => () }
        try queries.DagQueries.releaseMemos(spark, warmDir) catch { case _: Throwable => () }
        try queries.CorpusQueries.releaseMemos(spark, warmDir) catch { case _: Throwable => () }
      }
      if (warmShared && name.startsWith("q_dag_") && name != "q_dag_warm")
        timeFill("(fill) q_dag_warm", () => queries.DagQueries.warmShared(spark, sfDir))
      if (warmShared && Set("q_canonical_selection", "q_dedup_groups", "q_simhash_pairs")(name))
        timeFill("(fill) q_groups_warm", () => queries.CorpusQueries.warmGroups(spark, sfDir))
      val secs = (1 to reps).map { i =>
        // the warm fills are one-shot per (session, dir): re-time them per
        // rep by releasing between reps
        if (name == "q_dag_warm" || name == "q_groups_warm") {
          queries.DagQueries.releaseMemos(spark, sfDir)
          queries.CorpusQueries.releaseMemos(spark, sfDir)
        }
        val before = metricsSnapshot()
        val t0 = System.nanoTime()
        run(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == reps) {
          val after = metricsSnapshot()
          val d = after.map { case (k, v) => k -> (v - before(k)) }
          println(f"[timeone] $name%-28s metrics jobs=${d("jobs")} " +
            f"stages=${d("stages")} tasks=${d("tasks")} " +
            f"shuffle_read=${d("shuffle_read")} shuffle_write=${d("shuffle_write")} " +
            f"input_bytes=${d("input_bytes")}")
          if (args.contains("--jobs")) {
            import scala.jdk.CollectionConverters._
            val js = jobLog.asScala.toSeq.sortBy(_._2)
            val base = js.headOption.map(_._2).getOrElse(0L)
            js.foreach { case (id, t0, t1, desc) =>
              println(f"[timeone]   job $id%4d +${(t0 - base) / 1000.0}%7.2fs " +
                f"${(t1 - t0) / 1000.0}%6.2fs  $desc")
            }
          }
        }
        jobLog.clear()
        dt
      }
      println(f"[timeone] $name%-28s " +
        secs.map(s => f"$s%7.3f").mkString(" ") +
        f"  min=${secs.min}%7.3f med=${secs.sorted.apply(secs.size / 2)}%7.3f")
    }
    spark.stop()
  }
}
