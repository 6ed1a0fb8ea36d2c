package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** Isolated at-scale demonstration that bucketed co-location closes the
  * broadcast→shuffle transition (r14 verdict task #4).
  *
  * Background: on the replicated factor-100 corpus the star-join dims grow
  * with factor, customer crosses `spark.sql.autoBroadcastJoinThreshold`
  * between f50 and f100, and AQE correctly degrades the orders⋈customer
  * join broadcast→shuffle — the ~4x step `q_star_join_revenue` (and its
  * q_svc_* siblings riding the same dims) showed in BENCH_SF10. The
  * claimed at-scale answer is bucketed co-location: pay one shuffle at
  * write time, join exchange-free forever after. `q_bucketed_join` proves
  * the VALUES at every gated factor and BucketingSpec proves the
  * plan shape with broadcast disabled; this probe supplies the missing
  * at-scale NUMBERS on the exact dim pair that crossed the threshold.
  *
  * Times, at SPARK_GRAFT_SF_DIR (intended: /tmp/graft_sf10r, factor 100):
  *   1. `write_sec` — one-time bucketed write of orders + customer on
  *      custkey (the amortized cost),
  *   2. `bucket_join_sec` — bucketed join + mktsegment rollup through the
  *      noop sink; the executed plan is asserted exchange-free and the
  *      assertion result is emitted as `exchange_free`,
  *   3. `plain_shuffle_sec` — the same join from the raw parquet with
  *      broadcast DISABLED: the dims-too-big regime every 100 TB cluster
  *      is in, and the regime f100 put this dim pair in,
  *   4. `plain_auto_sec` — same with the default threshold (whatever AQE
  *      picks at this factor; equals the in-bench line's plan).
  * Each timed twice (min reported, both reps in `*_reps`): on this host
  * class minute-scale contention bursts can inflate any single timing.
  * `amortize_after` = write_sec / (plain_shuffle_sec − bucket_join_sec):
  * the number of joins after which the one-time bucketing has paid for
  * itself. `values_match` cross-checks the two join results (5-row agg).
  *
  * Run it idle, never concurrently with another Spark main.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
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

    def load1Now(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val load1Start = load1Now()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(work: => Unit): Double = {
      val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
    }
    def rollup(joined: DataFrame): DataFrame =
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), Q.moneySum(col("o_totalprice")).as("total"))

    // same table pair and agg as q_bucketed_join (whose oracle carries the
    // value contract at every gated factor); 32 buckets = one bucket per
    // core at the probe's parallelism, ~470k orders rows per bucket at f100
    val buckets = sys.env.get("SPARK_GRAFT_BUCKETS").flatMap(_.toIntOption).getOrElse(32)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq("bp_orders", "bp_customer").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$tbl")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    def orders = Q.t(spark, sfDir, "orders").withColumnRenamed("o_custkey", "ck")
    def customer = Q.t(spark, sfDir, "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment"))

    val writeSec = time {
      graft.core.Bucketing.writeBucketed(orders, "bp_orders", "ck", buckets)
      graft.core.Bucketing.writeBucketed(customer, "bp_customer", "ck", buckets)
    }

    def bucketJoined =
      rollup(graft.core.Bucketing.bucketJoin(spark, "bp_orders", "bp_customer", "ck"))
    // the plan-shape claim, checked on the BARE join (the rollup's own
    // aggregation exchange on c_mktsegment is legitimate and unrelated):
    // no shuffle on either side of the bucketed join, with broadcast
    // disabled so the planner can't sidestep the question at factors
    // where the dim still fits
    // restore the SAVED prior threshold, not a hardcoded default: hardcoding
    // would clobber a non-default session conf and make plain_auto_sec
    // silently measure the hardcode instead of the session's setting
    val savedBroadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val exchangeFree = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = graft.core.Bucketing
          .bucketJoin(spark, "bp_orders", "bp_customer", "ck")
          .queryExecution.executedPlan.toString
        !plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcastThreshold)
    }

    def timedReps(work: => Unit): Seq[Double] = (1 to 2).map(_ => time(work))
    val bucketReps = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try timedReps(noop(bucketJoined))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcastThreshold)
    }
    def plainJoined = rollup(orders.join(customer, "ck"))
    val shuffleReps = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try timedReps(noop(plainJoined))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcastThreshold)
    }
    val autoReps = timedReps(noop(plainJoined))

    // 5-row agg: cheap driver-side cross-check that co-location changed the
    // plan, not the answer (the full value contract is q_bucketed_join's)
    val valuesMatch = {
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      rows(bucketJoined) == rows(plainJoined)
    }

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val bucketSec = bucketReps.min
    val shuffleSec = shuffleReps.min
    val saved = shuffleSec - bucketSec
    val amortize = if (saved > 0) f(writeSec / saved) else "-1"
    val sfName = new java.io.File(sfDir).getName
    spark.stop()
    println(s"""{"sf":"$sfName","cpus":$cpus,"buckets":$buckets,"load1_start":${f(load1Start)},""" +
      s""""write_sec":${f(writeSec)},"bucket_join_sec":${f(bucketSec)},""" +
      s""""plain_shuffle_sec":${f(shuffleSec)},"plain_auto_sec":${f(autoReps.min)},""" +
      s""""bucket_reps":[${bucketReps.map(f).mkString(",")}],""" +
      s""""shuffle_reps":[${shuffleReps.map(f).mkString(",")}],""" +
      s""""auto_reps":[${autoReps.map(f).mkString(",")}],""" +
      s""""exchange_free":$exchangeFree,"values_match":$valuesMatch,""" +
      s""""amortize_after":$amortize}""")
  }
}
