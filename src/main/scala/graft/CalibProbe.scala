package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-class fingerprint probe: times the EXACT calibration workloads the
  * bench embeds (the fixed-work CPU line and the constant-parquet I/O line)
  * K times each inside ONE warm JVM, plus a Spark-free single-thread md5
  * throughput figure. Exists because idle reference pins are host-CLASS
  * constants (Bench.scala: 0.599s CPU / 0.382s I/O, recorded on the
  * r10/r12 host generation) — when the driver recycles the VM onto a new
  * generation, the ratios misread until re-pinned, and a single bench run
  * cannot distinguish "host is uniformly slower" from "a contamination
  * burst hit the calibration line". Repeated same-JVM timings separate the
  * two: a slower-but-quiet host gives a tight distribution at a new level;
  * a noisy neighbour gives a wide one. Run it idle (load1 < 0.3), never
  * concurrently with another Spark main.
  *
  * Usage: `runMain graft.CalibProbe [reps]` — prints one JSON line with
  * min/median/max for both lines; re-pin from the MEDIAN of an idle run
  * (min undershoots: it captures the best-case scheduler alignment, which
  * a mid-bench calibration line never sees).
  *
  * I/O-line semantics differ from Bench's on the FIRST rep only: Bench
  * deliberately leaves q_calibration_io unwarmed to capture page-cache
  * state, so its pin (0.382s) is a steady-idle-cache number. The probe
  * reports its first, unwarmed I/O read separately as `io_cold`; the
  * min/med/max stats cover the REMAINING reps, which are cache-hot
  * steady-state and comparable to each other, not to a cold first read.
  */
object CalibProbe {

  /** Spark-free single-thread md5-chain throughput (M ops/s, ~3s): isolates
    * raw core + memory-path speed from scheduler/stage-dispatch effects.
    * This is the exact probe regime HOST_PROBE_r17.json calibrated (JVM-side
    * quiet gate ~8.9 M/s on the current host generation per
    * CALIB_PROBE_r16.json; 2.0 M/s on the r14 generation) — shared with
    * Bench so its lead/trail host fields and this probe's md5_single_mps
    * are the same measurement by construction. A memory-bandwidth co-tenant
    * (the r17 attempt-3 class) depresses this figure while CPU-bound Spark
    * calibration ticks and guest loadavg still read idle.
    */
  private[graft] def md5SingleMps(): Double =
    try {
      val md = java.security.MessageDigest.getInstance("MD5")
      var h = Array[Byte]('x')
      var n = 0L
      val t0 = System.nanoTime()
      while (System.nanoTime() - t0 < 3e9.toLong) {
        var i = 0
        while (i < 10000) { h = md.digest(h); i += 1 }
        n += 10000
      }
      n / ((System.nanoTime() - t0) / 1e9) / 1e6
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption match {
      case None => 7
      case Some(a) => a.toIntOption.filter(_ >= 2).getOrElse {
        // a stack trace here would replace the JSON line this main exists
        // to print — fail with one readable usage line instead
        System.err.println(s"usage: graft.CalibProbe [reps>=2] — got '$a'")
        sys.exit(2)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // single-thread md5 chain, Spark-free — see md5SingleMps's scaladoc
    val mdSingle = md5SingleMps()

    // identical to Bench.calibCpuFrame — the pin target
    def calibCpuFrame = spark.range(0L, 4000000L, 1L, 64)
      .select((1 to 8).foldLeft(col("id").cast("string"))((c, _) => md5(c)).as("h"))
      .agg(sum(xxhash64(col("h")).cast("decimal(38,0)")).as("s"))
    // identical to Bench's calibrationIo read side (dir created if absent)
    val ioDir = sys.env.getOrElse("SPARK_GRAFT_CALIB_IO_DIR", "/tmp/graft_calib_io")
    if (!new java.io.File(ioDir, "_SUCCESS").isFile)
      spark.range(0L, 8000000L, 1L, 32)
        .select(col("id"), xxhash64(col("id")).as("h"),
          md5(col("id").cast("string")).as("s"))
        .write.option("compression", "none").mode("overwrite").parquet(ioDir)

    def time(work: => Unit): Double = {
      val t0 = System.nanoTime(); work; (System.nanoTime() - t0) / 1e9
    }
    def run(w: => org.apache.spark.sql.DataFrame): Unit = {
      w.write.format("noop").mode("overwrite").save()
    }
    // CPU line: one untimed warmup (JIT + codegen cache), like the bench's
    // lead line. I/O line: NO warmup — rep 1 is the cold read (the state
    // Bench's unwarmed line measures); reps 2..n are cache-hot steady-state
    // (see the scaladoc — the two regimes must not be pooled in one stat).
    run(calibCpuFrame)
    val cpu = (1 to reps).map(_ => time(run(calibCpuFrame)))
    val ioAll = (1 to reps).map(_ => time(run(spark.read.parquet(ioDir))))
    val ioCold = ioAll.head
    val io = ioAll.tail
    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      (s.head, s(s.size / 2), s.last)
    }
    val (cmin, cmed, cmax) = stats(cpu)
    val (imin, imed, imax) = stats(io)
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val load1 =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    spark.stop()
    println(s"""{"reps":$reps,"md5_single_mps":${f(mdSingle)},""" +
      s""""cpu_min":${f(cmin)},"cpu_med":${f(cmed)},"cpu_max":${f(cmax)},""" +
      s""""io_cold":${f(ioCold)},""" +
      s""""io_hot_min":${f(imin)},"io_hot_med":${f(imed)},"io_hot_max":${f(imax)},""" +
      s""""all_cpu":[${cpu.map(f).mkString(",")}],"all_io":[${ioAll.map(f).mkString(",")}],""" +
      s""""load1_end":${f(load1)}}""")
  }
}
