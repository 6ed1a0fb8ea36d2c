package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{ConnectedComponents, TextDedup}
import graft.queries.Q

/** Settle the CC round-count question on the REAL sf0.1 simhash graph
  * (the q_groups_warm workload): run `minLabel` to convergence at several
  * `jumpsPerRound` settings and report rounds + wall seconds for each.
  * One JSON line to stdout; also written to CC_ROUNDS.json (the file is
  * OVERWRITTEN — each run is a complete, self-contained measurement).
  *
  * Usage: `runMain graft.CcRoundsProbe [sfDir] [outPath]`
  */
object CcRoundsProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("/root/repo/CC_ROUNDS.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the exact pair graph q_groups_warm fills: language-blocked simhash
    // near-dup pairs at hamming <= 2 over the documents table
    val fp = TextDedup.simhashFingerprints(
      Q.t(spark, sfDir, "documents"), "doc_id", Seq("lang"),
      TextFns.tokens(col("text"))).persist()
    val a = fp.select(col("lang"), col("doc_id").as("a_id"), col("simhash").as("__ha"))
    val b = fp.select(col("lang").as("lang2"), col("doc_id").as("b_id"), col("simhash").as("__hb"))
    val pairs = a.join(broadcast(b),
        col("lang") === col("lang2") && col("a_id") < col("b_id") &&
        TextDedup.hammingDistance(col("__ha"), col("__hb")) <= 2)
      .select(col("a_id"), col("b_id"))
      .persist()
    val nPairs = pairs.count()

    val runs = Seq(1, 2, 4, 8).map { j =>
      // warm once untimed? No — each run is measured cold-ish; JIT is shared
      val t0 = System.nanoTime()
      val labels = ConnectedComponents.minLabel(pairs, "a_id", "b_id", jumpsPerRound = j)
      val nVerts = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = ConnectedComponents.lastRounds
      ConnectedComponents.releaseResult(labels)
      System.err.println(f"[ccprobe] jumps=$j rounds=$rounds verts=$nVerts ${sec}%.1fs")
      (j, rounds, nVerts, sec)
    }

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val body = runs.map { case (j, r, v, s) =>
      s"""{"jumps_per_round":$j,"rounds":$r,"vertices":$v,"sec":${f(s)}}"""
    }.mkString("[", ",", "]")
    val json = s"""{"sf_dir":"$sfDir","pairs":$nPairs,"runs":$body}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    spark.stop()
    println(json)
  }
}
