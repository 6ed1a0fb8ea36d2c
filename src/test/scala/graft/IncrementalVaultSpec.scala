package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing
import graft.operators.{Incremental, Scd2}
import graft.vault.DataVault

/** Two-load incremental vault evolution — the reference's signature
  * behavior (SURVEY §2.2 + J7 + J8) as an integrated flow: watermark scan
  * selects the new raw rows, hubs insert only unseen keys, satellites
  * insert only changed hashdiffs, and the SCD2 mart recomputed over the
  * grown satellite shows the new version chain.
  */
class IncrementalVaultSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // load 1 at 10:00, load 2 at 11:00: c1 unchanged, c2 tier changes,
  // c3 is brand new
  private val load1 = Seq(
    ("c1", "BRONZE", ts("2024-01-01 10:00:00")),
    ("c2", "SILVER", ts("2024-01-01 10:00:00"))
  ).toDF("customer_id", "tier", "load_timestamp")
  private val load2 = Seq(
    ("c1", "BRONZE", ts("2024-01-01 11:00:00")),
    ("c2", "GOLD", ts("2024-01-01 11:00:00")),
    ("c3", "BRONZE", ts("2024-01-01 11:00:00"))
  ).toDF("customer_id", "tier", "load_timestamp")

  private def hub(src: DataFrame) = DataVault.hub(src, Seq("customer_id"), "customer_hk",
    "load_timestamp", lit("TEST"), Seq(col("load_timestamp"), col("customer_id")))
  private def sat(src: DataFrame) = DataVault.satellite(src, Seq("customer_id"), "customer_hk",
    Seq("customer_id", "tier"), "load_timestamp")

  test("watermark scan admits only the second load") {
    val allRaw = load1.unionByName(load2)
    val incoming = Incremental.aboveWatermark(allRaw, load1, "load_timestamp")
    assert(incoming.count() === 3)
    assert(incoming.select(min($"load_timestamp")).as[Timestamp].head() === ts("2024-01-01 11:00:00"))
  }

  test("hub inserts only the unseen business key (J7)") {
    val hub1 = hub(load1)
    val inserts = Incremental.newKeys(hub(load2), hub1, Seq("customer_hk"))
    assert(inserts.select("customer_id").as[String].collect().toSeq === Seq("c3"))
    // resulting hub still has one row per key
    val grown = hub1.unionByName(inserts)
    assert(grown.count() === 3)
  }

  test("satellite inserts only changed hashdiffs (J8)") {
    val sat1 = sat(load1)
    val inserts = Incremental.changedRows(sat(load2), sat1, "customer_hk", "hashdiff")
    // c1 unchanged -> blocked; c2 changed tier -> insert; c3 new -> insert
    assert(inserts.select("customer_id", "tier").as[(String, String)].collect().toSet
      === Set(("c2", "GOLD"), ("c3", "BRONZE")))

    // replaying the same load inserts nothing (idempotence)
    val grown = sat1.unionByName(inserts)
    assert(Incremental.changedRows(sat(load2), grown, "customer_hk", "hashdiff").count() === 0)
  }

  test("SCD2 recompute over the grown satellite shows the version chain") {
    val grown = sat(load1).unionByName(
      Incremental.changedRows(sat(load2), sat(load1), "customer_hk", "hashdiff"))
    val history = Scd2.intervals(grown, Seq("customer_hk"), "load_timestamp",
      Seq(col("load_timestamp")))
    val c2 = history.filter($"customer_id" === "c2").orderBy("effective_from")
      .select("tier", "is_current").as[(String, Boolean)].collect().toSeq
    assert(c2 === Seq(("SILVER", false), ("GOLD", true)))
    // c1 has exactly one (current) version despite appearing in both loads
    assert(history.filter($"customer_id" === "c1").count() === 1)
  }

  test("surrogate keys are stable across loads (same key, same hash)") {
    val k1 = hub(load1).filter($"customer_id" === "c1").select("customer_hk").as[String].head()
    val k2 = hub(load2).filter($"customer_id" === "c1").select("customer_hk").as[String].head()
    assert(k1 === k2 && k1 === {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest("c1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    })
  }
}
