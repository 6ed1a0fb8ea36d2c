package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's incremental-load machinery, Spark-first.
  *
  * Three primitives (SURVEY §2.2, J7, J8):
  *   1. high-watermark scan: `where wm > (select coalesce(max(wm), '1900-01-01')
  *      from target)` — every raw model, e.g. reference
  *      `models/raw_sf/raw_customers.sql:26-30`;
  *   2. key anti-join: `where hk not in (select hk from target)` — every
  *      hub/link, e.g. `hub_customer.sql:34-36`;
  *   3. hashdiff anti-join: `where not exists (select 1 from target t where
  *      t.hk = r.hk and t.hashdiff = r.hashdiff)` — every satellite, e.g.
  *      `sat_customer_profile.sql:67-75`.
  *
  * Scale notes:
  *   - The watermark is a scalar aggregate of the target; we keep it in-plan
  *     (cross join with a 1-row aggregate, which Spark executes as a
  *     broadcast) rather than collecting to the driver, so the whole
  *     incremental run stays one lazy plan.
  *   - When raw tables are written partitioned by `date(load_timestamp)`
  *     (§4), the watermark predicate partition-prunes the source scan.
  *   - Anti-joins shuffle on the hash key; the target side can be pruned to
  *     the key columns only (done here via select), which at 100 TB is the
  *     difference between shuffling 32-byte keys and whole rows.
  *   - `left_anti` ≡ `NOT IN` only because hash keys are non-null
  *     (SURVEY §7.4.4) — enforced here with a filter on the target side.
  */
object Incremental {

  val WatermarkFloor = "1900-01-01 00:00:00"

  /** Rows of `source` strictly above the target's max watermark (initial
    * load: everything, via the 1900-01-01 floor).
    */
  def aboveWatermark(source: DataFrame, target: DataFrame, wmCol: String): DataFrame = {
    val floor = lit(WatermarkFloor).cast(target.schema(wmCol).dataType)
    val wm = target.agg(coalesce(max(col(wmCol)), floor).as("__wm"))
    source.crossJoin(broadcast(wm)).filter(col(wmCol) > col("__wm")).drop("__wm")
  }

  /** New-key rows: incoming rows whose key combination is absent from the
    * target (hub/link insert set). Target side pruned to keys.
    */
  def newKeys(incoming: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(
      target.select(keys.map(col): _*).filter(keys.map(col(_).isNotNull).reduce(_ && _)),
      keys, "left_anti")

  /** Changed-row detection: incoming rows whose (key, hashdiff) pair is
    * absent from the target (satellite insert set).
    */
  def changedRows(incoming: DataFrame, target: DataFrame, key: String, diff: String): DataFrame =
    newKeys(incoming, target, Seq(key, diff))
}
