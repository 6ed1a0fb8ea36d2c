package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-key functions reproducing the reference's dbt_utils surrogate-key
  * semantics (reference `macros/hash_key.sql:1-12`,
  * `models/warehouse/hubs/hub_customer.sql:26`):
  * md5 over '-'-joined, null→'' string-casted columns.
  *
  * All are native Column expression trees (whole-stage-codegen friendly —
  * no UDFs on the hot path).
  */
object Hashing {

  /** dbt_utils.generate_surrogate_key parity: used by every hub/link/sat in
    * the reference (26 call sites, e.g. `hub_customer.sql:26`).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Hashdiff for satellite change detection (reference
    * `sats/sat_customer_profile.sql:48-57`): same md5 recipe over the
    * attribute payload.
    */
  def hashdiff(cols: Column*): Column = surrogateKey(cols: _*)

  /** The reference's (defined but unused) sha256 variant
    * (`macros/hash_key.sql:1-12`): sha256 over '||'-joined strings.
    */
  def sha256Key(cols: Column*): Column =
    sha2(concat_ws("||", cols.map(c => coalesce(c.cast("string"), lit(""))): _*), 256)
}
