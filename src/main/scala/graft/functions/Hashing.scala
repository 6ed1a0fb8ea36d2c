package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-key functions reproducing the reference's dbt_utils surrogate-key
  * semantics (reference `models/warehouse/hubs/hub_customer.sql:26`):
  * md5 over '-'-joined string-casted columns, with NULL mapped to
  * dbt_utils 1.3.x's sentinel `_dbt_utils_surrogate_key_null_` (the
  * reference does not set `surrogate_key_treat_nulls_as_empty_strings`,
  * so the sentinel — not '' — is what its keys carry; NULL and
  * empty-string inputs therefore hash differently, as they must).
  *
  * All are native Column expression trees (whole-stage-codegen friendly —
  * no UDFs on the hot path).
  */
object Hashing {

  /** dbt_utils.generate_surrogate_key's default NULL placeholder. */
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  /** dbt_utils.generate_surrogate_key parity: used by every hub/link/sat in
    * the reference (26 call sites, e.g. `hub_customer.sql:26`).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

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
