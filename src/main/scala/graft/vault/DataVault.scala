package graft.vault

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.Dedup

/** Data Vault 2.0 building blocks — the reference's warehouse layer
  * (5 hubs + 5 links + 7 sats, `models/warehouse/`) expressed as reusable
  * DataFrame combinators instead of per-table SQL files.
  *
  * Semantics reproduced exactly:
  *   - hub: earliest-wins dedup of business keys + md5 surrogate key
  *     (reference `models/warehouse/hubs/hub_customer.sql:9-36`);
  *   - link: earliest-wins dedup of key *combinations*, hash keys for the
  *     link and each member (`links/link_customer_transaction.sql:34-66`);
  *   - satellite: attribute payload + hashdiff for change detection
  *     (`sats/sat_customer_profile.sql:41-62`).
  *
  * Scale notes: hubs/links dedup with one shuffle on the business key; sats
  * are map-only projections (hash computation is codegen'd). Fact assembly
  * broadcasts hubs when small — at 100 TB hubs are usually the small side
  * (distinct entities), while links/sats carry the event volume.
  */
object DataVault {

  /** A hub: one row per distinct business key, earliest record wins.
    * Output: (hashKeyName, keys..., load_ts, record_source).
    */
  def hub(
      src: DataFrame,
      keys: Seq[String],
      hashKeyName: String,
      loadTsCol: String,
      sourceCol: Column,
      order: Seq[Column]): DataFrame =
    Dedup.firstRows(src, keys, order)
      .select((Seq(Hashing.surrogateKey(keys.map(col): _*).as(hashKeyName)) ++
        keys.map(col) ++
        Seq(col(loadTsCol).as("load_timestamp"), sourceCol.as("record_source"))): _*)

  /** A link: one row per distinct combination of member keys; carries the
    * link hash key plus each member's hash key.
    * `members` maps member hash-key name -> that member's business keys.
    *
    * The link hash key is md5 over the member *hash keys* (md5 of md5s),
    * exactly as the reference computes it — e.g.
    * `links/link_customer_transaction.sql:57-60`
    * generate_surrogate_key(['customer_hk','transaction_hk']).
    */
  def link(
      src: DataFrame,
      members: Seq[(String, Seq[String])],
      linkHashName: String,
      loadTsCol: String,
      sourceCol: Column,
      order: Seq[Column]): DataFrame = {
    val allKeys = members.flatMap(_._2)
    val memberHks = members.map { case (_, ks) => Hashing.surrogateKey(ks.map(col): _*) }
    Dedup.firstRows(src, allKeys, order)
      .select((Seq(Hashing.surrogateKey(memberHks: _*).as(linkHashName)) ++
        members.zip(memberHks).map { case ((hk, _), mk) => mk.as(hk) } ++
        allKeys.map(col) ++
        Seq(col(loadTsCol).as("load_timestamp"), sourceCol.as("record_source"))): _*)
  }

  /** A satellite: attribute payload keyed by the parent hash key, with a
    * hashdiff over the attributes for change detection (insert-only; pair
    * with `Incremental.changedRows` for the incremental guard).
    *
    * @param hashAttrs columns the hashdiff covers when it is a subset of
    *                  the carried payload (reference sats hash the business
    *                  attributes but also carry keys/metadata, e.g.
    *                  `sats/sat_transaction_personal.sql:60-75`); empty →
    *                  hash all of `attrs`.
    * @param sourceCol when set, carried through as `record_source`.
    */
  def satellite(
      src: DataFrame,
      parentKeys: Seq[String],
      parentHashName: String,
      attrs: Seq[String],
      loadTsCol: String,
      hashAttrs: Seq[String] = Seq(),
      sourceCol: Option[Column] = None): DataFrame = {
    val hashed = if (hashAttrs.nonEmpty) hashAttrs else attrs
    src.select((Seq(Hashing.surrogateKey(parentKeys.map(col): _*).as(parentHashName)) ++
      attrs.map(col) ++
      sourceCol.map(_.as("record_source")).toSeq ++
      Seq(Hashing.hashdiff(hashed.map(col): _*).as("hashdiff"),
        col(loadTsCol).as("load_timestamp"))): _*)
  }
}
