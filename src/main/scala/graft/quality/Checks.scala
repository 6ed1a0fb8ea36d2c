package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality check framework: the engine's equivalent of the reference's
  * dbt test corpus — generic (schema) checks mirroring dbt's
  * `not_null` / `unique` / `relationships` /
  * `dbt_utils.unique_combination_of_columns` (reference
  * `models/marts/schema.yml:108-110,243-274`,
  * `models/raw_sf/sources.yml:69-72`), plus singular checks in the style of
  * the 20 SQL tests under `tests/` (each a SELECT that must return zero
  * rows, `tests/README_TESTS.md`).
  *
  * Every check is a function `DataFrame => DataFrame` returning the
  * VIOLATION rows (empty = pass), so checks compose, stay lazy, and run
  * distributed — no driver-side collection until the caller counts.
  */
object Checks {

  /** dbt `not_null`: rows where any of `cols` is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNull).reduce(_ || _))

  /** dbt `unique` / `unique_combination_of_columns`: key tuples occurring
    * more than once. Aggregates to (keys, n) — one shuffle with map-side
    * partial counts; never a window over the full relation.
    */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** dbt `relationships`: child rows whose key has no parent (referential
    * integrity). Null child keys are not violations (dbt semantics).
    */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child
      .filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** dbt `accepted_values`: rows outside the allowed domain (null allowed,
    * dbt semantics).
    */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Singular check: rows violating an arbitrary invariant predicate
    * (`pred` describes VALIDITY; violations are rows where it is false or
    * null).
    */
  def invariant(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** A named check bundle: run all, return (check_name, n_violations) —
    * the engine twin of a `dbt test` run summary. One Spark job per check;
    * counts are distributed aggregations.
    */
  def summary(checks: Seq[(String, DataFrame)]): DataFrame = {
    val spark = checks.head._2.sparkSession
    import spark.implicits._
    checks.map { case (name, violations) =>
      violations.groupBy().agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionByName _)
  }

  /** Row-predicate checks (not_null / accepted_values / invariant) over ONE
    * table, fused into a single scan: each check becomes one conditional
    * count in one aggregate, so N checks cost one pass instead of N. At
    * 100 TB this is the difference between one table read and ten. The
    * per-check rows come back via a bounded (n_checks-row) explode.
    * Join-shaped checks (unique / relationships) keep their own shuffles —
    * fuse only what shares the scan.
    */
  def fusedInvariants(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val counters = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    df.agg(counters.head, counters.tail: _*)
      .select(explode(map(
        checks.flatMap { case (name, _) => Seq(lit(name), col(name)) }: _*))
        .as(Seq("check_name", "n_violations")))
      .select(col("check_name"), coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }
}
