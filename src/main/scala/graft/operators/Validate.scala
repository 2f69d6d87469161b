package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt/Great-Expectations tier a
  * warehouse runs after every load and before every publish: primary-key
  * uniqueness, null rates, accepted values, referential integrity. Each
  * check is a DataFrame returning ONE summary row
  * `(check_name, n_checked, n_violations, pass)`; [[report]] unions a rule
  * set into a single frame so a pipeline gates on
  * `report(...).filter(!pass).isEmpty`.
  *
  * Scale shape: every check is one scan + one aggregate (uniqueness
  * adds a key-hashed exchange with map-side partials; referential
  * integrity is a left-anti join that AQE broadcasts when the parent
  * side is dimension-sized). Violations are COUNTED, not collected —
  * a 100 TB table with a billion bad rows reports one number; use the
  * companion `*Rows` variants to materialize samples for triage.
  */
object Validate {

  // Violations coalesce to 0: sum() over an EMPTY table is NULL, and a
  // NULL n_violations would make pass = NULL — filtered out by the
  // documented `filter(!pass)` gate, i.e. an empty (failed-load) table
  // would silently pass every sum-based check.
  private def summary(name: String, checked: Column, violations: Column,
      df: DataFrame): DataFrame =
    df.agg(checked.as("__c"), violations.as("__v"))
      .select(lit(name).as("check_name"),
        coalesce(col("__c"), lit(0L)).cast("long").as("n_checked"),
        coalesce(col("__v"), lit(0L)).cast("long").as("n_violations"),
        (coalesce(col("__v"), lit(0L)) === 0).as("pass"))

  /** Duplicate primary keys: #rows − #distinct keys. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String],
      name: String = "unique_key"): DataFrame =
    summary(name, count(lit(1)),
      count(lit(1)) - count_distinct(struct(keyCols.map(col): _*)), df)

  /** Null (or blank, if `orBlank`) values in a required column. */
  def notNull(df: DataFrame, c: String, orBlank: Boolean = false,
      name: String = "not_null"): DataFrame = {
    val bad =
      if (orBlank) col(c).isNull || trim(col(c)) === ""
      else col(c).isNull
    summary(s"$name($c)", count(lit(1)),
      sum(when(bad, 1L).otherwise(0L)), df)
  }

  /** Values outside the accepted set (nulls count as violations — use
    * [[notNull]] separately if null is acceptable).
    */
  def acceptedValues(df: DataFrame, c: String, allowed: Seq[String],
      name: String = "accepted_values"): DataFrame =
    summary(s"$name($c)", count(lit(1)),
      sum(when(col(c).isin(allowed: _*), 0L).otherwise(1L)), df)

  /** Child rows whose foreign key has no parent (orphans). Null FKs are
    * not orphans (SQL FK semantics); add [[notNull]] if they matter.
    */
  def referentialIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      name: String = "ref_integrity"): DataFrame = {
    // Total and orphan counts from ONE lazy plan (a left join with a
    // hit marker), not an eager .count() plus a second anti-join scan.
    val joined = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct()
          .withColumn("__hit", lit(1)),
        Seq(childKey), "left")
    summary(s"$name($childKey)", count(lit(1)),
      sum(when(col(childKey).isNotNull && col("__hit").isNull, 1L)
        .otherwise(0L)), joined)
  }

  /** Values outside [lo, hi] (nulls are violations). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double,
      name: String = "in_range"): DataFrame =
    summary(s"$name($c)", count(lit(1)),
      sum(when(col(c).isNotNull && col(c).between(lo, hi), 0L)
        .otherwise(1L)), df)

  /** Union a rule set into one report frame, ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty,
      "Validate.report: empty rule set — a DQ gate with no rules must be " +
        "an explicit decision, not a silent pass")
    checks.reduce(_ unionByName _).orderBy("check_name")
  }

  /** k-anonymity profile over a quasi-identifier column set (Sweeney
    * 2002 — public definition): a dataset is k-anonymous when every
    * QI combination covers ≥ k rows. Returns one row per requested
    * `k`: how many QI groups and rows fall below it, plus the global
    * anonymity level (the smallest group — the k the release actually
    * provides). The privacy screen a data release runs BEFORE export;
    * rows in sub-k groups are re-identification candidates.
    *
    * One aggregation over the QI columns (bounded by the QI-space
    * cardinality) and one tiny cross join of that group table against
    * the requested-k list — never a second data scan.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String],
      ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ks.nonEmpty, "need QI columns and k values")
    require(ks.forall(_ >= 2), s"k < 2 is meaningless: ${ks.mkString(",")}")
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val lvl = groups.agg(min(col("__n")).as("__lvl"))
    groups
      .withColumn("k", explode(array(ks.map(k => lit(k)): _*)))
      .groupBy("k")
      .agg(
        sum(when(col("__n") < col("k"), 1L).otherwise(0L))
          .as("groups_below"),
        sum(when(col("__n") < col("k"), col("__n")).otherwise(0L))
          .as("rows_at_risk"))
      .crossJoin(broadcast(lvl))
      .select(col("k"), col("groups_below"), col("rows_at_risk"),
        col("__lvl").as("k_anonymity"),
        (col("__lvl") >= col("k")).as("satisfied"))
  }

  /** l-diversity profile (Machanavajjhala et al. 2007 — public
    * definition): k-anonymity's necessary companion — a big QI group
    * whose SENSITIVE value is constant still leaks it (the
    * homogeneity attack k-anonymity cannot see). Per requested `l`:
    * QI groups whose distinct-sensitive-value count falls below it,
    * the rows they cover, and the global diversity level (the
    * smallest per-group distinct count). Same single-aggregation
    * shape as [[kAnonymity]]; the distinct count is exact
    * (per-group value cardinality is bounded by the sensitive
    * domain).
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      ls: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ls.nonEmpty, "need QI columns and l values")
    require(ls.forall(_ >= 2), s"l < 2 is meaningless: ${ls.mkString(",")}")
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__d"))
    val lvl = groups.agg(min(col("__d")).as("__lvl"))
    groups
      .withColumn("l", explode(array(ls.map(l => lit(l)): _*)))
      .groupBy("l")
      .agg(
        sum(when(col("__d") < col("l"), 1L).otherwise(0L))
          .as("groups_below"),
        sum(when(col("__d") < col("l"), col("__n")).otherwise(0L))
          .as("rows_at_risk"))
      .crossJoin(broadcast(lvl))
      .select(col("l"), col("groups_below"), col("rows_at_risk"),
        col("__lvl").as("l_diversity"),
        (col("__lvl") >= col("l")).as("satisfied"))
  }
}
