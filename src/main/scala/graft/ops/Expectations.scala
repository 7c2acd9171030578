package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * shape, built from primitives): a rule table of named boolean Columns,
  * evaluated in ONE aggregate pass — per rule, how many rows violate it
  * and the violation rate.
  *
  * This generalizes the reference's hand-rolled validation steps (null
  * audits, range predicates, schema-presence checks — SURVEY §2 P8-P11)
  * into a single reusable pass: rules are data, the scan cost is paid
  * once regardless of rule count, and every rule expression stays inside
  * whole-stage codegen (no UDFs).
  *
  * A NULL rule result counts as a violation — an expectation that cannot
  * be evaluated on a row is not satisfied by it (SQL's `WHERE`-style
  * null-dropping would silently pass unknowns).
  */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, n_rows, n_violations, violation_rate 6-dp).
    * Single aggregate over a single scan; the wide one-row result is
    * reshaped with an explode of literal structs (driver-free).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule name in ${rules.map(_.name)}")
    val aggs = Seq(count(lit(1)).as("__rows")) ++ rules.map { r =>
      sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
        .as(s"__viol_${r.name}")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.map { r =>
      struct(
        lit(r.name).as("rule"),
        col("__rows").as("n_rows"),
        col(s"__viol_${r.name}").as("n_violations"),
        (floor(col(s"__viol_${r.name}").cast("double") / col("__rows")
          * 1000000 + 0.5) / 1000000.0).as("violation_rate"))
    }
    row.select(explode(array(entries: _*)).as("__e")).select("__e.*")
  }

  /** Referential-integrity audit (the FK-shaped expectation): one row
    * `(fk, n_child, n_orphans, orphan_rate)` counting child rows whose
    * key has no match in `parent`. `left_anti` keeps the probe side
    * streaming and ignores duplicate parent keys without paying a
    * distinct; the two single-row aggregates join with a bounded cross.
    */
  def foreignKey(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    // SQL FK semantics: a NULL child key is "no reference", not a
    // violation — only non-null keys are probed for orphanhood.
    val orphans = child.filter(child(childKey).isNotNull)
      .join(parent, child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_child")).crossJoin(orphans).select(
      lit(name).as("fk"), col("n_child"), col("n_orphans"),
      // explicit 0-row guard: 0/0 is NaN and floor(NaN) coerces to a
      // deceptively clean 0L — an empty audit must still read 0.0 by
      // DECISION, with n_child=0 visible beside it
      when(col("n_child") === 0, lit(0.0))
        .otherwise(floor(col("n_orphans").cast("double") / col("n_child")
          * 1000000 + 0.5) / 1000000.0).as("orphan_rate"))
  }

  /** Fail-fast gate: throws if any rule's violation rate exceeds its
    * tolerance (0.0 = hard expectation). Returns the check report for
    * logging on success.
    */
  def enforce(df: DataFrame, rules: Seq[Rule],
      tolerance: Double = 0.0): DataFrame = {
    val report = check(df, rules)
    val bad = report.filter(col("violation_rate") > tolerance).collect()
    require(bad.isEmpty,
      s"expectations failed (tolerance $tolerance): " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(", "))
    report
  }
}
