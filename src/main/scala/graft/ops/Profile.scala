package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "crawler statistics" step every catalog
  * (the reference's Glue crawler included) runs after ingest: per column,
  * row count, null count, exact distinct count, and min/max rendered as
  * strings (type-agnostic output schema).
  *
  * Everything is ONE aggregate over one scan: n columns add n
  * `count(DISTINCT)` branches to the Expand (Spark plans multi-distinct
  * aggregates as an Expand + two-phase agg — rows × columns intermediate,
  * the price of exactness). At 100 TB swap the exact distinct counts for
  * `approx_count_distinct` (same plan minus the Expand); the oracle pins
  * the exact form.
  *
  * The wide single-row result is reshaped to long format (one row per
  * column) with an explode of literal structs — a driver-free pivot.
  */
object Profile {

  /** (col_name, n_rows, n_nulls, n_distinct, min_value, max_value), one
    * row per requested column, in one aggregation pass.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(entries: _*)).as("__p")).select("__p.*")
  }

  /** DuckDB twin generated from the same column list (UNION ALL of one
    * SELECT per column), so the column set and formulas cannot drift.
    *
    * String RENDERING of min/max can still differ between engines for
    * some types: Spark prints doubles outside [1e-3, 1e7) in scientific
    * notation where DuckDB prints plain decimal, and timestamp text
    * differs too. Oracle-pair only columns whose min/max are integers,
    * strings, or doubles inside that range (q97 pins such a set); the op
    * itself profiles any type.
    */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          count(*) - count($c) AS n_nulls,
          count(DISTINCT $c) AS n_distinct,
          CAST(min($c) AS VARCHAR) AS min_value,
          CAST(max($c) AS VARCHAR) AS max_value FROM $table"""
    }.mkString(" UNION ALL ") + " ORDER BY col_name"
}
