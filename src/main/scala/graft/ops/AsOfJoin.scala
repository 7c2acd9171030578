package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with `rightTs <= leftTs` on the same key — the time-series
  * enrichment operator Spark lacks natively.
  *
  * Implementation is the union-tag-window composition (preference (a) from
  * the custom-operator ladder — no custom physical operator needed):
  * tag both sides, union, and run `last_value(..., ignoreNulls)` over a
  * window partitioned by key and ordered by (ts, side) with right rows
  * sorting before left rows at equal timestamps (so `<=` semantics hold).
  *
  * Scale properties: exactly ONE shuffle (hash by key for the window) and
  * a per-partition sort — same cost as a sort-merge join, with none of the
  * range-join blowup a theta-join `rightTs <= leftTs` would cause (which
  * Spark plans as a broadcast-nested-loop or cartesian). Each key's
  * timeline is processed sequentially within its partition; skewed keys
  * can be range-split by time before the union if needed.
  */
object AsOfJoin {

  /** @param left       the "needle" side (one output row per left row)
    * @param right      the "quote" side providing the as-of values
    * @param on         equality key columns (both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right columns to carry (must not collide with left)
    * @param tolerance  optional max age of the matched right row; older
    *                   matches become null (like `ASOF ... TOLERANCE`)
    * @param rightTieBreak extra ordering among right rows sharing the same
    *                   (key, ts) — the LAST row under this order wins.
    *                   Without it the winner among exact-ts ties is
    *                   whatever the shuffle delivered (same as DuckDB's
    *                   ASOF JOIN, but nondeterministic run-to-run).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None,
      rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains),
      "rightCols must not collide with left columns")

    val taggedLeft = rightCols.foldLeft(
        left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val taggedRight = leftCols.filterNot(on.contains).foldLeft(
        right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val unioned = taggedLeft.select((leftCols ++ rightCols ++ Seq("__ts", "__side")).map(col): _*)
      .unionByName(
        taggedRight.select((leftCols ++ rightCols ++ Seq("__ts", "__side")).map(col): _*))

    // right rows sort before left rows at the same instant → <= semantics;
    // tie-break columns are null on left rows, so they only order right
    // rows among themselves
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts") +: col("__side") +: rightTieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry ALL right columns in ONE struct: per-column last(..ignoreNulls)
    // windows would stitch values from DIFFERENT right rows whenever the
    // matched row holds a null in one carried column (and age-check against
    // yet another row's ts). The struct is non-null exactly for right rows,
    // so ignoreNulls skips left rows and every field comes from the single
    // matched row — nulls included.
    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("__match_ts") +: rightCols.map(col): _*))
    val filled = unioned.withColumn("__r", last(rightStruct, ignoreNulls = true).over(w))

    val matchTs = col("__r.__match_ts")
    val withinTolerance = tolerance match {
      case Some(tol) => matchTs.isNotNull && col("__ts") - matchTs <= tol
      case None      => matchTs.isNotNull
    }

    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(rc => when(withinTolerance, col(s"__r.$rc")).otherwise(lit(null)).as(rc)) :+
        when(withinTolerance, matchTs).otherwise(lit(null)).as("asof_ts")): _*)
  }
}
