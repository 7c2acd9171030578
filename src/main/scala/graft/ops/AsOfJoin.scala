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
    *                   (key, ts) — the LAST row under this order wins for
    *                   backward, the FIRST for forward. Without it the
    *                   winner among exact-ts ties is whatever the shuffle
    *                   delivered (same as DuckDB's ASOF JOIN, but
    *                   nondeterministic run-to-run). Under
    *                   direction="nearest" each candidate side keeps its
    *                   own convention: when the backward side wins the
    *                   tie you get the LAST row under this order, when
    *                   the forward side wins you get the FIRST.
    * @param direction  "backward" (default: most recent right row with
    *                   rightTs <= leftTs), "forward" (earliest right row
    *                   with rightTs >= leftTs — the "next quote/price
    *                   update" shape), or "nearest" (whichever side is
    *                   closer in time; exact ties prefer backward, like
    *                   pandas merge_asof). Same single-shuffle plan in
    *                   every mode — nearest adds one more window SORT over
    *                   the same exchange, never a second shuffle.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None,
      rightTieBreak: Seq[Column] = Nil,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
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

    // carry ALL right columns in ONE struct: per-column last(..ignoreNulls)
    // windows would stitch values from DIFFERENT right rows whenever the
    // matched row holds a null in one carried column (and age-check against
    // yet another row's ts). The struct is non-null exactly for right rows,
    // so ignoreNulls skips left rows and every field comes from the single
    // matched row — nulls included.
    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("__match_ts") +: rightCols.map(col): _*))

    // backward: right rows sort BEFORE left at the same instant (side 0
    // first) and the LAST non-null struct up to the current row wins —
    // <= semantics. forward: left sorts before right at the same instant
    // (side desc) and the FIRST non-null struct from the current row on
    // wins — >= semantics. Both ride the SAME hash exchange; only the
    // within-partition sort differs.
    def backFill = last(rightStruct, ignoreNulls = true).over(
      Window.partitionBy(on.map(col): _*)
        .orderBy(col("__ts") +: col("__side") +: rightTieBreak: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def fwdFill = first(rightStruct, ignoreNulls = true).over(
      Window.partitionBy(on.map(col): _*)
        .orderBy(col("__ts") +: col("__side").desc +: rightTieBreak: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    def age(matchTs: Column): Column = direction match {
      case "forward" => matchTs - col("__ts")
      case _         => col("__ts") - matchTs
    }
    def within(matchTs: Column, delta: Column): Column = tolerance match {
      case Some(tol) => matchTs.isNotNull && delta <= tol
      case None      => matchTs.isNotNull
    }

    val filled = direction match {
      case "backward" => unioned.withColumn("__r", backFill)
      case "forward"  => unioned.withColumn("__r", fwdFill)
      case "nearest"  =>
        // both candidates, then per-row choice: the closer one within
        // tolerance; exact distance ties and both-valid-equal prefer
        // backward (pandas merge_asof convention)
        val both = unioned.withColumn("__rb", backFill).withColumn("__rf", fwdFill)
        val bOk = within(col("__rb.__match_ts"), col("__ts") - col("__rb.__match_ts"))
        val fOk = within(col("__rf.__match_ts"), col("__rf.__match_ts") - col("__ts"))
        both.withColumn("__r",
          when(bOk && fOk,
            when(col("__ts") - col("__rb.__match_ts")
              <= col("__rf.__match_ts") - col("__ts"), col("__rb"))
              .otherwise(col("__rf")))
            .when(bOk, col("__rb"))
            .when(fOk, col("__rf"))
            .otherwise(lit(null)))
          .drop("__rb", "__rf")
    }

    val matchTs = col("__r.__match_ts")
    val ok =
      if (direction == "nearest") matchTs.isNotNull // tolerance already applied
      else within(matchTs, age(matchTs))

    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(rc => when(ok, col(s"__r.$rc")).otherwise(lit(null)).as(rc)) :+
        when(ok, matchTs).otherwise(lit(null)).as("asof_ts")): _*)
  }
}
