package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EPA AQI as pure Column expressions (SURVEY §2.10 — designed but never
  * built in the reference, `doc/archive/AQI Calculation Implementation
  * Plan.md:36-73`). No UDFs: a chained `when` per pollutant plus
  * `greatest(...)` stays inside Catalyst/whole-stage codegen, so AQI is a
  * zero-shuffle projection at any scale.
  *
  * Semantics per the reference plan: nulls are skipped (null in → null
  * sub-index, excluded from the max), negative concentrations are invalid
  * (null), values beyond the top breakpoint extrapolate linearly (uncapped).
  */
object Aqi {

  /** (cLow, cHigh, aqiLow, aqiHigh) breakpoint rows. */
  type Breakpoints = Seq[(Double, Double, Double, Double)]

  val pm25Breakpoints: Breakpoints = Seq(
    (0.0, 12.0, 0, 50), (12.1, 35.4, 51, 100), (35.5, 55.4, 101, 150),
    (55.5, 150.4, 151, 200), (150.5, 250.4, 201, 300), (250.5, 500.4, 301, 500)
  ).map { case (a, b, c, d) => (a, b, c.toDouble, d.toDouble) }

  val pm10Breakpoints: Breakpoints = Seq(
    (0.0, 54.0, 0, 50), (55.0, 154.0, 51, 100), (155.0, 254.0, 101, 150),
    (255.0, 354.0, 151, 200), (355.0, 424.0, 201, 300), (425.0, 604.0, 301, 500)
  ).map { case (a, b, c, d) => (a, b, c.toDouble, d.toDouble) }

  /** Piecewise-linear interpolation over breakpoints:
    * aqi = (aqiHi-aqiLo)/(cHi-cLo) * (c-cLo) + aqiLo, rounded to integer.
    */
  def subIndex(c: Column, bps: Breakpoints): Column =
    round(subIndexRaw(c, bps), 0)

  /** Unrounded sub-index (for cross-engine comparison the caller picks the
    * rounding; slopes are pre-folded Scala doubles so the expression is the
    * same literal arithmetic in any engine).
    */
  def subIndexRaw(c: Column, bps: Breakpoints): Column = {
    val (lastLo, lastHi, lastALo, lastAHi) = bps.last
    val beyond = // linear extrapolation above the top breakpoint
      lit(lastALo) + (c - lit(lastLo)) * lit((lastAHi - lastALo) / (lastHi - lastLo))
    val chain = bps.foldRight(beyond) { case ((cLo, cHi, aLo, aHi), rest) =>
      when(c <= cHi, lit(aLo) + (c - lit(cLo)) * lit((aHi - aLo) / (cHi - cLo)))
        .otherwise(rest)
    }
    when(c.isNull || c < 0, lit(null)).otherwise(chain)
  }

  def pm25Aqi(c: Column): Column = subIndex(c, pm25Breakpoints)
  def pm10Aqi(c: Column): Column = subIndex(c, pm10Breakpoints)

  /** Overall AQI = max over per-pollutant sub-indices; null only when every
    * input is null (`greatest` ignores nulls).
    */
  def overallAqi(subIndices: Column*): Column = greatest(subIndices: _*)

  /** Argmax pollutant name by sub-index (reference plan `:63`). */
  def dominantPollutant(named: Seq[(String, Column)]): Column = {
    val overall = overallAqi(named.map(_._2): _*)
    named.foldRight(lit(null).cast("string")) { case ((name, c), rest) =>
      when(c.isNotNull && c === overall, lit(name)).otherwise(rest)
    }
  }

  /** Scala-UDF formulation of the pm25 sub-index — the reference plan's
    * original design (`AQI plan:36-49`), kept as a tested alternative for
    * the data-driven-breakpoints case. The Column-expression form above is
    * preferred: it stays inside Catalyst/codegen while a UDF is an opaque
    * boxed call.
    */
  def pm25AqiUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (c: java.lang.Double) =>
      if (c == null || c < 0) null
      else {
        val bps = pm25Breakpoints
        val (lastLo, lastHi, lastALo, lastAHi) = bps.last
        val raw = bps.collectFirst {
          case (cLo, cHi, aLo, aHi) if c <= cHi =>
            aLo + (c - cLo) * ((aHi - aLo) / (cHi - cLo))
        }.getOrElse(lastALo + (c - lastLo) * ((lastAHi - lastALo) / (lastHi - lastLo)))
        java.lang.Double.valueOf(math.round(raw).toDouble)
      }
    }

  /** AQI → category label (reference plan `:64,159`). */
  def aqiLevel(aqi: Column): Column =
    when(aqi.isNull, null)
      .when(aqi <= 50, "Good")
      .when(aqi <= 100, "Moderate")
      .when(aqi <= 150, "Unhealthy for Sensitive Groups")
      .when(aqi <= 200, "Unhealthy")
      .when(aqi <= 300, "Very Unhealthy")
      .otherwise("Hazardous")
}
