package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two columns
  * so sorting by the single z-value co-locates rows that are close in BOTH
  * dimensions. Files written from a z-clustered layout carry tight min/max
  * statistics on both columns at once, so predicates on either (or both)
  * skip most files — the multi-column pruning a single-column sort cannot
  * give. This is the layout optimization behind Delta/Iceberg Z-ORDER,
  * expressed as plain column math + repartitionByRange.
  *
  * At 100 TB: one range shuffle at write time buys every subsequent scan
  * two-dimensional file skipping; the z-value itself is pure per-row bit
  * arithmetic (codegen'd, no UDF).
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of two non-negative
    * integer columns (x gets the even bit positions, y the odd ones).
    * 2*bits <= 62 keeps the result in a positive long.
    *
    * Values MUST fit in `bits` bits — silently truncating would make
    * distant rows collide on the curve and quietly destroy the pruning
    * this layout exists for, so out-of-domain values (including negatives)
    * raise instead. Pre-bucket wider domains: `pmod(col, 1 << bits)` or a
    * quantile bucketizer.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xi = x.cast("long")
    val yi = y.cast("long")
    val interleaved = (0 until bits).map { i =>
      shiftright(xi, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yi, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    when(shiftright(xi, bits) === 0 && shiftright(yi, bits) === 0, interleaved)
      .otherwise(raise_error(concat(
        lit(s"zValue: input exceeds $bits bits (or is negative): x="),
        xi.cast("string"), lit(" y="), yi.cast("string"))))
  }

  /** The identical Morton code as engine-neutral SQL text, generated from
    * the same bit positions (for DuckDB-oracle parity checks).
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Cluster a frame along the z-curve of two columns: range-partition by
    * z-value (so partitions hold contiguous curve segments) and sort
    * within partitions (so row groups inside each file stay tight).
    * Write the result with any partitioned/bucketed sink; the layout does
    * the pruning.
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    // collision-free scratch column (a fixed name would silently replace
    // and then drop a user column of the same name)
    val zCol = Iterator.from(0).map(i => s"__graft_z$i")
      .find(c => !df.columns.contains(c)).get
    val z = zValue(col(xCol), col(yCol), bits)
    df.withColumn(zCol, z)
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
