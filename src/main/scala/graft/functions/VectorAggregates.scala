package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed aggregators over embedding columns.
  *
  * [[VectorMean]] computes the element-wise mean of `array<float>` vectors
  * in ONE pass with an `Array[Double]` accumulator — replacing the
  * explode → (key, position) → regroup formulation, which multiplies the
  * shuffled row count by the vector dimension. Buffer size is O(dim) per
  * group; merge is element-wise add, so partial aggregation (map-side
  * combine) applies as with any built-in.
  */
object VectorAggregates {

  final case class MeanBuf(sums: Array[Double], n: Long)

  object VectorMean extends Aggregator[Seq[Float], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.empty, 0L)

    override def reduce(b: MeanBuf, v: Seq[Float]): MeanBuf = {
      if (v == null) b
      else if (b.n == 0L) MeanBuf(v.map(_.toDouble).toArray, 1L)
      else {
        // fail on ragged input: silently truncating to the shorter length
        // would produce a wrong mean whose dimensionality depends on which
        // row a partition happened to see first
        require(v.length == b.sums.length,
          s"ragged vectors in group: ${v.length} vs ${b.sums.length}")
        var i = 0
        while (i < b.sums.length) {
          b.sums(i) += v(i); i += 1
        }
        MeanBuf(b.sums, b.n + 1)
      }
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length,
          s"ragged vectors in group: ${a.sums.length} vs ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) {
          a.sums(i) += b.sums(i); i += 1
        }
        MeanBuf(a.sums, a.n + b.n)
      }

    override def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0L) null else b.sums.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[MeanBuf] = ExpressionEncoder[MeanBuf]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: `vectorMean(col("embedding"))` → `array<double>`. */
  def vectorMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VectorMean)

  def vectorMean(c: Column): Column = vectorMean.apply(c)
}
