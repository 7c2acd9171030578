package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact integer Gramian accumulation — the X^T X building block under
  * PCA / whitening / ridge normal equations, computed the way MLlib's
  * `computeGramianMatrix` does it but in the exact-integer domain: each
  * partition folds its vectors into ONE local upper-triangle accumulator
  * (d(d+1)/2 longs), then only `numPartitions x d(d+1)/2` partial rows
  * shuffle to the final d(d+1)/2 groups. Versus the explode-per-pair
  * formulation this removes the 2080x per-row blowup entirely — the
  * map side does pure array arithmetic with zero allocation per row.
  *
  * `mapPartitions` is the right tool here (not a Catalyst expression):
  * the accumulator must OUTLIVE the row — this is a per-partition fold,
  * the same class as the binary decode in [[Multimodal]].
  *
  * Inputs are scaled longs (the cents trick), so every partial sum and
  * the final matrix are exact integers: per-product magnitude <= s^2
  * for |x| <= s, so a partition of n rows stays within long for
  * n * s^2 < 2^63 — at the 1e6 scale that is ~2.3M rows per partition
  * per coordinate pair; a deployment beyond that swaps the accumulator
  * to BigInt the way the cents comment prescribes decimal(38,0).
  */
object Gram {

  /** Upper-triangle exact Gramian of a scaled-long-vector Dataset.
    * Output: (i, j, m) with 0 <= i <= j < dim and
    * m = sum over rows of x(i) * x(j).
    */
  def upperGramian(vecs: Dataset[Seq[Long]], dim: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val nPairs = dim * (dim + 1) / 2
    vecs.mapPartitions { rows =>
      val acc = new Array[Long](nPairs)
      var nonEmpty = false
      rows.foreach { v =>
        nonEmpty = true
        var i = 0
        var k = 0
        while (i < dim) {
          val xi = v(i)
          var j = i
          while (j < dim) {
            acc(k) += xi * v(j)
            k += 1
            j += 1
          }
          i += 1
        }
      }
      if (!nonEmpty) Iterator.empty
      else {
        // unpack flat index k -> (i, j) for the partial rows
        val out = new Array[(Int, Int, Long)](nPairs)
        var i = 0
        var k = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            out(k) = (i, j, acc(k))
            k += 1
            j += 1
          }
          i += 1
        }
        out.iterator
      }
    }.toDF("i", "j", "m")
      .groupBy("i", "j").agg(sum(col("m")).as("m"))
  }
}
