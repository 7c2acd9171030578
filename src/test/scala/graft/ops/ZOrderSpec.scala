package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
    val z = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(z((0, 0)) == 0L)
    assert(z((1, 0)) == 1L)
    assert(z((0, 1)) == 2L)
    assert(z((1, 1)) == 3L)
    assert(z((2, 0)) == 4L)
    // x=3 (011), y=5 (101): interleaved y2x2 y1x1 y0x0 = 100111 = 39
    assert(z((3, 5)) == 39L)
  }

  test("clustering shrinks per-partition bounding boxes vs a random layout") {
    val n = 4096
    val grid = (0 until n).map { i =>
      // deterministic scatter over a 64x64 grid
      val x = (i * 2654435761L % 64).toInt
      val y = (i * 40503 % 64).toInt
      (x, y)
    }.toDF("x", "y")

    def boxArea(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).head().getLong(0)

    val clustered = boxArea(ZOrder.cluster(grid, "x", "y", numPartitions = 16, bits = 6))
    val unclustered = boxArea(grid.repartition(16))
    // contiguous z-curve segments cover compact regions; hash partitions
    // cover essentially the whole grid each
    assert(clustered < unclustered / 4,
      s"clustered=$clustered unclustered=$unclustered")
  }
}
