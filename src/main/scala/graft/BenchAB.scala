package graft

import org.apache.spark.sql.SparkSession

/** Generic interleaved A/B bench over two CATALOG queries — the
  * machine-drift-proof comparison method [[BenchQ101]] introduced for
  * the round-9 reassembly question, for any future "did X regress vs
  * Y" dispute: both queries run in ONE JVM with samples interleaved and
  * slot order alternating, so load drift hits both equally and the
  * PAIRED per-round deltas isolate the code effect (single-query medians
  * taken hours apart do not — that lesson cost three rounds of q101
  * confusion).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.BenchAB q124_sparse_topk q26_minhash_dedup"
  *
  * Prints one JSON line: per-query medians/mins/samples plus the median
  * paired delta (a - b; negative = a faster).
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchAB <queryA> <queryB> -- two catalog query names")
    val Seq(a, b) = args.take(2).toSeq
    Seq(a, b).foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown catalog query: $n"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "7").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val names = Seq(a, b)
    names.foreach(timeOnce) // warm both: codegen, JIT, file listings
    val samples = collection.mutable.Map(names.map(_ -> Vector.empty[Double]): _*)
    val deltas = collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to rounds) {
      val order = if (r % 2 == 1) names else names.reverse
      val timed = order.map(n => n -> timeOnce(n)).toMap
      names.foreach(n => samples(n) :+= timed(n))
      deltas += timed(a) - timed(b)
    }
    def med(ss: Seq[Double]) = ss.sorted.apply(ss.size / 2)
    val fields = names.map { n =>
      val ss = samples(n)
      s""""$n":{"median":${med(ss)},"min":${ss.min},"samples":${ss.mkString("[", ",", "]")}}"""
    }
    val pd = med(deltas.toSeq)
    val line = s"""{"bench":"ab","sf":"$sfDir","rounds":$rounds,${fields.mkString(",")},"paired_delta_median":$pd,"faster":"${if (pd <= 0) a else b}"}"""
    spark.stop()
    println(line)
  }
}
