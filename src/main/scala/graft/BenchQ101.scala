package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Interleaved A/B bench for q101's two reassembly formulations
  * (round-8 verdict item #1: the driver's q101 median grew four rounds
  * straight — 4.11→4.77→5.16→6.13 s — while the builder's own spot
  * measurements of the round-8 rewrite said parity; the two were taken
  * hours apart on a machine whose load drifts, so neither series is
  * trustworthy alone).
  *
  * This main removes the drift variable: both forms run in ONE JVM with
  * samples INTERLEAVED (A,B,A,B,…), so any machine-load trend hits both
  * variants equally and the PAIRED differences isolate the code effect.
  * Prints one JSON line with per-variant samples, medians, mins, and the
  * median of the paired per-round deltas (linear − shuffle; negative =
  * linear faster).
  *
  * Not part of the driver's bench contract — run manually:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchQ101"
  */
object BenchQ101 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "7").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-q101-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the exact q101 frame, parameterized by a variant spec:
    // "<reassembly>" or "<reassembly>+hash" (hash = hashGrams join keys)
    def q101(form: String) = {
      val docs = Tables.load(spark, sfDir, "documents")
      val isTrain = graft.ops.Sampling.inSplit(col("doc_id"), 0.8)
      val parts = form.split("\\+")
      graft.ops.Decontaminate.maskContaminated(
          docs.filter(isTrain), docs.filter(!isTrain), "doc_id", "text",
          hashGrams = parts.contains("hash"),
          reassembly = parts.head)
        .orderBy("doc_id")
    }
    def timeOnce(form: String): Double = {
      val t0 = System.nanoTime()
      q101(form).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val forms = if (args.length >= 2) args.take(2).toSeq else Seq("linear", "shuffle")
    forms.foreach(timeOnce) // warm both: codegen, JIT, file listings
    // interleave: round r times both forms back-to-back; alternate which
    // goes first so slot-order bias cancels too
    val samples = collection.mutable.Map(forms.map(_ -> Vector.empty[Double]): _*)
    val deltas = collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to rounds) {
      val order = if (r % 2 == 1) forms else forms.reverse
      val timed = order.map(f => f -> timeOnce(f)).toMap
      forms.foreach(f => samples(f) :+= timed(f))
      deltas += timed(forms.head) - timed(forms(1))
    }
    def med(ss: Seq[Double]) = ss.sorted.apply(ss.size / 2)
    val fields = forms.map { f =>
      val ss = samples(f)
      s""""$f":{"median":${med(ss)},"min":${ss.min},"samples":${ss.mkString("[", ",", "]")}}"""
    }
    val line = s"""{"bench":"q101_ab","sf":"$sfDir","rounds":$rounds,${fields.mkString(",")},"paired_delta_median":${med(deltas.toSeq)},"winner":"${if (med(deltas.toSeq) <= 0) forms.head else forms(1)}"}"""
    spark.stop()
    println(line)
  }
}
