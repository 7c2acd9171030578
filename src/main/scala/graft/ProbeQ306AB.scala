package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Disposable drift-proof A/B for the r16 q306 question: does the packed
  * (u<<32|item) key formulation beat the two-column form? Single-query
  * boards taken hours apart cannot answer it on this host (untouched
  * queries drift 10-70% between windows), so both variants run in ONE
  * JVM with interleaved, order-alternating samples and the PAIRED
  * per-round deltas isolate the code effect — the [[BenchAB]] method.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.ProbeQ306AB [rounds]"
  */
object ProbeQ306AB {

  /** The q306 pipeline with the scoring/pair-key form forced. */
  private def q306(s: SparkSession, d: String, packed: Boolean): DataFrame = {
    def t(n: String) = Tables.load(s, d, n)
    val po = t("orders")
      .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i")).distinct()
      .localCheckpoint(eager = true)
    val sizes = po.groupBy("i").agg(count(lit(1)).as("__n"))
    val sims = graft.ops.Baskets.frequentItemPairs(po, "u", "i", 2L,
        inputDistinct = true, packedItemPairs = packed,
        pairJoinHint = "shuffle_hash")
      .join(sizes.select(col("i").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(sizes.select(col("i").as("item_b"), col("__n").as("n_b")), "item_b")
      .select(col("item_a"), col("item_b"),
        floor(col("support").cast("double")
          / sqrt((col("n_a") * col("n_b")).cast("double")) * 1000000 + 0.5)
          .as("sim_e6"))
      .localCheckpoint(eager = true)
    val sym = sims.select(col("item_a").as("src"), col("item_b").as("dst"), col("sim_e6"))
      .unionAll(sims.select(col("item_b").as("src"), col("item_a").as("dst"), col("sim_e6")))
    val champions = graft.plans.TopKPerKey.topKPerKey(sym,
      Seq(col("src")), Seq((col("sim_e6"), false), (col("dst"), true)), 20)
    val expanded = po.join(champions.hint("shuffle_hash"),
      po("i") === champions("src"))
    val scored = if (packed) {
      val seen = po.select(shiftleft(col("u"), 32).bitwiseOR(col("i")).as("__ud"))
      expanded
        .select(shiftleft(col("u"), 32).bitwiseOR(col("dst")).as("__ud"), col("sim_e6"))
        .groupBy("__ud")
        .agg(sum(col("sim_e6")).as("score_e6"), count(lit(1)).as("n_contrib"))
        .join(seen.hint("shuffle_hash"), Seq("__ud"), "left_anti")
        .select(shiftright(col("__ud"), 32).as("u"),
          col("__ud").bitwiseAND(lit(0xFFFFFFFFL)).as("item"),
          col("score_e6"), col("n_contrib"))
    } else {
      val seen = po.select(col("u").as("__u2"), col("i").as("__i2"))
      expanded
        .groupBy(col("u"), col("dst").as("item"))
        .agg(sum(col("sim_e6")).as("score_e6"), count(lit(1)).as("n_contrib"))
        .join(seen.hint("shuffle_hash"),
          col("u") === col("__u2") && col("item") === col("__i2"), "left_anti")
    }
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy("u")
        .orderBy(col("score_e6").desc, col("item").asc)).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("u").as("user_id"), col("rnk"), col("item"),
        col("score_e6"), col("n_contrib"))
      .orderBy("user_id", "rnk")
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-q306-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(packed: Boolean): Double = {
      val t0 = System.nanoTime()
      q306(spark, sfDir, packed).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq(true, false).foreach(timeOnce) // warm both variants
    var packedS = Vector.empty[Double]
    var plainS = Vector.empty[Double]
    val deltas = collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to rounds) {
      val order = if (r % 2 == 1) Seq(true, false) else Seq(false, true)
      val timed = order.map(p => p -> timeOnce(p)).toMap
      packedS :+= timed(true); plainS :+= timed(false)
      deltas += timed(true) - timed(false)
      println(f"[ab] round $r packed=${timed(true)}%.3f plain=${timed(false)}%.3f " +
        f"delta=${timed(true) - timed(false)}%+.3f")
    }
    def med(ss: Seq[Double]) = ss.sorted.apply(ss.size / 2)
    println(f"[ab] MEDIANS packed=${med(packedS)}%.3f plain=${med(plainS)}%.3f " +
      f"pairedDelta=${med(deltas.toSeq)}%+.3f (negative = packed faster)")
    spark.stop()
  }
}
