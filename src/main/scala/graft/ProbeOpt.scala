package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Disposable per-PHASE timing probe for the round-15 optimization pass:
  * `runMain graft.ProbeOpt <probe> [rounds]` splits a heavy catalog query
  * into its pipeline phases and times each with the noop sink (guide
  * §1.4), so the optimization effort lands where the seconds actually are
  * (guide §1.1-1.2) instead of where the code looks expensive.
  *
  * Phases deliberately overlap (each later phase re-runs the earlier
  * work) — the DELTA between consecutive phases is the cost of the added
  * stage group, measured under exactly the bench session confs.
  */
object ProbeOpt {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-opt")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    // optional extra confs, "k=v,k=v" (mirrors ProbePlan) — for A/B-ing
    // planner settings like spark.sql.join.preferSortMergeJoin
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach { kvs =>
      kvs.split(",").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(mk: => Unit): Unit = {
      val t0 = System.nanoTime()
      mk
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def tbl(n: String): DataFrame = Tables.load(spark, sfDir, n)

    for (r <- 1 to rounds) {
      println(s"=== round $r ===")
      probe match {
        case "q306" =>
          val po = tbl("orders")
            .join(tbl("lineitem"), col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("u"), col("l_partkey").as("i")).distinct()
          t("a_po_distinct") { noop(po) }
          val poC = po.localCheckpoint(eager = true)
          t("b_pairs") {
            noop(graft.ops.Baskets.frequentItemPairs(poC, "u", "i", 2L)) }
          val sizes = poC.groupBy("i").agg(count(lit(1)).as("__n"))
          val sims = graft.ops.Baskets.frequentItemPairs(poC, "u", "i", 2L)
            .join(sizes.select(col("i").as("item_a"), col("__n").as("n_a")), "item_a")
            .join(sizes.select(col("i").as("item_b"), col("__n").as("n_b")), "item_b")
            .select(col("item_a"), col("item_b"),
              floor(col("support").cast("double")
                / sqrt((col("n_a") * col("n_b")).cast("double")) * 1000000 + 0.5)
                .as("sim_e6"))
          val sym = sims.select(col("item_a").as("src"), col("item_b").as("dst"), col("sim_e6"))
            .unionAll(sims.select(col("item_b").as("src"), col("item_a").as("dst"), col("sim_e6")))
          t("c_champions") {
            noop(graft.plans.TopKPerKey.topKPerKey(sym,
              Seq(col("src")), Seq((col("sim_e6"), false), (col("dst"), true)), 20)) }
          t("d_full_query") {
            noop(SparkEntry.queries("q306_item_cf_recs")(spark, sfDir)) }
        case "q286" =>
          val emb = tbl("embeddings").select(col("vec_id"), col("embedding"))
          val twins = emb.filter(col("vec_id") % 5 === 0)
            .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
          val corpus = emb.unionAll(twins)
          var model: graft.ops.IvfIndex.Model = null
          t("a_train") {
            model = graft.ops.IvfIndex.train(corpus, "vec_id", "embedding", 8, 3) }
          var indexed: DataFrame = null
          t("b_index_ckpt") {
            indexed = graft.ops.IvfIndex.index(
                corpus.select(col("vec_id").as("id"), col("embedding").as("v")), "v", model)
              .localCheckpoint(eager = true) }
          val a = indexed.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
          val b = indexed.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
          val edges = a.join(b, Seq("cluster"))
            .filter(col("id_a") < col("id_b"))
            .filter(graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")) >= 0.95)
            .select("id_a", "id_b")
          t("c_pair_edges") { noop(edges) }
          t("d_keep_canonical") {
            noop(graft.ops.Dedup.keepCanonical(
              corpus.select(col("vec_id"), lit(0L).as("__q")), edges, "vec_id", "__q")) }
          t("e_full_query") {
            noop(SparkEntry.queries("q286_semantic_dedup")(spark, sfDir)) }
        case "q101" =>
          val docs = tbl("documents")
          val isTrain = graft.ops.Sampling.inSplit(col("doc_id"), 0.8)
          val train = docs.filter(isTrain)
          val eval = docs.filter(!isTrain)
          import graft.functions.{TextFunctions => TF}
          val evalGrams = eval.select(col("doc_id"),
              explode(when(TF.tokenCount(col("text")) >= 3,
                  array_distinct(TF.shingles(col("text"), 3)))
                .otherwise(array().cast("array<string>"))).as("gram"))
            .select("gram").distinct()
          t("a_eval_grams") { noop(evalGrams) }
          val occurrences = train.select(col("doc_id"),
            posexplode(when(TF.tokenCount(col("text")) >= 3,
                TF.shingles(col("text"), 3))
              .otherwise(array().cast("array<string>"))).as(Seq("__p", "__g")))
            .select(col("doc_id"), col("__p"), col("__g").as("gram"))
          t("b_occurrences") { noop(occurrences) }
          val hits = occurrences.join(evalGrams, Seq("gram"))
          t("c_hits_join") { noop(hits) }
          val covered = hits
            .select(col("doc_id"),
              explode(sequence(col("__p"), col("__p") + 2)).as("__p"))
            .groupBy("doc_id")
            .agg(collect_set(col("__p")).as("__covered"))
          t("d_covered") { noop(covered) }
          t("e_full_query") {
            noop(SparkEntry.queries("q101_mask_contaminated")(spark, sfDir)) }
        case "q173" =>
          t("full_query") {
            noop(SparkEntry.queries("q173_paragraph_dedup")(spark, sfDir)) }
        case "q253" =>
          val edges = graft.ops.Baskets.frequentItemPairs(
              tbl("lineitem").select(col("l_orderkey"), col("l_partkey")),
              "l_orderkey", "l_partkey", 2L)
            .select(col("item_a").as("src"), col("item_b").as("dst"))
          t("a_pair_edges") { noop(edges) }
          t("b_full_query") {
            noop(SparkEntry.queries("q253_kcore")(spark, sfDir)) }
        case other =>
          // any catalog query: full-query timing under the bench confs
          t(other) { noop(SparkEntry.queries(other)(spark, sfDir)) }
      }
    }
    spark.stop()
  }
}
