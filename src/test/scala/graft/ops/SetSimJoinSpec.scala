package graft.ops

import graft.GraftSpark
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SetSimJoin.jaccardSelfJoin]] to the naive all-pairs result: the
  * prefix filter is a pure optimization, so the output set (ids AND the
  * 9-dp jaccard) must be IDENTICAL to a brute-force cross join at every
  * threshold — including thresholds that sit exactly on achievable
  * rational similarities (the integer-arithmetic boundary the op
  * guarantees).
  */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Random word corpus over a small vocabulary so natural near-dups,
    * subsets and disjoint docs all occur; injected exact duplicates
    * guarantee jaccard-1.0 pairs.
    */
  private def corpus(seed: Int, n: Int, vocab: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      val len = 5 + rnd.nextInt(20)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
    val dups = base.take(n / 5).map { case (id, t) => (id + 100000L, t) }
    (base ++ dups).toDF("id", "text")
  }

  private def naive(docs: DataFrame, tauNum: Int, tauDen: Int): Set[Seq[Any]] = {
    val sets = docs.select(col("id"),
      array_distinct(TF.shingles(col("text"), 3)).as("sh"))
    val out = sets.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sets.select(col("id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(col("sh_a")).cast("long") + size(col("sh_b")) - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni").cast("double"), 9)
          .as("jaccard"))
    GraftSpark.collectSet(out)
  }

  test("equals naive all-pairs at several thresholds and corpora") {
    for (seed <- Seq(1, 2); (num, den) <- Seq((3, 5), (4, 5), (9, 10))) {
      val docs = corpus(seed, n = 60, vocab = 12)
      val fast = GraftSpark.collectSet(
        SetSimJoin.jaccardSelfJoin(docs, "id", "text", num, den))
      assert(fast == naive(docs, num, den),
        s"mismatch at tau=$num/$den seed=$seed")
      assert(fast.nonEmpty, "injected duplicates must produce pairs")
    }
  }

  test("threshold boundary is integer-exact (tau achieved exactly)") {
    // sh("a b c d e", 3) = {abc, bcd, cde}; sh("a b c d x",3)={abc,bcd,cdx}
    // inter=2, union=4 → jaccard exactly 1/2: must be KEPT at tau=1/2.
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d x")).toDF("id", "text")
    val kept = GraftSpark.collectSet(
      SetSimJoin.jaccardSelfJoin(docs, "id", "text", 1, 2))
    assert(kept == Set(Seq(1L, 2L, 0.5)))
    // and DROPPED at any strictly larger threshold
    assert(SetSimJoin.jaccardSelfJoin(docs, "id", "text", 51, 100).isEmpty)
  }

  test("exact duplicates always pair at tau=1") {
    val docs = Seq((1L, "x y z w v"), (2L, "x y z w v"), (3L, "p q r s t"))
      .toDF("id", "text")
    val out = GraftSpark.collectSet(
      SetSimJoin.jaccardSelfJoin(docs, "id", "text", 1, 1))
    assert(out == Set(Seq(1L, 2L, 1.0)))
  }

  test("disjoint corpus yields no pairs without a cartesian plan") {
    val docs = Seq((1L, "a a a a a"), (2L, "b b b b b"), (3L, "c c c c c"))
      .toDF("id", "text")
    val df = SetSimJoin.jaccardSelfJoin(docs, "id", "text", 1, 2)
    assert(df.isEmpty)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Cartesian"),
      "prefix join must stay an equi-join")
  }

  private def naiveTwo(l: DataFrame, r: DataFrame, tauNum: Int,
      tauDen: Int): Set[Seq[Any]] = {
    def sets(df: DataFrame) = df.select(col("id"),
      array_distinct(TF.shingles(col("text"), 3)).as("sh"))
    val out = sets(l).select(col("id").as("id_l"), col("sh").as("sh_l"))
      .crossJoin(sets(r).select(col("id").as("id_r"), col("sh").as("sh_r")))
      .withColumn("inter",
        size(array_intersect(col("sh_l"), col("sh_r"))).cast("long"))
      .withColumn("uni",
        size(col("sh_l")).cast("long") + size(col("sh_r")) - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id_l"), col("id_r"),
        round(col("inter").cast("double") / col("uni").cast("double"), 9)
          .as("jaccard"))
    GraftSpark.collectSet(out)
  }

  test("two-corpus jaccardJoin equals naive cross at several thresholds") {
    for ((num, den) <- Seq((3, 5), (4, 5))) {
      val train = corpus(seed = 11, n = 60, vocab = 12)
      // eval: some verbatim train copies (guaranteed hits) + fresh docs
      val eval0 = train.limit(10).withColumn("id", col("id") + 500000)
        .unionAll(corpus(seed = 12, n = 20, vocab = 12)
          .withColumn("id", col("id") + 900000))
      val fast = GraftSpark.collectSet(
        SetSimJoin.jaccardJoin(eval0, train, "id", "text", num, den))
      assert(fast == naiveTwo(eval0, train, num, den), s"tau=$num/$den")
      assert(fast.nonEmpty, "verbatim copies must be found")
    }
  }

  test("two-corpus join finds the paraphrase exact grams miss") {
    // one-token edit: Jaccard over 3-shingles stays high though several
    // long grams break — the fuzzy-contamination case
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("id", "text")
    val eval0 = Seq((10L, "the quick brown fox leaps over the lazy dog today"))
      .toDF("id", "text")
    val hits = SetSimJoin.jaccardJoin(eval0, train, "id", "text", 1, 3)
      .collect()
    assert(hits.length == 1 && hits.head.getLong(0) == 10L)
  }

  test("hashShingles=true (the at-scale 8-byte key) yields identical pairs") {
    for (seed <- Seq(3, 4)) {
      val docs = corpus(seed, n = 50, vocab = 15)
      val str = GraftSpark.collectSet(
        SetSimJoin.jaccardSelfJoin(docs, "id", "text", 3, 5))
      val hashed = GraftSpark.collectSet(
        SetSimJoin.jaccardSelfJoin(docs, "id", "text", 3, 5, hashShingles = true))
      assert(hashed == str, s"hashed plane diverged at seed=$seed")
      assert(str.nonEmpty)
    }
  }

  test("prefix filter actually prunes (candidate count << all pairs)") {
    // 60 docs over a large vocab → mostly dissimilar; the point of the
    // prefix+length filters is that the UNVERIFIED candidate set is far
    // smaller than the n·(n−1)/2 pair space a naive join would verify.
    val docs = corpus(seed = 7, n = 60, vocab = 200)
      .filter(col("id") < 100000) // drop injected dups: pure random corpus
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    val (_, cands) =
      SetSimJoin.orderedSetsAndCandidates(docs, "id", "text", 3, 5, 3)
    val c = cands.count()
    assert(c < allPairs / 4,
      s"prefix filter admitted $c of $allPairs pairs — not pruning")
  }
}
