package graft.ops

import graft.{GraftSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("training converges to k distinct centroids; assignment is total") {
    val emb = Tables.embeddings(spark, sf)
    val m = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iterations = 3)
    assert(m.k == 8)
    val indexed = IvfIndex.index(emb, "embedding", m)
    val clusters = indexed.groupBy("cluster").count().collect()
    assert(clusters.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
    assert(clusters.map(_.getLong(1)).sum == emb.count())
  }

  test("IVF search recall vs brute force is high at nprobe=4/8") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
    val m = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iterations = 3)
    val indexed = IvfIndex.index(emb, "embedding", m)

    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.search(queries, indexed, m, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // ranked candidates must be correctly ordered by cosine
    val ranks = IvfIndex.search(queries, indexed, m, k = 5, nprobe = 4)
      .filter($"query_id" === 0L).orderBy("rank")
      .select("cosine").as[Double].collect()
    assert(ranks.sameElements(ranks.sorted.reverse))
  }

  test("nearest_centroid equals the literal argmax formulation it replaced") {
    // r16 opt round: assignCluster now rides the native NearestCentroid
    // expression (centroid matrix in the codegen references array, not
    // inlined literals — identical generated code across Lloyd's
    // iterations). Scores, ties and NaN must resolve exactly like
    // array_position(s, array_max(s)) - 1 over array(dot(v, lit(c)) -
    // lit(|c|^2/2)) — pinned here value-for-value on real embeddings.
    val emb = Tables.embeddings(spark, sf)
    val m = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iterations = 2)
    def litVec(c: Array[Double]) = array(c.map(lit): _*)
    val literalScores = array(m.centroids.map(c =>
      graft.functions.VectorFunctions.dot(col("embedding"), litVec(c))
        - lit(c.map(x => x * x).sum / 2.0)): _*)
    val literalAssign = (array_position(literalScores,
      array_max(literalScores)) - 1).cast("int")
    val mismatches = emb.select(
        IvfIndex.assignCluster(col("embedding"), m).as("native"),
        literalAssign.as("literal"))
      .filter(col("native") =!= col("literal")).count()
    assert(mismatches == 0L)
  }

  test("nearest_centroid generated code COMPILES (no silent WSCG fallback)") {
    // r16 regression: a stripMargin line starting with '||' was re-stripped
    // by the code interpolator, producing invalid Java — Spark then fell
    // back to interpreted execution SILENTLY (results stayed correct, the
    // codegen-cache win evaporated, and 80 compile errors/bench run hid in
    // the logs). Generating a projection directly throws on compile error,
    // so the fallback cannot hide here.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val cents = (0 until 8).map(i => Array.tabulate(16)(j => (i + j) * 0.01))
    val flat = cents.flatten.toArray
    val norms = cents.map(c => c.map(x => x * x).sum / 2.0).toArray
    val e = graft.functions.expressions.NearestCentroid(
      BoundReference(0, ArrayType(FloatType), nullable = true), flat, norms, 16)
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateMutableProjection.generate(Seq(e))
    assert(proj != null)
  }

  test("nearest_centroid fails fast on a wrong-dimension vector (r15 ADVICE)") {
    val m = IvfIndex.Model(Seq(Array(1.0, 0.0), Array(0.0, 1.0)))
    val ragged = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      ragged.select(IvfIndex.assignCluster(col("embedding"), m)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("expected 2-dim vector")), e.toString)
  }

  test("deterministic: two trainings from the same data agree") {
    val emb = Tables.embeddings(spark, sf)
    val m1 = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iterations = 2)
    val m2 = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iterations = 2)
    assert(m1.centroids.map(_.toSeq) == m2.centroids.map(_.toSeq))
  }
}
