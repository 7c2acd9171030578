package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the driver contract: entry + a representative query subset
  * at sf0.001. Full oracle comparison runs via graft.Verify +
  * tools/compare_oracle.py (see .claude/skills/verify).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query has distinct, non-empty name mapping and bench subset exists") {
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.benchQueries.nonEmpty)
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("representative queries produce rows at sf0.001") {
    Seq("q01_pricing_summary", "q06_window_dedup", "q16_aqi",
        "q22_lang_id", "q25_knn_bruteforce", "q31_region_revenue",
        "q59_topk_aggregate", "q61_zorder_key", "q63_corpus_curation",
        "q64_unpivot", "q151_rank_family", "q153_equidepth_hist",
        "q154_repetition_ratio", "q156_join_blowup")
      .foreach { name =>
        assert(SparkEntry.queries(name)(spark, sf).count() > 0, s"$name empty")
      }
  }
}
