package graft.ops

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical collocation mining — the phrase-discovery pass a tokenizer/
  * vocabulary pipeline runs over a corpus before choosing merge rules or
  * multi-word vocab entries (Mikolov et al.'s word2vec phrase step uses
  * the same score family).
  *
  * PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ) over ADJACENT token bigrams,
  * estimated with corpus counts:
  *
  *   pmi = ln( (c_ab · N · N) / (M · c_a · c_b) )
  *
  * where N = total tokens, M = total bigrams. Everything inside the log is
  * an exact integer count, the double arithmetic is a fixed left-to-right
  * product/quotient, and the only transcendental is one `ln` of an exact
  * rational — so an oracle replaying the same counts reproduces the score
  * bit-for-bit (and pmi = 0 exactly when the ratio is exactly 1).
  *
  * Scale shape (100 TB): bigram extraction is a pure per-row projection
  * (sequence/transform/explode — codegen, no shuffle); the two count
  * aggregations shuffle on word / word-pair keys with map-side partial
  * collapse; N and M are aggregated from the ALREADY-AGGREGATED count
  * frames (no second corpus scan) and broadcast back as 1-row frames; the
  * unigram joins key the pair-aggregated frame by word — bounded fanout,
  * never row-level. No driver state beyond two scalars.
  */
object Collocations {

  /** Adjacent-bigram PMI table: (w1, w2, c_ab, pmi), support-filtered to
    * `minCount` occurrences. Bigrams never cross document boundaries.
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long = 5L): DataFrame = {
    val ts = TF.tokens(col(textCol))

    val uni = docs.select(explode(ts).as("w"))
    val ugc = uni.groupBy("w").agg(count(lit(1)).as("c"))

    // The pair array is exploded as an inline EXPRESSION with a when()
    // guard (null for <2-token docs → the generator emits nothing), not
    // projected into a named column behind a filter — the named-column +
    // filter spelling makes Catalyst push `size(t) >= 2` into the scan
    // with the whole tokenizer tree inlined, so every row pays tokenize
    // twice (the SetSimJoin round-9 lesson; Conditions are pinned
    // HOF-free in PlanSpec).
    val pairs = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => struct(element_at(ts, i).as("w1"),
          element_at(ts, i + 1).as("w2"))))
    val bg = docs.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))

    // corpus totals from the aggregated frames — no second scan
    val nTok = ugc.agg(sum("c").as("n_tok"))
    val nBg = bgc.agg(sum("c_ab").as("n_bg"))

    bgc.filter(col("c_ab") >= minCount)
      .join(ugc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(ugc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBg))
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") * col("n_tok").cast("double")
            * col("n_tok").cast("double"))
          / (col("n_bg").cast("double") * col("c_a").cast("double")
            * col("c_b").cast("double"))), 6).as("pmi"))
  }
}
