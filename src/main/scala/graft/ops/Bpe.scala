package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer train + ENCODE over a space-joined token stream — the
  * pair that makes the in-engine tokenizer loop (q210) actually usable:
  * training adopts merges, encoding applies an adopted merges table to a
  * corpus, and every token count downstream of the mixing family
  * (token-budget allocation, packing, fertility) can come from the
  * encoder instead of a whitespace proxy.
  *
  * Both sides share ONE rewrite primitive, the boundary-exact
  * double-space literal replace: tokens rendered '  '-separated, the
  * pattern ' a  b ' consumes ONE space each side and the replacement
  * ' a_b ' restores them, so back-to-back merge sites (x a b a b x)
  * both fire in a single pass while overlapping sites (a a a) merge
  * leftmost-only — true BPE replace-all semantics with plain literal
  * `replace()`, the identical engine-portable scan order on Spark and
  * the DuckDB oracle, no UDF. (Reference behavior ported: the OpenAQ
  * reference has no tokenizer; this is the LLM-pipeline extension ambit,
  * Sennrich et al. 2016 / GPT-2's merge-table encoder.)
  *
  * Scale shape: training is `rounds` iterations of ONE pair
  * explode+count (uniform pair keys, map-side partial agg) + a 1-row
  * TakeOrdered broadcast + a map-side corpus rewrite, corpus
  * localCheckpointed per round (the iterative-lineage rule). Encoding
  * is a SINGLE map-side projection: the merges list is bounded (a vocab
  * budget, <= thousands) and compiles into a literal replace chain —
  * zero shuffles, zero state, linear in corpus bytes.
  */
object Bpe {

  /** Literal (non-regex) replace: corpus tokens feed the patterns, so
    * regex metacharacter injection must be impossible.
    */
  private def lrep(src: Column, find: Column, to: Column): Column =
    call_function("replace", src, find, to)

  /** One boundary-exact merge rewrite of a ' '-joined token stream:
    * every non-overlapping occurrence of the two-token `pair` becomes
    * `merged` (left-to-right, the BPE scan order).
    */
  def rewriteOnce(t: Column, pair: Column, merged: Column): Column =
    trim(lrep(
      lrep(
        concat(lit(" "), lrep(t, lit(" "), lit("  ")), lit(" ")),
        concat(lit(" "), lrep(pair, lit(" "), lit("  ")), lit(" ")),
        concat(lit(" "), merged, lit(" "))),
      lit("  "), lit(" ")))

  /** Train `rounds` BPE merges over (idCol, tCol) where tCol is the
    * ' '-joined token stream. Per round: count all adjacent token pairs
    * corpus-wide (overlapping — the standard BPE counting step), adopt
    * the most frequent (count desc, pair asc — deterministic), rewrite
    * the corpus with the merged token (pair joined by '_').
    * Returns the adopted merges: (iteration, merged_pair, occurrences).
    */
  def train(corpus: DataFrame, idCol: String, tCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be positive: $rounds")
    var cur = corpus.select(col(idCol), col(tCol).as("__t"))
      .localCheckpoint(eager = true)
    var merges: DataFrame = null
    for (k <- 1 to rounds) {
      val ts = split(col("__t"), " ")
      val pairs = cur
        .filter(size(split(col("__t"), " ")) >= 2)
        .select(explode(transform(sequence(lit(1), size(ts) - 1),
          i => concat(element_at(ts, i), lit(" "), element_at(ts, i + 1))))
          .as("__pair"))
      val top = pairs.groupBy("__pair").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("__pair").asc).limit(1)
        .select(col("__pair"), col("__c"),
          lrep(col("__pair"), lit(" "), lit("_")).as("__merged"))
        .localCheckpoint(eager = true) // merge rewrite + report share it
      val m = top.select(lit(k).as("iteration"),
        col("__pair").as("merged_pair"), col("__c").as("occurrences"))
      merges = if (merges == null) m else merges.unionAll(m)
      cur = cur.crossJoin(broadcast(top))
        .select(col(idCol),
          rewriteOnce(col("__t"), col("__pair"), col("__merged")).as("__t"))
        .localCheckpoint(eager = true)
    }
    merges
  }

  /** ENCODE: apply an ordered merges list (each entry the space-joined
    * pair, e.g. "the cat" -> "the_cat") to a ' '-joined token stream
    * column. The list is applied in rank order, each merge replacing all
    * occurrences — exactly the training rewrites replayed, so
    * encode(t0, train(t0)) equals the training loop's final corpus.
    * Pure projection: the bounded merges list compiles into a literal
    * replace chain, no shuffle, no driver state beyond the list itself.
    */
  def encodeCol(t: Column, merges: Seq[String]): Column =
    merges.foldLeft(t)((c, pair) =>
      rewriteOnce(c, lit(pair), lit(pair.replace(" ", "_"))))
}
