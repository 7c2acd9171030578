package graft.ops

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find evaluation documents that share word
  * n-grams with the training split — the standard benchmark-leakage check
  * run before training on any scraped corpus.
  *
  * Shape at scale: explode both splits to (gram, doc) pairs, distinct the
  * train side (set semantics), and join on the gram. The shuffle key is
  * the gram itself — high-cardinality and uniform, no hot keys — and the
  * train side carries one row per DISTINCT gram, not per occurrence. For
  * 100 TB corpora, swap the raw gram string for a 64-bit hash
  * (`xxhash64`) to shrink shuffle width; the string form here keeps the
  * DuckDB oracle engine-portable.
  */
object Decontaminate {

  /** Eval docs sharing at least one `shingleSize`-gram with train.
    * @param hashGrams join on the 64-bit xxhash of each gram instead of
    *        the gram string — ~8 bytes of shuffle per gram instead of the
    *        full text, the right trade at corpus scale (a false positive
    *        needs an xxhash64 collision AND both grams in the corpus; at
    *        contamination-check tolerances that is noise). Keep false for
    *        engine-portable exact semantics (the DuckDB oracle path).
    * @return (doc_id, n_shared_grams) — distinct shared grams per eval doc
    */
  private def grams(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, hashGrams: Boolean): DataFrame = {
    // explode must be a top-level select expression; hash in a second
    // projection
    val base = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TF.shingles(col(textCol), shingleSize))).as("g"))
    base.select(col("doc_id"),
      (if (hashGrams) xxhash64(col("g")) else col("g")).as("gram"))
  }

  def contaminated(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      hashGrams: Boolean = false): DataFrame = {
    val trainGrams = grams(train, idCol, textCol, shingleSize, hashGrams)
      .select("gram").distinct()
    grams(eval, idCol, textCol, shingleSize, hashGrams)
      .join(trainGrams, Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }

  /** [[contaminated]] with a bloom prefilter on the eval gram stream —
    * same exact result, different shuffle shape. A clean corpus is the
    * common case: most eval grams appear NOWHERE in train, yet the plain
    * inner join shuffles every one of them. Probing a sketch of the
    * distinct train grams map-side drops the definitely-absent grams
    * before the exchange (no false negatives ⇒ no contamination missed);
    * sketch false positives still reach the exact string-keyed join and
    * fall out there.
    */
  def contaminatedBloom(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      expectedItems: Long = BloomPrune.DefaultExpectedItems): DataFrame = {
    val trainGrams = grams(train, idCol, textCol, shingleSize, hashGrams = false)
      .select("gram").distinct()
    val evalGrams = grams(eval, idCol, textCol, shingleSize, hashGrams = false)
    val prefiltered =
      BloomPrune.sketch(trainGrams, xxhash64(col("gram")), expectedItems) match {
        case Some(bytes) => evalGrams.filter(BloomPrune.bloomContains(
          lit(bytes), xxhash64(col("gram")), Some(eval.sparkSession)))
        case None => evalGrams // defensive: never probe a null sketch
      }
    prefiltered
      .join(trainGrams, Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }
}
