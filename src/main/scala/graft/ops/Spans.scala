package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level dedup signal: find token spans that are repeated across
  * documents (the "repeated substring" problem from corpus-dedup practice —
  * boilerplate headers, license blocks, templated paragraphs that
  * document-level dedup misses because the surrounding text differs).
  *
  * Algorithm (all declarative, two shuffles):
  *  1. slide an `n`-token window over every document → one row per
  *     (doc, position, gram);
  *  2. keep grams seen in ≥ `minDocs` DISTINCT documents — a groupBy on
  *     the gram (uniform key; the partial countDistinct trims the
  *     exchange) followed by a join back, the same shape as
  *     [[Decontaminate]];
  *  3. merge adjacent repeated positions per document into maximal spans
  *     with the gaps-and-islands trick (`pos - row_number()` is constant
  *     within a run), so the output is one row per repeated SPAN, not per
  *     gram.
  *
  * `hashGrams=true` swaps the gram string for its xxhash64 before the
  * shuffle — 8 bytes instead of ~50 — the at-scale configuration
  * (spec-asserted to produce identical spans; the string form exists so
  * the DuckDB oracle can reproduce the query exactly).
  */
object Spans {

  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2,
      hashGrams: Boolean = false): DataFrame = {
    require(n >= 2, s"gram size must be >= 2: $n")
    val toks = TextFunctions.tokens(col(textCol))
    // positions are 1-based; a doc shorter than n tokens yields no grams
    // (the `when` guard matters: sequence(1, negative) would DESCEND)
    val gramArr = when(size(col("__toks")) >= n,
      transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => array_join(slice(col("__toks"), i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val keyed = docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), posexplode(gramArr).as(Seq("__pos0", "gram")))
      .select(col("doc_id"), (col("__pos0") + 1).cast("long").as("pos"),
        (if (hashGrams) xxhash64(col("gram")) else col("gram")).as("gram"))
    val repeated = keyed
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("gram")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    keyed.join(repeated, Seq("gram"))
      .withColumn("__island", col("pos") - row_number().over(w))
      .groupBy("doc_id", "__island")
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("__island")
  }
}
