package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal (the CCNet/RefinedWeb curation step):
  * drop every line that appears in at least `minDocs` DISTINCT documents —
  * navigation chrome, cookie banners, boilerplate headers — and reassemble
  * each document from its surviving lines in original order.
  *
  * Scale shape (the whole point at 100 TB):
  *  - the frequent-line set is found with one aggregation whose key is the
  *    line text; partial aggregation collapses per-partition repeats before
  *    the exchange, and the *output* (lines crossing the minDocs bar) is
  *    tiny relative to the corpus — boilerplate is by definition a small
  *    vocabulary repeated everywhere;
  *  - the removal join is therefore a broadcast LEFT ANTI (AQE picks the
  *    broadcast automatically from the small side's runtime size), so the
  *    exploded line stream is never shuffled for the join;
  *  - reassembly is the one real shuffle, keyed by the document id.
  *
  * Exactness: grouping is by the full line text, not a hash of it, so two
  * distinct lines can never be conflated (a hash-keyed variant would trade
  * that guarantee for a narrower exchange; at web scale the partial-agg
  * collapse already does most of that work).
  */
object Lines {

  /** Remove lines occurring in ≥ `minDocs` distinct documents.
    *
    * Output: (idCol, clean_text, n_kept, n_removed) — `clean_text` is the
    * surviving lines joined by `sep` ('' when every line was boilerplate),
    * counts are longs. One row per input document, always.
    *
    * `sep` must be a fixed single-character separator (it is used both as
    * a split regex and a join literal).
    */
  def removeFrequentLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long,
      sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would remove every line: $minDocs")
    val id = col(idCol)

    val lines = docs.select(
      id,
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))

    // lines crossing the bar — small by construction (true boilerplate)
    val frequent = lines
      .groupBy(col("__line"))
      .agg(countDistinct(id).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__line"))

    val kept = lines.join(frequent, Seq("__line"), "left_anti")

    val reassembled = kept
      .groupBy(id)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          sep).as("clean_text"),
        count(lit(1)).as("n_kept"))

    // docs whose every line was boilerplate drop out of the groupBy —
    // restore them with an empty clean_text so the row count is stable.
    // Totals come from the already-exploded line stream (split yields at
    // least one element for ANY string, so no doc is missing from it) —
    // not from a second pass over the text bytes.
    val totals = lines.groupBy(id).agg(count(lit(1)).as("__n_total"))
    totals
      .join(reassembled, Seq(idCol), "left")
      .select(
        id,
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** The frequent-line set itself (for auditing what a removal pass would
    * strip): (line, n_docs) with n_docs ≥ minDocs.
    */
  def frequentLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long,
      sep: String = "\n"): DataFrame =
    docs
      .select(col(idCol),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"))
      .groupBy("line")
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
}
