package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Batched model-inference plumbing for corpus scoring (quality
  * classifiers, reward models, toxicity filters — anything that scores
  * text at corpus scale).
  *
  * The machinery that matters at 100 TB is the BATCHING, and that part is
  * real: rows stream through `mapPartitions`, are buffered into
  * fixed-size batches (the shape every inference runtime wants — ONNX,
  * TensorRT, a JNI-wrapped GGML session), scored one batch at a time, and
  * re-zipped with their ids — constant memory per task, no shuffle, model
  * init amortized per partition exactly like [[Multimodal.extractFeatures]]
  * amortizes codec init.
  *
  * The model itself is pluggable via [[Inference.Scorer]]. The built-in
  * [[Inference.TokenDensityScorer]] is a deterministic, SQL-expressible
  * stand-in (this container ships no inference runtime) — which is
  * precisely what lets the DuckDB oracle verify END TO END that batching
  * preserves the row↔score mapping: if batch boundaries ever misaligned
  * ids and scores, the per-row hash compare would catch it.
  */
object Inference {

  /** A batch scorer. Implementations must be serializable (shipped to
    * executors) and deterministic per input (retries re-score).
    */
  trait Scorer extends Serializable {
    def name: String
    /** Scores, positionally aligned with `texts`. */
    def scoreBatch(texts: IndexedSeq[String]): IndexedSeq[Double]
  }

  /** Deterministic stand-in scorer: token density = n_tokens/(n_chars+1),
    * rounded to 6 dp. Tokenization matches [[graft.functions.TextFunctions]]
    * (trim, split on whitespace runs, drop empties) so the oracle SQL
    * reproduces it exactly.
    */
  final class TokenDensityScorer extends Scorer {
    def name = "token-density"
    def scoreBatch(texts: IndexedSeq[String]): IndexedSeq[Double] =
      texts.map { t0 =>
        val t = if (t0 == null) "" else t0 // null text scores as empty
        val nTokens = t.trim.split("\\s+").count(_.nonEmpty)
        // code POINTS, not UTF-16 units: DuckDB's length() counts code
        // points, so an astral char would silently diverge the oracle
        val nChars = t.codePointCount(0, t.length)
        val raw = nTokens.toDouble / (nChars + 1)
        // floor(x*1e6 + 0.5)/1e6 instead of a rounding library call: both
        // engines run the identical double ops, so no tie-break semantics
        // can diverge (DuckDB twin: floor(raw*1000000 + 0.5)/1000000.0)
        math.floor(raw * 1e6 + 0.5) / 1e6
      }
  }

  /** Score `(id, text)` pairs in fixed-size batches. Output: (id, score)
    * rows, one per input, order preserved within each partition.
    */
  def scoreBatched(
      pairs: Dataset[(Long, String)],
      scorer: Scorer,
      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { rows =>
      // per-partition model init would happen here (session, weights)
      rows.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(_._2).toIndexedSeq)
        require(scores.length == batch.length,
          s"scorer ${scorer.name} returned ${scores.length} scores for ${batch.length} inputs")
        batch.iterator.zip(scores.iterator).map { case ((id, _), s) => (id, s) }
      }
    }.toDF("doc_id", "score")
  }
}
