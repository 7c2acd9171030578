package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting / sampling for training-data pipelines.
  *
  * The split must be a pure function of the row KEY — never `rand()` — so
  * that (a) re-runs, retries and backfills land every row in the same
  * split, (b) the split survives repartitioning, and (c) two engines agree
  * (the DuckDB oracle reproduces it exactly). Hash-prefix comparison gives
  * that: md5 renders as lowercase hex in both engines, and the first 8 hex
  * digits are uniform on [0, 16^8), so `md5(key) < threshold(frac)` selects
  * a deterministic fraction ~frac of keys.
  */
object Sampling {

  /** Lowercase-hex threshold string for a fraction: first 8 hex digits of
    * frac * 16^8, as a string prefix all md5 hashes compare against.
    */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction out of range: $frac")
    val scaled = math.round(frac * (1L << 32)).min((1L << 32) - 1).max(0L)
    f"$scaled%08x"
  }

  /** True iff the key falls in the `frac`-sized bucket. The boundary
    * fractions short-circuit: the hex threshold caps at 0xffffffff, so a
    * comparison-based frac=1.0 would still exclude the ~1-in-4e9 keys
    * whose md5 prefix is exactly ffffffff (guaranteed hits at 100 TB).
    */
  def inSplit(key: Column, frac: Double): Column =
    if (frac >= 1.0) lit(true)
    else if (frac <= 0.0) lit(false)
    else substring(md5(key.cast("string")), 1, 8) < lit(thresholdHex(frac))

  /** 'train' / 'eval' label column for a train fraction. */
  def splitLabel(key: Column, trainFrac: Double): Column =
    when(inSplit(key, trainFrac), "train").otherwise("eval")

  /** Leakage-free three-way split: the label is a pure function of the
    * CLUSTER key (content fingerprint for exact-dup clusters, or a
    * connected-component label for near-dup clusters), so every member of
    * a duplicate cluster lands in the SAME split — the guarantee that
    * keeps eval data from leaking into train through copies the row-id
    * split of [[splitLabel]] cannot give. Same md5-prefix mechanism:
    * deterministic, repartition-proof, engine-portable.
    */
  def leakFreeSplitLabel(clusterKey: Column, trainFrac: Double,
      valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      s"fractions out of range: train=$trainFrac val=$valFrac")
    val h = substring(md5(clusterKey.cast("string")), 1, 8)
    // the lit(boolean) guards fold away at plan time and replicate
    // inSplit's frac>=1.0 short-circuit (a bare `h < 'ffffffff'` would
    // misroute the ~1-in-4e9 keys hashing to the cap — guaranteed hits
    // at corpus scale)
    when(lit(trainFrac >= 1.0) || h < lit(thresholdHex(trainFrac)), "train")
      .when(lit(trainFrac + valFrac >= 1.0)
        || h < lit(thresholdHex(trainFrac + valFrac)), "val")
      .otherwise("test")
  }

  /** Stratified keep-filter: a different deterministic sampling fraction
    * per stratum (e.g. downsample over-represented languages, keep the
    * rest whole — the standard corpus rebalancing move). Same hash-prefix
    * mechanism as [[inSplit]], so it shares all its properties: re-run
    * stable, repartition-proof, engine-portable. Unlisted strata get
    * `defaultFrac`.
    */
  def stratifiedKeep(
      key: Column,
      stratum: Column,
      fractions: Map[String, Double],
      defaultFrac: Double = 1.0): Column =
    fractions.toSeq.sortBy(_._1).foldLeft(inSplit(key, defaultFrac)) {
      case (acc, (value, frac)) =>
        when(stratum === value, inSplit(key, frac)).otherwise(acc)
    }

  // ------------------------------------------------------- corpus mixing

  /** Candidate epoch count for a weight: the number of replica slots a row
    * gets before the keep-filter (weight 2.5 → epochs 0,1,2; the last is
    * fractionally sampled). Weight 0 still gets one slot so the filter —
    * not an empty `sequence` — decides, keeping the plan a pure
    * explode+filter.
    */
  private[ops] def epochSlots(w: Double): Int = math.max(math.ceil(w).toInt, 1)

  /** Deterministic per-epoch membership: like [[inSplit]] but salted with
    * the epoch index, so a row's replicas are sampled independently
    * (md5("id#0") and md5("id#1") are unrelated).
    */
  private def inEpochSplit(key: Column, epoch: Column, frac: Double): Column =
    if (frac >= 1.0) lit(true)
    else if (frac <= 0.0) lit(false)
    else substring(md5(concat(key.cast("string"), lit("#"), epoch.cast("string"))),
      1, 8) < lit(thresholdHex(frac))

  /** Weighted corpus mixing — the training-mix op: each stratum (source,
    * language, domain) is up- or down-weighted by a real-valued factor.
    * Weight w replicates every row floor(w) times and adds one more copy
    * for a deterministic (w - floor(w)) fraction of keys; w < 1
    * downsamples. Output = input columns + `epoch` (long, 0-based replica
    * index).
    *
    * Same guarantees as [[inSplit]]: re-run/retry stable, survives
    * repartitioning, engine-portable. Each input row expands to at most
    * ceil(max weight) rows with no shuffle — explode + filter, fully
    * map-side.
    */
  def corpusMix(
      df: org.apache.spark.sql.DataFrame,
      stratum: Column,
      key: Column,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): org.apache.spark.sql.DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      s"negative weight in $weights / $defaultWeight")
    def keepCond(epoch: Column, w: Double): Column = {
      val whole = math.floor(w).toLong
      (epoch < lit(whole)) || inEpochSplit(key, epoch, w - whole)
    }
    val slots: Column = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(epochSlots(defaultWeight))) { case (acc, (v, w)) =>
        when(stratum === v, lit(epochSlots(w))).otherwise(acc)
      }
    val keep: Column = weights.toSeq.sortBy(_._1)
      .foldLeft(keepCond(col("epoch"), defaultWeight)) { case (acc, (v, w)) =>
        when(stratum === v, keepCond(col("epoch"), w)).otherwise(acc)
      }
    df.withColumn("epoch",
        explode(sequence(lit(0L), slots.cast("long") - 1L)))
      .filter(keep)
  }

  /** DuckDB twin of [[corpusMix]], generated from the same weights map:
    * (epochSlotsCase, keepCase) SQL fragments. Assemble as
    * `SELECT ..., unnest(generate_series(0, <slots> - 1)) AS epoch`
    * then `WHERE <keep>`.
    */
  def corpusMixSql(
      keyExpr: String,
      stratumExpr: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): (String, String) = {
    def keepSql(w: Double): String = {
      val whole = math.floor(w).toLong
      val frac = w - whole
      val fracSql =
        if (frac >= 1.0) "TRUE"
        else if (frac <= 0.0) "FALSE"
        else s"substring(md5(CAST($keyExpr AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)), 1, 8) < '${thresholdHex(frac)}'"
      s"(epoch < $whole OR $fracSql)"
    }
    def cases(f: Double => String): String = {
      val whens = weights.toSeq.sortBy(_._1).map { case (v, w) =>
        s"WHEN $stratumExpr = '${v.replace("'", "''")}' THEN ${f(w)}"
      }.mkString(" ")
      s"(CASE $whens ELSE ${f(defaultWeight)} END)"
    }
    (cases(w => epochSlots(w).toString), cases(keepSql))
  }

  /** DuckDB twin of [[stratifiedKeep]] as a WHERE-clause expression,
    * generated from the same fractions map.
    */
  def stratifiedKeepSql(
      keyExpr: String,
      stratumExpr: String,
      fractions: Map[String, Double],
      defaultFrac: Double = 1.0): String = {
    def cmp(frac: Double): String =
      if (frac >= 1.0) "TRUE"
      else if (frac <= 0.0) "FALSE"
      else s"substring(md5(CAST($keyExpr AS VARCHAR)), 1, 8) < '${thresholdHex(frac)}'"
    val whens = fractions.toSeq.sortBy(_._1).reverse.map { case (value, frac) =>
      // escape embedded quotes: the Column twin handles any value, so the
      // generated SQL must too
      s"WHEN $stratumExpr = '${value.replace("'", "''")}' THEN ${cmp(frac)}"
    }.mkString(" ")
    s"(CASE $whens ELSE ${cmp(defaultFrac)} END)"
  }
}
