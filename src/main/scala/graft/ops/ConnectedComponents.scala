package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the transitive-closure step
  * that turns near-duplicate PAIRS (from MinHash/SimHash/embedding LSH)
  * into duplicate GROUPS with one canonical id each. Single-hop
  * canonicalization (min id among direct partners) misses chains
  * a-b, b-c ⇒ {a,b,c}; this closes them.
  *
  * Algorithm: iterated min-label propagation with pointer jumping (the
  * DataFrame form of large-star/small-star). Each round every node adopts
  * the minimum label in its neighborhood, then shortcuts its label to its
  * label's label (path halving) — so convergence is O(log diameter)
  * rounds, not O(diameter): a 1000-long duplicate chain closes in ~10
  * rounds instead of ~1000. Each round is one groupBy-min plus two
  * key-partitioned joins; nothing touches the driver except the
  * convergence counter.
  */
object ConnectedComponents {

  /** @param pairs two-column frame of undirected edges (id_a, id_b)
    * @return (id, component) — component = min id reachable; singleton
    *         nodes absent from `pairs` are their own components and are
    *         not emitted
    */
  def components(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIterations: Int = 20): DataFrame = {
    // bidirectional expansion via ONE map-side explode, not a self-union:
    // the union form referenced the caller's `pairs` tree twice, so a
    // non-trivial candidate pass (e.g. SemDeDup's cluster pair join)
    // executed twice before the distinct (measured as the bulk of
    // q286's keepCanonical phase, r15 opt round; guide §2.4)
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct()
      .cache()

    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("label"))
      .select(col("id"), least(col("label"), col("id")).as("label"))

    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // propagate: each node takes min(own label, neighbors' labels).
      // The round-start label rides along as __old so the convergence
      // check below needs NO extra join back to `labels` (guide §2.4) —
      // one count over the round's own output decides it.
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // pointer jumping: label ← label(label). Labels only decrease, so the
      // shortcut is safe, and chains halve every round (O(log diameter)).
      // localCheckpoint truncates the lineage: the self-join references
      // `propagated` twice, so without truncation the logical plan doubles
      // every round (exponential planning cost). LAZY checkpoint: the
      // convergence count below is the round's one materializing job, and
      // it caches the frame as it runs — an eager checkpoint would spend
      // a second job per round computing the same thing (guide §1.2). On
      // a cluster with unreliable executors, swap for checkpoint() on
      // reliable storage.
      val next = propagated
        .join(propagated.select(col("id").as("label"), col("label").as("jump")),
          Seq("label"), "left")
        .select(col("id"), col("__old"),
          least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
      val changed = next.filter(col("label") =!= col("__old")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    // old per-round checkpoint blocks are reclaimed by Spark's
    // ContextCleaner once unreferenced; what must not be silent is running
    // out of rounds with labels still moving — the result would be a
    // component split in two
    if (!converged)
      graft.pipeline.Log.warning(
        s"connected components hit maxIterations=$maxIterations before convergence; " +
          "labels may be incomplete — raise maxIterations")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Dedup mapping from LSH pairs with full transitivity: every non-
    * canonical member maps to its component's min id.
    */
  def dedupMapping(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b"): DataFrame =
    components(pairs, aCol, bCol)
      .filter(col("id") =!= col("component"))
      .select(col("id"), col("component").as("canonical_id"))
}
