package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — the first (pair) level of the
  * Apriori frequent-itemset ladder, and the building block the graph ops
  * ([[Graph]]) use to derive a co-occurrence edge list from transactional
  * data (reference analogue: the reference's grouped-count analytics over
  * location/parameter pairs; the itemset generalization is ours).
  *
  * Scale shape (100 TB):
  *  - the per-basket pair expansion is the quadratic hazard — it is fenced
  *    BEFORE it happens, twice: (a) the Apriori prune drops every item
  *    whose single-item support is already under the bar (a pair can never
  *    out-support its rarest member), shrinking the self-join input, and
  *    (b) `maxBasketSize` drops pathological mega-baskets (a single
  *    100k-item basket would alone emit 5e9 pairs) — the standard trade in
  *    production basket mining, surfaced as an explicit knob rather than a
  *    silent cap;
  *  - the expansion itself is a self-equi-join on the basket key (shuffle
  *    keyed by basket, pairs emitted stream-side, never materialized per
  *    basket — an A/B against a map-side collect+explode variant read
  *    ~1.7x in the join's favor on wide baskets, see the in-method
  *    comment), and the pair-support aggregation gets map-side partial
  *    collapse on the (a, b) key;
  *  - no driver state, no windows, no collect.
  */
object Baskets {

  /** Frequent co-occurring item PAIRS: (item_a, item_b, support) with
    * `item_a < item_b`, support = number of distinct baskets containing
    * both, filtered to `support >= minSupport`.
    *
    * @param maxBasketSize baskets with more distinct items than this are
    *        dropped entirely (quadratic-fanout fence). `0` disables.
    * @param inputDistinct caller guarantees `df` already holds DISTINCT
    *        (basket, item) rows — skips the internal distinct, which is a
    *        full extra exchange of the input when the caller has just
    *        deduplicated (and often checkpointed) the same frame (guide
    *        §2.4 "a distinct on data that is already unique").
    * @param packedItemPairs caller guarantees every item id is an integer
    *        in `[0, 2^31)` (a runtime fact — prove it with one cheap agg
    *        over the input, the q306 pattern) — the pair-support
    *        aggregation then keys on ONE packed long (`a << 32 | b`,
    *        lossless and order-preserving under the guarantee) instead of
    *        two id columns. In UnsafeRow terms that is one 8-byte slot
    *        instead of two on every row of the pair-support exchange —
    *        the operator's largest shuffle — plus single-column hashing
    *        and key comparison (guide §2.3 "narrower types"; note a plain
    *        long→int CAST saves nothing here, UnsafeRow pads every field
    *        to 8 bytes — packing is the form of narrowing that actually
    *        moves bytes). Output ids are decoded back to the input item
    *        type; results are bit-identical.
    * @param pairJoinHint join-strategy hint for the basket self-join
    *        ("" = leave it to the planner). The default keeps the r15
    *        measured choice — shuffled-hash, ~15-20% over sort-merge on
    *        the bench baskets because no per-side sort of the interaction
    *        stream runs — but a hinted SHJ build CANNOT spill: callers
    *        whose per-partition basket volume is not bounded (no
    *        `maxBasketSize` fence, unknown interaction count) should pass
    *        "" and keep the planner's spillable sort-merge fallback
    *        (r15 ADVICE; guide §3.1/§5).
    */
  def frequentItemPairs(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int = 0,
      inputDistinct: Boolean = false,
      packedItemPairs: Boolean = false,
      pairJoinHint: String = "shuffle_hash"): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val base = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
    val pairs0 = if (inputDistinct) base else base.distinct()

    // Apriori prune: an item in fewer than minSupport baskets cannot be
    // in a frequent pair. The frequent-item set is usually small (it is
    // the support-filtered vocabulary), so AQE turns this into a
    // broadcast semi join against the unpruned basket stream.
    val frequentItems = pairs0.groupBy("__i")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minSupport)
      .select("__i")
    val pruned = pairs0.join(frequentItems, Seq("__i"), "left_semi")

    val fenced =
      if (maxBasketSize <= 0) pruned
      else {
        val small = pruned.groupBy("__b")
          .agg(count(lit(1)).as("__sz"))
          .filter(col("__sz") <= maxBasketSize)
          .select("__b")
        pruned.join(small, Seq("__b"), "left_semi")
      }

    // Pair expansion stays a basket-keyed SELF-JOIN, measured, not
    // assumed (r15 opt round): a map-side variant (collect the sorted
    // item set per basket, explode every C(n,2) pair from nested
    // transforms) saved one basket exchange but materializes the full
    // per-basket pair ARRAY before exploding it — on the 40-item
    // customer-basket grain (q306) the allocation cost measured ~1.7x
    // SLOWER than this join (9.3 s vs 3.8 s pair phase, drift-adjusted
    // ~6.6 vs 3.8), while on 4-item order baskets it was a wash. The
    // join streams each pair without materialization; the pair-support
    // exchange — identical in both forms — is the real floor.
    val a = fenced.select(col("__b").as("__ba"), col("__i").as("item_a"))
    val b0 = fenced.select(col("__b").as("__bb"), col("__i").as("item_b"))
    // join strategy is the caller's call (see pairJoinHint scaladoc);
    // the default keeps the r15-measured shuffled-hash choice
    val b = if (pairJoinHint.isEmpty) b0 else b0.hint(pairJoinHint)
    val joined = a.join(b,
      col("__ba") === col("__bb") && col("item_a") < col("item_b"))
    if (packedItemPairs) {
      val itemType = df.schema(itemCol).dataType
      joined
        .select(shiftleft(col("item_a").cast("long"), 32)
          .bitwiseOR(col("item_b").cast("long")).as("__pair"))
        .groupBy("__pair")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
        .select(
          shiftright(col("__pair"), 32).cast(itemType).as("item_a"),
          col("__pair").bitwiseAND(lit(0xFFFFFFFFL)).cast(itemType).as("item_b"),
          col("support"))
    } else {
      joined
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
    }
  }

  /** Frequent item TRIPLES — the next rung of the Apriori ladder:
    * (item_a, item_b, item_c) with `a < b < c`, support = distinct
    * baskets containing all three, `support >= minSupport`.
    *
    * The cubic per-basket fanout is fenced by the FULL Apriori argument,
    * not just the single-item prune: the (a, b) wedge is semi-joined
    * against the FREQUENT PAIR set before it is extended by a third arm,
    * so candidate generation is bounded by |frequent pairs| x basket
    * width instead of width^3. (The final support filter alone already
    * guarantees correctness — every sub-pair of a frequent triple is at
    * least as frequent — the semi-join is purely the fanout fence, which
    * is the whole point of Apriori.) All joins are basket-keyed
    * equi-joins; map-side partial aggregation collapses the triple key.
    */
  def frequentItemTriples(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int = 0): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val pairs = frequentItemPairs(df, basketCol, itemCol, minSupport, maxBasketSize)
      .select("item_a", "item_b")
      .localCheckpoint(eager = true) // reused as prune set AND item filter
    val pairItems = pairs.select(col("item_a").as("__i"))
      .unionAll(pairs.select(col("item_b").as("__i"))).distinct()

    val po = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
      .join(pairItems, Seq("__i"), "left_semi")
    val fenced0 =
      if (maxBasketSize <= 0) po
      else {
        val small = po.groupBy("__b")
          .agg(count(lit(1)).as("__sz"))
          .filter(col("__sz") <= maxBasketSize)
          .select("__b")
        po.join(small, Seq("__b"), "left_semi")
      }
    // the three join arms reference this frame — pin it so the source
    // scan + distinct + prune run ONCE, not once per arm (self-joins
    // replicate the subtree in the static plan; static ReusedExchange
    // does not apply across the differing aliases)
    val fenced = fenced0.localCheckpoint(eager = true)

    val a = fenced.select(col("__b").as("__ba"), col("__i").as("item_a"))
    val b = fenced.select(col("__b").as("__bb"), col("__i").as("item_b"))
    val c = fenced.select(col("__b").as("__bc"), col("__i").as("item_c"))
    val ab = a.join(b, col("__ba") === col("__bb") && col("item_a") < col("item_b"))
      .join(pairs, Seq("item_a", "item_b"), "left_semi") // Apriori fence
    ab.join(c, col("__ba") === col("__bc") && col("item_b") < col("item_c"))
      .groupBy("item_a", "item_b", "item_c")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
