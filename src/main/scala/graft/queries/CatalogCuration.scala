package graft.queries

import graft.functions.{TextFunctions => TF}
import graft.ops.{Ranking, Sampling}
import org.apache.spark.sql.functions._

import Catalog._

/** Round-10 curation/statistics wave (q224+): LM-based quality
  * filtering, cross-source score calibration, and spectral embedding
  * analysis — the remaining first-class ops of a training-data engine
  * that the earlier waves didn't cover.
  *
  * One slice of the query catalog; entry ORDER is load-bearing (see
  * [[CatalogTraining]]).
  */
private[queries] object CatalogCuration {

  /** q226: embedding component scale (float -> exact integer domain). */
  private val VecScale = 1000000.0
  /** q226: power-iteration vector scale (components in [-1000, 1000]). */
  private val ItScale = 1000L
  private val Dim = 64

  def entries: Seq[(String, QueryDef)] = Seq(

    // Bigram-LM perplexity filtering — the KenLM-style quality gate of
    // LLM data pipelines: train add-one-smoothed bigram counts on the
    // 90% hash split, score every held-out doc by summed negative log
    // probability. All counts are exact integers; each per-bigram
    // log-prob is snapped to an integer 1e-6 grid IMMEDIATELY
    // (floor(ln(p)*1e6 + 0.5) — ln of a ratio of exact integers, the
    // q208 WOE precedent), so the per-doc SUM is an order-independent
    // integer and partition count can never perturb the result. Scale:
    // one tokenize+explode pass checkpointed for its three consumers,
    // count tables shuffle on uniform token keys, the vocab size is a
    // 1-row broadcast; nothing touches the driver.
    "q224_perplexity_filter" -> QueryDef(
      fn = (s, d) => {
        val ts = col("__ts")
        val bgArr = zip_with(
          slice(ts, lit(1), size(ts) - 1),
          slice(ts, lit(2), size(ts) - 1),
          (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg")))
        val pairs = t(s, d, "documents")
          .select(col("doc_id"), TF.tokens(col("text")).as("__ts"))
          .filter(size(ts) >= 2)
          .withColumn("__train", Sampling.inSplit(col("doc_id"), 0.9))
          .select(col("doc_id"), col("__train"), explode(bgArr).as("p"))
          .select(col("doc_id"), col("__train"),
            col("p.w1").as("__w1"), col("p.bg").as("__bg"))
          .localCheckpoint(eager = true) // bigram counts + history counts + scoring
        val big = pairs.filter(col("__train"))
          .groupBy("__bg").agg(count(lit(1)).as("__c2"))
        val uni = pairs.filter(col("__train"))
          .groupBy("__w1").agg(count(lit(1)).as("__c1"))
        val vocab = uni.agg(count(lit(1)).as("__v")) // |history types|, 1 row
        val nll = -floor(log(
          (coalesce(col("__c2"), lit(0L)) + 1L).cast("double") /
            (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double"))
          * 1000000.0 + 0.5).cast("long")
        pairs.filter(!col("__train"))
          .join(big, Seq("__bg"), "left")
          .join(uni, Seq("__w1"), "left")
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"), nll.as("__nll"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("nll_e6"))
          .withColumn("avg_nll_e6", expr("nll_e6 div n_bigrams"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH base AS (SELECT doc_id, ts,
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          < '${Sampling.thresholdHex(0.9)}' AS is_train
                      FROM (SELECT doc_id, $toksSql AS ts FROM documents)
                      WHERE len(ts) >= 2),
        pr AS (SELECT doc_id, is_train, ts[i] AS w1,
                      ts[i] || ' ' || ts[i + 1] AS bg
               FROM base,
               LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g),
        bg AS (SELECT bg, count(*) AS c2 FROM pr WHERE is_train GROUP BY bg),
        un AS (SELECT w1, count(*) AS c1 FROM pr WHERE is_train GROUP BY w1),
        v AS (SELECT count(*) AS v FROM un),
        sc AS (SELECT pr.doc_id,
                 -CAST(floor(ln(CAST(coalesce(bg.c2, 0) + 1 AS DOUBLE)
                               / CAST(coalesce(un.c1, 0) + v.v AS DOUBLE))
                             * 1000000.0 + 0.5) AS BIGINT) AS nll
               FROM pr LEFT JOIN bg USING (bg) LEFT JOIN un USING (w1)
                       CROSS JOIN v
               WHERE NOT pr.is_train)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(nll) AS BIGINT) AS nll_e6,
               CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_e6
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // Cross-source quantile normalization — map every document's
    // WITHIN-SOURCE (lang) score rank onto the GLOBAL empirical score
    // distribution, the standard fix for "source A's quality scores run
    // hot" before mixing corpora. Resolution-1000 buckets keep it
    // scale-safe: the global distribution compresses to a 1001-row
    // quantile table (distributed percentRankExact -> per-bucket max ->
    // running max over the bounded spine), broadcast back; each doc then
    // needs one window within its source + one broadcast equi-join on
    // the integer bucket. percent_rank is (rank-1)/(n-1) in BOTH engines
    // (identical operands -> identical double -> identical floor), so
    // the bucket ids match exactly; scores and normalized scores stay
    // longs throughout.
    "q225_quantile_normalize" -> QueryDef(
      fn = (s, d) => {
        val sc0 = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            TF.tokenCount(col("text")).as("score"))
          .localCheckpoint(eager = true) // global table + per-source ranks
        val g = Ranking.percentRankExact(sc0.select(col("score")),
            Seq(col("score")), out = "__pr")
          .select(col("score"), floor(col("__pr") * 1000).cast("long").as("__b"))
        val bmax = g.groupBy("__b").agg(max(col("score")).as("__ms"))
        // bounded 1001-row spine; the unpartitioned running-max window
        // is over this spine, never the corpus
        val spine = s.range(0, 1001).select(col("id").as("__b"))
        val gq = spine.join(bmax, Seq("__b"), "left")
          .withColumn("norm_score",
            max(col("__ms")).over(org.apache.spark.sql.expressions.Window
              .orderBy("__b")
              .rowsBetween(Long.MinValue, 0)))
          .select(col("__b"), col("norm_score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("score")
        sc0
          .withColumn("__b", floor(percent_rank().over(w) * 1000).cast("long"))
          .join(broadcast(gq), Seq("__b"))
          .select(col("doc_id"), col("lang"), col("score"), col("norm_score"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH sc AS (SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS score
                    FROM documents),
        g AS (SELECT score,
                     CAST(floor(percent_rank() OVER (ORDER BY score) * 1000)
                          AS BIGINT) AS b
              FROM sc),
        bm AS (SELECT b, max(score) AS ms FROM g GROUP BY b),
        sp AS (SELECT unnest(generate_series(0, 1000)) AS b),
        gq AS (SELECT sp.b,
                      max(bm.ms) OVER (ORDER BY sp.b ROWS UNBOUNDED PRECEDING)
                        AS norm_score
               FROM sp LEFT JOIN bm ON sp.b = bm.b),
        src AS (SELECT doc_id, lang, score,
                       CAST(floor(percent_rank() OVER
                           (PARTITION BY lang ORDER BY score) * 1000)
                            AS BIGINT) AS b
                FROM sc)
        SELECT src.doc_id, src.lang, src.score,
               CAST(gq.norm_score AS BIGINT) AS norm_score
        FROM src JOIN gq ON src.b = gq.b ORDER BY doc_id""")),

    // Dominant embedding direction by power iteration over the EXACT
    // second-moment matrix — the spectral step under PCA whitening /
    // anisotropy audits of an embedding corpus. Components scale to
    // integer 1e-6 units (the cents trick), so the d x d moment matrix
    // is a SUM OF EXACT LONGS built map-side (per-row upper-triangle
    // expansion, partial-agged straight down to d(d+1)/2 = 2080 groups —
    // no per-vector shuffle); three power iterations then run on the
    // driver over the bounded O(d^2) matrix (the IvfIndex-centroids
    // precedent) in BigInt, renormalizing each round to a signed
    // integer 1e-3 grid (sign * floor(|u|*1000 / max|u|) — floor-on-
    // nonnegative ≡ truncation, so BigInt `/` and DuckDB `//` agree).
    // Every number in every round is an exact integer => the unrolled
    // DuckDB oracle reproduces all three iteration vectors bit-for-bit.
    "q226_power_iteration" -> QueryDef(
      fn = (s, d) => {
        val scaled = (x: org.apache.spark.sql.Column) =>
          (x.cast("double") * VecScale + signum(x.cast("double")) * 0.5).cast("long")
        val arr = t(s, d, "embeddings").select(
          transform(col("embedding"), x => scaled(x)).as("__sx"))
        val pairsCol = flatten(transform(sequence(lit(0), lit(Dim - 1)), i =>
          transform(sequence(i, lit(Dim - 1)), j =>
            struct(i.as("i"), j.as("j"),
              (get(col("__sx"), i) * get(col("__sx"), j)).as("p")))))
        val cov = arr.select(explode(pairsCol).as("e"))
          .groupBy(col("e.i").as("i"), col("e.j").as("j"))
          .agg(sum(col("e.p")).as("m"))
        // bounded driver step: d(d+1)/2 = 2080 rows, O(d^2) like the
        // IvfIndex centroid pull — never corpus-sized
        val upper = cov.collect().map(r =>
          (r.getInt(0), r.getInt(1), BigInt(r.getLong(2))))
        val m = Array.ofDim[BigInt](Dim, Dim)
        for (i <- 0 until Dim; j <- 0 until Dim) m(i)(j) = BigInt(0)
        upper.foreach { case (i, j, v) => m(i)(j) = v; if (i != j) m(j)(i) = v }
        def step(v: Array[BigInt]): Array[BigInt] = {
          val u = Array.tabulate(Dim)(i =>
            (0 until Dim).map(j => m(i)(j) * v(j)).sum)
          val mx = u.map(_.abs).max
          u.map(x => if (x.signum >= 0) (x * ItScale) / mx
                     else -(((-x) * ItScale) / mx))
        }
        val v1 = step(Array.fill(Dim)(BigInt(ItScale)))
        val v2 = step(v1)
        val v3 = step(v2)
        import s.implicits._
        (0 until Dim).map(i =>
            (i.toLong, v1(i).toLong, v2(i).toLong, v3(i).toLong))
          .toDF("idx", "v1", "v2", "v3")
          .orderBy("idx")
      },
      oracle = Some {
        val iters = (1 to 3).map { k =>
          s"""u$k AS (SELECT fm.i, sum(CAST(fm.m AS HUGEINT) * v${k - 1}.v) AS u
                 FROM fm JOIN v${k - 1} ON fm.j = v${k - 1}.i GROUP BY fm.i),
              mx$k AS (SELECT max(abs(u)) AS mx FROM u$k),
              v$k AS (SELECT i, CASE WHEN u >= 0
                        THEN CAST((u * $ItScale) // mx AS BIGINT)
                        ELSE -CAST(((-u) * $ItScale) // mx AS BIGINT) END AS v
                      FROM u$k CROSS JOIN mx$k)"""
        }.mkString(",\n")
        s"""
        WITH px AS (SELECT vec_id,
                      unnest(generate_series(0, len(embedding) - 1)) AS i,
                      CAST(round(unnest(embedding) * $VecScale) AS BIGINT) AS x
                    FROM embeddings),
        cov AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS m
                FROM px a JOIN px b ON a.vec_id = b.vec_id AND a.i <= b.i
                GROUP BY 1, 2),
        fm AS (SELECT i, j, m FROM cov
               UNION ALL SELECT j, i, m FROM cov WHERE i <> j),
        v0 AS (SELECT unnest(generate_series(0, ${Dim - 1})) AS i,
                      CAST($ItScale AS BIGINT) AS v),
        $iters
        SELECT CAST(v1.i AS BIGINT) AS idx, v1.v AS v1, v2.v AS v2, v3.v AS v3
        FROM v1 JOIN v2 USING (i) JOIN v3 USING (i) ORDER BY idx"""
      }),
  )
}
