package graft.queries

import graft.functions.{TextFunctions => TF}
import graft.ops.{Ranking, Sampling}
import org.apache.spark.sql.expressions.Window
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

  /** q227: touch channels = every event type except the conversion. */
  private val AttributionChannels: Seq[String] =
    eventTypes.filterNot(_ == "purchase").sorted
  /** q227: synchronous value-iteration rounds (both engines unroll). */
  private val MarkovRounds = 6

  /** q228: GPT-2-style pre-tokenizer — maximal runs of word chars OR of
    * non-word-non-space chars. Explicit classes only (no lookbehind, no
    * \\W/\\s shorthands), so Java regex and RE2 read it identically; the
    * same literal is embedded in the Spark expr and the DuckDB oracle.
    */
  private val SubwordRegex = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\r\\f]+"

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
    // is a SUM OF EXACT LONGS accumulated per partition by Gram
    // (MLlib's computeGramianMatrix shape: each partition folds into
    // ONE d(d+1)/2 long array, only partitions x 2080 partial rows
    // shuffle — a 2080x-per-row explode never materializes); three
    // power iterations then run on the driver over the bounded O(d^2)
    // matrix (the IvfIndex-centroids precedent) in BigInt,
    // renormalizing each round to a signed integer 1e-3 grid
    // (sign * floor(|u|*1000 / max|u|) — floor-on-nonnegative ≡
    // truncation, so BigInt `/` and DuckDB `//` agree). Every number in
    // every round is an exact integer => the unrolled DuckDB oracle
    // reproduces all three iteration vectors bit-for-bit.
    "q226_power_iteration" -> QueryDef(
      fn = (s, d) => {
        val scaled = (x: org.apache.spark.sql.Column) =>
          (x.cast("double") * VecScale + signum(x.cast("double")) * 0.5).cast("long")
        val arr = t(s, d, "embeddings").select(
          transform(col("embedding"), x => scaled(x)).as("__sx"))
        val cov = {
          import s.implicits._
          graft.ops.Gram.upperGramian(arr.as[Seq[Long]], Dim)
        }
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

    // Markov-chain attribution by REMOVAL EFFECT — the principled
    // upgrade over q113's last-touch: build the first-order journey
    // chain (START -> touches -> CONV on first purchase / NULL), then
    // for each channel compare absorption-in-CONV probability with that
    // channel knocked out (its incoming transitions routed to NULL).
    // Absorption probabilities come from 6 synchronous value-iteration
    // rounds computed ENTIRELY in integers: transition probabilities
    // stay as count/total rationals and each round is
    // p'(s) = floor(sum_t c(s,t) * p(t) / n(s)) on a 1e-6 grid, so the
    // driver's BigInt loop and the oracle's unrolled SQL agree exactly.
    // Scale: the corpus sees one user-keyed window pass; the driver
    // holds only the <= |states|^2 transition-count matrix (bounded,
    // like q226's moment matrix).
    "q227_markov_attribution" -> QueryDef(
      fn = (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wDesc = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val ev = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val firstP = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(min(struct(col("ts"), col("event_id"))).as("__p"))
        val touches = ev.filter(col("event_type") =!= "purchase")
          .join(firstP, Seq("user_id"), "left")
          .filter(col("__p").isNull ||
            struct(col("ts"), col("event_id")) < col("__p"))
        val seqd = touches
          .withColumn("__prev", lag(col("event_type"), 1).over(w))
          .withColumn("__rnd", row_number().over(wDesc))
        val mid = seqd.select(coalesce(col("__prev"), lit("START")).as("src"),
          col("event_type").as("dst"))
        val lastT = seqd.filter(col("__rnd") === 1)
          .select(col("event_type").as("src"),
            when(col("__p").isNotNull, lit("CONV")).otherwise(lit("NULL"))
              .as("dst"))
        val noTouch = firstP
          .join(touches.select("user_id").distinct(), Seq("user_id"), "left_anti")
          .select(lit("START").as("src"), lit("CONV").as("dst"))
        // bounded driver pull: <= (|channels|+1)^2 transition counts
        val trans = mid.unionAll(lastT).unionAll(noTouch)
          .groupBy("src", "dst").agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        val states = "START" +: AttributionChannels
        val outs = states.map(st =>
          st -> trans.collect { case ((s2, t2), c) if s2 == st => t2 -> c }.toSeq)
          .toMap
        def absorb(removed: Option[String]): Long = {
          var p = states.map(_ -> BigInt(0)).toMap
          for (_ <- 1 to MarkovRounds) {
            val prev = p
            p = states.map { st =>
              val o = outs(st)
              val n = o.map(_._2).sum
              if (n == 0L) st -> BigInt(0)
              else {
                val num = o.map { case (t2, c) =>
                  val pv: BigInt = t2 match {
                    case "CONV"                       => BigInt(1000000)
                    case "NULL"                       => BigInt(0)
                    case x if removed.contains(x)     => BigInt(0)
                    case x                            => prev.getOrElse(x, BigInt(0))
                  }
                  BigInt(c) * pv
                }.sum
                st -> num / BigInt(n)
              }
            }.toMap
          }
          p("START").toLong
        }
        val full = absorb(None)
        import s.implicits._
        AttributionChannels.map { c =>
          val rem = absorb(Some(c))
          (c, full, rem, full - rem)
        }.toDF("channel", "p_full_e6", "p_removed_e6", "removal_e6")
          .orderBy("channel")
      },
      oracle = Some {
        def chain(tag: String, removedCase: String): String =
          (1 to MarkovRounds).map { k =>
            s"""p_${tag}_$k AS (SELECT tc.src AS s,
                  CAST(sum(tc.c * CASE WHEN tc.dst = 'CONV' THEN 1000000
                                       WHEN tc.dst = 'NULL' THEN 0
                                       $removedCase
                                       ELSE coalesce(pp.p, 0) END)
                       // max(tc.n) AS BIGINT) AS p
                FROM tc LEFT JOIN p_${tag}_${k - 1} pp ON tc.dst = pp.s
                GROUP BY tc.src)"""
          }.mkString(",\n")
        val zero = (st: String) =>
          s"p_${st}_0 AS (SELECT DISTINCT src AS s, CAST(0 AS BIGINT) AS p FROM tc)"
        val chains = (zero("full") + ",\n" + chain("full", "")) +: AttributionChannels.map(c =>
          zero(c) + ",\n" + chain(c, s"WHEN tc.dst = '$c' THEN 0"))
        val removedSel = AttributionChannels.map(c =>
          s"WHEN '$c' THEN (SELECT p FROM p_${c}_$MarkovRounds WHERE s = 'START')")
          .mkString(" ")
        s"""
        WITH fp AS (SELECT user_id, ts AS pts, event_id AS pid
                    FROM (SELECT user_id, ts, event_id,
                            row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
                          FROM events WHERE event_type = 'purchase')
                    WHERE rn = 1),
        tch AS (SELECT e.user_id, e.ts, e.event_id, e.event_type, fp.pts
                FROM events e LEFT JOIN fp USING (user_id)
                WHERE e.event_type <> 'purchase'
                  AND (fp.pts IS NULL
                       OR (e.ts, e.event_id) < (fp.pts, fp.pid))),
        sq AS (SELECT user_id, event_type, pts,
                      lag(event_type) OVER w AS prev,
                      row_number() OVER w2 AS rnd
               FROM tch
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                      w2 AS (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC)),
        allt AS (SELECT coalesce(prev, 'START') AS src, event_type AS dst
                 FROM sq
                 UNION ALL
                 SELECT event_type AS src,
                        CASE WHEN pts IS NOT NULL THEN 'CONV'
                             ELSE 'NULL' END AS dst
                 FROM sq WHERE rnd = 1
                 UNION ALL
                 SELECT 'START', 'CONV' FROM fp
                 WHERE user_id NOT IN (SELECT DISTINCT user_id FROM tch)),
        tc AS (SELECT src, dst, count(*) AS c,
                      sum(count(*)) OVER (PARTITION BY src) AS n
               FROM allt GROUP BY src, dst),
        ${chains.mkString(",\n")}
        SELECT ch.channel,
               (SELECT p FROM p_full_$MarkovRounds WHERE s = 'START')
                 AS p_full_e6,
               CASE ch.channel $removedSel END AS p_removed_e6,
               (SELECT p FROM p_full_$MarkovRounds WHERE s = 'START')
                 - CASE ch.channel $removedSel END AS removal_e6
        FROM (VALUES ${AttributionChannels.map(c => s"('$c')").mkString(", ")})
             ch(channel)
        ORDER BY ch.channel"""
      }),

    // Tokenizer fertility per language — subword-to-word ratio, the
    // standard "how many BPE pieces per whitespace token does this
    // language cost" readout that drives per-language token budgeting.
    // Subwords use a GPT-2-style pre-tokenization both engines can run
    // verbatim (maximal runs of word chars or of non-word-non-space
    // chars — an explicit-class regex, no lookbehind, so RE2 and Java
    // agree). Ratios are exact: total counts are longs and fertility is
    // an integer floor-division on a 1e-6 grid. One scan, one tiny agg.
    "q228_tokenizer_fertility" -> QueryDef(
      fn = (s, d) => {
        val sub = size(expr(
          s"regexp_extract_all(text, '$SubwordRegex', 0)")).cast("long")
        t(s, d, "documents")
          .select(col("lang"), TF.tokenCount(col("text")).as("__tk"),
            sub.as("__sw"))
          .filter(col("__tk") > 0)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("__tk")).as("n_tokens"),
            sum(col("__sw")).as("n_subwords"))
          .withColumn("fertility_e6",
            expr("(n_subwords * 1000000L) div n_tokens"))
          .orderBy("lang")
      },
      oracle = Some(s"""
        WITH sc AS (SELECT lang,
                      CAST(len($toksSql) AS BIGINT) AS tk,
                      CAST(len(regexp_extract_all(text, '$SubwordRegex'))
                           AS BIGINT) AS sw
                    FROM documents)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(tk) AS BIGINT) AS n_tokens,
               CAST(sum(sw) AS BIGINT) AS n_subwords,
               CAST((sum(sw) * 1000000) // sum(tk) AS BIGINT) AS fertility_e6
        FROM sc WHERE tk > 0
        GROUP BY lang ORDER BY lang""")),

    // Character-level Shannon entropy per document — the gibberish /
    // mojibake / base64-blob detector of text curation. Category counts
    // (26 lowercased letters + one OTHER bucket) come from the exact
    // length-minus-replace trick; each category's log-probability is
    // snapped to the integer 1e-6 grid immediately (the q224 rule), so
    // the per-doc weighted sum is an order-free integer and
    // entropy_e6 = floor(-sum(c_i * L_i) / n). Pure codegen'd per-row
    // expressions — no shuffle at all until the final ORDER BY.
    "q229_char_entropy" -> QueryDef(
      fn = (s, d) => {
        val lt = lower(col("text"))
        val n = length(lt).cast("long")
        val letters = ('a' to 'z').map(_.toString)
        val cnts = letters.map(ch =>
          (length(lt) - length(regexp_replace(lt, ch, ""))).cast("long"))
        val other = n - cnts.reduce(_ + _)
        def term(c: org.apache.spark.sql.Column) =
          when(c > 0, c * floor(log(c.cast("double") / n.cast("double"))
            * 1000000.0 + 0.5).cast("long")).otherwise(0L)
        val sumTerms = (cnts.map(term) :+ term(other)).reduce(_ + _)
        t(s, d, "documents")
          .select(col("doc_id"), n.as("n_chars"), (-sumTerms).as("__s"))
          .filter(col("n_chars") > 0)
          .withColumn("entropy_e6", expr("__s div n_chars"))
          .select(col("doc_id"), col("n_chars"), col("entropy_e6"))
          .orderBy("doc_id")
      },
      oracle = Some {
        val letters = ('a' to 'z').map(_.toString)
        val cnts = letters.map(ch =>
          s"CAST(length(lt) - length(replace(lt, '$ch', '')) AS BIGINT)")
        val cntCols = cnts.zipWithIndex
          .map { case (e, i) => s"$e AS c$i" }.mkString(", ")
        val otherExpr = s"n - (${(0 until letters.size).map(i => s"c$i")
          .mkString(" + ")})"
        val term = (c: String) =>
          s"""CASE WHEN $c > 0 THEN $c * CAST(floor(ln(CAST($c AS DOUBLE)
                / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
              ELSE 0 END"""
        val sumTerms = ((0 until letters.size).map(i => term(s"c$i"))
          :+ term("oth")).mkString(" + ")
        s"""
        WITH b AS (SELECT doc_id, lower(text) AS lt,
                          CAST(length(lower(text)) AS BIGINT) AS n
                   FROM documents),
        c AS (SELECT doc_id, n, $cntCols FROM b),
        o AS (SELECT doc_id, n, ${(0 until letters.size).map(i => s"c$i")
          .mkString(", ")}, $otherExpr AS oth FROM c)
        SELECT doc_id, n AS n_chars,
               CAST((-($sumTerms)) // n AS BIGINT) AS entropy_e6
        FROM o WHERE n > 0 ORDER BY doc_id"""
      }),

    // Inter-source (language) exact-duplicate census — the dataset-
    // mixing diagnostic "how much of source A is literally inside
    // source B": fingerprint groups reduced to their distinct language
    // sets, exploded to unordered language pairs, counted. The diagonal
    // (la = lb) is each source's own fingerprint-group count, so shares
    // are computable downstream. One uniform fingerprint-keyed shuffle;
    // the pair fanout per group is bounded by |langs|^2.
    "q230_dup_matrix" -> QueryDef(
      fn = (s, d) => {
        val fp = t(s, d, "documents")
          .select(TF.fingerprint(col("text")).as("__fp"), col("lang"))
          .distinct()
        val e1 = fp.select(col("__fp").as("fa"), col("lang").as("la"))
        val e2 = fp.select(col("__fp").as("fb"), col("lang").as("lb"))
        e1.join(e2, col("fa") === col("fb") && col("la") <= col("lb"))
          .groupBy("la", "lb").agg(count(lit(1)).as("n_fps"))
          .orderBy("la", "lb")
      },
      oracle = Some(s"""
        WITH f AS (SELECT DISTINCT md5(array_to_string($toksSql, ' ')) AS fp,
                          lang
                   FROM documents)
        SELECT a.lang AS la, b.lang AS lb, count(*) AS n_fps
        FROM f a JOIN f b ON a.fp = b.fp AND a.lang <= b.lang
        GROUP BY 1, 2 ORDER BY 1, 2""")),
  )
}
