package graft.queries

import graft.{GraftSpark, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the selection/governance wave (q301+) that oracle
  * equality cannot see: the oracle proves both engines agree, not that
  * the agreed numbers have the operator's defining properties — k-center
  * covering radii must be non-increasing, the label-audit confusion
  * matrix must partition the corpus, the forget-sweep arithmetic must
  * cascade, and the decay weights must stay inside their halving bounds.
  */
class CatalogSelectionSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q301: greedy k-center radii are non-increasing and centers distinct") {
    val rows = SparkEntry.queries("q301_kcenter_coreset")(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 8)
    assert(rows.head.isNullAt(rows.head.fieldIndex("radius"))) // seed has no radius
    val radii = rows.tail.map(_.getAs[Double]("radius"))
    // covering radius of a growing center set cannot increase
    radii.sliding(2).foreach { case Array(a, b) => assert(b <= a, radii.toSeq.toString) }
    assert(radii.forall(r => r >= 0.0 && r <= 2.0)) // cosine distance range
  }

  test("q302: confusion matrix partitions the corpus and flags real suspects") {
    val rows = SparkEntry.queries("q302_knn_label_audit")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total == corpus, s"matrix covers $total of $corpus vectors")
    // anti-degeneracy: the weakly-clustered fixture must yield BOTH
    // agreeing vectors and suspected mislabels
    assert(rows.exists(!_.getAs[Boolean]("is_suspect")))
    assert(rows.exists(_.getAs[Boolean]("is_suspect")))
    rows.foreach { r =>
      assert((r.getAs[Long]("label") != r.getAs[Long]("knn_label"))
        == r.getAs[Boolean]("is_suspect"))
    }
  }

  test("q303: forget cascade arithmetic holds and touches every table") {
    val rows = SparkEntry.queries("q303_forget_sweep")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted.toSeq
      == Seq("customer", "events", "lineitem", "orders"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") + r.getAs[Long]("n_forget")
        == r.getAs[Long]("n_before"), r.toString)
      // the 1/97 cohort is sparse but never empty at any sf
      assert(r.getAs[Long]("n_forget") > 0, r.toString)
      assert(r.getAs[Long]("n_forget") < r.getAs[Long]("n_before") / 2, r.toString)
    }
  }

  test("q304: decay weights stay inside halving bounds; deviations are real") {
    val rows = SparkEntry.queries("q304_decayed_counts")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val d = r.getAs[Long]("decayed_e6")
      assert(d <= n * 1000000L, r.toString) // no weight above 1e6
      assert(d >= n * (1000000L >> 9), r.toString) // none below the cap
    }
    // shares on both axes each sum to ~1e6 (integer-div floor slack)
    val sp = rows.map(_.getAs[Long]("plain_share_e6")).sum
    val sd = rows.map(_.getAs[Long]("decayed_share_e6")).sum
    assert(sp <= 1000000L && sp > 1000000L - rows.length)
    assert(sd <= 1000000L && sd > 1000000L - rows.length)
    // anti-degeneracy: recency skew differs across event types
    assert(rows.map(_.getAs[Long]("dev_e6")).exists(_ != 0L))
  }

  test("q305: survivorship resolves per-attribute, not per-record") {
    val rows = SparkEntry.queries("q305_golden_record")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val name = r.getAs[String]("name")
      val phone = r.getAs[String]("phone")
      // name: original case survives only where no variant source exists
      if (cl % 6 == 0) assert(name != name.toUpperCase, r.toString)
      else assert(name == name.toUpperCase, r.toString)
      // phone: all-null exactly when the CRM hole meets the absent app source
      assert((phone == null) == (cl % 5 == 0 && cl % 2 == 0), r.toString)
      // the app variant (dash-less) wins only where CRM's phone is the hole
      if (cl % 5 == 0 && cl % 2 != 0) assert(!phone.contains("-"), r.toString)
    }
    // anti-degeneracy: the merged records genuinely mix sources
    assert(rows.exists(r => r.getAs[String]("name") != r.getAs[String]("name").toUpperCase))
    assert(rows.exists(r => Option(r.getAs[String]("phone")).exists(!_.contains("-"))))
  }

  test("q306: recommendations are unseen items with dense ranks") {
    val rows = SparkEntry.queries("q306_item_cf_recs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val owned = spark.read.parquet(s"$sf/orders.parquet").as("o")
      .join(spark.read.parquet(s"$sf/lineitem.parquet").as("l"),
        org.apache.spark.sql.functions.expr("o.o_orderkey = l.l_orderkey"))
      .selectExpr("o.o_custkey AS u", "l.l_partkey AS i")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (u, it) = (r.getAs[Long]("user_id"), r.getAs[Long]("item"))
      assert(!owned.contains((u, it)), s"recommended an owned item: $r")
      assert(r.getAs[Long]("score_e6") > 0L)
    }
    // ranks are dense 1..k per user
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("q307: streaming fold reproduces the batch SCD2 table cell-exactly") {
    val streamed = SparkEntry.queries("q307_stream_scd2")(spark, sf).collect()
    val batch = SparkEntry.queries("q107_scd2_intervals")(spark, sf).collect()
    // the 3-way parity claim, asserted directly (the oracle proves each
    // against DuckDB; this proves them against each other in-process)
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("q308: pair counts dominate user support and the window binds") {
    val rows = SparkEntry.queries("q308_seq_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") >= r.getAs[Long]("n_users"), r.toString)
      assert(r.getAs[Long]("n_users") <= users, r.toString)
    }
  }
}
