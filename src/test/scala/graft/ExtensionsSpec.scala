package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("GraftExtensions registers vec_dot at session build time") {
    spark.sparkContext // ensure base session/context exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = extended.sql(
        """SELECT vec_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
                          array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d""")
      assert(r.head().getDouble(0) == 23.0)
      // the dedup expressions are SQL-reachable through the same hook
      val sh = extended.sql(
        "SELECT simhash64(array(CAST(5 AS BIGINT))) AS s").head().getLong(0)
      assert(sh == 5L) // single hash: its set bits win every counter
      val mh = extended.sql(
        "SELECT minhash_sig(array(CAST(7 AS BIGINT))) AS m").head().getSeq[Long](0)
      assert(mh.length == 64)
      // PII functions share ops/Redact's pattern table
      val scrubbed = extended.sql(
        "SELECT pii_scrub('mail a@b.io ip 10.0.0.1 tel 555-0142') AS s")
        .head().getString(0)
      assert(scrubbed == "mail <EMAIL> ip <IP> tel <PHONE>")
      val n = extended.sql(
        "SELECT pii_count('a@b.io and c@d.org at 1.2.3.4') AS n")
        .head().getLong(0)
      assert(n == 3L)
      // NFC normalization is injected too: decomposed e+U+0301 composes
      // (\\u escapes: raw unicode in this file is encoding-fragile)
      val norm = extended.sql(
        "SELECT nfc_normalize('cafe\\u0301') AS s, " +
        "length(nfc_normalize('cafe\\u0301')) AS l")
        .head()
      assert(norm.getString(0) == "caf\u00e9" && norm.getInt(1) == 4)
      // bloom surface: sketch-aggregate a key set in a scalar subquery,
      // probe it with the codegen'd membership expression
      extended.range(0, 10).createOrReplaceTempView("ext_bloom_keys")
      val hits = extended.sql(
        """SELECT count(*) AS n FROM range(0, 100)
           WHERE bloom_contains((SELECT bloom_agg(id) FROM ext_bloom_keys), id)
             AND id < 10""").head().getLong(0)
      assert(hits == 10L) // all true members pass the probe
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
