package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: scrub structured identifiers
  * (emails, IPv4 addresses, phone-shaped numbers) out of document text
  * before it reaches a training set.
  *
  * Runs entirely as `regexp_replace`/`regexp_count` column expressions —
  * codegen'd, no UDF, scales as a pure map (no shuffle). The pattern table
  * is the single source of truth: the Column chain AND the DuckDB oracle
  * SQL are both generated from it, so the two engines cannot drift
  * (the same anti-drift design as the AQI/quality-score constants).
  *
  * Patterns are written in the common subset of Java regex and RE2 (no
  * backreferences, no lookaround) so Spark and DuckDB compile the same
  * automaton.
  */
object Redact {

  /** (name, pattern, replacement token). Order matters: emails first (an
    * email can embed digit runs), then IPs (dotted quads would otherwise
    * be chewed by the phone pattern's digit groups), then phones.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3,4}\\b", "<PHONE>"))

  /** Scrubbed text: all patterns replaced, in table order. */
  def scrub(c: Column): Column =
    patterns.foldLeft(c) { case (acc, (_, re, tok)) =>
      regexp_replace(acc, re, tok)
    }

  /** Per-pattern match counts (named `n_<pattern>`), computed BEFORE any
    * replacement so counts are independent of scrub order.
    */
  def counts(c: Column): Seq[Column] =
    patterns.map { case (name, re, _) =>
      regexp_count(c, lit(re)).cast("long").as(s"n_$name")
    }

  /** DuckDB twin of [[scrub]] over a SQL expression (the 'g' flag makes
    * DuckDB's regexp_replace global like Spark's).
    */
  def scrubSql(expr: String): String =
    patterns.foldLeft(expr) { case (acc, (_, re, tok)) =>
      s"regexp_replace($acc, '$re', '$tok', 'g')"
    }

  /** DuckDB twin of [[counts]]. */
  def countsSql(expr: String): Seq[String] =
    patterns.map { case (name, re, _) =>
      s"CAST(len(regexp_extract_all($expr, '$re')) AS BIGINT) AS n_$name"
    }
}
