package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-handshake contract that cost round 1 its correctness
  * signal: the oracle manifest must parse as strict JSON and carry every
  * oracle under BOTH the bare name and the `<name>.parquet` directory key.
  */
class VerifySpec extends AnyFunSuite {

  test("oracleJson emits every oracle under bare and .parquet keys") {
    val json = Verify.oracleJson(Map(
      "q01_agg" -> "SELECT 1",
      "q02_join" -> "SELECT\t2 --\nmultiline \"quoted\""))
    val node = new ObjectMapper().readTree(json) // strict-JSON parse
    for (k <- Seq("q01_agg", "q01_agg.parquet", "q02_join", "q02_join.parquet"))
      assert(node.has(k), s"missing key $k in $json")
    assert(node.get("q01_agg").asText == node.get("q01_agg.parquet").asText)
    assert(node.get("q02_join").asText == "SELECT\t2 --\nmultiline \"quoted\"")
  }

  test("the real catalog manifest parses and covers every oracle-paired query") {
    val oracles = SparkEntry.oracleSql
    val node = new ObjectMapper().readTree(Verify.oracleJson(oracles))
    assert(node.size == oracles.size * 2)
    oracles.keys.foreach { k =>
      assert(node.has(k) && node.has(s"$k.parquet"), k)
    }
    // stripMargin trap (NOTES.md): a line starting with `||` loses one
    // pipe and leaves a LONE `|` in the flattened SQL — `||` concat is
    // fine, a single pipe OUTSIDE a string literal is the mangling
    // signature (no oracle uses bitwise-or; regex alternation is legal
    // but only ever inside a quoted pattern, e.g. q228's pre-tokenizer,
    // so literals are stripped before the scan)
    val lonePipe = "(?<!\\|)\\|(?!\\|)".r
    oracles.foreach { case (k, sql) =>
      val noLiterals = sql.replaceAll("'[^']*'", "''")
      assert(lonePipe.findFirstIn(noLiterals).isEmpty,
        s"$k looks stripMargin-mangled (lone | outside literals): $sql")
    }
  }

  test("bench median: middle sample, and any failed sample poisons the query") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(5.0)) == 5.0)
    assert(Bench.median(Seq(1.0, -1.0, 0.5)) == -1.0)
  }

  test("previousBench reads driver-wrapped files and skips unparseable rounds") {
    // Mirror the driver's actual BENCH_r*.json shape: the bench stdout
    // line nested under "parsed" (null when tail capture truncated it —
    // the round-7 failure this guards against). The newest round here is
    // unparseable, so the comparison base must fall through to r2.
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-prev")
    java.nio.file.Files.writeString(dir.resolve("BENCH_r2.json"),
      """{"n":2,"rc":0,"tail":"...","parsed":{"metric":"total","value":3.5,
        |"queries":{"q01":1.5,"q02":2.0},"sf":"sf0.1"}}""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("BENCH_r3.json"),
      """{"n":3,"rc":0,"tail":"truncat","parsed":null}""")
    val got = Bench.previousBench(dir.toFile)
    assert(got.isDefined)
    val (fname, qs) = got.get
    assert(fname == "BENCH_r2.json")
    assert(qs == Map("q01" -> 1.5, "q02" -> 2.0))
    // raw bench-line format (top-level queries) also parses
    java.nio.file.Files.writeString(dir.resolve("BENCH_r4.json"),
      """{"metric":"total","value":1.0,"queries":{"q09":1.0},"sf":"x"}""")
    assert(Bench.previousBench(dir.toFile).get._1 == "BENCH_r4.json")
    // head-truncated tail (round 7's actual failure mode): parsed is
    // null and the line lost its front, but the medians object survives
    // inside the tail text — must be recovered, not skipped
    java.nio.file.Files.writeString(dir.resolve("BENCH_r5.json"),
      """{"n":5,"rc":0,"tail":"45,\"unit\":\"sec\",\"queries\":{\"q07\":2.25,\"q08\":0.5},\"mins\":{\"q07\":2.0}","parsed":null}""")
    val r5 = Bench.previousBench(dir.toFile)
    assert(r5.get._1 == "BENCH_r5.json")
    assert(r5.get._2 == Map("q07" -> 2.25, "q08" -> 0.5))
  }

  test("previousBench recovers round 7's medians from its truncated tail") {
    // The real committed artifact whose "parsed" is null: the fallback
    // must pull the medians out of the raw tail text so the
    // round-over-round chain has no hole at r7.
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-r7")
    java.nio.file.Files.copy(java.nio.file.Paths.get("BENCH_r07.json"),
      dir.resolve("BENCH_r07.json"))
    val got = Bench.previousBench(dir.toFile)
    assert(got.isDefined, "r7 tail fallback failed")
    val (fname, qs) = got.get
    assert(fname == "BENCH_r07.json")
    assert(qs.get("q01_pricing_summary").exists(v => v > 1.2 && v < 1.4))
    assert(qs.size >= 13, s"r7 recovered only ${qs.size} medians")
  }

  test("previousBench parses the actual committed bench files in the repo") {
    // Against the real repo dir: r7's parsed is null, so this must land on
    // an older round (r6) and recover non-empty medians.
    val got = Bench.previousBench(new java.io.File("."))
    assert(got.isDefined, "no parseable BENCH_r*.json found in repo root")
    val (fname, qs) = got.get
    assert(qs.nonEmpty, s"$fname parsed to empty medians")
    assert(qs.contains("q01_pricing_summary"), s"$fname medians missing headline query")
  }
}
