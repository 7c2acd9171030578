package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's assumptions about the driver-generated testdata, pinned
  * as ONE loud early-failing suite. The driver has regenerated
  * `/root/testdata` with a changed encoding before (round 7: `events.ts`
  * nanos → micros-NTZ), and the failure then surfaced as 12 cryptic
  * query crashes and 6 scattered test failures. A regeneration that
  * breaks an assumption should fail HERE first, with a message naming
  * the table, the column, and what the engine expects after
  * [[Tables.load]] normalization.
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def loaded(name: String) = Tables.load(spark, sf, name)

  private def expectType(table: String, col: String, ok: DataType => Boolean,
      expected: String): Unit = {
    val df = loaded(table)
    assert(df.schema.fieldNames.contains(col),
      s"testdata contract: $table has lost column '$col' " +
        s"(present: ${df.schema.fieldNames.mkString(", ")})")
    val dt = df.schema(col).dataType
    assert(ok(dt),
      s"testdata contract: $table.$col loads as $dt, engine expects " +
        s"$expected — if the driver re-encoded this column, extend " +
        "Tables.load normalization (see TsEncodingSpec)")
  }

  private def isTimestampish(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  test("events.ts normalizes to session-TZ TimestampType") {
    // strict TimestampType (not NTZ): unix_millis/window call sites
    // require it; Tables.normalizeTs owns the conversion
    expectType("events", "ts", _ == TimestampType, "TimestampType")
    expectType("events", "event_id", _ == LongType, "LongType")
    expectType("events", "user_id", _ == LongType, "LongType")
    expectType("events", "value", _ == DoubleType, "DoubleType")
    expectType("events", "event_type", _ == StringType, "StringType")
    expectType("events", "props", _ == StringType, "StringType")
  }

  test("orders/lineitem event-time columns load timestamp-typed") {
    expectType("orders", "o_orderdate", isTimestampish, "a timestamp type")
    expectType("lineitem", "l_shipdate", isTimestampish, "a timestamp type")
    expectType("orders", "o_totalprice", _ == DoubleType, "DoubleType")
    expectType("lineitem", "l_quantity", _ == DoubleType, "DoubleType")
    expectType("lineitem", "l_extendedprice", _ == DoubleType, "DoubleType")
    expectType("lineitem", "l_discount", _ == DoubleType, "DoubleType")
  }

  test("documents carries the text-pipeline contract") {
    expectType("documents", "doc_id", _ == LongType, "LongType")
    expectType("documents", "text", _ == StringType, "StringType")
    expectType("documents", "lang", _ == StringType, "StringType")
    expectType("documents", "source", _ == StringType, "StringType")
  }

  test("embeddings.embedding is array<float> (VecDot's input contract)") {
    expectType("embeddings", "vec_id", _ == LongType, "LongType")
    expectType("embeddings", "embedding",
      { case ArrayType(FloatType, _) => true; case _ => false },
      "ArrayType(FloatType) — the native VecDot expression and every ANN " +
        "entry assume float elements")
  }

  test("normalized event-time VALUES land in a plausible epoch range") {
    // The type asserts above cannot catch a unit mix-up that still
    // yields TimestampType (round-8 advice: a micros-long re-encode fed
    // to a nanos divisor scales the time axis 1000x and every downstream
    // window silently shifts). Pin the VALUES: synthetic dates are
    // 1990s-2020s; a 1000x scale in either direction lands in early-1970
    // (divide) or past year 3000 (multiply), far outside [1990, 2100).
    val lo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    for ((table, c) <- Seq(("events", "ts"), ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"))) {
      val row = loaded(table)
        .selectExpr(s"min(cast($c as timestamp))", s"max(cast($c as timestamp))")
        .head()
      val (mn, mx) = (row.getTimestamp(0), row.getTimestamp(1))
      assert(mn != null && !mn.before(lo) && mx.before(hi),
        s"testdata contract: $table.$c normalized to [$mn, $mx], outside " +
          "the plausible [2000, 2100) epoch band — a driver re-encode " +
          "likely changed the epoch-long unit; see Tables.epochLongToMicros")
    }
  }

  test("every driver table is present and non-empty") {
    Tables.names.foreach { t =>
      assert(loaded(t).limit(1).count() == 1L,
        s"testdata contract: $t is missing or empty at $sf")
    }
  }
}
