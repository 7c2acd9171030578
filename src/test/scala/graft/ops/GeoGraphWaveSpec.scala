package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-10 second-wave ops: [[Graph.kCorePeel]],
  * [[Graph.commonNeighbors]], and [[Geo]].
  */
class GeoGraphWaveSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // --- kCorePeel ---------------------------------------------------------

  test("kCorePeel removes tails and keeps the dense core") {
    // triangle {1,2,3} + pendant chain 3-4-5: the 2-core is the triangle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCorePeel(edges, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCorePeel chain peels one layer per round (bounded-round contract)") {
    // a 6-node path has an empty 2-core, but peeling eats one vertex per
    // end per round: after 2 rounds the middle 2 survive with degree 1
    val edges = (0L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val after2 = Graph.kCorePeel(edges, "src", "dst", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after2 == Map(2L -> 1L, 3L -> 1L))
    val after3 = Graph.kCorePeel(edges, "src", "dst", k = 2, rounds = 3)
    assert(after3.count() == 0)
  }

  test("kCorePeel at k=3 keeps K4 exactly") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val extra = Seq((4L, 5L), (5L, 6L), (5L, 7L)) // a deg-3-looking tree arm
    val core = Graph.kCorePeel((k4 ++ extra).toDF("src", "dst"),
        "src", "dst", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  // --- commonNeighbors ---------------------------------------------------

  test("commonNeighbors scores non-adjacent pairs and skips adjacent ones") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share 2 neighbors
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.commonNeighbors(edges, "src", "dst", maxDeg = 10, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // jaccard = 2 / (2 + 2 - 2) = 1.0 for both diagonals
    assert(got.toSet == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("commonNeighbors drops adjacent pairs even on uncanonicalized edges") {
    // same square, but two edges arrive dst<src: the adjacency anti-join
    // must canonicalize with least/greatest or (2,3) and (1,4) would
    // leak back as "predictions" (r10 advice)
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.commonNeighbors(edges, "src", "dst", maxDeg = 10, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 3L), (2L, 4L)))
  }

  test("commonNeighbors hub cap drops evidence routed through stop nodes") {
    // star: hub 100 touches 1..5; spokes share ONLY the hub as neighbor
    val edges = (1L to 5L).map(i => (i, 100L)).toDF("src", "dst")
    val uncapped = Graph.commonNeighbors(edges, "src", "dst", maxDeg = 10, topK = 100)
    assert(uncapped.count() == 10) // C(5,2) spoke pairs via the hub
    val capped = Graph.commonNeighbors(edges, "src", "dst", maxDeg = 4, topK = 100)
    assert(capped.count() == 0) // hub (deg 5) excluded as a center
  }

  // --- landmarkDistances -------------------------------------------------

  test("landmarkDistances keeps per-landmark distances on a path graph") {
    // path 1-2-3-4-5, landmarks {1, 5}: each landmark gets its OWN
    // distance field (bfsHops would collapse them into min-over-seeds)
    val edges = (1L until 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val lms = Seq(1L, 5L).toDF("node")
    val got = Graph.landmarkDistances(edges, "src", "dst", lms, "node", maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 1L)) == 0 && got((1L, 2L)) == 1 &&
      got((1L, 3L)) == 2 && got((1L, 4L)) == 3)
    assert(got((5L, 5L)) == 0 && got((5L, 4L)) == 1 &&
      got((5L, 3L)) == 2 && got((5L, 2L)) == 3)
    // hop bound respected: node 5 is 4 hops from landmark 1 -> absent
    assert(!got.contains((1L, 5L)) && !got.contains((5L, 1L)))
  }

  test("landmarkDistances records the SHORTEST distance on a cycle") {
    // 6-cycle, landmark {0}: the far node (3) is 3 hops both ways
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val got = Graph.landmarkDistances(edges, "src", "dst",
        Seq(0L).toDF("node"), "node", maxHops = 3)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 5L -> 1, 2L -> 2, 4L -> 2, 3L -> 3))
  }

  // --- Geo ---------------------------------------------------------------

  test("cellOf floors negative coordinates (no double-width cell 0)") {
    // -1..-100000 must land in cell -1, not share cell 0 with 0..99999
    // (truncation toward zero would — r10 advice); exact multiples stay
    // on their own boundary
    val pts = Seq((-1L, -100000L), (-100001L, 0L), (99999L, 100000L))
      .toDF("lat", "lon")
    val (cy, cx) = Geo.cellOf(col("lat"), col("lon"), 100000L)
    val got = pts.select(cy.as("cy"), cx.as("cx"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((-1L, -1L), (-2L, 0L), (0L, 1L)))
  }

  test("nearestInGrid picks the true nearest within the 3x3 neighborhood") {
    val probes = Seq((1L, 1000000L, 1000000L)).toDF("pid", "plat", "plon")
    val cands = Seq(
      (10L, 1000100L, 1000000L), // dist2 = 100^2
      (11L, 1000000L, 1000050L), // dist2 = 50^2  <- nearest
      (12L, 1300000L, 1000000L)  // same cell grid distance but farther
    ).toDF("sid", "slat", "slon")
    val got = Geo.nearestInGrid(probes, "pid", "plat", "plon",
        cands, "sid", "slat", "slon", cellE6 = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 11L, 2500L)))
  }

  test("nearestInGrid ties break by candidate id; out-of-range probes drop") {
    val probes = Seq((1L, 500000L, 500000L), (2L, 9900000L, 9900000L))
      .toDF("pid", "plat", "plon")
    val cands = Seq((21L, 500000L, 500100L), (20L, 500000L, 499900L))
      .toDF("sid", "slat", "slon")
    val got = Geo.nearestInGrid(probes, "pid", "plat", "plon",
        cands, "sid", "slat", "slon", cellE6 = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // equal dist2 10000 on both sides -> lower id 20 wins; probe 2 is
    // nowhere near a candidate cell -> absent
    assert(got.toSeq == Seq((1L, 20L, 10000L)))
  }

  test("nearestInGrid finds candidates across a cell boundary") {
    // probe sits at the very edge of its cell; nearest candidate is in
    // the adjacent cell, a farther one shares the probe's cell
    val probes = Seq((1L, 199999L, 100000L)).toDF("pid", "plat", "plon")
    val cands = Seq(
      (30L, 200001L, 100000L), // adjacent cell, dist2 = 4
      (31L, 150000L, 100000L)  // same cell, dist2 = 49999^2
    ).toDF("sid", "slat", "slon")
    val got = Geo.nearestInGrid(probes, "pid", "plat", "plon",
        cands, "sid", "slat", "slon", cellE6 = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 30L, 4L)))
  }
}
