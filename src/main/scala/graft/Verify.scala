package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset — surgical re-runs
    // into an existing outDir during development (the driver passes 2)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)         => (s, o, Option.empty[Set[String]])
      case Array(s, o, subset) => (s, o, Some(subset.split(",").map(_.trim).toSet))
    }
    // an unknown subset name would otherwise run NOTHING and exit 0 —
    // and the stale parquet from a previous run would then pass the
    // compare, making a typo'd surgical re-run look like a green fix
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in subset: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val rowCounts = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // the driver contract names each result dir `<name>.parquet`
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        // metadata-only count off the written footers — the query is not
        // re-executed; this feeds the vacuousness guard below
        name -> spark.read.parquet(s"$outDir/$name.parquet").count()
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a reused outDir may hold this query's parquet from a PREVIOUS
        // run — stale, not missing — and a stale result would pass the
        // compare, masking the crash (the same masking the subset-mode
        // fatal path closes). Delete it so the compare sees a hole.
        try {
          val stale = Paths.get(s"$outDir/$name.parquet")
          if (Files.exists(stale)) {
            val walk = Files.walk(stale)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
            finally walk.close()
          }
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] stale cleanup of $name failed: ${e2.getMessage}")
        }
        name -> -1L
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracleJson(SparkEntry.oracleSql))
    spark.stop()
    // Vacuousness guard (mechanical form of the q33/q139 review rule): a
    // query whose result is EMPTY proves nothing — an empty Spark result
    // vs an empty oracle result hashes green no matter how broken the
    // operator is. Every catalog query is required to return >=1 row at
    // every tested sf (global aggregates return exactly 1). Tripping is
    // loud AND fatal, but only after every artifact is on disk, so a trip
    // still leaves the full result set for diagnosis.
    val vacuous = rowCounts.collect { case (name, 0L) => name }
    // in SUBSET mode a crashed query is as fatal as a vacuous one (its
    // stale parquet was just deleted above, but the run still must not
    // read as green). In full mode the now-missing parquet fails the
    // compare and the driver owns that verdict — keep exit 0 there.
    val crashed = rowCounts.collect { case (name, -1L) => name }
    if (vacuous.nonEmpty || crashed.nonEmpty) {
      if (vacuous.nonEmpty)
        System.err.println(
          s"[verify] VACUOUS (0-row) results: ${vacuous.mkString(", ")}")
      if (crashed.nonEmpty)
        System.err.println(
          s"[verify] FAILED queries: ${crashed.mkString(", ")}")
      // the trip record carries BOTH lists so a tooling consumer sees
      // crashed queries too, not just stderr + exit code (format change
      // from the round-6 bare array is safe: nothing parses it yet)
      def arr(ns: Seq[String]) = ns.map(n => "\"" + n + "\"").mkString("[", ",", "]")
      Files.writeString(Paths.get(s"$outDir/vacuous.json"),
        s"""{"vacuous":${arr(vacuous)},"crashed":${arr(crashed)}}""")
      if (vacuous.nonEmpty || only.isDefined) sys.exit(2)
    } else
      // a clean run must not leave a stale trip record beside its artifacts
      Files.deleteIfExists(Paths.get(s"$outDir/vacuous.json"))
  }

  /** The oracle manifest the driver reads. Two contract points, both of
    * which cost round 1 its correctness signal when violated:
    *  - every oracle appears under BOTH the bare query name and the
    *    `<name>.parquet` result-directory name (the driver keys its lookup
    *    by directory, humans/tools by query name);
    *  - strings are escaped for strict JSON including ALL control chars —
    *    a tab or CR in builder-authored SQL would otherwise make the
    *    driver's json.load fail and silently zero the round.
    */
  def oracleJson(oracles: Map[String, String]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    oracles
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
