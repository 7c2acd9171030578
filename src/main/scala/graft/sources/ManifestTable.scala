package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Jar-free manifest-commit table format (r13 verdict #6) — the native
  * substitute for the blocked Delta/Iceberg dependency: ATOMIC snapshot
  * replace/append with idempotent re-commit and concurrent-reader
  * safety, which `overwrite-dynamic` cannot give (its delete+write
  * window exposes readers to partial state, and a re-run of an
  * `append` job duplicates rows — the reference's own idempotency gap,
  * `glue_jobs/process_openaq_raw.py:253-256`).
  *
  * Layout under `tableDir`:
  * {{{
  *   .staging/<uuid>/part-*.parquet   in-flight writes (invisible)
  *   data/<uuid>/part-*.parquet       committed data files
  *   _manifests/v<000012>__<commitId>.json   snapshot definitions
  * }}}
  *
  * PROTOCOL — each guarantee and where it comes from:
  *  - Writers write to a fresh `.staging/<uuid>` dir, rename the WHOLE
  *    dir into `data/` (one metadata op), then publish a manifest via
  *    create-exclusive rename into `_manifests/`. A reader resolves the
  *    highest manifest version and reads EXACTLY its file list, so a
  *    crash anywhere before the manifest rename leaves the table
  *    bit-identical (the orphan data dir is invisible; [[vacuum]]
  *    collects it).
  *  - Manifest renames do NOT overwrite: two racing writers contend on
  *    the same version filename, the loser re-lists and retries at the
  *    next version — optimistic concurrency, serialized by the
  *    filesystem (atomic on HDFS/POSIX rename; on S3A use a
  *    rename-atomic store or a coordination layer — same caveat
  *    Delta's LogStore documents).
  *  - Idempotency: a commit carries a caller-chosen `commitId` (e.g.
  *    "daily-2024-01-07"); if any manifest already carries it, the
  *    commit is a NO-OP returning the existing version (the re-run
  *    duplicate problem solved at the protocol level, not by hoping the
  *    scheduler never retries). The just-staged files are deleted.
  *  - Concurrent readers: commits never delete data files, so a reader
  *    holding version N keeps reading N's files while N+1 lands; only
  *    an explicit [[vacuum]] removes files, and only UNREFERENCED ones.
  *  - Time travel falls out: [[readVersion]] pins any retained snapshot.
  *
  * 100 TB: every commit is O(1) driver metadata operations (one dir
  * rename + one file rename) regardless of data volume; manifests list
  * file paths, not rows; readers plan a plain parquet scan over the
  * manifest's files (all pushdown/pruning intact).
  */
object ManifestTable {

  /** One snapshot: `files` are tableDir-relative parquet paths. */
  final case class Snapshot(version: Long, commitId: String, files: Seq[String])

  private val ManifestRx = "v(\\d{12})__(.+)\\.json".r

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed snapshots, ascending version. File lists come from
    * the manifest JSON; version + commitId ride the FILENAME so the
    * idempotency check never reads file contents.
    */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Snapshot] = {
    val f = fs(spark, tableDir)
    val mdir = new Path(tableDir, "_manifests")
    if (!f.exists(mdir)) return Nil
    f.listStatus(mdir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestRx(v, cid) =>
          Some(Snapshot(v.toLong, cid, readFileList(f, st.getPath)))
        case _ => None
      }
    }.sortBy(_.version)
  }

  /** Commit `df` as the next snapshot. `mode` = "replace" (the snapshot
    * is exactly this data) or "append" (previous snapshot's files plus
    * this data). Returns the committed version — or the EXISTING version
    * when `commitId` was already committed (no-op re-run).
    */
  def commit(df: DataFrame, tableDir: String, commitId: String,
      mode: String = "replace"): Long = {
    require(Seq("replace", "append").contains(mode),
      s"mode must be replace|append, got '$mode'")
    require(commitId.nonEmpty && !commitId.contains("__")
      && !commitId.contains("/"),
      s"commitId must be non-empty, no '/' or '__': '$commitId'")
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    // fast-path idempotency check BEFORE doing any work
    existingVersion(spark, tableDir, commitId) match {
      case Some(v) => return v
      case None    => ()
    }

    val uuid = java.util.UUID.randomUUID().toString
    val staging = new Path(tableDir, s".staging/$uuid")
    df.write.parquet(staging.toString)
    val dataDir = new Path(tableDir, s"data/$uuid")
    f.mkdirs(dataDir.getParent)
    require(f.rename(staging, dataDir), s"rename $staging -> $dataDir failed")
    val newFiles = f.listStatus(dataDir).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"data/$uuid/${s.getPath.getName}")

    val mdir = new Path(tableDir, "_manifests")
    f.mkdirs(mdir)
    // optimistic publish loop: losers of a version race re-list + retry
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 100, "manifest publish: 100 version conflicts")
      // re-check idempotency inside the loop: a racing duplicate of THIS
      // commitId may have published while we staged
      existingVersion(spark, tableDir, commitId) match {
        case Some(v) =>
          f.delete(dataDir, true) // our staged copy is an orphan duplicate
          return v
        case None => ()
      }
      val snaps = snapshots(spark, tableDir)
      val version = snaps.lastOption.map(_.version + 1).getOrElse(1L)
      val files = mode match {
        case "append" => snaps.lastOption.map(_.files).getOrElse(Nil) ++ newFiles
        case _        => newFiles
      }
      val target = new Path(mdir, f"v$version%012d__$commitId.json")
      val tmp = new Path(mdir, s".tmp-$uuid.json")
      writeFileList(f, tmp, files)
      // rename-without-overwrite IS the commit point
      if (f.rename(tmp, target)) return version
      f.delete(tmp, false)
    }
    -1L // unreachable
  }

  /** Latest snapshot as a DataFrame; fails if the table has none. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val snaps = snapshots(spark, tableDir)
    require(snaps.nonEmpty, s"no committed snapshot under $tableDir")
    readSnapshot(spark, tableDir, snaps.last)
  }

  /** Time travel: read a specific retained version. */
  def readVersion(spark: SparkSession, tableDir: String, version: Long): DataFrame = {
    val snap = snapshots(spark, tableDir).find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(
        s"version $version not found under $tableDir"))
    readSnapshot(spark, tableDir, snap)
  }

  private def readSnapshot(spark: SparkSession, tableDir: String,
      snap: Snapshot): DataFrame = {
    require(snap.files.nonEmpty, s"snapshot v${snap.version} lists no files")
    spark.read.parquet(snap.files.map(rel => s"$tableDir/$rel"): _*)
  }

  /** Delete data dirs referenced by NO manifest and stale staging dirs —
    * the crash-orphan collector. Never touches referenced files, so
    * retained snapshots (time travel, in-flight readers) stay valid.
    * Returns the number of directories removed.
    */
  def vacuum(spark: SparkSession, tableDir: String): Int = {
    val f = fs(spark, tableDir)
    val referenced = snapshots(spark, tableDir)
      .flatMap(_.files).map(_.split("/")(1)).toSet // data/<uuid>/part -> uuid
    var removed = 0
    val dataRoot = new Path(tableDir, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      if (st.isDirectory && !referenced.contains(st.getPath.getName)) {
        f.delete(st.getPath, true); removed += 1
      }
    }
    val stagingRoot = new Path(tableDir, ".staging")
    if (f.exists(stagingRoot)) f.listStatus(stagingRoot).foreach { st =>
      if (st.isDirectory) { f.delete(st.getPath, true); removed += 1 }
    }
    removed
  }

  private def existingVersion(spark: SparkSession, tableDir: String,
      commitId: String): Option[Long] =
    snapshots(spark, tableDir).find(_.commitId == commitId).map(_.version)

  // manifest body: one tableDir-relative path per line (line-oriented so
  // no JSON library dependency decides quoting; the .json suffix is for
  // humans and tooling greps)
  private def writeFileList(f: FileSystem, p: Path, files: Seq[String]): Unit = {
    val out = f.create(p, false)
    try out.write(files.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readFileList(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    try {
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    } finally in.close()
  }
}
