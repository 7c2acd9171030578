package graft.sources

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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
  *   _manifests/v<000012>.json        snapshot definitions
  * }}}
  *
  * PROTOCOL — each guarantee and where it comes from:
  *  - Writers write to a fresh `.staging/<uuid>` dir, rename the WHOLE
  *    dir into `data/` (one metadata op), then publish a manifest into
  *    `_manifests/`. A reader resolves the highest manifest version and
  *    reads EXACTLY its file list, so a crash anywhere before the
  *    manifest publish leaves the table bit-identical (the orphan data
  *    dir is invisible; [[vacuum]] collects it once it is old enough).
  *  - The manifest filename carries ONLY the version (`v<n>.json`), so
  *    racing writers contend on one filename per version regardless of
  *    their commitIds (the r14 `v<n>__<cid>.json` scheme let two racers
  *    both "win" version n under different names — duplicate versions,
  *    nondeterministic latest, lost appends). The commitId rides on the
  *    manifest body's first line.
  *  - The publish primitive is `FileContext.rename(tmp, target,
  *    Options.Rename.NONE)` — the same exclusive rename Delta's
  *    HDFS/local LogStore uses. `FileSystem.rename` is NOT
  *    create-exclusive on local/POSIX (rename(2) silently replaces the
  *    destination), so it cannot be the commit point. On HDFS the NONE
  *    rename is atomic at the namenode; on the local FS the
  *    exists-check + rename leaves a hair-width TOCTOU, so after a
  *    "successful" publish the writer RE-READS the manifest and only
  *    claims the version if the body's commitId is its own — a racer
  *    that slipped through loses its rename and retries at version+1.
  *    S3A (no atomic rename, no create-exclusive) is UNSUPPORTED
  *    without a coordination layer — the same caveat Delta documents.
  *  - Idempotency: a commit carries a caller-chosen `commitId` (e.g.
  *    "daily-2024-01-07"); if any manifest already carries it, the
  *    commit is a NO-OP returning the existing version (the re-run
  *    duplicate problem solved at the protocol level, not by hoping the
  *    scheduler never retries). The just-staged files are deleted.
  *  - Concurrent readers: commits never delete data files, so a reader
  *    holding version N keeps reading N's files while N+1 lands; only
  *    an explicit [[vacuum]] removes files, and only UNREFERENCED ones
  *    older than its retention window (an in-flight writer's staging
  *    dir or just-renamed data dir is never collected under it).
  *  - Time travel falls out: [[readVersion]] pins any retained snapshot.
  *
  * 100 TB: every commit is O(1) driver metadata operations (one dir
  * rename + one exclusive file publish) plus an idempotency scan that
  * reads only the FIRST LINE of manifests not yet seen by this JVM
  * (the per-table commitId cache makes a long single-writer history
  * amortized O(1) per commit); manifests list file paths, not rows;
  * readers plan a plain parquet scan over the manifest's files (all
  * pushdown/pruning intact).
  */
object ManifestTable {

  /** One snapshot: `files` are tableDir-relative parquet paths. */
  final case class Snapshot(version: Long, commitId: String, files: Seq[String])

  private val ManifestRx = "v(\\d{12})\\.json".r

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, manifestPath) pairs from FILENAMES alone, ascending. */
  private def listManifests(f: FileSystem, tableDir: String): Seq[(Long, Path)] = {
    val mdir = new Path(tableDir, "_manifests")
    if (!f.exists(mdir)) return Nil
    f.listStatus(mdir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestRx(v) => Some((v.toLong, st.getPath))
        case _             => None
      }
    }.sortBy(_._1)
  }

  /** All committed snapshots, ascending version. Reads every manifest
    * body (commitId line + file list) — use for reads/time travel, not
    * for the hot idempotency scan ([[versionCommitIds]] reads less).
    */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Snapshot] = {
    val f = fs(spark, tableDir)
    listManifests(f, tableDir).map { case (v, p) =>
      val (cid, files) = readManifest(f, p)
      Snapshot(v, cid, files)
    }
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
    require(commitId.nonEmpty && !commitId.contains("\n")
      && !commitId.contains("/"),
      s"commitId must be non-empty, no '/' or newline: '$commitId'")
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    // fast-path idempotency check BEFORE doing any work
    existingVersion(f, tableDir, commitId) match {
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
      existingVersion(f, tableDir, commitId) match {
        case Some(v) =>
          f.delete(dataDir, true) // our staged copy is an orphan duplicate
          return v
        case None => ()
      }
      val manifests = listManifests(f, tableDir)
      val version = manifests.lastOption.map(_._1 + 1).getOrElse(1L)
      val files = mode match {
        case "append" =>
          manifests.lastOption.map { case (_, p) => readManifest(f, p)._2 }
            .getOrElse(Nil) ++ newFiles
        case _ => newFiles
      }
      val target = new Path(mdir, f"v$version%012d.json")
      val tmp = new Path(mdir, s".tmp-$uuid.json")
      writeManifest(f, tmp, commitId, files)
      if (publishExclusive(spark, f, tmp, target)) {
        // local-FS TOCTOU belt (scaladoc): only claim the version if the
        // published body is OURS — a racer whose rename slipped past the
        // exists-check may have replaced it
        if (readManifest(f, target)._1 == commitId) return version
      } else {
        f.delete(tmp, false)
      }
    }
    -1L // unreachable
  }

  /** Exclusive publish: rename that REFUSES an existing destination.
    * `FileContext.rename(.., Options.Rename.NONE)` throws
    * FileAlreadyExistsException (or a generic IOException on some
    * AbstractFileSystems) when `target` exists — atomic on HDFS,
    * exists-check + rename(2) on the local FS. Falls back to a manual
    * exists-gated `FileSystem.rename` only if no AbstractFileSystem
    * binding exists for the scheme (never the case for file:// or
    * hdfs://).
    */
  private def publishExclusive(spark: SparkSession, f: FileSystem,
      tmp: Path, target: Path): Boolean =
    try {
      val fc = FileContext.getFileContext(f.getUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(target),
        Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.FileNotFoundException => false // parent raced away
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem for this scheme: degrade to exists-gated
        // FileSystem.rename (still not overwrite-safe on POSIX — the
        // post-publish commitId verify in commit() remains the backstop)
        !f.exists(target) && f.rename(tmp, target)
      case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains("exist")) => false
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
    * retained snapshots (time travel, in-flight readers) stay valid; and
    * never touches ANY dir younger than `retentionMs` (default 24 h), so
    * a concurrent writer between its staging write and its manifest
    * publish cannot have its in-flight commit destroyed under it (the
    * r14 vacuum deleted every staging dir unconditionally). Tests pass
    * `retentionMs = 0` to collect immediately. Returns the number of
    * directories removed.
    */
  def vacuum(spark: SparkSession, tableDir: String,
      retentionMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(spark, tableDir)
    val referenced = snapshots(spark, tableDir)
      .flatMap(_.files).map(_.split("/")(1)).toSet // data/<uuid>/part -> uuid
    val cutoff = System.currentTimeMillis() - retentionMs
    var removed = 0
    val dataRoot = new Path(tableDir, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      if (st.isDirectory && !referenced.contains(st.getPath.getName)
          && st.getModificationTime <= cutoff) {
        f.delete(st.getPath, true); removed += 1
      }
    }
    val stagingRoot = new Path(tableDir, ".staging")
    if (f.exists(stagingRoot)) f.listStatus(stagingRoot).foreach { st =>
      if (st.isDirectory && st.getModificationTime <= cutoff) {
        f.delete(st.getPath, true); removed += 1
      }
    }
    removed
  }

  /** Per-table (version → commitId) cache: manifest files are immutable
    * once their commit() returned (the post-publish verify is what makes
    * a replaced-in-race body a NON-returned version), so a first line
    * read once never needs re-reading. Only NEW versions since the last
    * look are read — the idempotency scan of a 1k-commit single-writer
    * history is amortized O(1) per commit instead of O(commits).
    */
  private val cidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Long, String]]()

  private def versionCommitIds(f: FileSystem, tableDir: String): Map[Long, String] = {
    val key = f.makeQualified(new Path(tableDir)).toString
    val cached = cidCache.getOrDefault(key, Map.empty)
    val merged = listManifests(f, tableDir).map { case (v, p) =>
      v -> cached.getOrElse(v, readCommitId(f, p))
    }.toMap
    cidCache.put(key, merged)
    merged
  }

  private def existingVersion(f: FileSystem, tableDir: String,
      commitId: String): Option[Long] =
    versionCommitIds(f, tableDir).collectFirst {
      case (v, cid) if cid == commitId => v
    }

  // manifest body: first line is the commitId, then one tableDir-relative
  // path per line (line-oriented so no JSON library dependency decides
  // quoting; the .json suffix is for humans and tooling greps)
  private def writeManifest(f: FileSystem, p: Path, commitId: String,
      files: Seq[String]): Unit = {
    val out = f.create(p, false)
    try out.write((commitId +: files).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** (commitId, files) from a manifest body. */
  private def readManifest(f: FileSystem, p: Path): (String, Seq[String]) = {
    val in = f.open(p)
    try {
      val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
      val lines = new String(bytes, "UTF-8").split("\n").toSeq
      (lines.head, lines.tail.filter(_.nonEmpty))
    } finally in.close()
  }

  /** First line only — the idempotency scan's unit of IO. */
  private def readCommitId(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      Option(r.readLine()).getOrElse("")
    } finally in.close()
  }
}
