package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent, versioned storage for the trained ANN index tier —
  * the NN-Descent k-NN graph, the IVF centroid table, the IVF list
  * assignment and the int8 code table (VERDICT r15 item 3).
  *
  * Why this exists: an index that must be rebuilt per process is not
  * an index. The session memos in [[Similarity]] amortize the build
  * inside ONE harness run, but `Caches.releaseAll` (and JVM exit)
  * dropped everything — a cold Verify/Bench session re-paid the full
  * NN-Descent build (the heaviest batch key) and the k-means fit. At
  * 100 TB the build is a scheduled job and every query session READS
  * the committed artifact; this store is that split, expressed with
  * the repo's own lakehouse machinery ([[Layout]]'s `_graft_log`
  * manifests with per-file footer stats — the Delta/Iceberg shape).
  *
  * Layout per index: an immutable parquet file set under a STABLE
  * per-(kind, corpus) root (deliberately NOT the per-PID export
  * scratch — the artifact must outlive the process), plus
  * `_graft_log/v0.txt` whose header line records the sha-256 of the
  * corpus + build-param fingerprint and whose remaining lines list
  * exactly the committed files with per-file min/max stats on the
  * index's cluster column.
  *
  * Commit protocol (single writer per harness contract, but crash- and
  * reader-safe regardless): data files first, then the manifest via
  * temp-file + ATOMIC REPLACE — the manifest is the commit point, so a
  * torn write leaves a miss (rebuild), never a half-index. The
  * fingerprint (corpus source files' path/length/mtime + build params)
  * rides INSIDE the manifest as a sha-256 header line (r18, ADVICE
  * r17): identity and file list commit in the SAME rename, so no
  * reader can ever pair a new fingerprint with an old file list — the
  * stale-serve window a separate fingerprint.txt left open once
  * versioning stopped deleting old data files. Atomic replace (nio
  * ATOMIC_MOVE locally, FileContext Rename.OVERWRITE on HDFS) also
  * closes the delete-then-rename no-manifest window that briefly
  * forced a redundant rebuild on a concurrent reader. Any corpus
  * regeneration or param change misses and rebuilds. This is the same
  * validity contract Delta encodes with its snapshot version +
  * transaction log.
  */
object AnnIndexStore {

  /** Commits performed by THIS process — SimilaritySpec pins that a
    * released-memo ("cold") re-serve does NOT re-commit (i.e. reads
    * the committed artifact instead of rebuilding). */
  private[operators] val commits = new java.util.concurrent.atomic.AtomicInteger(0)

  private def root(kind: String, dir: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_annidx_${kind}_${graft.Util.pathTag(dir)}").toString)

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The raw (checksum-free) filesystem for _graft_log small-file IO.
    * The local FS Spark hands back is checksummed: every create leaves
    * a `.name.crc` sidecar, and an atomic REPLACE of just the data file
    * would leave a stale sidecar that fails the next checksummed open.
    * Manifest reads/writes/renames all go through the raw layer —
    * legacy sidecars from pre-r18 commits are simply ignored. */
  private def logFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    fs(spark, p) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  /** One manifest header line carrying the commit's identity. */
  private def fpHeader(fp: String): String =
    s"#fp_sha256=${graft.Util.sha256Hex(fp)}"

  /** Atomic replace of `dst` by `tmp`: readers see the old complete
    * manifest or the new complete one — never a missing or partial
    * file (ADVICE r17: delete-then-rename had a no-manifest window
    * that triggered redundant rebuilds). */
  private def renameOverwrite(spark: SparkSession,
      hfs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    // via the URI, not FileSystem.getScheme — RawLocalFileSystem
    // doesn't implement the latter (base class throws)
    val scheme = Option(hfs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      // HDFS: FileContext rename-overwrite is the atomic primitive
      // (FileSystem.rename refuses an existing destination)
      org.apache.hadoop.fs.FileContext
        .getFileContext(hfs.getUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Corpus + build-parameter identity: every embeddings source file's
    * (relative path, length, mtime) plus the caller's parameter tag.
    * Driver-side metadata listing only — no data scan (the check must
    * stay O(files), it runs on every serve). */
  private[operators] def fingerprint(spark: SparkSession, dir: String,
      params: String): String = {
    val src = new org.apache.hadoop.fs.Path(dir, "embeddings.parquet")
    val sfs = fs(spark, src)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    val it = sfs.listFiles(src, true)
    while (it.hasNext) {
      val st = it.next()
      files += s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}"
    }
    s"params=$params\n" + files.sorted.mkString("\n")
  }

  /** The committed frame for (kind, corpus) if a valid commit exists:
    * manifest present AND fingerprint byte-identical. Returns the
    * manifest's exact file list as a parquet read — never a directory
    * listing, so a torn/concurrent writer's stray files are invisible
    * (the lakehouse read contract). An explicitly committed EMPTY
    * artifact is a valid hit (ADVICE r16): the manifest carries zero
    * data files and the schema is reconstructed from the commit's
    * schema.json — a tiny corpus whose build legitimately produces no
    * rows (e.g. no upper-layer HNSW vertices) must serve, not throw. */
  private[operators] def readCommitted(spark: SparkSession, kind: String,
      dir: String, fp: String): Option[DataFrame] = {
    val r = root(kind, dir)
    val hfs = logFs(spark, r)
    val mf = Layout.manifestPath(r, 0)
    if (!hfs.exists(mf)) return None
    // identity check: the manifest's own header line (committed in the
    // same atomic rename as the file list — fp and files can't skew)
    val entries = Layout.readManifestStats(hfs, mf)
    if (!entries.headOption.exists(_._1 == fpHeader(fp))) return None
    val files = entries.tail.map(e => s"${r.toString}/${e._1}")
    if (files.nonEmpty) Some(spark.read.parquet(files: _*))
    else {
      val sp = new org.apache.hadoop.fs.Path(r, "_graft_log/schema.json")
      if (!hfs.exists(sp)) return None
      val in = hfs.open(sp)
      val bytes = new Array[Byte](hfs.getFileStatus(sp).getLen.toInt)
      in.readFully(bytes); in.close()
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(new String(bytes, "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Some(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }
  }

  /** Writes `df` as the index artifact and publishes it: range-layout
    * on `statsCol` (so the manifest's per-file min/max actually prune —
    * an IVF probe of 8/32 lists should open 1/4 of the files), footer
    * stats into the manifest, fingerprint, then the atomic manifest
    * rename as the commit point. Returns the committed read — callers
    * serve THAT frame (file-scan lineage, no checkpoint blocks to
    * manage). */
  private[operators] def commit(spark: SparkSession, kind: String,
      dir: String, df: DataFrame, statsCol: String, fp: String): DataFrame = {
    val r = root(kind, dir)
    val hfs = logFs(spark, r)
    // VERSIONED data directory (ADVICE r16): data files land in a
    // fresh uniquely-named subdir instead of a delete-in-place of the
    // shared root — a racing process (or a superseded commit) can
    // never yank parquet files out from under another process's
    // SERVED frame mid-query, because old versions' files are left on
    // disk (an abandoned version is a few MB of /tmp; the manifest is
    // the only pointer that moves). The manifest lists root-relative
    // paths, so readers are version-agnostic.
    val ver = f"d${System.nanoTime()}%x_${
      java.lang.ProcessHandle.current().pid()}%d"
    val dataDir = new org.apache.hadoop.fs.Path(r, ver)
    // Range layout on the cluster column: each file covers a narrow
    // statsCol interval, which is what makes the manifest stats a real
    // pruning index rather than decoration. Partition count follows
    // the session's shuffle setting — at 100 TB this is the writer
    // fleet's task count, here it is 32 modest files.
    df.repartitionByRange(org.apache.spark.sql.functions.col(statsCol))
      .write.mode("overwrite").parquet(dataDir.toString)
    val files = Layout.dataFiles(hfs, dataDir).map(f => s"$ver/$f")
    // schema sidecar: lets an EMPTY artifact (zero data files) read
    // back with the right schema instead of failing inference
    val sp = new org.apache.hadoop.fs.Path(r, "_graft_log/schema.json")
    val sos = hfs.create(sp, true)
    sos.write(df.schema.json.getBytes("UTF-8")); sos.close()
    // manifest body — fingerprint HEADER first, then the file lines —
    // to a temp name, then ONE atomic replace into place: readers see
    // the previous complete commit or this complete commit, never a
    // prefix, never a fingerprint paired with another commit's files
    // (ADVICE r17 medium), and never a missing manifest (ADVICE r17
    // low — the old delete-then-rename window forced a concurrent
    // reader into a redundant rebuild). A same-fingerprint racer that
    // beat us to the replace left an equivalent commit (the build is
    // deterministic), so either ordering read-backs consistently.
    val mfPath = Layout.manifestPath(r, 0)
    val tmp = new org.apache.hadoop.fs.Path(r, s"_graft_log/v0.txt.$ver.tmp")
    val stats = Layout.footerStats(spark, r, files, statsCol)
    val lines = fpHeader(fp) +: files.sorted.map { f =>
      stats.get(f).map { case (mn, mx) => s"$f\t$mn\t$mx" }.getOrElse(f)
    }
    val os = hfs.create(tmp, true)
    os.write(lines.mkString("\n").getBytes("UTF-8")); os.close()
    renameOverwrite(spark, hfs, tmp, mfPath)
    commits.incrementAndGet()
    readCommitted(spark, kind, dir, fp).getOrElse(
      throw new IllegalStateException(
        s"AnnIndexStore.commit($kind, $dir): committed artifact failed " +
          "its own read-back — manifest/fingerprint publish is broken"))
  }

  /** Serve-or-build: the committed artifact when its fingerprint
    * matches, else `build` committed and read back. */
  private[operators] def serve(spark: SparkSession, kind: String,
      dir: String, params: String, statsCol: String)
      (build: => DataFrame): DataFrame = {
    val fp = fingerprint(spark, dir, params)
    readCommitted(spark, kind, dir, fp)
      .getOrElse(commit(spark, kind, dir, build, statsCol, fp))
  }
}
