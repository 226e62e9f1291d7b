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
  * `_graft_log/v0.txt` listing exactly the committed files with
  * per-file min/max stats on the index's cluster column, plus
  * `_graft_log/fingerprint.txt` recording the corpus + build-param
  * identity the artifact was built from.
  *
  * Commit protocol (single writer per harness contract, but crash- and
  * reader-safe regardless): data files first, fingerprint second, the
  * manifest LAST via temp-file + atomic rename — the manifest is the
  * commit point, so a torn write leaves a miss (rebuild), never a
  * half-index. Staleness: the fingerprint captures the embeddings
  * source files (path, length, mtime) and the build parameters; any
  * corpus regeneration or param change misses and rebuilds. This is
  * the same validity contract Delta encodes with its snapshot version
  * + transaction log.
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
    val hfs = fs(spark, r)
    val mf = Layout.manifestPath(r, 0)
    if (!hfs.exists(mf)) return None
    val fpPath = new org.apache.hadoop.fs.Path(r, "_graft_log/fingerprint.txt")
    if (!hfs.exists(fpPath)) return None
    def readAll(p: org.apache.hadoop.fs.Path): String = {
      val in = hfs.open(p)
      val bytes = new Array[Byte](hfs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); in.close()
      new String(bytes, "UTF-8")
    }
    if (readAll(fpPath) != fp) return None
    val files = Layout.readManifest(hfs, mf).map(f => s"${r.toString}/$f")
    if (files.nonEmpty) Some(spark.read.parquet(files: _*))
    else {
      val sp = new org.apache.hadoop.fs.Path(r, "_graft_log/schema.json")
      if (!hfs.exists(sp)) return None
      val schema = org.apache.spark.sql.types.DataType.fromJson(readAll(sp))
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
    val hfs = fs(spark, r)
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
    val fpPath = new org.apache.hadoop.fs.Path(r, "_graft_log/fingerprint.txt")
    val os = hfs.create(fpPath, true)
    os.write(fp.getBytes("UTF-8")); os.close()
    // manifest body to a temp name, then rename into place: rename is
    // atomic on a local FS (and on HDFS) — readers see no manifest or
    // the complete one, never a prefix. A same-fingerprint racer that
    // beat us to the rename left an equivalent commit (the build is
    // deterministic), so a failed rename falls through to the
    // read-back below; the rename RESULT is checked either way
    // (ADVICE r16 — silent false meant an unpublished commit).
    val mfPath = Layout.manifestPath(r, 0)
    val tmp = new org.apache.hadoop.fs.Path(r, s"_graft_log/v0.txt.$ver.tmp")
    Layout.writeManifest(hfs, tmp, files,
      Layout.footerStats(spark, r, files, statsCol))
    hfs.delete(mfPath, false)
    if (!hfs.rename(tmp, mfPath) && !hfs.exists(mfPath))
      throw new IllegalStateException(
        s"AnnIndexStore.commit($kind, $dir): manifest rename failed " +
          s"and no manifest exists — $tmp -> $mfPath")
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
