package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main (reference analogue: PureJavaTest.java:12-21 /
  * TruffleTest.java:17-27 — 1000 warm iterations there; here one warm-up
  * pass then best-of-3 timed passes per query, full materialization,
  * plus a per-key max/min "spread" field so host noise is visible).
  *
  * Measurement rules (VERDICT r1 items 1-3):
  *  - every query is materialized through the noop sink
  *    (`write.format("noop")`) — unlike `.count()`, this executes every
  *    projected expression and keeps terminal sorts, so expression suites
  *    time the declared query, not a row-count scan;
  *  - one untimed warm-up pass first (parquet footer/page cache, codegen,
  *    JIT) so per-query numbers are not session-warm-up noise;
  *  - failures are recorded per-query (`"errors"`), never swallowed;
  *  - `stream_late_data` is a real 3-microbatch Structured Streaming run
  *    whose wall time is streaming *fixed latency*, not data-proportional
  *    work — it is timed and reported, but excluded from the headline
  *    `value` (reported separately as `streaming_fixed_sec`);
  *  - the JSON line goes to raw stdout (build.sbt routes forked stdout
  *    through unprefixed — the driver greps/parses it) AND to
  *    `bench.json` in the cwd, so the gate can always read it.
  */
object Bench {
  /** Queries whose wall time is dominated by streaming micro-batch fixed
    * latency (checkpoint + 3 batches), not data volume. */
  private val streamingFixed =
    Set("stream_late_data", "stream_dedup", "stream_join",
      "stream_join_outer", "stream_static_join", "stream_sink_files",
      "stream_transform_state", "stream_update_mode", "stream_state_ttl",
      "stream_foreachbatch", "stream_merge_cdc")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE re-plan (and coalesce) shuffles above cached plans too —
      // the iterative CC loop's per-round joins read persisted frames,
      // which this conf otherwise pins at the static partition count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Either[String, Unit] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right(())
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    // Batch keys first (alphabetical), streaming-fixed keys last: the
    // operator caches (shingles, rank vectors — see operators.Caches)
    // are released after the last batch consumer, so streaming latency
    // is measured with executor memory free of batch-query state.
    // Optional comma-separated key filter for local A/B iteration (the
    // driver never sets it → full suite).
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val (streamNames, batchNames) =
      SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
        .partition(streamingFixed)
    val names = batchNames ++ streamNames
    // Warm-up pass: untimed; streaming-fixed queries skipped (their cost
    // is per-run fixed latency — warming doesn't change it).
    batchNames.foreach(runOnce)

    // Three timed passes, min per query (best-of-3). Rationale (r6
    // post-mortem, SCALING.md "Benchmark measurement note"): BENCH_r05
    // vs r06 ran byte-identical jars yet differed up to 11.4× per key
    // (filter_conj 0.31→3.57s) — on this shared host a contention
    // window can swallow BOTH passes of a min-of-2. A third pass makes
    // a sustained-slow reading far less likely, and the per-key spread
    // (max/min over the timed passes, emitted as "spread") lets the
    // driver distinguish "code got slower" from "host was busy": a
    // genuine regression is slow in ALL passes (spread ≈ 1), noise is
    // slow in SOME (spread >> 1). Reference analogue: 1,000 timed
    // iterations for the same reason, PureJavaTest.java:15-20.
    // Streaming-fixed queries run twice (min): each run pays real
    // multi-batch latency, but that latency is itself host-noise-laden
    // (r5→r7 streaming_fixed swung 7.5→9.3 s on identical code) — two
    // runs bound it and give the spread field an honest value.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Reproducibility spread over the FASTEST 3 observations (all, if
    // fewer): ≈1 means the reported min is reproducible; a lone
    // contended pass (host noise) drops out once 3 clean passes exist,
    // while genuinely unstable keys keep a high value. With the base 3
    // passes this is identical to the old max/min definition.
    def spreadOf(runs: Seq[Double]): Double = {
      val fastest = runs.sorted.take(3)
      fastest.max / math.max(fastest.min, 1e-9)
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      runOnce(name).left.foreach(msg => errors += name -> msg)
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_PASSES: local-rehearsal override (e.g. 1 for the
    // sf10 ScaleGen decades, where per-key times are long enough to
    // dominate host noise and best-of-3 would triple a half-hour
    // sweep). The driver never sets it → best-of-3 + adaptive.
    val override_ = sys.env.get("SPARK_GRAFT_PASSES").map { v =>
      val p = v.toInt // fail fast on garbage, not deep in the run
      require(p > 0, s"SPARK_GRAFT_PASSES must be >= 1, got $v " +
        "(0 would record no timed runs and crash at min())")
      p
    }
    def measure(name: String): (String, Seq[Double]) = {
      // Per-key storage isolation (r13: BENCH_r12 read pipeline_corpus
      // at 9.5 s while the isolated number was 3.9 s — the other 176
      // keys' warmup-built persisted frames and checkpoint blocks had
      // filled executor storage ahead of it). Releasing before each
      // key bounds storage to ONE key's working set: pass 1 rebuilds
      // the key's own caches, passes 2+ run warm, and best-of-N still
      // reports the warm number — but now it is the KEY's number, not
      // its suite position's.
      graft.operators.Caches.releaseAll()
      val base = override_.getOrElse(if (streamingFixed(name)) 2 else 3)
      val times = scala.collection.mutable.ArrayBuffer.fill(base)(timed(name))
      // Adaptive top-up for ANY noisy batch key (r7 verdict: the cap on
      // cheap keys left q6/json_funcs spreads at 3.7×/4.7× in the
      // driver run): while the fastest-3 window still spreads > 1.5×,
      // buy up to 2 more observations. Spread is computed over the 3
      // FASTEST passes (below), so a single contended pass stops
      // polluting the reported reproducibility once a clean triple
      // exists — re-measuring can actually converge it.
      while (override_.isEmpty && !streamingFixed(name) && times.length < 5 &&
        spreadOf(times.toSeq) > 1.5)
        times += timed(name)
      name -> times.toSeq
    }
    val firstPass = batchNames.map(measure)
    // Second-window re-measure (VERDICT r11 item 1): a key whose 5
    // in-line passes all landed inside one host-contention window keeps
    // a high spread that later reads as a phantom regression (r11:
    // math_funcs 4.53×, layout_zorder 2.88×). Sweep again AFTER the
    // whole batch block — minutes later, a different contention window
    // — buying up to 2 more observations for any key still above 2×.
    // Extra passes can only lower the reported min and, via the
    // fastest-3 spread window, converge the spread once 3 clean passes
    // exist anywhere in the run.
    val batchResults = firstPass.map { case (name, runs) =>
      val times = scala.collection.mutable.ArrayBuffer(runs: _*)
      while (override_.isEmpty && times.length < 7 &&
        spreadOf(times.toSeq) > 2.0)
        times += timed(name)
      name -> times.toSeq
    }
    // Release operator caches after the last batch key, before the
    // streaming-fixed block.
    graft.operators.Caches.releaseAll()
    val results = batchResults ++ streamNames.map(measure)
    graft.operators.Caches.releaseAll()

    // full JSON string escaping — shared definition (Util.jsonEscape):
    // a raw control char from an exception message would make the one
    // line the driver parses invalid again
    def esc(s: String): String = Util.jsonEscape(s)
    def r3(d: Double): String = f"$d%.3f"
    val best = results.map { case (k, runs) => k -> runs.min }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Per-key spread (fastest-3 window, see spreadOf): ≈1 means the
    // reported min is reproducible, >>1 means the key stayed noisy even
    // after adaptive re-measurement — the driver should not read a
    // high-spread key's delta as a code regression.
    val spread = results.map { case (k, runs) =>
      "\"" + k + "\":" + r3(spreadOf(runs))
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v) + "\""
    }.mkString("{", ",", "}")
    val headline = best.collect {
      case (k, v) if !streamingFixed(k) => v
    }.sum
    val streamingSec = best.collect {
      case (k, v) if streamingFixed(k) => v
    }.sum
    // A failed query fast-fails, which would SHRINK the headline — a
    // regression that breaks a query must not read as a speed-up. With
    // any error the headline value is null (unparseable as "faster");
    // the per-query times and errors fields keep the diagnostics.
    val headlineJson = if (errors.isEmpty) headline.toString else "null"
    val json =
      s"""{"metric":"total","value":$headlineJson,"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,"streaming_fixed_sec":$streamingSec,""" +
      s""""n_errors":${errors.size},"errors":$errs,"sf":"$sfDir"}"""
    // BENCH_r06/r07 post-mortem: the driver keeps only the LAST 2000
    // stdout chars, and the full JSON line (~7 KB, all keys) starts
    // before that window — so its parse saw a beheaded line two rounds
    // running ("parsed": null). Emit the full line FIRST (before any
    // fallible file IO or session teardown — stdout must survive a
    // full disk or a stop() failure), then a SHORT self-contained
    // summary as the very last line, small enough to always sit inside
    // any tail window. It carries the gate numbers (headline value,
    // q6, streaming, errors) and points at bench.json for the per-key
    // map.
    println(json)
    try Files.writeString(Paths.get("bench.json"), json)
    catch { case e: Exception =>
      System.err.println(s"[bench] bench.json write failed: $e") }
    try spark.stop()
    catch { case e: Exception =>
      System.err.println(s"[bench] spark.stop failed: $e") }
    // The compact line must carry ALL per-key minima (VERDICT r8 item 4:
    // parsed.queries held only q6, so per-key regressions were not
    // machine-checkable) yet fit the driver's 2000-char stdout tail. A
    // flat {"name":sec} map of 106 full names cannot fit (>=2047 bytes
    // at any precision — the names alone are 1291), so keys sharing a
    // first underscore segment nest under it: "join":{"inner_hash":1.16}
    // reads as join_inner_hash = 1.16 s. No name is abbreviated — the
    // full key is family + "_" + subkey — and q6 (no underscore) stays a
    // top-level scalar so a gate reading queries.q6 is unaffected. All
    // values are SECONDS rounded to `dec` places; spreads stay in
    // bench.json / the full line above (they don't fit and are
    // diagnostics, not gate inputs). Tiered shrink keeps the line
    // parseable whatever future timings do: 2 decimals, then 1, then the
    // r8 q6-only form — never an over-long line the tail would behead.
    def rd(v: Double, dec: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
      val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      if (t.isEmpty || t == "-") "0" else t
    }
    def nestedQueries(dec: Int, entries: Seq[(String, Double)] = best): String = {
      val (underscored, plain) = entries.partition(_._1.contains("_"))
      val fams = underscored.groupBy(_._1.takeWhile(_ != '_'))
      val (nested, singleton) = fams.partition(_._2.size >= 2)
      val flat = (plain ++ singleton.values.flatten.toSeq)
        .sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + rd(v, dec) }
      val groups = nested.toSeq.sortBy(_._1).map { case (fam, ks) =>
        val inner = ks.sortBy(_._1).map { case (k, v) =>
          "\"" + k.drop(fam.length + 1) + "\":" + rd(v, dec)
        }.mkString(",")
        "\"" + fam + "\":{" + inner + "}"
      }
      (flat ++ groups).mkString("{", ",", "}")
    }
    // headline rounded to ms here (full precision is in the full line
    // above) — 17-char raw doubles would waste tail budget. Wrapper is
    // minimal (r10: 116 keys overflowed both nested tiers and the line
    // silently degraded to q6-only): "unit" (always seconds) and
    // "streaming_fixed_sec" live in the committed bench.json full
    // line, and "sf" carries only the basename — every byte saved here
    // is a per-key datum that stays inside the driver's 2000-char
    // stdout tail.
    val headlineCompact = if (errors.isEmpty) rd(headline, 3) else "null"
    val sfBase = sfDir.reverse.takeWhile(_ != '/').reverse
    def compactLine(qmap: String, extra: String = ""): String =
      s"""{"metric":"total","value":$headlineCompact,""" +
      s""""queries":$qmap,$extra"n_errors":${errors.size},""" +
      s""""sf":"$sfBase"}"""
    val q6Only = "{" +
      best.collectFirst { case ("q6", v) => "\"q6\":" + v }.getOrElse("") + "}"
    // Growth tier before the q6-only last resort: drop sub-0.1 s keys
    // (overhead-dominated at bench sf — a regression that matters
    // lifts a key ABOVE the floor, where it reappears) and say how
    // many were dropped, so truncation is visible, never silent.
    val (kept, dropped) = best.partition(_._2 >= 0.1)
    val bigOnly = nestedQueries(1, kept)
    // Final growth tier (r11: at 129 keys every fixed-floor tier can
    // overflow and the line degraded to q6-only — the driver's tail
    // lost all per-key data): keep the SLOWEST keys, as many as fit —
    // a regression anywhere surfaces by lifting its key into the kept
    // set; the drop count keeps the truncation visible.
    def topFit(): String = {
      // q6 — the flagship gate number — is ALWAYS kept (r11: the
      // driver-tail map dropped it at 0.15 s), then the slowest other
      // keys, as many as fit. Binary-search the largest keep that fits
      // (line length grows with keep; the 5-char margin under 2000
      // absorbs the n_dropped digit wobble) instead of the old fixed
      // -8 walk, which could overshoot by up to 7 keys.
      val desc = best.sortBy(-_._2)
      val (q6Row, rest) = desc.partition(_._1 == "q6")
      def lineFor(keep: Int): String = {
        val keptRows = q6Row ++ rest.take(keep)
        compactLine(nestedQueries(1, keptRows),
          s""""n_dropped":${desc.length - keptRows.length},""")
      }
      var lo = 0
      var hi = rest.length
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (lineFor(mid).length <= 1995) lo = mid else hi = mid - 1
      }
      lineFor(lo)
    }
    // line + trailing newline must sit inside the tail window: 1995+1
    // leaves 4 chars of margin in the 2000
    val compact = (Seq(2, 1).map(d => compactLine(nestedQueries(d))) :+
      compactLine(bigOnly, s""""n_sub100ms":${dropped.size},""") :+
      topFit() :+
      compactLine(q6Only)).find(_.length <= 1995).getOrElse(compactLine("{}"))
    println(compact)
  }
}
