package graft

import org.apache.spark.sql.Row

/** Golden-value anchors — the analogue of the reference's embedded
  * golden comment (TpchQuery6.java:38-39: revenue 3.0645958657700088E7,
  * 28201 rows for seed Random(0)). Values below were computed once with
  * DuckDB over the driver testdata and hard-coded.
  */
class GoldenSpec extends SparkSpec {

  test("q6 golden value at sf0.001") {
    val Array(row) = operators.Relational.q6(spark, sf).collect()
    assert(row.getDouble(0) === 429647.4684)
    assert(row.getLong(1) === 152L)
  }

  test("q6 golden value at sf0.01") {
    val Array(row) =
      operators.Relational.q6(spark, "/root/testdata/sf0.01").collect()
    assert(row.getDouble(0) === 4050706.2854)
    assert(row.getLong(1) === 1251L)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("reference generator parity: Q6 over the regenerated 5M rows " +
      "reproduces the reference golden result") {
    import org.apache.spark.sql.functions._
    // The reference's own benchmark data, regenerated with the ported
    // dbgen formulas and the same Random(0) stream
    // (sources.ReferenceLineitemGen), queried with the reference's own
    // filter (TpchQuery6.java:43-50 — string-compare shipdate bounds,
    // exactly as the Slice compare does).
    val df = sources.ReferenceLineitemGen.generate(spark)
    val Array(row) = df
      .filter(col("shipdate") >= "1994-01-01" && col("shipdate") < "1995-01-01" &&
        col("discount") >= 0.05 && col("discount") <= 0.07 &&
        col("quantity") < 24)
      .agg(sum(col("price") * col("discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .collect()
    // Golden anchor: the PUBLISHED code's deterministic output, NOT the
    // in-source comment. TpchQuery6.java:39 claims 3.0645958657700088E7
    // over 28,201 rows, but that value is not reproducible from the
    // code as published: an independent sequential transcription of
    // TpchDataGenerator+TpchQuery6 into plain Java (no Truffle, no
    // Slice) yields 1.0316412119370338E8 over 95,326 rows with
    // Random(0) — and the qualifying fraction (1.91% = 3/11 discounts
    // × 23/50 quantities × ~365/2406 ship days) confirms arithmetic,
    // so the stale comment likely predates a generator-constants
    // change. The distributed replay-split port below must match the
    // transcription: row count exactly (order-independent), revenue to
    // 1e-9 relative (Spark merges per-partition partial sums, so only
    // summation order differs from the sequential loop).
    assert(row.getLong(1) === 95326L)
    val golden = 1.0316412119370338e8
    assert(math.abs(row.getDouble(0) - golden) / golden < 1e-9,
      s"revenue=${row.getDouble(0)}")
  }

  test("every query key has either an oracle or a dedicated spec") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Each key here must be asserted by a unit spec in this suite tree:
    // agg_approx_distinct → ApproxDistinctSpec; dedup_simhash →
    // DedupSpec; sim_ann / sim_ivfpq / sim_nndescent / sim_graph_search
    // / sim_hnsw / sim_index_refresh → SimilaritySpec; agg_sketch_rollup →
    // EventAnalyticsSpec; stream_late_data / stream_dedup /
    // stream_join / stream_join_outer / stream_static_join /
    // stream_update_mode → StreamingSpec.
    // token_bpe left this set in r17: the greedy merge APPLY replays in
    // DuckDB as unrolled MATERIALIZED CTE stages (bpeApplyOracleSql).
    // stream_dedup + stream_static_join left in r18 (VERDICT r17 item
    // 5): their deterministic emission histories replay as batch SQL —
    // the stream_merge_cdc argument (key-disjoint / stateless-per-batch
    // emissions make the final sink state a pure function of the
    // declared input). stream_join + stream_late_data left in r19
    // (VERDICT r18 item 1): the inner time-range emission equals the
    // batch theta-join (watermarks evict, never gate emission) and the
    // append-mode window set replays from the unrolled per-batch
    // watermark trajectory.
    // sim_index_delete joined in r19 (VERDICT r18 item 6): the
    // approximate-regime class — post-delete recall + no-deleted-id
    // pins live in SimilaritySpec. sim_filtered_graph (r19, VERDICT
    // r18 item 3) is the same approximate-search regime — recall
    // vs the exact filtered tier pinned in SimilaritySpec.
    assert(noOracle === Set(
      "agg_approx_distinct", "sim_ann", "sim_ivfpq", "sim_nndescent",
      "sim_graph_search", "sim_hnsw", "sim_index_refresh",
      "sim_index_delete", "sim_filtered_graph",
      "agg_sketch_rollup",
      "stream_join_outer", "stream_update_mode",
      "stream_transform_state", "stream_state_ttl",
      "stream_foreachbatch"))
    // No orphan oracles: SQL for a key that isn't declared would make
    // the driver's compare report a missing result dir as a failure.
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty, s"oracleSql keys without a query: $orphans")
    // The declared contract size — SURVEY §2B, README and this map must
    // move together (update all three when adding a key).
    assert(SparkEntry.queries.size === 291)
  }

  test("bench history parser: per-key mins read back from an emitted " +
      "line; malformed input degrades to no-history") {
    // r17: the end-of-run regression re-measure compares against the
    // previous run's bench.json — pin the parse against the emitted
    // shape (flat "queries" object ahead of nested telemetry objects).
    val line = """{"metric":"total","value":154.065,"unit":"sec",""" +
      """"queries":{"q6":0.2,"scan_project":0.669906395,""" +
      """"join_salted":1.27},"spread":{"q6":1.013},""" +
      """"passes":{"q6":[[0.1,1.0,0.4]]},"remeasured":[],"sf":"x"}"""
    val m = Bench.parsePrevMins(line)
    assert(m === Map("q6" -> 0.2, "scan_project" -> 0.669906395,
      "join_salted" -> 1.27))
    // spread/passes values must NOT leak into history: the queries
    // object is matched first and the regex stops at its closing brace
    assert(!m.contains("spread"))
    assert(Bench.parsePrevMins("not json at all") === Map.empty)
    assert(Bench.parsePrevMins("""{"queries":{}}""") === Map.empty)
    // r18 (ADVICE r17): the sf field rides along so a history file from
    // a different scale factor can be rejected instead of tripping the
    // regression bar on every key
    assert(Bench.parsePrevSf(line) === Some("x"))
    assert(Bench.parsePrevSf("no sf here") === None)
  }

  test("bench census integrity: streaming classification is explicit") {
    // VERDICT r13 item 5: Bench.streamingFixed and the census had no
    // cross-check — a streaming key missing from the set would silently
    // land in the batch headline, one leaving the census would crash
    // deep in the bench run. Every streamingFixed key must be declared,
    // and every stream_* census key must be CONSCIOUSLY classified:
    // either streaming-fixed (multi-microbatch latency, excluded from
    // the headline) or on the explicit headline allowlist (single
    // availableNow runs whose wall time IS data work).
    val census = SparkEntry.queries.keySet
    val fixed = Bench.streamingFixed
    assert((fixed -- census) === Set.empty,
      s"streamingFixed keys not in the census: ${fixed -- census}")
    val headlineStream = Set("stream_tumbling", "stream_sliding",
      "stream_session")
    val streamKeys = census.filter(_.startsWith("stream_"))
    val unclassified = streamKeys -- fixed -- headlineStream
    assert(unclassified === Set.empty,
      s"stream_* keys neither streaming-fixed nor headline-allowlisted " +
        s"(classify them in Bench.streamingFixed or here): $unclassified")
    // and nothing fixed/allowlisted has drifted out of stream_* naming
    assert((headlineStream -- census) === Set.empty)
  }
}
