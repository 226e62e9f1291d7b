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

  test("every query key has either an oracle or a dedicated spec") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Each key here must be asserted by a unit spec in this suite tree:
    // agg_approx_distinct → ApproxDistinctSpec; dedup_simhash →
    // DedupSpec; sim_ann → SimilaritySpec; stream_late_data /
    // stream_dedup / stream_join → StreamingSpec.
    assert(noOracle === Set(
      "agg_approx_distinct", "dedup_simhash", "sim_ann",
      "stream_late_data", "stream_dedup", "stream_join"))
  }
}
