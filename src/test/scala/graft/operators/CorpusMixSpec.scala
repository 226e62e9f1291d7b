package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Numeric guard for `corpus_mix`'s rounded rate column (VERDICT r6
  * item 6). The emitted `rate` is round(rate_raw, 6) computed
  * independently by Spark and by the DuckDB oracle; the two doubles can
  * differ by summation-order ulps (~1e-16), so the hash compare is only
  * safe if every unrounded rate sits far from a k·1e-6 + 0.5e-6
  * rounding tie. This spec MEASURES that distance against the real
  * fixtures at all three scale factors instead of assuming it.
  */
class CorpusMixSpec extends SparkSpec {

  test("corpus_mix: unrounded rates sit far from round(·,6) tie boundaries at every sf") {
    for (sfName <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      // distance from the nearest .5 tie, in 1e-6 (rounding-digit) units:
      // 0 = exactly on a tie (either engine could go either way),
      // 0.5 = maximally safe (rate is an exact multiple of 1e-6).
      val d = TextAnalysis.corpusMixRawRates(spark, s"/root/testdata/$sfName")
        .select(min(abs(((col("rate_raw") * 1e6) % 1.0) - 0.5)).as("d"))
        .head.getDouble(0)
      // 1e-4 tie-units = 1e-10 absolute ≈ 10⁶ × the ~1e-16 cross-engine
      // drift; measured actuals are ≥ 0.10 (see corpusMixRawRates doc).
      assert(d > 1e-4,
        f"$sfName: a rate lands $d%.2e tie-units from a round(·,6) " +
          "boundary — cross-engine rounding of the rate column is unsafe")
    }
  }
}
