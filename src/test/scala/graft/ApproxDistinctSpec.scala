package graft

import org.apache.spark.sql.functions._

/** Q14 `agg_approx_distinct` correctness: HLL++ estimate within ±5% of
  * the exact distinct count per group (the declared accuracy contract,
  * SURVEY.md §2B Q14). */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per returnflag") {
    val approx = operators.Analytic.aggApproxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, n) =>
      val est = approx(flag)
      assert(math.abs(est - n).toDouble / n <= 0.05,
        s"flag=$flag exact=$n approx=$est")
    }
  }

  test("approx_percentile within 2% of the exact interpolated percentile") {
    val rows = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e <= 0.02, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
