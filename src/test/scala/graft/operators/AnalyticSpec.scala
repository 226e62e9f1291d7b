package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Value-level invariants for the analytic-layer keys whose oracles
  * certify emitted values but not the CONSTRUCTION contract (the same
  * division of labor as TextAnalysisSpec vs the doc_chunk oracle). */
class AnalyticSpec extends SparkSpec {

  test("agg_hist: bins partition the table — counts sum to row count, " +
      "every observed extreme sits inside its bin's envelope") {
    val hist = Analytic.aggHist(spark, sf).persist()
    val total = Tables.orders(spark, sf).count()
    try {
      assert(hist.agg(sum(col("n"))).head.getLong(0) === total,
        "histogram dropped or double-counted rows")
      // explicit-edge contract: bin_lo = lo + bin*width, and the
      // observed min/max of every bin lie in [bin_lo, bin_lo + width)
      val width = 50000.0
      val bad = hist.filter(
        col("bin_min") < col("bin_lo") ||
        col("bin_max") >= col("bin_lo") + width ||
        col("bin_min") > col("bin_max") ||
        col("n") <= 0).count()
      assert(bad === 0, "a bin's envelope leaked past its edges")
    } finally hist.unpersist()
  }

  test("agg_mode: the picked value really is the group's most frequent " +
      "(tie-break: count desc, value asc)") {
    val mode = Analytic.aggMode(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((seg, picks) <- counts.groupBy(_._1)) {
      val best = picks.map { case (_, v, n) => (v, n) }
        .sortBy { case (v, n) => (-n, v) }.head
      assert(mode(seg) === best, s"segment $seg picked ${mode(seg)}, " +
        s"recount says $best")
    }
  }

  test("agg_regression: regr_slope/intercept match the closed-form " +
      "moment identities (slope = covar_pop/var_pop, the fitted line " +
      "passes through the mean point), r2 bounded") {
    val rows = Analytic.aggRegression(spark, sf).collect()
    val m = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(
        covar_pop(col("l_extendedprice"), col("l_quantity")).as("cv"),
        var_pop(col("l_quantity")).as("vx"),
        avg(col("l_quantity")).as("ax"),
        avg(col("l_extendedprice")).as("ay"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (cv, vx, ax, ay) = m(r.getString(0))
      val slope = cv / vx
      val icpt = ay - slope * ax
      assert(math.abs(r.getDouble(1) - slope) < 1e-3,
        s"slope identity: ${r.getDouble(1)} vs $slope")
      assert(math.abs(r.getDouble(2) - icpt) < 1e-3,
        s"intercept identity: ${r.getDouble(2)} vs $icpt")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "r2 in [0,1]")
      assert(r.getLong(4) > 0L, "regr_count counts pairs")
    }
  }

  test("str_collation: case variants merge under UTF8_LCASE — group " +
      "count equals the distinct-lower count, variants counted binary") {
    val rows = Analytic.strCollation(spark, sf).collect()
    val nLower = Tables.part(spark, sf)
      .select(countDistinct(lower(col("p_type")))).head.getLong(0)
    assert(rows.length.toLong === nLower,
      "one output group per case-folded type")
    // every group key is already folded, and the mangle (lower() on
    // even partkeys) must leave exactly 2 binary spellings in any group
    // that contains both parities
    for (r <- rows) {
      assert(r.getString(0) === r.getString(0).toLowerCase)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 2)
    }
    // the collated startsWith("PROMO") hits ALL rows of the promo
    // group regardless of spelling, and no rows elsewhere
    val promo = rows.find(_.getString(0) == "promo").get
    assert(promo.getLong(3) === promo.getLong(1))
    assert(rows.filterNot(_.getString(0) == "promo")
      .forall(_.getLong(3) === 0L))
  }

  test("agg_approx_percentile: in the compressed regime the GK sketch " +
      "honors its rank-error bound") {
    import spark.implicits._
    // 50k distinct values with accuracy=100 forces real compression
    // (unlike the key's exact regime); for range data the true rank of
    // a value IS the value, so the bound checks directly:
    // |rank(est) - q*N| <= N/accuracy (+1 for the discrete pick)
    val n = 50000L
    val acc = 100
    val est = spark.range(n).toDF("v")
      .agg(expr(s"approx_percentile(v, array(0.1, 0.5, 0.99), $acc)"))
      .head.getSeq[Long](0)
    for ((q, e) <- Seq(0.1, 0.5, 0.99).zip(est)) {
      val err = math.abs(e - q * n)
      assert(err <= n / acc + 1,
        s"q=$q est=$e err=$err exceeds rank bound ${n / acc}")
    }
  }

  test("ansi_try_funcs: ANSI mode is ON — plain division by zero " +
      "throws, the try_ form nulls exactly the failing rows") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    // the non-try form must FAIL the job (ANSI contract)
    val thrown = intercept[Exception] {
      spark.sql("SELECT 1 / 0").collect()
    }
    assert(thrown.getMessage.toLowerCase.contains("divide"),
      s"expected a divide-by-zero ANSI error, got: ${thrown.getMessage}")
    // the try_ form nulls ONLY rows whose bucket divisor is 0
    val rows = Analytic.ansiTryFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    val nulls = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val expected = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(20)) === 0 &&
        col("o_custkey") % 7 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(nulls === expected)
  }

  test("url_funcs: parse_url round-trips the constructed URL — host " +
      "splits, query key extracts, percent-encoding decodes") {
    val rows = graft.operators.SemiStructured.urlFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(1) === "https")
      assert(r.getString(2).endsWith(".example.com"))
      assert(r.getString(3).startsWith("/d/") &&
        r.getString(3).endsWith("/page"))
      // the decode must undo %20 and %2F exactly
      assert(r.getString(5) === "a b/c")
      assert(r.getString(6).startsWith("s"))
      assert(r.getString(7) === "example")
    }
  }
}
