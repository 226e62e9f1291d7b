package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Q41 `udf_suite` — the extension surface demo (SURVEY.md §2B Q41):
  * one scalar UDF, one typed `Aggregator` UDAF, one generator
  * (explode-style), each used in a single query whose oracle reproduces
  * the result with engine-independent SQL.
  *
  * Preference order for extensions (SURVEY.md §2B footnote): built-in
  * expressions beat UDFs — every op elsewhere in this repo is
  * built-ins; this file exists to demonstrate (and unit-test, see
  * UdfSuiteSpec) the escape hatches for when a real deployment needs
  * custom logic:
  *  - scalar: `udf()` — JVM lambda per row (no codegen; keep OUT of hot
  *    paths);
  *  - aggregate: typed `Aggregator[IN,BUF,OUT]` via `functions.udaf` —
  *    map-side partial aggregation works (reduce/merge split), so it
  *    scales like a built-in agg;
  *  - generator: an array-returning UDF + `explode` — Catalyst treats
  *    the explode as a proper Generate node (same as posexplode).
  *
  * Scale notes: the Aggregator merges fixed-size (sum,count) buffers —
  * shuffle carries one buffer per (lang, partition), not rows. The
  * scalar UDF and generator run map-side only.
  */
object UdfSuite {

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n);
    * finish = exp(Σ/n). Partial-aggregation friendly (reduce + merge). */
  private[operators] class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar UDF: whitespace token count of normalized text. Matches
    * `size(split(trim(lower(text)), "\\s+"))` and the oracle's
    * `len(string_split_regex(...))` exactly — including the empty-string
    * case, where split returns one empty token (count 1), and null in →
    * null out. */
  private[graft] val tokenCountUdf =
    udf((s: String) =>
      if (s == null) null
      else java.lang.Long.valueOf(
        s.trim.toLowerCase.split("\\s+").length.toLong))

  /** Generator UDF: adjacent word bigrams of normalized text. */
  private[operators] val bigramsUdf =
    udf((s: String) =>
      if (s == null) Seq.empty[String]
      else s.trim.toLowerCase.split("\\s+").toSeq
        .sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)

  // The demo query: per language — doc count, geometric mean of doc
  // length (Aggregator UDAF), total whitespace tokens (scalar UDF), and
  // total bigrams counted through the generator path (explode of an
  // array-returning UDF → Generate node → aggregate).
  def udfSuite(spark: SparkSession, dir: String): DataFrame = {
    val geoMean = udaf(new GeoMean)
    val docs = Tables.documents(spark, dir)
    val main = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(geoMean(col("n_chars").cast("double")), 4).as("geo_chars"),
      sum(tokenCountUdf(col("text"))).as("total_tokens"))
    val bigrams = docs
      .select(col("lang"), explode(bigramsUdf(col("text"))).as("bg"))
      .groupBy("lang").agg(count(lit(1)).as("n_bigrams"))
    main.join(bigrams, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_docs"), col("geo_chars"),
        col("total_tokens"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .orderBy("lang")
  }

  // `sql_udf` — Spark 4 SQL-DEFINED functions (CREATE FUNCTION …
  // RETURNS, the SQL-standard SQL/PSM subset): the declarative cousin
  // of the JVM escape hatches above, and the extension path that costs
  // NOTHING at scale — the body is INLINED into the Catalyst plan at
  // resolution time, so a SQL UDF keeps pushdown, codegen and partial
  // aggregation exactly as if the expression were written in place
  // (this key carries NO CodegenAuditSpec exemption — that audit
  // passing IS the inlining proof; a JVM scalar udf() would need one).
  // Three surfaces:
  //  - a scalar function (exact-cents net price, the standing money
  //    recipe) used inside an aggregate;
  //  - a scalar function COMPOSED with the first (tier labeling calls
  //    nothing at runtime — both bodies collapse into one projection);
  //  - a TABLE function (RETURNS TABLE) consumed as a lateral source,
  //    the SQL-native generator (vs udf_suite's array-UDF + explode).
  // Oracle: the bodies inlined by hand — if Spark's resolution-time
  // inlining ever diverged from textual substitution, the hash would
  // catch it.
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("squ_lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION squ_net_cents(
        |  price DOUBLE, disc DOUBLE) RETURNS BIGINT
        |RETURN CAST(round(price * (1 - disc) * 100) AS BIGINT)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION squ_qty_tier(q DOUBLE)
        |RETURNS STRING
        |RETURN CASE WHEN q < 10 THEN 'low'
        |            WHEN q < 30 THEN 'mid' ELSE 'high' END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION squ_halves(cents BIGINT)
        |RETURNS TABLE(half BIGINT, part BIGINT)
        |RETURN SELECT h, CASE WHEN h = 0 THEN cents div 2
        |                      ELSE cents - cents div 2 END
        |       FROM (SELECT explode(sequence(0, 1)) AS h)""".stripMargin)
    spark.sql(
      """SELECT t.tier, t.l_returnflag, t.n, t.net_cents, h.half,
        |       h.part AS part_cents
        |FROM (
        |  SELECT squ_qty_tier(l_quantity) AS tier, l_returnflag,
        |         count(*) AS n,
        |         sum(squ_net_cents(l_extendedprice, l_discount))
        |           AS net_cents
        |  FROM squ_lineitem
        |  GROUP BY 1, 2
        |) t, LATERAL squ_halves(t.net_cents) h
        |ORDER BY tier, l_returnflag, half""".stripMargin)
  }
}
