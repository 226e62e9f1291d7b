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
}
