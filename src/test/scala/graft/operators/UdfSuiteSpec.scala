package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Q41 `udf_suite`: each extension-surface piece asserted against a
  * Spark-built-in reformulation (SURVEY.md §2B Q41). */
class UdfSuiteSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("scalar UDF tokenCount == built-in size(split(...))") {
    val mismatches = docs.select(
      UdfSuite.tokenCountUdf(col("text")).as("u"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("b"))
      .filter(col("u") =!= col("b")).count()
    assert(mismatches === 0)
  }

  test("Aggregator UDAF geometric mean == exp(avg(ln(x)))") {
    val geoMean = udaf(new UdfSuite.GeoMean)
    val rows = docs.groupBy("lang").agg(
      round(geoMean(col("n_chars").cast("double")), 6).as("u"),
      round(exp(avg(log(col("n_chars")))), 6).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-4))
  }

  test("generator UDF bigrams: count == tokens-1, content is adjacent pairs") {
    val mismatches = docs.select(
      size(UdfSuite.bigramsUdf(col("text"))).cast("long").as("u"),
      greatest(size(split(trim(lower(col("text"))), "\\s+")) - 1, lit(0))
        .cast("long").as("b"))
      .filter(col("u") =!= col("b")).count()
    assert(mismatches === 0)
    import spark.implicits._
    val Array(row) = Seq(("x y z")).toDF("text")
      .select(UdfSuite.bigramsUdf(col("text"))).collect()
    assert(row.getSeq[String](0) === Seq("x y", "y z"))
  }

  test("udf_suite query is internally consistent") {
    val rows = UdfSuite.udfSuite(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)          // n_docs
      assert(r.getDouble(2) > 0)        // geo_chars
      assert(r.getLong(4) < r.getLong(3)) // bigrams < tokens
    }
  }
}
