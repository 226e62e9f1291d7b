package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the sf dir; the
  * vectorized parquet reader + Catalyst column pruning replace the
  * reference's hand-rolled columnar Page model
  * (reference: Page.java:5-30, TpchDataGenerator.java:19-27).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long and convert to a microsecond
    * TimestampType (lossless here: the generator writes µs-precision
    * values; DuckDB does the same ns→µs truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Required at scan time. Asserted rather than set here: a loader
    // that mutates session conf is a surprise side effect for
    // concurrent callers (ADVICE r3) — every graft entry point
    // (Bench/Verify/TestSession) sets it in its session builder.
    require(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet stores TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true in the session builder")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The unique row key of `lineitem` in this synthetic data
    * (verified: (l_orderkey, l_linenumber) alone is NOT unique here).
    * Used as the deterministic terminal ORDER BY for row-level queries.
    */
  val lineitemKey: Seq[String] =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
}
