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
  /** `events.ts` normalized to a microsecond TimestampType regardless
    * of the fixture's physical encoding — the driver has shipped it
    * two ways across rounds (TIMESTAMP(NANOS), which Spark's
    * vectorized reader only admits as a long via the nanosAsLong
    * conf; and plain non-UTC-adjusted TIMESTAMP(MICROS), which scans
    * as TIMESTAMP_NTZ). Every graft entry point pins
    * spark.sql.session.timeZone=UTC, so the NTZ→TIMESTAMP cast is
    * value-preserving and every downstream consumer (window(),
    * unix_micros, watermarks) sees the identical instants either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    // The TIMESTAMP(NANOS) fixture variant is only scannable with
    // spark.sql.legacy.parquet.nanosAsLong=true (set by every graft
    // entry point); without it Spark throws an opaque "Illegal Parquet
    // type: INT64 (TIMESTAMP(NANOS,...))" at schema resolution.
    // Rephrase that case so a bare-session caller learns the fix.
    val raw =
      try load(spark, dir, "events")
      catch { case e: Exception
        if Option(e.getMessage).exists(_.contains("TIMESTAMP(NANOS")) =>
          throw new IllegalStateException(
            s"events.parquet in $dir uses TIMESTAMP(NANOS); set " +
            "spark.sql.legacy.parquet.nanosAsLong=true on the session " +
            "(all graft mains do) so it scans as a long", e)
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>   // legacy ns fixture
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw                                  // already TIMESTAMP
    }
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
