package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ONE session builder for every test entry point (the scalatest trait
  * below and the scalacheck Properties object). getOrCreate means the
  * first caller's config wins for the whole JVM — a second, drifted
  * builder would silently run with someone else's config. */
object TestSession {
  def spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh_").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Shared test fixture: one session per JVM (getOrCreate), sf0.001
  * testdata. Sessions are never stopped per-suite — suites share it. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = "/root/testdata/sf0.001"
}
