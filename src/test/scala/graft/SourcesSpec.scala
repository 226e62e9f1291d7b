package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** Source/sink format coverage: every mainstream batch format
  * round-trips losslessly (parquet is the primary engine format and is
  * exercised by the whole suite; csv/json/orc here), plus the
  * partitioned-layout write path with partition pruning on read — the
  * layout that matters at 100 TB.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_src_$name").resolve("out").toString

  private def canon(df: DataFrame): Set[String] =
    df.select("doc_id", "lang", "text").collect().map(_.mkString("|")).toSet

  private lazy val docs = Tables.documents(spark, sf)

  test("csv round-trip preserves content") {
    val path = tmp("csv")
    docs.write.option("header", "true").csv(path)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(path)
    assert(canon(back) === canon(docs))
  }

  test("json round-trip preserves content") {
    val path = tmp("json")
    docs.write.json(path)
    val back = spark.read.schema(docs.schema).json(path)
    assert(canon(back) === canon(docs))
  }

  test("orc round-trip preserves content") {
    val path = tmp("orc")
    docs.write.orc(path)
    val back = spark.read.orc(path)
    assert(canon(back) === canon(docs))
  }

  test("partitioned parquet write; reads prune partitions") {
    val path = tmp("part")
    docs.write.partitionBy("lang").parquet(path)
    val back = spark.read.parquet(path).filter(col("lang") === "en")
    assert(back.count() === docs.filter(col("lang") === "en").count())
    // the lang predicate must become a PartitionFilter (directory
    // pruning), not a data filter evaluated per row
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang") ||
      plan.contains("PartitionFilters: [(lang"))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
