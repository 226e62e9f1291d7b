package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: both sides pre-hashed into the same
  * bucket count on the join key ⇒ the join runs with ZERO exchanges —
  * the layout-level answer to repeated large joins at 100 TB (pay the
  * shuffle once at write time, never again at read time).
  */
class BucketingSpec extends SparkSpec {

  test("co-located bucketed join plans without any exchange") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a previously-killed run can leave orphan table directories that
    // the (fresh, in-memory) catalog no longer knows about
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
      }
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      // and it is still the correct join
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
