package graft.operators

import org.apache.spark.sql.SparkSession

/** Generic per-key cost decomposition (r19 optimization round): run any
  * census key cold + warm with a job-duration listener, printing every
  * Spark job's wall time. Answers "is this key data-bound or
  * stage-scheduling-bound, and which jobs eat the wall" without
  * guessing — the FilteredProbe method, generalized.
  *
  * Usage: KeyProbe <sfDir> <key1,key2,...> [passes=3]
  */
object KeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_CONF="k=v;k=v" — ad-hoc session-conf A/Bs without editing
    val extra = sys.env.get("GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect {
        case Array(k, v) => (k, v) }
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(spark0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var censusOn = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties)
              .map(_.getProperty("spark.job.description", ""))
              .getOrElse(""), j.stageIds.size))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (censusOn) {
            val (t0, d, nst) = starts.getOrDefault(j.jobId, (0L, "?", 0))
            println(f"JOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  stages=$nst%-3d ${d.take(90)}")
          }
      })
    keys.foreach { key =>
      Caches.releaseAll()
      (1 to passes).foreach { p =>
        censusOn = p == passes // census on the LAST (warm) pass
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(key)(spark, dir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"PASS $key%-24s #$p total ${(t2 - t0) / 1e9}%.2f s " +
          f"(construct ${(t1 - t0) / 1e9}%.2f, action ${(t2 - t1) / 1e9}%.2f)" +
          (if (censusOn) " (census above)" else ""))
      }
      censusOn = false
    }
    Caches.releaseAll()
    spark.stop()
  }
}
