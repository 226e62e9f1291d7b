package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `sim_filtered_graph` cost decomposition (r19): the key measured
  * 10–23 s per bench pass where the flat tier reads ~1.5 s — this
  * probe splits descent / corpus-frame prep / full key / repeat so
  * the pathological stage is measured, not guessed.
  */
object FilteredProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("plabel"))
    t("searchAdj materialize")(
      run(Similarity.searchAdj(spark, dir)))
    t("descent only")(
      Similarity.hnswDescend(spark, dir,
        probes.select(col("qid"), col("qe"))).foreach(run))
    t("full key pass 1")(run(Similarity.simFilteredGraph(spark, dir)))
    t("full key pass 2")(run(Similarity.simFilteredGraph(spark, dir)))
    // pass 3 under a job-duration listener: which jobs eat the time?
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties)
              .map(_.getProperty("spark.job.description", "")).getOrElse("")))
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = starts.getOrDefault(j.jobId, (0L, "?"))
          println(f"JOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${d.take(80)}")
        }
      })
    t("full key pass 3")(run(Similarity.simFilteredGraph(spark, dir)))
    spark.stop()
  }
}
