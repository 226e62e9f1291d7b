package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `sim_hnsw` warm-cost decomposition (VERDICT r18 item 5): splits the
  * key's bench reading into serve / descent / layer-0 components the
  * way `stream_merge_cdc` and `variant_explode` got their floor
  * decompositions. Run:
  * {{{
  * scripts/run_main.sh graft.operators.HnswProbe <sfDir>
  * }}}
  * Prints one `PROBE <component> <sec>` line per stage; "warm" rows
  * are what bench pass 2 reports (cold pass populates memos +
  * committed-artifact reads + the resident adjacency, exactly like
  * bench's per-key cold pass after Caches.releaseAll).
  */
object HnswProbe {
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
    t("cold simHnsw")(run(Similarity.simHnsw(spark, dir)))
    t("warm layers serve")(run(Similarity.hnswLayers(spark, dir)))
    val probes = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val seeds = t("warm descent only")(
      Similarity.hnswDescend(spark, dir, probes).get)
    t("warm layer0 search")(
      run(Similarity.graphSearchFor(spark, dir, probes, Some(seeds), 3)))
    t("warm simHnsw full")(run(Similarity.simHnsw(spark, dir)))
    t("warm simHnsw full 2")(run(Similarity.simHnsw(spark, dir)))
    spark.stop()
  }
}
