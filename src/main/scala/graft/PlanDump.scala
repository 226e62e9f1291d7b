package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan artifact dumper (optimization rounds): writes each requested
  * key's `explain("formatted")` physical plan to `<outDir>/<key>_<tag>
  * .txt` so plan-shape claims in OPTIMIZATION_r*.md are checkable
  * without running Spark. Same session shape as Bench (local[cpus],
  * shuffle.partitions = cpus, AQE on) so the dumped INITIAL plan is the
  * one the bench executes.
  *
  * Usage: PlanDump <sfDir> <outDir> <tag> <key1,key2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, keysCsv) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    keysCsv.split(",").foreach { key =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${key}_$tag.txt"), txt)
      println(s"[plandump] $key -> $outDir/${key}_$tag.txt (${txt.length} chars)")
    }
    graft.operators.Caches.releaseAll()
    spark.stop()
  }
}
