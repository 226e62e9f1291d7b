package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The composed corpus pipeline — the operators are not just a menu,
  * they CHAIN into the job a training-data team actually runs. One
  * declared key executes the whole flow:
  *
  *   1. exact dedup        (content-hash groupBy, min doc_id survives)
  *   2. near-dup clusters  (banded MinHash pairs → connected components)
  *   3. canonical doc      (longest text per cluster, ties → smaller id;
  *                          docs with no near-dup keep themselves)
  *   4. quality gate       (n_tok ≥ 10 — the cheap length floor; the
  *                          richer gates live in `text_quality`)
  *   5. sequence packing   (per-lang 2048-token running bins, the
  *                          `seq_pack` formulation)
  *
  * Output: the training-ready manifest (doc_id, lang, n_tok, bin_id,
  * bin_off) of kept documents.
  *
  * Scale shape: every stage is one of the already-plan-asserted
  * operators — content-keyed shuffles (1), banded candidate generation
  * + checkpointed label propagation (2), struct-argmax agg (3), map
  * filter (4), two-level (lang, shard) prefix sum (5). Nothing
  * corpus-global reaches
  * the driver; the survivors frame is persisted once because stages 2
  * and 3 both consume it. The DuckDB oracle replays all five stages
  * (recursive-CTE closure for stage 2), so the green hash certifies
  * the COMPOSITION, not just the parts.
  */
object Pipeline {

  def pipelineCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. exact dedup
    val surv = docs
      .groupBy(Dedup.exactHash(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val d = Caches.register(docs.join(surv, Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // 2. near-dup clusters over survivors (exact J ≥ 0.8 contract)
    val comp = Dedup.connectedComponents(
      Dedup.minhashPairs(d).select("doc_a", "doc_b"))

    // 3. canonical per cluster (singletons are their own cluster)
    val labeled = d
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
      .withColumn("grp", coalesce(col("comp"), col("doc_id")))
    val canon = labeled.groupBy("grp")
      .agg(max_by(col("doc_id"),
        struct(col("n_chars"), negate(col("doc_id")))).as("doc_id"))
      .select("doc_id")

    // 4. + 5. quality gate, then pack (the seq_pack formulation —
    // shared two-level prefix sum, so parallelism scales with corpus
    // size, not |languages|)
    val kept = labeled.join(canon, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 10)
    TextAnalysis.packBins(kept)
  }

  // `pipeline_observe` — Dataset.observe() + Observation: the
  // data-quality instrumentation API every production pipeline wraps
  // around its gates. observe() attaches aggregate metrics to a plan
  // node; they are computed ON THE SAME PASS as the downstream action
  // (a CollectMetrics node riding the existing scan) — the alternative
  // is a SECOND full scan of the input just to count what the gate
  // dropped, which at 100 TB doubles the job. The demo instruments the
  // corpus quality gate: pre-gate count/chars observe on the scan, the
  // post-gate aggregate is the driving action, and the returned 1-row
  // frame joins both with the drop ratio — the shape a pipeline writes
  // to its run-metrics table.
  //
  // The metric scalars surface on the driver BY DESIGN (Observation
  // .get blocks on the action's QueryExecutionListener callback) —
  // this is the documented API contract, not a collect() of data rows.
  def pipelineObserve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation(
      s"gate_metrics_${System.nanoTime()}")
    val gated = Tables.documents(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_in"),
        sum(col("n_chars")).as("chars_in"))
      .filter(col("n_chars") >= 200) // the quality gate under observation
    // the driving action: one pass computes gate output AND metrics
    val Array(keptRow) = gated
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      .collect()
    val m = obs.get
    Seq((m("n_in").asInstanceOf[Long], m("chars_in").asInstanceOf[Long],
      keptRow.getLong(0), keptRow.getLong(1)))
      .toDF("n_in", "chars_in", "n_kept", "chars_kept")
      .withColumn("kept_ratio",
        round(col("n_kept").cast("double") / col("n_in"), 4))
  }
}
