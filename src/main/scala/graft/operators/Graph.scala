package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the near-dup pair graph (the second graph
  * operator family next to `dedup_components`' connected components) —
  * no reference analogue (single-table scan engine, README.md:6-15).
  *
  * PageRank here answers a real dedup-QA question: which documents are
  * the HUBS of the duplication graph (high centrality = copied into /
  * overlapping many near-dup chains), the docs worth human review
  * before a mass delete.
  *
  * Scale notes (100 TB design intent):
  *  - a FIXED iteration count means the whole power method is ONE
  *    declarative plan — no per-round driver action at all (contrast
  *    `dedup_components`, whose convergence check is data-dependent);
  *    Catalyst sees 5 chained join+agg rounds and pipelines them,
  *    while `edges`/`deg` are persisted once and re-read per round;
  *  - every round shuffles on node ids only (join + sum), map-side
  *    partials everywhere; the rank vector is one double per node;
  *  - the node count enters as a 1-row aggregate cross-joined into the
  *    plan (broadcast), not a driver-side collect;
  *  - per-round round(·, 12) pins both engines to the same trajectory:
  *    summation-order drift (~1e-16/round) cannot accumulate across
  *    rounds into the 6-dp output rounding.
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 5

  // `graph_pagerank` — 5-iteration damped PageRank over the symmetrized
  // near-dup graph: PR₀ = 1/N; PRₜ₊₁(v) = (1−d)/N + d·Σ_{u∼v} PRₜ(u)/deg(u).
  // The graph is undirected and every node has deg ≥ 1, so rank mass is
  // conserved and no dangling-node term is needed.
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = Dedup.minhashPairs(Tables.documents(spark, dir))
      .select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist(lvl)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg")).persist(lvl)
    val nDf = deg.agg(count(lit(1)).as("n"))

    var pr = deg.crossJoin(nDf)
      .select(col("u").as("node"), (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to Iters) {
      val contrib = edges
        .join(deg, Seq("u"))
        .join(pr.withColumnRenamed("node", "u"), Seq("u"))
        .groupBy(col("v").as("node"))
        .agg(sum(col("pr") / col("deg")).as("mass"))
      pr = contrib.crossJoin(nDf)
        .select(col("node"),
          round(lit(1.0 - Damping) / col("n") + lit(Damping) * col("mass"), 12)
            .as("pr"))
    }
    pr.select(col("node").as("doc_id"), round(col("pr"), 6).as("pagerank"))
      .orderBy("doc_id")
  }
}
