package graft.operators

import org.apache.spark.sql.Dataset

/** Registry of operator-persisted frames (shingle caches, iterative-loop
  * rank/label vectors) so harness entry points can release executor
  * memory once a query family is done (ADVICE r4: `hashedShingles`
  * stayed resident for the whole 80+-query bench session).
  *
  * Operators register every frame they `persist`; `graft.Bench` calls
  * `releaseAll()` after the batch loop (before streaming latency is
  * measured) and `graft.Verify` at shutdown. Releasing is safe at those
  * points because every query's terminal action has already run;
  * mid-session the caches stay shared — Spark's CacheManager dedups
  * identical plans, so e.g. `dedup_near`/`dedup_ngram`/`graph_pagerank`
  * reuse ONE hashed-shingle cache entry between them.
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  private[graft] def register[T <: Dataset[_]](df: T): T = synchronized {
    frames += df; df
  }

  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}
