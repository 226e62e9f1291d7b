package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: the operators composed the way a
  * real corpus-prep job chains them — near-dup removal → quality filter
  * → token budgeting → per-language reporting. Asserts the stages stay
  * consistent with each other (the composability contract: every stage
  * is a DataFrame in, DataFrame out).
  */
class PipelineSpec extends SparkSpec {

  test("dedup -> quality filter -> token budget -> corpus report") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. near-dup removal: keep the smaller doc_id of every J>=0.8 pair
    val losers = operators.Dedup.dedupNear(spark, sf)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = docs.join(losers, Seq("doc_id"), "left_anti")
    val nDeduped = deduped.count()
    assert(nDeduped < total)                   // the planted dups go
    assert(nDeduped >= total - 25)             // and nothing else does

    // 2. quality filter on the scored frame
    val quality = operators.TextAnalysis.textQuality(spark, sf)
      .filter(col("quality_score") >= 0.2).select("doc_id")
    val filtered = deduped.join(quality, Seq("doc_id"), "left_semi")
    assert(filtered.count() > 0)
    assert(filtered.count() <= nDeduped)

    // 3. token budget: running total in doc_id order, cut at 30k tokens
    val counted = filtered
      .join(operators.TextAnalysis.tokenCount(spark, sf)
        .select("doc_id", "ws_tokens"), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budgeted = counted
      .withColumn("cum_tokens", sum(col("ws_tokens")).over(w))
      .filter(col("cum_tokens") <= 30000)
    val kept = budgeted.agg(
      count(lit(1)).as("n"), max(col("cum_tokens")).as("toks")).collect()(0)
    assert(kept.getLong(0) > 0 && kept.getLong(0) < total)
    assert(kept.getLong(1) <= 30000L)

    // 4. per-language report over the final corpus
    val report = budgeted.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("tokens"))
      .collect()
    assert(report.map(_.getLong(2)).sum === kept.getLong(1))
    assert(report.map(_.getString(0)).distinct.length === report.length)
  }

  test("canonical selection -> PII scrub -> sequence packing compose") {
    val docs = Tables.documents(spark, sf)

    // 1. exact-dup canonical selection: every kept doc is a real doc and
    // groups partition the corpus
    val kept = operators.Dedup.dedupKeepBest(spark, sf)
    val nGroups = kept.count()
    assert(kept.agg(sum(col("n_copies"))).collect()(0).getLong(0)
      === docs.count())
    assert(kept.join(docs, col("kept_doc") === col("doc_id"), "left_semi")
      .count() === nGroups)

    // 2. PII scrub over the kept set: every doc got its injected email
    // and phone redacted (counts exactly 1 each by construction)
    val scrubbed = operators.TextAnalysis.textPiiScrub(spark, sf)
      .join(kept.select(col("kept_doc").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(scrubbed.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1)
      .count() === 0)
    assert(scrubbed.count() === nGroups)

    // 3. packing: bins are contiguous 0..max per language; offsets stay
    // inside the 2048 budget; per-lang token sums match the doc totals
    val packed = operators.TextAnalysis.seqPack(spark, sf)
    assert(packed.filter(col("bin_off") >= 2048 || col("bin_off") < 0)
      .count() === 0)
    val perLang = packed.groupBy("lang").agg(
      max(col("bin_id")).as("max_bin"),
      countDistinct(col("bin_id")).as("n_bins"),
      sum(col("n_tok")).as("toks")).collect()
    perLang.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) + 1,  // bins contiguous from 0
        s"lang=${r.getString(0)} bins not contiguous")
      assert(r.getLong(3) >= r.getLong(1) * 2048L) // earlier bins are full
    }
  }
}
