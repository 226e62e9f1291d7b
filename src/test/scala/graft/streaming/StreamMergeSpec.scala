package graft.streaming

import graft.SparkSpec
import graft.operators.Layout

/** Pins the two properties stream_merge_cdc's oracle can't see:
  * streaming-equals-batch equivalence, and apply idempotence (the
  * at-least-once → exactly-once discipline for a redelivered batch). */
class StreamMergeSpec extends SparkSpec {

  test("stream_merge_cdc reaches exactly the batch merge_into state, " +
      "and re-applying a changelog slice (redelivery) is a no-op") {
    val streamed = Streams.streamMergeCdc(spark, sf).collect().toSeq
    val batch = Layout.mergeInto(spark, sf).collect().toSeq
    assert(streamed === batch,
      "streaming micro-batch merges diverged from the one-shot batch merge")

    // redelivery drill: the 'I' slice arrives AGAIN after the stream
    // finished — matched-'I' keeps the target row, so the table state
    // must be byte-identical afterwards
    val path = graft.sources.FormatSources.exportPath("smergetgt", sf)
    val redelivered = Layout.mergeChangelog(spark, sf)
      .filter(org.apache.spark.sql.functions.col("op") === "I")
    Layout.mergeApply(spark, path, redelivered)
    val after = spark.read.parquet(path)
      .selectExpr("event_id", "event_type", "user_id", "cents")
      .orderBy("event_id").collect().toSeq
    assert(after === streamed,
      "re-applying an insert batch changed the table — apply is not idempotent")

    // and a redelivered 'U' slice is equally a no-op (same new value
    // applied twice)
    val reU = Layout.mergeChangelog(spark, sf)
      .filter(org.apache.spark.sql.functions.col("op") === "U")
    Layout.mergeApply(spark, path, reU)
    val afterU = spark.read.parquet(path)
      .selectExpr("event_id", "event_type", "user_id", "cents")
      .orderBy("event_id").collect().toSeq
    assert(afterU === streamed)
  }
}
