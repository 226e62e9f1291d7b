package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Accuracy + mergeability contracts for the sketch rollup (no SQL
  * oracle — DataSketches HLL internals aren't replayable in DuckDB)
  * and structure checks for the changelog compaction. */
class EventAnalyticsSpec extends SparkSpec {

  test("agg_sketch_rollup: estimates within 2% of exact; rollup row present") {
    val rows = EventAnalytics.aggSketchRollup(spark, sf).collect()
    val (dayRows, totalRows) = rows.partition(r => !r.isNullAt(0))
    assert(totalRows.length === 1, "exactly one corpus-wide rollup row")
    val exactByDay = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    dayRows.foreach { r =>
      val exact = exactByDay(r.getDate(0).toString)
      val est = r.getLong(2)
      assert(math.abs(est - exact).toDouble / exact <= 0.02,
        s"day=${r.getDate(0)} exact=$exact approx=$est")
    }
    val exactTotal = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    val estTotal = totalRows.head.getLong(2)
    assert(math.abs(estTotal - exactTotal).toDouble / exactTotal <= 0.02,
      s"total exact=$exactTotal approx=$estTotal")
  }

  test("agg_sketch_rollup: golden total estimate pinned per sf — a " +
      "silent estimator change must fail loudly") {
    // The DataSketches HLL estimate is deterministic given the
    // implementation (fixed lgK=14, fixed hash). Pin the corpus-wide
    // rollup row's estimate exactly per sf (VERDICT r7 item 6); the
    // ≤2% band above remains the semantic contract.
    val pinned = Map(
      "/root/testdata/sf0.001" -> 15L,
      "/root/testdata/sf0.01" -> 150L)
    pinned.foreach { case (dir, want) =>
      val got = EventAnalytics.aggSketchRollup(spark, dir)
        .filter(col("day").isNull).head.getLong(2)
      assert(got === want, s"dir=$dir got=$got")
    }
  }

  test("agg_sketch_rollup: union of daily sketches == direct whole-log sketch") {
    // Mergeability is the point of the sketch: rolling up per-partition
    // sketches must give the SAME estimate as sketching the whole log.
    val viaUnion = EventAnalytics.aggSketchRollup(spark, sf)
      .filter(col("day").isNull).head.getLong(2)
    val direct = Tables.events(spark, sf)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(14))).cast("long"))
      .head.getLong(0)
    assert(viaUnion === direct)
  }

  test("agg_bitmap_distinct: bitmap counts equal exact distinct, " +
      "day-grain rollup agrees with direct") {
    // The oracle certifies both columns against count(DISTINCT); this
    // spec pins the same claim in-engine (and keeps it pinned at a
    // different sf than the driver's compare).
    val rows = EventAnalytics.aggBitmapDistinct(spark, sf).collect()
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)),
        s"${r.getString(0)}: bitmap != exact")
      assert(r.getLong(2) === r.getLong(1),
        s"${r.getString(0)}: day-grain OR-rollup disagrees with direct")
    }
  }

  test("scd2_history: per-user intervals chain without gaps or overlap; " +
      "exactly one open interval each") {
    val h = EventAnalytics.scd2History(spark, sf)
    // exactly one is_current row per user
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(h.filter(col("is_current") === 1).count() === users)
    // intervals chain: this row's valid_to == next row's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    val broken = h
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from"))
      .count()
    assert(broken === 0, "validity intervals must chain end-to-start")
    // no collapsed duplicates: consecutive rows always change status
    val dup = h
      .withColumn("next_status", lead(col("status"), 1).over(w))
      .filter(col("next_status").isNotNull &&
        col("next_status") === col("status"))
      .count()
    assert(dup === 0, "consecutive intervals must differ in status")
  }

  test("ts_resample: complete hour×type grid; silent hours are explicit " +
      "zeros; non-zero rows equal the plain aggregation") {
    val r = EventAnalytics.tsResample(spark, sf)
    val hours = r.select("h").distinct().count()
    val types = r.select("event_type").distinct().count()
    assert(r.count() === hours * types, "grid must be dense (no holes)")
    val zeros = r.filter(col("n") === 0)
    assert(zeros.count() > 0, "fixture log must have silent hours to fill")
    assert(zeros.filter(col("sum_value") =!= 0.0).count() === 0)
    // gap fill must not invent or alter real buckets
    val direct = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n")).count()
    assert(r.filter(col("n") > 0).count() === direct)
  }

  test("cdc_upsert: tombstoned keys absent, resurrected keys present") {
    val ev = Tables.events(spark, sf)
    val state = EventAnalytics.cdcUpsert(spark, sf)
    val stateKeys = state.select("user_id").collect().map(_.getLong(0)).toSet
    // per-key latest record, computed independently via a window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (dead, live) = latest.partition(_._2 == "error")
    assert(stateKeys === live.keySet)
    assert(dead.keySet.forall(k => !stateKeys.contains(k)))
    // a key with an error that is NOT its latest record must be live
    assert(live.nonEmpty)
  }

  test("events fixtures: (user_id, ts, event_id) unique at every sf — " +
    "cdc_upsert's version order is total") {
    // cdc_upsert's max_by(struct(ts, event_id)) and the oracle's
    // row_number() OVER (ORDER BY ts, event_id) agree only if
    // (ts, event_id) strictly totally orders each user's records — a
    // duplicate pair would let the two engines pick different "latest"
    // rows (VERDICT r6 item 5). Pin the assumption against the actual
    // fixtures at all three scale factors.
    for (sfName <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dups = Tables.events(spark, s"/root/testdata/$sfName")
        .groupBy("user_id", "ts", "event_id")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .count()
      assert(dups === 0L,
        s"$sfName: $dups duplicate (user_id, ts, event_id) triples — " +
          "cdc_upsert's last-writer-wins order is not total")
    }
  }

  test("join_temporal: every event matches EXACTLY one dimension version") {
    // scd2's intervals partition each user's timeline, so the
    // point-in-time join must be lossless AND fan-out-free: one output
    // row per event. A wrong boundary (> vs >=) loses the
    // change-moment events; an overlapping dimension would fan out.
    val ev = Tables.events(spark, sf).count()
    val out = Relational.joinTemporal(spark, sf)
    assert(out.count() === ev)
    assert(out.select("user_id", "ts", "event_id").distinct().count() === ev)
  }

  test("sessionize_batch: sessions partition the log, ids are contiguous " +
      "from 1, spans are exact") {
    val out = EventAnalytics.sessionizeBatch(spark, sf).collect()
    // no event lost or double-counted: session sizes sum to the log
    val totalEvents = Tables.events(spark, sf).count()
    assert(out.map(_.getLong(2)).sum === totalEvents)
    // per user the running-sum numbering yields exactly 1..k
    out.groupBy(_.get(0)).foreach { case (u, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head === 1L && ids.last === ids.length.toLong,
        s"user $u: session ids ${ids.mkString(",")} not contiguous from 1")
    }
    // duration is the exact microsecond span, never negative
    assert(out.forall(r =>
      r.getLong(5) === r.getLong(4) - r.getLong(3) && r.getLong(5) >= 0L))
  }

  test("agg_approx_topk: CMS estimates on a SKEWED fixture — top-k set " +
      "matches exact, estimates within 2% (the Q90-style accuracy pin)") {
    import spark.implicits._
    // zipf-ish skew: one dominant type, a mid tier, a long unit tail —
    // the regime where CMS over-estimation (colliding tail counts)
    // would actually show, unlike the near-uniform corpus
    val counts = Map("hot" -> 5000, "warm" -> 300, "mid" -> 120,
      "cool" -> 40, "rare" -> 7) ++ (1 to 5).map(i => s"tail$i" -> 1)
    val rows = counts.toSeq.flatMap { case (t, n) => Seq.fill(n)(t) }
    val df = rows.toDF("t")
    val skBytes = df
      .agg(expr("count_min_sketch(t, 0.001d, 0.99d, 42)")).head()
      .getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val est = counts.keys.map(t => t -> sk.estimateCount(t)).toMap
    // CMS never underestimates; ≤2% over on the heavy hitters
    counts.foreach { case (t, exact) =>
      assert(est(t) >= exact.toLong, s"$t: CMS underestimated")
      if (exact >= 40)
        assert(est(t) <= math.ceil(exact * 1.02).toLong,
          s"$t: est ${est(t)} vs exact $exact exceeds 2%")
    }
    val topkExact = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(3).map(_._1)
    val topkEst = est.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(3).map(_._1)
    assert(topkEst === topkExact)
  }

  test("agg_approx_topk: per-day top-3 ranks agree with exact counts on " +
      "the corpus (the oracle's premise: no candidate collides)") {
    val approx = EventAnalytics.aggApproxTopk(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (day, rs) =>
        rs.sortBy(t => (-t._3, t._2)).zipWithIndex.take(3)
          .map { case ((_, ty, n), i) => (day, i + 1L) -> (ty, n) }
      }.toMap
    assert(approx === exact)
  }

  test("table_diff: each class recounts from the v2 construction rules") {
    val diff = EventAnalytics.tableDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val removed = ev.filter(col("event_id") % 97 === 0).count()
    val added = ev.filter(col("event_id") % 101 === 0).count()
    val changed = ev.filter(col("event_id") % 97 =!= 0 &&
      col("event_type") === "click").count()
    assert(diff("removed") === removed)
    assert(diff("added") === added)
    assert(diff("changed") === changed)
    assert(diff("same") === total - removed - changed)
    assert(diff.values.sum === total + added)
  }

  test("win_islands: runs are maximal consecutive same-type stretches " +
      "(recount via the lag-based change-flag formulation)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    // independent formulation: a run starts where the type differs from
    // the previous event; run id = running count of starts
    val runs = Tables.events(spark, sf)
      .filter(col("user_id") % 20 === 0)
      .withColumn("start",
        when(lag(col("event_type"), 1).over(w) =!= col("event_type") ||
          lag(col("event_type"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("run_id", sum(col("start")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "run_id")
      .agg(min(col("event_id")).as("first_event"),
        count(lit(1)).as("run_len"))
      .filter(col("run_len") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val islands = EventAnalytics.winIslands(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(4)).toMap
    assert(islands === runs)
  }
}
