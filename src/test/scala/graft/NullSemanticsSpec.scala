package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Engine null semantics. The driver fixture tables contain no nulls, so
  * the oracle gate never exercises these paths — this spec pins the ANSI
  * behaviors the engine relies on (join key nulls, aggregate null
  * skipping, set-op null equality, window null handling, na.* utilities)
  * over inline frames.
  */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lr = Seq[(java.lang.Long, String)](
    (1L, "a"), (null, "b"), (2L, "c"), (null, "d"))
    .toDF("k", "v")
  private lazy val rr = Seq[(java.lang.Long, String)](
    (1L, "x"), (null, "y"), (3L, "z"))
    .toDF("k2", "w")

  test("equi-join never matches null keys; null-safe <=> does") {
    val plain = lr.join(rr, col("k") === col("k2")).count()
    assert(plain === 1)  // only k=1
    val nullSafe = lr.join(rr, col("k") <=> col("k2")).count()
    assert(nullSafe === 3)  // k=1 plus 2 nulls x 1 null
  }

  test("count(col) skips nulls, count(*) does not; sum of all-null is null") {
    val Array(r) = lr.agg(
      count(col("k")).as("ck"), count(lit(1)).as("cstar"),
      sum(when(lit(false), 1L)).as("s")).collect()
    assert(r.getLong(0) === 2 && r.getLong(1) === 4)
    assert(r.isNullAt(2))
  }

  test("avg/min/max skip nulls; they are null only for empty input") {
    val df = Seq[(java.lang.Double)](1.0, null, 3.0).toDF("x")
    val Array(r) = df.agg(avg("x"), min("x"), max("x")).collect()
    assert(r.getDouble(0) === 2.0 && r.getDouble(1) === 1.0 && r.getDouble(2) === 3.0)
  }

  test("set operations treat null as a distinct equal value") {
    val a = Seq[java.lang.Long](1L, null, null).toDF("k")
    val b = Seq[java.lang.Long](null, 2L).toDF("k")
    assert(a.intersect(b).count() === 1)        // the null row matches
    assert(a.union(b).distinct().count() === 3) // 1, 2, null
    assert(a.except(b).count() === 1)           // just 1
  }

  test("window: lag yields null at edges; last(ignoreNulls) skips gaps") {
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 30L))
      .toDF("ord", "x")
    val w = Window.orderBy("ord")
    val rows = df.select(
      col("ord"),
      lag(col("x"), 1).over(w).as("prev"),
      last(col("x"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("ff")).orderBy("ord").collect()
    assert(rows(0).isNullAt(1))        // no predecessor
    assert(rows(1).getLong(2) === 10L) // forward-fill skips null
    assert(rows(2).isNullAt(1))        // lag lands on the null row
    assert(rows(2).getLong(2) === 30L)
  }

  test("na.fill / na.drop / coalesce") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (null, "b"))
      .toDF("k", "v")
    assert(df.na.drop().count() === 0)
    assert(df.na.drop(Seq("k")).count() === 1)
    val filled = df.na.fill(Map("k" -> -1L, "v" -> "?"))
    assert(filled.filter(col("k") === -1L && col("v") === "b").count() === 1)
    val Array(r) = df.filter(col("v") === "b")
      .select(coalesce(col("k"), lit(0L))).collect()
    assert(r.getLong(0) === 0L)  // null k coalesced
  }

  test("groupBy treats null as its own group") {
    val groups = lr.groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => (if (r.isNullAt(0)) -999L else r.getLong(0)) -> r.getLong(1)).toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L, -999L -> 2L))
  }
}
