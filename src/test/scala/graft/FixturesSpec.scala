package graft

import org.apache.spark.sql.functions._

/** Pins the fixture properties the whole determinism contract rests on.
  *
  * Every oracled query ends in a deterministic terminal ORDER BY so the
  * driver's hash compare sees the same row order from Spark and DuckDB —
  * which is only sound if the sort key is UNIQUE in the data. These
  * tests assert that uniqueness against the actual fixtures at every
  * scale factor, so a regenerated or extended fixture that breaks the
  * assumption fails loudly here instead of as an inscrutable hash
  * mismatch (same rationale as the cdc_upsert ordering spec).
  */
class FixturesSpec extends SparkSpec {

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
  private def dir(s: String) = s"/root/testdata/$s"

  private def dupKeys(df: org.apache.spark.sql.DataFrame, key: Seq[String]): Long =
    df.groupBy(key.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()

  test("single-column identity keys are unique at every sf") {
    val keys = Seq(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "documents" -> "doc_id", "events" -> "event_id",
      "embeddings" -> "vec_id")
    for (s <- sfs; (t, k) <- keys) {
      val d = dupKeys(Tables.load(spark, dir(s), t), Seq(k))
      assert(d === 0L, s"$s/$t: $d duplicate $k values")
    }
  }

  test("lineitem sort key unique at the gate sfs; sf0.001's known collision stays singular") {
    // The oracle hash gate runs at sf0.01 and the bench at sf0.1 —
    // Tables.lineitemKey must be unique there.
    for (s <- Seq("sf0.01", "sf0.1")) {
      val d = dupKeys(Tables.lineitem(spark, dir(s)), Tables.lineitemKey)
      assert(d === 0L, s"$s: $d duplicate lineitem keys — the oracle " +
        "hash compare is order-nondeterministic")
    }
    // sf0.001 contains EXACTLY ONE collision — (1294, 123, 0, 4) twice,
    // with different payloads. Pinned so (a) nobody silently builds a
    // hash gate on sf0.001 row order, and (b) a regenerated fixture
    // that changes this surfaces here first.
    val d001 = dupKeys(Tables.lineitem(spark, dir("sf0.001")), Tables.lineitemKey)
    assert(d001 === 1L,
      s"sf0.001 lineitem collision count changed ($d001) — fixtures " +
        "regenerated? re-audit every sf0.001 ordering assumption")
  }
}
