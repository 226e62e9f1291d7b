package graft.sources

import graft.{SparkSpec, Tables}

/** The scale rehearsal is only evidence if the synthetic tables match
  * the driver fixtures' shape: a schema drift (column rename, type
  * change) would silently make the sf1 numbers measure a different
  * workload. Pin (a) name+type equality against the real fixture
  * schemas and (b) the generator's claimed determinism under
  * re-partitioning (pure hash expressions of the range id — a seeded
  * per-partition Random would break this).
  */
class ScaleGenSpec extends SparkSpec {

  test("ScaleGen schemas match the driver fixture schemas (name + type)") {
    val gens = Seq(
      "documents" -> ScaleGen.documents(spark, 10),
      "embeddings" -> ScaleGen.embeddings(spark, 10),
      "events" -> ScaleGen.events(spark, 10, 5),
      "lineitem" -> ScaleGen.lineitem(spark, 10, 5, 5),
      "orders" -> ScaleGen.orders(spark, 10, 5),
      "customer" -> ScaleGen.customer(spark, 10),
      "supplier" -> ScaleGen.supplier(spark, 10),
      "part" -> ScaleGen.part(spark, 10),
      "nation" -> ScaleGen.nation(spark),
      "region" -> ScaleGen.region(spark))
    gens.foreach { case (name, gen) =>
      // raw load (not Tables.events) so the fixture's non-UTC-adjusted
      // TIMESTAMP(MICROS) column surfaces as the same TimestampNTZType
      // the generator writes
      val fixture = Tables.load(spark, sf, name).schema
        .map(f => (f.name, f.dataType))
      val got = gen.schema.map(f => (f.name, f.dataType))
      assert(got === fixture, s"table $name drifted from FIXTURES.md")
    }
  }

  test("ScaleGen output is identical under any partitioning") {
    val a = ScaleGen.documents(spark, 200).collect().map(_.toString).sorted
    val b = ScaleGen.documents(spark, 200).repartition(7)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
