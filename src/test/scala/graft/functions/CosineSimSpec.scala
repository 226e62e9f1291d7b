package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Native CosineSim expression: codegen correctness vs the
  * higher-order-function formulation, SQL registration, null safety. */
class CosineSimSpec extends SparkSpec {

  // the canonical HOF helpers themselves, not a copy — the docstring
  // contract is "matches Similarity.dot/l2norm numerics"
  private def hofCosine = {
    import graft.operators.Similarity.{dot, l2norm}
    dot(col("a"), col("b")) / (l2norm(col("a")) * l2norm(col("b")))
  }

  test("matches the zip_with+aggregate formulation on real embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val pairs = emb.select(col("embedding").as("a"), col("vec_id"))
      .crossJoin(emb.select(col("embedding").as("b")).limit(5))
    val mismatches = pairs.select(
      CosineSim.cosineSim(col("a"), col("b")).as("native"),
      hofCosine.as("hof"))
      .filter(abs(col("native") - col("hof")) > 1e-12).count()
    assert(mismatches === 0)
  }

  test("exact values and null safety") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal → 0
      (Seq(0.6f, 0.8f), Seq(0.6f, 0.8f)),   // identical → 1
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)),  // opposite → -1
    ).toDF("a", "b")
    val got = df.select(round(CosineSim.cosineSim(col("a"), col("b")), 6))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.0, 1.0, -1.0))
    val withNull = df.select(
      CosineSim.cosineSim(lit(null).cast("array<float>"), col("b")))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
    // zero-norm and empty vectors are null, not NaN (NaN would sort
    // above every real cosine in a descending top-k)
    val degenerate = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq.empty[Float], Seq(1.0f, 0.0f)),
    ).toDF("a", "b")
    assert(degenerate.select(CosineSim.cosineSim(col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
  }

  test("SQL registration: expr(\"cosine_sim(a, b)\") works after register") {
    import spark.implicits._
    CosineSim.register(spark)
    val Array(row) = Seq((Seq(0.6f, 0.8f), Seq(0.6f, 0.8f))).toDF("a", "b")
      .select(round(expr("cosine_sim(a, b)"), 6)).collect()
    assert(row.getDouble(0) === 1.0)
  }

  test("spark.sql.extensions plug-in path injects cosine_sim at session build") {
    // The declarative deployment story: a user sets
    // spark.sql.extensions=graft.functions.GraftExtensions and their
    // sessions get cosine_sim with no imperative register() anywhere.
    // (`spark.sql.extensions` is a STATIC conf read only at
    // SparkContext creation, so in this shared-context JVM we exercise
    // the same injection point via builder.withExtensions — Spark's
    // config path does exactly `new GraftExtensions()(extensions)`.)
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val Array(row) = s2.sql(
        "SELECT round(cosine_sim(array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))), 6) AS c").collect()
      assert(row.getDouble(0) === 1.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("expression participates in whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val emb = Tables.embeddings(spark, sf)
      val p = emb.select(CosineSim.cosineSim(col("embedding"), col("embedding"))
        .as("c")).queryExecution.executedPlan.toString
      assert(p.contains("*(1) Project"), p.take(400))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
