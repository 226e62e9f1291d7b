package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dedup_ngram posting-list A/B harness (VERDICT r7 item 7): time
  * [[Dedup.ngramPairs]] (plain inverted-index self-join) against
  * [[Dedup.ngramPairsPrefiltered]] (df≥2 posting prune first) on two
  * corpus shapes:
  *
  *  - OVERLAP: the fixture-shaped corpus (ScaleGen.documents, ~40-word
  *    vocabulary);
  *  - UNIQUE: web-shaped corpus — every token is globally unique to
  *    its document (hex of a doc-salted hash) except the planted
  *    near-dup copies.
  *
  * Measured surprise (SCALING.md): at the 5-gram level the two shapes
  * are nearly IDENTICAL on the df axis — even the 40-word vocabulary
  * yields df1 share ≈ 0.95 (the 5-token shingle space is 40⁵ ≈ 102M,
  * far larger than the ~2.5M shingles drawn) — and the prefilter loses
  * on BOTH (the prune pays the same posting volume through an extra
  * aggregation + semi-join while the df=1 rows it removes were already
  * contributing zero join output). The harness exists to keep that
  * conclusion measured rather than assumed.
  *
  * Both variants must emit identical pairs on both corpora (a df=1
  * shingle cannot contribute to an intersection) — asserted here and
  * pinned in DedupSpec.
  */
object NgramAb {

  /** Same doc-id/dup skeleton as ScaleGen.documents, but every token
    * is unique to its seed doc — the mostly-unique-shingle regime. */
  private def uniqueDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .select(col("id").as("doc_id"))
      .withColumn("ndup",
        col("doc_id") > 0 && pmod(col("doc_id"), lit(25)) === 1)
      .withColumn("seed",
        when(col("ndup"), col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("n_tok",
        (lit(30) + pmod(abs(xxhash64(col("seed"))), lit(50))).cast("int"))
      .withColumn("base", concat_ws(" ",
        transform(sequence(lit(0), col("n_tok") - 1),
          i => hex(xxhash64(col("seed"), i)))))
      .withColumn("text",
        when(col("ndup"),
          concat(col("base"), lit(" NOVEL"), col("doc_id").cast("string")))
          .otherwise(col("base")))
      .select(col("doc_id"), col("text"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpora = Seq(
      "overlap" -> graft.sources.ScaleGen.documents(spark, n)
        .select("doc_id", "text"),
      "unique" -> uniqueDocs(spark, n))
    val variants = Seq[(String, DataFrame => DataFrame)](
      "plain" -> (d => Dedup.ngramPairs(d)),
      "prefiltered" -> (d => Dedup.ngramPairsPrefiltered(d)))

    val out = corpora.flatMap { case (cname, docsLazy) =>
      // materialize the corpus once so generation cost is excluded
      val docs = docsLazy.persist()
      docs.count()
      val shingleStats = Dedup.hashedShingles(docs)
        .groupBy("h").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("df1"))
        .head()
      val df1Share = shingleStats.getLong(1).toDouble / shingleStats.getLong(0)
      val rows = variants.map { case (vname, f) =>
        f(docs).write.format("noop").mode("overwrite").save() // warm
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f(docs).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        (vname, times.min)
      }
      // equivalence: identical pair sets from both variants
      val a = Dedup.ngramPairs(docs)
      val b = Dedup.ngramPairsPrefiltered(docs)
      val nA = a.count(); val nB = b.count()
      require(nA == nB && a.exceptAll(b).count() == 0,
        s"$cname: variants disagree ($nA vs $nB pairs)")
      docs.unpersist()
      rows.map { case (vname, t) =>
        s""""${cname}_$vname":{"sec":$t,"df1_share":${f"$df1Share%.3f"},"pairs":$nA}"""
      }
    }
    println(out.mkString("{\"n_docs\":" + n + ",", ",", "}"))
    spark.stop()
  }
}
