package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based algebraic laws per operator family (SURVEY.md §5.3),
  * run by sbt's native ScalaCheck framework over generated inline
  * DataFrames.
  */
object LawsProps extends Properties("graft.laws") {

  private lazy val spark: SparkSession = graft.TestSession.spark

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(60,
      for {
        k <- Gen.choose(0L, 5L)
        v <- Gen.choose(-100L, 100L)
        d <- Gen.choose(-1000, 1000).map(_ / 100.0)
      } yield (k, v, d))

  private def df(rows: List[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v", "d")
  }

  property("filter(p).filter(q) == filter(p && q)") = forAll(rowsGen) { rows =>
    val data = df(rows)
    val p = col("v") > 0
    val q = col("d") <= 5.0
    data.filter(p).filter(q).count() == data.filter(p && q).count()
  }

  property("projection preserves row count") = forAll(rowsGen) { rows =>
    val data = df(rows)
    data.select("k").count() == rows.length.toLong
  }

  property("unionAll counts add; union-distinct bounded") = forAll(rowsGen) { rows =>
    val data = df(rows)
    val half = df(rows.take(rows.length / 2))
    val all = data.unionAll(half)
    all.count() == rows.length.toLong + half.count() &&
      data.union(half).distinct().count() <= all.count()
  }

  property("unbounded window sum per key == group-by sum") = forAll(rowsGen) { rows =>
    val data = df(rows)
    val w = Window.partitionBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val windowed = data.select(col("k"), sum(col("v")).over(w).as("s"))
      .groupBy("k").agg(max(col("s")).as("s"))
    val grouped = data.groupBy("k").agg(sum(col("v")).as("s"))
    windowed.except(grouped).count() == 0 &&
      grouped.except(windowed).count() == 0
  }

  property("inner join row count == sum over keys of |L_k|*|R_k|") =
    forAll(rowsGen, rowsGen) { (l, r) =>
      val left = df(l).select(col("k"), col("v").as("lv"))
      val right = df(r).select(col("k"), col("v").as("rv"))
      val joined = left.join(right, "k").count()
      val expected = l.groupBy(_._1).map { case (k, ls) =>
        ls.size.toLong * r.count(_._1 == k)
      }.sum
      joined == expected
    }

  property("semi + anti partition the left side") = forAll(rowsGen, rowsGen) { (l, r) =>
    val left = df(l)
    val right = df(r).select(col("k"))
    val semi = left.join(right, Seq("k"), "left_semi").count()
    val anti = left.join(right, Seq("k"), "left_anti").count()
    semi + anti == l.length.toLong
  }

  property("aggregation distributes over unionAll") = forAll(rowsGen, rowsGen) { (x, y) =>
    val sums = df(x).unionAll(df(y)).groupBy("k").agg(sum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (x ++ y).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._2).sum }
    sums == expected
  }

  property("top-k is monotone: topk(k) subset of topk(k+5)") = forAll(rowsGen) { rows =>
    def topk(n: Int) = df(rows)
      .orderBy(col("v").desc, col("k"), col("d")).limit(n)
      .collect().map(_.mkString("|")).toSet
    topk(5).subsetOf(topk(10))
  }

  property("distinct is idempotent; intersect subset of either side") =
    forAll(rowsGen, rowsGen) { (x, y) =>
      val a = df(x).select("k")
      val b = df(y).select("k")
      val d1 = a.distinct()
      d1.count() == d1.distinct().count() &&
        a.intersect(b).count() <= math.min(d1.count(), b.distinct().count())
    }

  property("rollup = groupBy(k) rows + one grand-total row") = forAll(rowsGen) { rows =>
    val data = df(rows)
    val n = data.rollup(col("k")).agg(sum(col("v"))).count()
    n == data.select("k").distinct().count() + 1
  }

  property("dedup tokens: exact-equal normalized texts have Jaccard 1") =
    forAll(Gen.listOfN(8, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words0 =>
      val words = words0.take(8)
      (words.size >= 5) ==> {
        import spark.implicits._
        val text = words.mkString(" ")
        val docs = Seq((0L, text), (1L, "  " + text.toUpperCase + " "))
          .toDF("doc_id", "text")
        val pairs = Dedup.ngramPairs(docs, 0.9).collect()
        pairs.length == 1 && pairs.head.getDouble(2) == 1.0
      }
    }
}
