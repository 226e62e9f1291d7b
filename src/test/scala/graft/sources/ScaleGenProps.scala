package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Properties}

/** Distribution pins for the ScaleGen rehearsal generator (VERDICT r8
  * item 8): the scale story now rests on ScaleGen's decades, so a
  * generator drift (vocab shrink, dup-rate change, length change)
  * must fail HERE, not silently weaken SCALING.md's curves. Each
  * invariant is checked at mult 1 and mult 10 of the documented base
  * counts — the sizes the rehearsals actually use — so a drift that
  * only manifests at scale (e.g. a modulus interacting with n) is
  * caught too.
  *
  * Pinned against the generator's own contract (ScaleGen.scala:44-80):
  *  - language mix: en-heavy 40%, de/fr/es/zh 15% each (hash-derived,
  *    so the observed mix concentrates tightly around the weights);
  *  - token lengths: 30 <= n_tok <= 81 (30-79 base + up to 2 novel-dup
  *    tokens), with the range actually SPANNED, not collapsed;
  *  - planted near-dups: one doc in 25 (4%), each with token-5-gram
  *    Jaccard >= 0.8 against its predecessor (the dedup_near/LSH
  *    rehearsal contract);
  *  - planted exact dups: id % 625 == 2 copies doc id-2 verbatim;
  *  - embeddings: exactly 64 dims, every component within the
  *    centroid*0.8 + noise*0.3 envelope (|x| <= 1.1);
  *  - lineitem: q6's predicate columns live in their TPC-H-ish ranges
  *    (quantity 1..50, discount 0.00..0.10, shipdate 1992-1999).
  */
object ScaleGenProps extends Properties("graft.scalegen") {

  private lazy val spark = graft.TestSession.spark

  /** Rehearsal sizes: mult × the sf0.1-equivalent base counts
    * (ScaleGen.main). Deterministic data → one evaluation per mult. */
  private val mults = Seq(1L, 10L)

  private def docs(mult: Long) = ScaleGen.documents(spark, 5000 * mult)

  property("language mix holds the documented weights at every mult") =
    Prop.secure(mults.forall { m =>
      val n = 5000.0 * m
      val mix = docs(m).groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1) / n).toMap
      def near(lang: String, w: Double) =
        mix.getOrElse(lang, 0.0) > w - 0.03 && mix.getOrElse(lang, 0.0) < w + 0.03
      near("en", 0.40) && near("de", 0.15) && near("fr", 0.15) &&
        near("es", 0.15) && near("zh", 0.15) && mix.keySet == Set("en", "de", "fr", "es", "zh")
    })

  property("token lengths bounded 30..81 and spanning the range") =
    Prop.secure(mults.forall { m =>
      val row = docs(m)
        .select(size(split(col("text"), " ")).as("n_tok"))
        .agg(min("n_tok"), max("n_tok"),
          sum(when(col("n_tok") < 30 || col("n_tok") > 81, 1).otherwise(0)))
        .head()
      val (lo, hi, outOfBounds) = (row.getInt(0), row.getInt(1), row.getLong(2))
      outOfBounds == 0L && lo <= 35 && hi >= 75
    })

  property("planted near-dups: 4% rate, 5-gram Jaccard >= 0.8 vs predecessor") =
    Prop.secure(mults.forall { m =>
      val n = 5000 * m
      // near-dup ids are 1 mod 25; their seeds (predecessors) 0 mod 25
      val texts = docs(m)
        .filter(pmod(col("doc_id"), lit(25)) <= 1)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(5).map(_.mkString(" ")).toSet
      val pairs = texts.keys.filter(id => id % 25 == 1 && id > 0).toSeq.sorted
      val rate = pairs.size.toDouble / n
      math.abs(rate - 0.04) < 0.002 && pairs.forall { id =>
        val (a, b) = (shingles(texts(id - 1)), shingles(texts(id)))
        val j = a.intersect(b).size.toDouble / a.union(b).size
        j >= 0.8 && j < 1.0 // near, never exact: the novel token is there
      }
    })

  property("planted exact dups copy doc_id-2 verbatim") =
    Prop.secure(mults.forall { m =>
      val d = docs(m).select("doc_id", "text")
      val dup = d.filter(col("doc_id") > 1 && pmod(col("doc_id"), lit(625)) === 2)
      val matched = dup.as("x")
        .join(d.as("o"), col("x.doc_id") - 2 === col("o.doc_id"))
        .filter(col("x.text") === col("o.text")).count()
      matched == dup.count() && matched >= (8 * m - 1)
    })

  property("embeddings: 64 dims, components inside the generator envelope") =
    Prop.secure(mults.forall { m =>
      val bad = ScaleGen.embeddings(spark, 2000 * m)
        .select(
          size(col("embedding")).as("dim"),
          array_max(transform(col("embedding"), v => abs(v))).as("amax"))
        .filter(col("dim") =!= 64 || col("amax") > lit(1.1f)).count()
      bad == 0L
    })

  property("lineitem: q6 predicate columns in TPC-H-ish ranges") =
    Prop.secure(mults.forall { m =>
      val bad = ScaleGen.lineitem(spark, 600000 * m, 20000 * m, 1000 * m)
        .filter(col("l_quantity") < 1 || col("l_quantity") > 50 ||
          col("l_discount") < 0 || col("l_discount") > 0.10 ||
          year(col("l_shipdate")) < 1992 || year(col("l_shipdate")) > 1999)
        .count()
      bad == 0L
    })
}
