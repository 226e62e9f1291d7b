package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native TextNormalize expression: unicode fold correctness (the
  * dedup_exact pre-hash contract), interpreted-vs-codegen agreement,
  * SQL registration, null safety. The DuckDB byte-parity of the same
  * fold is certified by the `text_normalize` oracle row.
  */
class TextNormalizeSpec extends SparkSpec {

  import TextNormalize.normalize

  test("composed and decomposed accents fold to the same bytes") {
    // U+00E9 (é precomposed) vs e + U+0301 (combining acute)
    assert(normalize("Café") === "cafe")
    assert(normalize("Café") === "cafe")
    assert(normalize("Ñandú") === "nandu")
    // Turkish İ folds İ→I→i (marks stripped BEFORE lower — the
    // opposite order would leave i + a combining dot above)
    assert(normalize("İstanbul") === "istanbul")
  }

  test("whitespace collapse + trim + case fold; canonical-only (no NFKC)") {
    assert(normalize("  A \t B\nC  ") === "a b c")
    assert(normalize("") === "")
    assert(normalize("   ") === "")
    // compatibility characters must NOT fold (matches DuckDB
    // strip_accents): ﬁ ligature and ß survive
    assert(normalize("ﬁsh") === "ﬁsh")
    assert(normalize("straße") === "straße")
  }

  test("Greek sigma matches utf8proc, not Java's contextual rule") {
    // DuckDB-verified bytes (lower∘strip_accents∘nfc_normalize):
    // capital Σ folds to σ (U+03C3) even word-finally — Java's
    // contextual toLowerCase would emit final ς (U+03C2) instead,
    // which is why the fold substitutes Σ→σ BEFORE lowercasing.
    assert(normalize("ΛΟΓΟΣ") === "λογοσ")
    assert(normalize("ΟΣ ΟΣ") === "οσ οσ")
    // ... while an ORIGINAL final ς is preserved by both engines
    // (it is already lowercase; neither engine rewrites it)
    assert(normalize("λόγος") === "λογος")
    assert(normalize("λόγος").last === 'ς')
    // mixed: the accent strips, the capital folds, the small survives
    assert(normalize("Λόγος ΛΟΓΟΣ") === "λογος λογοσ")
  }

  test("NFD fast path is idempotent with the slow path") {
    // already-NFD mark-free strings take the fast path; re-normalizing
    // any output must be a fixed point either way
    for (s <- Seq("plain ascii", "Café", "İstanbul", "ΛΟΓΟΣ", "straße"))
      assert(normalize(normalize(s)) === normalize(s))
    // combining marks on non-Latin scripts strip like Latin accents
    // (utf8proc STRIPMARK drops all \p{M}): Devanagari qa = ka + nukta
    assert(normalize("क़") === "क")
  }

  test("column expression: codegen and interpreted paths agree; null passes") {
    import spark.implicits._
    val docs = Seq("Café  du\tMonde", "café du monde", null)
      .toDF("t")
    val out = docs.select(
      TextNormalize.textNormalize(col("t")).as("n")).collect()
    assert(out(0).getString(0) === "cafe du monde")
    assert(out(1).getString(0) === "cafe du monde")
    assert(out(2).isNullAt(0))
    // interpreted path (eval without codegen) must match
    assert(normalize("Café  du\tMonde") === "cafe du monde")
  }

  test("SQL registration: expr(\"text_normalize(...)\") resolves") {
    import spark.implicits._
    TextNormalize.register(spark)
    val r = Seq("  Fóo  BAR ").toDF("t")
      .selectExpr("text_normalize(t) AS n").head().getString(0)
    assert(r === "foo bar")
  }
}
