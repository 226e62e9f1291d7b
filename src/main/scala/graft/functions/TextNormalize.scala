package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the canonical pre-hash text normalizer
  * (VERDICT r9 item 5) — unicode NFD decomposition + combining-mark
  * strip (accent fold), case fold, whitespace collapse, trim. This is
  * the normalization EVERY content-hash dedup should share: without
  * the unicode steps, near-identical documents differing only in
  * composed vs decomposed accents (U+00E9 `é` vs `e`+U+0301) hash
  * apart and silently survive exact dedup.
  *
  * Fold order matters and is chosen to match DuckDB's
  * `lower(strip_accents(nfc_normalize(x)))` oracle pipeline exactly:
  * marks are stripped BEFORE lowercasing, so e.g. `İ` (U+0130) folds
  * İ→I→i in both engines — Java's `toLowerCase` applied first would
  * instead produce i + a combining dot. Compatibility ligatures (ﬁ, ß)
  * are NOT folded in either engine (canonical forms only, no NFKC).
  *
  * Codegen: stays inside whole-stage codegen via a static call — no
  * UDF serialization, no Row boxing; the per-row cost is the regex +
  * Normalizer calls themselves (with an isNormalized fast path for the
  * ASCII common case).
  */
case class TextNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextNormalize.normalizeUtf8(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalize.normalizeUtf8($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TextNormalize = copy(child = newChild)
}

object TextNormalize {
  // \p{M} (all marks: Mn+Mc+Me) mirrors utf8proc's STRIPMARK, which
  // backs DuckDB strip_accents. \s is ASCII whitespace in both Java
  // and DuckDB's RE2 — no unicode-space divergence.
  private val Marks = Pattern.compile("\\p{M}+")
  private val Ws = Pattern.compile("\\s+")

  def normalize(s: String): String = {
    val folded =
      if (Normalizer.isNormalized(s, Normalizer.Form.NFD) &&
          !Marks.matcher(s).find()) s // ASCII / mark-free fast path
      else
        Marks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
          .replaceAll("")
    // Σ (U+03A3) folds to σ BEFORE toLowerCase: Java lowercases a
    // word-final Σ contextually to ς (U+03C2) while DuckDB's utf8proc
    // maps Σ→σ unconditionally — the one Greek divergence (measured:
    // 'ΛΟΓΟΣ' → duckdb 'λογοσ', raw Java 'λογος'). Pre-substituting the
    // CAPITAL sigma sidesteps the contextual rule without touching an
    // original ς, which both engines preserve (TextNormalizeSpec pins
    // both directions).
    Ws.matcher(folded.replace('Σ', 'σ').toLowerCase(Locale.ROOT))
      .replaceAll(" ").trim
  }

  def normalizeUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))

  /** DataFrame-DSL entry point. */
  def textNormalize(c: Column): Column =
    GraftSqlBridge.column(TextNormalize(GraftSqlBridge.expression(c)))

  private[functions] val registration =
    (FunctionIdentifier("text_normalize"),
      new ExpressionInfo(classOf[TextNormalize].getName, "text_normalize"),
      (children: Seq[Expression]) => TextNormalize(children.head))

  /** Idempotent imperative registration (SQL / `expr` use). */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark,
      registration._1, registration._2, registration._3)
}
