package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: single-pass URL decomposition to a
  * struct<protocol, host, path, query, ref>.
  *
  * Motivation (VERDICT r12 plan audit): `url_funcs` called
  * `parse_url` six times on the same URL and Spark evaluates each
  * call independently — six regex parses per row for one URL. A
  * struct-returning expression parses ONCE; the six field reads are
  * `GetStructField`s that whole-stage codegen's common-subexpression
  * elimination evaluates from a single per-row parse. The same shape
  * every crawl pipeline wants: parse once at ingest, carry the parts.
  *
  * Parsing uses `java.net.URI` (RFC 3986). Raw (undecoded) path/
  * query/fragment are returned, matching `parse_url` semantics —
  * percent-escapes survive for a downstream `url_decode`. A
  * syntactically invalid URL yields NULL (parse_url's contract).
  *
  * Codegen: stays inside whole-stage codegen via a static call (the
  * TextNormalize pattern); nullSafeCodeGen re-checks the result for
  * the invalid-URL null.
  */
case class UrlParts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlParts.schema
  override def nullable: Boolean = true
  override def prettyName: String = "url_parts"

  override def nullSafeEval(input: Any): Any =
    UrlParts.parse(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlParts.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): UrlParts = copy(child = newChild)
}

object UrlParts {

  val schema: StructType = StructType(Seq(
    StructField("protocol", StringType),
    StructField("host", StringType),
    StructField("path", StringType),
    StructField("query", StringType),
    StructField("ref", StringType)))

  def parse(u: UTF8String): InternalRow =
    try {
      val uri = new java.net.URI(u.toString)
      InternalRow(utf8(uri.getScheme), utf8(uri.getHost),
        utf8(uri.getRawPath), utf8(uri.getRawQuery),
        utf8(uri.getRawFragment))
    } catch {
      case _: java.net.URISyntaxException => null
    }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** DataFrame-DSL entry point. */
  def urlParts(c: Column): Column =
    GraftSqlBridge.column(UrlParts(GraftSqlBridge.expression(c)))

  private[functions] val registration =
    (FunctionIdentifier("url_parts"),
      new ExpressionInfo(classOf[UrlParts].getName, "url_parts"),
      (children: Seq[Expression]) => UrlParts(children.head))

  /** Idempotent imperative registration (SQL / `expr` use). */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark,
      registration._1, registration._2, registration._3)
}
