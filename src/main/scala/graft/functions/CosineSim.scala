package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors,
  * computed in ONE fused loop inside whole-stage codegen — no
  * intermediate zipped array, no UDF serialization. The extension-
  * preference ladder (SURVEY.md §2B footnote: built-ins > native
  * `Expression` > `udf()`) reserves custom expressions for hot paths
  * built-ins can't reach; this is the similarity-scoring inner loop,
  * executed once per (probe, candidate) pair.
  *
  * Numerics match the higher-order-function formulation exactly:
  * left-to-right double accumulation of dot and squared norms, then
  * dot / (√nx · √ny). Null if either side is null (nullSafe); arrays
  * shorter than the other are zero-padded by truncation to min length.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null for zero-norm/empty inputs (not NaN — NaN sorts ABOVE every
  // value in a descending Spark sort and would poison top-k ranking)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, nx, ny, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("nx"), ctx.freshName("ny"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $a.getFloat($i);
         |  double yv = (double) $b.getFloat($i);
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** DataFrame-DSL entry point. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private[functions] val registration =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  /** Imperative registration for sessions we did not build (e.g. the
    * driver's smoke session): makes `expr("cosine_sim(a, b)")` and SQL
    * use work everywhere. Idempotent. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark,
      registration._1, registration._2, registration._3)
}

/** The blessed plug-in path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * injects the graft function library into every session built with
  * the config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSim.registration)
    ext.injectFunction(TextNormalize.registration)
  }
}
