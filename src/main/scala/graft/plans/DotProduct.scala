package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused dot product over two array<double> columns.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, *), 0.0, +)`) materializes
  * an intermediate products array per row; this expression is a single
  * codegen'd loop — no allocation, stays inside WholeStageCodegen. The
  * summation is the same left-to-right fold, so results are bit-identical
  * to the HOF version (and to DuckDB's list_reduce twin) and it can be
  * swapped into oracle-checked queries freely (SURVEY §4.3 escalation b).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Floats widen exactly to double, so reading the float array directly is
  // bit-identical to transform(v, x -> cast(x as double)) — without the
  // HOF lambda projection that would knock the operator out of
  // whole-stage codegen.
  private def isFloat(e: Expression): Boolean =
    elemType(e).contains(FloatType)

  // Semantics match the HOF twin exactly so the optimizer rewrite is
  // value-preserving on EVERY input, not just well-formed ones:
  // zip_with pads unequal lengths with nulls and a null element poisons
  // the + fold to NULL — so unequal lengths or any null element → NULL.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getL =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $getL * $getR;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native functions.
  *
  * Two paths: `GraftExtensions` for `spark.sql.extensions=`
  * `graft.plans.GraftExtensions` at session build time, and
  * [[GraftFunctions.register]] for an already-running session (idempotent;
  * what [[graft.Registry]] queries use since they receive a live session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
    ext.injectFunction(GraftFunctions.matvecDescriptor)
    ext.injectFunction(GraftFunctions.pqCostsDescriptor)
    ext.injectFunction(GraftFunctions.srpDescriptor)
    ext.injectFunction(GraftFunctions.adcDescriptor)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteTopKPerGroup)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftFunctions {
  private[plans] val dotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  private[plans] val matvecDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[MatVecDots].getName, "graft_matvec"),
      (children: Seq[Expression]) => MatVecDots(children(0), children(1)))

  private[plans] val pqCostsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_pq_costs"),
      new ExpressionInfo(classOf[PqCosts].getName, "graft_pq_costs"),
      (children: Seq[Expression]) => PqCosts(children(0), children(1)))

  private[plans] val adcDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcScore].getName, "graft_adc"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        val k = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case e => throw new IllegalArgumentException(
            s"graft_adc: k must be an integer literal, got $e")
        }
        AdcScore(children(0), children(1), k)
      })

  private[plans] val srpDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_srp_sig"),
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_sig"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        def litInt(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"graft_srp_sig: $what must be an integer literal, got $e")
        }
        SrpSignature(children(0), litInt(children(1), "nBands"),
          litInt(children(2), "bitsPerBand"))
      })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      matvecDescriptor._1, matvecDescriptor._2, matvecDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      pqCostsDescriptor._1, pqCostsDescriptor._2, pqCostsDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      srpDescriptor._1, srpDescriptor._2, srpDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      adcDescriptor._1, adcDescriptor._2, adcDescriptor._3)
    // Running-session path for the optimizer rules and planner strategy
    // (extensions can only be injected at session build time;
    // experimental.extraOptimizations/extraStrategies work post-hoc).
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    if (!spark.experimental.extraOptimizations.contains(RewriteTopKPerGroup))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTopKPerGroup
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
