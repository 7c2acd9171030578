package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dense-vector dot product — the inner
  * loop of similarity search and embedding dedup.
  *
  * Why a custom Expression: Spark's higher-order array functions
  * (`zip_with`/`aggregate`) evaluate their lambda per element through the
  * interpreter — they are excluded from whole-stage codegen, which makes
  * them the bottleneck of a brute-force ANN scan. This expression emits a
  * tight primitive loop via `doGenCode`, keeping the whole scan inside one
  * codegen stage.
  *
  * Semantics exactly mirror the higher-order formulation used elsewhere
  * (`zip_with(a, b, (x, y) => x.toDouble * y.toDouble)` summed
  * left-to-right): element casts to double before multiply, sequential
  * accumulation (bit-reproducible), null result when either side is null,
  * when lengths differ, or when any element is null.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val leftIsFloat = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (double) $a.$getL($i) * (double) $b.$getR($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register `vec_dot` in the session's function registry (idempotent —
    * createOrReplace at query-build time, no cache needed); makes the
    * expression available to both SQL text and `call_function`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SessionFunctions.registerIfAbsent(spark,
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)))

  /** Column-level entry point for the codegen'd dot product (shared
    * registry route — see [[SessionFunctions]]).
    */
  def vecDot(a: Column, b: Column): Column =
    SessionFunctions.callRegistered("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), None, a, b)
}
