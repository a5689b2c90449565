package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two float vectors,
  * accumulated in f64 — the tensor kernel the reference delegates to
  * DL4J/ND4J (`/root/reference/README.md:2`). A custom `Expression` with
  * `doGenCode` (SURVEY.md §4.3 escalation path (b)): the whole-stage-
  * codegen'd loop replaces the interpreted `zip_with`+`aggregate`
  * higher-order pipeline, which evaluates a lambda per element.
  *
  * Semantics are bit-identical to the HOF formulation (sequential
  * left-to-right f64 adds of exactly-promoted f32 products), so DuckDB
  * oracle parity is unaffected.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float>; used only through LlmOps.vecDot, which
  // always passes embedding columns (AbstractDataType is private[sql],
  // so ExpectsInputTypes is not available to external expressions).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
