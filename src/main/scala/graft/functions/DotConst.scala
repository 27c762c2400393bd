package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of a vector column with a
  * CONSTANT coefficient vector carried as a codegen reference object
  * (round 6, guide "eliminate non-codegen expressions in the hot
  * path").
  *
  * The HOF formulation `aggregate(zip_with(e, lit(coefs), (v, c) =>
  * v.cast(double) * c), 0.0, acc + x)` — the random-hyperplane LSH
  * bucket's per-plane projection (Similarity.lshBucket/bandBuckets) —
  * is evaluated INTERPRETED (higher-order functions are
  * CodegenFallback) and allocates an intermediate 64-element array per
  * plane per row. This expression compiles to one fused primitive loop
  * with the coefficients as a shared `double[]` reference
  * (ctx.addReferenceObj — the NearestCentroid mechanism).
  *
  * BIT-IDENTICAL to the HOF form by construction:
  *   - accumulation: `s += x * c` in element order == the left fold
  *     over zip_with's ordered products (float->double cast is exact);
  *   - null semantics: zip_with pads a length mismatch with nulls and
  *     a null product nulls the whole fold, so ANY length mismatch or
  *     null element yields NULL — mirrored here exactly (the LSH
  *     bucket's `when(dot >= 0, ...).otherwise(0)` then takes the
  *     otherwise branch on both forms).
  */
case class DotConst(child: Expression, coefs: Array[Double])
    extends UnaryExpression {

  require(coefs.nonEmpty, "dot_const: empty coefficient vector")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"dot_const expects array<float|double>, got ${other.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != coefs.length) return null
    var s = 0.0
    var i = 0
    while (i < coefs.length) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * coefs(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("coefs", coefs, "double[]")
    val getter =
      if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $cs.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $cs.length; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${getter(a, i)} * $cs[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): DotConst = copy(child = newChild)
}

object DotConst {
  /** Column-API form. */
  def dot_const(a: Column, coefs: Array[Double]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DotConst(org.apache.spark.sql.graft.ColumnBridge.expression(a), coefs))
}
