package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: argmin-by-squared-L2 cluster assignment
  * against a centroid matrix carried as a codegen REFERENCE OBJECT.
  *
  * The literal-expression assignment (KMeansCluster.assignExprLiteral:
  * `array_min(array(k structs of d-literal zip_with))`) is ideal at
  * small k*d but materializes k*d literals into the generated Java —
  * a few hundred centroids x a few hundred dims blows past the JVM's
  * 64KB method / constant-pool limits and falls out of whole-stage
  * codegen. Here the centroids ride as ONE `double[][]` reference in
  * the generated class (ctx.addReferenceObj — the same mechanism
  * broadcast scalar state uses), and the generated code is a fixed-size
  * nested loop independent of k and d.
  *
  * BYTE-IDENTICAL to the literal path by construction (KMeansSpec pins
  * both at k >= 128):
  *   - distance accumulation order: `s += d*d` in element order ==
  *     `aggregate(zip_with(...), 0.0, acc + x)` left fold;
  *   - rounding: `java.math.BigDecimal.valueOf(s).setScale(6, HALF_UP)`
  *     is exactly Spark's `round(col, 6)` on doubles;
  *   - tiebreak: strict `<` keeps the smallest cluster id on equal
  *     rounded distance == struct-ordering array_min with id field.
  *
  * CONTRACT: input array<double> with no NULL elements and length ==
  * centroid dim (KMeansCluster.checkedDim raise_errors both upstream).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"nearest_centroid expects array<double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.argmin(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |double $best = Double.POSITIVE_INFINITY; int $bestJ = 0;
         |for (int $j = 0; $j < $cs.length; $j++) {
         |  double[] $c = $cs[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $c.length; $i++) {
         |    double $d = $a.getDouble($i) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  double $r = java.math.BigDecimal.valueOf($s)
         |    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |  if ($r < $best) { $best = $r; $bestJ = $j; }
         |}
         |${ev.value} = $bestJ;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {

  /** Interpreted twin of the generated loop (same op order, rounding,
    * tiebreak).
    */
  def argmin(a: ArrayData, cs: Array[Array[Double]]): Int = {
    var best = Double.PositiveInfinity
    var bestJ = 0
    var j = 0
    while (j < cs.length) {
      val c = cs(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val d = a.getDouble(i) - c(i)
        s += d * d
        i += 1
      }
      val r = java.math.BigDecimal.valueOf(s)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r < best) { best = r; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Column-API form; `vec` must be array<double>, non-null elements,
    * length == centroid dim.
    */
  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCentroid(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec), centroids))
}
