package graft

import graft.functions.DotConst
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 6: the codegen constant-coefficient dot product that replaced
  * the interpreted `aggregate(zip_with(...))` pair in the LSH bucket
  * must be BIT-IDENTICAL to the HOF form on every input class the
  * bucket can see — including the null semantics the bucket's
  * `when(..., bit).otherwise(0)` relies on.
  */
class DotConstSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hof(e: org.apache.spark.sql.Column,
      coefs: Array[Double]): org.apache.spark.sql.Column =
    aggregate(
      zip_with(e, lit(coefs), (v, c) => v.cast("double") * c),
      lit(0.0), (acc, x) => acc + x)

  test("codegen == HOF bitwise on float vectors incl. negatives/zeros") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val coefs = Array.tabulate(64)(i => if (i % 3 == 0) -1.0 else 1.0)
    val vecs = (0 until 200).map(_ =>
      Array.fill(64)((rnd.nextFloat() - 0.5f) * 10f).toSeq)
    val rows = vecs.toDF("e").select(
      DotConst.dot_const($"e", coefs).as("cg"),
      hof($"e", coefs).as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"codegen ${r.getDouble(0)} != HOF ${r.getDouble(1)}")
    }
  }

  test("null parity: length mismatch, null element, null vector") {
    import spark.implicits._
    val coefs = Array(1.0, -1.0, 1.0)
    val data = Seq(
      Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f))), // ok
      Some(Seq(Some(1.0f), Some(2.0f))), // short -> null
      Some(Seq(Some(1.0f), Some(2.0f), Some(3.0f), Some(4.0f))), // long -> null
      Some(Seq(Some(1.0f), None, Some(3.0f))), // null element -> null
      None) // null vector -> null
    val rows = data.toDF("e").select(
      DotConst.dot_const($"e", coefs).as("cg"),
      hof($"e", coefs).as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null parity broke: cg=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(rows.count(_.isNullAt(0)) == 4)
  }

  test("interpreted eval (no codegen) matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val coefs = Array(2.0, -3.0)
    val expr = DotConst(
      Literal.create(Array(1.0, 1.0), ArrayType(DoubleType)), coefs)
    assert(expr.eval(null) == -1.0)
  }
}
