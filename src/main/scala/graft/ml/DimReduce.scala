package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** SVD dimensionality reduction of an embedding column (reference:
  * src/utils/utils.py:304-310 — L2-normalize rows, TruncatedSVD to k
  * components, L2-normalize again; used as index-build preprocessing).
  *
  * Spark-first decomposition for the skinny case (d of order 10^2,
  * n unbounded — the embedding-table shape):
  *
  *   1. Gram matrix G = X^T X (d x d) by per-partition accumulation in
  *      one typed Dataset.mapPartitions pass (each task folds its rows
  *      into a local d^2 double array; numPartitions small rows reach
  *      the driver) — the same shape mllib's
  *      RowMatrix.computeGramianMatrix uses, with no RDD API.
  *   2. eigendecomposition of G on the driver (breeze eigSym, d x d is
  *      tiny) -> top-k right-singular vectors V_k of X. Eigenvector
  *      sign is fixed deterministically (largest-|component| positive)
  *      so results are reproducible across runs and partitionings.
  *   3. project + renormalize each row with broadcast V_k (one more
  *      mapPartitions pass, no shuffle anywhere).
  *
  * Input contract: `vec` may be array<float> or array<double> (cast
  * internally); NULL vectors are ignored by the fit and propagate as
  * NULL through svdReduce; ragged lengths and an all-NULL/empty input
  * fail fast with a clear message (not a deep task ClassCastException).
  *
  * Exact w.r.t. the same computation done locally (pinned in
  * DimReduceSpec); cosine geometry within a rank-r subspace is
  * preserved whenever k >= r.
  */
object DimReduce {

  /** L2-normalize a double vector in place; zero vectors pass through. */
  private def normInPlace(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) /= n; i += 1 } }
    v
  }

  /** Top-k right-singular vectors (d x k, column-major concatenated)
    * of the row-normalized embedding matrix.
    */
  def fitV(df: DataFrame, vec: String, k: Int): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.schema(vec).dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType],
      s"fitV: column '$vec' must be an array type, got " +
        df.schema(vec).dataType.sql)
    // tolerate float or double input; drop NULL vectors (no signal)
    val vecs = df.select(col(vec).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .as[Array[Double]]
    val head = vecs.take(1)
    require(head.nonEmpty,
      s"fitV: input has no non-null '$vec' rows to fit on")
    val d = head(0).length
    require(k >= 1 && k <= d, s"k=$k out of range 1..$d")
    // 1. partial Gram per partition (upper triangle, symmetrized later)
    val partials = vecs.mapPartitions { it =>
      val g = new Array[Double](d * d)
      it.foreach { xs =>
        if (xs.length != d)
          throw new IllegalArgumentException(
            s"fitV: ragged embedding length ${xs.length}, expected $d")
        val x = normInPlace(xs)
        var i = 0
        while (i < d) {
          val xi = x(i)
          if (xi != 0.0) {
            var j = i
            while (j < d) { g(i * d + j) += xi * x(j); j += 1 }
          }
          i += 1
        }
      }
      Iterator.single(g)
    }.collect()
    val g = new Array[Double](d * d)
    partials.foreach { p =>
      var i = 0; while (i < d * d) { g(i) += p(i); i += 1 }
    }
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { g(j * d + i) = g(i * d + j); j += 1 }
      i += 1
    }
    // 2. local eigendecomposition (breeze ships with Spark)
    val gm = new breeze.linalg.DenseMatrix[Double](d, d, g)
    val eig = breeze.linalg.eigSym(gm)
    // eigSym returns ascending eigenvalues; take the top k columns
    val order = (0 until d).sortBy(c => -eig.eigenvalues(c)).take(k)
    order.map { c =>
      val v = Array.tabulate(d)(r => eig.eigenvectors(r, c))
      // deterministic sign: largest-|component| positive
      var best = 0
      var r = 1
      while (r < d) { if (math.abs(v(r)) > math.abs(v(best))) best = r; r += 1 }
      if (v(best) < 0) { r = 0; while (r < d) { v(r) = -v(r); r += 1 } }
      v
    }.toArray
  }

  /** (id, vec: array<float|double>) -> (id, vec: array<float> of length
    * k): normalize -> project on V_k -> normalize. NULL vectors pass
    * through as NULL.
    */
  def svdReduce(df: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val v = fitV(df, vec, k)
    val spark = df.sparkSession
    val bcV = spark.sparkContext.broadcast(v)
    val d = v(0).length
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      df.schema(id), StructField(vec, ArrayType(FloatType), nullable = true)))
    df.select(col(id), col(vec).cast("array<double>")).mapPartitions { it =>
      val vk = bcV.value
      it.map { row =>
        if (row.isNullAt(1)) Row(row.get(0), null)
        else {
          val x = normInPlace(row.getSeq[Double](1).toArray)
          if (x.length != d)
            throw new IllegalArgumentException(
              s"svdReduce: ragged embedding length ${x.length}, expected $d")
          val y = new Array[Double](vk.length)
          var c = 0
          while (c < vk.length) {
            val vc = vk(c)
            var i = 0; var s = 0.0
            while (i < d) { s += x(i) * vc(i); i += 1 }
            y(c) = s; c += 1
          }
          normInPlace(y)
          Row(row.get(0), y.map(_.toFloat).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
