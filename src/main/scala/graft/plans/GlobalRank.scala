package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives.
  *
  * `Window.orderBy(...)` with no partition key collapses to a single
  * partition (Spark warns "Moving all data to a single partition") — a
  * non-starter at 100 TB. The scalable equivalent is the classic two-pass
  * scheme: range-repartition by the sort key, rank/scan locally per
  * partition, then add per-partition offsets computed from a tiny
  * driver-side aggregate (numPartitions rows, not data rows).
  *
  * Requires the sort key to be a total order (unique) — equal keys could
  * otherwise straddle a range boundary nondeterministically.
  */
object GlobalRank {

  /** Adds a 1-based global row number over `sortCols`. */
  def withGlobalRowNumber(
      df: DataFrame,
      rnCol: String,
      sortCols: Seq[Column],
      numPartitions: Int): DataFrame =
    withGlobalScan(df, rnCol, None, sortCols, numPartitions)

  /** Adds a global row number AND a global running LONG sum of
    * `cumOf` (exact integer arithmetic — order-insensitive offsets).
    */
  def withGlobalRankAndCumSum(
      df: DataFrame,
      rnCol: String,
      cumCol: String,
      cumOf: Column,
      sortCols: Seq[Column],
      numPartitions: Int): DataFrame =
    withGlobalScan(df, rnCol, Some((cumCol, cumOf)), sortCols, numPartitions)

  private def withGlobalScan(
      df: DataFrame,
      rnCol: String,
      cum: Option[(String, Column)],
      sortCols: Seq[Column],
      numPartitions: Int): DataFrame = {
    val pid = "__grank_pid"
    val ranged = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint() // one materialization feeds both passes below
    val w = Window.partitionBy(col(pid)).orderBy(sortCols: _*)
    val cumFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    var local = ranged.withColumn(rnCol + "__l", row_number().over(w))
    cum.foreach { case (c, expr) =>
      local = local.withColumn(c + "__l",
        sum(expr.cast("long")).over(cumFrame))
    }

    // per-partition totals -> cumulative offsets (tiny driver pass)
    val aggCols = count(lit(1)).as("__n") +:
      cum.toSeq.map { case (_, expr) =>
        sum(expr.cast("long")).as("__s")
      }
    val totals = ranged.groupBy(col(pid)).agg(aggCols.head, aggCols.tail: _*)
      .collect().map { r =>
        (r.getInt(0), r.getLong(1), if (cum.isDefined) r.getLong(2) else 0L)
      }.sortBy(_._1)
    def offsetMap(values: Array[Long], pids: Array[Int]): Map[Int, Long] =
      pids.zip(values.scanLeft(0L)(_ + _).init).toMap
    val pids = totals.map(_._1)
    val rnOffsets = offsetMap(totals.map(_._2), pids)
    def offsetExpr(m: Map[Int, Long]): Column =
      coalesce(try_element_at(typedlit(m), col(pid)), lit(0L))

    var out = local.withColumn(rnCol,
      (col(rnCol + "__l") + offsetExpr(rnOffsets)).cast("long"))
      .drop(rnCol + "__l")
    cum.foreach { case (c, _) =>
      val cumOffsets = offsetMap(totals.map(_._3), pids)
      out = out.withColumn(c, col(c + "__l") + offsetExpr(cumOffsets))
        .drop(c + "__l")
    }
    out.drop(pid)
  }
}
