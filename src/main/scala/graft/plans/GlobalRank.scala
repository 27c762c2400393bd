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
  * aggregate (numPartitions rows, not data rows) — kept inside the
  * query plan as a broadcast join since round 6 rather than a separate
  * driver collect job per call.
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

    // Per-partition totals -> cumulative EXCLUSIVE offsets, kept inside
    // the query plan (round 6): the former totals.collect() was a
    // separate driver job per GlobalRank call — a query calling this
    // twice paid two extra scheduling round-trips before its real
    // action even started. The offsets are now a numPartitions-row
    // aggregate (the exact frame the old code collected — driver-sized
    // BY CONSTRUCTION) cumulated with an explicitly broadcast-hinted
    // triangular join (sum of all strictly-smaller pids' totals; the
    // hint is the PlanGuard contract for every deliberate BNLJ) and
    // broadcast-joined back onto the local ranks — one plan, no
    // separate job, no driver round-trip.
    val aggCols = count(lit(1)).as("__n") +:
      cum.toSeq.map { case (_, expr) =>
        sum(expr.cast("long")).as("__s")
      }
    val totals = ranged.groupBy(col(pid)).agg(aggCols.head, aggCols.tail: _*)
    val offAggs = sum(col(s"b.__n")).as("__rn_off") +:
      cum.toSeq.map { _ => sum(col(s"b.__s")).as("__cum_off") }
    val offsets = totals.alias("a")
      .join(broadcast(totals.alias("b")),
        col(s"b.$pid") < col(s"a.$pid"), "left")
      .groupBy(col(s"a.$pid").as(pid))
      .agg(offAggs.head, offAggs.tail: _*)

    var out = local.join(broadcast(offsets), pid)
      .withColumn(rnCol,
        (col(rnCol + "__l") + coalesce(col("__rn_off"), lit(0L)))
          .cast("long"))
      .drop(rnCol + "__l", "__rn_off")
    cum.foreach { case (c, _) =>
      out = out.withColumn(c,
        col(c + "__l") + coalesce(col("__cum_off"), lit(0L)))
        .drop(c + "__l", "__cum_off")
    }
    out.drop(pid)
  }
}
