package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed P/R/F1 Aggregator (SURVEY.md §2.10 U-6; reference analog: the
  * stateful AverageMeter/F1 meters, src/utils/metrics.py:125-507).
  *
  * Input rows are (inEngine, inOracle) membership flags for the union of
  * both triple sets; the buffer is (tp, fp, fn) — associative and
  * commutative, so Spark can partial-aggregate map-side.
  */
object PrecisionRecall {

  final case class Flags(in_engine: Boolean, in_oracle: Boolean)
  final case class Buf(tp: Long, fp: Long, fn: Long)
  final case class PR(precision: Double, recall: Double, f1: Double)

  val aggregator: Aggregator[Flags, Buf, PR] =
    new Aggregator[Flags, Buf, PR] {
      def zero: Buf = Buf(0L, 0L, 0L)
      def reduce(b: Buf, r: Flags): Buf = Buf(
        b.tp + (if (r.in_engine && r.in_oracle) 1L else 0L),
        b.fp + (if (r.in_engine && !r.in_oracle) 1L else 0L),
        b.fn + (if (!r.in_engine && r.in_oracle) 1L else 0L))
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.tp + b.tp, a.fp + b.fp, a.fn + b.fn)
      def finish(b: Buf): PR = {
        val p = if (b.tp + b.fp == 0) 1.0 else b.tp.toDouble / (b.tp + b.fp)
        val r = if (b.tp + b.fn == 0) 1.0 else b.tp.toDouble / (b.tp + b.fn)
        val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
        PR(p, r, f1)
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[PR] = Encoders.product[PR]
    }
}
