package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom UDAF (`org.apache.spark.sql.expressions.Aggregator`):
  * weighted mean Σ(x·w)/Σw. The buffer is a pair of partial sums, so the
  * aggregate is associative/commutative — Spark runs it partial+final
  * (map-side combine, one shuffle of 16-byte buffers), the same
  * execution shape as a built-in agg.
  *
  * Completes the UDF/UDAF surface of SURVEY.md §2.9 (the reference has
  * one scalar UDF and no aggregate; WktPoint covers scalar, this covers
  * aggregate). Register for SQL with
  * `spark.udf.register("weighted_avg", functions.udaf(WeightedAvg))`.
  *
  * Empty/zero-weight groups finish as NaN (the caller decides null
  * semantics); inputs are assumed non-null (wrap with coalesce upstream
  * for nullable columns).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
