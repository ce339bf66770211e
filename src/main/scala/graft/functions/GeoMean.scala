package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.K9): geometric mean via sum of logs.
  * Buffer is (Σ ln x, n); merge is associative+commutative so partial
  * aggregation (map-side combine) applies — 2-phase at any scale. */
case class GeoBuf(sumLn: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoBuf, Double] {
  def zero: GeoBuf = GeoBuf(0.0, 0L)
  def reduce(b: GeoBuf, x: Double): GeoBuf = GeoBuf(b.sumLn + math.log(x), b.n + 1)
  def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
  def finish(b: GeoBuf): Double = if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
