package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.K9): geometric mean via sum of logs.
  * Buffer is (Σ ln x, n); merge is associative+commutative so partial
  * aggregation (map-side combine) applies — 2-phase at any scale.
  *
  * Input is BOXED so SQL NULLs skip like every SQL aggregate (and like
  * the exp(avg(ln(x))) oracle): with a primitive Double input a nullable
  * column either failed deserialization or decoded null to 0.0, whose
  * ln = -Infinity poisoned the whole group to 0. */
case class GeoBuf(sumLn: Double, n: Long)

object GeoMean extends Aggregator[java.lang.Double, GeoBuf, Double] {
  def zero: GeoBuf = GeoBuf(0.0, 0L)
  def reduce(b: GeoBuf, x: java.lang.Double): GeoBuf =
    if (x == null) b else GeoBuf(b.sumLn + math.log(x.doubleValue()), b.n + 1)
  def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
  def finish(b: GeoBuf): Double = if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
