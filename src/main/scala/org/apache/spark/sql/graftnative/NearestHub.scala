package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-hub argmin over a bounded
  * driver-side hub set. Returns `struct(d: double, hk: int)` — the
  * µ-rounded haversine km to the winning hub and its key — for a
  * (lat, lon) double pair.
  *
  * Why native: the composed form (an `array_min` over |hubs| literal
  * haversine struct branches) inlines the full trig tree once PER HUB,
  * which blows past janino's 64 KB method limit at 25 hubs and drops
  * the whole projection out of codegen into interpreted eval
  * (~90 µs/row measured). This expression is one 25-iteration loop
  * over primitive arrays — it stays inside whole-stage codegen at any
  * hub count.
  *
  * Math sequence is IDENTICAL to the composed form after Catalyst's
  * constant folding (and to the DuckDB oracle text): sdlat·sdlat +
  * ((cos(lat)·cos(hlat))·sdlon)·sdlon, asin(sqrt(min(1,h))) scaled by
  * 2·6371.0088, then floor(d·1e6+0.5)/1e6 BEFORE the argmin — ties on
  * the rounded distance resolve to the smallest hub key (hubs must be
  * passed sorted by key; the strict `<` keeps the first winner).
  * cos(hlat·π/180) is precomputed per hub with the same java.lang.Math
  * the folded constant used.
  */
case class NearestHub(left: Expression, right: Expression,
    hubKeys: Array[Int], hubLats: Array[Double], hubLons: Array[Double])
  extends BinaryExpression with ExpectsInputTypes {
  require(hubKeys.length == hubLats.length && hubKeys.length == hubLons.length
    && hubKeys.nonEmpty, "hub arrays must be equal-length and non-empty")
  require(hubKeys.sameElements(hubKeys.sorted),
    "hubs must be sorted by key: the argmin tie-break is first-wins")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("hk", IntegerType, nullable = false)))
  override def prettyName: String = "graft_nearest_hub"
  override def nullable: Boolean = true

  /** cos(hlat·π/180) per hub — same java.lang.Math.cos the composed
    * form's constant folding produced, so values are bit-identical. */
  private lazy val cosHlats: Array[Double] =
    hubLats.map(hl => java.lang.Math.cos((hl * java.lang.Math.PI) / 180.0))

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val lat = a.asInstanceOf[Double]
    val lon = b.asInstanceOf[Double]
    var bestD = Double.PositiveInfinity
    var bestHk = hubKeys(0)
    var i = 0
    while (i < hubKeys.length) {
      val sdlat = java.lang.Math.sin(((hubLats(i) - lat) * java.lang.Math.PI) / 360.0)
      val sdlon = java.lang.Math.sin(((hubLons(i) - lon) * java.lang.Math.PI) / 360.0)
      val h = sdlat * sdlat +
        ((java.lang.Math.cos((lat * java.lang.Math.PI) / 180.0) * cosHlats(i)) * sdlon) * sdlon
      // Spark's least(1.0, h) clamp, INCLUDING its NaN ordering (NaN is
      // the LARGEST double in Spark, so least picks 1.0) — Java's
      // Math.min(1.0, NaN) = NaN would instead make every comparison
      // false and silently return (Infinity, hubKeys(0)), diverging
      // from the composed twin on a NaN coordinate
      val hc = if (h != h || h > 1.0) 1.0 else h
      val d = 12742.0176 * java.lang.Math.asin(java.lang.Math.sqrt(hc))
      val d6 = java.lang.Math.floor(d * 1000000.0 + 0.5) / 1000000.0
      if (d6 < bestD) { bestD = d6; bestHk = hubKeys(i) }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestHk))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) => {
      val keys = ctx.addReferenceObj("nhKeys", hubKeys, "int[]")
      val lats = ctx.addReferenceObj("nhLats", hubLats, "double[]")
      val lons = ctx.addReferenceObj("nhLons", hubLons, "double[]")
      val coss = ctx.addReferenceObj("nhCosLats", cosHlats, "double[]")
      val i = ctx.freshName("i")
      val bd = ctx.freshName("bestD")
      val bk = ctx.freshName("bestHk")
      val cosLat = ctx.freshName("cosLat")
      val sdlat = ctx.freshName("sdlat")
      val sdlon = ctx.freshName("sdlon")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      s"""
         |double $bd = Double.POSITIVE_INFINITY;
         |int $bk = $keys[0];
         |double $cosLat = java.lang.Math.cos(($lat * java.lang.Math.PI) / 180.0);
         |for (int $i = 0; $i < $keys.length; $i++) {
         |  double $sdlat = java.lang.Math.sin((($lats[$i] - $lat) * java.lang.Math.PI) / 360.0);
         |  double $sdlon = java.lang.Math.sin((($lons[$i] - $lon) * java.lang.Math.PI) / 360.0);
         |  double $h = $sdlat * $sdlat + (($cosLat * $coss[$i]) * $sdlon) * $sdlon;
         |  if ($h != $h || $h > 1.0) { $h = 1.0; } // Spark least() NaN ordering — see eval
         |  double $d = 12742.0176 * java.lang.Math.asin(java.lang.Math.sqrt($h));
         |  $d = java.lang.Math.floor($d * 1000000.0 + 0.5) / 1000000.0;
         |  if ($d < $bd) { $bd = $d; $bk = $keys[$i]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bd, $bk});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NearestHub =
    copy(left = newLeft, right = newRight)
}
