package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: every n-word window of a word array hashed
  * to the engine's 60-bit md5-prefix shingle id, in one pass over the
  * words' UTF-8 bytes (kernel: [[graft.functions.ShingleHash]]).
  *
  * Replaces the `transform(sequence(...), i -> conv(substring(md5(
  * concat_ws(' ', slice(ws,i,n))), 1, 15), 16, 10))` composition, whose
  * lambda body Spark evaluates INTERPRETED for every window of every
  * document — the dominant cost of the shingle-index build that the whole
  * Jaccard/containment/contamination/span-dup/MinHash family shares. The
  * ids are bit-identical to the composition (property-tested), so every
  * DuckDB oracle built on the md5-prefix hash is unaffected.
  */
case class HashedShingles(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  protected override def nullSafeEval(a: Any): Any =
    graft.functions.ShingleHash.hashWindows(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHash.hashWindows($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** Native 64-bit SimHash sketch of a token array (kernel:
  * [[graft.functions.ShingleHash.simhash64]]) — replaces the Scala UDF
  * form: same bits, but no per-row ArrayData→Seq[String] conversion and
  * the call stays inside whole-stage codegen. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(a: Any): Any =
    graft.functions.ShingleHash.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHash.simhash64($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
