package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared kernel for the merge-based tokenizer trainers (BPE in
  * [[LlmTextOps]], WordPiece in [[WordPieceOps]]). Both families iterate
  * the same mechanical loop — segment state as separator-joined symbols,
  * per-round adjacent-pair candidates, one bounded regex pass applying
  * the winning merge — and differ ONLY in the argmax that picks the
  * winner (BPE: raw pair frequency; WordPiece: pair likelihood
  * pcnt/(cl·cr)). Keeping the mechanics here means the two trainers
  * cannot drift apart on the boundary-anchoring/greedy-application
  * subtleties that took several rounds to pin against the DuckDB twins.
  */
object TokenizerMerge {
  /** Symbol separator: U+001F, absent from the corpus (ASCII text canary
    * in FixtureSchemaCanarySpec keeps that assumption honest). */
  val Sep = "\u001f"

  /** Initial segmentation state from a (w, cnt) word histogram: one
    * separator between every pair of adjacent chars. (?s) so '.' also
    * matches a newline: the corpus split is on ' ' only, so '\n' can
    * survive INSIDE a word — without DOTALL Java's regex skips it while
    * the DuckDB twin's substr trick assumes every char matched, and the
    * engines' seg0 diverge on newline-bearing words. */
  def initialSeg(words: DataFrame): DataFrame =
    words.select(
      regexp_replace(col("w"), "(?s)(.)(?=.)", "$1" + Sep).as("seg"),
      col("cnt"))

  /** Adjacent-pair candidates of a (seg, cnt) table: one row per pair
    * occurrence, weighted — `pair` is `l Sep r`. One shuffle on the pair
    * key; the key space is bounded by (vocab symbols)², never the
    * corpus. */
  def pairCandidates(seg: DataFrame): DataFrame =
    seg.select(col("cnt"), split(col("seg"), Sep).as("syms"))
      .filter(size(col("syms")) >= 2) // sequence(0,-1) would count DOWN
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => concat(element_at(col("syms"), i), lit(Sep),
          element_at(col("syms"), i + 1)))).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("pcnt"))

  /** Per-symbol occurrence counts of a (seg, cnt) table, weighted —
    * the denominator table of WordPiece's likelihood score. Same
    * bounded key space as [[pairCandidates]]. */
  def symbolCounts(seg: DataFrame): DataFrame =
    seg.select(explode(split(col("seg"), Sep)).as("sym"), col("cnt"))
      .groupBy("sym").agg(sum("cnt").as("c"))

  /** One merge applied to the whole segment column: both symbol
    * boundaries are anchored with zero-width guards
    * `(?<![^sep])...(?![^sep])` so a pair like (a,b) can never match the
    * tail of a LONGER symbol ("ta"·"b"), and — because the guards consume
    * no separator — back-to-back occurrences "a·b·a·b" merge in one
    * left-to-right pass, matching the trainers' greedy application
    * order. quoteReplacement: a merged symbol containing '$' or '\'
    * would otherwise be read as a group reference by Java's replaceAll
    * while the DuckDB twin's plain replace proceeds — the engines must
    * fail or succeed together. */
  def applyMerge(segCol: Column, l: String, r: String): Column = {
    val pat = "(?<![^" + Sep + "])" +
      java.util.regex.Pattern.quote(l + Sep + r) + "(?![^" + Sep + "])"
    regexp_replace(segCol, pat,
      java.util.regex.Matcher.quoteReplacement(l + r))
  }
}
