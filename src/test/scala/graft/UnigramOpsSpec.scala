package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.{GraftNative, UnigramSegment}
import graft.operators.UnigramOps

/** The unigram-LM tokenizer family (llm_unigram_train / llm_unigram_encode):
  * kernel determinism, coverage/totality, tie-break contract, and the
  * train/encode consistency the two graded keys rely on. The cross-engine
  * value checks live in the DuckDB oracles; these tests pin the properties
  * the oracles can't see (codegen parity, off-domain UNK fallback).
  */
class UnigramOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(w: String, vocab: Map[String, Long]): Seq[String] = {
    val (ps, ss) = vocab.toSeq.sortBy(_._1).unzip
    Seq(w).toDF("w")
      .select(GraftNative.unigramSegment(col("w"), ps, ss, UnigramOps.LMax).as("p"))
      .collect().head.getSeq[String](0)
  }

  test("viterbi picks the higher-likelihood split, not greedy-longest") {
    // 'abcd': greedy-longest takes 'abcd' (one piece, score -10); the
    // two-piece 'ab'+'cd' path scores -4 + -4 = -8 > -10, so Viterbi
    // must prefer it — the exact property that separates unigram-LM
    // segmentation from longest-match dictionary tokenization
    val v = Map("abcd" -> -10L, "ab" -> -4L, "cd" -> -4L,
      "a" -> -20L, "b" -> -20L, "c" -> -20L, "d" -> -20L)
    assert(seg("abcd", v) == Seq("ab", "cd"))
  }

  test("tie-break: equal path scores choose the longest final piece") {
    // both 'ab'+'c' and 'a'+'bc' score -6; the kernel's ascending-start
    // strict-> loop keeps the SMALLEST final-piece start (longest final
    // piece), i.e. 'a'+'bc' — the oracle's (sc DESC, i ASC) pick
    val v = Map("ab" -> -3L, "c" -> -3L, "a" -> -3L, "bc" -> -3L, "b" -> -50L)
    assert(seg("abc", v) == Seq("a", "bc"))
  }

  test("out-of-vocabulary characters fall back to UNK single-char pieces") {
    val v = Map("a" -> -2L, "b" -> -2L)
    assert(seg("axb", v) == Seq("a", "x", "b")) // 'x' not in vocab
    assert(seg("", v) == Seq.empty)
  }

  test("off-domain non-BMP chars UNK as whole codepoints, never surrogate halves") {
    // U+1D11E is a surrogate PAIR in UTF-16; a unit-wise UNK would emit
    // two lone-surrogate pieces whose UTF8String bytes are invalid UTF-8
    val v = Map("a" -> -2L, "b" -> -2L)
    assert(seg("a𝄞b", v) == Seq("a", "𝄞", "b"))
    assert(seg("𝄞", v) == Seq("𝄞"))
  }

  test("kernel parity: interpreted eval == codegen for every corpus word") {
    val words = Tables.load(spark, SF, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1).distinct()
    val (vocab, _) = UnigramOps.unigramCore(spark, SF)
    val (ps, ss) = vocab.map(t => (t._1, t._3)).sortBy(_._1).unzip
    val df = words.select(col("w"),
      GraftNative.unigramSegment(col("w"), ps, ss, UnigramOps.LMax).as("p"))
    def run(): Map[String, Seq[String]] =
      df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(run() == gen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // and every segmentation concatenates back to its word (coverage)
    gen.foreach { case (w, pieces) => assert(pieces.mkString == w, w) }
  }

  test("trained vocab: all corpus single chars present, counts consistent") {
    val (vocab, _) = UnigramOps.unigramCore(spark, SF)
    val pieces = vocab.map(_._1).toSet
    val chars = Tables.load(spark, SF, "documents")
      .select(explode(split(regexp_replace(col("text"), " ", ""), "")).as("c"))
      .filter(length(col("c")) === 1).distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces), s"missing single chars: ${chars -- pieces}")
    assert(vocab.size <= UnigramOps.TopMulti + chars.size)
    // the E-step counts come from the ROUND-2 segmentation (under the
    // round-1 scores) while encode segments under the FINAL scores, so
    // Σcounts == encode-total is NOT an invariant. What is: encode's
    // token total equals an independent Viterbi pass under the final
    // scores over the word histogram.
    val (ps, ss) = vocab.map(t => (t._1, t._3)).sortBy(_._1).unzip
    val expected = Tables.load(spark, SF, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .select(size(GraftNative.unigramSegment(col("w"), ps, ss,
        UnigramOps.LMax)).cast("long").as("ntok"))
      .agg(sum("ntok")).collect().head.getLong(0)
    val enc = UnigramOps.llmUnigramEncode(spark, SF)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    assert(expected == enc,
      s"final-score Viterbi total $expected != encode token total $enc")
  }

  test("prune keeps coverage and the highest-usage multis, rescored over the pruned vocab") {
    val full = UnigramOps.unigramCore(spark, SF)._1
    val pruned = UnigramOps.llmUnigramPrune(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val fullMap = full.map(t => t._1 -> t._2).toMap
    // subset of the trained vocab, counts unchanged
    pruned.foreach { case (p, c, _) => assert(fullMap.get(p).contains(c), p) }
    // every single char survives (coverage guarantee); multis capped
    val singles = full.filter(_._1.length == 1).map(_._1).toSet
    assert(pruned.map(_._1).toSet.filter(_.length == 1) == singles)
    assert(pruned.count(_._1.length > 1) ==
      math.min(UnigramOps.PruneMulti, full.count(_._1.length > 1)))
    // kept multis are exactly the top-count ones
    val keptMultis = pruned.filter(_._1.length > 1).map(_._1).toSet
    val expected = full.filter(_._1.length > 1)
      .sortBy(t => (-t._2, t._1)).take(UnigramOps.PruneMulti).map(_._1).toSet
    assert(keptMultis == expected)
    // rescoring is a proper smoothed distribution over the PRUNED vocab:
    // Σ exp(score) ≈ 1 (scores are rounded millionth-nats)
    val mass = pruned.map(t => math.exp(t._3 / 1e6)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"pruned model mass $mass")
  }

  test("unigram fertility is a real tokenizer: multi-char pieces get used") {
    val enc = UnigramOps.llmUnigramEncode(spark, SF)
      .agg((sum("n_chars") / sum("n_tokens")).as("f")).collect().head.getDouble(0)
    assert(enc > 1.0, s"fertility $enc — degenerate single-char segmentation")
    // and never below 1: a piece is at least one char
    assert(enc <= UnigramOps.LMax.toDouble)
  }

  test("UnigramSegment stays inside whole-stage codegen") {
    // over a real scan — a local literal row constant-folds the whole
    // projection into a LocalTableScan with no codegen span to find
    val df = Tables.load(spark, SF, "documents")
      .select(GraftNative.unigramSegment(
        split(col("text"), " ").getItem(0),
        Seq("a", "b", "c"), Seq(-1L, -1L, -1L), 4).as("p"))
    val hasSpan = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasSpan, s"no codegen span in:\n${df.queryExecution.executedPlan}")
  }
}
