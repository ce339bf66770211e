package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmTextOps, UnigramOps, WordPieceOps}

/** WordPiece trainer/encoder invariants: the likelihood argmax (the ONE
  * thing that separates it from BPE), the greedy longest-match-first
  * encode walk, and the corpus-economics output contract shared with the
  * other two tokenizer families. */
class WordPieceOpsSpec extends SparkTestBase {

  private def greedy(w: String, vocab: Seq[String]): Long =
    spark.range(1)
      .select(WordPieceOps.greedyNtok(lit(w), vocab).as("n"))
      .collect()(0).getLong(0)

  test("greedy encode: longest match wins at every cursor position") {
    val vocab = Seq("a", "b", "c", "ab", "abc")
    // "abc" beats "ab" beats "a" at pos 1; the remainder re-greedies
    assert(greedy("abcab", vocab) == 2)   // abc · ab
    assert(greedy("cabc", vocab) == 2)    // c · abc ("cab" not in vocab)
    assert(greedy("ababc", vocab) == 2)   // ab · abc (greedy ab first, NOT a·babc)
    assert(greedy("a", vocab) == 1)
    assert(greedy("ccc", vocab) == 3)     // singles only
  }

  test("greedy encode: out-of-vocabulary char advances 1 and counts 1 (UNK)") {
    val vocab = Seq("a", "b", "ab")
    assert(greedy("zab", vocab) == 2)     // z(UNK) · ab
    assert(greedy("azb", vocab) == 3)     // a · z(UNK) · b
    assert(greedy("zzz", vocab) == 3)
  }

  test("greedy encode matches a plain-Scala walk on 300 seeded-random words") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(12345)
    val alpha = "abcde"
    def rword(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val vocab = (alpha.map(_.toString) ++ Seq.fill(12)(rword(2 + rnd.nextInt(3)))).distinct
    // a 'z' tail exercises the UNK advance (z is not in the vocab)
    val words = Seq.fill(300)(rword(1 + rnd.nextInt(10))) ++
      Seq("zab", "az", "zzz")
    val maxLen = vocab.map(_.length).max
    def scalaGreedy(w: String): Long = {
      var pos = 0; var n = 0L
      while (pos < w.length) {
        val l = (math.min(maxLen, w.length - pos) to 1 by -1)
          .find(k => vocab.contains(w.substring(pos, pos + k))).getOrElse(1)
        pos += l; n += 1
      }
      n
    }
    val got = words.distinct.toDF("w")
      .select(col("w"), WordPieceOps.greedyNtok(col("w"), vocab).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (w, n) =>
      assert(n == scalaGreedy(w), s"word '$w': kernel $n vs scala ${scalaGreedy(w)}")
    }
  }

  test("trainer argmax is the likelihood score, not raw pair frequency") {
    // crafted corpus: pair (a,a) is the FREQUENCY winner (100 occurrences,
    // but 'a' is everywhere so its likelihood is diluted); pair (x,y) is
    // rare (5) but x and y occur ONLY together, so its likelihood
    // pcnt/(cl·cr) = 5/25 dwarfs (a,a)'s 100/(250·250). BPE must take
    // (a,a) — ties with (b,b) broken by pair text — and WordPiece (x,y).
    val dir = java.nio.file.Files.createTempDirectory("graft_wp").toString
    import spark.implicits._
    val words = Seq.fill(100)("aa") ++ Seq.fill(100)("bb") ++
      Seq.fill(50)("ab") ++ Seq.fill(5)("xy")
    Seq((1L, words.mkString(" ")))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val wp = WordPieceOps.llmWordpieceTrain(spark, dir).collect()
    assert(wp(0).getAs[String]("merged") == "xy",
      s"wordpiece round 1 took ${wp(0)}")
    assert(wp(0).getAs[Long]("cnt") == 5L)
    // score = floor(1e9 * 5 / (5 * 5)) = 2e8
    assert(wp(0).getAs[Long]("score") == 200000000L)
    val bpe = LlmTextOps.llmBpeTrain(spark, dir).collect()
    assert(bpe(0).getAs[String]("merged") == "aa",
      s"bpe round 1 took ${bpe(0)}")
  }

  test("train output contract: 8 rounds, merged = left||right, positive scores") {
    val m = WordPieceOps.llmWordpieceTrain(spark, SF).collect()
    assert(m.length == WordPieceOps.Rounds)
    assert(m.map(_.getAs[Int]("round")).toSeq == (1 to WordPieceOps.Rounds))
    m.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("cnt") > 0 && r.getAs[Long]("score") > 0)
    }
  }

  test("encode economics: total over the corpus, tokens within [words, chars]") {
    val docs = Tables.load(spark, SF, "documents")
    val enc = WordPieceOps.llmWordpieceEncode(spark, SF)
    assert(enc.count() == docs.count()) // every document encodes
    val bad = enc.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_chars") ||
      col("fertility") < 1.0).count()
    assert(bad == 0)
    // the trained merges actually fire: tokens strictly under chars
    val compressed = enc.filter(col("n_tokens") < col("n_chars")).count()
    assert(compressed > 0, "no merge ever applied — vocab is chars-only")
  }

  test("three-family compare carries each family's own encode numbers") {
    val cmp = UnigramOps.llmTokenizerCompare(spark, SF).collect()
    val wp = WordPieceOps.llmWordpieceEncode(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cmp.nonEmpty && cmp.length == wp.size)
    cmp.foreach { r =>
      assert(r.getAs[Long]("wp_tokens") == wp(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} wp tokens drifted")
    }
  }
}
