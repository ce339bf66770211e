package graft

import org.apache.spark.sql.functions._
import graft.operators.{LlmOps, LlmTextOps}
import graft.ml.MlPipelines

class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val salad = new scala.util.Random(7)
  private val vocab = Vector("query", "engine", "scan", "join", "hash", "sort",
    "merge", "filter", "window", "batch", "stream", "vector", "table", "row")
  private def doc(n: Int): String = Seq.fill(n)(vocab(salad.nextInt(vocab.size))).mkString(" ")

  test("exact dedup groups constructed duplicates under one survivor") {
    val texts = Seq.tabulate(20)(i => (i.toLong, if (i < 2) "identical duplicate text" else doc(30)))
    val out = LlmOps.dedupExact(texts.toDF("doc_id", "text")).collect()
    val dupGroup = out.find(_.getAs[Long]("n_dups") > 1).get
    assert(dupGroup.getAs[Long]("survivor_id") == 0L && dupGroup.getAs[Long]("n_dups") == 2L)
    assert(out.map(_.getAs[Long]("n_dups")).sum == 20L)
  }

  test("span-dup profile flags exactly the planted cross-doc span") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"   // 8 words
    val docs = Seq(
      (1L, s"$shared uniqA uniqB"),            // spans: [shared], [bravo..uniqA], [charlie..uniqB]
      (2L, s"pre1 pre2 $shared post1"),        // contains shared at offset 2
      (3L, "nine distinct words that never repeat anywhere else okay")
    ).toDF("doc_id", "text")
    val got = LlmTextOps.spanDupProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (1L, 1L), 2L -> (1L, 1L)), s"got $got")
    // a span repeated at two positions of the SAME doc only is not cross-doc
    val selfRep = Seq((7L, s"$shared filler $shared")).toDF("doc_id", "text")
    assert(LlmTextOps.spanDupProfile(selfRep).collect().isEmpty)
    // ...but counts once per position when it IS also cross-doc
    val both = Seq((1L, s"$shared x $shared"), (2L, s"y $shared z")).toDF("doc_id", "text")
    val m = LlmTextOps.spanDupProfile(both).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (2L, 1L) && m(2L) == (1L, 1L), s"got $m")
  }

  test("substring dedup: planted boilerplate window, survivor policy, short docs") {
    // width 4 so the plant is compact; the graded key runs the same core
    // at SubstringWindow. boiler = exactly one window per occurrence.
    val boiler = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"u1 u2 $boiler u3"),        // 7 toks → 4 windows, boiler at pos 3
      (2L, s"$boiler v1 v2"),           // 6 toks → 3 windows, boiler at pos 1
      (3L, s"$boiler w $boiler"),       // within-doc repeat: boiler at pos 1 AND 6
      (4L, "s1 s2 s3")                  // shorter than the window → 0 windows
    ).toDF("doc_id", "text")
    val got = LlmTextOps.substringDedupProfile(docs, width = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // survivor of the boiler hash = min (doc_id, pos) = doc 1's occurrence,
    // so doc 1's duplicated window is NOT removable while every other is
    assert(got(1L) == ((4L, 1L, 0L, 0.25)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((3L, 1L, 1L, 0.333333)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((6L, 2L, 2L, 0.333333)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L, 0.0)), s"doc4: ${got(4L)}")
    // a repeat confined to ONE doc is still a duplicate here (the
    // within-doc boilerplate case llmSpanDup deliberately excludes),
    // and its first occurrence survives
    val self = Seq((9L, s"$boiler q $boiler")).toDF("doc_id", "text")
    val s9 = LlmTextOps.substringDedupProfile(self, width = 4).collect()(0)
    assert((s9.getLong(1), s9.getLong(2), s9.getLong(3)) == ((6L, 2L, 1L)), s"got $s9")
  }

  test("substring strip: cuts exactly the removable spans, survivor keeps its text") {
    val boiler = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"u1 u2 $boiler u3"),   // survivor occurrence (min doc_id): NOTHING cut
      (2L, s"$boiler v1 v2"),      // removable window at pos 1 → tokens 1-4 cut
      (3L, s"$boiler w $boiler"),  // pos 1 survives? no — survivor is doc 1, BOTH cut
      (4L, "s1 s2 s3")             // no windows → untouched
    ).toDF("doc_id", "text")
    val got = LlmTextOps.substringDedupStrip(docs, width = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((7L, 0L, s"u1 u2 $boiler u3")), s"doc1: ${got(1L)}")
    assert(got(2L) == ((6L, 4L, "v1 v2")), s"doc2: ${got(2L)}")
    // doc 3: windows at pos 1 AND pos 6 are both non-survivor dups →
    // tokens 1-4 and 6-9 cut, only the separator survives
    assert(got(3L) == ((9L, 8L, "w")), s"doc3: ${got(3L)}")
    assert(got(4L) == ((3L, 0L, "s1 s2 s3")), s"doc4: ${got(4L)}")
    // a doc that IS exactly one removable window strips to the empty string
    val all = Seq((1L, boiler), (9L, boiler)).toDF("doc_id", "text")
    val g9 = LlmTextOps.substringDedupStrip(all, width = 4).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(g9 == Map(1L -> boiler, 9L -> ""), s"got $g9")
  }

  test("incremental substring dedup: known vs batch-removable vs clean, per planted class") {
    val boiler = "b1 b2 b3 b4"            // lives in the EXISTING corpus
    val batchBlk = "c1 c2 c3 c4"          // duplicated only WITHIN the new batch
    val existing = Seq((1L, s"x1 $boiler x2"), (2L, "y1 y2 y3 y4 y5")).toDF("doc_id", "text")
    val fresh = Seq(
      (11L, s"n1 $boiler n2"),            // 6 toks → 3 windows, the boiler one KNOWN
      (12L, s"$batchBlk m1"),             // batch dup, survivor (min doc_id)
      (13L, s"m2 $batchBlk"),             // batch dup, removable
      (14L, "q1 q2 q3 q4 q5"),            // clean: 2 windows, nothing flagged
      (15L, "s1 s2")                      // shorter than the window: 0 windows
    ).toDF("doc_id", "text")
    val got = LlmTextOps.substringIncremental(existing, fresh, width = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(11L) == ((3L, 1L, 0L, 0.333333)), s"known: ${got(11L)}")
    assert(got(12L) == ((2L, 0L, 0L, 0.0)), s"batch survivor: ${got(12L)}")
    assert(got(13L) == ((2L, 0L, 1L, 0.5)), s"batch removable: ${got(13L)}")
    assert(got(14L) == ((2L, 0L, 0L, 0.0)), s"clean: ${got(14L)}")
    assert(got(15L) == ((0L, 0L, 0L, 0.0)), s"short: ${got(15L)}")
    // a window BOTH known and batch-duplicated counts as known only —
    // every batch occurrence is cut against the corpus, none survives
    val fresh2 = Seq((21L, s"$boiler z1"), (22L, s"z2 $boiler")).toDF("doc_id", "text")
    val g2 = incRows(existing, fresh2)
    assert(g2 == Map(21L -> ((2L, 1L, 0L, 0.5)), 22L -> ((2L, 1L, 0L, 0.5))), s"got $g2")
  }

  private def incRows(existing: org.apache.spark.sql.DataFrame,
                          fresh: org.apache.spark.sql.DataFrame) =
    LlmTextOps.substringIncremental(existing, fresh, width = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("incremental substring strip: corpus-known spans keep NO batch copy, batch dups keep one") {
    val boiler = "b1 b2 b3 b4"
    val batchBlk = "c1 c2 c3 c4"
    val existing = Seq((1L, s"x1 $boiler x2")).toDF("doc_id", "text")
    val fresh = Seq(
      (11L, s"n1 $boiler n2"),            // known span cut even though doc 11 is its batch-min
      (12L, s"$batchBlk m1"),             // batch survivor: keeps its copy
      (13L, s"m2 $batchBlk"),             // batch non-survivor: cut
      (14L, "q1 q2 q3 q4 q5"),            // clean
      (15L, "s1 s2")                      // shorter than the window
    ).toDF("doc_id", "text")
    val got = LlmTextOps.substringIncrementalStrip(existing, fresh, width = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(11L) == ((6L, 4L, "n1 n2")), s"known cut: ${got(11L)}")
    assert(got(12L) == ((5L, 0L, s"$batchBlk m1")), s"batch survivor: ${got(12L)}")
    assert(got(13L) == ((5L, 4L, "m2")), s"batch removable: ${got(13L)}")
    assert(got(14L) == ((5L, 0L, "q1 q2 q3 q4 q5")), s"clean: ${got(14L)}")
    assert(got(15L) == ((2L, 0L, "s1 s2")), s"short doc passes through: ${got(15L)}")
    // overlapping known+batch windows: both occurrences cut fully (the
    // corpus holds the surviving copy), partial overlap cuts the union
    val fresh2 = Seq((21L, s"$boiler z1"), (22L, s"z2 $boiler")).toDF("doc_id", "text")
    val g2 = LlmTextOps.substringIncrementalStrip(existing, fresh2, width = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(g2 == Map(21L -> ((4L, "z1")), 22L -> ((4L, "z2"))), s"got $g2")
  }

  test("ngram jaccard recalls a constructed near-duplicate pair") {
    val base = doc(40)
    val nearDup = base.split(" ").updated(5, "changedword").mkString(" ")
    val docs = (Seq((100L, base), (101L, nearDup)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(40)))).toDF("doc_id", "text")
    val pairs = LlmTextOps.ngramJaccard(docs, 0.5).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 100L && r.getAs[Long]("b_id") == 101L),
      s"expected (100,101) in ${pairs.mkString(",")}")
  }

  test("native HashedShingles bit-equals the SQL md5-prefix composition") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "δeλτa", "日本語", "x", "", "w1")
    val texts = Seq(
      "", "one", "one two", "one two three",
      "日本語 テスト 漢字 word mix here",
      "a b c d e f g h i j") ++
      Seq.fill(30)(Seq.fill(2 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    for (n <- Seq(3, 5, 8)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .withColumn("ws", split(col("text"), " "))
      val sqlForm = expr(
        s"transform(if(size(ws) >= $n, transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(ws, i, $n))), array()), " +
          "s -> cast(conv(substring(md5(cast(s as binary)), 1, 15), 16, 10) as bigint))")
      val rows = df.select(col("doc_id"),
          org.apache.spark.sql.graftnative.GraftNative.hashedShingles(col("ws"), n).as("native"),
          sqlForm.as("sql")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n doc=${r.getLong(0)}: native ${r.getSeq[Long](1)} != sql ${r.getSeq[Long](2)}")
      }
    }
  }

  test("containment flags an embedded copy that Jaccard misses") {
    // doc 200: a short "benchmark question"; doc 201: a long page QUOTING
    // it whole. Containment(inter/min) ≈ 1; Jaccard(inter/union) is small
    // because the page's own shingles dominate the union.
    val question = doc(12)
    val page = s"${doc(80)} $question ${doc(80)}"
    val docs = (Seq((200L, question), (201L, page)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(40)))).toDF("doc_id", "text")
    val sh = LlmTextOps.shingleIndex(docs)
    val cont = LlmTextOps.containmentPairs(sh, 0.6).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("cont")).toMap
    assert(cont.contains((200L, 201L)), s"embedded copy not flagged: ${cont.keys}")
    assert(cont((200L, 201L)) >= 0.9, s"containment ${cont((200L, 201L))} < 0.9")
    // the same pair sits BELOW a 0.5 Jaccard cut — the gap containment closes
    val jac = LlmTextOps.jaccardPairs(sh, 0.5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(!jac.contains((200L, 201L)), "Jaccard unexpectedly caught the embedded copy")
  }

  test("incremental near-dup pairs only ACROSS the existing/new split") {
    val base = doc(40)
    val nearDup = base.split(" ").updated(5, "changedword").mkString(" ")
    // 100 (existing) vs 108 (new) is a planted cross-split near-dup;
    // 100 vs 101 is a planted SAME-side (existing) near-dup that the
    // incremental pass must NOT report.
    val docs = (Seq((100L, base), (101L, nearDup), (108L, nearDup)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(40)))).toDF("doc_id", "text")
    val pairs = LlmTextOps.incrementalNearPairs(
        LlmTextOps.shingleIndex(docs), col("doc_id") % 10 >= 8, 0.5)
      .collect().map(r => (r.getAs[Long]("ex_id"), r.getAs[Long]("new_id")))
    assert(pairs.contains((100L, 108L)), s"expected (100,108) in ${pairs.mkString(",")}")
    assert(pairs.contains((101L, 108L)), s"expected (101,108) in ${pairs.mkString(",")}")
    assert(!pairs.exists { case (a, b) => b % 10 < 8 || a % 10 >= 8 },
      s"same-side pair leaked: ${pairs.mkString(",")}")
  }

  test("shingle ops are total on documents shorter than n words") {
    // Without the size(ws) >= n guard, sequence(1, size-n+1) counts DOWN
    // for short docs and slice(ws, 0, n) throws at runtime.
    val docs = (Seq((100L, "one two"), (101L, "single"), (102L, "")) ++
      Seq.tabulate(5)(i => (i.toLong, doc(12)))).toDF("doc_id", "text")
    val pairs = LlmTextOps.ngramJaccard(docs, 0.0).collect() // 3-gram path
    assert(!pairs.exists(r => r.getAs[Long]("a_id") >= 100L || r.getAs[Long]("b_id") >= 100L))
    val fps = LlmTextOps.fingerprint(docs).collect() // 5-gram path
    assert(fps.length == 8)
    fps.filter(_.getAs[Long]("doc_id") >= 100L).foreach(r => assert(r.getAs[String]("fp") == null))
    fps.filter(_.getAs[Long]("doc_id") < 100L).foreach(r => assert(r.getAs[String]("fp") != null))
  }

  test("both near-dup detectors find the planted fixture near-duplicates") {
    // the generator plants ~28 near-dup pairs (3-gram jaccard ≈ 0.99)
    val docs = Tables.load(spark, SF, "documents")
    val strong = LlmTextOps.ngramJaccard(docs, 0.8).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(strong.nonEmpty, "expected planted near-dup pairs in the fixture")
    val minhash = MlPipelines.nearDupMinhash(docs, 0.3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // LSH recall on jaccard≈0.99 pairs is ~certain with 5 hash tables
    val missed = strong -- minhash
    assert(missed.isEmpty, s"MinHashLSH missed strong pairs: $missed")
  }

  test("MinHashLSH recalls a constructed near-duplicate pair") {
    val base = doc(60)
    val nearDup = base.split(" ").updated(7, "zzz").mkString(" ")
    val docs = (Seq((100L, base), (101L, nearDup)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(60)))).toDF("doc_id", "text")
    val pairs = MlPipelines.nearDupMinhash(docs, 0.5).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 100L && r.getAs[Long]("b_id") == 101L),
      s"expected (100,101) in ${pairs.mkString(",")}")
  }

  test("portable MinHash LSH recalls constructed and planted near-dups") {
    import graft.operators.MinHashOps
    val base = doc(60)
    val nearDup = base.split(" ").updated(7, "zzz").mkString(" ")
    val docs = (Seq((100L, base), (101L, nearDup), (102L, base)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(60)))).toDF("doc_id", "text")
    val cands = MinHashOps.minhashCandidates(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Long]("n_bands")).toMap
    // identical docs agree on all 4 bands; a 1-word edit on all bands w.h.p.
    assert(cands.get((100L, 102L)).contains(4L), s"identical pair missing: $cands")
    assert(cands.contains((100L, 101L)), s"near-dup pair missing: $cands")
    // fixture: every strong n-gram-Jaccard pair must surface as a candidate
    val fixture = Tables.load(spark, SF, "documents")
    val strong = LlmTextOps.ngramJaccard(fixture, 0.9).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val recalled = MinHashOps.minhashCandidates(fixture).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert((strong -- recalled).isEmpty, s"LSH missed strong pairs: ${strong -- recalled}")
  }

  test("connected components: chains merge transitively, separate cliques stay apart") {
    import graft.operators.LlmTextOps
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a_id", "b_id")
    val comp = LlmTextOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L), s"got $comp")
  }

  test("connected components: a 60-node chain (diameter >> maxIter) converges via pointer jumping") {
    import graft.operators.LlmTextOps
    // plain min-propagation needs diameter(=59) rounds and would trip the
    // maxIter=20 require(); the jump step gives log-round convergence
    val edges = (1L until 60L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = LlmTextOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(comp.size == 60 && comp.values.forall(_ == 1L),
      s"chain split: ${comp.toSeq.sortBy(_._1).filter(_._2 != 1L).take(5)}")
  }

  test("dedup clusters agree with pairwise ground truth on the fixture") {
    import graft.operators.LlmTextOps
    val docs = Tables.load(spark, SF, "documents")
    val pairs = LlmTextOps.ngramJaccard(docs, 0.8).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val clusters = LlmTextOps.llmDedupClusters(spark, SF).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every paired doc lands in a cluster, paired docs share one
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is the component min — a real member, never synthetic
    clusters.values.foreach(c => assert(clusters(c) == c, s"survivor $c not self-labeled"))
    // the dedup product keeps exactly: all docs minus non-survivor members
    val survivors = LlmTextOps.llmDedupSurvivors(spark, SF).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val total = docs.count()
    val nonSurvivors = clusters.count { case (id, c) => id != c }
    assert(survivors.size == total - nonSurvivors)
    clusters.foreach { case (id, c) =>
      assert(survivors.contains(id) == (id == c), s"doc $id survivor status wrong")
    }
    // softweight: full corpus coverage; weight = r6(1/|cluster|) with
    // |cluster| from the SAME labeling, singletons at exactly 1.0
    val weights = LlmTextOps.llmDedupSoftweight(spark, SF).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(weights.size == total)
    val sizeOf = clusters.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    weights.foreach { case (id, (sz, w)) =>
      val wantSz = clusters.get(id).map(sizeOf).getOrElse(1L)
      assert(sz == wantSz, s"doc $id cluster size $sz != $wantSz")
      assert(w == math.floor(1.0 / wantSz * 1e6 + 0.5) / 1e6, s"doc $id weight $w")
      if (!clusters.contains(id)) assert(w == 1.0)
    }
  }

  test("llm_lang_confusion cells recount the lang-id frame; shares sum to 1 per language") {
    val pred = LlmTextOps.llmLangId(spark, SF).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")))
    val wantCells = pred.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rows = LlmTextOps.llmLangConfusion(spark, SF).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == wantCells)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) <= rs.length * 1e-6, s"$lang shares")
    }
  }

  test("ann_pair_recall measures LSH recall of the exact top-20 consistently") {
    val r = LlmTextOps.annPairRecall(spark, SF).head()
    assert(r.getLong(0) == 20L)
    val hits = r.getLong(1)
    assert(hits >= 0L && hits <= 20L)
    assert(r.getDouble(2) == math.floor(hits / 20.0 * 1e6 + 0.5) / 1e6)
    // cross-check against the graded frames: every truth pair colliding
    // in ANY of the 24 bands must be counted, none that doesn't
    val bands = graft.Tables.load(spark, SF, "embeddings")
      .select(col("vec_id"), graft.GraftFunctions.hyperplaneBands(col("embedding")).as("b"))
      .collect().map(r2 => r2.getAs[Number]("vec_id").longValue ->
        r2.getSeq[Int](1)).toMap
    val truth = graft.operators.LlmOps.llmCosineTopk(spark, SF).collect()
      .map(r2 => (r2.getAs[Number]("a_id").longValue, r2.getAs[Number]("b_id").longValue))
    val want = truth.count(p =>
      bands(p._1).zip(bands(p._2)).exists { case (x, y) => x == y }).toLong
    assert(hits == want, s"recall hits $hits != recomputed $want")
    // the round-10 done-bar: band-OR amplification must lift recall to
    // >= 0.8 (the single 16-bit table measured 0.05) — deterministic
    // integer buckets, so this is an equality-grade floor, not flaky
    assert(r.getDouble(2) >= 0.8, s"banded LSH recall ${r.getDouble(2)} < 0.8")
  }

  test("IVF recall family: multi-probe dominates single-probe; every hit set is consistent") {
    val single = LlmTextOps.annIvfRecall(spark, SF).head()
    val mp = LlmTextOps.annIvfRecallMp(spark, SF).head()
    assert(single.getLong(0) == 20L && mp.getLong(0) == 20L)
    // probe-1 IS the single-probe list, so the 3-probe hit set is a superset
    assert(mp.getLong(1) >= single.getLong(1),
      s"multi-probe recall ${mp.getLong(1)} < single-probe ${single.getLong(1)}")
    Seq(single, mp).foreach { r =>
      assert(r.getDouble(2) == math.floor(r.getLong(1) / 20.0 * 1e6 + 0.5) / 1e6)
    }
    // and the same dominance holds for the reported pair lists: every
    // single-probe top-20 pair at sim above the mp cut must be co-listed
    // there too (both candidate sets share the probe-1 list)
    val mpRows = LlmTextOps.annIvfTopk(spark, SF).collect()
    val mpPairs = mpRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val mpMinSim = mpRows.map(_.getDouble(2)).min
    LlmTextOps.annIvfTopkSp(spark, SF).collect()
      .filter(_.getDouble(2) > mpMinSim)
      .foreach { r =>
        assert(mpPairs((r.getLong(0), r.getLong(1))),
          s"single-probe pair (${r.getLong(0)}, ${r.getLong(1)}) above the mp cut is missing")
      }
  }

  test("filtered index serve: every neighbor passes the metadata predicate, a SUBSET of unfiltered candidates") {
    import org.apache.spark.sql.functions.col
    val rows = LlmTextOps.annIvfFilteredTopk(spark, SF).collect()
    assert(rows.nonEmpty)
    val en = graft.Tables.load(spark, SF, "documents")
      .filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(0) % 97 == 0, s"non-query q_id ${r.getLong(0)}")
      assert(en(r.getLong(2)),
        s"neighbor ${r.getLong(2)} fails the lang filter (q ${r.getLong(0)})")
    }
    // pre-filter semantics: the filtered serve never invents a candidate —
    // every (q, neighbor) it ranks must come from the UNFILTERED index
    // candidate set (probed inverted lists), i.e. the filter prunes the
    // index's candidates, it does not brute-force the allowed set
    val indexCands = LlmTextOps.indexCandidates(
        LlmTextOps.ivfAssignedMp(spark, SF), col("vec_id") % 97 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(indexCands((r.getLong(0), r.getLong(2))),
        s"(${r.getLong(0)}, ${r.getLong(2)}) is not an index candidate — " +
          "the filtered serve bypassed the index")
    }
  }

  test("index-served query top-k: neighbors share a probed list, sims match the scala kernel") {
    val served = LlmTextOps.annIvfQueryTopk(spark, SF).collect()
    assert(served.nonEmpty)
    val emb = graft.Tables.load(spark, SF, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    served.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(q % 97 == 0 && q != n)
      // independent value check via the bit-identical Scala kernels
      val want = BigDecimal(
        graft.functions.VectorFunctions.dotValue(emb(q), emb(n)) /
          (graft.functions.VectorFunctions.normValue(emb(q)) *
            graft.functions.VectorFunctions.normValue(emb(n))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"sim drift for ($q, $n)")
    }
    // per-query ranks are 1..k ordered by (sim desc, neighbor_id)
    served.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length), s"rank gap for $q")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) > b.getDouble(3) ||
          (a.getDouble(3) == b.getDouble(3) && a.getLong(2) < b.getLong(2)))
        case _ =>
      }
    }
  }

  test("minhash hot-bucket cap bounds fan-out without losing cold-bucket pairs") {
    import graft.operators.MinHashOps
    // 30 identical boilerplate docs -> one bucket of 30 in EVERY band
    // (30*29/2 = 435 pairs uncapped); plus one planted near-dup pair in
    // its own small buckets
    val boiler = doc(50)
    val base = doc(60)
    val nearDup = base.split(" ").updated(7, "zzz").mkString(" ")
    val docs = (Seq.tabulate(30)(i => (i.toLong, boiler)) ++
      Seq((100L, base), (101L, nearDup)) ++
      Seq.tabulate(10)(i => (200L + i, doc(60)))).toDF("doc_id", "text")
    val uncapped = MinHashOps.minhashCandidates(docs).collect()
    assert(uncapped.count(r => r.getAs[Long]("a_id") < 30L && r.getAs[Long]("b_id") < 30L) == 435)
    val capped = MinHashOps.minhashCandidates(docs, maxBucketSize = Some(10)).collect()
    // the hot bucket is dropped entirely...
    assert(!capped.exists(r => r.getAs[Long]("a_id") < 30L && r.getAs[Long]("b_id") < 30L),
      s"hot-bucket pairs survived the cap: ${capped.mkString(",")}")
    // ...while pairs from buckets under the cap are untouched
    assert(capped.exists(r => r.getAs[Long]("a_id") == 100L && r.getAs[Long]("b_id") == 101L),
      s"cold-bucket near-dup lost: ${capped.mkString(",")}")
  }

  test("stop-shingle cap bounds posting-list fan-out, keeps rare-shingle dups") {
    import graft.operators.LlmTextOps
    // 30 docs share ONE boilerplate shingle ("stop stop stop") but are
    // otherwise disjoint -> 435 candidate pairs, all from that posting;
    // plus a planted near-dup pair built from rare shingles only
    val base = doc(60)
    val nearDup = base.split(" ").updated(7, "zzz").mkString(" ")
    val docs = (Seq.tabulate(30)(i =>
        (i.toLong, s"stop stop stop u${i}a u${i}b u${i}c u${i}d")) ++
      Seq((100L, base), (101L, nearDup))).toDF("doc_id", "text")
    val sh = LlmTextOps.shingleIndex(docs)
    val uncapped = LlmTextOps.jaccardPairs(sh, 0.0).collect()
    assert(uncapped.count(r => r.getAs[Long]("a_id") < 30L && r.getAs[Long]("b_id") < 30L) == 435)
    val capped = LlmTextOps.jaccardPairs(sh, 0.0, maxPosting = 10).collect()
    assert(!capped.exists(r => r.getAs[Long]("a_id") < 30L && r.getAs[Long]("b_id") < 30L),
      s"stop-shingle pairs survived the cap: ${capped.mkString(",")}")
    val planted = capped.find(r => r.getAs[Long]("a_id") == 100L && r.getAs[Long]("b_id") == 101L)
    assert(planted.isDefined, s"rare-shingle near-dup lost: ${capped.mkString(",")}")
    assert(planted.get.getAs[Double]("jac") > 0.5)
  }

  test("cosine kernel: duplicate ids make no self-pairs, zero vectors never crash or match") {
    import graft.functions.VectorFunctions
    val df = Seq((1L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val all = VectorFunctions.cosinePairsKernel(spark, df, -2.0).collect()
    assert(!all.exists(r => r.getAs[Long]("a_id") == r.getAs[Long]("b_id")),
      s"self-pair emitted: ${all.mkString(",")}")
    // zero-norm sims are NaN; NaN >= minSim is false, so they are filtered
    assert(all.forall(r => !r.getAs[Double]("sim").isNaN))
    assert(all.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet ==
      Set((1L, 3L)), s"got ${all.mkString(",")}")
  }

  test("chunking covers every token with the configured stride/overlap") {
    val chunks = LlmTextOps.llmChunking(spark, SF).collect()
    val docs = Tables.load(spark, SF, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").length).toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every doc must chunk")
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // starts are 1, 25, 49, ... <= n -> floor((n-1)/24) + 1 chunks
      assert(sorted.length == (n - 1) / 24 + 1,
        s"doc $id: $n tokens -> ${sorted.length} chunks")
      // each chunk holds min(32, tokens remaining from its start)
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("n_tokens") == math.min(32, n - 24 * i), s"doc $id chunk $i")
      }
    }
  }

  test("cosine top-k pairs agree between brute force and rounded oracle semantics") {
    val topk = LlmOps.llmCosineTopk(spark, SF).collect()
    assert(topk.length == 20)
    val sims = topk.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("LSH ANN candidates are a subset of brute-force pairs with matching sims") {
    val ann = LlmTextOps.annLshTopk(spark, SF).collect()
    assert(ann.nonEmpty)
    // every reported pair must carry the exact brute-force cosine (same UDF)
    val brute = LlmOps.llmCosineTopk(spark, SF).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("sim")).toMap
    ann.foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      brute.get(key).foreach(s => assert(s == r.getAs[Double]("sim")))
    }
  }

  test("IVF ANN reports real pairs with exact brute-force sims") {
    val ivf = LlmTextOps.annIvfTopk(spark, SF).collect()
    assert(ivf.nonEmpty)
    val dup = LlmTextOps.llmDedupEmbedding(spark, SF).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("sim")).toMap
    // IVF pairs above the dedup threshold must carry identical sims
    ivf.filter(_.getAs[Double]("sim") >= 0.45).foreach { r =>
      val key = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(dup.get(key).contains(r.getAs[Double]("sim")), s"pair $key")
    }
  }

  test("banded simhash near-dup recalls a constructed near-duplicate pair") {
    val base = doc(60)
    val nearDup = base.split(" ").updated(9, "zzz").mkString(" ")
    val docs = (Seq((100L, base), (101L, nearDup)) ++
      Seq.tabulate(20)(i => (i.toLong, doc(60)))).toDF("doc_id", "text")
    val pairs = LlmTextOps.simhashNearDup(docs, maxHamming = 8).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 100L && r.getAs[Long]("b_id") == 101L),
      s"expected (100,101) in ${pairs.mkString(",")}")
    // identical docs must be at hamming 0
    val same = LlmTextOps.simhashNearDup(
      Seq((1L, base), (2L, base)).toDF("doc_id", "text"), 0).collect()
    assert(same.length == 1 && same.head.getAs[Int]("hamming") == 0)
  }

  test("native simhash64 expression bit-equals the plain-Scala sketch") {
    import org.apache.spark.sql.functions.{col, lower, split}
    val docs = Tables.load(spark, SF, "documents").limit(100)
    // tokenize with the SAME Spark expression the sketch op uses, so the
    // comparison isolates the hashing kernel (Spark's split keeps
    // leading/trailing empties differently from String.split)
    val expected = docs
      .select(col("doc_id"), split(lower(col("text")), "\\W+").as("toks")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        KernelPropertiesHelper.sketch(r.getAs[scala.collection.Seq[String]]("toks").toSeq)).toMap
    val got = LlmTextOps.simhashSketches(docs).select("doc_id", "sh64").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sh64")).toMap
    assert(got == expected)
  }

  test("simhash pairs: recall AND precision against ngram-jaccard ground truth") {
    // Ground truth: the fixture's planted near-dups (3-gram jaccard >= 0.8;
    // 0.5 and 0.8 thresholds select the SAME 28 pairs — the corpus has a
    // clean gap). Measured tradeoff at sf0.001 (this spec pins the graded
    // hamming<=3 operating point): h=3 -> recall .82 / precision 1.00;
    // h=6 -> .86/.44; h=8 -> .89/.15 — the small shared vocabulary makes
    // unrelated salads collide once the bar loosens.
    val docs = Tables.load(spark, SF, "documents")
    val truth = LlmTextOps.ngramJaccard(docs, 0.8).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(truth.nonEmpty)
    val simhash = LlmTextOps.simhashNearDup(docs).collect() // graded default h=3
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val recall = (truth & simhash).size.toDouble / truth.size
    assert(recall >= 0.75, s"recall $recall; missed ${truth -- simhash}")
    val precision = (simhash & truth).size.toDouble / math.max(simhash.size, 1)
    assert(precision >= 0.95, s"precision $precision; spurious ${simhash -- truth}")
  }

  test("simhash buckets conserve docs with only incidental collisions") {
    val out = LlmTextOps.llmDedupSimhash(spark, SF).collect()
    val total = Tables.load(spark, SF, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    // small-vocabulary salad collides a handful of 64-bit sketches; the
    // overwhelming majority of docs must still be unique.
    assert(out.length >= total * 0.97)
  }

  test("DataFrame connected components agree with GraphX on a random graph") {
    import spark.implicits._
    import org.apache.spark.graphx.Graph
    // seeded random graph: chains, cliques, and isolated pairs
    val rnd = new scala.util.Random(42)
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L)) ++
      Seq.fill(200)((rnd.nextInt(100) + 100L, rnd.nextInt(100) + 100L)))
      .filter { case (a, b) => a != b }
    val ours = LlmTextOps.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = Graph.fromEdgeTuples(spark.sparkContext.parallelize(edges), defaultValue = 0)
      .connectedComponents().vertices.collect().toMap
    // same convention: component label = min vertex id in the component
    assert(ours == gx.map { case (k, v) => (k: Long) -> (v: Long) },
      s"CC disagreement: ours=${ours.size} labels, graphx=${gx.size}")
  }

  test("custom ChunkWindows generator matches the built-in chunking composition row-for-row") {
    val viaUdtf = LlmTextOps.udtfChunkWindows(spark, SF).collect().map(_.toString)
    val viaComposition = LlmTextOps.llmChunking(spark, SF).collect().map(_.toString)
    assert(viaUdtf.toSeq == viaComposition.toSeq)
    // and it plans as ONE Generate operator with no sequence() explode
    val plan = LlmTextOps.udtfChunkWindows(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("graft_chunk_windows"), s"custom generator missing from plan:\n$plan")
    assert(!plan.contains("sequence("), s"start-array composition leaked into the UDTF plan:\n$plan")
    // degenerate inputs: empty token array -> one empty window; null -> no rows
    import spark.implicits._
    val edge = Seq((1L, Array.empty[String]), (2L, null.asInstanceOf[Array[String]]))
      .toDF("doc_id", "ws")
      .select(col("doc_id"), GraftFunctions.chunkWindows(col("ws"), 32, 24))
      .collect()
    assert(edge.length == 1 && edge(0).getLong(0) == 1L &&
      edge(0).getInt(1) == 0 && edge(0).getString(2) == "" && edge(0).getInt(3) == 0)
  }
}
