package graft

import org.apache.spark.sql.functions.col
import graft.operators.GraphOps

/** Constructed-graph tests for the fixed-iteration weighted PageRank —
  * these exercise GraphOps.pageRank (the exact graded loop) on graphs
  * small enough to verify by hand-run recurrence. */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference implementation: the same recurrence in plain Scala. */
  private def prScala(edges: Seq[(String, String, Double)], iters: Int,
                      d: Double = GraphOps.Damping): Map[String, Double] = {
    val wout = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => pr(u) * w / wout(u) }.sum
      }
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("pageRank matches the plain-Scala recurrence on a weighted triangle") {
    // asymmetric weights so the answer is NOT uniform
    val raw = Seq(("a", "b", 3.0), ("b", "c", 1.0), ("c", "a", 2.0),
      ("b", "a", 1.0), ("a", "c", 1.0))
    val sym = raw ++ raw.map { case (u, v, w) => (v, u, w) }
    val got = GraphOps.pageRank(sym.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = prScala(sym, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"node $k: $v vs ${want(k)}")
    }
    // symmetrized graph with a stochastic transition matrix: ranks are a
    // distribution (total mass conserved, no dangling leak)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass: ${got.values.sum}")
  }

  test("pageRank keeps sink and in-degree-0 nodes on a directed graph") {
    // 1 -> 2: node 2 is a sink, node 1 has no in-edges. The first draft
    // (nodes from src only, inner join per round) returned an EMPTY
    // frame by round 2; the contract now is GraphX-style un-normalized
    // ranks: every node keeps a row, sink mass is not redistributed.
    val edges = Seq(("1", "2", 1.0))
    val got = GraphOps.pageRank(edges.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = prScala(edges, 5)
    assert(got.keySet == Set("1", "2"), s"nodes dropped: ${got.keySet}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"node $k: $v vs ${want(k)}")
    }
    // node 1 receives nothing: its rank is the bare teleport term
    assert(math.abs(got("1") - (1 - GraphOps.Damping) / 2) < 1e-12)
  }

  test("khopReach walks exactly k hops on a constructed chain") {
    // chain a-b-c-d-e, symmetrized; from a: 1 hop → {b}, 2 → {b,c}, 3 → {b,c,d}
    val raw = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("seed")
    def reached(k: Int): Set[String] =
      GraphOps.khopReach(edges, seeds, k).where(col("id") =!= col("seed"))
        .collect().map(_.getString(1)).toSet
    assert(reached(1) == Set("b"))
    assert(reached(2) == Set("b", "c"))
    assert(reached(3) == Set("b", "c", "d"))
    // two seeds keep separate reach sets: from d, 1 hop → {c, e}
    val two = GraphOps.khopReach(edges, Seq("a", "d").toDF("seed"), 1)
      .where(col("id") =!= col("seed")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(two == Set("a" -> "b", "d" -> "c", "d" -> "e"))
  }

  test("triangleCount on oriented edges counts each triangle once") {
    // triangles (1,2,3) and (2,3,4); (4,5) is a dangling edge
    val eb = Seq((1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)).toDF("p1", "p2")
    assert(GraphOps.triangleCount(eb).collect().head.getLong(0) == 2L)
    // no false positive on a triangle-free square
    val square = Seq((1, 2), (2, 3), (3, 4), (1, 4)).toDF("p1", "p2")
    assert(GraphOps.triangleCount(square).collect().head.getLong(0) == 0L)
  }

  test("triangleCount matches a plain-Scala count on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 12
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val eSet = edges.toSet
      val want = (for {
        a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
        if eSet((a, b)) && eSet((b, c)) && eSet((a, c))
      } yield 1).size.toLong
      val got = GraphOps.triangleCount(edges.toDF("p1", "p2"))
        .collect().head.getLong(0)
      assert(got == want, s"edges=$edges: $got vs $want")
    }
  }

  test("copurchase top-k plans TakeOrderedAndProject and keeps p1 < p2") {
    val df = GraphOps.graphCopurchaseTopk(spark, SF)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-100 should be a bounded-heap take, not a global sort")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // counts arrive non-increasing under the (n desc, p1, p2) total order
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
  }

  test("graded khop: every 100th customer reaches a nonempty 2-hop set") {
    val rows = GraphOps.graphKhop(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).startsWith("c:"))
      assert(r.getString(0).stripPrefix("c:").toLong % 100 == 0)
      assert(r.getLong(1) > 0)
    }
  }

  test("graded purchase-network ranks form a distribution over c:/s: nodes") {
    val rows = GraphOps.graphPagerank(spark, SF).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(rows.nonEmpty)
    assert(rows.forall { case (id, _) => id.startsWith("c:") || id.startsWith("s:") })
    assert(rows.forall(_._2 > 0.0))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3, // 6 dp rounding per node
      s"mass: ${rows.map(_._2).sum}")
    // suppliers aggregate many customers' mass: every supplier outranks
    // the (uniform-ish) customer floor on this bipartite graph
    val sMin = rows.filter(_._1.startsWith("s:")).map(_._2).min
    val cMax = rows.filter(_._1.startsWith("c:")).map(_._2).max
    assert(sMin > cMax, s"supplier floor $sMin vs customer ceiling $cMax")
  }

  test("graded component census: node/edge totals tie out against the edge table") {
    val census = GraphOps.graphComponents(spark, SF).collect()
    // INDEPENDENT rebuild of the co-purchase edge table with DIFFERENT
    // mechanics (plain-Scala per-order pair expansion over collected
    // rows, not a Spark self-join): using partPairs alone would make
    // the census tie-out circular, and a rebuild that copies the
    // self-join formulation line-for-line would reproduce any defect in
    // it — this derivation shares only the SEMANTICS (count row pairs
    // per order, p1 < p2, threshold 2)
    val li = Tables.load(spark, SF, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).values.foreach { rows =>
      val parts = rows.map(_._2)
      for (i <- parts.indices; j <- parts.indices
           if parts(i) < parts(j))
        pairCounts((parts(i), parts(j))) =
          pairCounts.getOrElse((parts(i), parts(j)), 0L) + 1L
    }
    val rebuilt = pairCounts.filter(_._2 >= 2).keySet.toSet
    // the exposed kernel must agree with the independent rebuild...
    val edges = GraphOps.partPairs(spark, SF)
      .filter(col("n_cooccur") >= 2)
      .select("p1", "p2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSet == rebuilt, "partPairs drifted from the reference pair expansion")
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    assert(census.map(_.getAs[Long]("n_nodes")).sum == nodes.length)
    assert(census.map(_.getAs[Long]("n_edges")).sum == edges.length)
    // each component id is a member node, and components partition nodes
    census.foreach(r => assert(nodes.contains(r.getAs[Long]("component_id"))))
    // plain-Scala union-find agrees with the distributed labeling
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = nodes.groupBy(find).map { case (root, ms) =>
      ms.min -> ms.length.toLong // canonical id is the min member
    }
    val got = census.map(r =>
      r.getAs[Long]("component_id") -> r.getAs[Long]("n_nodes")).toMap
    assert(got == expect)
  }

  test("basket affinity matches a distinct-basket replay; rules are well-formed") {
    val dpk = Tables.load(spark, SF, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = dpk.map(_._1).distinct.length.toLong
    val byBasket = dpk.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val np = dpk.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nab = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byBasket.values.foreach { pks =>
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        nab((pks(i), pks(j))) = nab.getOrElse((pks(i), pks(j)), 0L) + 1L
    }
    val rules = nab.toSeq.filter(_._2 >= 2).map { case ((a, b), ab) =>
      val lift = math.floor(ab * n / (np(a) * np(b)).toDouble * 1000000.0 + 0.5) / 1000000.0
      val conf = math.floor(ab.toDouble / np(a).toDouble * 1000000.0 + 0.5) / 1000000.0
      (a, b, ab, np(a), np(b), lift, conf)
    }
    val want = rules.sortBy { case (a, b, _, _, _, l, _) => (-l, a, b) }.take(25)
    val got = GraphOps.basketAffinity(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == want, s"got ${got.take(2)}... want ${want.take(2)}...")
    got.foreach { case (a, b, ab, na, nb2, lift, conf) =>
      assert(a < b && ab >= 2 && ab <= math.min(na, nb2))
      assert(conf > 0.0 && conf <= 1.0 && lift > 0.0)
    }
  }

  test("jaccard link prediction matches a neighbor-set replay; no existing edges") {
    val edges = GraphOps.partPairs(spark, SF)
      .filter(col("n_cooccur") >= 2).select("p1", "p2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs: Map[Long, Set[Long]] = (edges.map(e => e._1 -> e._2) ++
      edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val existing = edges.toSet
    val cands = for {
      (a, na) <- nbrs.toSeq; (b, nb2) <- nbrs.toSeq
      if a < b && !existing.contains((a, b))
      common = (na & nb2).size if common > 0
    } yield {
      val j = math.floor(common.toDouble / (na.size + nb2.size - common).toDouble
        * 1000000.0 + 0.5) / 1000000.0
      (a, b, common.toLong, na.size.toLong, nb2.size.toLong, j)
    }
    val want = cands.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(50)
    val got = GraphOps.graphJaccardNeighbors(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    got.foreach { case (a, b, common, da, db2, j) =>
      assert(!existing.contains((a, b))) // predicts only ABSENT links
      assert(j > 0.0 && j <= 1.0 && common <= math.min(da, db2))
    }
  }
}
