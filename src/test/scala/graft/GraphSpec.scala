package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Link-graph analytics: PageRank and degree statistics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: closed-form one and two iterations on a 3-node chain") {
    // a -> b -> c; outdeg(a)=outdeg(b)=1, c dangling
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iterations = 1, damping = 0.5)
      .orderBy("node").collect().map(r => r.getString(0) -> r.getDouble(1))
    // rank'(v) = 0.5 + 0.5 * sum(in): a gets nothing; b,c get 1.0/1
    assert(r1.toSeq == Seq("a" -> 0.5, "b" -> 1.0, "c" -> 1.0))
    val r2 = Graph.pageRank(edges, iterations = 2, damping = 0.5)
      .orderBy("node").collect().map(r => r.getString(0) -> r.getDouble(1))
    // iter2: b <- a(0.5) -> 0.75; c <- b(1.0) -> 1.0; dangling mass decays
    assert(r2.toSeq == Seq("a" -> 0.5, "b" -> 0.75, "c" -> 1.0))
  }

  test("pageRank: multi-edges collapse, self-loops count, outdegree " +
    "splits mass") {
    // a -> {b, c} (duplicate a->b collapses); s self-loop only
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("s", "s"))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 1, damping = 0.5)
      .orderBy("node").collect().map(r => r.getString(0) -> r.getDouble(1))
    // b and c each get rank(a)/2 = 0.5 -> 0.75; s feeds itself 1.0
    assert(got.toSeq ==
      Seq("a" -> 0.5, "b" -> 0.75, "c" -> 0.75, "s" -> 1.0))
  }

  test("degreeStats: distinct edges, zero-filled missing side") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"))
      .toDF("src", "dst")
    val got = Graph.degreeStats(edges).orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L)))
  }

  test("hitsScores: two exact-integer rounds match the hand trace; " +
    "multi-edges collapse; fractions are of the round maxima") {
    // 1 -> 2, 1 -> 3, 2 -> 3 (plus a duplicate 1 -> 2 that must collapse)
    // r1: auth = indeg = (0,1,2); hub = (3,2,0)
    // r2: auth = (0,3,5); hub = (8,5,0)
    val edges = Seq(("1", "2"), ("1", "2"), ("1", "3"), ("2", "3"))
      .toDF("src", "dst")
    val got = Graph.hitsScores(edges, iterations = 2).orderBy("node")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(("1", 0L, 8L, 0.0, 1.0),
      ("2", 3L, 5L, 3.0 / 5, 5.0 / 8),
      ("3", 5L, 0L, 1.0, 0.0)))
  }

  test("pageRank plan: the per-iteration join keys the node id — no " +
    "cartesian, no payload columns (distributed path forced)") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val plan = Graph.pageRank(edges, iterations = 1, damping = 0.5,
        driverMaxEdges = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in PageRank plan:\n$plan")
  }

  test("driver fast path == distributed loop: pageRank, hitsScores, " +
    "topoLevels on a graph with cycles, danglers and multi-edges") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
      ("c", "a"), ("d", "d"), ("e", "a"), ("b", "e"),
      ("x", "y"), ("y", "x")).toDF("src", "dst")
    def cmp(drv: org.apache.spark.sql.DataFrame,
            dst: org.apache.spark.sql.DataFrame): Unit = {
      val a = drv.orderBy("node").collect().map(_.toSeq).toSeq
      val b = dst.orderBy("node").collect().map(_.toSeq).toSeq
      assert(a == b, s"driver:\n$a\ndistributed:\n$b")
    }
    cmp(Graph.pageRank(edges, iterations = 3, damping = 0.5),
      Graph.pageRank(edges, iterations = 3, damping = 0.5,
        driverMaxEdges = 0))
    cmp(Graph.hitsScores(edges, iterations = 2),
      Graph.hitsScores(edges, iterations = 2, driverMaxEdges = 0))
    cmp(Graph.topoLevels(edges, iterations = 4),
      Graph.topoLevels(edges, iterations = 4, driverMaxEdges = 0))
    // long-typed node ids route through the numeric ordering
    val ledges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L))
      .toDF("src", "dst")
    cmp(Graph.topoLevels(ledges, iterations = 3),
      Graph.topoLevels(ledges, iterations = 3, driverMaxEdges = 0))
  }

  test("driver fast path == distributed loop: bradleyTerryFromCounts " +
    "(sorted-opponent fold, zero-win models, missing wins rows)") {
    import graft.ops.Chat
    val matches = Seq(
      ("m1", "m2", "m1"), ("m1", "m2", "m1"), ("m1", "m2", "m2"),
      ("m2", "m3", "m2"), ("m3", "m1", "m1"), ("m3", "m4", "m3"),
      ("m4", "m1", "m4")).toDF("model_a", "model_b", "winner")
    val a = Chat.bradleyTerry(matches, iterations = 2)
      .orderBy("model").collect().map(_.toSeq).toSeq
    // distributed: force via driverMaxPairs = 0 through FromCounts
    val m = matches.select(col("model_a").as("a"), col("model_b").as("b"),
      col("winner").as("w"))
    val nm = m.select(col("a").as("i"), col("b").as("j"))
      .union(m.select(col("b").as("i"), col("a").as("j")))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val wins = m.groupBy(col("w").as("model"))
      .agg(count(lit(1)).as("wins"))
    val b = Chat.bradleyTerryFromCounts(nm, wins, iterations = 2,
        driverMaxPairs = 0)
      .orderBy("model").collect().map(_.toSeq).toSeq
    assert(a == b, s"driver:\n$a\ndistributed:\n$b")
  }
}
