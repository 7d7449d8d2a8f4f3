package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDF(es: (Long, Long)*) = es.toDF("src", "dst")

  test("uniform cycle: symmetry fixes every rank at the same value") {
    val m = 6
    val pr = Graph.pageRank(
      edgeDF((0 until m).map(i => (i.toLong, ((i + 1) % m).toLong)): _*),
      iters = 10).collect()
    assert(pr.length == m)
    val vals = pr.map(_.getDouble(1)).distinct
    assert(vals.length == 1, s"cycle ranks must all agree, got ${vals.toSeq}")
    // total mass conserved (no dangling nodes): sums to ~1
    assert(math.abs(pr.map(_.getDouble(1)).sum - 1.0) < 1e-6)
  }

  test("star: the hub collecting every spoke's rank dominates") {
    // spokes 1..5 -> hub 0; hub -> 1 keeps the graph dangling-free.
    // 25 iterations: the hub<->fed-spoke 2-cycle oscillates with decay
    // 0.7225 per round trip, past the fixed-point gap from ~iter 13 on
    val pr = Graph.pageRank(
        edgeDF((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (0L, 1L)),
        iters = 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0) > pr(1), "hub must outrank the fed spoke")
    for (i <- 2L to 5L)
      assert(pr(1) > pr(i), "the hub-fed spoke outranks teleport-only ones")
    assert(pr(2) == pr(3) && pr(3) == pr(4) && pr(4) == pr(5),
      "symmetric spokes tie exactly (quantized integer sums)")
  }

  test("parallel edges contribute once each (multigraph convention)") {
    // doubling 1->0 doubles 1's outdeg but also its contribution count:
    // identical ranks to the single-edge graph
    val single = Graph.pageRank(edgeDF((1L, 0L), (0L, 1L)), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val double = Graph.pageRank(
        edgeDF((1L, 0L), (1L, 0L), (0L, 1L), (0L, 1L)), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(single == double)
  }

  test("deterministic across runs and partitionings") {
    val es = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 1) % 40)))
    val a = Graph.pageRank(edgeDF(es: _*), iters = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = Graph.pageRank(edgeDF(es: _*).repartition(7), iters = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(b),
      "quantized long sums must make ranks partitioning-independent")
  }

  test("regime boundary law: driver and join paths rank identically") {
    // 50 nodes, 100 edges — force each regime via the limit knob
    val es = (0L until 50L).flatMap(i =>
      Seq((i, (i * 11 + 2) % 50), (i, (i * 17 + 5) % 50)))
    val driver = Graph.pageRank(edgeDF(es: _*), iters = 7,
        driverNodeLimit = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val join = Graph.pageRank(edgeDF(es: _*), iters = 7,
        driverNodeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(driver.sameElements(join),
      "quantized integer sums must make both regimes bit-identical")
  }

  test("local-tier law: the zero-jobs-per-iteration driver loop ranks " +
      "identically to the treeAggregate tier and the join regime") {
    val es = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 60), (i, (i * 13 + 1) % 60), (i, (i + 1) % 60)))
    def run(nodeLim: Long, edgeLim: Long) =
      Graph.pageRank(edgeDF(es: _*), iters = 6,
          driverNodeLimit = nodeLim, localEdgeLimit = edgeLim)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val local = run(Long.MaxValue, Long.MaxValue) // driver + local tier
    val tree = run(Long.MaxValue, 0L)             // driver + treeAggregate
    val join = run(0L, Long.MaxValue)             // join regime
    assert(local.sameElements(tree),
      "local tier must be bit-identical to the treeAggregate tier")
    assert(local.sameElements(join),
      "local tier must be bit-identical to the join regime")
  }

  test("dangling sink: mass leaks but ranking stays sensible") {
    // 1 and 2 both feed 0; 0 has no out-edges (dangling)
    val pr = Graph.pageRank(edgeDF((1L, 0L), (2L, 0L)), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0) > pr(1) && pr(1) == pr(2))
    assert(pr.values.sum < 1.0, "dangling hub forwards nothing: mass leaks")
  }

  test("guards: empty edges and bad damping are rejected") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(edgeDF(), iters = 1).collect()
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edgeDF((0L, 1L)), damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edgeDF((0L, 1L)), iters = 0)
    }
  }
}
