package graft

import org.apache.spark.sql.functions._

/** Graph-shape laws for the PageRank loop (`TextOps.pageRankOnGraph`) on
  * graphs the fixture's near-dup pair set can't produce deterministically:
  * stars (hub dominance), symmetric positions (equal rank), dangling
  * nodes (mass evaporates but teleport floor holds), and conservation
  * (total rank never exceeds the injected mass). */
class PageRankSpec extends SparkSpec {

  private def rank(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.TextOps.pageRankOnGraph(
        nodes.toDF("doc_id"), pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: the hub outranks every leaf; leaves rank equally (symmetry)") {
    val pr = rank(Seq(0L, 1L, 2L, 3L, 4L), Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert(pr(0L) > pr(1L))
    assert(Set(pr(1L), pr(2L), pr(3L), pr(4L)).size == 1, "leaves are interchangeable")
  }

  test("dangling node keeps exactly the teleport floor; mass is conserved (never created)") {
    val scale = 1000000000000L
    val n = 4L
    val pr = rank(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (1L, 2L)))
    // node 3 has no edges: its rank is the teleport term alone
    assert(pr(3L) == (scale / n) * 15 / 100)
    // integer division only loses mass; total can never exceed the start
    assert(pr.values.sum <= scale)
    // and the chain's interior node (degree 2) outranks its endpoints
    assert(pr(1L) > pr(0L) && pr(1L) > pr(2L))
  }

  test("rank is invariant to node relabeling (arithmetic depends on structure only)") {
    val a = rank(Seq(0L, 1L, 2L), Seq((0L, 1L), (1L, 2L)))
    val b = rank(Seq(10L, 11L, 12L), Seq((10L, 11L), (11L, 12L)))
    assert(a(0L) == b(10L) && a(1L) == b(11L) && a(2L) == b(12L))
  }
}
