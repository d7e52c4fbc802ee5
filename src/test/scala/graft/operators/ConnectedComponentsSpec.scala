package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chain, triangle, and singleton resolve to min-id clusters") {
    // components: {1,2,3,4,5} chain, {10,11,12} triangle, {20} singleton
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("zero edges short-circuit to identity labels") {
    val nodes = Seq(7L, 8L, 9L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("isolated nodes stay identity; propagation runs on participants only") {
    // 2 participants among 5 nodes — isolated nodes must come back as
    // their own cluster via the final rejoin, not ride the loop
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((4L, 5L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("dense route: isolated node and unknown-id edges still resolve") {
    // 3 of 4 nodes touch an edge AND the caller supplied the node count
    // → the adaptive probe takes the full-node path (no rejoin pass).
    // The isolated node must still be identity (it rides the loop at
    // its fixpoint), and an edge naming an unknown id must still
    // influence nothing.
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 77L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges, nodesCount = Some(4L))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // without a supplied count the probe must NOT pay a corpus-sized
    // nodes.count(): the sparse path runs and resolves identically
    val sparse = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(sparse == got)
  }

  test("edges naming unknown ids influence nothing") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((90L, 91L)).toDF("a", "b") // neither endpoint known
    val got = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("long chain converges within the log-bounded iteration budget") {
    val n = 200L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges, maxIter = 12)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L), "path compression failed to converge")
  }
}
