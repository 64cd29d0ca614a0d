package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** st26: streamed kNN-graph maintenance — the per-batch
  * maintain-against-current-snapshot loop must COMPOSE to the one-shot
  * batch result (g07), which GraphSpec already pins to the full
  * rebuild. The load-bearing property is the inductive one: after
  * every microbatch the stored edges are the exact graph of the stored
  * corpus, so slicing the diff cannot move the final graph. */
class StreamKnnSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("streamed kNN maintenance equals the g07 batch loop") {
    val streamed = StreamingQueries.st26StreamKnnMaintain(spark, dir)
    val batch = Graph.g07IncrementalKnn(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed kNN maintainer drifted from the batch loop")
  }
}
