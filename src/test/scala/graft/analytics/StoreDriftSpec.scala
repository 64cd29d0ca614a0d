package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** av06 contract: the replica audit diffs CLEAN right after a copy
  * (the gate's internal require fails loudly otherwise — canonical
  * JSON hashing makes backend formatting differences invisible), and
  * the three planted divergences come back as exactly three rows,
  * one per change type. */
class StoreDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("av06: clean copy, then exactly the planted drift rows") {
    val rows = StoreQueries.av06StoreDrift(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.size == 3, s"expected the 3 planted divergences, got $rows")
    assert(rows.map(_._2).sorted == Seq("added", "changed", "deleted"),
      s"change types wrong: $rows")
  }
}
