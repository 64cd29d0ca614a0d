package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Misra–Gries aggregate: the sketch guarantee must hold under any
  * partitioning — every item above the N/(k+1) threshold present,
  * every estimate within [true − N/(k+1), true]. The summary's exact
  * contents MAY differ across partitionings (inherent to MG); the
  * guarantee may not. */
class FreqItemsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import FrequentItems.frequent_items

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("item").repartition(parts)
      .groupBy().agg(frequent_items(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
  }

  test("hand case: a majority item survives any partitioning with a tight estimate") {
    // 60 of 100 items are "hot"; k = 4 → threshold N/5 = 20
    // deterministic adversarial interleave: cold items arrive between
    // hot runs so the eviction path is exercised
    val items = (0 until 40).flatMap(i => Seq("hot", s"cold$i")) ++ Seq.fill(20)("hot")
    for (parts <- Seq(1, 7)) {
      val sk = sketchOf(items, 4, parts)
      assert(sk.contains("hot"), s"majority item evicted at parts=$parts")
      val est = sk("hot")
      assert(est <= 60 && 60 <= est + 20,
        s"estimate $est outside [40, 60] at parts=$parts")
      assert(sk.size <= 4, "summary exceeded its counter budget")
    }
  }

  test("fixture corpus: the MG guarantee holds vs exact counts at 1 and 16 partitions") {
    val toks = graft.analytics.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(trim(col("text")), "\\s+")).as("item"))
    val exact = toks.groupBy("item").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = exact.values.sum
    val k = 32
    val err = n / (k + 1)
    val heavy = exact.filter(_._2 > err).keySet
    assert(heavy.nonEmpty, "fixture has no heavy hitters — test is vacuous")
    for (parts <- Seq(1, 16)) {
      val sk = toks.repartition(parts)
        .groupBy().agg(frequent_items(col("item"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(sk.size <= k)
      assert(heavy.subsetOf(sk.keySet),
        s"missing heavy hitters at parts=$parts: ${heavy -- sk.keySet}")
      sk.foreach { case (item, est) =>
        val t = exact.getOrElse(item, 0L)
        assert(est <= t && t <= est + err,
          s"estimate $est for '$item' (true $t) outside bounds at parts=$parts")
      }
    }
  }

  test("non-string items are coerced at analysis time, not CCE'd at runtime") {
    import spark.implicits._
    // ImplicitCastInputTypes: an int column is cast to string during
    // analysis — previously this ClassCastException'd inside update().
    val sk = Seq(7, 7, 7, 9).toDF("item")
      .groupBy().agg(frequent_items(col("item"), 4).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sk == Map("7" -> 3L, "9" -> 1L))
  }

  test("null items are skipped, empty input yields an empty summary") {
    import spark.implicits._
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .groupBy().agg(frequent_items(col("item"), 2).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sk == Map("a" -> 2L))
    val empty = Seq.empty[String].toDF("item")
      .groupBy().agg(frequent_items(col("item"), 2).as("hh"))
      .select(size(col("hh"))).head().getInt(0)
    assert(empty == 0)
  }
}
