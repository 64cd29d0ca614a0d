package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.store.SparkTestSession

/** The bounded top-k aggregate must agree bit-for-bit with the full
  * sort it replaces, independent of partitioning, and bound its
  * map-side state (the property that makes the exchange query-sized
  * instead of corpus-sized). */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def expected(rows: Seq[(Long, Double, Long)], k: Int): Map[Long, Seq[(Long, Double)]] =
    rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._3, r._2)).sortBy { case (id, s) => (-s, id) }.take(k)).toMap

  private def run(rows: Seq[(Long, Double, Long)], k: Int, parts: Int): Map[Long, Seq[(Long, Double)]] = {
    import spark.implicits._
    val df = rows.toDF("g", "score", "id").repartition(parts)
    df.groupBy("g").agg(BoundedTopK.top_k_by(col("score"), col("id"), k).as("top"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Row](1).map(e => (e.getLong(0), e.getDouble(1)))
      }.toMap
  }

  test("matches a full sort + take(k) for every group, any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (rnd.nextInt(7).toLong, math.rint(rnd.nextDouble() * 100) / 10, i.toLong)
    }
    val want = expected(rows, 10)
    assert(run(rows, 10, 1) == want, "single partition diverges")
    assert(run(rows, 10, 32) == want, "32 partitions diverge")
  }

  test("ties break by id ascending, deterministically") {
    val rows = Seq.tabulate(100)(i => (1L, 5.0, (100 - i).toLong)) ++
      Seq((1L, 9.0, 50L))
    val got = run(rows, 3, 8)(1L)
    assert(got == Seq((50L, 9.0), (1L, 5.0), (2L, 5.0)))
  }

  test("groups smaller than k return all their rows; nulls are skipped") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), 7L), (1L, None, 8L), (2L, Some(1.0), 9L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(BoundedTopK.top_k_by(col("score"), col("id"), 10).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Row](1).map(_.getLong(0))).toMap
    assert(got(1L) == Seq(7L) && got(2L) == Seq(9L))
  }

  test("top_k_with carries exact payloads (decimal + count) through rank") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, BigDecimal("10.01"), 3L),
      ("a", 2L, BigDecimal("10.02"), 5L),
      ("a", 3L, BigDecimal("10.02"), 1L),
      ("b", 9L, BigDecimal("-4.50"), 2L)
    ).toDF("g", "id", "dec", "n").repartition(8)
    val got = df.groupBy("g")
      .agg(BoundedTopK.top_k_with(col("dec").cast("double"), col("id"),
        struct(col("dec"), col("n")), 2).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.id"), col("t.payload.dec"), col("t.payload.n"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString, r.getLong(3)))
    // score desc, tie on id asc; payload decimals survive bit-exact
    assert(got.toSeq == Seq(
      ("a", 2L, "10.02", 5L), ("a", 3L, "10.02", 1L), ("b", 9L, "-4.5", 2L)))
  }

  test("top_k_with payloads never alias under many rows per partition") {
    import spark.implicits._
    // thousands of rows per partition exercise the projection-buffer
    // reuse path: each surviving entry's payload must still match ITS
    // id, not the last row the task projected
    val df = spark.range(0, 20000, 1, 4)
      .select((col("id") % 7).as("g"), col("id"),
        (col("id").cast("double") * 0.5).as("score"),
        concat(lit("p"), col("id")).as("tag"))
    val got = df.groupBy("g")
      .agg(BoundedTopK.top_k_with(col("score"), col("id"), col("tag"), 3).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), col("t.payload"))
      .collect()
    assert(got.length == 21)
    got.foreach { r =>
      assert(r.getString(1) == s"p${r.getLong(0)}",
        s"payload aliased: id=${r.getLong(0)} tag=${r.getString(1)}")
    }
  }

  test("q12 via top_k_with equals the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val agg = graft.analytics.Relational.q12TopUsersPerType(spark, dir)
      .collect().map(_.toSeq).toSeq
    val e = graft.analytics.Tables.events(spark, dir)
    val perUser = e.groupBy(col("event_type"), col("user_id"))
      .agg(graft.analytics.Det.sumDec(col("value")).as("total_value"), count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("total_value").desc, col("user_id").asc)
    val win = perUser.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk").cast("bigint").as("rnk"), col("user_id"),
        graft.analytics.Det.dround(col("total_value"), 2).as("total_value"), col("n"))
      .orderBy("event_type", "rnk")
      .collect().map(_.toSeq).toSeq
    assert(agg == win)
  }

  test("buffer stays bounded: serialized partial state is <= k entries") {
    val buf = new TopKBuffer(5)
    (1 to 100000).foreach(i => buf.add(i.toDouble, i.toLong))
    import org.apache.spark.sql.GraftColumnShim.{expression => ex}
    val agg = BoundedTopK(ex(lit(0.0)), ex(lit(0L)), 5)
    val bytes = agg.serialize(buf)
    assert(bytes.length <= 4 + 5 * 16, s"partial state is ${bytes.length} bytes")
    val back = agg.deserialize(bytes).sortedTop()
    assert(back.map(_._2).toSeq == Seq(100000L, 99999L, 99998L, 99997L, 99996L))
  }
}
