package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** SQL users get the custom expressions via SparkSessionExtensions
  * (the shared test session is built with `new GraftExtensions`). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("array_dot and simhash64 are callable from SQL") {
    val spark = SparkTestSession.spark
    val dot = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(dot == 11.0)
    val fp = spark.sql("SELECT simhash64(array('a', 'b', 'c')) AS f").head().getLong(0)
    val fp2 = spark.sql("SELECT simhash64(array('a', 'b', 'c')) AS f").head().getLong(0)
    assert(fp == fp2)
  }

  test("shingle/trigram/winnow expressions are callable from SQL") {
    val spark = SparkTestSession.spark
    val sh = spark.sql(
      "SELECT word_shingles('a b c d') AS s").head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val tg = spark.sql("SELECT char_trigrams('abcd') AS t").head().getSeq[String](0)
    assert(tg == Seq("abc", "bcd"))
    // default (k=25, w=26) and explicit-literal forms agree
    val text = ("x" * 30) + " shared passage body here"
    val a = spark.sql(s"SELECT winnow_fingerprints('$text') AS f").head().getSeq[Long](0)
    val b = spark.sql(s"SELECT winnow_fingerprints('$text', 25, 26) AS f").head().getSeq[Long](0)
    assert(a.nonEmpty && a == b)
  }

  test("top_k_by is callable from SQL as a grouped aggregate") {
    val spark = SparkTestSession.spark
    val top = spark.sql(
      """SELECT g, top_k_by(s, id, 2) AS top FROM VALUES
           (1, 0.5d, 10L), (1, 0.9d, 11L), (1, 0.7d, 12L),
           (2, 0.1d, 20L)
         AS t(g, s, id) GROUP BY g ORDER BY g""").collect()
    assert(top(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(11L, 12L))
    assert(top(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(20L))
    val withPayload = spark.sql(
      """SELECT top_k_with(s, id, name, 1) AS top FROM VALUES
           (0.5d, 10L, 'low'), (0.9d, 11L, 'high')
         AS t(s, id, name)""").head().getSeq[org.apache.spark.sql.Row](0)
    assert(withPayload.map(r => (r.getLong(0), r.getString(2))) == Seq((11L, "high")))
  }

  test("frequent_items is callable from SQL as a grouped aggregate") {
    val spark = SparkTestSession.spark
    val hh = spark.sql(
      """SELECT frequent_items(item, 2) AS hh FROM VALUES
           ('a'), ('a'), ('a'), ('b'), ('a'), ('c'), ('a')
         AS t(item)""").head().getSeq[org.apache.spark.sql.Row](0)
    // 'a' has 5 of 7 occurrences — far above N/3, guaranteed present
    // and ranked first
    assert(hh.nonEmpty && hh.head.getString(0) == "a")
    assert(hh.head.getLong(1) <= 5L && 5L <= hh.head.getLong(1) + 7L / 3L)
  }

  test("vector_moments is callable from SQL and rejects non-double arrays") {
    val spark = SparkTestSession.spark
    val buf = spark.sql(
      """SELECT vector_moments(v) AS m FROM VALUES
           (array(cast(1.0 as double), cast(2.0 as double))),
           (array(cast(3.0 as double), cast(4.0 as double)))
         AS t(v)""").head().getSeq[Double](0)
    // layout [d, n, s0, s1, g00, g01, g11]
    assert(buf == Seq(2.0, 2.0, 4.0, 6.0, 10.0, 14.0, 20.0))
    val err = intercept[Exception] {
      spark.sql("SELECT vector_moments(array('x')) FROM VALUES (1) AS t(i)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>")
      || err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("gram_hashes and trigram_counts are callable from SQL") {
    val spark = SparkTestSession.spark
    // two equal 4-grams ('abcd' at 1 and 6) hash equal; the middle ones differ
    val gh = spark.sql("SELECT gram_hashes('abcdeabcd', 4) AS g").head().getSeq[Long](0)
    assert(gh.length == 6 && gh(0) == gh(5) && gh.distinct.length == 5)
    val tc = spark.sql("SELECT trigram_counts('abcabc') AS t").head().getMap[String, Long](0)
    assert(tc == Map("abc" -> 2L, "bca" -> 1L, "cab" -> 1L))
  }

  test("bigram_stats is callable from SQL with exact counts") {
    val spark = SparkTestSession.spark
    val r = spark.sql("SELECT bigram_stats('a b a b c') AS s").head().getStruct(0)
    // 5 tokens, 3 distinct, 4 bigrams, top bigram 'a b' appears twice
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((5, 3, 4, 2)))
    // boundary cases: single token and empty-after-trim text
    val one = spark.sql("SELECT bigram_stats('solo') AS s").head().getStruct(0)
    assert((one.getInt(0), one.getInt(2), one.getInt(3)) == ((1, 0, 0)))
  }
}
