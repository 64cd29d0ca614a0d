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
}
