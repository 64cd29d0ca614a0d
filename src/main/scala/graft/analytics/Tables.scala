package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided star schema (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. All reads go
  * through `spark.read.parquet` so Catalyst gets parquet column pruning
  * and predicate pushdown for free; at cluster scale these paths would
  * be directories of many files and nothing here changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** The events table is written with TIMESTAMP(NANOS) which Spark's
    * vectorized parquet reader rejects; read nanos as long (legacy
    * conf) and truncate to microseconds — the same ns→us truncation
    * DuckDB applies, so oracle comparisons line up. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
