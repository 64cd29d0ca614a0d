package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the operators compose:
  * quality gate → exact dedup (normalized-hash groupBy) →
  * deterministic sampling → per-language token budget accounting.
  * Every stage is a narrow/shuffle-once DataFrame op; the whole
  * pipeline is one Catalyst plan (single pass over the corpus plus one
  * aggregation shuffle), which is the shape that survives 100 TB.
  */
object Pipeline {

  def p01CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = split(trim(col("text")), "\\s+")
    val quality = docs
      .withColumn("n_tokens", size(t).cast("bigint"))
      .withColumn("ttr", size(array_distinct(t)).cast("double") / size(t))
      // quality gate: minimum length + lexical diversity
      .filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
    val deduped = quality
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withColumn("keep", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")) === 1)
      .filter(col("keep"))
    val sampled = deduped.filter(col("doc_id") % 5 =!= 0) // hold out 20%
    sampled.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("token_budget"),
           Det.avgDec9R(col("ttr"), 4).as("avg_ttr"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation_pipeline" -> p01CurationPipeline _,
  )

  val oracleSql: Map[String, String] = Map(
    "p01_curation_pipeline" ->
      """WITH q AS (
           SELECT doc_id, lang, text,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) n_tokens,
             CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')) ttr
           FROM documents),
         g AS (SELECT * FROM q WHERE n_tokens >= 20 AND ttr >= 0.3),
         d AS (SELECT *, row_number() OVER (
                 PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                 ORDER BY doc_id) rn
               FROM g),
         s AS (SELECT * FROM d WHERE rn = 1 AND doc_id % 5 <> 0)
         SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS token_budget,
           floor((CAST(sum(CAST((ttr) AS DECIMAL(18,9))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_ttr
         FROM s GROUP BY lang ORDER BY lang""",
  )
}
