package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator family's `queries`/`oracleSql` maps:
  *  - [[graft.analytics.Relational]] — joins/aggs/windows/rollup/topk/
  *    set ops/JSON over the star schema (SURVEY.md §2.10).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RangeJoin.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ StreamingQueries.queries ++
      StoreQueries.queries ++ Pipeline.queries ++ LangId.queries ++ TextPrep.queries ++
      BpeTrain.queries ++ QualityModel.queries ++ Rag.queries ++ Pca.queries ++
      UnigramTrain.queries ++ Graph.queries ++ Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ RangeJoin.oracleSql ++ TextOps.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++
      StreamingQueries.oracleSql ++ Pipeline.oracleSql ++ LangId.oracleSql ++
      TextPrep.oracleSql ++ BpeTrain.oracleSql ++ QualityModel.oracleSql ++
      Rag.oracleSql ++ Pca.oracleSql ++ UnigramTrain.oracleSql ++ Layout.oracleSql ++
      StoreQueries.oracleSql ++ Graph.oracleSql
}
