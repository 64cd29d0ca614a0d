package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Character-trigram language identification, the classic n-gram
  * profile method (Cavnar–Trenkle style), as two DataFrame stages:
  *
  *  - [[fit]]: labeled corpus → per-language trigram frequency profile
  *    (top-K grams, tf-normalized) — one groupBy + one windowed top-K,
  *    output small enough to broadcast.
  *  - [[predict]]: per-document trigram bag joined against the
  *    broadcast profiles, score = Σ tf_doc · w_lang, argmax per doc.
  *
  * Everything is built-in column functions — the fit scales linearly
  * in corpus size, and predict is a broadcast join, so the pipeline
  * runs unchanged at 100 TB.
  */
object LangId {

  private val ProfileSize = 200

  /** Sliding character trigrams of the lowercased text (substring with
    * a Column start position needs the SQL form). */
  private def trigramsExpr(textCol: String): Column =
    expr(s"transform(sequence(1, greatest(length(lower($textCol)) - 2, 0)), " +
      s"i -> substring(lower($textCol), i, 3))")

  /** Per-language top-K trigram profile with tf weights. */
  def fit(docs: DataFrame, textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val grams = docs.select(col(langCol).as("lang"),
        explode(trigramsExpr(textCol)).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
    val top = grams.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= ProfileSize)
    val totals = top.groupBy("lang").agg(sum("n").as("total"))
    top.join(totals, "lang")
      .select(col("lang").as("profile_lang"), col("gram"),
        (col("n").cast("double") / col("total")).as("weight"))
  }

  /** Predict the language of each document against a fitted profile. */
  def predict(docs: DataFrame, profile: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val docGrams = docs.select(col(idCol), explode(trigramsExpr(textCol)).as("gram"))
      .groupBy(idCol, "gram").agg(count(lit(1)).as("tf"))
    val scored = docGrams.join(broadcast(profile), Seq("gram"))
      .groupBy(col(idCol), col("profile_lang"))
      .agg(sum(col("tf") * col("weight")).as("score"))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("profile_lang").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col(idCol), col("profile_lang").as("predicted"))
  }

  /** Gate query: fit on the labeled corpus, predict it back, report the
    * confusion matrix. Rows-only (windowed float ranking). */
  def t07NgramLangId(spark: SparkSession, dir: String): DataFrame = {
    // materialize the exploded trigram bag once; fit and predict both
    // derive from it (one explode pass instead of two)
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"), col("lang"),
        explode(trigramsExpr("text")).as("gram"))
      .groupBy("doc_id", "lang", "gram").agg(count(lit(1)).as("tf"))
      .cache()

    val byLang = grams.groupBy("lang", "gram").agg(sum("tf").as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
    val top = byLang.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= ProfileSize)
    val totals = top.groupBy("lang").agg(sum("n").as("total"))
    val profile = top.join(totals, "lang")
      .select(col("lang").as("profile_lang"), col("gram"),
        (col("n").cast("double") / col("total")).as("weight"))

    val scored = grams.join(broadcast(profile), Seq("gram"))
      .groupBy(col("doc_id"), col("profile_lang"))
      .agg(sum(col("tf") * col("weight")).as("score"))
    val w2 = Window.partitionBy("doc_id").orderBy(col("score").desc, col("profile_lang").asc)
    scored.withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("profile_lang").as("predicted"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t07_ngram_langid" -> t07NgramLangId _,
  )
  val oracleSql: Map[String, String] = Map.empty
}
