package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Character-trigram language identification, the classic n-gram
  * profile method (Cavnar–Trenkle style), as two DataFrame stages:
  *
  *  - [[fit]]: labeled corpus → per-language trigram profile (top-K
  *    grams with integer-scaled weights) — one explode pass whose
  *    (lang, gram) aggregation is map-side combined down to at most
  *    |langs| × |distinct grams| rows before the shuffle; the windowed
  *    top-K then runs over that small set. Output is broadcastable.
  *  - [[predict]]: a single narrow map over the corpus — the collected
  *    profile (|langs|×200 entries, IVF-centroid-sized) rides into each
  *    task inside the [[graft.functions.BestProfileLang]] expression,
  *    which walks a document's trigrams once and returns the argmax
  *    language per row. No occurrence explode, no join, no shuffle:
  *    the only post-scan exchange in t07 is the tiny confusion-matrix
  *    aggregation.
  *
  * Weights are exact integers — `w = (n · 10⁹) div total_lang` — so
  * scores are BIGINTs: partition-order-independent, tie-broken
  * deterministically on lang, and byte-identical in the DuckDB oracle
  * (double weights would make the argmax flip on summation order).
  * Caveat for >10⁹-gram single-language corpora: `n · 10⁹` needs
  * n < 9.2·10⁹ to stay in int64; normalize n per shard first if a
  * language's top-gram count can exceed that.
  *
  * Everything is built-in column functions — fit is one linear corpus
  * scan, predict is one linear scan + broadcast join, and neither
  * materializes a per-document gram bag, so the pipeline runs
  * unchanged at 100 TB.
  */
object LangId {

  private val ProfileSize = 200
  private val WeightScale = 1000000000L

  /** (gram column, one row per occurrence) for `docs`, keeping `keep`
    * columns alongside. Grams come from the single-pass
    * [[graft.functions.CharTrigrams]] expression (lowercase once per
    * document) — the declarative
    * `transform(sequence(...), i -> substring(_lc, i, 3))` chain it
    * replaces ran an interpreted lambda + start-anchored substring per
    * gram and dominated t07's runtime. */
  private def explodedGrams(docs: DataFrame, textCol: String, keep: Seq[Column]): DataFrame =
    docs.select(keep :+
      explode(graft.functions.CharTrigrams.char_trigrams(lower(col(textCol)))).as("gram"): _*)

  /** Per-language top-K trigram profile with integer-scaled weights:
    * (profile_lang, gram, weight: bigint). */
  def fit(docs: DataFrame, textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val grams = explodedGrams(docs, textCol, Seq(col(langCol).as("lang")))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
    // per-lang total as a window sum over the post-top-K set (tiny:
    // ≤ |langs|·K rows) — a `top.join(top.groupBy...)` self-join here
    // would evaluate the whole corpus-scale fit subtree twice
    val top = grams.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= ProfileSize)
      .withColumn("total", sum("n").over(Window.partitionBy("lang")))
    top.select(col("lang").as("profile_lang"), col("gram"),
      expr(s"(n * ${WeightScale}L) div total").as("weight"))
  }

  /** Collect a fitted profile to the driver as the per-row argmax
    * expression's inputs — langs ascending (tie-break order) and a
    * gram → (langIndex, weight) table. The profile is |langs| × K
    * rows (K=200), the same driver-side footprint class as the IVF
    * centroid set: safe to collect at any corpus scale. */
  private def collectProfile(profile: DataFrame): (Seq[String], Seq[(String, Seq[(Int, Long)])]) = {
    val rows = profile.select("profile_lang", "gram", "weight").collect()
    val langs = rows.map(_.getString(0)).distinct.sorted.toSeq
    val idx = langs.zipWithIndex.toMap
    val byGram = rows.groupBy(_.getString(1)).map { case (gram, rs) =>
      gram -> rs.map(r => (idx(r.getString(0)), r.getLong(2))).toSeq
    }.toSeq
    (langs, byGram)
  }

  /** Predict the language of each document against a fitted profile:
    * (idCol, predicted). Documents sharing no gram with any profile
    * produce no row (same contract as an inner join). Prediction is
    * one narrow map over the corpus via [[graft.functions.BestProfileLang]]
    * — the profile rides into tasks as expression state, so there is
    * no per-occurrence explode, no join, and no shuffle. */
  def predict(docs: DataFrame, profile: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val (langs, byGram) = collectProfile(profile)
    docs.select(col(idCol),
        graft.functions.BestProfileLang.best_profile_lang(
          lower(col(textCol)), langs, byGram).as("predicted"))
      .filter(col("predicted").isNotNull)
  }

  /** Gate query: fit on the labeled corpus, predict it back, report the
    * confusion matrix. Oracle-checked (integer scores, deterministic
    * lang-asc tie-break). */
  def t07NgramLangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (langs, byGram) = collectProfile(fit(docs))
    // carry the true label through the per-row argmax so no join-back
    // to `docs` is needed for the confusion matrix
    docs.select(col("lang"),
        graft.functions.BestProfileLang.best_profile_lang(
          lower(col("text")), langs, byGram).as("predicted"))
      .filter(col("predicted").isNotNull)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t07_ngram_langid" -> t07NgramLangId _,
  )

  /** DuckDB twin of t07: same trigram definition, same integer weight
    * scaling (`//` = `div`), same tie-breaks — hash-checkable. */
  val oracleSql: Map[String, String] = Map(
    "t07_ngram_langid" ->
      s"""WITH g AS (
            SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, length(lower(text)) - 2),
                                         i -> substring(lower(text), CAST(i AS INT), 3))) AS gram
            FROM documents WHERE length(lower(text)) >= 3),
          bylang AS (
            SELECT lang, gram, count(*) AS n FROM g GROUP BY lang, gram),
          top AS (
            SELECT * FROM (
              SELECT lang, gram, n,
                     row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram ASC) AS rnk
              FROM bylang) WHERE rnk <= $ProfileSize),
          profile AS (
            SELECT lang AS profile_lang, gram,
                   CAST(n * $WeightScale AS BIGINT) // CAST(total AS BIGINT) AS weight
            FROM top JOIN (SELECT lang, CAST(sum(n) AS BIGINT) AS total
                           FROM top GROUP BY lang) USING (lang)),
          scored AS (
            SELECT g.doc_id, g.lang, p.profile_lang,
                   CAST(sum(p.weight) AS BIGINT) AS score
            FROM g JOIN profile p USING (gram)
            GROUP BY g.doc_id, g.lang, p.profile_lang),
          best AS (
            SELECT doc_id, lang, profile_lang AS predicted,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, profile_lang ASC) AS rnk
            FROM scored)
         SELECT lang, predicted, count(*) AS n
         FROM best WHERE rnk = 1
         GROUP BY lang, predicted ORDER BY lang, predicted""",
  )
}
