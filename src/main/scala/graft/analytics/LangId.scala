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
  *  - [[predict]]: raw exploded trigram *occurrences* broadcast-hash-
  *    joined against the profile (no per-doc tf shuffle — each
  *    occurrence contributes its gram weight once, so the join stream
  *    IS the tf·w product), aggregated to (doc × lang) partial scores
  *    (map-side combined, so the only shuffle is ~|docs|·|langs| rows),
  *    argmax per doc via a `min_by` hash aggregation — no sort, no
  *    window.
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

  /** Sliding character trigrams over a column that is ALREADY
    * lowercased (lowercase once per document in a prior projection —
    * `lower()` inside the transform lambda would re-run per trigram,
    * O(len²) per doc). Texts shorter than 3 chars yield no grams —
    * guarded explicitly because Spark's `sequence(1, 0)` counts *down*
    * ([1, 0]) rather than returning empty like DuckDB's
    * generate_series. (substring with a Column start position needs
    * the SQL form.) */
  private def trigramsOfLowered(lcCol: String): Column =
    expr(s"CASE WHEN length($lcCol) >= 3 THEN " +
      s"transform(sequence(1, length($lcCol) - 2), i -> substring($lcCol, i, 3)) " +
      "ELSE array() END")

  /** (gram column, one row per occurrence) for `docs`, keeping
    * `keep` columns alongside. */
  private def explodedGrams(docs: DataFrame, textCol: String, keep: Seq[Column]): DataFrame =
    docs.select(keep :+ lower(col(textCol)).as("_lc"): _*)
      .select(keep :+ explode(trigramsOfLowered("_lc")).as("gram"): _*)

  /** Per-language top-K trigram profile with integer-scaled weights:
    * (profile_lang, gram, weight: bigint). */
  def fit(docs: DataFrame, textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val grams = explodedGrams(docs, textCol, Seq(col(langCol).as("lang")))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
    val top = grams.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= ProfileSize)
    val totals = top.groupBy("lang").agg(sum("n").as("total"))
    top.join(totals, "lang")
      .select(col("lang").as("profile_lang"), col("gram"),
        expr(s"(n * ${WeightScale}L) div total").as("weight"))
  }

  /** Predict the language of each document against a fitted profile:
    * (idCol, predicted). Documents sharing no gram with any profile
    * produce no row (same contract as an inner join). */
  def predict(docs: DataFrame, profile: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val occ = explodedGrams(docs, textCol, Seq(col(idCol)))
    scoreByLang(occ, profile, Seq(idCol))
      .groupBy(col(idCol))
      .agg(min_by(col("profile_lang"),
        struct((-col("score")).as("neg"), col("profile_lang"))).as("predicted"))
  }

  /** (id, lang-score) scoring stage shared by predict paths:
    * Σ weight over gram occurrences, per (id, profile_lang). */
  private def scoreByLang(occ: DataFrame, profile: DataFrame, keyCols: Seq[String]): DataFrame =
    occ.join(broadcast(profile), Seq("gram"))
      .groupBy(keyCols.map(col) :+ col("profile_lang"): _*)
      .agg(sum("weight").as("score"))

  /** Gate query: fit on the labeled corpus, predict it back, report the
    * confusion matrix. Oracle-checked (integer scores, deterministic
    * lang-asc tie-break). */
  def t07NgramLangId(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val profile = fit(docs)

    // carry the true label through the scoring pass so no join-back to
    // `docs` is needed for the confusion matrix
    val occ = explodedGrams(docs, "text", Seq(col("doc_id"), col("lang")))
    val scored = scoreByLang(occ, profile, Seq("doc_id", "lang"))
    scored
      .groupBy("doc_id", "lang")
      .agg(min_by(col("profile_lang"),
        struct((-col("score")).as("neg"), col("profile_lang"))).as("predicted"))
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
                   unnest(list_transform(generate_series(1, length(text) - 2),
                                         i -> substring(lower(text), CAST(i AS INT), 3))) AS gram
            FROM documents WHERE length(text) >= 3),
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
