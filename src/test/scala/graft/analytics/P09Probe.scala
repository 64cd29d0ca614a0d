package graft.analytics

import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for p09's stages (not a spec). */
object P09Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.store.SparkTestSession.spark
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p09probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the session
    Tables.documents(spark, dir).count()
    Tables.embeddings(spark, dir).count()
    time("full p09 (1st)") { Rag.p09HybridRrf(spark, dir).count() }
    time("full p09 (2nd)") { Rag.p09HybridRrf(spark, dir).count() }
    val docs = Tables.documents(spark, dir)
    time("nDocs count") { docs.count() }
    val e = Dedup.normalizedVectors(spark, dir)
    val dense = time("dense build+count") {
      val d = Similarity.bruteTopK(e,
        e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm")),
        k = 5)
      d.count(); d
    }
    val toks = time("toks distinct+ckpt") {
      val t = docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("doc_id"), lower(col("tok")).as("term")).distinct()
        .localCheckpoint(true)
      t
    }
    val idf = time("idf count") {
      val i = toks.groupBy("term").agg(count(lit(1)).as("df"))
      println("vocab=" + i.count()); i
    }
    time("postings join+agg") {
      val qterms = toks.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("term")).join(idf, "term")
      broadcast(qterms).join(toks, "term")
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
