package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BigramStats, BoundedTopK, BoundedTopKPayload, CharTrigrams, DoubleArrayDot, FrequentItems, GramHashes, MinHash64, SimHash64, TrigramCounts, WinnowFingerprints, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT array_dot(a, b), simhash64(tokens) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[DoubleArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "array_dot(a, b) takes two arguments")
        DoubleArrayDot(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64(tokens) takes one argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "word_shingles(text) takes one argument")
        WordShingles(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigrams].getName, "char_trigrams"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "char_trigrams(text) takes one argument")
        CharTrigrams(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash64"),
      new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "minhash64(shingles) takes one argument")
        MinHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 3,
          "winnow_fingerprints(text[, k, window])")
        if (children.length == 1) WinnowFingerprints(children.head, 25, 26)
        else {
          def intArg(e: Expression, name: String): Int = e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"winnow_fingerprints: $name must be an integer literal, got $other")
          }
          WinnowFingerprints(children.head,
            intArg(children(1), "k"), intArg(children(2), "window"))
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "top_k_by"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "top_k_by(score, id, k) takes three arguments")
        val k = children(2).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"top_k_by: k must be an integer literal, got $other")
        }
        BoundedTopK(children(0), children(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("top_k_with"),
      new ExpressionInfo(classOf[BoundedTopKPayload].getName, "top_k_with"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "top_k_with(score, id, payload, k) takes four arguments")
        val k = children(3).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"top_k_with: k must be an integer literal, got $other")
        }
        BoundedTopKPayload(children(0), children(1), children(2), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("frequent_items"),
      new ExpressionInfo(classOf[FrequentItems].getName, "frequent_items"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "frequent_items(item, k) takes two arguments")
        val k = children(1).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"frequent_items: k must be an integer literal, got $other")
        }
        FrequentItems(children(0), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("vector_moments"),
      new ExpressionInfo(classOf[graft.functions.VectorMoments].getName, "vector_moments"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "vector_moments(v) takes one argument")
        graft.functions.VectorMoments(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bigram_stats"),
      new ExpressionInfo(classOf[BigramStats].getName, "bigram_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "bigram_stats(text) takes one argument")
        BigramStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "gram_hashes(text, k) takes two arguments")
        val k = children(1).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"gram_hashes: k must be an integer literal, got $other")
        }
        GramHashes(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("trigram_counts"),
      new ExpressionInfo(classOf[TrigramCounts].getName, "trigram_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "trigram_counts(text) takes one argument")
        TrigramCounts(children.head)
      }))
  }
}
