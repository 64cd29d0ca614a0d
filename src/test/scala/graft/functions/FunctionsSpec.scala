package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import VectorFunctions._

  test("array_dot matches the higher-order-function fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(16)(rnd.nextDouble()), Seq.fill(16)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      array_dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("array_dot interpreted eval equals codegen result") {
    val e = DoubleArrayDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(4.0, 5.0, 6.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 32.0)
  }

  test("as_double_array equals the plain array cast bit-for-bit") {
    // pins the doc claim on as_double_array: the HOF spelling is a
    // plan-shape choice (projection boundary), not a semantic one
    val rnd = new scala.util.Random(29)
    val vecs: Seq[Seq[Float]] =
      Seq.fill(40)(Seq.fill(8)(rnd.nextFloat() * 100 - 50)) ++
        Seq(Seq(0.1f, -0.0f, Float.MinPositiveValue), Seq.empty[Float])
    val df = vecs.toDF("v")
    val got = df.select(
      as_double_array(col("v")).as("fast"),
      col("v").cast("array<double>").as("slow")).collect()
    got.foreach { r =>
      val fast = r.getSeq[Double](0).map(java.lang.Double.doubleToLongBits)
      val slow = r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)
      assert(fast == slow)
    }
  }

  test("int8_dequantize matches the quantize HOF chain bit-for-bit") {
    val rnd = new scala.util.Random(13)
    val vecs: Seq[Seq[Double]] =
      Seq.fill(60)(Seq.fill(16)(rnd.nextDouble() * 8 - 4)) ++ Seq(
        Seq.fill(16)(0.0),                    // zero vector → zero codes
        Seq(-3.5, 0.0, 127.0, -127.0),        // max at a negative component
        Seq(1e-300, -1e-300, 5e-300, 0.0),    // denormal-adjacent scales
        Seq(42.0))                            // single element
    val df = vecs.toDF("v")
    // the s18 chain this expression fuses: scale = max|x|/127,
    // codes = floor(x/scale + 0.5) (0 when scale = 0), deq = codes·scale
    val scale = array_max(transform(col("v"), x => abs(x))) / 127.0
    val codes = when(scale === 0.0, transform(col("v"), _ => lit(0.0)))
      .otherwise(transform(col("v"), x => floor(x / scale + lit(0.5))))
    val got = df.select(
      int8_dequantize(col("v")).as("fast"),
      transform(codes, x => x * scale).as("slow")).collect()
    got.foreach { r =>
      val fast = r.getSeq[Double](0).map(java.lang.Double.doubleToLongBits)
      val slow = r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)
      assert(fast == slow)
    }
  }

  test("int8_dequantize interpreted eval handles empty and null slots like the chain") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val at = ArrayType(DoubleType)
    def evalOf(v: Seq[Any]) =
      Int8Dequantize(Literal.create(v, at)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // empty array stays empty
    assert(evalOf(Seq.empty[Double]).numElements() == 0)
    // all-null input: array_max is null → every chained product is null
    val allNull = evalOf(Seq(null, null))
    assert(allNull.isNullAt(0) && allNull.isNullAt(1))
    // null slot beside a real value propagates; the real value quantizes
    val mixed = evalOf(Seq(2.0, null))
    assert(!mixed.isNullAt(0) && mixed.isNullAt(1))
    assert(mixed.getDouble(0) == math.floor(2.0 / (2.0 / 127.0) + 0.5) * (2.0 / 127.0))
  }

  test("array_norm of unit vectors is 1") {
    val df = Seq(Seq(1.0, 0.0, 0.0), Seq(0.6, 0.8, 0.0)).toDF("v")
    val norms = df.select(array_norm(col("v"))).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))
  }

  test("simhash64 equals the explode+aggregate formulation") {
    import SimHash64.simhash64
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark streams batch data across partitions"),
      (3L, "a a a b b c"))
      .toDF("doc_id", "text")
    val toks = split(trim(col("text")), "\\s+")
    val fast = docs.select(col("doc_id"), simhash64(toks).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference formulation: explode + 64 conditional sums
    val exploded = docs.select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val slow = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("MinHashAgg slot hashes equal the builtin xxhash64 chain") {
    val shingles = Seq((1L, "a b c"), (1L, "b c d"), (2L, "x y z"))
    val viaAgg = shingles.toDS()
      .groupByKey(_._1).agg(MinHashAgg.toColumn.name("sig"))
      .collect().toMap
    val df = shingles.toDF("doc_id", "shingle")
    val sigCols = (0 until MinHashAgg.NumHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    val viaBuiltin = df.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to MinHashAgg.NumHashes).map(r.getLong).toArray).toMap
    viaAgg.foreach { case (k, sig) =>
      assert(sig.sameElements(viaBuiltin(k)), s"signature mismatch for doc $k")
    }
  }

  test("char_trigrams matches the transform/substring chain, incl. multi-byte chars") {
    import CharTrigrams.char_trigrams
    val texts = Seq("hello world", "ab", "", "abc", "naïve café breeze",
      "日本語のテキストです", "mixed 漢字 and ascii", "  spaced  out  ")
    val df = texts.toDF("t").select(lower(col("t")).as("lc"))
    val rows = df.select(
      char_trigrams(col("lc")).as("fast"),
      expr("CASE WHEN length(lc) >= 3 THEN " +
        "transform(sequence(1, length(lc) - 2), i -> substring(lc, i, 3)) " +
        "ELSE array() END").as("slow"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for '$t'")
    }
  }

  test("best_profile_lang equals the explode+join+argmax formulation") {
    import BestProfileLang.best_profile_lang
    import CharTrigrams.char_trigrams
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog ran"),
      (2L, "der hund lief durch den wald und den garten"),
      (3L, "le chat dort sur le lit dans la maison"),
      (4L, "xy"), // < 3 chars: no grams -> no prediction row
      (5L, "the der le mixed thing")).toDF("doc_id", "text")
    val labeled = Seq(
      (10L, "en", "the cat and the dog sat on the mat in the house then ran out"),
      (11L, "de", "der hund und die katze liefen durch den wald in den garten"),
      (12L, "fr", "le chat et le chien dorment sur le lit dans la maison"))
      .toDF("doc_id", "lang", "text")
    val profile = graft.analytics.LangId.fit(labeled)

    val fast = graft.analytics.LangId.predict(docs, profile)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // declarative twin: per-occurrence explode -> broadcast join ->
    // score aggregation -> min_by argmax with lang-asc tie-break
    val occ = docs.select(col("doc_id"),
      explode(char_trigrams(lower(col("text")))).as("gram"))
    val slow = occ.join(profile, Seq("gram"))
      .groupBy("doc_id", "profile_lang")
      .agg(sum("weight").as("score"))
      .groupBy("doc_id")
      .agg(min_by(col("profile_lang"),
        struct((-col("score")).as("neg"), col("profile_lang"))).as("predicted"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(fast == slow)
    assert(!fast.contains(4L), "gram-less doc must produce no prediction row")
    assert(fast.contains(1L) && fast.contains(2L) && fast.contains(3L))
  }

  test("bigram_stats equals the declarative explode formulation on fuzzed texts") {
    import BigramStats.bigram_stats
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val texts = Seq.fill(60) {
      val n = rnd.nextInt(12)
      (if (rnd.nextBoolean()) "  " else "") +
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
          .mkString(if (rnd.nextBoolean()) " " else "\t") +
        (if (rnd.nextBoolean()) " " else "")
    } ++ Seq("", "solo", "a a a a")
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    val viaExpr = df.select(col("id"), bigram_stats(col("text")).as("bs"))
      .select(col("id"), col("bs.n_tokens"), col("bs.n_distinct"),
              col("bs.n_bigrams"), col("bs.top_bigram"))
    val t = split(trim(col("text")), "\\s+")
    val base = df.select(col("id"), t.as("t"))
    val perRow = base.select(col("id"),
        size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_distinct"),
        greatest(size(col("t")) - 1, lit(0)).as("n_bigrams"))
    val topBg = base.filter(size(col("t")) >= 2)
      .select(col("id"), explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
        concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1)))).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").cast("int").as("top_bigram"))
    val twin = perRow.join(topBg, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("n_distinct"), col("n_bigrams"),
        coalesce(col("top_bigram"), lit(0)).as("top_bigram"))
    assert(viaExpr.collect().map(_.toSeq).toSet == twin.collect().map(_.toSeq).toSet)
  }

  test("identical texts share a simhash; distinct texts differ") {
    import SimHash64.simhash64
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val fps = docs.select(simhash64(split(col("text"), "\\s+")))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }
}
