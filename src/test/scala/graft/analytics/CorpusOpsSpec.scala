package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Round-5 corpus operators: duplicate-cluster connected components
  * (d06), TF-IDF distinctive terms (t13), and benchmark
  * decontamination (t14) — planted-input semantics plus the gate
  * queries' shape on the real fixture.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("dupClustersOf: chain transitivity, multiple components, min-label ids — both paths") {
    import spark.implicits._
    // component A: a 4-chain 1-2-3-4 (1~4 only transitively);
    // component B: the pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val want = Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // fast path (driver union-find) and forced distributed loop
    // (maxLocalEdges = 0) must agree bit-for-bit
    assert(run(Dedup.dupClustersOf(pairs)) == want)
    assert(run(Dedup.dupClustersOf(pairs, maxLocalEdges = 0L)) == want)
  }

  test("dupClustersOf: local and distributed paths agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // ~80 random edges over 60 nodes: multiple components, cycles, chains
    val pairs = Seq.fill(80) {
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("i", "j")
    val local = Dedup.dupClustersOf(pairs).collect().map(_.toSeq).toSet
    val dist = Dedup.dupClustersOf(pairs, maxLocalEdges = 0L).collect().map(_.toSeq).toSet
    assert(local == dist)
  }

  test("dupClustersOf: a dup-free corpus yields an empty cluster table") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.dupClustersOf(none).count() == 0L)
  }

  test("d06 gate: clusters cover exactly the d01-pair docs, sizes consistent") {
    val pairs = Dedup.d01NgramJaccardPairs(spark, dir)
    val pairDocs = pairs.select(col("i").as("d")).union(pairs.select(col("j").as("d")))
      .distinct().collect().map(_.getLong(0)).toSet
    val clusters = Dedup.d06DupClusters(spark, dir).collect()
    assert(clusters.map(_.getLong(0)).toSet == pairDocs)
    // every cluster id is a member of its own cluster and the min id
    val byCluster = clusters.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid)
      assert(rows.forall(_.getLong(2) == rows.length))
    }
  }

  test("t13: rare terms outrank ubiquitous ones; ties break by term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zebra common common common", "en", "s", 0L),
      (2L, "common word word", "en", "s", 0L),
      (3L, "common word apple", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-t13").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.t13Tfidf(spark, tmp)
      .select("doc_id", "rank", "term").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 1: zebra (df=1) must beat "common" (df=3, idf=0)
    assert(got.filter(_._1 == 1L).map(_._3).head == "zebra")
    // doc 3: apple (df=1) first, then word (df=2), then common (idf=0)
    assert(got.filter(_._1 == 3L).sortBy(_._2).map(_._3).toSeq ==
      Seq("apple", "word", "common"))
  }

  test("d02 pairs are a subset of d01's exact pairs — banding loses, never invents") {
    val exact = Dedup.d01NgramJaccardPairs(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.d02MinHashPairs(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), s"minhash invented pairs: ${mh -- exact}")
    assert(exact.isEmpty || mh.size.toDouble / exact.size >= 0.5,
      s"minhash recall too low: ${mh.size}/${exact.size}")
  }

  test("d02 verify numerator: jaccard values equal d01's exact values pair-for-pair") {
    // the LSH candidate SET has no SQL oracle, but the exact-Jaccard
    // verify VALUES do: on every (i,j) both tiers report, d02's
    // array_intersect/array_union score must equal d01's
    // postings-count score bit-for-bit after rounding — the two
    // independent formulations of the same set arithmetic
    val exact = Dedup.d01NgramJaccardPairs(spark, dir)
      .select(col("i"), col("j"), col("jaccard").as("j_exact"))
    val mismatch = Dedup.d02MinHashPairs(spark, dir)
      .join(exact, Seq("i", "j"))
      .filter(col("jaccard") =!= col("j_exact"))
      .collect()
    assert(mismatch.isEmpty,
      s"d02 jaccard diverges from d01 on: ${mismatch.mkString(", ")}")
  }

  test("d05 numerator: planted passages produce exactly the expected pairs, shared = |fp_i ∩ fp_j|") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def prose(words: Int) =
      Seq.fill(words)(Seq.fill(3 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val a = prose(80)
    val b = prose(90)
    val passage = a.substring(0, 200) // ≥ k+w-1 chars → guaranteed shared fingerprint
    val docs = Seq(
      (1L, a, "en"),                                  // donor
      (2L, b, "en"),                                  // base
      (3L, b + " " + passage, "en"),                  // contains 2 fully and 1's passage
      (4L, prose(85), "en")                           // unrelated
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.winnowPairsOf(docs).filter(col("shared") >= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // passage structure alone dictates the pair set: (1,3) via the
    // copied passage, (2,3) via full containment — never (1,2), (1,4),
    // (2,4), (3,4)
    assert(got.keySet == Set((1L, 3L), (2L, 3L)),
      s"pair set diverges from planted passages: ${got.keySet}")
    // doc 2 is wholly contained in doc 3: near-total fingerprint
    // containment, so overlap ≈ 1 and far above the passage-only pair
    assert(got((2L, 3L))._2 >= 0.8, s"containment overlap too low: ${got((2L, 3L))}")
    assert(got((2L, 3L))._1 > got((1L, 3L))._1,
      "full containment must share more fingerprints than one passage")
    // the pair pipeline's `shared` numerator (postings index → i<j
    // slice → count) must equal the direct per-doc fingerprint-set
    // intersection, computed without the pair machinery
    val sets = docs
      .select(col("doc_id"),
        graft.functions.WinnowFingerprints.winnow_fingerprints(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    got.foreach { case ((i, j), (shared, _)) =>
      assert(shared == sets(i).intersect(sets(j)).size.toLong,
        s"($i,$j): pipeline shared=$shared != direct ${sets(i).intersect(sets(j)).size}")
    }
  }

  test("d06: both endpoints of every d01 pair land in the same cluster") {
    val pairs = Dedup.d01NgramJaccardPairs(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = Dedup.d06DupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (i, j) =>
      assert(cluster(i) == cluster(j), s"pair ($i,$j) split across clusters")
    }
  }

  test("d07: LSH pair tier finds a usable fraction of d04's exact pairs, no false positives") {
    val exact = Dedup.d04EmbeddingNearDup(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.d07EmbeddingLshPairs(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every reported pair is exact-verified, so d07 ⊆ d04
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.3,
      s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("t15: each rule fails exactly the planted offender") {
    import spark.implicits._
    val good = (1 to 30).map(i => s"w$i").mkString(" ") + " the of and"
    val docs = Seq(
      (1L, good, "en", "s", 0L),                                   // passes all
      (2L, "too short the", "en", "s", 0L),                        // fails r1 only... also r1
      (3L, good.replace("the of and", "x ".repeat(50).trim), "en", "s", 0L), // no stopword
      (4L, good + " " + "y".repeat(80), "en", "s", 0L)             // long token
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-t15").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextOps.t15QualityFilter(spark, tmp).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("fail_long_token") == 1L)
    assert(r.getAs[Long]("fail_no_stopword") >= 1L)
    assert(r.getAs[Long]("n_pass") >= 1L)
  }

  test("t16: rates equalize token budgets and the gate is deterministic") {
    val out = TextOps.t16MixtureSample(spark, dir).collect()
    val out2 = TextOps.t16MixtureSample(spark, dir).collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
    // every rate is in (0, 1]; the largest language is downsampled
    // hardest (rate strictly < 1 when languages are imbalanced)
    val rates = out.map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toMap
    assert(rates.values.forall(r => r > 0.0 && r <= 1.0))
    assert(rates.values.exists(_ < 1.0))
    // sampled_tokens <= lang tokens, and n_sampled <= n_docs
    out.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
  }

  test("writeShards materializes one sorted file per shard within budget") {
    val docs = Tables.documents(spark, dir)
    val out = graft.core.TempDirs.create("graft-shards").toString
    val budget = 2000L
    val written = TextPrep.writeShards(docs, out, budget)
    assert(written == docs.count())
    val back = spark.read.parquet(out)
    // every shard obeys the packing bound: sum < budget + its max doc
    val bad = back.groupBy("lang", "shard_id")
      .agg(sum("n_tokens").as("s"), max("n_tokens").as("m"))
      .filter(col("s") >= lit(budget) + col("m")).count()
    assert(bad == 0L, "a shard exceeds budget + one document")
    // one task per shard → exactly one parquet file per shard directory
    val shardDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName} has ${parts.length} files")
    }
  }

  test("writeJsonlShards round-trips every document through the trainer format") {
    val docs = Tables.documents(spark, dir)
    val out = graft.core.TempDirs.create("graft-jsonl").toString
    val written = TextPrep.writeJsonlShards(docs, out, budget = 2000L)
    assert(written == docs.count())
    // read back as JSON: every doc's text survives byte-for-byte
    val back = spark.read.json(out)
      .select(col("doc_id"), col("text").as("back_text"))
    val mismatched = docs.select(col("doc_id"), col("text"))
      .join(back, "doc_id")
      .filter(col("text") =!= col("back_text")).count()
    assert(mismatched == 0L, "JSONL round trip corrupted text")
    // one line file per shard directory, like the parquet writer
    val shardDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1, s"${d.getName} has ${parts.length} files")
    }
  }

  test("readJsonlCorpus: declared-schema ingest, corrupt lines quarantined not fatal") {
    val docs = Tables.documents(spark, dir)
    val out = graft.core.TempDirs.create("graft-jsonl-in").toString
    TextPrep.writeJsonlShards(docs, out, budget = 2000L)
    // plant a malformed line among the shards
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/lang=en/shard_id=0/part-corrupt.txt"),
      "{not valid json\n")
    // cache first: Spark disallows querying ONLY the corrupt column
    // off a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val back = TextPrep.readJsonlCorpus(spark, out).cache()
    back.count()
    val clean = back.filter(col("_corrupt").isNull)
    val quarantined = back.filter(col("_corrupt").isNotNull)
    assert(clean.count() == docs.count(), "clean-line count drifted")
    assert(quarantined.count() == 1L, "corrupt line was not quarantined")
    // full fidelity: ingest joins back to the source corpus byte-for-byte
    val mismatched = docs.select(col("doc_id"), col("text"))
      .join(clean.select(col("doc_id"), col("text").as("in_text")), "doc_id")
      .filter(col("text") =!= col("in_text")).count()
    assert(mismatched == 0L)
    back.unpersist()
  }

  test("readCsvCorpus: declared-schema ingest, corrupt lines quarantined not fatal") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val out = graft.core.TempDirs.create("graft-csv-in")
      .resolve("corpus").toString
    docs.repartition(2).write.option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(out)
    // plant a malformed line: a row whose doc_id cannot parse as long
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/part-corrupt.csv"),
      "doc_id,lang,text,n_tokens\nnot_a_long,en,\"broken row\",x\n")
    val back = TextPrep.readCsvCorpus(spark, out).cache()
    back.count()
    val clean = back.filter(col("_corrupt").isNull)
    val quarantined = back.filter(col("_corrupt").isNotNull)
    assert(clean.count() == docs.count(), "clean-line count drifted")
    assert(quarantined.count() == 1L, "corrupt line was not quarantined")
    // full fidelity: quoted/escaped text survives the round trip
    val mismatched = docs.select(col("doc_id"), col("text"))
      .join(clean.select(col("doc_id"), col("text").as("in_text")), "doc_id")
      .filter(col("text") =!= col("in_text")).count()
    assert(mismatched == 0L)
    back.unpersist()
  }

  test("d09: planted passage copies are flagged, keep-first spares the earliest") {
    import spark.implicits._
    // flanks use per-doc disjoint alphabets so no gram straddling a
    // passage boundary can collide across docs (a same-flank-char +
    // passage-prefix gram IS a real 40-char duplicate, and random
    // flanks hit that 1/26 coincidence)
    val rnd = new scala.util.Random(47)
    def prose(chars: Int, lo: Char, hi: Char) =
      Seq.fill(chars)((lo + rnd.nextInt(hi - lo + 1)).toChar).mkString
    val passage = prose(60, 'A', 'Z')
    val docs = Seq(
      (1L, prose(50, 'a', 'f') + passage + prose(50, 'a', 'f'), "en", "src0", 0L),  // global first
      (2L, prose(80, 'g', 'm') + passage + prose(30, 'g', 'm'), "en", "src1", 0L),  // one copy
      (3L, passage + prose(45, 'n', 't') + passage, "en", "src1", 0L),              // two copies, split spans
      (4L, prose(200, 'u', 'z'), "en", "src1", 0L)                                  // untouched
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-d09").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d09ExactSubstr(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 holds every passage gram's global first occurrence → absent;
    // doc 4 shares nothing → absent
    assert(got.keySet == Set(2L, 3L), s"flagged docs: ${got.keySet}")
    // a 60-char copy = 21 overlapping 40-grams merging to one 60-char span
    assert(got(2L) == ((1L, 60L)), s"doc 2 spans: ${got(2L)}")
    // two copies 45 apart stay two spans (45 > 0 gap between [0,60) and [105,165))
    assert(got(3L) == ((2L, 120L)), s"doc 3 spans: ${got(3L)}")

    // d10 removes exactly those spans: cleaned text = original minus the
    // duplicated chars, first occurrence (doc 1) byte-identical
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clean = Dedup.d10ExactSubstrClean(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(clean.keySet == Set(1L, 2L, 3L, 4L))
    def m(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // untouched docs pass through byte-identically
    assert(clean(1L) == ((160L, 160L, 0L, m(texts(1L)))))
    assert(clean(4L) == ((200L, 200L, 0L, m(texts(4L)))))
    // doc 2: the 60-char passage cut, flanks concatenated
    val d2 = texts(2L)
    assert(clean(2L) == ((170L, 110L, 1L, m(d2.substring(0, 80) + d2.substring(140)))))
    // doc 3: both copies cut (the span covers [0,60) and [105,165))
    val d3 = texts(3L)
    assert(clean(3L) == ((165L, 45L, 2L, m(d3.substring(60, 105)))))
  }

  test("t20 output is byte-identical to t14 — the Bloom stage is correctness-invisible") {
    val a = TextOps.t14Decontamination(spark, dir).collect().map(_.toSeq)
    val b = TextOps.t20BloomDecontam(spark, dir).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "bloom-tier decontamination diverges from the exact tier")
  }

  test("bloom_might_contain: no false negatives against a stat.bloomFilter build") {
    import spark.implicits._
    import graft.functions.BloomMightContain
    val words = (0 until 5000).map(i => s"shingle token number $i")
    val df = words.toDF("w")
    val bytes = BloomMightContain.serialize(df.stat.bloomFilter("w", 5000L, 0.01))
    val kept = df.filter(BloomMightContain.bloom_might_contain(col("w"), bytes)).count()
    assert(kept == 5000L, s"bloom dropped ${5000 - kept} true members")
    // false-positive rate on disjoint probes stays near the configured 1%
    val fp = (0 until 5000).map(i => s"absent probe value $i").toDF("w")
      .filter(BloomMightContain.bloom_might_contain(col("w"), bytes)).count()
    assert(fp < 250, s"implausible false-positive count: $fp")
  }

  test("t21: repetitive text scores lower perplexity than diverse text") {
    val got = TextOps.t21LmPerplexity(spark, dir).collect()
    assert(got.length == Tables.documents(spark, dir)
      .filter(length(col("text")) >= 3).count().toInt)
    got.foreach { r =>
      val nll = r.getDouble(2); val ppl = r.getDouble(3)
      assert(nll > 0 && ppl > 1, s"doc ${r.getLong(0)}: nll=$nll ppl=$ppl")
      // ppl is exp(avg_nll) of the already-rounded nll, re-rounded
      assert(math.abs(ppl - math.floor(math.exp(nll) * 100 + 0.5) / 100) < 1e-9)
    }
    // planted ordering: under a fit over both docs, text built from a
    // handful of repeating trigrams scores far lower nll than text
    // whose trigrams are mostly singletons
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val repetitive = "abc" * 100
    val diverse = Seq.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString
    val planted = Seq(
      (1L, repetitive, "en", "src0", 0L),
      (2L, diverse, "en", "src0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-t21").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val p = TextOps.t21LmPerplexity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(p(1L) < p(2L) / 2,
      s"repetitive text must score far lower nll: $p")
  }

  test("t14: only train docs sharing benchmark shingles are flagged") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, passage, "en", "src0", 0L),                       // benchmark
      (2L, s"intro words then $passage and a tail", "en", "src1", 0L), // contaminated
      (3L, "completely unrelated text with many fresh tokens", "en", "src1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-t14").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.t14Decontamination(spark, tmp).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    val r = got.head
    // all 8 shingles of the 10-token passage appear in doc 2
    assert(r.getLong(2) >= 8L && r.getLong(1) > r.getLong(2))
  }

  test("d11: one survivor per d06 cluster, member of it, quality-argmax with min-id ties") {
    val clusters = Dedup.d06DupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = clusters.groupBy(_._2)
    val toks = split(trim(col("text")), "\\s+")
    val quality = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Det.dround(size(array_distinct(toks)).cast("double") / size(toks), 4).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Dedup.d11ClusterSurvivors(spark, dir).collect()
    assert(got.length == byCluster.size, "one row per cluster")
    got.foreach { r =>
      val (cid, survivor, q, size, removed) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      val members = byCluster(cid).map(_._1)
      assert(members.contains(survivor), s"survivor $survivor not in cluster $cid")
      assert(size == members.length && removed == size - 1)
      val best = members.map(m => (quality(m), -m)).max
      assert((q, -survivor) == best,
        s"cluster $cid survivor $survivor q=$q is not the quality argmax $best")
    }
  }

  test("t23: content-keyed split — duplicates stay together, shares sum to 1 per stratum") {
    import spark.implicits._
    // two identical texts (dup pair) + distinct fillers, one stratum
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = (Seq((1L, dup), (2L, dup)) ++
      (3L to 40L).map(i => (i, s"filler text number $i with token $i")))
      .map { case (id, tx) => (id, tx, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.core.TempDirs.create("graft-t23").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // per-doc split assignment mirrors the operator's content-hash gate
    val h = substring(md5(col("text")), 1, 2)
    val assign = Tables.documents(spark, tmp)
      .select(col("doc_id"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(1L) == assign(2L), "identical docs must land in the same split")
    val shares = TextOps.t23StratifiedSplit(spark, tmp).collect()
      .groupBy(_.getString(0)).map { case (lang, rs) => lang -> rs.map(_.getDouble(4)).sum }
    shares.foreach { case (lang, s) =>
      assert(math.abs(s - 1.0) < 0.001, s"stratum $lang shares sum to $s, not 1")
    }
  }

  test("t22: contiguous ranks, counts descending, cumulative share consistent") {
    val rows = TextOps.t22VocabCoverage(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    val cum = rows.map(_.getDouble(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "cumulative share must be non-decreasing")
    assert(cum.last <= 1.0 + 1e-9)
    // each cum step equals the running frac sum within rounding slack
    val fracs = rows.map(_.getDouble(3))
    val run = fracs.scanLeft(0.0)(_ + _).tail
    cum.zip(run).foreach { case (c, s) =>
      assert(math.abs(c - s) < 1e-3, s"cum_frac $c drifted from frac sum $s")
    }
  }

  test("t26: ranked 5-gram cut — counts non-increasing, df ≤ occurrences, numerator on a planted gram") {
    val rows = TextOps.t26TopkNgrams(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val occ = rows.map(_.getLong(2))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b }, "n_occ must be non-increasing")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "doc_freq cannot exceed total occurrences")
      assert(r.getString(1).split(" ").length == 5, "gram must be exactly 5 tokens")
    }
    // numerator: a corpus where one 5-gram is planted in 3 of 4 docs
    // (twice in one of them) must rank it first with exact counts
    import spark.implicits._
    val tmp = graft.core.TempDirs.create("graft-t26").toString
    val planted = "alpha beta gamma delta epsilon"
    Seq(
      (0L, s"$planted one two three four five six", "en", "src0", 1L),
      (1L, s"zz yy $planted xx ww vv uu tt ss", "en", "src0", 1L),
      (2L, s"$planted qq rr $planted", "en", "src1", 1L),
      (3L, "one two three four five six seven eight nine", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val top = TextOps.t26TopkNgrams(spark, tmp).collect()
    assert(top.head.getString(1) == planted)
    assert(top.head.getLong(2) == 4L, "planted gram occurs 4 times")
    assert(top.head.getLong(3) == 3L, "planted gram appears in 3 docs")
    assert(top.head.getDouble(4) == 0.75)
  }
}
