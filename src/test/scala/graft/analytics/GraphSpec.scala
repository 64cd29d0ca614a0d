package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** PageRank over the kNN graph: conservation, planted structure,
  * exact single-node parity, partitioning invariance. */
class GraphSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("rank mass is conserved (sums to 1) and every rank is positive") {
    val edges = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val ranks = Graph.pagerank(edges).collect().map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-9, s"rank mass ${ranks.sum}")
    assert(ranks.forall(_ > 0))
  }

  test("planted star: the hub out-ranks every spoke") {
    import spark.implicits._
    // spokes 1..10 each point at hub 0 and their ring neighbor; the
    // hub points back at spoke 1 (so it has out-degree and no sink)
    val edges = ((1L to 10L).flatMap(i => Seq((i, 0L), (i, i % 10 + 1))) :+ (0L, 1L))
      .toDF("src", "dst")
    val r = Graph.pagerank(edges).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert((1L to 10L).forall(i => r(0L) > r(i)), s"hub not central: $r")
  }

  test("triangle counts: planted clique and path give known exact answers") {
    import spark.implicits._
    // K4 on {0,1,2,3} (4 triangles, 3 per node, coeff 1.0) plus a
    // pendant path 3-4-5 (no triangles through 4 or 5)
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    val got = Graph.triangleCoeff(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((3L, 3L, 1.0)))
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L) == ((4L, 3L, 0.5)))
    assert(got(4L) == ((2L, 0L, 0.0)))
    assert(got(5L) == ((1L, 0L, 0.0)))
  }

  test("distributed clustering coefficients equal the single-node reference exactly") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Graph.referenceClusteringCoeff(edges)
    val got = Graph.triangleCoeff(edgeDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == want.size)
    // the corpus graph must actually contain triangles, or the gate
    // says nothing
    assert(got.values.map(_._2).sum > 0, "no triangles in the kNN graph")
    got.foreach { case (id, t) =>
      assert(t == want(id), s"node $id: $t != ${want(id)}")
    }
  }

  test("k-core peeling: planted K5 survives, its pendant tree peels away") {
    import spark.implicits._
    // K5 on {0..4} (every node in-core degree 4) with a pendant chain
    // 4-5-6 and a claw at 6 — everything outside K5 must peel at k=4
    val k5 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val edges = (k5 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L), (6L, 8L), (6L, 9L)))
      .toDF("src", "dst")
    val got = Graph.kCore(edges, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
  }

  test("distributed k-core equals the single-node reference exactly") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Graph.referenceKCore(edges, Graph.CoreK)
    val got = Graph.kCore(edgeDf, Graph.CoreK).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "the corpus 4-core is empty — the gate says nothing")
    assert(got == want)
  }

  test("label propagation: two planted cliques with one bridge resolve to two communities") {
    import spark.implicits._
    val k4a = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val k4b = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = (k4a ++ k4b :+ (3L, 10L)).toDF("src", "dst")
    val labels = Graph.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to one label; the cliques stay distinct
    assert((0L to 3L).map(labels).toSet.size == 1)
    assert((10L to 13L).map(labels).toSet.size == 1)
    assert(labels(0L) != labels(10L))
  }

  test("distributed label propagation equals the single-node reference exactly") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .filter(col("cos_sim") >= Graph.LpaCosMin)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Graph.referenceLabelPropagation(edges)
    val got = Graph.labelPropagation(edgeDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == want.size)
    assert(got == want)
    // communities must be nontrivial: more than one, fewer than nodes
    val nComm = got.values.toSet.size
    assert(nComm > 1 && nComm < got.size,
      s"LPA degenerated: $nComm communities over ${got.size} nodes")
  }

  test("distributed ranks equal the single-node reference exactly") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val edges = edgeDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Graph.referencePagerank(edges)
    val got = Graph.pagerank(edgeDf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == want.size)
    got.foreach { case (id, r) =>
      assert(r == want(id), s"node $id: $r != ${want(id)}")
    }
  }

  test("PPR seeded by every node equals uniform PageRank; seeding concentrates mass") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val allNodes = edgeDf.select("src").union(edgeDf.select("dst"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val uniform = Graph.pagerank(edgeDf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val allSeeded = Graph.pagerank(edgeDf, seeds = Some(allNodes)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(allSeeded == uniform, "all-node PPR != uniform PageRank")
    // a small seed set concentrates mass: the seeds' total PPR rank
    // must exceed their uniform-PageRank total
    val seeds = allNodes.filter(_ % 100 == 0)
    val ppr = Graph.pagerank(edgeDf, seeds = Some(seeds)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
    val seedMassPpr = seeds.map(ppr).sum
    val seedMassUniform = seeds.map(uniform).sum
    assert(seedMassPpr > seedMassUniform * 2,
      s"teleport bias missing: $seedMassPpr vs $seedMassUniform")
  }

  test("large seed sets: broadcast-join teleport, no literal In blowup, exact parity") {
    import spark.implicits._
    // ring + chord graph, 600 nodes; 300 seeds — past SeedLiteralMax,
    // so the teleport flag must come from a broadcast join, not a
    // 300-literal In predicate replicated into every iteration's plan
    val n = 600L
    val edgePairs = (0L until n).flatMap(i => Seq((i, (i + 1) % n), (i, (i + 7) % n)))
    val edgeDf = edgePairs.toDF("src", "dst")
    val seeds = (0L until n by 2).toSeq
    assert(seeds.length > Graph.SeedLiteralMax)
    val ranked = Graph.pagerank(edgeDf, seeds = Some(seeds))
    val plan = ranked.queryExecution.optimizedPlan.toString
    // a literal teleport would embed every seed value in the plan; the
    // broadcast form embeds none of them past the join build side
    assert(!plan.contains(seeds.drop(10).mkString(",")),
      "seed literals leaked into the iteration plan")
    val got = ranked.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Graph.referencePagerank(edgePairs, seeds = Some(seeds))
    assert(got.size == want.size)
    got.foreach { case (id, r) =>
      assert(r == want(id), s"node $id: $r != ${want(id)}") }
  }

  test("pagerank of an empty edge set is an empty rank frame, not an error") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pagerank(none, iters = 1).isEmpty)
  }

  test("pagerank refuses graphs whose max in-degree exceeds the sorted-fold bound") {
    import spark.implicits._
    // celebrity hub: every node points at 0 — in-degree past the bound
    // must fail loudly BEFORE any iteration, not OOM mid-fold
    val hub = (1L to Graph.MaxFoldInDegree + 1).map(i => (i, 0L))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException](Graph.pagerank(hub, iters = 1))
    assert(e.getMessage.contains("in-degree"), e.getMessage)
  }

  test("g06: propagated scores are convex combinations — range can only contract") {
    val got = Graph.g06QualityPropagation(spark, dir).collect()
    assert(got.nonEmpty)
    // recompute the raw-score range over ALL docs (the gate only
    // emits top-25); every propagated score must lie inside it, since
    // each round is a convex combination of round-(r-1) scores
    val q0 = Tables.documents(spark, dir)
      .select(Det.dround(
        size(array_distinct(split(trim(col("text")), "\\s+"))).cast("double") /
          size(split(trim(col("text")), "\\s+")), 4).as("q"))
      .collect().map(_.getDouble(0))
    val (lo, hi) = (q0.min, q0.max)
    got.foreach { r =>
      val p = r.getDouble(2)
      assert(p >= lo - 1e-4 && p <= hi + 1e-4,
        s"doc ${r.getLong(0)}: propagated $p outside raw range [$lo, $hi]")
    }
    // smoothing must actually move something: not every top row keeps
    // its raw score
    assert(got.exists(r => r.getDouble(1) != r.getDouble(2)),
      "propagation was a no-op on the corpus graph")
  }

  test("ranks are invariant to edge partitioning") {
    val edgeDf = Similarity.s05KnnGraph(spark, dir)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val a = Graph.pagerank(edgeDf.repartition(1)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.pagerank(edgeDf.repartition(17)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a.nonEmpty && a == b)
  }

  test("g07: diff-maintained kNN edges equal a full rebuild of snapshot B") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inc = rows(Graph.g07IncrementalKnn(spark, dir))
    val full = rows(Graph.g07FullRebuildProbe(spark, dir))
    assert(inc.nonEmpty && inc == full)
    // deleted rows are gone, added rows are present
    val ids = inc.map(_._1).toSet
    assert(ids.forall(id => id < 0 || id % 10 != 7), "deleted ids survived")
    assert(ids.exists(_ < 0), "added ids missing")
    // and the maintenance was genuinely incremental: the recompute
    // set (dirty-ref ∪ admission gainers ∪ new vectors) must be a
    // strict subset of snapshot B — some surviving row kept its
    // stored list verbatim
    val a = Dedup.normalizedVectors(spark, dir)
    val b = Graph.vectorSnapshotB(a)
    val recompute = Graph.knnRecomputeIds(a,
      Similarity.s05KnnGraph(spark, dir), b,
      Graph.g07DirtyOld(a), Graph.g07NewIds(b)).count()
    val bSize = b.count()
    assert(recompute < bSize,
      s"every list recomputed ($recompute of $bSize) — the fixture no " +
        "longer exercises the kept path")
  }

  test("kNN maintenance cost scales with the diff: a 1% diff touches a small corpus fraction") {
    // g07's fixture diff deliberately churns 30% of ids; the operator
    // itself takes ARBITRARY diff id frames — drive it with a 1%
    // re-embed (5 of 500 vectors at sf0.01, no deletes/adds) and pin
    // BOTH exactness and proportionality
    val sf01 = "/root/testdata/sf0.01"
    val a = Dedup.normalizedVectors(spark, sf01)
    val changed = col("vec_id") % 100 === 3
    val rot = expr("transform(sequence(1, size(v)), k -> v[k % size(v)])")
    val b = a.filter(!changed).select(col("vec_id"), col("v"), col("norm"))
      .unionByName(a.filter(changed).select(col("vec_id"), rot.as("v"), col("norm")))
    val edgesA = Similarity.s05KnnGraph(spark, sf01)
    val dirtyOld = a.filter(changed).select("vec_id")
    val newIds = dirtyOld
    val n = b.count()
    val touched = Graph.knnRecomputeIds(a, edgesA, b, dirtyOld, newIds).count()
    // 5 changed vectors: their own 5 lists + lists referencing them
    // (~in-degree k each) + admission gainers — far below the corpus
    assert(touched < n / 4,
      s"1% diff touched $touched of $n lists — maintenance is not diff-proportional")
    // and the maintained graph still equals the full rebuild exactly
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inc = rows(Graph.maintainKnnEdges(a, edgesA, b, dirtyOld, newIds))
    val full = rows(Similarity.knnGraphExact(b, k = 5).orderBy("vec_id", "rnk"))
    assert(inc.nonEmpty && inc == full)
  }

  test("cell-pruned admission computes the SAME recompute set as the exact tier") {
    // the prune is an angular-triangle-inequality UPPER BOUND, never a
    // heuristic: pair work drops, decisions don't — pin id-set
    // equality of the recompute sets AND row equality of the
    // maintained graphs, both on g07's 30% fixture diff and on a 1%
    // re-embed-only diff (where the prune actually bites)
    val a = Dedup.normalizedVectors(spark, dir)
    val b = Graph.vectorSnapshotB(a)
    val edgesA = Similarity.s05KnnGraph(spark, dir)
    val cents = Similarity.ivfCentroids(spark, dir)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val dirtyOld = Graph.g07DirtyOld(a)
    val newIds = Graph.g07NewIds(b)
    val exactSet = ids(Graph.knnRecomputeIds(a, edgesA, b, dirtyOld, newIds))
    val prunedSet = ids(Graph.knnRecomputeIds(a, edgesA, b, dirtyOld, newIds,
      cents = Some(cents), admission = "pruned"))
    assert(exactSet.nonEmpty && prunedSet == exactSet)
    assert(rows(Graph.maintainKnnEdges(a, edgesA, b, dirtyOld, newIds,
        cents = Some(cents), admission = "pruned"))
      == rows(Graph.maintainKnnEdges(a, edgesA, b, dirtyOld, newIds)))
    // the small diff: 1% of vectors re-embedded, nothing deleted/added
    val changed = col("vec_id") % 100 === 3
    val rot = expr("transform(sequence(1, size(v)), k -> v[k % size(v)])")
    val b1 = a.filter(!changed).select(col("vec_id"), col("v"), col("norm"))
      .unionByName(a.filter(changed).select(col("vec_id"), rot.as("v"), col("norm")))
    val dirty1 = a.filter(changed).select("vec_id")
    val exact1 = ids(Graph.knnRecomputeIds(a, edgesA, b1, dirty1, dirty1))
    val pruned1 = ids(Graph.knnRecomputeIds(a, edgesA, b1, dirty1, dirty1,
      cents = Some(cents), admission = "pruned"))
    assert(exact1.nonEmpty && pruned1 == exact1)
  }

  test("kNN maintenance with short stored lists: an addition still reaches every survivor") {
    // a 4-vector corpus at k=5 gives every row a SHORT (3-edge) list —
    // there is no k-th-best admission threshold, so adding a vector
    // must recompute every surviving list regardless of its scores
    import spark.implicits._
    def vecs(rows: Seq[(Long, Seq[Double])]) = {
      import graft.functions.VectorFunctions._
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), as_double_array(col("embedding")).as("v"))
        .withColumn("norm", array_norm(col("v")))
    }
    val aRows = Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.9, 0.1, 0.0),
      2L -> Seq(0.0, 1.0, 0.0), 3L -> Seq(0.0, 0.9, 0.1))
    val a = vecs(aRows)
    val edgesA = Similarity.knnGraphExact(a, k = 5)
    // the new vector is DISSIMILAR to everything (negative octant) —
    // it scores below every stored minimum, so a threshold-only
    // admission test would wrongly skip the survivors
    val b = vecs(aRows :+ (9L -> Seq(-0.5, -0.5, 0.7)))
    val dirtyOld = Seq.empty[Long].toDF("vec_id")
    val newIds = Seq(9L).toDF("vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inc = rows(Graph.maintainKnnEdges(a, edgesA, b, dirtyOld, newIds))
    val full = rows(Similarity.knnGraphExact(b, k = 5).orderBy("vec_id", "rnk"))
    assert(inc.nonEmpty && inc == full,
      "short-list survivors missed the added vector")
  }
}
