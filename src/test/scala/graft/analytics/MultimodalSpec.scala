package graft.analytics

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Golden-image checks for the real multimodal decode path: an
  * in-memory PNG with known pixels must produce exact dimensions,
  * band luminance features, and an exact area-averaged thumbnail —
  * while non-image payloads fall back to the byte-window path
  * (reference round-trips real image blobs,
  * `tests/test_aerovaldb.py:538-573`). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 32×32 PNG: left half pure black, right half pure white. */
  private def goldenPng(): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xFFFFFF)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("magic sniff: png/gif/jpeg recognized, text rejected") {
    assert(Multimodal.sniffImage(goldenPng()) == Some("png"))
    assert(Multimodal.sniffImage("GIF89a trailer".getBytes("UTF-8")) == Some("gif"))
    assert(Multimodal.sniffImage(Array(0xFF, 0xD8, 0xFF, 0xE0, 0, 0, 0, 0).map(_.toByte)) == Some("jpeg"))
    assert(Multimodal.sniffImage("plain text payload".getBytes("UTF-8")).isEmpty)
  }

  test("decodeImage reads real dimensions from a golden PNG") {
    val (meta, img) = Multimodal.decodeImage(goldenPng()).get
    assert(meta == Multimodal.ImageMeta("png", 32, 32))
    assert((img.getRGB(0, 0) & 0xFFFFFF) == 0x000000)
    assert((img.getRGB(31, 31) & 0xFFFFFF) == 0xFFFFFF)
  }

  test("frameSample: image bands carry real mean luminance; text falls back to byte windows") {
    import spark.implicits._
    val text = "not an image, just bytes " * 10 // 250 bytes -> 4 windows of 64
    val blobs = Seq((1L, goldenPng()), (2L, text.getBytes("UTF-8"))).toDS()
    val frames = Multimodal.frameSample(blobs, frameBytes = 64, bandRows = 16)
      .collect().groupBy(_.doc_id)

    val img = frames(1L).sortBy(_.frame_id)
    assert(img.length == 2) // 32 rows / 16-row bands
    // half black (0) half white (255) -> exact mean luminance 127.5
    assert(img.forall(_.feature == 127.5))
    assert(img(0).offset == 0 && img(1).offset == 16)
    // identical pixel content in both bands -> identical rolling checksum
    assert(img(0).checksum == img(1).checksum)

    val txt = frames(2L).sortBy(_.frame_id)
    assert(txt.length == (text.length + 63) / 64)
    assert(txt.forall(f => f.feature > 0 && f.feature < 256))
  }

  test("resizeBlobs: 8x area-average of the golden PNG is an exact 4x4 half-black thumb") {
    import spark.implicits._
    val blobs = Seq((1L, goldenPng())).toDS()
    val thumb = Multimodal.resizeBlobs(blobs, factor = 8).collect().head
    assert(thumb.orig_bytes == goldenPng().length)

    // the thumb is a real PNG; decode it back and check every pixel:
    // each 8×8 source block is uniform, so area-average is exact
    val (png, _) = Multimodal.resizeImage(Multimodal.decodeImage(goldenPng()).get._2, 8)
    assert(thumb.thumb_bytes == png.length)
    val dec = ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(dec.getWidth == 4 && dec.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((dec.getRGB(x, y) & 0xFFFFFF) == (if (x < 2) 0x000000 else 0xFFFFFF),
        s"pixel ($x,$y)")
  }

  /** Gradient PNG (horizontal or vertical) with a per-pixel brightness
    * offset. */
  private def gradientPng(shift: Int, size: Int = 32,
                          vertical: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val t = if (vertical) y else x
      val v = math.min(255, math.max(0, (t * 255 / (size - 1)) + shift))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("aHash: scale- and brightness-invariant, pattern-sensitive; banding finds near dups") {
    import Multimodal._
    def hashOf(png: Array[Byte]) = aHash64(decodeImage(png).get._2)
    val base = hashOf(gradientPng(0))
    // same structure, different raster size → identical fingerprint
    assert(hashOf(gradientPng(0, size = 64)) == base)
    // mild global brightness shift → hamming ≤ 3 (near-dup territory)
    val shifted = hashOf(gradientPng(12))
    assert(java.lang.Long.bitCount(base ^ shifted) <= 3)
    // aHash keys on bright/dark STRUCTURE: a vertical gradient is a
    // genuinely different pattern (a left-dark threshold image is NOT —
    // it shares the horizontal gradient's above/below-mean geometry)
    val other = hashOf(gradientPng(0, vertical = true))
    assert(java.lang.Long.bitCount(base ^ other) > 10)
    // the banded pair join surfaces exactly the near-dup pair
    import spark.implicits._
    val hashes = Seq((1L, base), (2L, shifted), (3L, other)).toDF("doc_id", "ahash")
    val pairs = imageDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("m04 gate: ten planted pattern groups, each hashed to one bucket") {
    val got = Multimodal.m04ImageDupGroups(spark, "/root/testdata/sf0.001").collect()
    val nDocs = got.map(_.getLong(1)).sum
    // every document produced a decodable image and a fingerprint
    assert(nDocs == Tables.documents(spark, "/root/testdata/sf0.001").count())
    // 10 planted patterns → at most 10 groups (distinct patterns may
    // collide only if aHash degenerates — reps must be the 10 lowest ids)
    assert(got.length == 10)
    assert(got.map(_.getLong(0)).toSet == (0L until 10L).toSet)
  }

  test("audioHash64: gain-invariant, pattern-sensitive") {
    import Multimodal.audioHash64
    // a random-walk waveform and its 3x-amplified copy hash identically
    var state = 7L
    val wave = Array.tabulate(1024) { _ =>
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % 27).toInt - 13).toByte
    }
    val louder = wave.map(s => (s * 3).toByte)
    assert(audioHash64(wave) == audioHash64(louder),
      "gain changed the energy-contour fingerprint")
    // a different walk must land far away in Hamming space
    val other = Array.tabulate(1024) { i =>
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % 27).toInt - 13).toByte
    }
    assert(java.lang.Long.bitCount(audioHash64(wave) ^ audioHash64(other)) > 10)
  }

  test("m05 gate: eight planted waveform patterns, gain variants collapse") {
    val got = Multimodal.m05AudioDupGroups(spark, "/root/testdata/sf0.001").collect()
    val nDocs = got.map(_.getLong(1)).sum
    assert(nDocs == Tables.documents(spark, "/root/testdata/sf0.001").count())
    // 8 patterns × 3 gains collapse to 8 fingerprint groups whose reps
    // are the 8 lowest doc ids
    assert(got.length == 8)
    assert(got.map(_.getLong(0)).toSet == (0L until 8L).toSet)
  }

  test("videoDupPairs: planted trim/re-edit relationships within each triplet") {
    import spark.implicits._
    val fh = Multimodal.videoFrameHashes(
      Multimodal.syntheticVideos(spark, "/root/testdata/sf0.001"))
    // every video contributed one fingerprint per frame (12, or 10 trimmed)
    val perDoc = fh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(0L) == 12L && perDoc(1L) == 10L && perDoc(2L) == 12L)
    val pairs = Multimodal.videoDupPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // trim keeps every remaining shot: containment 1.0 against the base
    assert(pairs((0L, 1L)) == 1.0)
    // re-edit shares 8 of 12 shots with the base
    assert(pairs((0L, 2L)) == 0.6667)
    // trimmed vs re-edit share shots 2..7: 6 of min(10,12)
    assert(pairs((1L, 2L)) == 0.6)
    // no pair crosses a triplet boundary (shots are group-unique)
    assert(pairs.keys.forall { case (i, j) => i / 3 == j / 3 })
  }

  test("m06 gate: containment rollup bounded by the variant structure") {
    val got = Multimodal.m06VideoDupStats(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // exactly the three planted containment levels appear
    assert(got.keySet == Set(0.6, 0.6667, 1.0), s"levels: ${got.keySet}")
    // one pair per level per complete triplet; the trailing partial
    // triplet (500 docs = 166 triplets + a base/trim pair) adds one 1.0
    val triplets = 500L / 3
    assert(got(0.6) == triplets && got(0.6667) == triplets)
    assert(got(1.0) == triplets + 1)
  }

  test("m09 gate: planted shot structure recovered exactly for every video") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.videoShots(Multimodal.videoFrameHashes(
        Multimodal.syntheticShotVideos(spark, "/root/testdata/sf0.001")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (docId, (nFrames, nShots)) =>
      val wantShots = 2 + (docId % 4)
      val wantFrames = (0 until wantShots.toInt).map(s => 3 + s % 3).sum
      assert(nShots == wantShots, s"doc $docId: $nShots shots, want $wantShots")
      assert(nFrames == wantFrames, s"doc $docId: $nFrames frames, want $wantFrames")
    }
  }

  test("m10 gate: text->image retrieval — rank contract and m07 consistency") {
    val dir = "/root/testdata/sf0.001"
    val rows = Multimodal.m10CrossModalRetrieval(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      // ranks 1..5, self excluded, scores non-increasing with rank
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
      assert(!rs.map(_._3).contains(q), s"query $q retrieved its own image")
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
        s"scores not monotone for query $q")
    }
    // consistency with m07: a query whose caption tower is one chunk
    // (qv == its vision vector) must rank images exactly like the
    // vision-vector kNN does — its top-1 equals s01-style retrieval
    val oneChunk = Multimodal.m07ClipAlign(spark, dir).collect()
      .filter(r => r.getLong(1) == 1L && r.getLong(0) % 50 == 0).map(_.getLong(0))
    if (oneChunk.nonEmpty) {
      import org.apache.spark.sql.functions._
      val e = Dedup.normalizedVectors(spark, dir)
      val q = e.filter(col("vec_id").isin(oneChunk: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
      val expect = Similarity.bruteTopK(e, q, k = 1).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      oneChunk.foreach { qid =>
        val got = rows.filter(r => r._1 == qid && r._2 == 1L).head._3
        assert(got == expect(qid), s"query $qid: top-1 $got != vision kNN ${expect(qid)}")
      }
    }
  }

  test("m07 gate: single-chunk pairs align perfectly, score decays with chunks") {
    val rows = Multimodal.m07ClipAlign(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // a one-chunk caption IS the vision vector: cosine exactly 1
    rows.filter(_._2 == 1L).foreach { case (id, _, s, k) =>
      assert(s == 1.0 && k == 1L, s"doc $id: single-chunk score $s")
    }
    assert(rows.exists(_._2 > 1L), "fixture has no multi-chunk docs")
    // both classes present — the threshold actually separates
    assert(rows.exists(_._4 == 0L) && rows.exists(_._4 == 1L))
    // score decays with chunk count on average (near-orthogonal
    // rotations: cos ~ 1/sqrt(m))
    val byM = rows.groupBy(_._2).view.mapValues(g => g.map(_._3).sum / g.size)
    val ms = byM.keys.toSeq.sorted
    assert(byM(ms.head) > byM(ms.last),
      s"no decay: m=${ms.head} -> ${byM(ms.head)}, m=${ms.last} -> ${byM(ms.last)}")
  }

  test("m11 gate: sharding conserves per-lang tokens and doc counts vs m08") {
    val dir = "/root/testdata/sf0.001"
    val m08Rows = Multimodal.m08InterleavedPacking(spark, dir).collect()
    val m11Rows = Multimodal.m11ShardedInterleavedPacking(spark, dir).collect()
    val m08 = m08Rows
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val m11 = m11Rows
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
    // every (lang, shard) stream packs independently, but nothing is
    // lost or double-counted: per-lang text/image tokens and
    // multimodal doc counts sum back to m08's
    val rollup = m11.groupBy(_._1).view.mapValues { rs =>
      (rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._5).sum)
    }.toMap
    assert(rollup.nonEmpty && rollup == m08,
      s"sharding lost tokens: $rollup vs $m08")
    // the image rule (% 4) is coprime with the shard key (% 5): every
    // shard must carry some multimodal docs
    assert(m11.forall(_._5 > 0), "a shard carries no multimodal docs")
    // shard streams are genuinely smaller: every shard needs fewer
    // sequences than its language's unsharded stream
    val m08Seqs = m08Rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val m11Seqs = m11Rows.map(r => (r.getString(0), r.getLong(2)))
    assert(m11Seqs.forall { case (lang, s) => s < m08Seqs(lang) })
  }

  test("m12 gate: diff-maintained fingerprint index equals a rebuild; planted groups move") {
    val dir = "/root/testdata/sf0.001"
    def groups(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inc = groups(Multimodal.m12ImageIndexMaintenance(spark, dir))
    assert(inc.nonEmpty && inc == groups(Multimodal.m12FullRebuildProbe(spark, dir)))
    val ids = Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).sorted
    // pattern 7's group is gone (deleted), pattern 3's docs moved to a
    // NEW group (re-crawled content), the added images form one group
    // with the smallest (most negative) rep
    val reps = inc.map(_._1).toSet
    assert(!reps.contains(7L), "deleted pattern group survived")
    val changedCount = ids.count(_ % 10 == 3).toLong
    assert(inc.exists { case (rep, n) => rep == 3L && n == changedCount },
      "re-crawled docs did not form their new group")
    val addedCount = ids.count(_ % 10 == 0).toLong
    assert(inc.exists { case (rep, n) => rep < 0 && n == addedCount },
      "added images did not form their group")
    // the streamed change-feed consumer lands exactly where the batch
    // loop lands (append-log newest-gen resolution is slicing-invariant)
    assert(groups(Multimodal.st24StreamImageIndex(spark, dir)) == inc)
  }
}
