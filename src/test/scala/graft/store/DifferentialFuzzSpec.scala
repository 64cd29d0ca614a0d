package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AccessType, AssetValue, Route}

/** Differential fuzz: the two backends are interchangeable, so the
  * SAME seeded random operation sequence applied to both must be
  * observably identical at every step — gets (hit and miss, with and
  * without cache), catalog queries, listings, and deletes, across
  * overwrites that exercise cache invalidation and newest-row
  * resolution. Restricted to routes where the backends have no
  * documented deviation (COVERAGE.md "Known deviations").
  */
class DifferentialFuzzSpec extends AnyFunSuite {

  private val Projects = Seq("pa", "pb")
  private val Experiments = Seq("e1", "e2", "e3")
  private val Freqs = Seq("daily", "monthly")

  /** The reference's jsondb appends `?version=...` to query URIs
    * (`jsonfiledb.py:595`) while its sqlite `list_all` rebuilds URIs
    * without it (`sqlitedb.py:613-626`) — a preserved backend
    * divergence, normalized away for the comparison. */
  private def stripVersion(uri: String): String = uri.split("\\?", 2) match {
    case Array(base) => base
    case Array(base, qs) =>
      val kept = qs.split("&").filterNot(_.startsWith("version="))
      if (kept.isEmpty) base else base + "?" + kept.mkString("&")
  }

  private def observableState(db: AssetStore): Seq[(String, String)] = {
    val listed = db.listAll().map(stripVersion).sorted.mkString("|")
    val gets = for {
      p <- Projects; e <- Experiments
      (name, thunk) <- Seq[(String, () => AssetValue)](
        ("menu", () => db.getMenu(p, e)),
        ("config", () => db.getConfig(p, e)),
        ("ranges", () => db.getRanges(p, e)),
        ("menu_cached", () => db.getMenu(p, e, cache = true)),
        ("default", () => db.getMenu(p, e, default = Some(AssetValue.Json("{}")))))
    } yield (s"$name/$p/$e",
      try thunk() match {
        case AssetValue.Json(s) => s"json:$s"
        case other => s"other:$other"
      } catch {
        case _: java.io.FileNotFoundException => "missing"
      })
    val glob = for (p <- Projects; e <- Experiments; f <- Freqs) yield
      (s"glob/$p/$e/$f",
        try db.getGlobStats(p, e, f) match {
          case AssetValue.Json(s) => s"json:$s"
          case other => s"other:$other"
        } catch { case _: java.io.FileNotFoundException => "missing" })
    val queries = for (p <- Projects) yield
      (s"query/$p",
        db.query(Seq(Route.Menu, Route.Config, Route.Ranges, Route.GlobStats),
          Map("project" -> p)).map(e => stripVersion(e.uri)).sorted.mkString("|"))
    (("list", listed) +: gets) ++ glob ++ queries
  }

  test("seeded random op sequences are backend-equivalent") {
    val spark = SparkTestSession.spark
    val jsonDir = graft.core.TempDirs.create("graft-fuzz-json")
    val a: AssetStore = new JsonFileStore(jsonDir.toString)
    val b: AssetStore = new TableStore(spark,
      graft.core.TempDirs.create("graft-fuzz-tbl").toString)
    val rnd = new scala.util.Random(20260812L)
    try {
      var step = 0
      for (round <- 0 until 12) {
        // a burst of 1-6 random mutations applied to BOTH backends
        for (_ <- 0 to rnd.nextInt(5)) {
          step += 1
          val p = Projects(rnd.nextInt(Projects.size))
          val e = Experiments(rnd.nextInt(Experiments.size))
          val payload = s"""{"step": $step, "r": ${rnd.nextInt(1000)}}"""
          rnd.nextInt(5) match {
            case 0 => a.putMenu(payload, p, e); b.putMenu(payload, p, e)
            case 1 => a.putConfig(payload, p, e); b.putConfig(payload, p, e)
            case 2 => a.putRanges(payload, p, e); b.putRanges(payload, p, e)
            case 3 =>
              val f = Freqs(rnd.nextInt(Freqs.size))
              a.putGlobStats(payload, p, e, f); b.putGlobStats(payload, p, e, f)
            case 4 =>
              // delete a random existing asset (if any) on both
              a.listAll().sorted.headOption.foreach { uri =>
                a.rmByUri(uri)
                b.rmByUri(uri)
              }
          }
        }
        val (sa, sb) = (observableState(a), observableState(b))
        val diff = sa.zip(sb).filter { case (x, y) => x != y }
        assert(diff.isEmpty,
          s"backends diverged after round $round (${diff.size} keys):\n" +
            diff.take(5).map { case (x, y) => s"  json=$x\n  tbl =$y" }.mkString("\n"))
      }
    } finally { a.close(); b.close() }
  }
}
