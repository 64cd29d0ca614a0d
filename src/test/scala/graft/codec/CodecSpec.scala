package graft.codec

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Route

/** Ported from the reference codec tests
  * (`/root/reference/tests/test_utils.py:13-115`) plus ScalaCheck
  * round-trip properties. */
class CodecSpec extends AnyFunSuite {
  // seeded sampling in place of a property-testing harness (offline
  // build has scalatest only)
  private val rnd = new scala.util.Random(42)
  private def randomString(maxLen: Int, chars: String): String =
    (0 until rnd.nextInt(maxLen)).map(_ => chars(rnd.nextInt(chars.length))).mkString


  // ---- extract_substitutions ----
  test("extract substitutions") {
    assert(TemplateCodec.extractSubstitutions("{A}{B}{C}").toSet == Set("A", "B", "C"))
    assert(TemplateCodec.extractSubstitutions("{A}hello world{B} test {C}").toSet == Set("A", "B", "C"))
    assert(TemplateCodec.extractSubstitutions("").isEmpty)
  }

  // ---- parse_formatted_string ----
  test("parse formatted string") {
    assert(TemplateCodec.parseFormattedString("{test}", "hello") == Map("test" -> "hello"))
    assert(TemplateCodec.parseFormattedString("ABCD{test}1234", "ABCDhelloworld1234") ==
      Map("test" -> "helloworld"))
    assert(TemplateCodec.parseFormattedString("test/{a}/{b}/{c}/{d}", "test/A/B/C/D") ==
      Map("a" -> "A", "b" -> "B", "c" -> "C", "d" -> "D"))
  }

  test("parse formatted string errors") {
    val e1 = intercept[Exception](TemplateCodec.parseFormattedString("{a}{b}", "abcd"))
    assert(e1.getMessage.contains("can not be disambiguated"))
    val e2 = intercept[Exception](
      TemplateCodec.parseFormattedString("{a}b{b}c", "testbhellotestblah"))
    assert(e2.getMessage.contains("did not match template string"))
  }

  test("format/parse round trip on route templates") {
    for (_ <- 0 until 50) {
      val a = randomString(12, "abcdefghij0123456789") + "x"
      val b = randomString(12, "klmnopqrst0123456789") + "y"
      for (route <- Route.all) {
        val subs = route.argNames.zipWithIndex.map { case (n, i) =>
          n -> (if (i % 2 == 0) a else b)
        }.toMap
        val s = TemplateCodec.format(route.template, subs)
        assert(TemplateCodec.parseFormattedString(route.template, s) == subs)
      }
    }
  }

  // ---- encode/decode ----
  test("encode/decode arg (uri charset)") {
    val cases = Seq(
      "" -> "",
      "%" -> "%0",
      "/" -> "%1",
      "hello-world/hello%1234" -> "hello-world%1hello%01234",
      "%/" * 5 -> "%0%1" * 5)
    for ((in, expected) <- cases) {
      val enc = ArgCodec.encodeUriArg(in)
      assert(enc == expected)
      assert(ArgCodec.decodeUriArg(enc) == in)
    }
  }

  test("encode/decode fname round trip property") {
    for (_ <- 0 until 500) {
      val s = randomString(24, "ab/_%0129 \t-")
      assert(ArgCodec.decodeFname(ArgCodec.encodeFname(s)) == s)
      assert(ArgCodec.decodeUriArg(ArgCodec.encodeUriArg(s)) == s)
    }
  }

  test("fname-encoded path templates round-trip through parse") {
    // the physical-layout templates join args with '_'/'-'; encoded
    // values contain neither '/' nor '_', so parse is unambiguous for
    // values without '-'
    val templates = Seq(
      "./{project}/{experiment}/hm/glob_stats_{frequency}.json",
      "./{project}/{experiment}/ts/{location}_{network}_{obsvar}_{layer}.json",
      "./{project}/{experiment}/map/{network}_{obsvar}_{layer}_{model}_{modvar}_{time}.json",
      "./{project}/{experiment}/contour/{obsvar}_{model}/{obsvar}_{model}_{timestep}.geojson")
    for (_ <- 0 until 100) {
      val raw = randomString(10, "abc012/_% ") + "x"
      val enc = ArgCodec.encodeFname(raw)
      for (t <- templates) {
        val names = TemplateCodec.extractSubstitutions(t).distinct
        val subs = names.map(_ -> enc).toMap
        val s = TemplateCodec.format(t, subs)
        val parsed = TemplateCodec.parseFormattedString(t, s)
        assert(parsed.values.forall(v => ArgCodec.decodeFname(v) == raw))
      }
    }
  }

  test("fname encoding example from reference tests") {
    // tests/jsondb/test_jsonfiledb.py:101-111
    assert(ArgCodec.encodeFname("FFire2022_eea") == "FFire2022%2eea")
  }

  // ---- parse_uri ----
  test("parse uri") {
    assert(UriCodec.parse("/v0/experiments/project") ==
      ((Route.Experiments, Map("project" -> "project"), Map.empty)))
    val (r, args, kw) = UriCodec.parse(
      "/v0/map/project/experiment/network/obsvar/layer/model/modvar?time=time")
    assert(r == Route.MapRoute)
    assert(args == Map("project" -> "project", "experiment" -> "experiment",
      "network" -> "network", "obsvar" -> "obsvar", "layer" -> "layer",
      "model" -> "model", "modvar" -> "modvar"))
    assert(kw == Map("time" -> "time"))
  }

  test("parse uri error") {
    intercept[IllegalArgumentException](UriCodec.parse("??"))
  }

  test("build/parse uri round trip with special characters") {
    val args = Map("project" -> "pro/ject", "experiment" -> "exp%1", "frequency" -> "day")
    val uri = UriCodec.build(Route.GlobStats, args, Map("extra" -> "va/lue"))
    val (r, a, kw) = UriCodec.parse(uri)
    assert(r == Route.GlobStats)
    assert(a == args)
    assert(kw == Map("extra" -> "va/lue"))
  }

  // ---- PEP 440 version ordering ----
  test("version ordering") {
    import Pep440Version.{parse => v}
    assert(v("0.0.5") < v("0.12.2"))
    assert(v("0.12.2") < v("0.13.2"))
    assert(v("0.13.2") < v("0.13.5"))
    assert(v("0.29.0.dev1") < v("0.29.0"))
    assert(v("0.28.9") < v("0.29.0.dev1"))
    assert(v("0.13.5") >= v("0.13.2"))
    assert(v("1.0").compare(v("1.0.0")) == 0)
    assert(v("0.29.0rc1") < v("0.29.0"))
    assert(v("0.29.0.dev1") < v("0.29.0rc1"))
  }

  // ---- legacy arg fix-ups ----
  test("post process map args: obsvar/modvar resplit") {
    val (args, _) = LegacyArgs.postProcessArgs(Route.MapRoute,
      Map("network" -> "network", "obsvar" -> "obs-var", "layer" -> "layer",
        "model" -> "model", "modvar" -> "mod-var"),
      Map.empty, Pep440Version.parse("0.12.0"))
    assert(args("network") == "network-obs")
    assert(args("obsvar") == "var")
    assert(args("model") == "model-mod")
    assert(args("modvar") == "var")
  }

  test("post process timeseries args pre-0.29") {
    val (args, _) = LegacyArgs.postProcessArgs(Route.Timeseries,
      Map("location" -> "loc", "network" -> "net_work", "obsvar" -> "obs-var", "layer" -> "l"),
      Map.empty, Pep440Version.parse("0.13.5"))
    // obsvar resplits into network first, then network '_' resplits into location
    assert(args("obsvar") == "var")
    assert(args("location") == "loc_net")
    assert(args("network") == "work-obs")
  }

  test("post process timeseries args post-0.29 is identity") {
    val in = Map("location" -> "loc", "network" -> "net_work", "obsvar" -> "obs-var", "layer" -> "l")
    val (args, _) = LegacyArgs.postProcessArgs(Route.Timeseries, in, Map.empty,
      Pep440Version.parse("0.29.0"))
    assert(args == in)
  }

  test("post process heatmap_ts kwargs mid-generation") {
    val (_, kw) = LegacyArgs.postProcessArgs(Route.HeatmapTimeseries, Map.empty,
      Map("region" -> "reg", "network" -> "net", "obsvar" -> "obs-var", "layer" -> "lay"),
      Pep440Version.parse("0.13.0"))
    assert(kw("obsvar") == "var")
    assert(kw("network") == "net-obs")
  }
}
