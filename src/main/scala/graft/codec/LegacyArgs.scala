package graft.codec

import graft.core.Route

/** Legacy filename disambiguation fix-ups.
  *
  * Pre-0.29 layouts join several key components with `-`/`_` in one
  * filename token, so reverse-parsing a path can mis-split keys that
  * themselves contain those characters. These fix-ups re-split the
  * parsed args per route and data version — semantics from
  * `/root/reference/src/aerovaldb/jsondb/backwards_compatibility.py:11-127`.
  */
object LegacyArgs {

  private val v0290dev1 = Pep440Version.parse("0.29.0.dev1")
  private val v0122 = Pep440Version.parse("0.12.2")
  private val v0132 = Pep440Version.parse("0.13.2")

  /** Move all leading `-`-segments of `args(src)` onto the tail of
    * `args(dst)`: e.g. obsvar "net-obs-var" → obsvar "var",
    * network += "-net-obs". */
  private def resplitDash(args: Map[String, String], src: String, dst: String): Map[String, String] =
    if (args.get(src).exists(_.contains("-"))) {
      val parts = args(src).split("-", -1)
      args + (src -> parts.last) + (dst -> (args(dst) + "-" + parts.init.mkString("-")))
    } else args

  private def resplitUnderscore(args: Map[String, String], src: String, dst: String): Map[String, String] =
    if (args.get(src).exists(_.contains("_"))) {
      val parts = args(src).split("_", -1)
      args + (src -> parts.last) + (dst -> (args(dst) + "_" + parts.init.mkString("_")))
    } else args

  def postProcessArgs(route: Route, args: Map[String, String],
                      kwargs: Map[String, String],
                      version: Pep440Version): (Map[String, String], Map[String, String]) =
    route match {
      case Route.MapRoute =>
        val a1 = resplitDash(args, "obsvar", "network")
        val a2 = if (a1.get("modvar").exists(_.contains("-"))) {
          val parts = a1("modvar").split("-", -1)
          a1 + ("modvar" -> parts.last) + ("model" -> (a1("model") + "-" + parts.init.mkString("-")))
        } else a1
        (a2, kwargs)

      case Route.Timeseries | Route.TimeseriesWeekly =>
        if (version >= v0290dev1) (args, kwargs)
        else {
          val a1 = resplitDash(args, "obsvar", "network")
          val a2 = resplitUnderscore(a1, "network", "location")
          (a2, kwargs)
        }

      case Route.Scatter | Route.Forecast =>
        (resplitDash(args, "obsvar", "network"), kwargs)

      case Route.HeatmapTimeseries =>
        if (version >= v0290dev1 || version <= v0122) (args, kwargs)
        else if (version <= v0132) (args, resplitDash(kwargs, "obsvar", "network"))
        else {
          // region-network-obsvar-layer joined with '-': layer and
          // obsvar cannot contain '-'; region cannot contain '_'.
          val joined = Seq("region", "network", "obsvar", "layer").map(kwargs(_)).mkString("-")
          val parts = joined.split("-", -1).toBuffer
          val layer = parts.remove(parts.length - 1)
          val obsvar = parts.remove(parts.length - 1)
          val region = parts.remove(0)
          val network = parts.mkString("-")
          (args, kwargs + ("layer" -> layer) + ("obsvar" -> obsvar) +
            ("region" -> region) + ("network" -> network))
        }

      case _ => (args, kwargs)
    }
}
