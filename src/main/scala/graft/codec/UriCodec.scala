package graft.codec

import graft.core.Route

/** Canonical asset-URI codec: route template instantiated with
  * URI-encoded args plus `?k=v` query kwargs.
  *
  * Mirrors `/root/reference/src/aerovaldb/utils/uri.py:129-190`, minus
  * the reference's accidental mutation of caller dicts in `build_uri`
  * (`uri.py:181-184`) — observable output is identical.
  */
object UriCodec {

  /** Serialize (route, routeArgs, kwargs) to the canonical URI. */
  def build(route: Route, routeArgs: Map[String, String],
            kwargs: Map[String, String] = Map.empty): String = {
    val encoded = routeArgs.map { case (k, v) => k -> ArgCodec.encodeUriArg(v) }
    val base = TemplateCodec.format(route.template, encoded)
    if (kwargs.isEmpty) base
    else {
      val qs = kwargs.map { case (k, v) => s"$k=${ArgCodec.encodeUriArg(v)}" }.mkString("&")
      s"$base?$qs"
    }
  }

  /** Parse a URI back to (route, routeArgs, kwargs). Route templates
    * are tried in declaration order; the first full match wins
    * (`uri.py:129-177`). */
  def parse(uri: String): (Route, Map[String, String], Map[String, String]) = {
    val split = uri.split("\\?", 2)
    val path = split(0)
    val kwargs: Map[String, String] =
      if (split.length == 2 && split(1).nonEmpty)
        split(1).split("&").toSeq.map { pair =>
          val kv = pair.split("=", 2)
          kv(0) -> (if (kv.length == 2) kv(1) else "")
        }.toMap
      else Map.empty

    for (route <- Route.all) {
      try {
        val raw = TemplateCodec.parseFormattedString(route.template, path)
        val args = raw.map { case (k, v) => k -> ArgCodec.decodeUriArg(v) }
        val kw = kwargs.map { case (k, v) => k -> ArgCodec.decodeUriArg(v) }
        return (route, args, kw)
      } catch {
        case _: TemplateCodec.TemplateMismatch => // try next route
      }
    }
    throw new IllegalArgumentException(s"URI $uri is not a valid URI.")
  }
}
