package graft.codec

/** Template string codec: placeholder extraction, `format`-style
  * instantiation, and its inverse (greedy segment matching).
  *
  * Semantics follow the reference (`/root/reference/src/aerovaldb/utils/
  * uri.py:32-126`): greedy left-to-right matching, a configurable set of
  * single characters that force a split between tokens (default `/`),
  * and rejection of adjacent placeholders as ambiguous.
  */
object TemplateCodec {

  private val PlaceholderRe = "\\{([a-zA-Z-]*?)\\}".r

  /** Names between curly brackets, in order (`uri.py:32-38`). */
  def extractSubstitutions(template: String): Seq[String] =
    PlaceholderRe.findAllMatchIn(template).map(_.group(1)).toSeq

  /** Instantiate a `{name}`-style template. Missing keys throw. */
  def format(template: String, subs: Map[String, String]): String =
    PlaceholderRe.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        subs.getOrElse(m.group(1),
          throw new NoSuchElementException(s"Missing template arg '${m.group(1)}'"))))

  final case class TemplateMismatch(msg: String) extends Exception(msg)

  /** Inverse of [[format]] — extracts placeholder values from a
    * formatted string (`uri.py:41-126`).
    *
    * Matching is greedy per placeholder: consume characters until the
    * remainder starts with the next literal token, a force-split char
    * is hit, or the string ends. Adjacent placeholders are rejected.
    */
  def parseFormattedString(template: String, string: String,
                           forceSplit: Seq[Char] = Seq('/')): Map[String, String] = {
    // split template into literal and '{name}' segments, dropping empties
    val segments: List[String] = {
      val b = List.newBuilder[String]
      var last = 0
      for (m <- PlaceholderRe.findAllMatchIn(template)) {
        if (m.start > last) b += template.substring(last, m.start)
        b += m.matched
        last = m.end
      }
      if (last < template.length) b += template.substring(last)
      b.result()
    }

    var rest = string
    var segs = segments
    val result = scala.collection.mutable.LinkedHashMap.empty[String, String]

    var broke = false
    while (segs.nonEmpty && !broke) {
      val token = segs.head
      val nextToken = segs.drop(1).headOption
      if (token.startsWith("{")) {
        val extracted: String = nextToken match {
          case Some(nt) =>
            if (nt.startsWith("{"))
              throw TemplateMismatch(
                s"Two successive keywords can not be disambiguated (s='$string'; template='$template')")
            val sb = new StringBuilder
            var i = 0
            var stop = false
            while (!stop && i < rest.length && !rest.substring(i).startsWith(nt)) {
              val ch = rest.charAt(i)
              if (forceSplit.contains(ch)) stop = true
              else { sb.append(ch); i += 1 }
            }
            sb.toString
          case None => rest
        }
        result(token.substring(1, token.length - 1)) = extracted
        rest = rest.substring(extracted.length)
        segs = segs.tail
      } else {
        if (!rest.startsWith(token)) broke = true
        else { rest = rest.substring(token.length); segs = segs.tail }
      }
    }
    if (segs.nonEmpty)
      throw TemplateMismatch(s"Formatted string '$string' did not match template string '$template'")
    result.toMap
  }
}
