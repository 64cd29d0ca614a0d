package graft.codec

/** Character-substitution codecs for key components.
  *
  * Two character sets, as in the reference: the URI set `{/ → %1,
  * % → %0}` (`utils/uri.py:10`) and the filename set `{/ → %1, _ → %2,
  * % → %0}` (`jsondb/jsonfiledb.py:65`). Substitution order matters on
  * decode: `%` expansions are restored last so `%0`/`%1`/`%2` sequences
  * produced by encoding are unambiguous (`utils/encode.py:9-39`).
  */
object ArgCodec {

  /** Encode: single-pass character translation (each *character* maps
    * to its replacement string, like Python's str.translate). */
  def encode(s: String, chars: Seq[(Char, String)]): String = {
    val m = chars.toMap
    val sb = new StringBuilder(s.length)
    s.foreach(c => m.get(c) match {
      case Some(rep) => sb.append(rep)
      case None      => sb.append(c)
    })
    sb.toString
  }

  /** Decode: sequential replace in declaration order (the reference
    * decodes by replacing each mapping in dict order; `%` last). */
  def decode(s: String, chars: Seq[(Char, String)]): String =
    chars.foldLeft(s) { case (acc, (c, rep)) => acc.replace(rep, c.toString) }

  /** URI-arg character set (`uri.py:10`): `%` must stay last. */
  val uriChars: Seq[(Char, String)] = Seq('/' -> "%1", '%' -> "%0")

  /** Filename character set (`jsonfiledb.py:65`): `%` must stay last. */
  val fnameChars: Seq[(Char, String)] = Seq('/' -> "%1", '_' -> "%2", '%' -> "%0")

  def encodeUriArg(s: String): String = encode(s, uriChars)
  def decodeUriArg(s: String): String = decode(s, uriChars)
  def encodeFname(s: String): String = encode(s, fnameChars)
  def decodeFname(s: String): String = decode(s, fnameChars)
}
