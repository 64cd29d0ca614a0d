package graft.codec

/** Minimal PEP 440 version for the orderings the engine needs:
  * dotted release numbers with optional pre-release (`a`/`b`/`rc`) and
  * development (`.devN`) segments, e.g. `0.13.2`, `0.29.0.dev1`.
  *
  * Ordering rules exercised by the reference layouts
  * (`/root/reference/src/aerovaldb/jsondb/jsonfiledb.py:94-185`):
  * release tuples compare numerically with zero-padding, and
  * `X.Y.Z.devN < X.Y.Z(aN|bN|rcN) < X.Y.Z`.
  */
final case class Pep440Version(release: Seq[Int], pre: Option[(String, Int)],
                               dev: Option[Int]) extends Ordered[Pep440Version] {

  private def preRank: Int = pre match {
    case Some(("a", _))  => 1
    case Some(("b", _))  => 2
    case Some(("rc", _)) => 3
    case None            => 4 // final
    case Some((_, _))    => 0
  }

  def compare(that: Pep440Version): Int = {
    val n = math.max(release.length, that.release.length)
    val a = release.padTo(n, 0)
    val b = that.release.padTo(n, 0)
    val relCmp = a.zip(b).collectFirst { case (x, y) if x != y => x.compare(y) }.getOrElse(0)
    if (relCmp != 0) return relCmp
    // dev segment sorts before everything else at the same release/pre
    val devRankThis = if (dev.isDefined && pre.isEmpty) 0 else preRank
    val devRankThat = if (that.dev.isDefined && that.pre.isEmpty) 0 else that.preRank
    if (devRankThis != devRankThat) return devRankThis.compare(devRankThat)
    val preCmp = (pre, that.pre) match {
      case (Some((_, x)), Some((_, y))) => x.compare(y)
      case _                            => 0
    }
    if (preCmp != 0) return preCmp
    (dev, that.dev) match {
      case (Some(x), Some(y)) => x.compare(y)
      case (Some(_), None)    => -1
      case (None, Some(_))    => 1
      case (None, None)       => 0
    }
  }

  override def toString: String =
    release.mkString(".") +
      pre.map { case (t, n) => s"$t$n" }.getOrElse("") +
      dev.map(n => s".dev$n").getOrElse("")
}

object Pep440Version {
  private val Re =
    """(?i)v?(\d+(?:\.\d+)*)(?:(a|b|rc|c|alpha|beta|pre|preview)\.?(\d*))?(?:[._-]?dev\.?(\d*))?""".r

  def parse(s: String): Pep440Version = s.trim match {
    case Re(rel, preTag, preNum, devNum) =>
      val release = rel.split("\\.").toSeq.map(_.toInt)
      val pre = Option(preTag).map { t =>
        val tag = t.toLowerCase match {
          case "alpha"             => "a"
          case "beta"              => "b"
          case "c" | "pre" | "preview" => "rc"
          case other               => other
        }
        (tag, if (preNum == null || preNum.isEmpty) 0 else preNum.toInt)
      }
      val dev = Option(devNum).map(d => if (d.isEmpty) 0 else d.toInt)
      Pep440Version(release, pre, dev)
    case other =>
      throw new IllegalArgumentException(s"Cannot parse version '$other'")
  }
}
