package graft.codec

import graft.core.{Route, TemplateNotFound}

/** Version-aware template resolution: maps a route (plus substitution
  * args) to the physical path/table template for the data generation
  * that wrote the experiment.
  *
  * Mirrors the reference's StringMapper with VersionConstraintMapper
  * (`min_version <= v < max_version`) and PriorityMapper (first
  * template whose placeholders are all bound) —
  * `/root/reference/src/aerovaldb/utils/string_mapper/mapper.py:105-226`.
  */
object StringMapper {
  sealed trait Mapper
  /** Always resolves to `template`. */
  final case class Constant(template: String) extends Mapper
  /** Resolves iff `min <= version < max` (either bound optional). */
  final case class VersionConstraint(template: String,
                                     minVersion: Option[Pep440Version] = None,
                                     maxVersion: Option[Pep440Version] = None) extends Mapper
  /** Resolves to the first template whose placeholders are all bound
    * by the provided args. */
  final case class Priority(templates: Seq[String]) extends Mapper

  object VersionConstraint {
    def min(template: String, v: String): VersionConstraint =
      VersionConstraint(template, minVersion = Some(Pep440Version.parse(v)))
    def max(template: String, v: String): VersionConstraint =
      VersionConstraint(template, maxVersion = Some(Pep440Version.parse(v)))
    def range(template: String, lo: String, hi: String): VersionConstraint =
      VersionConstraint(template, Some(Pep440Version.parse(lo)), Some(Pep440Version.parse(hi)))
  }
}

/** @param table        route → ordered mapper candidates
  * @param versionProvider (project, experiment) → data version; called
  *        lazily, only when a VersionConstraint mapper is consulted.
  */
final class StringMapper(table: Map[Route, Seq[StringMapper.Mapper]],
                         versionProvider: (String, String) => Pep440Version) {
  import StringMapper._

  /** Resolve the first mapper that accepts; TemplateNotFound if none. */
  def lookup(route: Route, subs: Map[String, String]): String = {
    val mappers = table.getOrElse(route,
      throw new TemplateNotFound(s"No template table entry for route $route"))
    mappers.view.flatMap {
      case Constant(t) => Some(t)
      case VersionConstraint(t, lo, hi) =>
        val v = versionProvider(subs.getOrElse("project", ""), subs.getOrElse("experiment", ""))
        if (lo.exists(v < _) || hi.exists(v >= _)) None else Some(t)
      case Priority(templates) =>
        templates.find { t =>
          TemplateCodec.extractSubstitutions(t).forall(subs.contains)
        }
    }.headOption.getOrElse(
      throw new TemplateNotFound(s"No template found for route $route with args $subs"))
  }
}
