package graft.spec

/** `$vocabulary` gating — the analog of the reference refusing to build a
  * validator when the schema's dialect REQUIRES a vocabulary the
  * implementation does not know
  * (`/root/reference/crates/jsonschema-referencing/src/vocabularies.rs`,
  * keyword availability gating `crates/jsonschema/src/keywords/mod.rs:261-541`).
  *
  * `$vocabulary` is meaningful at a resource root (i.e. in a meta-schema):
  * entries mapped to `true` are required — an implementation that does not
  * recognize such a URI must refuse to process schemas of that dialect.
  * Unknown OPTIONAL (`false`) vocabularies are permitted.
  */
object Vocabularies {

  /** Vocabularies this engine implements: the 2020-12 family plus the
    * optional format-assertion vocabulary (surfaced as the assertFormats
    * compile option). */
  val known: Set[String] = Set(
    "https://json-schema.org/draft/2020-12/vocab/core",
    "https://json-schema.org/draft/2020-12/vocab/applicator",
    "https://json-schema.org/draft/2020-12/vocab/unevaluated",
    "https://json-schema.org/draft/2020-12/vocab/validation",
    "https://json-schema.org/draft/2020-12/vocab/meta-data",
    "https://json-schema.org/draft/2020-12/vocab/format-annotation",
    "https://json-schema.org/draft/2020-12/vocab/format-assertion",
    "https://json-schema.org/draft/2020-12/vocab/content")

  /** Unknown vocabularies REQUIRED by the schema root (empty = processable). */
  def unknownRequired(spec: Spec): Vector[String] = spec match {
    case o: Spec.Obj =>
      o.vocabulary.toVector.flatten.collect { case (uri, true) if !known(uri) => uri }
    case _ => Vector.empty
  }

  /** Build-time gate: refuse a schema whose root requires vocabularies
    * this engine does not implement. */
  def check(spec: Spec): Unit = {
    val unknown = unknownRequired(spec)
    if (unknown.nonEmpty)
      throw new SpecError(
        s"schema requires unknown vocabularies: ${unknown.mkString(", ")}")
  }
}
