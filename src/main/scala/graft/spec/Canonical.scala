package graft.spec

/** Spec canonicalizer-lite — the analog of the reference's canonical
  * module (`/root/reference/crates/jsonschema/src/canonical/mod.rs:1-108`):
  * rewrites a spec to a simpler form WITHOUT changing the accepted set.
  * Like the reference, this is a separate API verb (`canonicalize`,
  * `lib.rs:1559`), not silently applied at compile time.
  *
  * Implemented rewrites (SURVEY §4.3):
  *  - allOf folding / constraint intersection (`algebra.rs:24`)
  *  - contradiction ⇒ Reject (`emptiness.rs`): min>max, minLength>maxLength,
  *    minItems>maxItems, empty type set, empty enum
  *  - interval/const equivalence: {type:integer, min:k, max:k} ≡ {const:k}
  *  - enum dedup (`canonical/mod.rs:38-42`)
  *  - combinator simplification: drop Reject branches from anyOf/oneOf,
  *    Accept-dominance, not/not-elimination, if-with-constant-condition
  */
object Canonical {

  def canonicalize(s: Spec): Spec =
    // Conservative fallback (the reference passes unsupported constructs
    // through as Raw, canonical/mod.rs:44-47): structure rewrites move
    // subschemas, which would dangle JSON-pointer refs and change anchor /
    // dynamic-scope resolution — leave such documents untouched.
    if (usesAdvancedReferencing(s)) s
    else canon(s, annotationsMatter = containsUnevaluated(s))

  /** Any $id, $anchor, dynamic/recursive anchors-or-refs, or a $ref that
    * is not of the root-defs form (#, #/$defs/x, #/definitions/x)? */
  def usesAdvancedReferencing(s: Spec): Boolean = s match {
    case o: Spec.Obj =>
      o.id.nonEmpty || o.anchor.nonEmpty || o.dynamicAnchor.nonEmpty ||
        o.recursiveAnchor || o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty ||
        o.ref.exists(r => r != "#" && !r.startsWith("#/$defs/") && !r.startsWith("#/definitions/")) ||
        (Canonical.subschemas(o) ++ o.contentSchema).exists(usesAdvancedReferencing)
    case _ => false
  }

  /** `annotationsMatter`: the document carries unevaluatedProperties /
    * unevaluatedItems somewhere, so rewrites that drop SUCCESSFUL branches
    * (whose annotations feed the evaluated-set) are disabled — e.g. anyOf
    * Accept-dominance would un-evaluate properties matched by sibling
    * branches and flip an unevaluatedProperties:false verdict. */
  private def canon(s: Spec, annotationsMatter: Boolean): Spec = s match {
    case Spec.Accept => Spec.Accept
    case Spec.Reject => Spec.Reject
    case o: Spec.Obj =>
      val folded = foldAllOf(recurse(o, annotationsMatter))
      if (isContradictory(folded)) Spec.Reject
      else {
        val c = constEquivalence(dedupEnum(folded))
        if (c == Spec.empty) Spec.Accept else c
      }
  }

  /** Does any subschema carry unevaluatedProperties/unevaluatedItems? */
  def containsUnevaluated(s: Spec): Boolean = s match {
    case o: Spec.Obj =>
      o.unevaluatedProperties.nonEmpty || o.unevaluatedItems.nonEmpty ||
        subschemas(o).exists(containsUnevaluated)
    case _ => false
  }

  /** All direct subschemas of an Obj (applicators + combinators + defs). */
  def subschemas(o: Spec.Obj): Vector[Spec] =
    o.properties.map(_._2) ++ o.patternProperties.map(_._2) ++
      o.additionalProperties ++ o.propertyNames ++
      o.dependentSchemas.map(_._2) ++ o.items ++ o.prefixItems ++
      o.contains ++ o.allOf ++ o.anyOf ++ o.oneOf ++ o.not ++
      o.unevaluatedProperties ++ o.unevaluatedItems ++
      o.ifSpec ++ o.thenSpec ++ o.elseSpec ++ o.defs.values

  private def recurse(o: Spec.Obj, am: Boolean): Spec.Obj = o.copy(
    properties = o.properties.map { case (k, v) => k -> canon(v, am) },
    patternProperties = o.patternProperties.map { case (k, v) => k -> canon(v, am) },
    additionalProperties = o.additionalProperties.map(canon(_, am)),
    propertyNames = o.propertyNames.map(canon(_, am)),
    dependentSchemas = o.dependentSchemas.map { case (k, v) => k -> canon(v, am) },
    items = o.items.map(canon(_, am)),
    prefixItems = o.prefixItems.map(canon(_, am)),
    contains = o.contains.map(canon(_, am)),
    allOf = o.allOf.map(canon(_, am)),
    anyOf = simplifyAnyOf(o.anyOf.map(canon(_, am)), am),
    oneOf = {
      val c = o.oneOf.map(canon(_, am))
      val live = c.filter(_ != Spec.Reject)
      if (c.nonEmpty && live.isEmpty) Vector(Spec.Reject) else live // sentinel: unsatisfiable
    },
    not = o.not.map(canon(_, am)),
    contentSchema = o.contentSchema.map(canon(_, am)),
    unevaluatedProperties = o.unevaluatedProperties.map(canon(_, am)),
    unevaluatedItems = o.unevaluatedItems.map(canon(_, am)),
    ifSpec = o.ifSpec.map(canon(_, am)),
    thenSpec = o.thenSpec.map(canon(_, am)),
    elseSpec = o.elseSpec.map(canon(_, am)),
    defs = o.defs.map { case (k, v) => k -> canon(v, am) },
  )

  private def simplifyAnyOf(branches: Vector[Spec], annotationsMatter: Boolean): Vector[Spec] = {
    val live = branches.filter(_ != Spec.Reject)
    if (branches.nonEmpty && live.isEmpty) Vector(Spec.Reject) // all branches dead
    // disjunct true ⇒ no constraint — but dropping successful branches
    // destroys their annotations, so only when no unevaluated* in scope
    else if (live.contains(Spec.Accept) && !annotationsMatter) Vector.empty
    else live
  }

  /** Fold mergeable allOf members into the parent (constraint
    * intersection, `{allOf:[{min:0},{max:10}]}` → `{min:0,max:10}`). A
    * member stays in allOf if any of its keywords can't merge safely. */
  private def foldAllOf(o: Spec.Obj): Spec.Obj = {
    var acc = o.copy(allOf = Vector.empty)
    val keep = Vector.newBuilder[Spec]
    o.allOf.foreach {
      case Spec.Accept => ()
      case Spec.Reject => keep += Spec.Reject
      case sub: Spec.Obj =>
        mergeInto(acc, sub) match {
          case Some(m) => acc = m
          case None    => keep += sub
        }
      case other => keep += other
    }
    acc.copy(allOf = keep.result())
  }

  /** Conjunction-merge `b` into `a`; None if any keyword of `b` conflicts
    * structurally (then b stays as an allOf member). */
  private def mergeInto(a: Spec.Obj, b: Spec.Obj): Option[Spec.Obj] = {
    // only scalar-constraint keywords + required merge; applicators and
    // combinators don't (they'd need semantic intersection)
    val bHasUnmergeable =
      b.properties.nonEmpty || b.patternProperties.nonEmpty ||
      b.additionalProperties.nonEmpty || b.propertyNames.nonEmpty ||
      b.dependentRequired.nonEmpty || b.dependentSchemas.nonEmpty ||
      b.items.nonEmpty || b.prefixItems.nonEmpty || b.contains.nonEmpty ||
      b.allOf.nonEmpty || b.anyOf.nonEmpty || b.oneOf.nonEmpty ||
      b.not.nonEmpty || b.ifSpec.nonEmpty || b.ref.nonEmpty ||
      // unevaluated* scope over the member's OWN in-place applicators and
      // content* has no merge rule — hoisting either changes the accepted
      // set ({"allOf":[{"unevaluatedProperties":false}]} ≠ dropping it)
      b.unevaluatedProperties.nonEmpty || b.unevaluatedItems.nonEmpty ||
      b.contentEncoding.nonEmpty || b.contentMediaType.nonEmpty ||
      b.contentSchema.nonEmpty || b.defs.nonEmpty ||
      b.id.nonEmpty || b.anchor.nonEmpty || b.dynamicAnchor.nonEmpty ||
      b.recursiveAnchor || b.dynamicRef.nonEmpty || b.recursiveRef.nonEmpty ||
      b.others.nonEmpty || // unknown/custom keywords: no merge rule
      // a member's minContains/maxContains are no-ops without a `contains`
      // beside them; hoisting them next to the parent's `contains` would
      // activate (tighten) them
      ((b.minContains.nonEmpty || b.maxContains.nonEmpty) && a.contains.nonEmpty) ||
      b.pattern.nonEmpty && a.pattern.nonEmpty ||  // two patterns: keep both
      b.format.nonEmpty && a.format.nonEmpty ||
      b.const.nonEmpty && a.const.nonEmpty ||
      b.enumVals.nonEmpty && a.enumVals.nonEmpty ||
      b.multipleOf.nonEmpty && a.multipleOf.nonEmpty
    if (bHasUnmergeable) None
    else Some(a.copy(
      types = (a.types, b.types) match {
        case (Some(x), Some(y)) => Some(intersectTypes(x, y))
        case (x, y) => x.orElse(y)
      },
      const = a.const.orElse(b.const),
      enumVals = a.enumVals.orElse(b.enumVals),
      minimum = maxOf(a.minimum, b.minimum),
      maximum = minOf(a.maximum, b.maximum),
      exclusiveMinimum = maxOf(a.exclusiveMinimum, b.exclusiveMinimum),
      exclusiveMaximum = minOf(a.exclusiveMaximum, b.exclusiveMaximum),
      multipleOf = a.multipleOf.orElse(b.multipleOf),
      minLength = maxOfL(a.minLength, b.minLength),
      maxLength = minOfL(a.maxLength, b.maxLength),
      pattern = a.pattern.orElse(b.pattern),
      format = a.format.orElse(b.format),
      minItems = maxOfL(a.minItems, b.minItems),
      maxItems = minOfL(a.maxItems, b.maxItems),
      uniqueItems = a.uniqueItems || b.uniqueItems,
      minProperties = maxOfL(a.minProperties, b.minProperties),
      maxProperties = minOfL(a.maxProperties, b.maxProperties),
      required = (a.required ++ b.required).distinct,
      minContains = maxOfL(a.minContains, b.minContains),
      maxContains = minOfL(a.maxContains, b.maxContains),
    ))
  }

  /** `integer` ∧ `number` = integer; intersection over the 7-type set. */
  private def intersectTypes(x: Set[JsonType], y: Set[JsonType]): Set[JsonType] = {
    def expand(t: Set[JsonType]): Set[JsonType] =
      if (t.contains(JsonType.Number)) t + JsonType.Integer else t
    val i = expand(x).intersect(expand(y))
    // Number survives only if both had it
    if (x.contains(JsonType.Number) && y.contains(JsonType.Number)) i
    else i - JsonType.Number
  }

  private def maxOf(a: Option[BigDecimal], b: Option[BigDecimal]) =
    (a ++ b).reduceOption(_ max _)
  private def minOf(a: Option[BigDecimal], b: Option[BigDecimal]) =
    (a ++ b).reduceOption(_ min _)
  private def maxOfL(a: Option[Long], b: Option[Long]) = (a ++ b).reduceOption(_ max _)
  private def minOfL(a: Option[Long], b: Option[Long]) = (a ++ b).reduceOption(_ min _)

  /** Satisfiability check (`emptiness.rs` analog, interval fragment).
    * A per-type contradiction (min>max) only empties the schema when the
    * `type` keyword pins the instance to that type — `{"minimum":5,
    * "maximum":3}` still accepts `"abc"` (the reference's contradiction
    * example carries `"type":"integer"`, `canonical/mod.rs:33-35`). */
  def isContradictory(o: Spec.Obj): Boolean = {
    def crossed(lo: Option[BigDecimal], hi: Option[BigDecimal], strict: Boolean) =
      lo.zip(hi).exists { case (l, h) => if (strict) l >= h else l > h }
    def only(ts: Set[JsonType]) = o.types.exists(t => t.nonEmpty && t.subsetOf(ts))
    val numOnly = only(Set(JsonType.Integer, JsonType.Number))
    val strOnly = only(Set(JsonType.String))
    val arrOnly = only(Set(JsonType.Array))
    val objOnly = only(Set(JsonType.Object))
    o.allOf.contains(Spec.Reject) ||
    o.types.exists(_.isEmpty) ||
    o.enumVals.exists(_.isEmpty) ||
    (numOnly && (
      crossed(o.minimum, o.maximum, strict = false) ||
      crossed(o.exclusiveMinimum, o.maximum, strict = true) ||
      crossed(o.minimum, o.exclusiveMaximum, strict = true) ||
      crossed(o.exclusiveMinimum, o.exclusiveMaximum, strict = true))) ||
    (strOnly && o.minLength.zip(o.maxLength).exists { case (l, h) => l > h }) ||
    (arrOnly && (
      o.minItems.zip(o.maxItems).exists { case (l, h) => l > h } ||
      o.maxContains.zip(Some(o.minContains.getOrElse(1L)))
        .exists { case (h, l) => o.contains.nonEmpty && l > h })) ||
    (objOnly && o.minProperties.zip(o.maxProperties).exists { case (l, h) => l > h }) ||
    o.const.exists(c => o.types.exists(ts => !typeOk(ts, c))) ||
    (o.anyOf.nonEmpty && o.anyOf.forall(_ == Spec.Reject)) ||
    o.oneOf.contains(Spec.Reject)
  }

  private def typeOk(ts: Set[JsonType], v: JsonValue): Boolean = {
    val t = v.jsonType
    ts.contains(t) || (t == JsonType.Integer && ts.contains(JsonType.Number))
  }

  private def dedupEnum(o: Spec.Obj): Spec.Obj =
    o.copy(enumVals = o.enumVals.map { vs =>
      vs.foldLeft(Vector.empty[JsonValue]) { (acc, v) =>
        if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v
      }
    })

  /** `{type:integer, minimum:k, maximum:k}` ≡ `{const:k}`
    * (`canonical/mod.rs:20-22`); single-value enum ≡ const. */
  private def constEquivalence(o: Spec.Obj): Spec.Obj = {
    val fromInterval =
      if (o.const.isEmpty && o.enumVals.isEmpty &&
          o.types == Some(Set(JsonType.Integer): Set[JsonType]) &&
          o.minimum.nonEmpty && o.minimum == o.maximum &&
          o.minimum.exists(_.isWhole) &&
          o.exclusiveMinimum.isEmpty && o.exclusiveMaximum.isEmpty &&
          o.multipleOf.forall(m => o.minimum.exists(v => (v remainder m).signum == 0)))
        Some(JNum(o.minimum.get))
      else None
    fromInterval match {
      case Some(c) => o.copy(const = Some(c), types = None,
        minimum = None, maximum = None, multipleOf = None)
      case None => o.enumVals match {
        case Some(Vector(single)) if o.const.isEmpty =>
          o.copy(const = Some(single), enumVals = None)
        case _ => o
      }
    }
  }
}
