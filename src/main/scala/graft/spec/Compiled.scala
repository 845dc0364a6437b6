package graft.spec

import java.util.regex.Pattern

/** Closure-compiled validator — the analog of the reference's codegen'd
  * `is_valid` (`crates/benchmark-suite/README.md` "Codegen" column, 2.4-12x
  * over the dynamic walker there). `prepare`-time compilation turns a Spec
  * into nested closures: keyword dispatch, Option unwrapping, regex
  * compilation and $ref resolution all happen ONCE, leaving a plain
  * closure call per instance node at run time. Used per-row by the
  * contentSchema kernel, so this is the hot path for dynamic-JSON columns
  * at table scale.
  *
  * Semantics mirror `Interp.valid` exactly (the tree-walk stays the
  * executable specification; a differential test drives both). Schemas
  * using dynamic-scope refs (`$dynamicRef`/`$recursiveRef`) or the
  * annotation-flow keywords (`unevaluatedProperties`/`unevaluatedItems`)
  * fall back to the tree-walk — their verdicts depend on runtime state the
  * closure form doesn't carry.
  *
  * Cycle handling: the tree-walk accepts on a (schema-node, instance-node)
  * revisit; such revisits can only happen along SAME-INSTANCE edges (refs
  * and combinators — descent into a finite instance tree cannot return to
  * the same value). The same-value chain is statically known, so the cut
  * compiles to a constant-true ref check. Descent positions are memoized
  * by node identity; same-value skeletons are compiled per chain (bounded
  * by a node budget, overflow → fall back to the tree-walk).
  */
object Compiled {

  type C = JsonValue => Boolean
  private val True: C = _ => true
  private val False: C = _ => false

  private object Bail extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  /** None ⇒ use the tree-walk (dynamic feature, annotation flow, or
    * compile budget exceeded). */
  def compile(registry: Registry, entry: Spec): Option[C] =
    try Some(new Builder(registry).descend(entry))
    catch { case Bail => None }

  private final class Builder(registry: Registry) {
    private val memo = new java.util.IdentityHashMap[Spec.Obj, C]()
    private var budget = 20000

    def descend(s: Spec): C = s match {
      case Spec.Accept => True
      case Spec.Reject => False
      case o: Spec.Obj =>
        val hit = memo.get(o)
        if (hit != null) hit
        else {
          // forward cell: recursive refs back to this node resolve through
          // one indirection while the body is still being built
          var body: C = null
          memo.put(o, v => body(v))
          body = build(o, o :: Nil)
          body
        }
    }

    /** Compile for a SAME-VALUE position (ref/combinator edge): `sp` is
      * the chain of schema nodes already entered at this instance value. */
    private def same(s: Spec, sp: List[Spec.Obj]): C = s match {
      case Spec.Accept => True
      case Spec.Reject => False
      case o: Spec.Obj =>
        if (sp.exists(_ eq o)) True // structure-free cycle ⇒ accept
        else build(o, o :: sp)
    }

    private def build(o: Spec.Obj, sp: List[Spec.Obj]): C = {
      if (o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty ||
          o.unevaluatedProperties.nonEmpty || o.unevaluatedItems.nonEmpty) throw Bail
      budget -= 1
      if (budget < 0) throw Bail
      val cs = Vector.newBuilder[C]

      o.ref.foreach { r =>
        registry.resolve(r, registry.resourceOf(o)) match {
          case Some((target, _)) => cs += same(target, sp)
          case None => throw new SpecError(s"unresolvable $$ref: $r")
        }
      }

      o.types.foreach { ts =>
        val hasNum = ts.contains(JsonType.Number)
        cs += { v =>
          val t = v.jsonType
          ts.contains(t) || (t == JsonType.Integer && hasNum)
        }
      }
      o.const.foreach { c => cs += (v => JsonValue.equal(c, v)) }
      o.enumVals.foreach { es => cs += (v => es.exists(JsonValue.equal(_, v))) }

      if (o.minimum.nonEmpty || o.maximum.nonEmpty || o.exclusiveMinimum.nonEmpty ||
          o.exclusiveMaximum.nonEmpty || o.multipleOf.nonEmpty) {
        val mi = o.minimum; val ma = o.maximum
        val emi = o.exclusiveMinimum; val ema = o.exclusiveMaximum
        val mo = o.multipleOf
        val zero = BigDecimal(0)
        cs += {
          case JNum(n) =>
            mi.forall(n >= _) && ma.forall(n <= _) &&
            emi.forall(n > _) && ema.forall(n < _) &&
            mo.forall(m => (n remainder m).compareTo(zero) == 0)
          case _ => true
        }
      }

      if (o.minLength.nonEmpty || o.maxLength.nonEmpty || o.pattern.nonEmpty) {
        val minL = o.minLength; val maxL = o.maxLength
        val pat: Option[Pattern] = o.pattern.map(p => Pattern.compile(EcmaRegex.translate(p)))
        cs += {
          case JStr(s) =>
            (minL.isEmpty && maxL.isEmpty || {
              val n = s.codePointCount(0, s.length)
              minL.forall(n >= _) && maxL.forall(n <= _)
            }) && pat.forall(_.matcher(s).find())
          case _ => true
        }
      }

      // ---- object keywords ------------------------------------------------
      val objChecks = Vector.newBuilder[JObj => Boolean]
      if (o.required.nonEmpty) {
        val req = o.required
        objChecks += (ob => req.forall(ob.toMap.contains))
      }
      o.minProperties.foreach(n => objChecks += (_.fields.length >= n))
      o.maxProperties.foreach(n => objChecks += (_.fields.length <= n))
      if (o.properties.nonEmpty) {
        val props: Vector[(String, C)] = o.properties.map { case (k, sub) => (k, descend(sub)) }
        objChecks += (ob => props.forall { case (k, c) => ob.get(k).forall(c) })
      }
      if (o.patternProperties.nonEmpty) {
        val pats: Vector[(Pattern, C)] = o.patternProperties.map { case (p, sub) =>
          (Pattern.compile(EcmaRegex.translate(p)), descend(sub))
        }
        objChecks += (ob => pats.forall { case (re, c) =>
          ob.fields.forall { case (k, value) => !re.matcher(k).find() || c(value) }
        })
      }
      o.additionalProperties.foreach { ap =>
        val c = descend(ap)
        val names = o.propertyNameSet
        val pats = o.patternProperties.map(p => Pattern.compile(EcmaRegex.translate(p._1)))
        objChecks += (ob => ob.fields.forall { case (k, value) =>
          names.contains(k) || pats.exists(_.matcher(k).find()) || c(value)
        })
      }
      o.propertyNames.foreach { pn =>
        val c = descend(pn)
        objChecks += (ob => ob.fields.forall { case (k, _) => c(JStr(k)) })
      }
      if (o.dependentRequired.nonEmpty) {
        val dr = o.dependentRequired
        objChecks += (ob => dr.forall { case (k, deps) =>
          !ob.toMap.contains(k) || deps.forall(ob.toMap.contains)
        })
      }
      val objOnly = objChecks.result()
      // dependentSchemas validates the WHOLE value (same-value edge)
      val depSchemas: Vector[(String, C)] =
        o.dependentSchemas.map { case (k, sub) => (k, same(sub, sp)) }
      if (objOnly.nonEmpty || depSchemas.nonEmpty) cs += {
        case ob: JObj =>
          objOnly.forall(_(ob)) &&
          depSchemas.forall { case (k, c) => !ob.toMap.contains(k) || c(ob) }
        case _ => true
      }

      // ---- array keywords -------------------------------------------------
      val arrChecks = Vector.newBuilder[Vector[JsonValue] => Boolean]
      o.minItems.foreach(n => arrChecks += (_.length >= n))
      o.maxItems.foreach(n => arrChecks += (_.length <= n))
      if (o.uniqueItems) arrChecks += allUnique
      if (o.prefixItems.nonEmpty) {
        val pre = o.prefixItems.map(descend)
        arrChecks += (a => {
          var i = 0; var ok = true
          while (ok && i < pre.length && i < a.length) { ok = pre(i)(a(i)); i += 1 }
          ok
        })
      }
      o.items.foreach { sub =>
        val c = descend(sub)
        val skip = o.prefixItems.length
        arrChecks += (a => {
          var i = skip; var ok = true
          while (ok && i < a.length) { ok = c(a(i)); i += 1 }
          ok
        })
      }
      o.contains.foreach { sub =>
        val c = descend(sub)
        val lo = o.minContains.getOrElse(1L)
        val hi = o.maxContains
        arrChecks += (a => {
          val n = a.count(c)
          n >= lo && hi.forall(n <= _)
        })
      }
      val arrOnly = arrChecks.result()
      if (arrOnly.nonEmpty) cs += {
        case JArr(a) => arrOnly.forall(_(a))
        case _ => true
      }

      // ---- combinators (same-value edges) ---------------------------------
      o.allOf.foreach(m => cs += same(m, sp))
      if (o.anyOf.nonEmpty) {
        val bs = o.anyOf.map(same(_, sp))
        cs += (v => bs.exists(_(v)))
      }
      if (o.oneOf.nonEmpty) {
        val bs = o.oneOf.map(same(_, sp))
        cs += { v =>
          var n = 0; var i = 0
          while (n < 2 && i < bs.length) { if (bs(i)(v)) n += 1; i += 1 }
          n == 1
        }
      }
      o.not.foreach { n => val c = same(n, sp); cs += (v => !c(v)) }
      o.ifSpec.foreach { i =>
        val ci = same(i, sp)
        val ct = o.thenSpec.map(same(_, sp)).getOrElse(True)
        val ce = o.elseSpec.map(same(_, sp)).getOrElse(True)
        cs += (v => if (ci(v)) ct(v) else ce(v))
      }

      val all = cs.result().toArray
      all.length match {
        case 0 => True
        case 1 => all(0)
        case _ => v => {
          var i = 0; var ok = true
          while (ok && i < all.length) { ok = all(i)(v); i += 1 }
          ok
        }
      }
    }

    private def allUnique(a: Vector[JsonValue]): Boolean = {
      var i = 0
      while (i < a.length) {
        var j = i + 1
        while (j < a.length) {
          if (JsonValue.equal(a(i), a(j))) return false
          j += 1
        }
        i += 1
      }
      true
    }
  }
}
