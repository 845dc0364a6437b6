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
  * executable specification; a differential test drives both). The
  * annotation-flow keywords (`unevaluatedProperties`/`unevaluatedItems`)
  * compile too (branch-validity-gated evaluated-set collectors mirroring
  * the tree-walk); only dynamic-scope refs (`$dynamicRef`/`$recursiveRef`)
  * fall back — their targets depend on the runtime resource scope.
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

    /** Compiled evaluated-properties collector — mirrors
      * `Interp.evaluatedProps` (annotation flow: contributions only from
      * branches that VALIDATE, branch validity via the compiled `same`
      * closures, collector recursion guarded by the compile-time visited
      * chain exactly like the runtime fixpoint guard). */
    private def evCollector(o: Spec.Obj, includeSelf: Boolean,
                            visited: List[Spec.Obj], sp: List[Spec.Obj]): JObj => Set[String] = {
      if (visited.exists(_ eq o)) return _ => Set.empty
      val vis = o :: visited
      val static: JObj => Set[String] = {
        val all = o.additionalProperties.nonEmpty ||
          (includeSelf && o.unevaluatedProperties.nonEmpty)
        val propNames = o.propertyNameSet
        val pats = o.patternProperties.map(p => Pattern.compile(EcmaRegex.translate(p._1)))
        ob => {
          val keys = ob.fields.map(_._1).toSet
          if (all) keys
          else propNames.filter(keys.contains) ++
            (if (pats.isEmpty) Set.empty[String]
             else keys.filter(k => pats.exists(_.matcher(k).find())))
        }
      }
      // (validity, collector) per in-place branch that can contribute
      def branch(b: Spec): Option[(C, JObj => Set[String])] = b match {
        case bo: Spec.Obj => Some((same(bo, sp), evCollector(bo, includeSelf = true, vis, sp)))
        case _ => None // Accept evaluates nothing; Reject never validates
      }
      val plain = (o.allOf ++ o.anyOf ++ o.oneOf).flatMap(branch) ++
        o.ref.toVector.flatMap { r =>
          registry.resolve(r, registry.resourceOf(o)).flatMap(t => branch(t._1))
        }
      val ite = o.ifSpec.map { i =>
        val ci = same(i, sp)
        val iBr = branch(i)
        val tBr = o.thenSpec.flatMap(branch)
        val eBr = o.elseSpec.flatMap(branch)
        (ci, iBr, tBr, eBr)
      }
      val deps = o.dependentSchemas.flatMap { case (k, sub) =>
        branch(sub).map(bc => (k, bc))
      }
      ob => {
        var out = static(ob)
        plain.foreach { case (v, c) => if (v(ob)) out ++= c(ob) }
        ite.foreach { case (ci, iBr, tBr, eBr) =>
          if (ci(ob)) {
            iBr.foreach { case (v, c) => if (v(ob)) out ++= c(ob) }
            tBr.foreach { case (v, c) => if (v(ob)) out ++= c(ob) }
          } else eBr.foreach { case (v, c) => if (v(ob)) out ++= c(ob) }
        }
        deps.foreach { case (k, (v, c)) =>
          if (ob.toMap.contains(k) && v(ob)) out ++= c(ob)
        }
        out
      }
    }

    /** Compiled item-coverage collector — mirrors `Interp.itemCov`:
      * (allCovered, prefixLen, compiled contains checks). */
    private def itemCovCollector(o: Spec.Obj, includeSelf: Boolean,
                                 visited: List[Spec.Obj],
                                 sp: List[Spec.Obj]): JsonValue => (Boolean, Int, Vector[C]) = {
      if (visited.exists(_ eq o)) return _ => (false, 0, Vector.empty)
      val vis = o :: visited
      val selfAll = o.items.nonEmpty || (includeSelf && o.unevaluatedItems.nonEmpty)
      val selfPrefix = o.prefixItems.length
      val selfContains = o.contains.toVector.map(descend)
      def branch(b: Spec): Option[(C, JsonValue => (Boolean, Int, Vector[C]))] = b match {
        case bo: Spec.Obj => Some((same(bo, sp), itemCovCollector(bo, includeSelf = true, vis, sp)))
        case _ => None
      }
      val plain = (o.allOf ++ o.anyOf ++ o.oneOf).flatMap(branch) ++
        o.ref.toVector.flatMap { r =>
          registry.resolve(r, registry.resourceOf(o)).flatMap(t => branch(t._1))
        }
      val ite = o.ifSpec.map { i =>
        (same(i, sp), branch(i), o.thenSpec.flatMap(branch), o.elseSpec.flatMap(branch))
      }
      val deps = o.dependentSchemas.flatMap { case (k, sub) => branch(sub).map(bc => (k, bc)) }
      v => {
        var all = selfAll; var prefix = selfPrefix; var contains = selfContains
        def add(pair: (C, JsonValue => (Boolean, Int, Vector[C]))): Unit = {
          val (vc, cc) = pair
          if (vc(v)) {
            val (a2, p2, c2) = cc(v)
            all ||= a2; prefix = math.max(prefix, p2); contains ++= c2
          }
        }
        plain.foreach(add)
        ite.foreach { case (ci, iBr, tBr, eBr) =>
          if (ci(v)) { iBr.foreach(add); tBr.foreach(add) } else eBr.foreach(add)
        }
        deps.foreach { case (k, bc) =>
          v match {
            case ob: JObj if ob.toMap.contains(k) => add(bc)
            case _ => ()
          }
        }
        (all, prefix, contains)
      }
    }

    private def build(o: Spec.Obj, sp: List[Spec.Obj]): C = {
      if (o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty) throw Bail
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

      // ---- annotation-flow keywords ---------------------------------------
      o.unevaluatedProperties.foreach { u =>
        val uc = descend(u)
        val ev = evCollector(o, includeSelf = false, Nil, sp)
        cs += {
          case ob: JObj =>
            val e = ev(ob)
            ob.fields.forall { case (k, pv) => e.contains(k) || uc(pv) }
          case _ => true
        }
      }
      o.unevaluatedItems.foreach { u =>
        val uc = descend(u)
        val cov = itemCovCollector(o, includeSelf = false, Nil, sp)
        cs += {
          case v @ JArr(a) =>
            val (allCov, prefix, contains) = cov(v)
            allCov || a.zipWithIndex.forall { case (x, i) =>
              i < prefix || contains.exists(p => p(x)) || uc(x)
            }
          case _ => true
        }
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
