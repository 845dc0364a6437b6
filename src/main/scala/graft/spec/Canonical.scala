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

  def canonicalize(s: Spec): Spec = {
    // a ROOT $id nothing else references is bookkeeping: "#" and
    // pointer refs resolve to the root either way — drop it so the
    // document qualifies for canonicalization (reference root handling).
    // The draft-4 spelling `id` parses as an unknown keyword; at the root
    // it is the same bookkeeping (pointer refs resolve without it).
    val s0 = s match {
      case o: Spec.Obj if o.others.exists { case (k, v) =>
          k == "id" && v.isInstanceOf[JStr] } &&
          !usesAdvancedReferencing(o.copy(others = o.others.filterNot(_._1 == "id"))) =>
        o.copy(others = o.others.filterNot(_._1 == "id"))
      case other => other
    }
    val s1 = s0 match {
      case o: Spec.Obj if o.id.nonEmpty && !usesAdvancedReferencing(o.copy(id = None)) =>
        o.copy(id = None)
      case other => other
    }
    // Conservative fallback (the reference passes unsupported constructs
    // through as Raw, canonical/mod.rs:44-47): structure rewrites move
    // subschemas, which would dangle JSON-pointer refs and change anchor /
    // dynamic-scope resolution — leave such documents untouched.
    resetCanonWork()
    rootDefsTL.set(s1 match { case o: Spec.Obj => o.defs; case _ => Map.empty })
    if (usesAdvancedReferencing(s1)) s1
    else canon(s1, annotationsMatter = containsUnevaluated(s1)) match {
      case o: Spec.Obj if recursivelyEmpty(o) => Spec.Reject
      case o: Spec.Obj if !containsUnevaluated(s1) => emissionPartition(o) match {
        case oo: Spec.Obj => pruneRootDefs(oo)
        case other => other
      }
      case other => other
    }
  }

  /** Root `$defs` entries nothing references after canonicalization are
    * bookkeeping and drop from the emitted document. */
  private def pruneRootDefs(o: Spec.Obj): Spec.Obj = {
    if (o.defs.isEmpty) return o
    val refs = scala.collection.mutable.Set[String]()
    def collect(s: Spec): Unit = s match {
      case so: Spec.Obj =>
        so.ref.foreach(refs += _)
        so.dynamicRef.foreach(refs += _)
        (subschemas(so) ++ so.contentSchema ++ so.defs.values).foreach(collect)
      case _ => ()
    }
    // fixpoint: an entry kept alive only by another dropped entry drops too
    var cur = o
    var changed = true
    while (changed) {
      refs.clear()
      collect(cur.copy(defs = Map.empty))
      cur.defs.values.foreach(collect)
      // decode each ref the way Registry resolves it (percent-decode the
      // fragment, RFC 6901 unescape the segments); both defs-map spellings
      // (#/$defs/x and draft-7 #/definitions/x) reach the unified map
      val referencedNames: Set[String] = refs.iterator.flatMap { r =>
        val (uri, frag) = Registry.splitFragment(r)
        if (uri.nonEmpty || !frag.startsWith("/")) None
        else frag.split("/", -1).toList.drop(1)
          .map(_.replace("~1", "/").replace("~0", "~")) match {
            case ("$defs" | "definitions") :: name :: _ => Some(name)
            case _ => None
          }
      }.toSet
      val kept = cur.defs.filter { case (name, _) => referencedNames(name) }
      changed = kept.size != cur.defs.size
      cur = cur.copy(defs = kept)
    }
    cur
  }

  /** Recursive-schema emptiness (`canonical/mod.rs:63-71` analog): a
    * least-fixpoint "some finite witness exists" computation over the
    * reachable subschema graph, OPTIMISTIC about everything it does not
    * analyze (not, const/enum, numeric interplay, contentSchema, ...) —
    * so a node that never becomes satisfiable even under optimism has no
    * finite witness at all. Catches what per-node checks cannot: schemas
    * whose every instance would need infinite depth, e.g. a required
    * property that must match its own schema with no escape branch.
    * All `isSat` uses are positive ⇒ the iteration is monotone and the
    * least fixpoint is well-defined. */
  private def recursivelyEmpty(root: Spec.Obj): Boolean = {
    val reg = try Registry.build(root) catch { case _: Throwable => return false }
    def resolve(r: String): Option[Spec] =
      try reg.resolve(r, reg.rootResource).map(_._1) catch { case _: Throwable => None }
    val nodes = new java.util.IdentityHashMap[Spec.Obj, Unit]()
    def collect(s: Spec): Unit = s match {
      case o: Spec.Obj if !nodes.containsKey(o) =>
        nodes.put(o, ())
        (subschemas(o) ++ o.contentSchema).foreach(collect)
        o.ref.flatMap(resolve).foreach(collect)
      case _ => ()
    }
    collect(root)
    val sat = new java.util.IdentityHashMap[Spec.Obj, java.lang.Boolean]()
    def isSat(s: Spec): Boolean = s match {
      case Spec.Accept => true
      case Spec.Reject => false
      case o: Spec.Obj => sat.containsKey(o)
    }
    // DFS-visit budget: optimistic (non-empty) on exhaustion — emptiness
    // may only be claimed from a completed analysis
    var visitBudget = 100000
    // transitively required keys (dependentRequired chains from required)
    def requiredClosure(o: Spec.Obj): Set[String] = {
      var cur = o.required.toSet
      var grown = true
      while (grown) {
        val next = cur ++ o.dependentRequired.collect {
          case (k, deps) if cur(k) => deps
        }.flatten
        grown = next.size > cur.size
        cur = next
      }
      cur
    }
    // every subschema a value at key `p` must satisfy
    def propSchemasFor(o: Spec.Obj, p: String): Vector[Spec] = {
      val fromProps = o.properties.filter(_._1 == p).map(_._2)
      val fromPats = o.patternProperties.filter { case (pat, _) =>
        try java.util.regex.Pattern.compile(EcmaRegex.translate(pat)).matcher(p).find()
        catch { case _: Throwable => false } // optimistic: treat as non-matching
      }.map(_._2)
      val extra =
        if (fromProps.isEmpty && fromPats.isEmpty) o.additionalProperties.toVector
        else Vector.empty
      fromProps ++ fromPats ++ extra
    }
    // Same-position legs (ref/combinator edges) evaluate as a DFS with
    // revisit ⇒ TRUE: the runtime cycle rule accepts on re-entering a
    // (node, instance) pair (validator.rs:62-115, pure-cycle ≡ true at
    // ref_.rs:1008), so an in-place reference cycle ADMITS values — only
    // structure-CONSUMING descent (required properties, demanded items)
    // keeps the least-fixpoint "finite witness" requirement.
    def samePosSat(s: Spec, vis: List[Spec.Obj]): Boolean = s match {
      case Spec.Accept => true
      case Spec.Reject => false
      case o: Spec.Obj =>
        if (vis.exists(_ eq o)) true // in-place cycle cut ⇒ vacuously satisfiable
        else if (sat.containsKey(o)) true
        else if ({ visitBudget -= 1; visitBudget < 0 }) true // optimistic bail
        else nodeSat(o, o :: vis)
    }
    def nodeSat(o: Spec.Obj, vis: List[Spec.Obj]): Boolean = {
      val refOk = o.ref.forall(r => resolve(r).forall(samePosSat(_, vis)))
      val allOk = o.allOf.forall(samePosSat(_, vis))
      val anyOk = o.anyOf.isEmpty || o.anyOf.exists(samePosSat(_, vis))
      val oneOk = o.oneOf.isEmpty || o.oneOf.exists(samePosSat(_, vis))
      val iteOk = o.ifSpec.isEmpty ||
        o.thenSpec.forall(samePosSat(_, vis)) || o.elseSpec.forall(samePosSat(_, vis))
      def objectOk = {
        val req = requiredClosure(o)
        !o.maxProperties.exists(_ < req.size) &&
        req.forall(p => propSchemasFor(o, p).forall(isSat)) &&
        o.dependentSchemas.forall { case (k, d) => !req(k) || isSat(d) }
      }
      def arrayOk = {
        val minI = o.minItems.getOrElse(0L)
        val elemOk =
          minI == 0L || {
            if (o.prefixItems.nonEmpty) isSat(o.prefixItems.head)
            else o.items.forall(isSat)
          }
        val containsOk = o.contains.forall(c =>
          o.minContains.getOrElse(1L) == 0L || isSat(c))
        elemOk && containsOk
      }
      def typeOk(t: JsonType): Boolean = t match {
        case JsonType.Object => objectOk
        case JsonType.Array  => arrayOk
        case _               => true
      }
      val types = o.types.getOrElse(JsonType.all.toSet)
      refOk && allOk && anyOk && oneOk && iteOk && types.exists(typeOk)
    }
    var changed = true
    while (changed) {
      changed = false
      nodes.keySet.forEach { o =>
        if (!sat.containsKey(o) && nodeSat(o, o :: Nil)) { sat.put(o, true); changed = true }
      }
    }
    !sat.containsKey(root) && visitBudget >= 0
  }

  /** Any $id, $anchor, dynamic/recursive anchors-or-refs, or a $ref that
    * is not of the WHOLE-definition root-defs form (#, #/$defs/x,
    * #/definitions/x)? A pointer INTO a definition's structure (e.g.
    * #/$defs/x/allOf/0) also counts as advanced: structure-moving rewrites
    * like allOf folding would dangle it. */
  def usesAdvancedReferencing(s: Spec): Boolean = s match {
    case o: Spec.Obj =>
      def wholeDef(r: String, prefix: String) =
        r.startsWith(prefix) && !r.stripPrefix(prefix).contains('/')
      o.id.nonEmpty || o.anchor.nonEmpty || o.dynamicAnchor.nonEmpty ||
        o.recursiveAnchor || o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty ||
        o.ref.exists(r => r != "#" &&
          !wholeDef(r, "#/$defs/") && !wholeDef(r, "#/definitions/")) ||
        (Canonical.subschemas(o) ++ o.contentSchema).exists(usesAdvancedReferencing)
    case _ => false
  }

  /** `annotationsMatter`: the document carries unevaluatedProperties /
    * unevaluatedItems somewhere, so rewrites that drop SUCCESSFUL branches
    * (whose annotations feed the evaluated-set) are disabled — e.g. anyOf
    * Accept-dominance would un-evaluate properties matched by sibling
    * branches and flip an unevaluatedProperties:false verdict. */
  /** Rewrite-work budget: the rewrite system has no global fixpoint
    * proof — mutually-inverse spellings (a partition and its negation)
    * can oscillate through nested distribution, and each oscillation
    * multiplies branches. The budget counts TOTAL canon invocations per
    * top-level canonicalize; past it every further node passes through
    * unchanged, which is always a sound canonicalization. Real documents
    * use a few hundred. */
  private val canonWork = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = Array(0, 0) // (work, depth)
  }
  private[spec] def resetCanonWork(): Unit = { val w = canonWork.get(); w(0) = 0; w(1) = 0 }

  private def canon(s: Spec, annotationsMatter: Boolean): Spec = {
    val w = canonWork.get()
    if (w(0) > 20000 || w(1) > 60) s
    else {
      w(0) += 1; w(1) += 1
      try canonImpl(s, annotationsMatter)
      finally w(1) -= 1
    }
  }

  private def canonImpl(s: Spec, annotationsMatter: Boolean): Spec = s match {
    case Spec.Accept => Spec.Accept
    case Spec.Reject => Spec.Reject
    case o: Spec.Obj =>
      // literal X ∧ ¬X dies BEFORE recursion: once children canonicalize,
      // a pushable ¬X member partitions and the whole-schema contradiction
      // is no longer visible to the conjunction analyses
      if (o.allOf.exists { case m: Spec.Obj =>
            m.not.exists(n => only(m)(_.copy(not = None)) &&
              (o.allOf.contains(n) || o.not.contains(n)))
          case _ => false })
        return Spec.Reject
      val folded = foldAllOf(oneOfAlgebra(rewriteIte(rewriteDependencies(
        pushNotKeyword(recurse(o, annotationsMatter)), annotationsMatter), annotationsMatter)))
      val alg = if (annotationsMatter) folded else anyOfAlgebra(folded, annotationsMatter)
      alg match {
        case f: Spec.Obj =>
          val nf = arrayCeiling(numericNormalize(f), annotationsMatter)
          if (isContradictory(nf)) Spec.Reject
          else valueSetCollapse(nf, annotationsMatter) match {
            case v00: Spec.Obj =>
              val v0 =
                if (annotationsMatter) v00
                else valueSetObjectRespell(v00) match {
                  case r: Spec.Obj => r
                  case other => return other
                }
              val v = if (annotationsMatter) v0 else objectSpelling(v0)
              val c = constEquivalence(dedupEnum(v))
              if (c == Spec.empty) Spec.Accept
              else if (c.allOf.length == 1 && only(c)(_.copy(allOf = Vector.empty)))
                c.allOf.head // sole unmergeable conjunct IS the schema
              else refSpelling(c, annotationsMatter)
            case other => other
          }
        case other => other
      }
  }

  // ---- numeric leaf normalization (`ir/bound_integer.rs` /
  // `ir/bound_rational.rs` lite) ----------------------------------------

  /** Over an integer-only leaf, exclusive bounds fold to inclusive ones on
    * the integer grid (x > m ⟺ x ≥ ⌊m⌋+1; x < m ⟺ x ≤ ⌈m⌉-1) and
    * fractional inclusive ends snap inward — the reference's BoundInteger
    * snapping. `integer` beside `number` in a type set adds nothing. */
  private def numericNormalize(o0: Spec.Obj): Spec.Obj = {
    var o = o0
    o = o.copy(types = o.types.map(ts =>
      if (ts.contains(JsonType.Number) && ts.contains(JsonType.Integer)) ts - JsonType.Integer
      else ts))
    // a positive WHOLE divisor admits only whole values: `number` beside
    // it narrows to `integer` (the corpus's divisor-kind branch spelling)
    if (o.types.exists(ts => ts == (Set(JsonType.Number): Set[JsonType])) &&
        o.multipleOf.exists(m => m.signum > 0 && m.isWhole))
      o = o.copy(types = Some(Set(JsonType.Integer): Set[JsonType]))
    // vacuity pruning: a scalar keyword whose domain the type set
    // excludes can never bind — it drops (non-members pass it anyway)
    o.types.foreach { ts =>
      val atoms = atomsOf(ts)
      if (!atoms("string"))
        o = o.copy(minLength = None, maxLength = None, pattern = None)
      if (!atoms("int") && !atoms("nonint"))
        o = o.copy(minimum = None, maximum = None, exclusiveMinimum = None,
          exclusiveMaximum = None, multipleOf = None)
      if (!atoms("array"))
        o = o.copy(minItems = None, maxItems = None, uniqueItems = false)
      if (!atoms("object"))
        o = o.copy(minProperties = None, maxProperties = None, required = Vector.empty)
    }
    val intOnly = o.types.exists(ts => ts.nonEmpty && ts.subsetOf(Set(JsonType.Integer): Set[JsonType]))
    if (intOnly && (o.minimum.nonEmpty || o.maximum.nonEmpty ||
        o.exclusiveMinimum.nonEmpty || o.exclusiveMaximum.nonEmpty)) {
      def ceil(x: BigDecimal) = x.setScale(0, BigDecimal.RoundingMode.CEILING)
      def floor(x: BigDecimal) = x.setScale(0, BigDecimal.RoundingMode.FLOOR)
      val lo = (o.minimum.map(ceil).toSeq ++ o.exclusiveMinimum.map(m => exAdd(floor(m), 1)))
        .reduceOption(_ max _)
      val hi = (o.maximum.map(floor).toSeq ++ o.exclusiveMaximum.map(m => exSub(ceil(m), 1)))
        .reduceOption(_ min _)
      o = o.copy(minimum = lo, maximum = hi,
        exclusiveMinimum = None, exclusiveMaximum = None)
    }
    // over_integers (`ir/bound_rational.rs` IntegerFold): a fractional
    // divisor over an integer-only leaf admits exactly the multiples of
    // its reduced numerator (p/q reduced: integer n with n·q/p whole ⟺
    // p | n); numerator 1 admits every integer — the keyword vanishes
    // over_integers (`ir/divisors.rs`): a divisor every integer already
    // meets (reduced numerator 1) vanishes over an integer-only leaf;
    // other fractional divisors are KEPT AS WRITTEN — the validator's
    // modulo reads the spelling (IntegerFold::Unfaithful otherwise)
    if (intOnly) o.multipleOf.filter(m => vacuousOverIntegers(m) && !m.isWhole)
      .foreach(_ => o = o.copy(multipleOf = None))
    // progression snapping (`ir/bound_rational.rs` snap): with a divisor
    // in force, the admitted values sit on the multiple grid, so each end
    // snaps inward to the nearest multiple and exclusive ends close
    val numOnly = o.types.exists(ts => ts.nonEmpty &&
      ts.subsetOf(Set(JsonType.Number, JsonType.Integer): Set[JsonType]))
    // (an integer leaf under a FRACTIONAL divisor admits only the grid
    // points that are also whole — a combined grid this lite snap does
    // not model, so it leaves those bounds alone)
    if (numOnly) o.multipleOf.filter(m => m.signum > 0 && (!intOnly || m.isWhole)).foreach { m =>
      val lo = (o.minimum.map((_, false)).toSeq ++ o.exclusiveMinimum.map((_, true)))
        .reduceOption((a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2)) a else b)
      val hi = (o.maximum.map((_, false)).toSeq ++ o.exclusiveMaximum.map((_, true)))
        .reduceOption((a, b) => if (a._1 < b._1 || (a._1 == b._1 && a._2)) a else b)
      // an end (or its snapped grid point) f64 cannot hold exactly is not
      // the number the reference's validator reads — the snap is skipped
      // and the end stays as written (`shares_arithmetic` gate)
      val loSnap = lo.flatMap { case (l, lx) =>
        var first = exMul(BigDecimal(l.bigDecimal.divide(m.bigDecimal, 0,
          java.math.RoundingMode.CEILING)), m)
        if (lx && first == l) first = exAdd(first, m)
        if (f64Exact(l) && f64Exact(first)) Some(first) else None
      }
      val hiSnap = hi.flatMap { case (h, hx) =>
        var last = exMul(BigDecimal(h.bigDecimal.divide(m.bigDecimal, 0,
          java.math.RoundingMode.FLOOR)), m)
        if (hx && last == h) last = exSub(last, m)
        if (f64Exact(h) && f64Exact(last)) Some(last) else None
      }
      o = o.copy(minimum = loSnap.orElse(o.minimum), maximum = hiSnap.orElse(o.maximum),
        exclusiveMinimum = if (loSnap.nonEmpty) None else o.exclusiveMinimum,
        exclusiveMaximum = if (hiSnap.nonEmpty) None else o.exclusiveMaximum)
    }
    o
  }

  // scala.math.BigDecimal's operators round at MathContext.DECIMAL128
  // (34 digits): 1e300 - 1 comes back as 1e300 and silently widens a
  // folded bound. All canonicalizer arithmetic goes through the EXACT
  // java.math.BigDecimal ops (add/subtract/multiply are exact there).
  private def exAdd(a: BigDecimal, b: BigDecimal): BigDecimal =
    BigDecimal(a.bigDecimal.add(b.bigDecimal))
  private def exSub(a: BigDecimal, b: BigDecimal): BigDecimal =
    BigDecimal(a.bigDecimal.subtract(b.bigDecimal))
  private def exMul(a: BigDecimal, b: BigDecimal): BigDecimal =
    BigDecimal(a.bigDecimal.multiply(b.bigDecimal))

  /** Reduced fraction (numerator, denominator) of a positive decimal. */
  private def fracOf(x: BigDecimal): (BigInt, BigInt) = {
    val bd = x.bigDecimal.stripTrailingZeros
    if (bd.scale <= 0) (BigInt(bd.unscaledValue) * BigInt(10).pow(-bd.scale), BigInt(1))
    else {
      val p = BigInt(bd.unscaledValue); val q = BigInt(10).pow(bd.scale)
      val g = p.gcd(q); (p / g, q / g)
    }
  }

  /** Every integer is a multiple of `m` ⟺ m's reduced numerator is 1
    * (`ir/bound_rational.rs` is_vacuous_over_integers). */
  private def vacuousOverIntegers(m: BigDecimal): Boolean =
    m.signum > 0 && fracOf(m)._1 == BigInt(1)

  /** Binary-f64 exactness — the reference's shares_arithmetic notion: a
    * whole and a fractional divisor (or one f64 cannot hold exactly) take
    * different modulo paths, so one may not stand for the other. */
  private def f64Exact(x: BigDecimal): Boolean =
    try new java.math.BigDecimal(x.toDouble).compareTo(x.bigDecimal) == 0
    catch { case _: Throwable => false }

  /** One-way partitioned EMISSION pass (the reference's view rendering):
    * after the rewrite fixpoint, an UNTYPED leaf whose constraint
    * keywords span fewer domains than it admits splits into
    * anyOf[typed-groups, free-types] — `{minimum:2}` renders as
    * `anyOf[{type:number,minimum:2}, {type:[...the rest...]}]`. Runs
    * top-down over the OUTPUT only (never re-enters the rewrite loop, so
    * it cannot oscillate against the fold rules). Mirrors the
    * reference's gates: a typed leaf stays compact; numeric bounds past
    * the i64 projection stay raw; pattern-bearing and value/combinator
    * leaves are left alone. */
  private val I64Max = BigDecimal(Long.MaxValue)
  private val I64Min = BigDecimal(Long.MinValue)
  private val U64Max = BigDecimal("18446744073709551615")

  /** The reference's value model holds integers in i64/u64 and everything
    * else as f64; an emitted bound OUTSIDE the integer window is the
    * shortest-decimal spelling of its f64 reading (`bound_rational.rs`
    * rendering). In-window integers stay exact. */
  private def f64Respell(v: BigDecimal): BigDecimal =
    if (v.isWhole && v >= I64Min && v <= U64Max) v
    else {
      val d = v.toDouble
      if (java.lang.Double.isFinite(d)) BigDecimal(java.lang.Double.toString(d)) else v
    }

  /** `pinned`: type atoms an ENCLOSING conjunction already pins — an allOf
    * member only ever sees instances inside them, so a bare-constraint
    * member whose constrained domains cover the pin stays compact (the
    * reference's IR leaves under a typed conjunction emit raw — the
    * partitioned divisor view's `{multipleOf: n}` members). */
  private def emissionPartition(sp: Spec, pinned: Set[String] = allAtoms): Spec = sp match {
    case o00: Spec.Obj =>
      // symbolic ¬uniqueItems renders allOf-wrapped with its typed target
      // (a PURE not-wrapper stays as written — wrapping it again would
      // recurse forever through the allOf view)
      val o0 = o00.not match {
        case Some(nt: Spec.Obj) if isSymbolicNot(nt) && !only(o00)(_.copy(not = None)) =>
          o00.copy(not = None, allOf = o00.allOf :+ Spec.Obj(not = Some(nt)))
        case _ => o00
      }
      // recurse into subschemas first (properties etc. partition too)
      val o = o0.copy(
        minimum = o0.minimum.map(f64Respell),
        maximum = o0.maximum.map(f64Respell),
        exclusiveMinimum = o0.exclusiveMinimum.map(f64Respell),
        exclusiveMaximum = o0.exclusiveMaximum.map(f64Respell),
        multipleOf = o0.multipleOf.map(f64Respell),
        properties = o0.properties.map { case (k, v) => k -> emissionPartition(v) },
        items = o0.items.map(emissionPartition(_)),
        prefixItems = o0.prefixItems.map(emissionPartition(_)),
        contains = o0.contains.map(emissionPartition(_)),
        additionalProperties = o0.additionalProperties.map(emissionPartition(_)),
        dependentSchemas = o0.dependentSchemas.map { case (k, v) => k -> emissionPartition(v) },
        allOf = o0.allOf.map(m => emissionPartition(m,
          o0.types.map(atomsOf).getOrElse(allAtoms))),
        anyOf = o0.anyOf.map(emissionPartition(_)),
        oneOf = o0.oneOf.map(emissionPartition(_)),
        ifSpec = o0.ifSpec.map(emissionPartition(_)),
        thenSpec = o0.thenSpec.map(emissionPartition(_)),
        elseSpec = o0.elseSpec.map(emissionPartition(_)),
        // a constraint-bearing propertyNames target carries its implicit
        // string type in the emitted view (value-set targets stay bare)
        propertyNames = o0.propertyNames.map {
          case po: Spec.Obj if po != Spec.empty && po.types.isEmpty &&
              po.const.isEmpty && po.enumVals.isEmpty =>
            po.copy(types = Some(Set(JsonType.String): Set[JsonType]))
          case other => other
        },
        // a KEPT not spells scalar value sets as `enum` (negate.rs value
        // rendering: `not:{const:c}` emits as `not:{enum:[c]}`; non-empty
        // container constants stay raw)
        not = o0.not.map {
          case n: Spec.Obj => n.const match {
            case Some(c) if !c.isInstanceOf[JObj] && !c.isInstanceOf[JArr] =>
              n.copy(const = None, enumVals = Some(Vector(c)))
            case _ => n
          }
          case other => other
        }) match {
        // partitioned branches re-nest the union: flatten and dedup the
        // shared free-types pieces
        case oo: Spec.Obj if oo.anyOf.nonEmpty =>
          oo.copy(anyOf = oo.anyOf.flatMap {
            case b: Spec.Obj if b.anyOf.nonEmpty && only(b)(_.copy(anyOf = Vector.empty)) => b.anyOf
            case b => Vector(b)
          }.distinct)
        case oo => oo
      }
      val eligible =
        o.const.isEmpty && o.enumVals.isEmpty && o.not.isEmpty &&
        o.allOf.isEmpty && o.anyOf.isEmpty && o.oneOf.isEmpty &&
        o.ifSpec.isEmpty && o.thenSpec.isEmpty && o.elseSpec.isEmpty &&
        o.ref.isEmpty && o.dynamicRef.isEmpty && o.recursiveRef.isEmpty &&
        o.id.isEmpty && o.anchor.isEmpty && o.dynamicAnchor.isEmpty && !o.recursiveAnchor &&
        o.defs.isEmpty && o.others.isEmpty && o.format.isEmpty && o.pattern.isEmpty &&
        o.contentEncoding.isEmpty && o.contentMediaType.isEmpty && o.contentSchema.isEmpty &&
        o.unevaluatedProperties.isEmpty && o.unevaluatedItems.isEmpty
      if (!eligible) return o
      val hasNum = o.minimum.nonEmpty || o.maximum.nonEmpty ||
        o.exclusiveMinimum.nonEmpty || o.exclusiveMaximum.nonEmpty || o.multipleOf.nonEmpty
      val hasStr = o.minLength.nonEmpty || o.maxLength.nonEmpty
      val hasArr = o.minItems.nonEmpty || o.maxItems.nonEmpty || o.uniqueItems ||
        o.items.nonEmpty || o.prefixItems.nonEmpty || o.contains.nonEmpty ||
        o.minContains.nonEmpty || o.maxContains.nonEmpty
      val hasObj = o.minProperties.nonEmpty || o.maxProperties.nonEmpty ||
        o.required.nonEmpty || o.properties.nonEmpty || o.patternProperties.nonEmpty ||
        o.additionalProperties.nonEmpty || o.propertyNames.nonEmpty ||
        o.dependentRequired.nonEmpty || o.dependentSchemas.nonEmpty
      // past the modeled integer projection the bound stays raw
      val boundsModeled = (o.minimum.toSeq ++ o.maximum ++ o.exclusiveMinimum ++
        o.exclusiveMaximum ++ o.multipleOf).forall(_.abs <= I64Max)
      if (hasNum && !boundsModeled) return o
      // a TYPED leaf partitions too when its declared types extend beyond
      // the constrained domains (the constraint is vacuous on the extra
      // types — reference IR holds such leaves partitioned by type);
      // types inside the constrained domains stay compact
      val declared = o.types.map(atomsOf).getOrElse(allAtoms).intersect(pinned)
      if (declared.isEmpty) return o
      var constrained = Set.empty[String]
      val groups = Vector.newBuilder[Spec]
      if (hasNum && declared.contains("int")) {
        constrained ++= Set("int", "nonint")
        val numTypes: Set[JsonType] =
          if (declared.contains("nonint")) Set(JsonType.Number) else Set(JsonType.Integer)
        groups += numericNormalize(Spec.Obj(
          types = Some(numTypes),
          minimum = o.minimum, maximum = o.maximum,
          exclusiveMinimum = o.exclusiveMinimum, exclusiveMaximum = o.exclusiveMaximum,
          multipleOf = o.multipleOf))
      }
      if (hasStr && declared.contains("string")) {
        constrained += "string"
        groups += Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]),
          minLength = o.minLength.filter(_ > 0L), maxLength = o.maxLength)
      }
      if (hasArr && declared.contains("array")) {
        constrained += "array"
        groups += Spec.Obj(types = Some(Set(JsonType.Array): Set[JsonType]),
          minItems = o.minItems.filter(_ > 0L), maxItems = o.maxItems,
          uniqueItems = o.uniqueItems, items = o.items, prefixItems = o.prefixItems,
          contains = o.contains, minContains = o.minContains, maxContains = o.maxContains)
      }
      if (hasObj && declared.contains("object")) {
        constrained += "object"
        groups += Spec.Obj(types = Some(Set(JsonType.Object): Set[JsonType]),
          minProperties = o.minProperties.filter(_ > 0L), maxProperties = o.maxProperties,
          required = o.required, properties = o.properties,
          patternProperties = o.patternProperties,
          additionalProperties = o.additionalProperties, propertyNames = o.propertyNames,
          dependentRequired = o.dependentRequired, dependentSchemas = o.dependentSchemas)
      }
      val gs = groups.result().filter(g => g != Spec.empty)
      if (gs.isEmpty) return o
      val free = declared -- constrained
      // an in-domain leaf stays compact — typed itself, or typed by the
      // enclosing conjunction's pin (bare divisor members)
      if (free.isEmpty && (o.types.nonEmpty || pinned != allAtoms)) return o
      val pieces = typesFromAtoms(free) ++ gs
      pieces match {
        case Vector() => o
        case Vector(one) => one
        case many => Spec.Obj(anyOf = many)
      }
    case other => other
  }

  /** Object-applicator spelling cleanups (the reference's first-IR
    * normalizations): a tautological `additionalProperties: true` /
    * `dependentSchemas: {k: true}` / `propertyNames: true` / `items: true`
    * constrains nothing and drops; `additionalProperties: false` beside
    * declared properties IS a key-set constraint and spells as
    * `propertyNames: {enum: [keys]}` (with a `maxProperties` the key
    * count already implies dropped). Gated off annotation-bearing
    * documents — `additionalProperties`/`items` mark keys/items
    * evaluated where unevaluated* is in scope. */
  private def objectSpelling(o0: Spec.Obj): Spec.Obj = {
    var o = o0
    if (o.additionalProperties.contains(Spec.Accept))
      o = o.copy(additionalProperties = None)
    // a floor the required key count already guarantees is redundant
    if (o.minProperties.exists(_ <= o.required.distinct.length))
      o = o.copy(minProperties = None)
    if (o.items.contains(Spec.Accept)) o = o.copy(items = None)
    // `format` is annotation-only in the 2020-12 default dialect the
    // canonicalizer models (the reference's canonical output never carries
    // it); assert-formats validation reads the ORIGINAL spec, not the
    // canonical form
    if (o.format.nonEmpty) o = o.copy(format = None)
    // a prefix whose every position repeats the uniform tail schema adds
    // nothing: prefixItems[X,…] beside items:X ≡ items:X
    if (o.prefixItems.nonEmpty && o.items.exists(it => o.prefixItems.forall(_ == it)))
      o = o.copy(prefixItems = Vector.empty)
    if (o.propertyNames.contains(Spec.Accept)) o = o.copy(propertyNames = None)
    if (o.dependentSchemas.exists(_._2 == Spec.Accept))
      o = o.copy(dependentSchemas = o.dependentSchemas.filter(_._2 != Spec.Accept))
    o.not match {
      case Some(nt0: Spec.Obj) if !isSymbolicNot(nt0) =>
        var nt = nt0
        // ¬(A ∧ B) beside an enforced A ≡ ¬B: drop target conjuncts the
        // parent repeats (types it pins, property entries it declares)
        if (o.types.nonEmpty && nt.types.exists(ts =>
            expand(o.types.get).subsetOf(expand(ts))))
          nt = nt.copy(types = None)
        if (nt.properties.nonEmpty && nt.properties.forall(e => o.properties.contains(e)))
          nt = nt.copy(properties = nt.properties.filterNot(e => o.properties.contains(e)))
        if (nt ne nt0) {
          val rc = canon(nt, false)
          o = if (rc == Spec.Accept) o.copy(not = None, allOf = o.allOf :+ Spec.Reject)
              else if (rc == Spec.Reject) o.copy(not = None)
              else o.copy(not = Some(rc))
        }
      case _ => ()
    }
    if (o.additionalProperties.contains(Spec.Reject) && o.patternProperties.isEmpty &&
        o.propertyNames.isEmpty && o.properties.nonEmpty) {
      val keys = o.properties.map(_._1)
      o = o.copy(additionalProperties = None,
        propertyNames = Some(
          if (keys.length == 1) Spec.Obj(const = Some(JStr(keys.head)))
          else Spec.Obj(enumVals = Some(keys.map(JStr(_))))),
        maxProperties = o.maxProperties.filter(_ < keys.length))
    }
    // ¬(every key meets S) forces a violating key to EXIST, so a floor of
    // one is implied (only when the negated target is purely a key
    // constraint — any other negated facet could fail on the empty
    // object). Runs AFTER the not-rewrites above so a respelled
    // closed-object negation (→ ¬propertyNames) sheds its floor too.
    if (o.minProperties.contains(1L) && o.not.exists {
      case nt: Spec.Obj => nt.propertyNames.nonEmpty &&
        only(nt)(_.copy(propertyNames = None, types = None))
      case _ => false
    }) o = o.copy(minProperties = None)
    o
  }

  /** Interp-backed value-set filtering (per-kind leaves IR, lite): every
    * const/enum member is checked against the REST of the schema with the
    * reference-faithful interpreter; survivors ARE the accepted set, so
    * the leaf collapses to just them. Full finite domains keep the `type`
    * spelling the reference emits ([null] → type:null, [false,true] →
    * type:boolean). Gated off anything the interpreter's verdict does not
    * fully decide for the engine (refs, format/content assertion modes,
    * custom keywords, unevaluated annotations). */
  private def valueSetCollapse(o: Spec.Obj, annotationsMatter: Boolean): Spec = {
    val hasValues = o.const.nonEmpty || o.enumVals.nonEmpty
    val eligible = hasValues && !annotationsMatter && !containsRefs(o) &&
      o.format.isEmpty && o.contentEncoding.isEmpty && o.contentMediaType.isEmpty &&
      o.contentSchema.isEmpty && o.others.isEmpty && o.defs.isEmpty &&
      o.unevaluatedProperties.isEmpty && o.unevaluatedItems.isEmpty &&
      o.id.isEmpty && o.anchor.isEmpty && o.dynamicAnchor.isEmpty && !o.recursiveAnchor
    if (!eligible) return o
    val members: Vector[JsonValue] = o.const match {
      case Some(c) =>
        if (o.enumVals.forall(vs => vs.exists(JsonValue.equal(_, c)))) Vector(c)
        else Vector.empty
      case None => o.enumVals.getOrElse(Vector.empty)
    }
    val rest = o.copy(const = None, enumVals = None)
    val kept =
      try members.filter(v => Interp.isValid(rest, v))
      catch { case _: Throwable => return o }
    if (kept.isEmpty) Spec.Reject
    else {
      val ts = kept.map(_.jsonType).toSet
      val finiteDomain = ts.subsetOf(Set(JsonType.Null, JsonType.Boolean): Set[JsonType]) &&
        (!ts.contains(JsonType.Boolean) ||
          (kept.exists(JsonValue.equal(_, JBool(true))) &&
           kept.exists(JsonValue.equal(_, JBool(false)))))
      if (finiteDomain) Spec.Obj(types = Some(ts))
      // past the i64 projection the member keeps its `enum` spelling (the
      // reference's value model holds no const for it)
      else if (kept.size == 1 && (kept.head match {
        case n: JNum => n.value.abs < I64Max
        case _ => true
      })) Spec.Obj(const = Some(kept.head))
      else Spec.Obj(enumVals = Some(kept))
    }
  }

  /** A value set of OBJECT members beside an UNDECIDABLE negation (a kept
    * `not` carrying `$ref`s — Interp member-filtering is gated) respells
    * as exact object constraints: members grouped by key set, each group a
    * `{type:object, required:keys, maxProperties:|keys|, properties:
    * {k: values-at-k}}` branch conjoined with the kept not (the
    * reference's pinned-member partitioned emission). Exactness: a
    * single-key group is always the full product of its values; multi-key
    * groups respell only as singletons. */
  private def valueSetObjectRespell(o: Spec.Obj): Spec = {
    val members = o.const.map(Vector(_)).orElse(o.enumVals).getOrElse(Vector.empty)
    val eligible = members.nonEmpty && members.forall(_.isInstanceOf[JObj]) &&
      o.not.exists(containsRefs) &&
      only(o)(_.copy(const = None, enumVals = None, not = None, types = None,
        defs = Map.empty)) &&
      o.types.forall(ts => expand(ts).contains(JsonType.Object))
    if (!eligible) return o
    val objs = members.collect { case m: JObj => m }
    val groups = objs.groupBy(_.fields.map(_._1).sorted).toVector.sortBy(_._1.mkString("\u0000"))
    if (!groups.forall { case (ks, ms) => ks.length <= 1 || ms.length == 1 }) return o
    def valueSpec(vs: Vector[JsonValue]): Spec = {
      val uniq = vs.foldLeft(Vector.empty[JsonValue])((acc, v) =>
        if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v)
      if (uniq.size == 1 && (uniq.head match {
        case n: JNum => n.value.abs < I64Max
        case _ => true
      })) Spec.Obj(const = Some(uniq.head))
      else Spec.Obj(enumVals = Some(uniq))
    }
    val branches: Vector[Spec.Obj] = groups.map { case (ks, ms) =>
      Spec.Obj(
        types = Some(Set(JsonType.Object): Set[JsonType]),
        required = ks,
        maxProperties = Some(ks.length.toLong),
        properties = ks.map(k => k ->
          valueSpec(ms.flatMap(m => m.fields.collect { case (`k`, v) => v }))),
        not = o.not)
    }
    branches match {
      case Vector(one) => one.copy(defs = o.defs)
      case many => Spec.Obj(anyOf = many.toVector, defs = o.defs)
    }
  }

  // ---- negation pushdown (`canonical/negate.rs:65-126` lite) -----------

  /** Is `o` exactly the empty schema plus the given projection cleared?
    * (the defs-spelling flag is presentation, not a constraint) */
  private def only(o: Spec.Obj)(clear: Spec.Obj => Spec.Obj): Boolean =
    clear(o).copy(legacyDefs = false) == Spec.empty

  /** Root-document `$defs`, visible to the negation algebra: the
    * reference resolves symbolic branches before complementing (the
    * SPELLINGS keep the refs; only the complement computation chases). */
  private val rootDefsTL: ThreadLocal[Map[String, Spec]] =
    ThreadLocal.withInitial(() => Map.empty[String, Spec])
  private def chaseRootDefs(s: Spec, hops: Int = 0): Spec = s match {
    case r: Spec.Obj if hops < 8 && only(r)(_.copy(ref = None)) &&
        r.ref.exists(_.startsWith("#/$defs/")) =>
      val name = r.ref.get.stripPrefix("#/$defs/")
        .replace("~1", "/").replace("~0", "~")
      if (name.contains('/')) s
      else rootDefsTL.get().get(name).map(chaseRootDefs(_, hops + 1)).getOrElse(s)
    case _ => s
  }

  /** Push a `not` into a positive form where the algebra allows:
    * De Morgan over anyOf, double negation, and typed-leaf negation of
    * single bound/length/size keywords (the "vacuous pass" rule means
    * not({minimum:m}) accepts ONLY numbers below m → {type:number,
    * exclusiveMaximum:m}). Returns None when no sound rewrite exists. */
  private def pushNot(inner: Spec): Option[Spec] = pushNot(inner, bare = true, depth = 0)
  private def pushNot(inner: Spec, bare: Boolean): Option[Spec] =
    pushNot(inner, bare, depth = 0)

  /** `bare` = the `not` stood alone in its parent; a not conjoined with
    * sibling constraints keeps context-sensitive spellings (e.g. a bare
    * whole-divisor negation partitions, a conjoined one stays inline —
    * the reference's emission does the same). */
  private def pushNot(inner: Spec, bare: Boolean, depth: Int): Option[Spec] = inner match {
    case Spec.Accept => Some(Spec.Reject)
    case Spec.Reject => Some(Spec.Accept)
    // nested negations can GROW terms (each partition multiplies pieces a
    // later De Morgan negates again) — past this depth the not stays as
    // written, like any other unpushable form
    case _ if depth > 6 => None
    case o: Spec.Obj =>
      if (o.not.nonEmpty && only(o)(_.copy(not = None)))
        Some(o.not.get) // ¬¬X = X
      else if (o.not.nonEmpty && o.types.nonEmpty && only(o)(_.copy(not = None, types = None))) {
        // ¬(T ∧ ¬X) = ¬T ∨ (T ∧ X); the inner canon runs only for a
        // negation-free X (a nested not could re-enter this rule and grow)
        val comp = typesFromAtoms(allAtoms -- atomsOf(o.types.get))
        val conj = Spec.Obj(types = o.types, allOf = Vector(o.not.get))
        def hasNot(x: Spec): Boolean = x match {
          case xo: Spec.Obj => xo.not.nonEmpty || subschemas(xo).exists(hasNot)
          case _ => false
        }
        val within = if (depth <= 2 && !hasNot(o.not.get)) canon(conj, false) else conj
        Some(Spec.Obj(anyOf = comp :+ within))
      }
      else if (o.anyOf.nonEmpty && o.anyOf.length > 4 &&
          only(o)(_.copy(anyOf = Vector.empty)))
        // a union too wide to complement branch-by-branch keeps its not
        // symbolic (the reference's width budget: the De Morgan product
        // multiplies each branch's partition pieces)
        None
      else if (o.anyOf.nonEmpty && only(o)(_.copy(anyOf = Vector.empty)))
        // De Morgan: ¬(a ∨ b) = ¬a ∧ ¬b (each negation pushed in turn)
        Some(Spec.Obj(allOf = o.anyOf.map { b =>
          val w = Spec.Obj(not = Some(b))
          pushNot(b, bare = true, depth + 1) match {
            case Some(Spec.Reject) => Spec.Reject
            case Some(Spec.Accept) => Spec.Accept
            case Some(p) => p
            case None => w
          }
        }))
      else if (o.oneOf.length == 2 && only(o)(_.copy(oneOf = Vector.empty)) &&
          depth <= 4) {
        // ¬(exactly one of A,B) = (A∧B) ∨ (¬A∧¬B) — complements computed
        // on the defs-RESOLVED branches (negate.rs); the shared-values
        // conjunct keeps the symbolic spellings
        val a = o.oneOf(0); val b = o.oneOf(1)
        val ra = chaseRootDefs(a); val rb = chaseRootDefs(b)
        (pushNot(ra, bare = true, depth + 1), pushNot(rb, bare = true, depth + 1)) match {
          case (Some(na), Some(nb)) =>
            val both: Spec =
              if (disjoint(ra, rb)) Spec.Reject
              else canon(Spec.Obj(allOf = Vector(a, b)), false)
            val neither = canon(Spec.Obj(allOf = Vector(na, nb)), false)
            Some(Vector(both, neither).filter(_ != Spec.Reject) match {
              case Vector() => Spec.Reject
              case Vector(one) => one
              case many => Spec.Obj(anyOf = many)
            })
          case _ => None
        }
      }
      else negateLeaf(o, bare, depth)
  }

  // ---- type atoms: `integer` splits `number` into whole / non-whole ----
  private val allAtoms: Set[String] =
    Set("null", "boolean", "string", "array", "object", "int", "nonint")
  private def atomsOf(ts: Set[JsonType]): Set[String] = ts.flatMap {
    case JsonType.Null => Set("null"); case JsonType.Boolean => Set("boolean")
    case JsonType.String => Set("string"); case JsonType.Array => Set("array")
    case JsonType.Object => Set("object")
    case JsonType.Integer => Set("int")
    case JsonType.Number => Set("int", "nonint")
  }
  private val nonWholeNumbers = Spec.Obj(types = Some(Set(JsonType.Number): Set[JsonType]),
    not = Some(Spec.Obj(multipleOf = Some(BigDecimal(1)))))
  /** Atom set → positive schemas (possibly two: a plain type list plus the
    * non-whole-number piece spelled `{type:number, not:{multipleOf:1}}`). */
  private def typesFromAtoms(as: Set[String]): Vector[Spec] = {
    var plain = Set.empty[JsonType]
    if (as("null")) plain += JsonType.Null
    if (as("boolean")) plain += JsonType.Boolean
    if (as("string")) plain += JsonType.String
    if (as("array")) plain += JsonType.Array
    if (as("object")) plain += JsonType.Object
    val extra =
      if (as("int") && as("nonint")) { plain += JsonType.Number; Vector.empty[Spec] }
      else if (as("int")) { plain += JsonType.Integer; Vector.empty[Spec] }
      else if (as("nonint")) Vector[Spec](nonWholeNumbers)
      else Vector.empty[Spec]
    (if (plain.isEmpty) Vector.empty[Spec]
     else Vector[Spec](Spec.Obj(types = Some(plain)))) ++ extra
  }

  /** Partitioned leaf negation — the reference's negate.rs normal form:
    * ¬(T ∧ C₁ ∧ C₂ …) over a scalar leaf becomes
    * `anyOf[ complement-of-T , (T∩dom C₁)∧¬C₁ , (T∩dom C₂)∧¬C₂ , … ]`,
    * with each keyword complemented within its own domain type (a keyword
    * passes vacuously outside it, so its negation rejects there) and the
    * type complement tracked at ATOM granularity — `integer` splits
    * `number` into whole and non-whole halves, the latter spelled
    * `{type:number, not:{multipleOf:1}}` like the reference. Value sets
    * partition per member type: numeric members become the open rays and
    * gaps around them, boolean members free the other constant, a null
    * member consumes its whole domain. None ⇒ no sound spelling (the
    * `not` keyword stays as written). */
  private def negateLeaf(o: Spec.Obj, bare: Boolean, depth: Int): Option[Spec] = {
    val unsupported =
      o.not.nonEmpty || o.allOf.nonEmpty || o.anyOf.nonEmpty || o.oneOf.nonEmpty ||
      o.ifSpec.nonEmpty || o.thenSpec.nonEmpty || o.elseSpec.nonEmpty ||
      o.ref.nonEmpty || o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty ||
      o.id.nonEmpty || o.anchor.nonEmpty || o.dynamicAnchor.nonEmpty || o.recursiveAnchor ||
      o.defs.nonEmpty || o.others.nonEmpty ||
      o.patternProperties.nonEmpty ||
      o.dependentRequired.nonEmpty || o.dependentSchemas.nonEmpty ||
      // ¬(items S) within array spells as `contains ¬S` (and ¬contains as
      // items); beside a prefix tuple only a CLOSED tail (items:false)
      // complements (its failure is exactly "an item lies beyond");
      // explicit contains-count bounds have no complement spelling here
      (o.prefixItems.nonEmpty && o.items.exists(_ != Spec.Reject)) ||
      o.minContains.exists(_ != 1L) || o.maxContains.nonEmpty ||
      o.unevaluatedProperties.nonEmpty || o.unevaluatedItems.nonEmpty ||
      o.format.nonEmpty || o.contentEncoding.nonEmpty || o.contentMediaType.nonEmpty ||
      o.contentSchema.nonEmpty
    if (unsupported) return None
    // an UNTYPED divisor negation: a WHOLE sole divisor partitions into
    // the non-whole numbers plus the integers off the grid (the
    // reference's "not of a bare multipleOf"); anything else stays as
    // written (`not:{multipleOf:m}` in place)
    if (o.multipleOf.nonEmpty && o.types.isEmpty) {
      val m = o.multipleOf.get
      return if (bare && m.isWhole && m.signum > 0 && only(o)(_.copy(multipleOf = None)))
        Some(Spec.Obj(anyOf = Vector(
          Spec.Obj(types = Some(Set(JsonType.Number): Set[JsonType]),
            not = Some(Spec.Obj(multipleOf = Some(BigDecimal(1))))),
          Spec.Obj(types = Some(Set(JsonType.Integer): Set[JsonType]),
            not = Some(Spec.Obj(multipleOf = Some(m)))))))
      else None
    }
    // ¬pattern has no positive spelling — the emitted string branch wraps
    // the very same not, so pushing a BARE pattern-only schema would grow
    // forever ({string, allOf:[not:{pattern}]} nests itself); it stays
    // as written and only the TYPED pattern leaf partitions
    if (o.pattern.nonEmpty && o.types.isEmpty && only(o)(_.copy(pattern = None)))
      return None
    val hasValues = o.const.nonEmpty || o.enumVals.nonEmpty
    val hasConstraints = o.minimum.nonEmpty || o.maximum.nonEmpty ||
      o.exclusiveMinimum.nonEmpty || o.exclusiveMaximum.nonEmpty || o.multipleOf.nonEmpty ||
      o.minLength.nonEmpty || o.maxLength.nonEmpty || o.pattern.nonEmpty ||
      o.minItems.nonEmpty || o.maxItems.nonEmpty ||
      o.items.nonEmpty || o.contains.nonEmpty || o.prefixItems.nonEmpty || o.uniqueItems ||
      o.minProperties.nonEmpty || o.maxProperties.nonEmpty ||
      o.required.nonEmpty || o.properties.nonEmpty || o.propertyNames.nonEmpty ||
      o.additionalProperties.nonEmpty
    if (hasValues && hasConstraints) return None

    val tAtoms = atomsOf(o.types.getOrElse(JsonType.all.toSet))
    val branches = Vector.newBuilder[Spec]
    branches ++= typesFromAtoms(allAtoms -- tAtoms)
    def numT = Some(Set(JsonType.Number): Set[JsonType])
    def carrier: Option[Set[JsonType]] =
      if (tAtoms("int") && tAtoms("nonint")) Some(Set(JsonType.Number))
      else if (tAtoms("int")) Some(Set(JsonType.Integer))
      else None

    if (hasValues) {
      val members = o.const.map(Vector(_)).getOrElse(o.enumVals.get)
      // non-empty container members: the values differing in one element /
      // key have no positive form — the not stays as written
      if (members.exists {
        case a: JArr => a.items.nonEmpty
        case ob: JObj => ob.fields.nonEmpty
        case _ => false
      }) return None
      val strMembers = members.collect { case s: JStr => s }
      val hasEmptyArr = members.exists { case a: JArr => a.items.isEmpty; case _ => false }
      val hasEmptyObj = members.exists { case ob: JObj => ob.fields.isEmpty; case _ => false }
      val numMembers = members.collect { case n: JNum => n.value }.distinct.sorted
      // numeric members: only spellable over the FULL number domain, and
      // only inside the modeled integer projection — past ±i64 the gap
      // bounds around a member are not spellable in the reference's value
      // model, so the not stays as written (negate.rs i64 gate)
      if (numMembers.nonEmpty && !(tAtoms("int") && tAtoms("nonint"))) return None
      if (numMembers.exists(_.abs >= I64Max)) return None
      if (tAtoms("null") && !members.contains(JNull))
        branches += Spec.Obj(types = Some(Set(JsonType.Null): Set[JsonType]))
      if (tAtoms("boolean")) {
        val hasT = members.exists(JsonValue.equal(_, JBool(true)))
        val hasF = members.exists(JsonValue.equal(_, JBool(false)))
        if (!hasT && !hasF) branches += Spec.Obj(types = Some(Set(JsonType.Boolean): Set[JsonType]))
        else if (!hasT) branches += Spec.Obj(const = Some(JBool(true)))
        else if (!hasF) branches += Spec.Obj(const = Some(JBool(false)))
      }
      if (tAtoms("int") && tAtoms("nonint")) {
        if (numMembers.isEmpty)
          branches += Spec.Obj(types = Some(Set(JsonType.Number): Set[JsonType]))
        else {
          branches += Spec.Obj(types = numT, exclusiveMaximum = Some(numMembers.head))
          numMembers.sliding(2).foreach {
            case Seq(a, b) => branches += Spec.Obj(types = numT,
              exclusiveMinimum = Some(a), exclusiveMaximum = Some(b))
            case _ => ()
          }
          branches += Spec.Obj(types = numT, exclusiveMinimum = Some(numMembers.last))
        }
      }
      // string/array/object atoms of T: whole domain when no members of
      // that type; string members keep a `not:{enum}` inside the string
      // branch (¬ a finite string set has no positive spelling); an empty
      // container member frees the rest of its domain via a size floor
      if (tAtoms("string")) {
        if (strMembers.isEmpty)
          branches += Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]))
        else
          branches += Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]),
            not = Some(Spec.Obj(enumVals = Some(strMembers.toVector: Vector[JsonValue]))))
      }
      if (tAtoms("array")) {
        if (!hasEmptyArr)
          branches += Spec.Obj(types = Some(Set(JsonType.Array): Set[JsonType]))
        else
          branches += Spec.Obj(types = Some(Set(JsonType.Array): Set[JsonType]),
            minItems = Some(1L))
      }
      if (tAtoms("object")) {
        if (!hasEmptyObj)
          branches += Spec.Obj(types = Some(Set(JsonType.Object): Set[JsonType]))
        else
          branches += Spec.Obj(types = Some(Set(JsonType.Object): Set[JsonType]),
            minProperties = Some(1L))
      }
    } else {
      // per-keyword complements within each keyword's domain
      val numericDom = tAtoms("int") || tAtoms("nonint")
      if (numericDom) {
        val ct = carrier
        def numBranch(f: Spec.Obj => Spec.Obj): Unit = ct match {
          case Some(t) => branches += numericNormalize(f(Spec.Obj(types = Some(t))))
          case None => () // nonint-only carrier: no spelling — but then
                          // numeric keywords also never PASS wholes; bail
        }
        if (ct.isEmpty && (o.minimum.nonEmpty || o.maximum.nonEmpty ||
            o.exclusiveMinimum.nonEmpty || o.exclusiveMaximum.nonEmpty ||
            o.multipleOf.nonEmpty)) return None
        o.minimum.foreach(m => numBranch(_.copy(exclusiveMaximum = Some(m))))
        o.maximum.foreach(m => numBranch(_.copy(exclusiveMinimum = Some(m))))
        o.exclusiveMinimum.foreach(m => numBranch(_.copy(maximum = Some(m))))
        o.exclusiveMaximum.foreach(m => numBranch(_.copy(minimum = Some(m))))
        o.multipleOf.foreach(m =>
          numBranch(_.copy(not = Some(Spec.Obj(multipleOf = Some(m))))))
      }
      if (tAtoms("string")) {
        val st = Some(Set(JsonType.String): Set[JsonType])
        o.minLength.foreach(n => if (n > 0)
          branches += Spec.Obj(types = st, maxLength = Some(n - 1)))
        o.maxLength.foreach(n =>
          branches += Spec.Obj(types = st, minLength = Some(n + 1)))
        o.pattern.foreach(p =>
          branches += Spec.Obj(types = st,
            allOf = Vector(Spec.Obj(not = Some(Spec.Obj(pattern = Some(p)))))))
      }
      if (tAtoms("array")) {
        val at = Some(Set(JsonType.Array): Set[JsonType])
        o.minItems.foreach(n => if (n > 0)
          branches += Spec.Obj(types = at, maxItems = Some(n - 1)))
        o.maxItems.foreach(n =>
          branches += Spec.Obj(types = at, minItems = Some(n + 1)))
        // ¬(every element meets S) ⟺ some element meets ¬S (negate.rs
        // element rule); ¬(some element meets S) ⟺ every element meets ¬S
        if (o.prefixItems.isEmpty) o.items.foreach { s =>
          pushNot(s, bare = true, depth + 1) match {
            case None => return None
            case Some(Spec.Reject) => () // items:true never fails
            case Some(Spec.Accept) =>
              branches += Spec.Obj(types = at, minItems = Some(1L))
            case Some(ns) =>
              branches += Spec.Obj(types = at, contains = Some(ns))
          }
        }
        // ¬(position i meets Sᵢ): the position exists and carries ¬Sᵢ; a
        // sibling `contains` branch already owns the empty array, so the
        // floor is emitted only without one (mirrors negate.rs tuple view)
        if (o.prefixItems.nonEmpty) {
          val withFloor = o.contains.isEmpty
          o.prefixItems.zipWithIndex.foreach { case (s, i) =>
            pushNot(s, bare = true, depth + 1) match {
              case None => return None
              case Some(Spec.Reject) => () // position schema accepts everything
              case Some(Spec.Accept) => // position schema rejects everything
                branches += Spec.Obj(types = at, minItems = Some(i + 1L))
              case Some(ns) =>
                branches += Spec.Obj(types = at,
                  prefixItems = Vector.fill[Spec](i)(Spec.Accept) :+ ns,
                  minItems = if (withFloor) Some(i + 1L) else None)
            }
          }
          // a CLOSED tail fails precisely when an item lies beyond it
          if (o.items.contains(Spec.Reject))
            branches += Spec.Obj(types = at, minItems = Some(o.prefixItems.length + 1L))
        }
        // ¬uniqueItems (a repeat exists) has no positive spelling — it
        // stays symbolic, allOf-wrapped with its full typed target, under
        // the implied floor of two
        if (o.uniqueItems)
          branches += Spec.Obj(types = at, minItems = Some(2L),
            allOf = Vector(Spec.Obj(not = Some(
              Spec.Obj(types = at, uniqueItems = true)))))
        o.contains.foreach { s =>
          pushNot(s, bare = true, depth + 1) match {
            case None => return None
            case Some(Spec.Reject) => // S accepts all: only [] fails contains
              branches += Spec.Obj(types = at, maxItems = Some(0L))
            case Some(Spec.Accept) => // S rejects all: contains always fails
              branches += Spec.Obj(types = at)
            case Some(ns) =>
              branches += Spec.Obj(types = at, items = Some(ns))
          }
        }
      }
      if (tAtoms("object")) {
        val ot = Some(Set(JsonType.Object): Set[JsonType])
        o.minProperties.foreach(n => if (n > 0)
          branches += Spec.Obj(types = ot, maxProperties = Some(n - 1)))
        o.maxProperties.foreach(n =>
          branches += Spec.Obj(types = ot, minProperties = Some(n + 1)))
        o.required.foreach(k =>
          branches += Spec.Obj(types = ot,
            properties = Vector(k -> Spec.Reject)))
        // conjoined parents keep `not:{propertyNames}` in place, where
        // the pinned-keyset unsatisfiability analysis reads it
        if (o.propertyNames.nonEmpty && !bare) return None
        o.propertyNames.foreach { pn =>
          // a key violating the name schema must exist; the reference
          // re-spells the target with its implicit string type
          val typed = pn match {
            // a referenced name schema keeps its pointer pristine — the
            // implicit string type conjoins beside it (reference spelling)
            case po: Spec.Obj if po.ref.nonEmpty =>
              Spec.Obj(allOf = Vector(po,
                Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]))))
            case po: Spec.Obj if po.types.isEmpty && po.const.isEmpty && po.enumVals.isEmpty =>
              po.copy(types = Some(Set(JsonType.String): Set[JsonType]))
            case other => other
          }
          branches += Spec.Obj(types = ot,
            not = Some(Spec.Obj(propertyNames = Some(typed))))
        }
        o.properties.foreach { case (k, sub) =>
          pushNot(sub, bare = true, depth + 1) match {
            case None => return None
            case Some(Spec.Reject) => () // ¬sub impossible (sub accepts all)
            case Some(Spec.Accept) =>
              branches += Spec.Obj(types = ot, required = Vector(k))
            case Some(ns) =>
              branches += Spec.Obj(types = ot, required = Vector(k),
                properties = Vector(k -> ns))
          }
        }
        // a value shield (additionalProperties): its complement has no
        // positive spelling — the not stays inside the object branch with
        // the implicit type hoisted. Beside declared properties the shield
        // applies only to UNDECLARED keys, so the kept not masks the
        // declared ones with `true` (negate.rs partitioned object view:
        // the per-key branches above own the declared-key failures).
        o.additionalProperties.foreach { ap =>
          if (ap == Spec.Accept) () // never fails
          else if (ap == Spec.Reject && o.properties.isEmpty) // ¬(no properties at all)
            branches += Spec.Obj(types = ot, minProperties = Some(1L))
          else {
            val mask =
              if (o.properties.isEmpty) Vector.empty[(String, Spec)]
              else o.properties.map { case (k, _) => k -> (Spec.Accept: Spec) }
            branches += Spec.Obj(types = ot,
              not = Some(Spec.Obj(additionalProperties = Some(ap), properties = mask)))
          }
        }
      }
    }
    val bs = branches.result().filter(_ != Spec.Reject)
    Some(bs match {
      case Vector() => Spec.Reject
      case Vector(one) => one
      case many => Spec.Obj(anyOf = many)
    })
  }

  /** Rewrite the `not` keyword of `o` into positive conjuncts when the
    * pushed form exists (kept as an allOf member so foldAllOf merges it). */
  /** The reference's symbolic-ref spelling (references.json): a canonical
    * node never mixes `$ref` with sibling assertions — a LONE ref (or a
    * lone symbolic not) sits directly on the node after unwrapping a sole
    * allOf member, while ref-plus-siblings splits into
    * `allOf[{$ref}, {siblings}]` with `$defs`/identifiers on the outer.
    * The split is skipped under unevaluated* (an allOf member's
    * unevaluatedProperties no longer sees its sibling's evaluations). */
  private def refSpelling(o: Spec.Obj, annotationsMatter: Boolean): Spec.Obj = {
    def bookkeepingOnly(x: Spec.Obj)(alsoClear: Spec.Obj => Spec.Obj): Boolean =
      only(x)(y => alsoClear(y).copy(defs = Map.empty, id = None,
        anchor = None, dynamicAnchor = None))
    val o1 = o.allOf match {
      case Vector(m: Spec.Obj) if o.ref.isEmpty && m.ref.nonEmpty &&
          only(m)(_.copy(ref = None)) &&
          bookkeepingOnly(o)(_.copy(allOf = Vector.empty)) =>
        o.copy(ref = m.ref, allOf = Vector.empty)
      case Vector(m: Spec.Obj) if o.not.isEmpty && m.not.nonEmpty &&
          only(m)(_.copy(not = None)) &&
          bookkeepingOnly(o)(_.copy(allOf = Vector.empty)) =>
        o.copy(not = m.not, allOf = Vector.empty)
      case _ => o
    }
    if (o1.ref.isEmpty || annotationsMatter ||
        o1.unevaluatedProperties.nonEmpty || o1.unevaluatedItems.nonEmpty ||
        o1.others.nonEmpty || o1.vocabulary.nonEmpty || o1.recursiveAnchor ||
        o1.dynamicRef.nonEmpty || o1.recursiveRef.nonEmpty ||
        bookkeepingOnly(o1)(_.copy(ref = None, allOf = Vector.empty)))
      o1
    else {
      val rest = o1.copy(ref = None, allOf = Vector.empty, defs = Map.empty,
        legacyDefs = false, id = None, anchor = None, dynamicAnchor = None)
      val members = (Vector(Spec.Obj(ref = o1.ref): Spec) ++ o1.allOf ++
        (if (rest == Spec.empty) Vector.empty else Vector(rest: Spec)))
      if (members.length < 2) o1
      else Spec.Obj(defs = o1.defs, legacyDefs = o1.legacyDefs, id = o1.id,
        anchor = o1.anchor, dynamicAnchor = o1.dynamicAnchor, allOf = members)
    }
  }

  /** `dependentRequired`/`dependentSchemas` eliminate into presence
    * branches (dependencies.json): `k → D` ⟺ `¬k ∨ D`, where ¬k spells
    * `properties:{k:false}`; multiple entries expand as a product (capped
    * at 2 entries = 4 branches). Disabled when annotations matter (a
    * dependent schema's applicators feed evaluated-sets differently once
    * distributed). */
  private def rewriteDependencies(o: Spec.Obj, annotationsMatter: Boolean): Spec.Obj = {
    val nDR = o.dependentRequired.length
    val nDS = o.dependentSchemas.length
    if (nDR + nDS == 0 || nDR + nDS > 2 || annotationsMatter ||
        o.unevaluatedProperties.nonEmpty || o.unevaluatedItems.nonEmpty) return o
    // entries as (key, rhs): rhs is required-set or a subschema
    val entries: Vector[(String, Either[Vector[String], Spec])] =
      o.dependentRequired.map { case (k, deps) => k -> (Left(deps): Either[Vector[String], Spec]) } ++
      o.dependentSchemas.map { case (k, s) => k -> (Right(s): Either[Vector[String], Spec]) }
    // product over entries: each picks ¬k (key forbidden) or its rhs
    var branches: Vector[(Vector[String], Vector[String], Vector[Spec])] =
      Vector((Vector.empty, Vector.empty, Vector.empty)) // (forbidKeys, reqKeys, schemas)
    entries.foreach { case (k, rhs) =>
      branches = branches.flatMap { case (f, r, s) =>
        val withNot = (f :+ k, r, s)
        val withRhs = rhs match {
          case Left(deps) => (f, r ++ deps, s)
          case Right(sub) => (f, r, s :+ sub)
        }
        Vector(withNot, withRhs)
      }
    }
    val anyOfBranches: Vector[Spec] = branches.map { case (f, r, s) =>
      val ss = s.filter(_ != Spec.Accept)
      if (ss.contains(Spec.Reject)) Spec.Reject
      else if (f.isEmpty && r.isEmpty && ss.isEmpty) Spec.Accept
      else if (f.isEmpty && r.isEmpty && ss.length == 1) ss.head
      else Spec.Obj(
        properties = f.distinct.map(k => k -> (Spec.Reject: Spec)),
        required = r.distinct,
        allOf = ss)
    }
    o.copy(dependentRequired = Vector.empty, dependentSchemas = Vector.empty,
      allOf = o.allOf :+ Spec.Obj(anyOf = anyOfBranches))
  }

  /** `if I then T else E` ⟺ `anyOf[I∧T, ¬I∧E]` (the reference encodes the
    * conditional through its negation machinery — if_then_else.json; a
    * condition whose complement declines stays raw, raw_gate.json). A bare
    * `if` (no then/else) and `then`/`else` without `if` assert nothing.
    * Disabled when annotations matter: ¬I's spelling could evaluate
    * properties the original never did. */
  private def rewriteIte(o: Spec.Obj, annotationsMatter: Boolean): Spec.Obj =
    o.ifSpec match {
      case None =>
        if (o.thenSpec.nonEmpty || o.elseSpec.nonEmpty)
          o.copy(thenSpec = None, elseSpec = None)
        else o
      case Some(_) if annotationsMatter => o
      case Some(i) =>
        if (o.thenSpec.isEmpty && o.elseSpec.isEmpty) o.copy(ifSpec = None)
        else pushNot(i, bare = true).orElse {
          // a PURE symbolic reference complements symbolically:
          // `reference condition keeps its symbolic complement`
          i match {
            case io: Spec.Obj if io.ref.nonEmpty && only(io)(_.copy(ref = None)) =>
              Some(Spec.Obj(not = Some(io)))
            case _ => None
          }
        } match {
          case Some(negI) =>
            // conjoinSpecs canonicalizes non-trivial conjunctions in place
            // so the branches enter the union fold already merged
            val b1 = conjoinSpecs(i, o.thenSpec.getOrElse(Spec.Accept))
            val b2 = conjoinSpecs(negI, o.elseSpec.getOrElse(Spec.Accept))
            o.copy(ifSpec = None, thenSpec = None, elseSpec = None,
              allOf = o.allOf :+ Spec.Obj(anyOf = Vector(b1, b2)))
          case None => o // complement declined: keep the conditional raw
        }
    }

  private def pushNotKeyword(o: Spec.Obj): Spec.Obj = o.not match {
    case Some(n) => pushNot(n, bare = only(o)(_.copy(not = None))) match {
      case Some(Spec.Reject) => o.copy(not = None, allOf = o.allOf :+ Spec.Reject)
      case Some(Spec.Accept) => o.copy(not = None)
      case Some(p) => o.copy(not = None, allOf = o.allOf :+ p)
      case None => o
    }
    case None => o
  }

  // ---- oneOf disjointness / anyOf subsumption (`algebra.rs:415-727`) ---

  /** Scalar-only leaf (propertyNames allowed — compared recursively): no
    * other applicators, combinators, refs, annotations or identifiers —
    * the fragment where set comparisons are decidable. */
  /** `o` with every applicator/combinator/ref cleared — a WIDENING of `o`
    * (each cleared keyword only narrows), used for one-sided subsumption. */
  private def scalarSkeleton(o: Spec.Obj): Spec.Obj = o.copy(
    properties = Vector.empty, patternProperties = Vector.empty,
    additionalProperties = None, dependentRequired = Vector.empty,
    dependentSchemas = Vector.empty, items = None, prefixItems = Vector.empty,
    contains = None, allOf = Vector.empty, anyOf = Vector.empty,
    oneOf = Vector.empty, not = None, ifSpec = None, thenSpec = None,
    elseSpec = None, unevaluatedProperties = None, unevaluatedItems = None,
    contentEncoding = None, contentMediaType = None, contentSchema = None,
    ref = None, dynamicRef = None, recursiveRef = None,
    id = None, anchor = None, dynamicAnchor = None, recursiveAnchor = false,
    defs = Map.empty, others = Vector.empty)

  private def scalarLeaf(o: Spec.Obj): Boolean =
    o.properties.isEmpty && o.patternProperties.isEmpty &&
      o.additionalProperties.isEmpty &&
      o.dependentRequired.isEmpty && o.dependentSchemas.isEmpty &&
      o.items.isEmpty && o.prefixItems.isEmpty && o.contains.isEmpty &&
      o.allOf.isEmpty && o.anyOf.isEmpty && o.oneOf.isEmpty &&
      o.not.isEmpty && o.ifSpec.isEmpty && o.thenSpec.isEmpty && o.elseSpec.isEmpty &&
      o.unevaluatedProperties.isEmpty && o.unevaluatedItems.isEmpty &&
      o.contentEncoding.isEmpty && o.contentMediaType.isEmpty && o.contentSchema.isEmpty &&
      o.ref.isEmpty && o.dynamicRef.isEmpty && o.recursiveRef.isEmpty &&
      o.id.isEmpty && o.anchor.isEmpty && o.dynamicAnchor.isEmpty &&
      !o.recursiveAnchor && o.defs.isEmpty && o.others.isEmpty

  private def expand(ts: Set[JsonType]): Set[JsonType] =
    if (ts.contains(JsonType.Number)) ts + JsonType.Integer else ts

  /** Upper bound on the types instances of `s` can take; None = unknown. */
  private def possibleTypes(s: Spec): Option[Set[JsonType]] = s match {
    case o: Spec.Obj =>
      o.types.orElse(o.const.map(c => Set(c.jsonType)))
        .orElse(o.enumVals.map(_.map(_.jsonType).toSet))
        .map(expand)
    case _ => None
  }

  /** Does `g` accept every instance whose type lies in `ts`? True when g
    * has no type/value/combinator/ref constraints and each populated
    * keyword family's domain misses every type in `ts` (per-keyword
    * vacuity: non-applicable types pass, minmax.rs:59-65). */
  private def vacuousFor(g: Spec.Obj, tsOpt: Option[Set[JsonType]]): Boolean =
    tsOpt.exists { ts0 =>
      val ts = expand(ts0)
      def miss(t: JsonType*) = !t.exists(ts.contains)
      g.types.isEmpty && g.const.isEmpty && g.enumVals.isEmpty &&
      g.allOf.isEmpty && g.anyOf.isEmpty && g.oneOf.isEmpty && g.not.isEmpty &&
      g.ifSpec.isEmpty && g.thenSpec.isEmpty && g.elseSpec.isEmpty &&
      g.unevaluatedProperties.isEmpty && g.unevaluatedItems.isEmpty &&
      g.ref.isEmpty && g.dynamicRef.isEmpty && g.recursiveRef.isEmpty &&
      g.others.isEmpty && g.format.isEmpty &&
      (miss(JsonType.Number, JsonType.Integer) ||
        (g.minimum.isEmpty && g.maximum.isEmpty && g.exclusiveMinimum.isEmpty &&
          g.exclusiveMaximum.isEmpty && g.multipleOf.isEmpty)) &&
      (miss(JsonType.String) ||
        (g.minLength.isEmpty && g.maxLength.isEmpty && g.pattern.isEmpty &&
          g.contentEncoding.isEmpty && g.contentMediaType.isEmpty &&
          g.contentSchema.isEmpty)) &&
      (miss(JsonType.Object) ||
        (g.properties.isEmpty && g.patternProperties.isEmpty &&
          g.additionalProperties.isEmpty && g.propertyNames.isEmpty &&
          g.required.isEmpty && g.minProperties.isEmpty && g.maxProperties.isEmpty &&
          g.dependentRequired.isEmpty && g.dependentSchemas.isEmpty)) &&
      (miss(JsonType.Array) ||
        (g.items.isEmpty && g.prefixItems.isEmpty && g.minItems.isEmpty &&
          g.maxItems.isEmpty && !g.uniqueItems && g.contains.isEmpty &&
          g.minContains.isEmpty && g.maxContains.isEmpty))
    }

  /** Does `g` (general) provably accept everything `s` (specific) accepts?
    * Conservative — false when unsure. Used to drop covered anyOf branches
    * (`algebra.rs:1770+` covered-branch dropping, lite). */
  def subsumes(general: Spec, specific: Spec): Boolean = (general, specific) match {
    case (Spec.Accept, _) => true
    case (_, Spec.Reject) => true
    // extra conjuncts only restrict: s ⊆ s∖allOf, so g ⊇ s∖allOf ⇒ g ⊇ s
    case (g, s: Spec.Obj) if s.allOf.nonEmpty &&
        subsumes(g, s.copy(allOf = Vector.empty)) => true
    // a pure union covers s when any branch does
    case (g: Spec.Obj, s) if g.anyOf.nonEmpty &&
        only(g)(_.copy(anyOf = Vector.empty)) &&
        g.anyOf.exists(subsumes(_, s)) => true
    // constraints are vacuous outside their type domain (minmax.rs:59-65
    // lifted to whole-schema coverage): when every keyword family g
    // carries applies only to types s can never take, g accepts all of s
    case (g: Spec.Obj, s: Spec.Obj) if vacuousFor(g, possibleTypes(s)) => true
    // a pure value set is covered when every member passes g outright
    // (the interpreter decides each finite witness exactly — g may carry
    // applicators/negations as long as its semantics are Interp-complete)
    case (g: Spec.Obj, s: Spec.Obj) if (s.const.nonEmpty || s.enumVals.nonEmpty) &&
        only(s)(_.copy(const = None, enumVals = None, types = None)) &&
        g.const.isEmpty && g.enumVals.isEmpty && g.format.isEmpty &&
        g.contentEncoding.isEmpty && g.contentMediaType.isEmpty &&
        g.contentSchema.isEmpty && g.others.isEmpty && !containsRefs(g) =>
      try s.const.map(Vector(_)).getOrElse(s.enumVals.get)
        .forall(m => Interp.isValid(g, m))
      catch { case _: Throwable => false }
    // every assertion keyword only narrows, so stripping the SPECIFIC
    // side's applicators/combinators widens it: g ⊇ widened(s) ⇒ g ⊇ s.
    // Covers `ir: a branch constraining a property is dropped by one
    // that does not` (object window vs window+entry).
    case (g: Spec.Obj, s: Spec.Obj) if scalarLeaf(g) && !scalarLeaf(s) &&
        subsumes(g, scalarSkeleton(s)) => true
    case (g: Spec.Obj, s: Spec.Obj) if scalarLeaf(g) && scalarLeaf(s) =>
      // a pure value set carries its members' types implicitly — lets
      // {type:string} subsume {const:"a"} (covered-branch dropping)
      val sTypes = s.types.orElse(
        if (s.const.nonEmpty || s.enumVals.nonEmpty)
          Some(s.const.map(c => Set(c.jsonType))
            .getOrElse(s.enumVals.get.map(_.jsonType).toSet))
        else None)
      val typesOk = g.types.isEmpty ||
        sTypes.exists(st => expand(st).subsetOf(expand(g.types.get)))
      val boundsOk =
        g.minimum.forall(gm => s.minimum.exists(_ >= gm) || s.exclusiveMinimum.exists(_ >= gm)) &&
        g.exclusiveMinimum.forall(gm => s.exclusiveMinimum.exists(_ >= gm) || s.minimum.exists(_ > gm)) &&
        g.maximum.forall(gm => s.maximum.exists(_ <= gm) || s.exclusiveMaximum.exists(_ <= gm)) &&
        g.exclusiveMaximum.forall(gm => s.exclusiveMaximum.exists(_ <= gm) || s.maximum.exists(_ < gm))
      val multOk = g.multipleOf.forall(gm =>
        // same arithmetic kind only (whole vs fractional modulo —
        // shares_arithmetic): a whole divisor may not stand for a
        // fractional one even when the rational division is clean
        s.multipleOf.exists(sm =>
          gm.isWhole == sm.isWhole && (sm remainder gm).signum == 0) ||
        // an integer-only leaf satisfies a divisor every integer divides
        (sTypes.exists(st => st.nonEmpty && st.subsetOf(Set(JsonType.Integer): Set[JsonType])) &&
          vacuousOverIntegers(gm)))
      val strOk =
        g.minLength.forall(gl => s.minLength.exists(_ >= gl)) &&
        g.maxLength.forall(gl => s.maxLength.exists(_ <= gl)) &&
        g.pattern.forall(gp => s.pattern.contains(gp)) &&
        g.format.forall(gf => s.format.contains(gf))
      val sizeOk =
        g.minItems.forall(gi => s.minItems.exists(_ >= gi)) &&
        g.maxItems.forall(gi => s.maxItems.exists(_ <= gi)) &&
        g.minProperties.forall(gi => s.minProperties.exists(_ >= gi)) &&
        g.maxProperties.forall(gi => s.maxProperties.exists(_ <= gi)) &&
        // arrays of <= 1 items are trivially unique
        (!g.uniqueItems || s.uniqueItems || s.maxItems.exists(_ <= 1))
      val reqOk = g.required.forall(s.required.contains)
      // propertyNames compared recursively: g's key-set constraint must
      // cover s's (absent g.propertyNames covers any)
      def stripStr(x: Spec): Spec = x match {
        case xo: Spec.Obj if xo.types.exists(_.subsetOf(Set(JsonType.String): Set[JsonType])) =>
          xo.copy(types = None) // property names are strings regardless
        case other => other
      }
      val pnOk = g.propertyNames.forall(gp =>
        s.propertyNames.exists(sp => sp == gp || stripStr(sp) == stripStr(gp) ||
          subsumes(stripStr(gp), stripStr(sp))))
      val valuesOk = (g.const, g.enumVals) match {
        case (Some(c), _) =>
          s.const.exists(JsonValue.equal(_, c)) ||
            s.enumVals.exists(vs => vs.nonEmpty && vs.forall(JsonValue.equal(_, c)))
        case (None, Some(gvs)) =>
          s.const.exists(sc => gvs.exists(JsonValue.equal(_, sc))) ||
            s.enumVals.exists(svs => svs.forall(sv => gvs.exists(JsonValue.equal(_, sv))))
        case _ => true
      }
      typesOk && boundsOk && multOk && strOk && sizeOk && reqOk && pnOk && valuesOk
    case _ => false
  }

  /** Provable disjointness of two scalar leaves (no instance satisfies
    * both) — `algebra.rs:415-727` oneOf disjointness analysis, lite. */
  def disjoint(a: Spec, b: Spec): Boolean = (a, b) match {
    case (Spec.Reject, _) | (_, Spec.Reject) => true
    // `type` is conjunctive — every other keyword only narrows — so
    // disjoint declared types prove disjointness regardless of the rest
    case (x: Spec.Obj, y: Spec.Obj) if x.types.nonEmpty && y.types.nonEmpty &&
        expand(x.types.get).intersect(expand(y.types.get)).isEmpty => true
    // discriminated unions: both sides REQUIRE a tag key whose declared
    // value sets share no member (algebra.rs tagged-branch disjointness)
    case (x: Spec.Obj, y: Spec.Obj) if {
      def tagVals(o: Spec.Obj, k: String): Option[Vector[JsonValue]] =
        o.properties.collectFirst { case (`k`, p: Spec.Obj) =>
          p.const.map(Vector(_)).orElse(p.enumVals) }.flatten
      x.required.exists(k => y.required.contains(k) &&
        tagVals(x, k).zip(tagVals(y, k)).exists { case (vx, vy) =>
          vx.forall(v => !vy.exists(JsonValue.equal(_, v))) })
    } => true
    // one side requires a pattern the other side's not forbids verbatim
    case (x: Spec.Obj, y: Spec.Obj) if {
      def forbids(n: Spec.Obj, p: String) = n.not.exists {
        case nt: Spec.Obj => nt.pattern.contains(p) && only(nt)(_.copy(pattern = None))
        case _ => false
      }
      x.pattern.exists(forbids(y, _)) || y.pattern.exists(forbids(x, _))
    } => true
    case (x: Spec.Obj, y: Spec.Obj) if scalarLeaf(x) && scalarLeaf(y) =>
      val typeDisjoint = x.types.nonEmpty && y.types.nonEmpty &&
        expand(x.types.get).intersect(expand(y.types.get)).isEmpty
      def numOnly(o: Spec.Obj) =
        o.types.exists(t => t.nonEmpty && t.subsetOf(Set(JsonType.Number, JsonType.Integer)))
      def lo(o: Spec.Obj) = (o.minimum.toSeq ++ o.exclusiveMinimum).reduceOption(_ max _)
      def hi(o: Spec.Obj) = (o.maximum.toSeq ++ o.exclusiveMaximum).reduceOption(_ min _)
      val rangeDisjoint = numOnly(x) && numOnly(y) && (
        lo(x).zip(hi(y)).exists { case (l, h) => l > h ||
          (l == h && (x.exclusiveMinimum.contains(l) || y.exclusiveMaximum.contains(h))) } ||
        lo(y).zip(hi(x)).exists { case (l, h) => l > h ||
          (l == h && (y.exclusiveMinimum.contains(l) || x.exclusiveMaximum.contains(h))) })
      def values(o: Spec.Obj): Option[Vector[JsonValue]] =
        o.const.map(Vector(_)).orElse(o.enumVals)
      val valueDisjoint = values(x).zip(values(y)).exists { case (vx, vy) =>
        vx.forall(v => !vy.exists(JsonValue.equal(_, v)))
      }
      typeDisjoint || rangeDisjoint || valueDisjoint
    case _ => false
  }

  /** oneOf algebra (`algebra.rs` exact-encoding rules, lite):
    *  - dead branches drop; a duplicated branch can never be the "exactly
    *    one", so it moves to the negative side (oneOf[X,X,R] ≡ ¬X ∧ oneOf[R]);
    *  - two `true` branches always both match → unsatisfiable; a single
    *    `true` beside others admits exactly the instances matching NO
    *    other branch (the complement conjunction);
    *  - a singleton oneOf is plain conjunction;
    *  - all-value-set branches take the exact encoding: the values in
    *    exactly ONE branch;
    *  - all-type-only branches XOR at atom granularity (`integer` splits
    *    `number`; a non-whole-numbers piece spells as
    *    `{type:number, not:{multipleOf:1}}`);
    *  - pairwise-disjoint branches drop the counting plan (⇒ anyOf). */
  private def oneOfAlgebra(o0: Spec.Obj): Spec.Obj = {
    if (o0.oneOf.isEmpty) return o0
    var o = o0
    var live = o.oneOf.filter(_ != Spec.Reject)
    if (live.isEmpty) return o.copy(oneOf = Vector(Spec.Reject)) // sentinel
    // local `#/$defs` pointer-chain resolution for the ANALYSES below (the
    // spellings keep the refs; the reference resolves symbolic branches
    // before its disjointness / complement reasoning)
    def chase(s: Spec, hops: Int): Spec = s match {
      case r: Spec.Obj if hops < 8 && only(r)(_.copy(ref = None)) &&
          r.ref.exists(_.startsWith("#/$defs/")) =>
        val name = r.ref.get.stripPrefix("#/$defs/")
          .replace("~1", "/").replace("~0", "~")
        if (name.contains('/')) s
        else o0.defs.get(name).map(chase(_, hops + 1)).getOrElse(s)
      case _ => s
    }
    def typesOnly(s: Spec): Option[Set[String]] = s match {
      case t: Spec.Obj if only(t)(_.copy(types = None)) && t.types.nonEmpty =>
        Some(atomsOf(t.types.get))
      case _ => None
    }
    // duplicated branches join the negative side; when a duplicate
    // RESOLVES to a pure type set and every survivor is a pure type set,
    // the negation is just type subtraction and the concrete encoding
    // survives (reference: repeated symbolic branches take the resolved
    // complement)
    val dupGroups = live.groupBy(identity).collect { case (b, bs) if bs.size >= 2 => b }.toVector
    if (dupGroups.nonEmpty) {
      live = live.filterNot(dupGroups.contains)
      val dupAtoms = dupGroups.map(d => typesOnly(chase(d, 0)))
      if (dupAtoms.forall(_.nonEmpty) && live.nonEmpty && live.forall(b => typesOnly(b).nonEmpty)) {
        val subtract = dupAtoms.flatten.reduce(_ ++ _)
        live = live.map { b =>
          typesFromAtoms(typesOnly(b).get -- subtract) match {
            case Vector() => Spec.Reject
            case Vector(one) => one
            case many => Spec.Obj(anyOf = many)
          }
        }.filter(_ != Spec.Reject)
        if (live.isEmpty) return o.copy(oneOf = Vector(Spec.Reject))
      } else {
        o = o.copy(allOf = o.allOf ++
          dupGroups.map(d => pushNotKeyword(Spec.Obj(not = Some(d)))))
        if (live.isEmpty) // nothing left that could be the exactly-one
          return o.copy(oneOf = Vector(Spec.Reject))
      }
    }
    val nAccept = live.count(_ == Spec.Accept)
    if (nAccept >= 2) return o.copy(oneOf = Vector(Spec.Reject))
    if (nAccept == 1) {
      val others = live.filter(_ != Spec.Accept)
      return o.copy(oneOf = Vector.empty, allOf = o.allOf ++
        others.map(b => pushNotKeyword(Spec.Obj(not = Some(b)))))
    }
    if (live.length == 1) // plain conjunction
      return o.copy(oneOf = Vector.empty, allOf = o.allOf :+ live.head)
    // exact value encoding: the members accepted by exactly one branch
    def valueSet(b: Spec): Option[Vector[JsonValue]] = b match {
      case ob: Spec.Obj if only(ob)(_.copy(const = None, enumVals = None)) =>
        ob.const.map(Vector(_)).orElse(ob.enumVals)
      case _ => None
    }
    val vsets = live.map(valueSet)
    if (vsets.forall(_.nonEmpty)) {
      val sets = vsets.flatten
      val uniq = sets.flatten.foldLeft(Vector.empty[JsonValue])((acc, v) =>
        if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v)
      val once = uniq.filter(v => sets.count(_.exists(JsonValue.equal(_, v))) == 1)
      val rep: Spec = if (once.isEmpty) Spec.Reject else Spec.Obj(enumVals = Some(once))
      return o.copy(oneOf = Vector.empty, allOf = o.allOf :+ rep)
    }
    // exact type encoding: atoms covered by exactly one branch
    def typeOnly(b: Spec): Option[Set[String]] = b match {
      case ob: Spec.Obj if only(ob)(_.copy(types = None)) && ob.types.nonEmpty =>
        Some(atomsOf(ob.types.get))
      case _ => None
    }
    val tsets = live.map(typeOnly)
    if (tsets.forall(_.nonEmpty)) {
      val once = allAtoms.filter(a => tsets.flatten.count(_.contains(a)) == 1)
      val pieces = typesFromAtoms(once)
      val rep: Spec = pieces match {
        case Vector() => Spec.Reject
        case Vector(one) => one
        case many => Spec.Obj(anyOf = many)
      }
      return o.copy(oneOf = Vector.empty, allOf = o.allOf :+ rep)
    }
    // pairwise-disjoint ⇒ anyOf (exactly-one ≡ at-least-one); the test —
    // not the spelling — sees through local `#/$defs` pointer chains
    if (live.length >= 2 && live.combinations(2).forall(p =>
        disjoint(chase(p(0), 0), chase(p(1), 0)))) {
      if (o.anyOf.isEmpty) return o.copy(oneOf = Vector.empty, anyOf = live)
      else return o.copy(oneOf = Vector.empty, allOf = o.allOf :+ Spec.Obj(anyOf = live))
    }
    // covered branch: A ⊆ B ⇒ exactly-one ≡ B ∧ ¬A (a branch overlapping
    // only by vacuity never joins the counting plan — its own exclusive
    // region A∧¬B is empty)
    if (live.length == 2) {
      val a = live(0); val b = live(1)
      def conj(big: Spec, small: Spec): Option[Spec.Obj] =
        pushNot(small).map(ns => o.copy(oneOf = Vector.empty,
          allOf = o.allOf ++ Vector(big, ns)))
      val r =
        if (subsumes(chase(b, 0), chase(a, 0))) conj(b, a)
        else if (subsumes(chase(a, 0), chase(b, 0))) conj(a, b)
        else None
      r.foreach(x => return x)
    }
    // exact encoding via complements: oneOf[B…] = ∨ᵢ (Bᵢ ∧ ∧_{j≠i} ¬Bⱼ)
    // — for annotation-free scalar branches (or partitioned unions of
    // them) whose negations all push to positive spellings
    def xorable(b: Spec): Boolean = b match {
      case ob: Spec.Obj => scalarLeaf(ob) ||
        (ob.anyOf.nonEmpty && only(ob)(_.copy(anyOf = Vector.empty)) &&
          ob.anyOf.forall(xorable))
      case _ => false
    }
    if (live.length >= 2 && live.length <= 3 && live.forall(xorable)) {
      val negs = live.map(pushNot)
      if (negs.forall(_.nonEmpty)) {
        val pieces = live.indices.toVector.map { i =>
          val conj = live(i) +: live.indices.collect {
            case j if j != i => negs(j).get
          }.toVector
          canon(Spec.Obj(allOf = conj), false)
        }
        return o.copy(oneOf = Vector.empty, allOf = o.allOf :+ Spec.Obj(anyOf = pieces))
      }
    }
    o.copy(oneOf = live)
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
    allOf = o.allOf.map {
      // a pure symbolic not (¬uniqueItems / bare ¬pattern / ¬$ref) is
      // already in its emitted form — re-canonicalizing would re-expand
      // the partitioned view inside its own wrapper every pass
      case m: Spec.Obj if m.not.exists(isSymbolicNot) && only(m)(_.copy(not = None)) => m
      case m => canon(m, am)
    },
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
    val live0 = branches.filter(_ != Spec.Reject)
    if (branches.nonEmpty && live0.isEmpty) Vector(Spec.Reject) // all branches dead
    // disjunct true ⇒ no constraint — but dropping successful branches
    // destroys their annotations, so only when no unevaluated* in scope
    else if (live0.contains(Spec.Accept) && !annotationsMatter) Vector.empty
    else if (annotationsMatter) live0
    else {
      // union is associative: splice nested pure-anyOf branches
      // (`algebra.rs` union flattening)
      val flat = live0.flatMap {
        case b: Spec.Obj if b.anyOf.nonEmpty && only(b)(_.copy(anyOf = Vector.empty)) => b.anyOf
        case b => Vector(b)
      }
      // X beside its own complement leaves no value out (`a reference
      // beside its own complement`, references.json) — every instance
      // satisfies X or ¬X
      if (flat.exists {
            case nb: Spec.Obj if nb.not.nonEmpty && only(nb)(_.copy(not = None)) =>
              flat.exists(_ == nb.not.get)
            case _ => false
          })
        return Vector.empty
      val merged = objectWindowUnion(unionMerge(flat))
      val live = merged.filter(_ != Spec.Reject)
      if (merged.nonEmpty && live.isEmpty) Vector(Spec.Reject)
      else if (live.contains(Spec.Accept)) Vector.empty
      else
        // covered-branch dropping (`algebra.rs:1770+`): a branch subsumed by
        // a sibling adds nothing to the union (scalar leaves only — they
        // carry no annotations, so this is safe even near unevaluated*)
        live.zipWithIndex.filter { case (a, i) =>
          !live.zipWithIndex.exists { case (b, j) =>
            j != i && subsumes(b, a) && (!subsumes(a, b) || j < i)
          }
        }.map(_._1)
    }
  }

  /** Disjunction of two subschema positions (union entry). */
  private def disjoinSpecs(x: Spec, y: Spec): Spec = (x, y) match {
    case (Spec.Accept, _) | (_, Spec.Accept) => Spec.Accept
    case (Spec.Reject, v) => v
    case (v, Spec.Reject) => v
    case (xo: Spec.Obj, yo: Spec.Obj) =>
      if (xo == yo) xo
      else canon(Spec.Obj(anyOf = Vector(xo, yo)),
        annotationsMatter = containsUnevaluated(Spec.Obj(anyOf = Vector(xo, yo))))
  }

  /** Pairwise union of plain object-window branches (`ir/object_leaves.rs`
    * union, lite): branches whose only keywords are `type:"object"`,
    * `properties`, `required`, `min`/`maxProperties` merge exactly when
    * they differ in (a) just the size window, with overlapping or
    * integer-adjacent intervals, or (b) one property entry — the entry
    * unions (and the key's required bit survives only if both branches
    * demand it; with equal windows/other-requireds the union is exact). */
  private def objectWindowUnion(branches: Vector[Spec]): Vector[Spec] = {
    def objLeaf(o: Spec.Obj): Boolean =
      o.types.contains(Set(JsonType.Object): Set[JsonType]) &&
        only(o)(_.copy(types = None, properties = Vector.empty,
          required = Vector.empty, minProperties = None, maxProperties = None,
          propertyNames = None))
    def tryUnion(a: Spec.Obj, b: Spec.Obj): Option[Spec.Obj] = {
      val aP = a.properties.toMap; val bP = b.properties.toMap
      val aR = a.required.toSet; val bR = b.required.toSet
      def win(o: Spec.Obj): (Long, Option[Long]) =
        (o.minProperties.getOrElse(0L), o.maxProperties)
      val sameEntries = aP == bP
      if (a.propertyNames != b.propertyNames) None
      else if (sameEntries && aR == bR) {
        // size-window interval union (integers: adjacency joins too)
        val (lo1, hi1) = win(a); val (lo2, hi2) = win(b)
        val (loB, hiA) = if (lo1 <= lo2) (lo2, hi1) else (lo1, hi2)
        val joinable = hiA.forall(h => h == Long.MaxValue || loB <= h + 1)
        if (!joinable) None
        else {
          val lo = math.min(lo1, lo2)
          val hi = (hi1, hi2) match {
            case (Some(x), Some(y)) => Some(math.max(x, y))
            case _ => None
          }
          Some(a.copy(minProperties = if (lo == 0L) None else Some(lo),
            maxProperties = hi))
        }
      } else if (win(a) == win(b)) {
        // one differing entry (absent = Accept); requireds equal away
        // from that key
        val keys = aP.keySet ++ bP.keySet
        val diffE = keys.filter(k => aP.get(k) != bP.get(k))
        val diffR = (aR diff bR) ++ (bR diff aR)
        val k0 = diffE ++ diffR
        if (k0.size != 1) None
        else {
          val k = k0.head
          val entry = disjoinSpecs(aP.getOrElse(k, Spec.Accept), bP.getOrElse(k, Spec.Accept))
          val bothReq = aR(k) && bR(k)
          val props0 = a.properties.filterNot(_._1 == k)
          val props =
            if (entry == Spec.Accept) props0
            else props0 ++ Vector(k -> entry)
          Some(a.copy(properties = props,
            required = if (bothReq) a.required
                       else a.required.filterNot(_ == k)))
        }
      } else None
    }
    // array analog: same `items` (and uniqueItems), joinable length
    // windows — `ir: union windows under the same item schema merge`.
    // (No entry-diff rule for arrays: {items:X}∨{items:Y} ≠ {items:X∨Y}.)
    def arrLeaf(o: Spec.Obj): Boolean =
      o.types.contains(Set(JsonType.Array): Set[JsonType]) &&
        only(o)(_.copy(types = None, items = None, minItems = None,
          maxItems = None, uniqueItems = false, contains = None,
          minContains = None, maxContains = None))
    def tryUnionArr(a: Spec.Obj, b: Spec.Obj): Option[Spec.Obj] = {
      if (a.items != b.items || a.uniqueItems != b.uniqueItems ||
          a.contains != b.contains || a.minContains != b.minContains ||
          a.maxContains != b.maxContains) None
      else {
        val (lo1, hi1) = (a.minItems.getOrElse(0L), a.maxItems)
        val (lo2, hi2) = (b.minItems.getOrElse(0L), b.maxItems)
        val (loB, hiA) = if (lo1 <= lo2) (lo2, hi1) else (lo1, hi2)
        if (!hiA.forall(h => h == Long.MaxValue || loB <= h + 1)) None
        else {
          val lo = math.min(lo1, lo2)
          val hi = (hi1, hi2) match {
            case (Some(x), Some(y)) => Some(math.max(x, y))
            case _ => None
          }
          Some(a.copy(minItems = if (lo == 0L) None else Some(lo), maxItems = hi))
        }
      }
    }
    var bs = branches
    var go = true
    while (go) {
      go = false
      var i = 0
      while (!go && i < bs.length) {
        var j = i + 1
        while (!go && j < bs.length) {
          (bs(i), bs(j)) match {
            case (a: Spec.Obj, b: Spec.Obj) if objLeaf(a) && objLeaf(b) =>
              tryUnion(a, b) match {
                case Some(m) =>
                  bs = bs.patch(j, Nil, 1).updated(i, m)
                  go = true
                case None => ()
              }
            case (a: Spec.Obj, b: Spec.Obj) if arrLeaf(a) && arrLeaf(b) =>
              tryUnionArr(a, b) match {
                case Some(m) =>
                  bs = bs.patch(j, Nil, 1).updated(i, m)
                  go = true
                case None => ()
              }
            case _ => ()
          }
          j += 1
        }
        i += 1
      }
    }
    bs
  }

  /** Union folding across anyOf branches (`algebra.rs` union algebra,
    * lite): value-set branches union their members; full boolean domains
    * widen into the type set; members a type-only sibling already covers
    * drop; type-only branches fold to one type list; overlapping numeric
    * half-lines/intervals of the same type merge. */
  private def unionMerge(branches: Vector[Spec]): Vector[Spec] = {
    def valueMembers(o: Spec.Obj): Option[Vector[JsonValue]] =
      if (only(o)(_.copy(const = None, enumVals = None)))
        o.const.map(Vector(_)).orElse(o.enumVals)
      else None
    def typeOnly(o: Spec.Obj): Option[Set[JsonType]] =
      if (only(o)(_.copy(types = None))) o.types else None
    // numeric branch: types ⊆ {number,integer} with only bounds and an
    // optional shared divisor beside
    final case class NumBranch(ts: Set[JsonType], m: Option[BigDecimal],
                               lo: Option[(BigDecimal, Boolean)], hi: Option[(BigDecimal, Boolean)])
    def numBranch(o: Spec.Obj): Option[NumBranch] =
      if (only(o)(_.copy(types = None, minimum = None, maximum = None,
          exclusiveMinimum = None, exclusiveMaximum = None, multipleOf = None)) &&
          o.types.exists(t => t.nonEmpty && t.subsetOf(Set(JsonType.Number, JsonType.Integer): Set[JsonType])) &&
          (o.minimum.nonEmpty || o.maximum.nonEmpty ||
           o.exclusiveMinimum.nonEmpty || o.exclusiveMaximum.nonEmpty))
        Some(NumBranch(o.types.get, o.multipleOf,
          (o.minimum.map((_, false)).toSeq ++ o.exclusiveMinimum.map((_, true)))
            .reduceOption((a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2)) a else b),
          (o.maximum.map((_, false)).toSeq ++ o.exclusiveMaximum.map((_, true)))
            .reduceOption((a, b) => if (a._1 < b._1 || (a._1 == b._1 && a._2)) a else b)))
      else None

    // string branch: length window with an optional shared pattern
    final case class StrBranch(pattern: Option[String], lo: Option[Long], hi: Option[Long])
    def strBranch(o: Spec.Obj): Option[StrBranch] =
      if (only(o)(_.copy(types = None, minLength = None, maxLength = None, pattern = None)) &&
          o.types.contains(Set(JsonType.String): Set[JsonType]) &&
          (o.minLength.nonEmpty || o.maxLength.nonEmpty))
        Some(StrBranch(o.pattern, o.minLength, o.maxLength))
      else None

    val objs = branches.collect { case o: Spec.Obj => o }
    if (objs.size != branches.size) return branches // non-Obj members: leave as-is

    // a standalone null branch is the value `null` — reference folds it
    // into a sibling value set (finite domain); multi-type branches keep
    // null in the type list
    var nullOnly = 0
    var typeSet: Set[JsonType] = objs.flatMap(typeOnly).collect {
      case ts if ts != (Set(JsonType.Null): Set[JsonType]) => ts
    }.flatten.toSet
    objs.foreach(o => if (typeOnly(o).contains(Set(JsonType.Null): Set[JsonType])) nullOnly += 1)
    var values: Vector[JsonValue] = Vector.empty
    val nums = scala.collection.mutable.Buffer[NumBranch]()
    val strs = scala.collection.mutable.Buffer[StrBranch]()
    val residual = Vector.newBuilder[Spec]
    var sawValueBranch = false; var sawNumBranch = false; var sawStrBranch = false
    var typeBranches = 0
    objs.foreach { o =>
      valueMembers(o) match {
        case Some(vs) => sawValueBranch = true
          values = values ++ vs.filterNot(v => values.exists(JsonValue.equal(_, v)))
        case None => typeOnly(o) match {
          case Some(ts) if ts == (Set(JsonType.Null): Set[JsonType]) => typeBranches += 1
          case Some(_) => typeBranches += 1
          case None => numBranch(o) match {
            case Some(nb) => sawNumBranch = true; nums += nb
            case None => strBranch(o) match {
              case Some(sb) => sawStrBranch = true; strs += sb
              case None => residual += o
            }
          }
        }
      }
    }
    if (!sawValueBranch && !sawNumBranch && !sawStrBranch && typeBranches <= 1)
      return branches // nothing to fold

    if (nullOnly > 0) {
      if (typeSet.isEmpty && values.nonEmpty && !values.contains(JNull))
        values = values :+ JNull
      else typeSet = typeSet + JsonType.Null
    }
    // both booleans present ⇒ the full boolean domain ⇒ type form
    if (values.exists(JsonValue.equal(_, JBool(true))) &&
        values.exists(JsonValue.equal(_, JBool(false)))) {
      typeSet = typeSet + JsonType.Boolean
      values = values.filterNot(_.isInstanceOf[JBool])
    }
    // members a type branch already covers add nothing to the union
    if (typeSet.nonEmpty)
      values = values.filterNot(v => typeOk(typeSet, v))
    // an integer interval absorbs a whole member it admits, and swallows
    // one adjacent to its end (the grid has no value in between)
    values = values.filterNot {
      case JNum(v) if v.isWhole =>
        nums.indices.exists { i =>
          val nb = nums(i)
          val intB = nb.ts == (Set(JsonType.Integer): Set[JsonType]) && nb.m.isEmpty
          if (!intB) false
          else {
            val aboveLo = nb.lo.forall { case (l, lx) => v > l || (v == l && !lx) }
            val belowHi = nb.hi.forall { case (h, hx) => v < h || (v == h && !hx) }
            if (aboveLo && belowHi) true // inside
            else if (nb.lo.exists { case (l, lx) => !lx && exAdd(v, 1) == l } && belowHi) {
              nums(i) = nb.copy(lo = Some((v, false))); true // extend down
            } else if (nb.hi.exists { case (h, hx) => !hx && exAdd(h, 1) == v } && aboveLo) {
              nums(i) = nb.copy(hi = Some((v, false))); true // extend up
            } else false
          }
        }
      case _ => false
    }

    // overlapping (or grid-adjacent, under a shared divisor / the integer
    // grid) numeric intervals of a union merge; a full cover is the bare
    // type (e.g. {max:10} ∪ {min:5} = every number)
    def canFold(a: NumBranch, b: NumBranch): Boolean = {
      val loPair = Seq(a.lo, b.lo).flatten
        .reduceOption((x, y) => if (x._1 > y._1 || (x._1 == y._1 && x._2)) x else y)
      val hiPair = Seq(a.hi, b.hi).flatten
        .reduceOption((x, y) => if (x._1 < y._1 || (x._1 == y._1 && x._2)) x else y)
      (loPair, hiPair) match {
        case (Some((l, lx)), Some((h, hx))) =>
          l < h || (l == h && !lx && !hx) || {
            // after progression snapping the bounds sit on the admitted
            // grid: a gap of at most one step holds no admitted value
            val step = a.m.orElse(
              if (a.ts == (Set(JsonType.Integer): Set[JsonType])) Some(BigDecimal(1)) else None)
            step.exists(st => !lx && !hx && l <= exAdd(h, st))
          }
        case _ => true
      }
    }
    var mergedAny = true
    while (mergedAny && nums.size >= 2) {
      mergedAny = false
      val pairs = for { i <- nums.indices; j <- nums.indices if i < j } yield (i, j)
      pairs.find { case (i, j) =>
        expand(nums(i).ts) == expand(nums(j).ts) && nums(i).m == nums(j).m &&
          canFold(nums(i), nums(j)) && {
          // union interval: keep an end only when BOTH branches bound it
          val a = nums(i); val b = nums(j)
          val lo = for { x <- a.lo; y <- b.lo }
            yield if (x._1 < y._1 || (x._1 == y._1 && !x._2)) x else y
          val hi = for { x <- a.hi; y <- b.hi }
            yield if (x._1 > y._1 || (x._1 == y._1 && !x._2)) x else y
          nums(j) = NumBranch(a.ts, a.m, lo, hi); nums.remove(i); true
        }
      }.foreach(_ => mergedAny = true)
    }
    // overlapping/adjacent string-length windows with the same pattern
    // merge; a full cover keeps just type (+ pattern)
    var strMerged = true
    while (strMerged && strs.size >= 2) {
      strMerged = false
      val pairs = for { i <- strs.indices; j <- strs.indices if i < j } yield (i, j)
      pairs.find { case (i, j) =>
        strs(i).pattern == strs(j).pattern && {
          val a = strs(i); val b = strs(j)
          val l = Seq(a.lo, b.lo).flatten.maxOption
          val h = Seq(a.hi, b.hi).flatten.minOption
          val foldable = (l, h) match {
            case (Some(lv), Some(hv)) => lv <= hv + 1 // lengths are integers
            case _ => true
          }
          foldable && {
            val lo = for { x <- a.lo; y <- b.lo } yield x.min(y)
            val hi = for { x <- a.hi; y <- b.hi } yield x.max(y)
            strs(j) = StrBranch(a.pattern, lo, hi); strs.remove(i); true
          }
        }
      }.foreach(_ => strMerged = true)
    }
    val strOut: Vector[Spec] = strs.toVector.flatMap { sb =>
      if (sb.lo.forall(_ <= 0L) && sb.hi.isEmpty) {
        if (sb.pattern.isEmpty) { typeSet = typeSet + JsonType.String; Vector.empty }
        else Vector(Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]),
          pattern = sb.pattern))
      }
      else Vector(Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType]),
        pattern = sb.pattern,
        minLength = sb.lo.filter(_ > 0L), maxLength = sb.hi))
    }
    val numOut: Vector[Spec] = nums.toVector.flatMap { nb =>
      if (nb.lo.isEmpty && nb.hi.isEmpty && nb.m.isEmpty) {
        typeSet = typeSet ++ nb.ts; Vector.empty
      }
      else Vector(Spec.Obj(types = Some(nb.ts), multipleOf = nb.m,
        minimum = nb.lo.collect { case (v, false) => v },
        exclusiveMinimum = nb.lo.collect { case (v, true) => v },
        maximum = nb.hi.collect { case (v, false) => v },
        exclusiveMaximum = nb.hi.collect { case (v, true) => v }))
    }
    val typeOut: Vector[Spec] =
      if (typeSet.isEmpty) Vector.empty
      else Vector(Spec.Obj(types = Some(
        if (typeSet.contains(JsonType.Number)) typeSet - JsonType.Integer else typeSet)))
    val valueOut: Vector[Spec] = values match {
      case Vector() => Vector.empty
      // past the i64 projection the member keeps its `enum` spelling
      case Vector(single) if (single match {
        case n: JNum => n.value.abs < I64Max
        case _ => true
      }) => Vector(Spec.Obj(const = Some(single)))
      case Vector(single) => Vector(Spec.Obj(enumVals = Some(Vector(single))))
      case many => Vector(Spec.Obj(enumVals = Some(many)))
    }
    typeOut ++ valueOut ++ numOut ++ strOut ++ residual.result()
  }

  /** Conjunct distribution through a union (`algebra.rs` conjunct rules):
    * R ∧ (B₁ ∨ B₂) = (R∧B₁) ∨ (R∧B₂) when the residue R is a scalar leaf
    * — branches that die erase themselves and a sole survivor replaces
    * the whole disjunction. Also unwraps a singleton anyOf. */
  private def anyOfAlgebra(o0: Spec.Obj, annotationsMatter: Boolean): Spec = {
    // a value set beside the union kills branches no member could satisfy
    // (the members are the only candidate instances): a branch pinned to
    // types disjoint from every member's type drops; a sole survivor is
    // plain conjunction and merges into the parent when it can
    val o: Spec.Obj = o0.const.map(Vector(_)).orElse(o0.enumVals) match {
      case Some(ms) if o0.anyOf.nonEmpty && ms.nonEmpty =>
        val mts = expand(ms.map(_.jsonType).toSet)
        val pruned = o0.anyOf.filter {
          case b: Spec.Obj if b.types.nonEmpty &&
              expand(b.types.get).intersect(mts).isEmpty => false
          case _ => true
        }
        if (pruned.isEmpty) return Spec.Reject
        (pruned match {
          case Vector(b: Spec.Obj) if pruned.length < o0.anyOf.length =>
            mergeInto(o0.copy(anyOf = Vector.empty), b)
          case _ => None
        }).getOrElse(o0.copy(anyOf = pruned))
      case _ => o0
    }
    // unmergeable conjuncts ride along into each distributed branch:
    // (R ∧ M₁ ∧ … ∧ (B₁ ∨ B₂)) = ((R∧M…∧B₁) ∨ (R∧M…∧B₂))
    // root $defs stay on the outer schema — they are referenced FROM the
    // branches and are not a constraint to distribute
    val residueScalar = o.copy(anyOf = Vector.empty, allOf = Vector.empty,
      defs = Map.empty)
    val conjuncts = o.allOf
    // a residue carrying a `not` over a scalar-leaf target still
    // distributes — (R ∧ ¬X) ∧ (B₁ ∨ B₂) spreads like any conjunction
    // (the divisor-partition and key-constraint conjunctions need this)
    def residueOk(r: Spec.Obj): Boolean = {
      val sansNot = r.copy(not = None)
      scalarLeaf(sansNot) && sansNot.const.isEmpty && sansNot.enumVals.isEmpty &&
      r.not.forall { case t: Spec.Obj => scalarLeaf(t); case _ => false }
    }
    val distributable = o.anyOf.nonEmpty && o.anyOf.size <= 8 &&
      (residueScalar != Spec.empty || conjuncts.nonEmpty) &&
      conjuncts.length <= 4 &&
      (residueScalar == Spec.empty || residueOk(residueScalar)) &&
      o.anyOf.forall(_.isInstanceOf[Spec.Obj])
    val out =
      if (distributable) {
        val base = (if (residueScalar == Spec.empty) Vector.empty[Spec]
                    else Vector[Spec](residueScalar)) ++ conjuncts
        val dist = o.anyOf.map(b => canon(Spec.Obj(allOf = base :+ b), annotationsMatter))
        Spec.Obj(anyOf = simplifyAnyOf(dist, annotationsMatter), defs = o.defs)
      } else if (o.anyOf.nonEmpty)
        o.copy(anyOf = simplifyAnyOf(o.anyOf, annotationsMatter))
      else o
    out match {
      case res: Spec.Obj if res.anyOf == Vector(Spec.Reject) => Spec.Reject
      case res: Spec.Obj if res.anyOf.size == 1 && only(res)(_.copy(anyOf = Vector.empty)) =>
        res.anyOf.head
      case res => res
    }
  }

  /** Fold mergeable allOf members into the parent (constraint
    * intersection, `{allOf:[{min:0},{max:10}]}` → `{min:0,max:10}`). A
    * member stays in allOf if any of its keywords can't merge safely. */
  /** ¬uniqueItems and the bare ¬pattern are kept SYMBOLIC (allOf-wrapped
    * pure not) in the reference's emitted view — exclude them from
    * not-slot hoisting and target-stripping so the spelling survives the
    * fixpoint. */
  private def isSymbolicNot(t: Spec): Boolean = t match {
    case to: Spec.Obj => to.uniqueItems ||
      (to.pattern.nonEmpty && only(to)(_.copy(pattern = None))) ||
      to.ref.nonEmpty
    case _ => false
  }

  /** The symbolic ¬uniqueItems target ({type:array, uniqueItems:true},
    * possibly untyped): a repeat exists. */
  private def isUniqueNot(t: Spec): Boolean = t match {
    case to: Spec.Obj => to.uniqueItems && only(to)(_.copy(uniqueItems = false, types = None))
    case _ => false
  }
  /** A pure `{not:X}` member, optionally beside a type pin. */
  private def pureNot(m: Spec): Option[Spec] = m match {
    case mo: Spec.Obj if mo.not.nonEmpty && only(mo)(_.copy(not = None, types = None)) =>
      mo.not
    case _ => None
  }
  /** A bare whole-definition `$ref` member, or a pure not over one —
    * conjuncts the reference's emission leaves partitioned (unmerged). */
  private def opaqueMember(m: Spec): Boolean = m match {
    case mo: Spec.Obj =>
      (mo.ref.nonEmpty && only(mo)(_.copy(ref = None))) ||
      (mo.not.nonEmpty && only(mo)(_.copy(not = None)) &&
        mo.not.exists { case t: Spec.Obj => t.ref.nonEmpty; case _ => false })
    case _ => false
  }

  private def foldAllOf(o: Spec.Obj): Spec.Obj = {
    // reference emission view: a pure conjunction carrying a bare $ref (or
    // a negated one) keeps its members partitioned — the resolved view
    // lives in the analyses, not the spelling (`emit.rs` symbolic forms)
    if (o.allOf.length >= 2 && o.allOf.exists(opaqueMember) &&
        !o.allOf.contains(Spec.Reject) &&
        only(o)(_.copy(allOf = Vector.empty, defs = Map.empty)) &&
        // wrapper members still splice/hoist first (distribution through a
        // disjunction conjunct beats freezing the spelling)
        !o.allOf.exists {
          case m: Spec.Obj => (m.anyOf.nonEmpty && only(m)(_.copy(anyOf = Vector.empty))) ||
            (m.allOf.nonEmpty && only(m)(_.copy(allOf = Vector.empty)))
          case _ => false
        })
      return o.copy(allOf = o.allOf.filter(_ != Spec.Accept))
    var acc = o.copy(allOf = Vector.empty)
    val keep = Vector.newBuilder[Spec]
    def visit(m: Spec): Unit = m match {
      case Spec.Accept => ()
      case Spec.Reject => keep += Spec.Reject
      case sub: Spec.Obj if sub.allOf.nonEmpty && only(sub)(_.copy(allOf = Vector.empty)) =>
        sub.allOf.foreach(visit) // splice pure nested allOf (conjunction is flat)
      case sub: Spec.Obj if sub.anyOf.nonEmpty && acc.anyOf.isEmpty &&
          only(sub)(_.copy(anyOf = Vector.empty)) =>
        // a pure-disjunction member hoists into the parent's empty anyOf
        // slot, where anyOfAlgebra can distribute the residue through it
        acc = acc.copy(anyOf = sub.anyOf)
      case sub: Spec.Obj if sub.not.exists(isUniqueNot) &&
          only(sub)(_.copy(not = None, types = None)) &&
          (sub.types.isEmpty || acc.types.exists(at =>
            expand(at).subsetOf(expand(sub.types.get)))) =>
        // symbolic ¬uniqueItems: a repeat demands at least two items (the
        // reference's implied floor); the not itself stays a member
        acc = acc.copy(minItems = Some(acc.minItems.fold(2L)(_ max 2L)))
        keep += Spec.Obj(not = sub.not)
      case sub: Spec.Obj if sub.not.nonEmpty && acc.not.isEmpty &&
          !sub.not.exists(isSymbolicNot) &&
          only(sub)(_.copy(not = None, types = None)) &&
          (sub.types.isEmpty || acc.types.exists(at =>
            expand(at).subsetOf(expand(sub.types.get)))) =>
        // {types T, not X} beside a parent already pinned inside T: the
        // wrapper adds nothing — the not hoists into the parent slot
        acc = acc.copy(not = sub.not)
      case sub: Spec.Obj if sub.types.nonEmpty && acc.types.nonEmpty &&
          intersectTypes(sub.types.get, acc.types.get).isEmpty =>
        // a conjunct pinned to types the parent excludes admits nothing
        keep += Spec.Reject
      case sub: Spec.Obj =>
        mergeInto(acc, sub) match {
          case Some(m2) => acc = m2
          case None =>
            // Divisor-only conflict (the pair's exact LCM has no f64-exact
            // spelling): the member's other keywords still hoist into the
            // parent; its divisor stays behind as a bare conjunct for the
            // divisor-set fold below (divisors.rs keeps unfoldable pairs
            // partitioned).
            val hoisted = for {
              da <- acc.multipleOf if da.signum > 0
              db <- sub.multipleOf if db.signum > 0
              if lcmRational(da, db).isEmpty
              rest <- mergeInto(acc, sub.copy(multipleOf = None))
            } yield (rest, db)
            hoisted match {
              case Some((rest, db)) =>
                acc = rest
                keep += Spec.Obj(multipleOf = Some(db))
              case None => keep += sub
            }
        }
      case other => keep += other
    }
    o.allOf.foreach(visit)
    var kept = keep.result().distinct
    // Divisor-set fold (`divisors.rs fold`): the parent's divisor and the
    // bare-divisor members form one set — pairs whose exact LCM has an
    // f64-exact spelling fold to it, then a divisor carrying factors
    // another already supplies sheds them (9e307 beside 8e307 ⇒ 9). One
    // survivor rides the parent; several each render as their own
    // conjunct (the reference's partitioned divisor view).
    if (acc.multipleOf.exists(_.signum > 0)) {
      def pureDiv(m: Spec): Option[BigDecimal] = m match {
        case mo: Spec.Obj if mo.multipleOf.exists(_.signum > 0) &&
            only(mo)(_.copy(multipleOf = None)) => mo.multipleOf
        case _ => None
      }
      if (kept.exists(m => pureDiv(m).nonEmpty)) {
        val divs = foldDivisorSet(acc.multipleOf.get +: kept.flatMap(m => pureDiv(m).toVector))
        kept = kept.filter(m => pureDiv(m).isEmpty)
        if (divs.length == 1) acc = acc.copy(multipleOf = Some(divs.head))
        else {
          acc = acc.copy(multipleOf = None)
          kept = kept ++ divs.map(d => Spec.Obj(multipleOf = Some(d)))
        }
      }
    }
    // value shields meeting on no value close the map over the declared
    // keys (the reference's closed-object view): X ∧ Y where both carry
    // additionalProperties whose meet admits nothing ⇒ only X's declared
    // keys can appear, each under the meet of its per-key coverage and
    // the other shield; the key set spells as a propertyNames value set.
    // Sound only with the instance pinned to objects.
    if (acc.types.exists(t => t.nonEmpty && t.subsetOf(Set(JsonType.Object): Set[JsonType]))) {
      def closeMap(mapProps: Vector[(String, Spec)], mapPn: Option[Spec],
                   mapReq: Vector[String], otherShield: Spec): Option[
          (Vector[(String, Spec)], Spec, Vector[String])] = {
        val met = mapProps.map { case (k, v) =>
          k -> canon(Spec.Obj(allOf = Vector(v, otherShield)), false) }
        val alive = met.filter(_._2 != Spec.Reject)
        val reqd = (acc.required ++ mapReq).distinct
        if (reqd.exists(k => !alive.exists(_._1 == k))) return Some((Vector.empty, Spec.Reject, reqd))
        val keyEnum: Spec =
          if (alive.isEmpty) Spec.Reject
          else Spec.Obj(enumVals = Some(alive.map(e => JStr(e._1): JsonValue)))
        val pn = mapPn match {
          case Some(p) => canon(Spec.Obj(allOf = Vector(p, keyEnum)), false)
          case None => canon(keyEnum, false)
        }
        Some((alive, pn, reqd))
      }
      def shieldsClash(x: Spec, y: Spec): Boolean =
        canon(Spec.Obj(allOf = Vector(x, y)), false) == Spec.Reject
      val accShieldOnly = acc.additionalProperties.nonEmpty && acc.properties.isEmpty &&
        acc.patternProperties.isEmpty && acc.propertyNames.isEmpty
      val accMapSide = acc.additionalProperties.nonEmpty && acc.properties.nonEmpty &&
        acc.patternProperties.isEmpty
      def objCovered(x: Spec.Obj): Boolean = x.types.isEmpty ||
        acc.types.exists(at => expand(at).subsetOf(expand(x.types.get)))
      val idx = kept.indexWhere {
        case mo: Spec.Obj if accShieldOnly =>
          mo.additionalProperties.nonEmpty && mo.properties.nonEmpty &&
          mo.patternProperties.isEmpty && objCovered(mo) &&
          only(mo)(_.copy(additionalProperties = None, properties = Vector.empty,
            propertyNames = None, types = None, minProperties = None,
            maxProperties = None, required = Vector.empty))
        case so: Spec.Obj if accMapSide =>
          so.additionalProperties.nonEmpty && so.properties.isEmpty &&
          so.patternProperties.isEmpty && so.propertyNames.isEmpty &&
          objCovered(so) &&
          only(so)(_.copy(additionalProperties = None, types = None))
        case _ => false
      }
      if (idx >= 0) {
        val mo = kept(idx).asInstanceOf[Spec.Obj]
        if (shieldsClash(acc.additionalProperties.get, mo.additionalProperties.get)) {
          val closed =
            if (accShieldOnly)
              closeMap(mo.properties, mo.propertyNames, mo.required,
                acc.additionalProperties.get).map { case (ps, pn, rq) =>
                acc.copy(additionalProperties = None, properties = ps,
                  propertyNames = Some(pn), required = rq,
                  minProperties = maxOfL(acc.minProperties, mo.minProperties),
                  maxProperties = minOfL(acc.maxProperties, mo.maxProperties))
              }
            else
              closeMap(acc.properties, acc.propertyNames, acc.required,
                mo.additionalProperties.get).map { case (ps, pn, rq) =>
                acc.copy(additionalProperties = None, properties = ps,
                  propertyNames = Some(pn), required = rq)
              }
          closed.foreach { c =>
            if (c.propertyNames.contains(Spec.Reject) && c.required.nonEmpty)
              return acc.copy(allOf = Vector(Spec.Reject))
            acc = c
            kept = kept.patch(idx, Nil, 1)
          }
        }
      }
    }
    // distinctness ∧ a repeat demand shares no array (sound only with the
    // instance pinned to arrays — elsewhere the negated conjunct passes)
    if (acc.uniqueItems && acc.types.exists(t => t.nonEmpty &&
        t.subsetOf(Set(JsonType.Array): Set[JsonType])) &&
        kept.exists(m => pureNot(m).exists(isUniqueNot)))
      return acc.copy(allOf = Vector(Spec.Reject))
    // negated-divisor subsumption: a | b ⇒ ¬multipleOf(a) implies
    // ¬multipleOf(b) — the covered negation drops (negate.rs divisor pair)
    def notDiv(t: Spec): Option[BigDecimal] = t match {
      case to: Spec.Obj if to.multipleOf.exists(_.signum > 0) &&
          only(to)(_.copy(multipleOf = None)) => to.multipleOf
      case _ => None
    }
    // a member's OWN type pin must cover the parent's before the member
    // can be dropped as implied (dropping would also drop the pin)
    def typeCovered(m: Spec): Boolean = m match {
      case mo: Spec.Obj => mo.types.isEmpty || acc.types.exists(at =>
        expand(at).subsetOf(expand(mo.types.get)))
      case _ => true
    }
    val negDivs = (acc.not.flatMap(notDiv).map(("acc", _, true)).toVector) ++
      kept.zipWithIndex.flatMap { case (m, i) =>
        pureNot(m).flatMap(notDiv).map((s"k$i", _, typeCovered(m))) }
    if (negDivs.length >= 2) {
      val covered = negDivs.filter { case (tag, b, droppable) =>
        droppable && negDivs.exists { case (t2, a, _) => t2 != tag &&
          (b / a).isWhole && (a < b || (a == b && t2 < tag)) }
      }.map(_._1).toSet
      if (covered.nonEmpty) {
        if (covered("acc")) acc = acc.copy(not = None)
        kept = kept.zipWithIndex.filterNot { case (m, i) => covered(s"k$i") }.map(_._1)
      }
    }
    // a top-level ¬multipleOf(m) barring every whole beside a conjunct
    // pinned to integers: nothing satisfies both
    if (acc.not.exists {
      case t: Spec.Obj => t.multipleOf.exists(m => m.signum > 0 &&
          vacuousOverIntegers(m)) && only(t)(_.copy(multipleOf = None))
      case _ => false
    } && kept.exists {
      case m: Spec.Obj => m.types.exists(ts => ts.nonEmpty &&
        ts.subsetOf(Set(JsonType.Integer): Set[JsonType]))
      case _ => false
    }) return acc.copy(allOf = Vector(Spec.Reject))
    // TWO negated key-set constraints on one object render as a
    // conjunction of bare nots (the reference demotes the hoisted one)
    def pnNot(t: Spec): Boolean = t match {
      case to: Spec.Obj => to.propertyNames.nonEmpty && only(to)(_.copy(propertyNames = None))
      case _ => false
    }
    if (acc.not.exists(pnNot) && kept.exists(m => pureNot(m).exists(pnNot))) {
      val objPinned = acc.types.exists(t => t.nonEmpty &&
        t.subsetOf(Set(JsonType.Object): Set[JsonType]))
      if (objPinned) {
        kept = Spec.Obj(not = acc.not) +: kept.map { m =>
          (m, pureNot(m)) match {
            // the member's own type pin is redundant under the parent's
            case (mo: Spec.Obj, Some(n)) if pnNot(n) && (mo.types.isEmpty ||
                acc.types.exists(at => expand(at).subsetOf(expand(mo.types.get)))) =>
              Spec.Obj(not = Some(n))
            case _ => m
          }
        }
        acc = acc.copy(not = None)
      }
    }
    acc.copy(allOf = kept)
  }

  /** Conjunction-merge `b` into `a`; None if any keyword of `b` conflicts
    * structurally (then b stays as an allOf member). */
  /** Conjunction of two subschema positions: the value must satisfy both.
    * Non-trivial pairs become an allOf the enclosing canon fixpoint then
    * splices/merges. */
  private def conjoinSpecs(x: Spec, y: Spec): Spec = (x, y) match {
    case (Spec.Accept, v) => v
    case (v, Spec.Accept) => v
    case (Spec.Reject, _) => Spec.Reject
    case (_, Spec.Reject) => Spec.Reject
    case (xo: Spec.Obj, yo: Spec.Obj) =>
      if (xo == yo) xo
      else {
        // canonicalize the conjunction in place (shares the enclosing
        // work budget); annotation scoping decided from the pair itself
        val merged = Spec.Obj(allOf = Vector(xo, yo))
        canon(merged, annotationsMatter = containsUnevaluated(merged))
      }
  }

  private def mergeInto(a: Spec.Obj, b: Spec.Obj): Option[Spec.Obj] = {
    // only scalar-constraint keywords + required merge; applicators and
    // combinators don't (they'd need semantic intersection)
    // DISJOINT property maps conjoin by concatenation — but only when
    // neither side carries additionalProperties/unevaluated*, whose
    // coverage is defined BY the property key set (hoisting a member's
    // keys into the parent would shrink what the parent's shield sees)
    // keys present on BOTH sides intersect per-key (the entry becomes
    // allOf[X,Y], canonicalized by the enclosing fixpoint — `ir: allOf
    // intersects the schema of a shared key`); that changes no key-set
    // coverage, so shields on `a` don't block it. NEW keys join only
    // under the original no-shield guard (they would shrink what `a`'s
    // additionalProperties sees).
    val newPropKeys = b.properties.filter { case (k, _) => !a.properties.exists(_._1 == k) }
    val propsMergeable = b.properties.nonEmpty &&
      a.unevaluatedProperties.isEmpty && b.unevaluatedProperties.isEmpty &&
      (newPropKeys.isEmpty ||
        (a.additionalProperties.isEmpty && b.additionalProperties.isEmpty &&
         a.patternProperties.isEmpty && b.patternProperties.isEmpty))
    // a bare value shield (no declared keys on either side beyond `a`'s
    // pattern targets that EQUAL the shield) conjoins by equality: b
    // covers every key with X; a covers every key with X through its own
    // coverage map — the merge is exactly a
    val apMergeable = b.additionalProperties.nonEmpty &&
      b.properties.isEmpty && b.propertyNames.isEmpty &&
      a.properties.isEmpty && a.unevaluatedProperties.isEmpty &&
      (((a.additionalProperties == b.additionalProperties ||
         a.additionalProperties.isEmpty && a.patternProperties.isEmpty) &&
        a.patternProperties.forall(_._2 == b.additionalProperties.get) &&
        b.patternProperties.forall(_._2 == b.additionalProperties.get)) ||
       (a.additionalProperties.isEmpty && a.patternProperties.isEmpty &&
        b.patternProperties.isEmpty))
    val bHasUnmergeable =
      (b.properties.nonEmpty && !propsMergeable) ||
      (b.patternProperties.nonEmpty && !apMergeable) ||
      (b.additionalProperties.nonEmpty && !apMergeable) ||
      // propertyNames and not are plain conjunct constraints: they hoist
      // into an EMPTY parent slot (two of a kind would need semantic
      // intersection — those stay as allOf members)
      // (two propertyNames conjoin per-key below)
      b.dependentRequired.nonEmpty || b.dependentSchemas.nonEmpty ||
      // items/prefixItems/contains hoist into EMPTY parent slots (allOf
      // membership vs parent position is annotation-equivalent; two of a
      // kind would need semantic intersection). items and prefixItems are
      // positional partners: a prefix on either side pins the other's
      // items to the tail, so any cross-pairing blocks the hoist; a
      // hoisted contains must not activate inert min/maxContains on the
      // parent
      // two `items` conjoin per-element (no positional offset when neither
      // side carries a prefix); a prefix on either side still blocks
      (b.items.nonEmpty && a.prefixItems.nonEmpty) ||
      (b.prefixItems.nonEmpty && (a.items.nonEmpty || a.prefixItems.nonEmpty)) ||
      // an EQUAL contains schema merges its count window (min=max of
      // floors, max=min of ceilings); different bodies stay as conjuncts
      (b.contains.nonEmpty && a.contains != b.contains &&
        (a.contains.nonEmpty ||
         a.minContains.nonEmpty || a.maxContains.nonEmpty)) ||
      b.allOf.nonEmpty || b.anyOf.nonEmpty || b.oneOf.nonEmpty ||
      (b.not.nonEmpty && a.not.nonEmpty && a.not != b.not) || b.not.exists(isSymbolicNot) ||
      b.ifSpec.nonEmpty || b.ref.nonEmpty ||
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
      (b.contains.isEmpty &&
        (b.minContains.nonEmpty || b.maxContains.nonEmpty) && a.contains.nonEmpty) ||
      // differing patterns/formats: keep both as conjuncts
      b.pattern.nonEmpty && a.pattern.nonEmpty && a.pattern != b.pattern ||
      b.format.nonEmpty && a.format.nonEmpty && a.format != b.format
    // two multipleOf merge to their exact rational LCM (`divisors.rs`
    // lite): x%a==0 ∧ x%b==0 ⟺ x%lcm(a,b)==0; both operands come from
    // decimal literals, so the LCM has a terminating decimal form
    val multipleMerged: Option[Option[BigDecimal]] = (a.multipleOf, b.multipleOf) match {
      case (Some(x), Some(y)) => lcmRational(x, y).map(Some(_))
      case (x, y) => Some(x.orElse(y))
    }
    // value sets intersect (`ir/*_leaves.rs` lite): const∧const,
    // const∧enum and enum∧enum meet as sets; an empty meet is recorded as
    // an empty enum, which isContradictory rejects
    def members(o: Spec.Obj): Option[Vector[JsonValue]] =
      o.const.map(Vector(_)).orElse(o.enumVals)
    val valuesMerged: (Option[JsonValue], Option[Vector[JsonValue]]) =
      (members(a), members(b)) match {
        case (Some(x), Some(y)) =>
          val inter = x.filter(v => y.exists(JsonValue.equal(_, v)))
          inter match {
            case Vector(one) if a.const.nonEmpty || b.const.nonEmpty => (Some(one), None)
            case vs => (None, Some(vs))
          }
        case (Some(_), None) => (a.const, a.enumVals)
        case (None, Some(_)) => (b.const, b.enumVals)
        case (None, None) => (None, None)
      }
    if (bHasUnmergeable || multipleMerged.isEmpty) None
    else Some(a.copy(
      types = (a.types, b.types) match {
        case (Some(x), Some(y)) => Some(intersectTypes(x, y))
        case (x, y) => x.orElse(y)
      },
      const = valuesMerged._1,
      enumVals = valuesMerged._2,
      minimum = maxOf(a.minimum, b.minimum),
      maximum = minOf(a.maximum, b.maximum),
      exclusiveMinimum = maxOf(a.exclusiveMinimum, b.exclusiveMinimum),
      exclusiveMaximum = minOf(a.exclusiveMaximum, b.exclusiveMaximum),
      multipleOf = multipleMerged.get,
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
      properties =
        if (!propsMergeable) a.properties
        else a.properties.map { case (k, av) =>
          b.properties.find(_._1 == k) match {
            case Some((_, bv)) if bv != av => k -> conjoinSpecs(av, bv)
            case _ => k -> av
          }
        } ++ newPropKeys,
      patternProperties = a.patternProperties ++
        (if (apMergeable) b.patternProperties else Vector.empty),
      additionalProperties = a.additionalProperties.orElse(b.additionalProperties),
      propertyNames = (a.propertyNames, b.propertyNames) match {
        case (Some(x), Some(y)) => Some(conjoinSpecs(x, y))
        case (x, y) => x.orElse(y)
      },
      not = a.not.orElse(b.not),
      items = (a.items, b.items) match {
        case (Some(x), Some(y)) => Some(conjoinSpecs(x, y))
        case (x, y) => x.orElse(y)
      },
      prefixItems = if (a.prefixItems.nonEmpty) a.prefixItems else b.prefixItems,
      contains = a.contains.orElse(b.contains),
      minContains = maxOfL(a.minContains, b.minContains),
      maxContains = minOfL(a.maxContains, b.maxContains),
    ))
  }

  /** Fold a divisor set to fixpoint (`divisors.rs fold:200-222`): take the
    * first foldable pair (exact LCM with an f64-exact spelling) and
    * replace it with the LCM; otherwise strip the first divisor carrying
    * factors another already supplies; re-sort/dedup and repeat. Folding
    * drops a divisor and stripping shrinks one, so it terminates. */
  private def foldDivisorSet(divs0: Vector[BigDecimal]): Vector[BigDecimal] = {
    var divs = divs0.distinct.sorted
    var go = true
    while (go && divs.length > 1) {
      go = false
      val folded = (for {
        i <- divs.indices.iterator
        j <- (i + 1 until divs.length).iterator
        l <- lcmRational(divs(i), divs(j)).iterator
      } yield (i, j, l)).nextOption()
      folded match {
        case Some((i, j, l)) =>
          divs = divs.updated(i, l).patch(j, Nil, 1).distinct.sorted
          go = true
        case None =>
          val stripped = (for {
            i <- divs.indices.iterator
            j <- divs.indices.iterator if j != i
            s <- withoutFactorsOf(divs(i), divs(j)).iterator
          } yield (i, s)).nextOption()
          stripped.foreach { case (i, s) =>
            divs = divs.updated(i, s).distinct.sorted
            go = true
          }
      }
    }
    divs
  }

  /** `mine` with the factors `theirs` already supplies removed: the largest
    * divisor of `mine` built only from primes `theirs` has (iterated gcd)
    * may go, but only when `theirs` carries it whole — else the pair would
    * admit more (6 beside 2^52 ⇒ 3; 4 beside 6 ⇒ None). Whole divisors
    * only; the stripped spelling must stay f64-exact
    * (`bound_rational.rs:139-156`). */
  private def withoutFactorsOf(mine: BigDecimal, theirs: BigDecimal): Option[BigDecimal] = {
    if (!mine.isWhole || !theirs.isWhole) return None
    val t = theirs.toBigInt
    var shared = BigInt(1)
    var rest = mine.toBigInt
    var common = rest.gcd(t)
    while (common != BigInt(1)) { shared *= common; rest /= common; common = rest.gcd(t) }
    if (shared == BigInt(1) || t % shared != BigInt(0)) None
    else Some(BigDecimal(rest)).filter(s => s > 1 && f64Exact(s))
  }

  /** Exact LCM of two positive decimal rationals: reduce to fractions
    * p/q (q a power of 10 over the gcd, so only 2s and 5s remain),
    * lcm = lcm(p1,p2)/gcd(q1,q2) — terminating decimal by construction.
    * None for non-positive inputs (schema-invalid multipleOf: no merge). */
  private def lcmRational(a: BigDecimal, b: BigDecimal): Option[BigDecimal] = {
    if (a.signum <= 0 || b.signum <= 0) return None
    def frac(x: BigDecimal): (BigInt, BigInt) = {
      val bd = x.bigDecimal.stripTrailingZeros
      if (bd.scale <= 0) (BigInt(bd.unscaledValue) * BigInt(10).pow(-bd.scale), BigInt(1))
      else {
        val p = BigInt(bd.unscaledValue); val q = BigInt(10).pow(bd.scale)
        val g = p.gcd(q); (p / g, q / g)
      }
    }
    val (p1, q1) = frac(a); val (p2, q2) = frac(b)
    val lcmP = p1 / p1.gcd(p2) * p2
    val gcdQ = q1.gcd(q2)
    try {
      val lcm = BigDecimal(new java.math.BigDecimal(lcmP.bigInteger)
        .divide(new java.math.BigDecimal(gcdQ.bigInteger)))
      // a combined divisor f64 cannot hold exactly is not the divisor the
      // validator would read — keep the pair as separate conjuncts
      // (`checked_lcm`, bound_rational.rs:91-105)
      if (f64Exact(lcm)) Some(lcm) else None
    }
    catch { case _: ArithmeticException => None }
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
    val intOnly = only(Set(JsonType.Integer))
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
    (numOnly && numericGapEmpty(o, intOnly)) ||
    (strOnly && o.minLength.zip(o.maxLength).exists { case (l, h) => l > h }) ||
    (arrOnly && (
      o.minItems.zip(o.maxItems).exists { case (l, h) => l > h } ||
      o.maxContains.zip(Some(o.minContains.getOrElse(1L)))
        .exists { case (h, l) => o.contains.nonEmpty && l > h })) ||
    // a contains floor no array can fit: more demanded matches than
    // allowed elements (`ir: minContains above maxItems rejects every
    // array`), a reject-all contains body, or fewer positions whose
    // schemas can meet the demand than the floor (items/prefix
    // disjointness — `ir: a contains demand no element position can meet`)
    (arrOnly && o.contains.nonEmpty && o.minContains.getOrElse(1L) >= 1L && {
      val need = o.minContains.getOrElse(1L)
      o.maxItems.exists(_ < need) ||
      o.contains.contains(Spec.Reject) ||
      (o.items.exists(it => disjoint(it, o.contains.get)) && {
        val meetable = o.prefixItems.count(p => !disjoint(p, o.contains.get))
        meetable < need
      })
    }) ||
    (objOnly && o.minProperties.zip(o.maxProperties).exists { case (l, h) => l > h }) ||
    o.const.exists(c => o.types.exists(ts => !typeOk(ts, c))) ||
    (o.anyOf.nonEmpty && o.anyOf.forall(_ == Spec.Reject)) ||
    o.oneOf.contains(Spec.Reject) ||
    // oneOf whose branches are ALL structurally equal can never match
    // exactly once (every verdict agrees → the count is 0 or n, never 1).
    // NOTE a mere duplicate pair is NOT enough: {oneOf:[X,X,Y]} is still
    // satisfiable by Y alone.
    (o.oneOf.length >= 2 && o.oneOf.distinct.length == 1) ||
    notSubsumesSelf(o) ||
    // an integer-only leaf barred from a divisor every integer meets
    // (¬multipleOf(m) with m dividing all wholes) admits nothing
    (intOnly && barredFromWholeDivisor(o)) ||
    (objOnly && o.maxProperties.exists(_ < o.required.distinct.size)) ||
    // a required key whose own entry admits nothing
    (objOnly && o.required.exists(k =>
      o.properties.exists(p => p._1 == k && p._2 == Spec.Reject))) ||
    // propertyNames pinning keys to a finite value set whose every string
    // member is killed by `properties:{k:false}`: with minProperties ≥ 1
    // no object fits (`ir: a forbidden admitted key beside a property
    // minimum is unsatisfiable`)
    (objOnly && o.minProperties.exists(_ >= 1L) && o.propertyNames.exists {
      case pn: Spec.Obj if Canonical.only(pn)(_.copy(const = None, enumVals = None, types = None)) =>
        pn.const.map(Vector(_)).orElse(pn.enumVals).exists { vs =>
          vs.collect { case JStr(s) => s }.forall(k =>
            o.properties.exists(p => p._1 == k && p._2 == Spec.Reject))
        }
      case _ => false
    }) ||
    // uniqueItems + a finite item-value domain that cannot fill the
    // length floor (`ir: a two-value item domain under uniqueItems cannot
    // fill minItems 3`, unique_items.json): distinct items are drawn from
    // the union of the items/prefixItems domains — an UPPER bound, since
    // further constraints only shrink it
    (arrOnly && o.uniqueItems && o.minItems.exists { mi =>
      domainValues(o.items.getOrElse(Spec.Accept)).exists { iv =>
        val pv = o.prefixItems.map(domainValues)
        pv.forall(_.nonEmpty) && {
          val all = (iv ++ pv.flatMap(_.get)).foldLeft(Vector.empty[JsonValue]) {
            (acc, v) => if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v
          }
          all.size < mi
        }
      }
    }) ||
    // same counting for contains demands: minContains distinct matches
    // cannot come out of a smaller finite contains domain
    (arrOnly && o.uniqueItems && o.contains.nonEmpty &&
      o.minContains.exists(mc => domainValues(o.contains.get).exists { vs =>
        vs.foldLeft(Vector.empty[JsonValue]) {
          (acc, v) => if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v
        }.size < mc
      })) ||
    // a required key the propertyNames schema rejects (the interpreter
    // decides each finite witness exactly) — covers propertyNames:false
    // beside required, and per-key rejections through combinators
    (objOnly && o.propertyNames.exists(pn => !containsRefs(pn) &&
      o.required.exists(k =>
        try !Interp.isValid(pn, JStr(k)) catch { case _: Throwable => false }))) ||
    // a size floor above the number of keys a finite propertyNames value
    // set admits
    (objOnly && o.propertyNames.nonEmpty && o.minProperties.exists { mp =>
      domainValues(o.propertyNames.get).exists { vs =>
        dedupEq(vs).count(_.isInstanceOf[JStr]) < mp
      }
    }) ||
    notDominatesPinnedKeys(o, objOnly) ||
    valueWitnessFails(o)
  }

  private def dedupEq(vs: Vector[JsonValue]): Vector[JsonValue] =
    vs.foldLeft(Vector.empty[JsonValue]) {
      (acc, v) => if (acc.exists(JsonValue.equal(_, v))) acc else acc :+ v
    }

  /** An UPPER BOUND on the set of values a subschema position can take,
    * when finite and enumerable: const/enum members filtered by the type
    * pin, a null/boolean-only type set, or a small bounded integer grid.
    * None = unbounded/unknown. */
  private def domainValues(s: Spec): Option[Vector[JsonValue]] = s match {
    case Spec.Reject => Some(Vector.empty)
    case Spec.Accept => None
    case o: Spec.Obj =>
      val base: Option[Vector[JsonValue]] =
        if (o.const.nonEmpty) Some(Vector(o.const.get))
        else if (o.enumVals.nonEmpty) o.enumVals
        else o.types.flatMap { ts =>
          if (ts.subsetOf(Set(JsonType.Null, JsonType.Boolean): Set[JsonType]))
            Some(
              (if (ts.contains(JsonType.Null)) Vector(JNull: JsonValue) else Vector.empty) ++
              (if (ts.contains(JsonType.Boolean)) Vector(JBool(true): JsonValue, JBool(false)) else Vector.empty))
          else if (ts == (Set(JsonType.Integer): Set[JsonType])) {
            // small integer grid [lo, hi] (bounds already snapped inward
            // by numericNormalize); multipleOf only shrinks — still an
            // upper bound without it
            val lo = o.minimum.orElse(o.exclusiveMinimum.map(_ + 1))
            val hi = o.maximum.orElse(o.exclusiveMaximum.map(_ - 1))
            (lo, hi) match {
              case (Some(l0), Some(h0)) if l0.isWhole && h0.isWhole &&
                  h0 - l0 <= BigDecimal(31) && h0 >= l0 =>
                Some((0 to (h0 - l0).toInt).toVector.map(i => JNum(l0 + i): JsonValue))
              case _ => None
            }
          } else None
        }
      base.map(_.filter(v => o.types.forall(ts => typeOk(ts, v))))
  }

  /** uniqueItems + a finite item domain caps the length
    * (`ir: a bounded integer item domain caps the length under
    * uniqueItems`): distinct elements ≤ min(|items ∪ prefix domains|,
    * |items domain| + #prefix slots). A ceiling at the prefix length makes
    * `items` unreachable; a ceiling ≤ 1 makes uniqueItems vacuous. */
  private def arrayCeiling(o: Spec.Obj, annotationsMatter: Boolean): Spec.Obj = {
    if (!o.uniqueItems) {
      return if (o.maxItems.exists(_ <= 1L)) o.copy(uniqueItems = false) else o
    }
    domainValues(o.items.getOrElse(Spec.Accept)) match {
      case Some(iv0) =>
        val iv = dedupEq(iv0)
        val prefixDoms = o.prefixItems.map(domainValues)
        val slotBound = iv.size.toLong + o.prefixItems.length
        val unionBound: Option[Long] =
          if (prefixDoms.forall(_.nonEmpty))
            Some(dedupEq(iv ++ prefixDoms.flatMap(_.get)).size.toLong)
          else None
        val ceiling = unionBound.fold(slotBound)(u => math.min(u, slotBound))
        val newMax = o.maxItems.fold(ceiling)(m => math.min(m, ceiling))
        var r = o.copy(maxItems = Some(newMax))
        if (newMax <= o.prefixItems.length && o.items.nonEmpty && !annotationsMatter)
          r = r.copy(items = None)
        if (newMax <= 1L) r = r.copy(uniqueItems = false)
        r
      case None =>
        if (o.maxItems.exists(_ <= 1L)) o.copy(uniqueItems = false) else o
    }
  }

  /** An integer-only leaf conjoined (directly or via an allOf member) with
    * ¬multipleOf(m) where every integer is a multiple of m: unsatisfiable. */
  private def barredFromWholeDivisor(o: Spec.Obj): Boolean = {
    def vacuousNot(t: Spec): Boolean = t match {
      case to: Spec.Obj => to.multipleOf.exists(m => m.signum > 0 &&
          vacuousOverIntegers(m)) &&
        only(to)(_.copy(multipleOf = None, types = None)) &&
        to.types.forall(ts => ts.contains(JsonType.Integer) || ts.contains(JsonType.Number))
      case _ => false
    }
    o.not.exists(vacuousNot) || o.allOf.exists {
      case m: Spec.Obj => m.not.exists(vacuousNot) &&
        only(m)(_.copy(not = None, types = None))
      case _ => false
    }
  }

  /** `required` + `maxProperties` can pin the accepted objects' KEY SET to
    * exactly `required` (|keys| ≤ max ≤ |required| and required ⊆ keys).
    * If a negated conjunct (`not`, or a `not` inside an allOf member)
    * necessarily accepts every object with that key set — judged by the
    * three-valued abstract evaluation below, values unknown — then `not`
    * always fails and the schema is unsatisfiable
    * (negation.rs-class emptiness over key-only keywords). */
  private def notDominatesPinnedKeys(o: Spec.Obj, objOnly: Boolean): Boolean = {
    objOnly && o.required.nonEmpty &&
    o.maxProperties.exists(_ == o.required.distinct.size) && {
      val keys = o.required.toSet
      val notTargets = o.not.toVector ++ o.allOf.collect {
        case m: Spec.Obj if m.not.nonEmpty => m.not.get
      }
      notTargets.exists(nt => abstractObjEval(nt, keys).contains(true))
    }
  }

  /** Three-valued evaluation of `s` against an ABSTRACT object instance
    * with known key set `keys` and unknown values: Some(true) = every such
    * object passes, Some(false) = every such object fails, None = verdict
    * depends on the values. Non-object scalar keywords are vacuously true;
    * value-dependent applicators yield None unless trivially Accept/Reject.
    */
  private def abstractObjEval(s: Spec, keys: Set[String]): Option[Boolean] = s match {
    case Spec.Accept => Some(true)
    case Spec.Reject => Some(false)
    case o: Spec.Obj =>
      if (o.ref.nonEmpty || o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty) return None
      val vs = Vector.newBuilder[Option[Boolean]]
      o.types.foreach(ts => vs += Some(ts.contains(JsonType.Object)))
      // const/enum: always-false when no candidate has this key set;
      // otherwise value-dependent
      o.const.foreach {
        case JObj(fields) if fields.map(_._1).toSet == keys => vs += None
        case _ => vs += Some(false)
      }
      o.enumVals.foreach { cands =>
        val possible = cands.exists {
          case JObj(fields) => fields.map(_._1).toSet == keys
          case _ => false
        }
        vs += (if (possible) None else Some(false))
      }
      // key-only object keywords: fully decidable from the key set
      o.propertyNames.foreach { pn =>
        vs += (if (containsRefs(pn)) None
               else Some(keys.forall(k => Interp.isValid(pn, JStr(k)))))
      }
      if (o.required.nonEmpty) vs += Some(o.required.forall(keys.contains))
      o.minProperties.foreach(n => vs += Some(keys.size >= n))
      o.maxProperties.foreach(n => vs += Some(keys.size <= n))
      o.dependentRequired.foreach { case (k, reqs) =>
        vs += Some(!keys.contains(k) || reqs.forall(keys.contains))
      }
      // value-dependent object applicators
      def applied(sub: Spec, applies: Boolean): Option[Boolean] =
        if (!applies) Some(true)
        else sub match {
          case Spec.Accept => Some(true)
          case Spec.Reject => Some(false)
          case _ => None
        }
      o.properties.foreach { case (k, sub) => vs += applied(sub, keys.contains(k)) }
      if (o.patternProperties.nonEmpty)
        vs += (if (o.patternProperties.forall(_._2 == Spec.Accept)) Some(true) else None)
      o.additionalProperties.foreach { ap =>
        // additional keys are decidable only when patternProperties is empty
        if (o.patternProperties.nonEmpty) vs += None
        else {
          val extra = keys -- o.properties.map(_._1)
          vs += applied(ap, extra.nonEmpty)
        }
      }
      if (o.unevaluatedProperties.exists(_ != Spec.Accept)) vs += None
      o.dependentSchemas.foreach { case (k, sub) =>
        vs += (if (keys.contains(k)) abstractObjEval(sub, keys) else Some(true))
      }
      // combinators (three-valued)
      o.allOf.foreach(m => vs += abstractObjEval(m, keys))
      if (o.anyOf.nonEmpty) {
        val bs = o.anyOf.map(abstractObjEval(_, keys))
        vs += (if (bs.exists(_.contains(true))) Some(true)
               else if (bs.forall(_.contains(false))) Some(false)
               else None)
      }
      if (o.oneOf.nonEmpty) {
        val bs = o.oneOf.map(abstractObjEval(_, keys))
        val t = bs.count(_.contains(true)); val u = bs.count(_.isEmpty)
        vs += (if (t >= 2) Some(false)
               else if (t == 1 && u == 0) Some(true)
               else if (t == 0 && u == 0) Some(false)
               else None)
      }
      o.not.foreach(n => vs += abstractObjEval(n, keys).map(!_))
      o.ifSpec.foreach { c =>
        val tb = o.thenSpec.getOrElse(Spec.Accept)
        val eb = o.elseSpec.getOrElse(Spec.Accept)
        vs += (abstractObjEval(c, keys) match {
          case Some(true) => abstractObjEval(tb, keys)
          case Some(false) => abstractObjEval(eb, keys)
          case None =>
            val a = abstractObjEval(tb, keys); val b = abstractObjEval(eb, keys)
            if (a == b) a else None
        })
      }
      // string/number/array/content keywords: vacuous for an object — no-op
      val verdicts = vs.result()
      if (verdicts.exists(_.contains(false))) Some(false)
      else if (verdicts.forall(_.contains(true))) Some(true)
      else None
  }

  /** {X, not: Y} where Y provably accepts everything X's scalar part
    * accepts: every instance passing the schema also passes Y, so `not`
    * always fails (negation.rs-class emptiness: multipleOf barred from
    * itself, an integer window beside its complement, ...). Checks the
    * `not` keyword and pure-not allOf members. */
  private def notSubsumesSelf(o: Spec.Obj): Boolean = {
    val scalarSelf = o.copy(not = None, allOf = Vector.empty, oneOf = Vector.empty,
      anyOf = Vector.empty, ifSpec = None, thenSpec = None, elseSpec = None,
      defs = Map.empty)
    // structural equality also kills: the not-target's keywords are a
    // subset of the schema's own, so every accepted instance satisfies it
    // (covers applicator-bearing self-negations that subsumes' scalar-leaf
    // fragment can't reason about)
    // sibling conjuncts: the schema's remaining allOf members (each one a
    // constraint every instance must satisfy)
    val siblings: Vector[Spec] = scalarSelf +: o.allOf.filter {
      case m: Spec.Obj => !(m.not.nonEmpty && only(m)(_.copy(not = None)))
      case _ => true
    }
    def kills(nt: Spec): Boolean =
      siblings.exists(sib => sib == nt || subsumes(nt, sib))
    def memberNot(m: Spec): Option[Spec] = m match {
      // pure not, or not + a `types` wrapper covering the schema's own
      // types (then the wrapper adds nothing and the not applies always)
      case mo: Spec.Obj if mo.not.nonEmpty && only(mo)(_.copy(not = None)) => mo.not
      case mo: Spec.Obj if mo.not.nonEmpty && only(mo)(_.copy(not = None, types = None)) &&
        o.types.exists(st => expand(st).subsetOf(expand(mo.types.get))) => mo.not
      case _ => None
    }
    o.not.exists(kills) || o.allOf.exists(m => memberNot(m).exists(kills))
  }

  /** const/enum whose every candidate value fails the REST of the schema
    * (checked with the reference-faithful interpreter — covers bounds,
    * multipleOf, pattern, applicators and negations in one rule). Only for
    * self-contained schemas: refs resolve against the document root, which
    * this subschema alone doesn't carry.
    *
    * Also: schemas whose TYPE + size bounds pin the accepted set to a
    * single possible value (string maxLength 0 → "", object
    * maxProperties 0 → {}, array maxItems 0 → []) are unsatisfiable iff
    * that one value fails the full schema. */
  private def valueWitnessFails(o: Spec.Obj): Boolean = {
    if (containsRefs(o)) return false
    val fromValues = {
      val witnesses = o.const.map(Vector(_)).orElse(o.enumVals).getOrElse(Vector.empty)
      witnesses.nonEmpty && {
        val rest = if (o.const.nonEmpty) o.copy(const = None) else o.copy(enumVals = None)
        witnesses.forall(v => !Interp.isValid(rest, v))
      }
    }
    def only(ts: Set[JsonType]) = o.types.exists(t => t.nonEmpty && t.subsetOf(ts))
    val pinned: Option[JsonValue] =
      if (only(Set(JsonType.String)) && o.maxLength.contains(0L)) Some(JStr(""))
      else if (only(Set(JsonType.Object)) && o.maxProperties.contains(0L)) Some(JObj(Vector.empty))
      else if (only(Set(JsonType.Array)) && o.maxItems.contains(0L)) Some(JArr(Vector.empty))
      else None
    val fromPinnedDomain = pinned.exists(w => !Interp.isValid(o, w))
    fromValues || fromPinnedDomain
  }

  private def containsRefs(s: Spec): Boolean = s match {
    case o: Spec.Obj =>
      o.ref.nonEmpty || o.dynamicRef.nonEmpty || o.recursiveRef.nonEmpty ||
        (subschemas(o) ++ o.contentSchema).exists(containsRefs)
    case _ => false
  }

  /** Type-pinned numeric gap analysis (`ir/bound_rational.rs` /
    * `ir/divisors.rs` lite): an integer-only window holding no integer, or
    * a multipleOf whose first admissible multiple overshoots the window. */
  private def numericGapEmpty(o: Spec.Obj, intOnly: Boolean): Boolean = {
    val lo: Option[(BigDecimal, Boolean)] =
      (o.minimum.map((_, false)) ++ o.exclusiveMinimum.map((_, true)))
        .reduceOption((a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2)) a else b)
    val hi: Option[(BigDecimal, Boolean)] =
      (o.maximum.map((_, false)) ++ o.exclusiveMaximum.map((_, true)))
        .reduceOption((a, b) => if (a._1 < b._1 || (a._1 == b._1 && a._2)) a else b)
    val intGap = intOnly && lo.nonEmpty && hi.nonEmpty && {
      val (l, lx) = lo.get; val (h, hx) = hi.get
      var li = l.setScale(0, BigDecimal.RoundingMode.CEILING)
      if (lx && li == l) li = exAdd(li, 1)
      var hiI = h.setScale(0, BigDecimal.RoundingMode.FLOOR)
      if (hx && hiI == h) hiI = exSub(hiI, 1)
      li > hiI
    }
    val multipleGap = o.multipleOf.exists { m =>
      m.signum > 0 && lo.nonEmpty && hi.nonEmpty && {
        val (l, lx) = lo.get; val (h, hx) = hi.get
        // first multiple of m at/above the lower bound (exclusivity-aware)
        var k = l.bigDecimal.divide(m.bigDecimal, 0, java.math.RoundingMode.CEILING)
        var cand = exMul(BigDecimal(k), m)
        if (lx && cand == l) cand = exAdd(cand, m)
        cand > h || (hx && cand == h)
      }
    }
    intGap || multipleGap
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
    * (`canonical/mod.rs:20-22`); an interval holding exactly ONE multiple
    * of the divisor ≡ that value (`ir/bound_rational.rs` admit_between /
    * snap, incl. negative windows and zero); single-value enum ≡ const. */
  private def constEquivalence(o: Spec.Obj): Spec.Obj = {
    val intOnly = o.types == Some(Set(JsonType.Integer): Set[JsonType])
    val numOnly = o.types.exists(ts => ts.nonEmpty &&
      ts.subsetOf(Set(JsonType.Number, JsonType.Integer): Set[JsonType]))
    val fromInterval =
      if (o.const.isEmpty && o.enumVals.isEmpty && intOnly &&
          o.minimum.nonEmpty && o.minimum == o.maximum &&
          o.minimum.exists(_.isWhole) &&
          o.exclusiveMinimum.isEmpty && o.exclusiveMaximum.isEmpty &&
          o.multipleOf.forall(m => o.minimum.exists(v => (v remainder m).signum == 0)))
        Some(JNum(o.minimum.get))
      else None
    // interval + multipleOf admitting exactly one value: first multiple at
    // or above the low end equals the last at or below the high end
    val fromMultiple =
      if (fromInterval.isEmpty && o.const.isEmpty && o.enumVals.isEmpty && numOnly)
        o.multipleOf.filter(m => m.signum > 0 && (!intOnly || m.isWhole)).flatMap { m =>
          val lo = (o.minimum.map((_, false)).toSeq ++ o.exclusiveMinimum.map((_, true)))
            .reduceOption((a, b) => if (a._1 > b._1 || (a._1 == b._1 && a._2)) a else b)
          val hi = (o.maximum.map((_, false)).toSeq ++ o.exclusiveMaximum.map((_, true)))
            .reduceOption((a, b) => if (a._1 < b._1 || (a._1 == b._1 && a._2)) a else b)
          (lo, hi) match {
            case (Some((l, lx)), Some((h, hx))) =>
              var first = exMul(BigDecimal(l.bigDecimal.divide(m.bigDecimal, 0,
                java.math.RoundingMode.CEILING)), m)
              if (lx && first == l) first = exAdd(first, m)
              var last = exMul(BigDecimal(h.bigDecimal.divide(m.bigDecimal, 0,
                java.math.RoundingMode.FLOOR)), m)
              if (hx && last == h) last = exSub(last, m)
              if (first == last && (!intOnly || first.isWhole)) Some(JNum(first)) else None
            case _ => None
          }
        }
      else None
    // a size-zero domain pin admits exactly one value
    val fromPinnedDomain =
      if (fromInterval.isEmpty && fromMultiple.isEmpty &&
          o.const.isEmpty && o.enumVals.isEmpty) {
        if (o.types == Some(Set(JsonType.String): Set[JsonType]) &&
            o.maxLength.contains(0L) && o.pattern.isEmpty && o.format.isEmpty &&
            o.minLength.forall(_ == 0L))
          Some(JStr(""))
        else if (o.types == Some(Set(JsonType.Array): Set[JsonType]) &&
            o.maxItems.contains(0L) && o.minItems.forall(_ == 0L) && o.contains.isEmpty)
          Some(JArr(Vector.empty))
        else if (o.types == Some(Set(JsonType.Object): Set[JsonType]) &&
            (o.maxProperties.contains(0L) ||
             // a closed object with no declared keys admits only {}
             (o.additionalProperties.contains(Spec.Reject) &&
              o.properties.isEmpty && o.patternProperties.isEmpty &&
              o.propertyNames.isEmpty && o.maxProperties.forall(_ >= 0L))) &&
            o.minProperties.forall(_ == 0L) && o.required.isEmpty)
          Some(JObj(Vector.empty))
        else None
      } else None
    val pinnedClear: Spec.Obj => Spec.Obj = x => x.copy(
      maxLength = None, minLength = None, maxItems = None, minItems = None,
      maxProperties = None, minProperties = None, additionalProperties =
        if (x.additionalProperties.contains(Spec.Reject) && x.properties.isEmpty &&
            x.patternProperties.isEmpty) None else x.additionalProperties)
    fromPinnedDomain match {
      case Some(c) =>
        return pinnedClear(o.copy(const = Some(c), types = None))
      case None => ()
    }
    (fromInterval.orElse(fromMultiple)) match {
      case Some(c) => o.copy(const = Some(c), types = None,
        minimum = None, maximum = None, multipleOf = None,
        exclusiveMinimum = None, exclusiveMaximum = None)
      case None => o.enumVals match {
        // past the i64 projection the member keeps its `enum` spelling
        // (the reference's value model holds no const for it)
        case Some(Vector(single)) if o.const.isEmpty && (single match {
          case n: JNum => n.value.abs < I64Max
          case _ => true
        }) =>
          o.copy(const = Some(single), enumVals = None)
        case _ => o
      }
    }
  }
}
