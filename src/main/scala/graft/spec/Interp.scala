package graft.spec

/** Naive single-instance interpreter of a Spec over a JsonValue.
  *
  * Reference-faithful semantics (one instance, one verdict) — the direct
  * analog of `Validator::is_valid`
  * (`/root/reference/crates/jsonschema/src/validator.rs:500-503`). Used
  * for: (a) static evaluation inside the compiler (e.g. `propertyNames`
  * over a fixed relational schema's column names), (b) the ScalaCheck
  * property-test oracle (engine verdict over a 1-row Dataset must equal
  * this interpreter's verdict).
  */
object Interp {

  def isValid(spec: Spec, v: JsonValue): Boolean = prepare(spec).isValid(v)

  /** Registry built once, reusable across instances — the analog of a
    * compiled `Validator` for the interpreter (used per-row by the
    * contentSchema kernel, so the build must not repeat per row). `entry`
    * may be a subschema of `root` (contentSchema: its $refs resolve against
    * the whole document). */
  final case class Prepared(root: Spec, registry: Registry, entry: Spec,
                            assertFormats: Boolean = false)
      extends Serializable {
    /** Closure-compiled fast path (Compiled.scala); None ⇒ compile budget
      * exceeded and verdicts come from the tree-walk. Transient:
      * recompiled lazily per executor. */
    @transient private lazy val fast: Option[JsonValue => Boolean] =
      Compiled.compile(registry, entry, assertFormats)

    def isValid(v: JsonValue): Boolean = fast match {
      case Some(f) => f(v)
      case None    => isValidInterp(v)
    }

    /** Fused streaming parse+validate (Streaming.scala): verdict straight
      * off the source text, materializing subtrees only where the schema
      * forces trial evaluation. None ⇒ compile budget exceeded. Transient:
      * recompiled lazily per executor. */
    @transient private lazy val streamFast: Option[String => Boolean] =
      Streaming.compile(registry, entry, assertFormats)

    /** Validate a JSON document from text. Identical verdicts to
      * `isValid(JsonValue.parse(text))` on documents that parse; on
      * malformed documents either throws (like parse) or returns false
      * (when a failing constraint short-circuits before the malformed
      * region — the verdict a caller catching parse errors gets anyway). */
    def isValidText(text: String): Boolean = streamFast match {
      case Some(f) => f(text)
      case None    => isValid(JsonValue.parse(text))
    }

    /** Tree-walk verdict — the executable specification; the compiled path
      * is differentially tested against it (CompiledSpec). */
    def isValidInterp(v: JsonValue): Boolean = {
      val res = entry match {
        case o: Spec.Obj => registry.resourceOf(o)
        case _           => registry.rootResource
      }
      valid(entry, v, RootCtx(registry, res, List(res), assertFormats), Nil)
    }
  }

  def prepare(spec: Spec): Prepared = prepare(spec, assertFormats = false)

  /** `assertFormats = true` is the analog of the reference's
    * `validate_formats(true)` option (`options.rs`): `format` becomes an
    * assertion in single-document validation too (the table engine asserts
    * by default; the 2020-12 default for this dialect is annotation). */
  def prepare(spec: Spec, assertFormats: Boolean): Prepared = {
    Vocabularies.check(spec) // refuse dialects requiring unknown vocabularies
    val reg = Registry.build(spec)
    Prepared(spec, reg, spec, assertFormats)
  }

  /** Prepare a validator rooted at `entry`, a subschema of `root`. */
  def prepareAt(root: Spec, entry: Spec): Prepared =
    Prepared(root, Registry.build(root), entry)

  private final case class RootCtx(registry: Registry, res: Registry.Resource,
                                   scope: List[Registry.Resource],
                                   assertFormats: Boolean = false)

  /** Resolve against the CURRENT base; returns target + the ctx rebased to
    * the target's resource. Unresolvable → SpecError (never silent-accept). */
  private def resolveRef(ref: String, ctx: RootCtx): (Spec, RootCtx) =
    ctx.registry.resolve(ref, ctx.res) match {
      case Some((s, r)) => (s, rebase(ctx, r))
      case None => throw new SpecError(s"unresolvable $$ref: $ref")
    }

  private def rebase(ctx: RootCtx, r: Registry.Resource): RootCtx =
    if (r eq ctx.res) ctx
    else ctx.copy(res = r, scope = ctx.scope :+ r)

  /** Entering a subschema: if it lives in a different resource (crossed an
    * `$id` boundary), rebase and extend the dynamic scope. */
  private def entered(s: Spec, ctx: RootCtx): RootCtx = s match {
    case o: Spec.Obj => rebase(ctx, ctx.registry.resourceOf(o))
    case _ => ctx
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** Compiled-regex cache: `Pattern.compile` costs tens of µs and the
    * interpreter runs per ROW inside the contentSchema kernel — compiling
    * `pattern`/`patternProperties` regexes per evaluation dominated the
    * recursive-schema benchmark (~657 µs/doc before, most of it here).
    * Keys come from schema text, so the population is bounded by the
    * schemas in use; a size cap guards pathological schema churn.
    * ConcurrentHashMap: lock-free reads across executor threads. */
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def compiled(p: String): java.util.regex.Pattern = {
    val hit = patternCache.get(p)
    if (hit != null) hit
    else {
      val c = java.util.regex.Pattern.compile(EcmaRegex.translate(p))
      if (patternCache.size < 10000) patternCache.putIfAbsent(p, c)
      c
    }
  }

  private def valid(spec: Spec, v: JsonValue, ctx: RootCtx, stack: List[(Spec, JsonValue)]): Boolean =
    spec match {
      case Spec.Accept => true
      case Spec.Reject => false
      case s: Spec.Obj =>
        val st = stack
        val c2 = entered(spec, ctx)
        // cycle detection only needs SAME-INSTANCE recursion steps (a
        // cycle can't span a descent into a finite instance tree), so the
        // stack resets on descent — keeps the per-node scan O(ref-chain),
        // not O(nesting depth x branch trials)
        def ok(sub: Spec, value: JsonValue): Boolean =
          valid(sub, value, c2, if (value eq v) st else Nil)
        // structure-free REF cycle ⇒ accept. The reference guards only
        // ref-TARGET (Pending) nodes (validator.rs:62-115, node.rs:198-264;
        // pure-cycle ≡ true at ref_.rs:1008), so a node first reached
        // structurally (incl. the document root) gets ONE free unrolling
        // before a ref back to it trips the guard — check + push at ref
        // arrival, never at structural entry.
        def refValid(rs: Spec, rctx: RootCtx): Boolean =
          if (st.exists { case (sp, in) => (sp eq rs) && (in eq v) }) true
          else valid(rs, v, rctx, (rs, v) :: st)

        s.ref.forall { r =>
          val (rs, rctx) = resolveRef(r, c2)
          refValid(rs, rctx)
        } &&
        s.dynamicRef.forall { r =>
          val (rs, rctx) = c2.registry.resolveDynamic(r, c2.res, c2.scope) match {
            case Some((sp, res)) => (sp, rebase(c2, res))
            case None => throw new SpecError(s"unresolvable $$dynamicRef: $r")
          }
          refValid(rs, rctx)
        } &&
        s.recursiveRef.forall { _ =>
          val (rs, res) = c2.registry.resolveRecursive(c2.res, c2.scope)
          refValid(rs, rebase(c2, res))
        } &&
        s.types.forall(ts => typeMatches(ts, v)) &&
        s.const.forall(c => JsonValue.equal(c, v)) &&
        s.enumVals.forall(_.exists(JsonValue.equal(_, v))) &&
        numCheck(v) { n =>
          s.minimum.forall(n >= _) && s.maximum.forall(n <= _) &&
          s.exclusiveMinimum.forall(n > _) && s.exclusiveMaximum.forall(n < _) &&
          s.multipleOf.forall(m => (n remainder m).compareTo(BigDecimal(0)) == 0)
        } &&
        strCheck(v) { str =>
          s.minLength.forall(codePoints(str) >= _) &&
          s.maxLength.forall(codePoints(str) <= _) &&
          s.pattern.forall(p => compiled(p).matcher(str).find()) &&
          (!ctx.assertFormats || s.format.forall(f =>
            graft.compile.Formats.scalaPredicate(f).forall(_(str))))
        } &&
        objCheck(v) { o =>
          s.required.forall(o.has) &&
          s.minProperties.forall(o.fields.length >= _) &&
          s.maxProperties.forall(o.fields.length <= _) &&
          s.properties.forall { case (name, sub) => o.get(name).forall(ok(sub, _)) } &&
          s.patternProperties.forall { case (pat, sub) =>
            val re = compiled(pat)
            o.fields.forall { case (k, value) => !re.matcher(k).find() || ok(sub, value) }
          } &&
          s.additionalProperties.forall { ap =>
            val propNames = s.propertyNameSet
            val pats = s.patternProperties.map(p => compiled(p._1))
            o.fields.forall { case (k, value) =>
              propNames.contains(k) || pats.exists(_.matcher(k).find()) || ok(ap, value)
            }
          } &&
          s.propertyNames.forall(pn => o.fields.forall { case (k, _) => ok(pn, JStr(k)) }) &&
          s.dependentRequired.forall { case (key, deps) =>
            !o.toMap.contains(key) || deps.forall(o.toMap.contains)
          } &&
          s.dependentSchemas.forall { case (key, sub) =>
            !o.toMap.contains(key) || ok(sub, v)
          } &&
          s.unevaluatedProperties.forall { u =>
            val ev = evaluatedProps(s, o, c2, st, includeSelfUneval = false)
            o.fields.forall { case (k, value) => ev.contains(k) || ok(u, value) }
          }
        } &&
        arrCheck(v) { a =>
          s.minItems.forall(a.length >= _) &&
          s.maxItems.forall(a.length <= _) &&
          (!s.uniqueItems || allUnique(a)) &&
          s.prefixItems.zipWithIndex.forall { case (sub, i) =>
            i >= a.length || ok(sub, a(i))
          } &&
          s.items.forall { sub =>
            a.drop(s.prefixItems.length).forall(ok(sub, _))
          } &&
          (s.contains match {
            case None => true
            case Some(c) =>
              val n = a.count(ok(c, _))
              n >= s.minContains.getOrElse(1L) && s.maxContains.forall(n <= _)
          }) &&
          s.unevaluatedItems.forall { u =>
            val (allCov, prefix, contains) = itemCov(s, v, c2, st, includeSelfUneval = false)
            allCov || a.zipWithIndex.forall { case (x, i) =>
              i < prefix || contains.exists(p => ok(p, x)) || ok(u, x)
            }
          }
        } &&
        s.allOf.forall(ok(_, v)) &&
        (s.anyOf.isEmpty || s.anyOf.exists(ok(_, v))) &&
        (s.oneOf.isEmpty || {
          // short-circuit: stop at the second match
          var n = 0
          val it = s.oneOf.iterator
          while (n < 2 && it.hasNext) if (ok(it.next(), v)) n += 1
          n == 1
        }) &&
        s.not.forall(!ok(_, v)) &&
        (s.ifSpec match {
          case None => true
          case Some(i) =>
            if (ok(i, v)) s.thenSpec.forall(ok(_, v))
            else s.elseSpec.forall(ok(_, v))
        })
    }

  /** Properties of `o` evaluated by `s` (annotation flow: contributions
    * only from valid in-place subschemas). */
  private def evaluatedProps(s: Spec.Obj, o: JObj, ctx: RootCtx,
                             stack: List[(Spec, JsonValue)],
                             includeSelfUneval: Boolean,
                             visited: List[Spec.Obj] = Nil): Set[String] = {
    if (visited.exists(_ eq s)) return Set.empty // recursive-ref fixpoint
    val vis = s :: visited
    val keys = o.fields.map(_._1).toSet
    var out = Set.empty[String]
    if (s.additionalProperties.nonEmpty || (includeSelfUneval && s.unevaluatedProperties.nonEmpty))
      out ++= keys
    out ++= s.properties.map(_._1).filter(keys.contains)
    s.patternProperties.foreach { case (p, _) =>
      val re = compiled(p)
      out ++= keys.filter(k => re.matcher(k).find())
    }
    def branchIn(b: Spec, bctx: RootCtx): Unit = b match {
      case bo: Spec.Obj if valid(b, o, bctx, stack) =>
        out ++= evaluatedProps(bo, o, entered(bo, bctx), stack,
          includeSelfUneval = true, vis)
      case Spec.Accept => () // accepts but evaluates nothing
      case _ => ()
    }
    def branch(b: Spec): Unit = branchIn(b, ctx)
    s.allOf.foreach(branch); s.anyOf.foreach(branch); s.oneOf.foreach(branch)
    s.ref.foreach { r => val (rs, rctx) = resolveRef(r, ctx); branchIn(rs, rctx) }
    s.dynamicRef.foreach { r =>
      ctx.registry.resolveDynamic(r, ctx.res, ctx.scope).foreach { case (rs, res) =>
        branchIn(rs, rebase(ctx, res))
      }
    }
    s.recursiveRef.foreach { _ =>
      val (rs, res) = ctx.registry.resolveRecursive(ctx.res, ctx.scope)
      branchIn(rs, rebase(ctx, res))
    }
    s.ifSpec.foreach { i =>
      if (valid(i, o, ctx, stack)) { branch(i); s.thenSpec.foreach(branch) }
      else s.elseSpec.foreach(branch)
    }
    s.dependentSchemas.foreach { case (k, sub) =>
      if (o.toMap.contains(k)) branch(sub)
    }
    out
  }

  /** (allCovered, prefixLen, containsSpecs) for unevaluatedItems. */
  private def itemCov(s: Spec.Obj, v: JsonValue, ctx: RootCtx,
                      stack: List[(Spec, JsonValue)],
                      includeSelfUneval: Boolean,
                      visited: List[Spec.Obj] = Nil): (Boolean, Int, Vector[Spec]) = {
    if (visited.exists(_ eq s)) return (false, 0, Vector.empty) // recursive-ref fixpoint
    val vis = s :: visited
    var all = s.items.nonEmpty || (includeSelfUneval && s.unevaluatedItems.nonEmpty)
    var prefix = s.prefixItems.length
    var contains = s.contains.toVector
    def branchIn(b: Spec, bctx: RootCtx): Unit = b match {
      case bo: Spec.Obj if valid(b, v, bctx, stack) =>
        val (a2, p2, c2) = itemCov(bo, v, entered(bo, bctx), stack,
          includeSelfUneval = true, vis)
        all ||= a2; prefix = math.max(prefix, p2); contains ++= c2
      case _ => ()
    }
    def branch(b: Spec): Unit = branchIn(b, ctx)
    s.allOf.foreach(branch); s.anyOf.foreach(branch); s.oneOf.foreach(branch)
    s.ref.foreach { r => val (rs, rctx) = resolveRef(r, ctx); branchIn(rs, rctx) }
    s.dynamicRef.foreach { r =>
      ctx.registry.resolveDynamic(r, ctx.res, ctx.scope).foreach { case (rs, res) =>
        branchIn(rs, rebase(ctx, res))
      }
    }
    s.recursiveRef.foreach { _ =>
      val (rs, res) = ctx.registry.resolveRecursive(ctx.res, ctx.scope)
      branchIn(rs, rebase(ctx, res))
    }
    s.ifSpec.foreach { i =>
      if (valid(i, v, ctx, stack)) { branch(i); s.thenSpec.foreach(branch) }
      else s.elseSpec.foreach(branch)
    }
    s.dependentSchemas.foreach { case (k, sub) =>
      v match {
        case o: JObj if o.toMap.contains(k) => branch(sub)
        case _ => ()
      }
    }
    (all, prefix, contains)
  }

  // ---- error enumeration (iter_errors analog for single documents) -----

  /** One keyword-level failure: where in the instance, where in the
    * schema, what went wrong — the single-document analog of the engine's
    * violation rows (`ValidationError` in the reference,
    * `crates/jsonschema/src/error.rs`). */
  final case class VError(instancePath: String, schemaPath: String, message: String)

  /** Collect keyword-level errors for an invalid instance (display-grade:
    * combinator failures are summarized at the combinator keyword, with
    * recursion into allOf members and the active if-branch; the VERDICT
    * authority remains `isValid`). Returns empty iff the instance is
    * valid. Capped at `limit` errors. */
  def errors(p: Prepared, v: JsonValue, limit: Int = 100): Vector[VError] =
    errors(p, v, limit, masked = false)

  /** `masked = true` is the analog of the reference's
    * `ValidationError::masked` (`error.rs`): messages carry NO instance
    * data (values and offending property names are redacted) so errors
    * can be logged/shipped without leaking row contents; paths remain. */
  def errors(p: Prepared, v: JsonValue, limit: Int, masked: Boolean): Vector[VError] = {
    def shv(x: => String): String = if (masked) "value" else x
    def shk(k: => String): String = if (masked) "<redacted>" else s"'$k'"
    val out = Vector.newBuilder[VError]
    var n = 0
    val res = p.entry match {
      case o: Spec.Obj => p.registry.resourceOf(o)
      case _           => p.registry.rootResource
    }
    def emit(ip: String, sp: String, msg: String): Unit =
      if (n < limit) { out += VError(ip, sp, msg); n += 1 }

    def walk(spec: Spec, value: JsonValue, ip: String, sp: String,
             ctx: RootCtx, stack: List[(Spec, JsonValue)]): Unit = spec match {
      case Spec.Accept => ()
      case Spec.Reject =>
        emit(ip, sp, s"False schema does not allow ${shv(JsonValue.render(value))}")
      case s: Spec.Obj =>
        if (n >= limit) return
        val st = stack
        val c2 = entered(spec, ctx)
        def sub(kw: String) = s"$sp/$kw"
        def okV(x: Spec, value2: JsonValue) =
          valid(x, value2, c2, if (value2 eq value) st else Nil)

        s.ref.foreach { r =>
          val (rs, rctx) = resolveRef(r, c2)
          // ref-arrival cycle guard (mirrors valid()): a repeat of the
          // same ref target at the same instance is vacuously valid
          if (!st.exists { case (x, in) => (x eq rs) && (in eq value) }) {
            val st2 = (rs, value) :: st
            if (!valid(rs, value, rctx, st2)) walk(rs, value, ip, sub("$ref"), rctx, st2)
          }
        }
        s.types.foreach { ts =>
          if (!typeMatches(ts, value)) {
            val names = JsonType.all.filter(ts.contains).map(t => "\"" + t.name + "\"")
            val noun = if (names.length == 1) "type" else "types"
            emit(ip, sub("type"),
              s"${shv(JsonValue.render(value))} is not of $noun ${names.mkString(", ")}")
          }
        }
        s.const.foreach(c => if (!JsonValue.equal(c, value))
          emit(ip, sub("const"), s"${JsonValue.render(c)} was expected"))
        s.enumVals.foreach { es =>
          if (!es.exists(JsonValue.equal(_, value))) {
            val r = es.map(JsonValue.render)
            val listed = r.length match {
              case 1 => r(0)
              case 2 => s"${r(0)} or ${r(1)}"
              case 3 => s"${r(0)}, ${r(1)} or ${r(2)}"
              case n => s"${r(0)}, ${r(1)} or ${n - 2} other candidates"
            }
            emit(ip, sub("enum"), s"${shv(JsonValue.render(value))} is not one of $listed")
          }
        }
        value match {
          case JNum(num) =>
            s.minimum.foreach(m => if (num < m) emit(ip, sub("minimum"), s"${shv(num.toString)} is less than the minimum of $m"))
            s.maximum.foreach(m => if (num > m) emit(ip, sub("maximum"), s"${shv(num.toString)} is greater than the maximum of $m"))
            s.exclusiveMinimum.foreach(m => if (num <= m) emit(ip, sub("exclusiveMinimum"), s"${shv(num.toString)} is less than or equal to the minimum of $m"))
            s.exclusiveMaximum.foreach(m => if (num >= m) emit(ip, sub("exclusiveMaximum"), s"${shv(num.toString)} is greater than or equal to the maximum of $m"))
            s.multipleOf.foreach(m => if ((num remainder m).signum != 0)
              emit(ip, sub("multipleOf"), s"${shv(num.toString)} is not a multiple of $m"))
          case JStr(str) =>
            val cp = codePoints(str)
            def chars(m: Long) = if (m == 1L) "character" else "characters"
            s.minLength.foreach(m => if (cp < m) emit(ip, sub("minLength"),
              s"${shv(JsonValue.render(value))} is shorter than $m ${chars(m)}"))
            s.maxLength.foreach(m => if (cp > m) emit(ip, sub("maxLength"),
              s"${shv(JsonValue.render(value))} is longer than $m ${chars(m)}"))
            s.pattern.foreach(pt => if (!compiled(pt).matcher(str).find())
              emit(ip, sub("pattern"),
                s"${shv(JsonValue.render(value))} does not match ${JsonValue.render(JStr(pt))}"))
            if (p.assertFormats)
              s.format.foreach(f => graft.compile.Formats.scalaPredicate(f).foreach { pred =>
                if (!pred(str)) emit(ip, sub("format"),
                  s"${shv(JsonValue.render(value))} is not a ${JsonValue.render(JStr(f))}")
              })
          case o: JObj =>
            s.required.foreach(r => if (!o.toMap.contains(r))
              emit(ip, sub("required"), "\"" + r + "\" is a required property"))
            def props(m: Long) = if (m == 1L) "property" else "properties"
            s.minProperties.foreach(m => if (o.fields.length < m)
              emit(ip, sub("minProperties"),
                s"${shv(JsonValue.render(value))} has less than $m ${props(m)}"))
            s.maxProperties.foreach(m => if (o.fields.length > m)
              emit(ip, sub("maxProperties"),
                s"${shv(JsonValue.render(value))} has more than $m ${props(m)}"))
            s.properties.foreach { case (k, psub) =>
              o.get(k).foreach { pv =>
                if (!okV(psub, pv)) walk(psub, pv, s"$ip/$k", s"${sub("properties")}/$k", c2, Nil)
              }
            }
            s.patternProperties.foreach { case (pat, psub) =>
              val re = compiled(pat)
              o.fields.foreach { case (k, pv) =>
                if (re.matcher(k).find() && !okV(psub, pv))
                  walk(psub, pv, s"$ip/$k", s"${sub("patternProperties")}/$pat", c2, Nil)
              }
            }
            s.additionalProperties.foreach { ap =>
              val names = s.propertyNameSet
              val pats = s.patternProperties.map(pp => compiled(pp._1))
              val extra = o.fields.collect {
                case (k, pv) if !names.contains(k) && !pats.exists(_.matcher(k).find()) &&
                  !okV(ap, pv) => (k, pv)
              }
              if (ap == Spec.Reject && extra.nonEmpty) {
                // one aggregated error, the reference's template
                // (`keywords/mod.rs` unexpected-property message)
                val listed = extra.map(e => shk(e._1)).mkString(", ")
                val verb = if (extra.length == 1) "was" else "were"
                emit(ip, sub("additionalProperties"),
                  s"Additional properties are not allowed ($listed $verb unexpected)")
              } else extra.foreach { case (k, pv) =>
                walk(ap, pv, s"$ip/$k", sub("additionalProperties"), c2, Nil)
              }
            }
            s.propertyNames.foreach { pn =>
              o.fields.foreach { case (k, _) =>
                if (!okV(pn, JStr(k)))
                  emit(ip, sub("propertyNames"), s"property name ${shk(k)} is invalid")
              }
            }
            s.dependentRequired.foreach { case (k, deps) =>
              if (o.toMap.contains(k)) deps.foreach(d => if (!o.toMap.contains(d))
                emit(ip, sub("dependentRequired"), s"'$d' is required when '$k' is present"))
            }
            s.dependentSchemas.foreach { case (k, dsub) =>
              if (o.toMap.contains(k) && !okV(dsub, value))
                walk(dsub, value, ip, s"${sub("dependentSchemas")}/$k", c2, st)
            }
            s.unevaluatedProperties.foreach { u =>
              val ev = evaluatedProps(s, o, c2, st, includeSelfUneval = false)
              o.fields.foreach { case (k, pv) =>
                if (!ev.contains(k) && !okV(u, pv))
                  emit(s"$ip/$k", sub("unevaluatedProperties"), s"unevaluated property ${shk(k)} is not allowed")
              }
            }
          case JArr(a) =>
            def items(m: Long) = if (m == 1L) "item" else "items"
            s.minItems.foreach(m => if (a.length < m) emit(ip, sub("minItems"),
              s"${shv(JsonValue.render(value))} has less than $m ${items(m)}"))
            s.maxItems.foreach(m => if (a.length > m) emit(ip, sub("maxItems"),
              s"${shv(JsonValue.render(value))} has more than $m ${items(m)}"))
            if (s.uniqueItems && !allUnique(a))
              emit(ip, sub("uniqueItems"), s"${shv(JsonValue.render(value))} has non-unique elements")
            s.prefixItems.zipWithIndex.foreach { case (psub, i) =>
              if (i < a.length && !okV(psub, a(i)))
                walk(psub, a(i), s"$ip/$i", s"${sub("prefixItems")}/$i", c2, Nil)
            }
            s.items.foreach { isub =>
              a.zipWithIndex.drop(s.prefixItems.length).foreach { case (x, i) =>
                if (!okV(isub, x)) walk(isub, x, s"$ip/$i", sub("items"), c2, Nil)
              }
            }
            s.contains.foreach { csub =>
              val cn = a.count(okV(csub, _))
              val lo = s.minContains.getOrElse(1L)
              if (cn < lo) {
                if (cn == 0 && s.minContains.isEmpty)
                  emit(ip, sub("contains"),
                    s"None of ${shv(JsonValue.render(value))} are valid under the given schema")
                else emit(ip, sub("contains"), s"array contains $cn matching items, fewer than $lo")
              }
              s.maxContains.foreach(hi => if (cn > hi)
                emit(ip, sub("maxContains"), s"array contains $cn matching items, more than $hi"))
            }
            s.unevaluatedItems.foreach { u =>
              val (allCov, prefix, cont) = itemCov(s, value, c2, st, includeSelfUneval = false)
              if (!allCov) a.zipWithIndex.foreach { case (x, i) =>
                if (i >= prefix && !cont.exists(okV(_, x)) && !okV(u, x))
                  emit(s"$ip/$i", sub("unevaluatedItems"), s"unevaluated item at index $i is not allowed")
              }
            }
          case _ => ()
        }
        s.allOf.zipWithIndex.foreach { case (m, i) =>
          if (!okV(m, value)) walk(m, value, ip, s"${sub("allOf")}/$i", c2, st)
        }
        if (s.anyOf.nonEmpty && !s.anyOf.exists(okV(_, value)))
          emit(ip, sub("anyOf"), s"${shv(JsonValue.render(value))} is not valid under any of the schemas listed in the 'anyOf' keyword")
        if (s.oneOf.nonEmpty) {
          val cnt = s.oneOf.count(okV(_, value))
          if (cnt == 0) emit(ip, sub("oneOf"), s"${shv(JsonValue.render(value))} is not valid under any of the schemas listed in the 'oneOf' keyword")
          else if (cnt > 1) emit(ip, sub("oneOf"), s"${shv(JsonValue.render(value))} is valid under more than one of the schemas listed in the 'oneOf' keyword")
        }
        s.not.foreach(nt => if (okV(nt, value))
          emit(ip, sub("not"),
            s"${JsonValue.render(Spec.toJson(nt))} is not allowed for ${shv(JsonValue.render(value))}"))
        s.ifSpec.foreach { i =>
          if (okV(i, value)) s.thenSpec.foreach { t =>
            if (!okV(t, value)) walk(t, value, ip, sub("then"), c2, st)
          } else s.elseSpec.foreach { e =>
            if (!okV(e, value)) walk(e, value, ip, sub("else"), c2, st)
          }
        }
    }

    if (p.isValid(v)) Vector.empty
    else {
      walk(p.entry, v, "", "#", RootCtx(p.registry, res, List(res), p.assertFormats), Nil)
      val r = out.result()
      // an invalid instance must surface at least one error even when the
      // failure lives behind a summarized construct
      if (r.isEmpty) Vector(VError("", "#", "instance is invalid")) else r
    }
  }

  private def typeMatches(ts: Set[JsonType], v: JsonValue): Boolean = {
    val t = v.jsonType
    ts.contains(t) || (t == JsonType.Integer && ts.contains(JsonType.Number))
  }

  private def numCheck(v: JsonValue)(f: BigDecimal => Boolean): Boolean = v match {
    case JNum(n) => f(n)
    case _       => true
  }
  private def strCheck(v: JsonValue)(f: String => Boolean): Boolean = v match {
    case JStr(s) => f(s)
    case _       => true
  }
  private def objCheck(v: JsonValue)(f: JObj => Boolean): Boolean = v match {
    case o: JObj => f(o)
    case _       => true
  }
  private def arrCheck(v: JsonValue)(f: Vector[JsonValue] => Boolean): Boolean = v match {
    case JArr(a) => f(a)
    case _       => true
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
