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

  def isValid(spec: Spec, v: JsonValue): Boolean = valid(spec, v, RootCtx(spec), Nil)

  private final case class RootCtx(root: Spec) {
    lazy val defs: Map[String, Spec] = root match {
      case o: Spec.Obj => o.defs
      case _           => Map.empty
    }
  }

  private def resolveRef(ref: String, ctx: RootCtx): Option[Spec] = {
    if (ref == "#") Some(ctx.root)
    else if (ref.startsWith("#/$defs/")) ctx.defs.get(ref.stripPrefix("#/$defs/"))
    else if (ref.startsWith("#/definitions/")) ctx.defs.get(ref.stripPrefix("#/definitions/"))
    else None // external refs unsupported in the interpreter
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  private def valid(spec: Spec, v: JsonValue, ctx: RootCtx, stack: List[(Spec, JsonValue)]): Boolean =
    spec match {
      case Spec.Accept => true
      case Spec.Reject => false
      case s: Spec.Obj =>
        // structure-free cycle ⇒ accept (reference detects via
        // (node_id, instance identity) stack, validator.rs:62-115)
        if (stack.exists { case (sp, in) => (sp eq spec) && (in eq v) }) return true
        val st = (spec, v) :: stack
        def ok(sub: Spec, value: JsonValue): Boolean = valid(sub, value, ctx, st)

        s.ref.forall { r =>
          // unresolvable $ref fails at use like the reference fails at
          // build — never silently accept (same contract as SpecCompiler)
          val rs = resolveRef(r, ctx).getOrElse(
            throw new SpecError(s"unresolvable $$ref: $r"))
          valid(rs, v, ctx, st)
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
          s.pattern.forall(p =>
            java.util.regex.Pattern.compile(EcmaRegex.translate(p)).matcher(str).find())
        } &&
        objCheck(v) { o =>
          s.required.forall(r => o.toMap.contains(r)) &&
          s.minProperties.forall(o.fields.length >= _) &&
          s.maxProperties.forall(o.fields.length <= _) &&
          s.properties.forall { case (name, sub) => o.get(name).forall(ok(sub, _)) } &&
          s.patternProperties.forall { case (pat, sub) =>
            val re = java.util.regex.Pattern.compile(EcmaRegex.translate(pat))
            o.fields.forall { case (k, value) => !re.matcher(k).find() || ok(sub, value) }
          } &&
          s.additionalProperties.forall { ap =>
            val propNames = s.properties.map(_._1).toSet
            val pats = s.patternProperties.map(p => java.util.regex.Pattern.compile(EcmaRegex.translate(p._1)))
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
            val ev = evaluatedProps(s, o, ctx, st, includeSelfUneval = false)
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
            val (allCov, prefix, contains) = itemCov(s, v, ctx, st, includeSelfUneval = false)
            allCov || a.zipWithIndex.forall { case (x, i) =>
              i < prefix || contains.exists(p => ok(p, x)) || ok(u, x)
            }
          }
        } &&
        s.allOf.forall(ok(_, v)) &&
        (s.anyOf.isEmpty || s.anyOf.exists(ok(_, v))) &&
        (s.oneOf.isEmpty || s.oneOf.count(ok(_, v)) == 1) &&
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
                             includeSelfUneval: Boolean): Set[String] = {
    val keys = o.fields.map(_._1).toSet
    var out = Set.empty[String]
    if (s.additionalProperties.nonEmpty || (includeSelfUneval && s.unevaluatedProperties.nonEmpty))
      out ++= keys
    out ++= s.properties.map(_._1).filter(keys.contains)
    s.patternProperties.foreach { case (p, _) =>
      val re = java.util.regex.Pattern.compile(EcmaRegex.translate(p))
      out ++= keys.filter(k => re.matcher(k).find())
    }
    def branch(b: Spec): Unit = b match {
      case bo: Spec.Obj if valid(b, o, ctx, stack) =>
        out ++= evaluatedProps(bo, o, ctx, stack, includeSelfUneval = true)
      case Spec.Accept => () // accepts but evaluates nothing
      case _ => ()
    }
    s.allOf.foreach(branch); s.anyOf.foreach(branch); s.oneOf.foreach(branch)
    s.ref.foreach(r => resolveRef(r, ctx).foreach(branch))
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
                      includeSelfUneval: Boolean): (Boolean, Int, Vector[Spec]) = {
    var all = s.items.nonEmpty || (includeSelfUneval && s.unevaluatedItems.nonEmpty)
    var prefix = s.prefixItems.length
    var contains = s.contains.toVector
    def branch(b: Spec): Unit = b match {
      case bo: Spec.Obj if valid(b, v, ctx, stack) =>
        val (a2, p2, c2) = itemCov(bo, v, ctx, stack, includeSelfUneval = true)
        all ||= a2; prefix = math.max(prefix, p2); contains ++= c2
      case _ => ()
    }
    s.allOf.foreach(branch); s.anyOf.foreach(branch); s.oneOf.foreach(branch)
    s.ref.foreach(r => resolveRef(r, ctx).foreach(branch))
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
