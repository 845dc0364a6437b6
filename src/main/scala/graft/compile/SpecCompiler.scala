package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.spec._

/** One compiled constraint check.
  *
  * The analog of one keyword validator in the reference's compiled
  * `SchemaNode` tree (`/root/reference/crates/jsonschema/src/node.rs`);
  * `schemaPath`/`instancePath` mirror the reference's error locations
  * (`paths.rs:17`: schema_location / instance_path).
  *
  * `predicate` is a null-safe boolean Column: it never evaluates to SQL
  * NULL, true = the row passes this check (three-valued logic is resolved
  * per keyword: non-applicable types pass vacuously, like `minmax.rs:59-65`).
  */
final case class Check(
    keyword: String,
    schemaPath: String,
    instancePath: String,
    priority: Int,
    predicate: Column,
    message: Column,
)

/** One collected annotation source (`evaluation.rs:461-494`
  * iter_annotations): an annotation-producing keyword at a schema
  * location. `gate` is the per-row applicability (target non-null and of
  * the applicable type); emission additionally requires the enclosing
  * schema object's checks to pass (annotations flow only from VALID
  * subschemas). */
final case class Annot(
    keyword: String,
    schemaPath: String,
    instancePath: String,
    valueJson: String,
    gate: Column,
)

/** A pluggable keyword — the analog of the reference's `Keyword` trait +
  * `with_keyword(name, factory)` (`options.rs:438`, `keywords/custom.rs`).
  * `compile` sees the keyword's JSON value and the target column/type and
  * returns a NULL-SAFE predicate (None ⇒ keyword not applicable to this
  * type — annotation-only, like built-ins on foreign types). */
final case class CustomKeyword(
    compile: (JsonValue, Column, DataType) => Option[Column],
    message: JsonValue => String = v => s"custom keyword not satisfied (${JsonValue.render(v)})",
    /** dynamic message column (wins over `message` when set). */
    messageCol: Option[(JsonValue, Column, DataType) => Column] = None,
    /** fail-fast ordering slot (reference keyword_priority table; default
      * just below applicators). */
    priority: Int = 39,
)

/** Compile options — the analog of `ValidationOptions`
  * (`/root/reference/crates/jsonschema/src/options.rs:22-687`). */
final case class CompileOptions(
    /** assert `format` (drafts >= 2019-09 gate this; we default on). */
    validateFormats: Boolean = true,
    /** custom format name → (non-null string col → bool pred); analog of
      * `with_format` (`options.rs:351-377`). */
    customFormats: Map[String, Column => Column] = Map.empty,
    /** custom content encoding → (col, dtype) → bool pred; analog of
      * `with_content_encoding` (`options.rs:185-290`) — the audio hook. */
    customEncodings: Map[String, (Column, DataType) => Column] = Map.empty,
    /** assert content* keywords (contentEncoding/contentMediaType/
      * contentSchema). The 2020-12 spec makes them annotation-only; this
      * engine is a data-VALIDATION engine so it asserts by default —
      * set false for strict official-suite conformance. */
    validateContent: Boolean = true,
    /** redact instance values from violation MESSAGES (paths remain) —
      * the engine-side analog of `ValidationError::masked` (`error.rs`);
      * for shipping violation rows without leaking row contents. */
    maskedErrors: Boolean = false,
    /** custom keyword registry: keyword name → implementation; analog of
      * `with_keyword` (`options.rs:438`). Unregistered unknown keywords
      * stay annotation-only. */
    customKeywords: Map[String, CustomKeyword] = Map.empty,
    /** validate the schema document against the meta-schema before
      * compiling (reference build-time behavior, `compiler.rs:945-966`);
      * applies on the JSON-text entry points. */
    validateSchema: Boolean = true,
)

/** Compiles a [[Spec]] into null-safe Catalyst predicates over a typed
  * table — the analog of `compiler.rs` `build_validator` → `SchemaNode`.
  * All output is pure `Column` composition (whole-stage codegen friendly);
  * checks are ordered cheap-first by the reference's keyword priority
  * table (`keywords/mod.rs:180-259`).
  */
object SpecCompiler {

  /** Reference `keyword_priority` (`keywords/mod.rs:180-259`). */
  val priority: Map[String, Int] = Map(
    "type" -> 1, "const" -> 5, "enum" -> 6,
    "minimum" -> 10, "maximum" -> 11, "exclusiveMinimum" -> 12,
    "exclusiveMaximum" -> 13, "multipleOf" -> 14,
    "minLength" -> 20, "maxLength" -> 21, "minItems" -> 22, "maxItems" -> 23,
    "minProperties" -> 24, "maxProperties" -> 25, "required" -> 26,
    "uniqueItems" -> 27, "dependentRequired" -> 28,
    "pattern" -> 30, "format" -> 31, "contentEncoding" -> 33,
    "contentMediaType" -> 34, "contentSchema" -> 35,
    "properties" -> 40, "patternProperties" -> 41,
    "additionalProperties" -> 42, "propertyNames" -> 43,
    "items" -> 44, "prefixItems" -> 45, "contains" -> 47,
    "dependentSchemas" -> 48,
    "allOf" -> 50, "anyOf" -> 51, "oneOf" -> 52, "not" -> 53, "if" -> 54,
    "unevaluatedProperties" -> 60, "unevaluatedItems" -> 61,
    "$ref" -> 70, "false" -> 0,
  )

  final case class Target(col: Column, dtype: DataType, path: String)

  private final case class Ctx(
      root: Spec,
      opts: CompileOptions,
      refStack: List[(String, String, String)],
      registry: Registry,
      res: Registry.Resource,
      scope: List[Registry.Resource],
      /** shared collector for annotation sources; None inside predOf
        * sub-compiles (a branch predicate is not an assertion site). */
      annots: Option[scala.collection.mutable.Buffer[Annot]] = None,
  )

  /** Crossing an `$id` boundary rebases the resolution context and extends
    * the dynamic scope (compile-time mirror of the reference's evaluation
    * scope — our unrolling makes it static per compile site). */
  private def enter(ctx: Ctx, s: Spec.Obj): Ctx = {
    val r = ctx.registry.resourceOf(s)
    if (r eq ctx.res) ctx else ctx.copy(res = r, scope = ctx.scope :+ r)
  }

  private def rootCtx(spec: Spec, opts: CompileOptions): Ctx = {
    val reg = Registry.build(spec)
    Ctx(spec, opts, Nil, reg, reg.rootResource, List(reg.rootResource))
  }

  /** Compile a spec against a whole table row. The row is modelled as a
    * JSON object whose properties are the columns; Catalyst's
    * `SimplifyExtractValueOps` collapses `struct(cols).getField(c)` back
    * to the plain column, so this costs nothing at runtime. */
  def compileRoot(spec: Spec, schema: StructType,
                  opts: CompileOptions = CompileOptions()): Vector[Check] = {
    val rootCol = struct(schema.fieldNames.toIndexedSeq.map(n => col(quoted(n))): _*)
    val checks = compile(spec, Target(rootCol, schema, ""), "", rootCtx(spec, opts))
    checks.sortBy(_.priority)
  }

  /** compileRoot + collected annotation sources (the `evaluate` /
    * `iter_annotations` inputs). */
  def compileRootFull(spec: Spec, schema: StructType,
                      opts: CompileOptions = CompileOptions()): (Vector[Check], Vector[Annot]) = {
    val rootCol = struct(schema.fieldNames.toIndexedSeq.map(n => col(quoted(n))): _*)
    val buf = scala.collection.mutable.Buffer[Annot]()
    val checks = compile(spec, Target(rootCol, schema, ""), "",
      rootCtx(spec, opts).copy(annots = Some(buf)))
    (checks.sortBy(_.priority), buf.toVector)
  }

  /** Compile a spec against a single column. */
  def compileColumn(spec: Spec, name: String, dtype: DataType,
                    opts: CompileOptions = CompileOptions()): Vector[Check] = {
    val checks = compile(spec, Target(col(quoted(name)), dtype, s"/$name"), "", rootCtx(spec, opts))
    checks.sortBy(_.priority)
  }

  private def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** Conjunction of a spec's checks (the analog of `is_valid` over a
    * subschema). Statically true ⇒ lit(true). */
  private def predOf(spec: Spec, t: Target, ctx: Ctx): Column =
    compile(spec, t, "", ctx.copy(annots = None)).map(_.predicate) match {
      case Vector() => lit(true)
      case ps       => ps.reduce(_ && _)
    }

  private def isTrueLit(c: Column): Boolean =
    graft.functions.exprs.toExpr(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(true, BooleanType) => true
      case _ => false
    }

  // ---- type lattice helpers -------------------------------------------

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isFractional(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }
  private def isNumeric(dt: DataType): Boolean = isIntegral(dt) || isFractional(dt)
  private def isStringish(dt: DataType): Boolean = dt match {
    case StringType | DateType | TimestampType | TimestampNTZType | BinaryType => true
    case _ => false
  }

  /** Masked-aware rendering: instance values become a placeholder when
    * CompileOptions.maskedErrors is set. */
  def renderValue(c: Column, dt: DataType, masked: Boolean): Column =
    if (masked) lit("value") else renderValue(c, dt)

  /** JSON value rendering for error messages (close to serde_json). */
  def renderValue(c: Column, dt: DataType): Column = dt match {
    case StringType => when(c.isNull, lit("null")).otherwise(concat(lit("\""), c, lit("\"")))
    case BinaryType => when(c.isNull, lit("null")).otherwise(concat(lit("<"), lit("binary:"), length(c).cast("string"), lit(" bytes>")))
    case _: ArrayType | _: StructType | _: MapType =>
      when(c.isNull, lit("null")).otherwise(to_json(c))
    case NullType => lit("null")
    case _ => when(c.isNull, lit("null")).otherwise(c.cast("string"))
  }

  private def numLit(n: BigDecimal): Column =
    if (n.isWhole && n.abs <= BigDecimal(Long.MaxValue)) lit(n.toLong)
    else lit(n.underlying())

  private def renderNum(n: BigDecimal): String = JsonValue.render(JNum(n))

  /** Spark literal for a JSON value under a concrete DataType; None if the
    * value is not representable in that type (⇒ can never be equal). */
  def litFor(v: JsonValue, dt: DataType): Option[Column] = (v, dt) match {
    case (JNull, _) => Some(lit(null).cast(dt))
    case (JBool(b), BooleanType) => Some(lit(b))
    case (JStr(s), StringType) => Some(lit(s))
    case (n: JNum, t) if isNumeric(t) =>
      if (isIntegral(t)) {
        if (n.isIntegral && n.value.abs <= BigDecimal(Long.MaxValue)) Some(lit(n.value.toLong).cast(t))
        else None // non-integral const can never equal an integral column
      } else Some(numLit(n.value).cast(t))
    case (JArr(xs), ArrayType(et, _)) =>
      val elems = xs.map(litFor(_, et))
      if (elems.forall(_.isDefined)) Some(array(elems.map(_.get): _*).cast(dt)) else None
    case (o: JObj, st: StructType) =>
      if (o.fields.map(_._1).toSet != st.fieldNames.toSet) None
      else {
        val fields = st.fields.toSeq.map { f =>
          o.get(f.name).flatMap(litFor(_, f.dataType)).map(_.as(f.name))
        }
        if (fields.forall(_.isDefined)) Some(struct(fields.map(_.get): _*)) else None
      }
    case (o: JObj, MapType(StringType, vt, _)) =>
      val entries = o.fields.map { case (k, fv) => litFor(fv, vt).map(lit(k) -> _) }
      if (entries.forall(_.isDefined))
        Some(map(entries.flatMap(e => Seq(e.get._1, e.get._2)): _*))
      else None
    case _ => None
  }

  /** value == v as a null-safe predicate. */
  private def eqValue(c: Column, dt: DataType, v: JsonValue): Column = v match {
    case JNull => c.isNull
    case _ =>
      litFor(v, dt) match {
        case Some(l) => coalesce(c === l, lit(false))
        case None    => lit(false)
      }
  }

  // ---- the compiler ----------------------------------------------------

  private def compile(spec: Spec, t: Target, sp: String, ctx: Ctx): Vector[Check] =
    spec match {
      case Spec.Accept => Vector.empty
      case Spec.Reject =>
        Vector(Check("false", sp, t.path, 0, lit(false),
          concat(lit("False schema does not allow "),
            renderValue(t.col, t.dtype, ctx.opts.maskedErrors))))
      case s: Spec.Obj => compileObj(s, t, sp, ctx)
    }

  private def compileObj(s: Spec.Obj, t: Target, sp: String, ctx0: Ctx): Vector[Check] = {
    val ctx = enter(ctx0, s)
    val c = t.col
    val dt = t.dtype
    val out = Vector.newBuilder[Check]
    def add(kw: String, pred: Column, msg: Column): Unit =
      if (!isTrueLit(pred))
        out += Check(kw, s"$sp/$kw", t.path, priority.getOrElse(kw, 49), pred, msg)
    def rendered: Column = renderValue(c, dt, ctx.opts.maskedErrors)
    // annotation sources (`evaluation.rs:461-494`): collected regardless of
    // whether the keyword also asserts in this engine
    def annotate(kw: String, v: String, applies: Column): Unit =
      ctx.annots.foreach(_ += Annot(kw, s"$sp/$kw", t.path, v, applies))

    if (dt == StringType) {
      s.format.foreach(f => annotate("format", JsonValue.render(JStr(f)), c.isNotNull))
      s.contentEncoding.foreach(e => annotate("contentEncoding", JsonValue.render(JStr(e)), c.isNotNull))
      s.contentMediaType.foreach(m => annotate("contentMediaType", JsonValue.render(JStr(m)), c.isNotNull))
    }
    s.others.foreach { case (name, value) =>
      annotate(name, JsonValue.render(value), c.isNotNull)
    }

    // Inline a resolved reference target with cycle bounding: re-entering
    // the SAME (ref, resource, instance path) means the instance type can't
    // nest further → accept (validator.rs:62-115 analog; the reference
    // bounds at run time, we bound at compile time over the fixed schema).
    def inlineRef(tag: String, r: String, resolved: => (Spec, Ctx)): Unit = {
      val key = (tag + r, ctx.res.uri, t.path)
      if (!ctx.refStack.contains(key)) {
        // an unresolvable ref must fail at BUILD time like the reference
        // (compiler.rs rejects unknown references) — silently compiling to
        // "no checks" would let a typo'd ref disable validation
        val (rs, rctx) = resolved
        out ++= compile(rs, t, refSchemaPath(r), rctx.copy(refStack = key :: ctx.refStack))
      }
    }

    // ---- $ref / $dynamicRef / $recursiveRef (priority 70; `keywords/ref_.rs`) ----
    s.ref.foreach { r => inlineRef("", r, resolveRefOrThrow(r, ctx)) }
    s.dynamicRef.foreach { r =>
      inlineRef("D:", r,
        ctx.registry.resolveDynamic(r, ctx.res, ctx.scope) match {
          case Some((sp2, res)) => (sp2, rebase(ctx, res))
          case None => throw new SpecError(s"unresolvable $$dynamicRef: $r")
        })
    }
    s.recursiveRef.foreach { r =>
      inlineRef("R:", r, {
        val (sp2, res) = ctx.registry.resolveRecursive(ctx.res, ctx.scope)
        (sp2, rebase(ctx, res))
      })
    }

    // ---- type (`keywords/type_.rs`) ----
    s.types.foreach { ts =>
      val nullOk = ts.contains(JsonType.Null)
      val nonNull: Column = dt match {
        case NullType => lit(false)
        case d if isIntegral(d) =>
          lit(ts.contains(JsonType.Integer) || ts.contains(JsonType.Number))
        case d if isFractional(d) =>
          if (ts.contains(JsonType.Number)) lit(true)
          else if (ts.contains(JsonType.Integer))
            // 1.0 counts as integer (types.rs:192-204)
            coalesce((c % lit(1)) === lit(0), lit(false))
          else lit(false)
        case d if isStringish(d) => lit(ts.contains(JsonType.String))
        case BooleanType => lit(ts.contains(JsonType.Boolean))
        case _: ArrayType => lit(ts.contains(JsonType.Array))
        case _: StructType | _: MapType => lit(ts.contains(JsonType.Object))
        case _ => lit(false)
      }
      val pred = when(c.isNull, lit(nullOk)).otherwise(nonNull)
      val tsNames = ts.toSeq.map(_.name).sorted
      val msg =
        if (ts.size == 1) concat(rendered, lit(s""" is not of type "${tsNames.head}""""))
        else concat(rendered, lit(s" is not of types " + tsNames.map(n => s""""$n"""").mkString(", ")))
      add("type", pred, msg)
    }

    // ---- const (`keywords/const_.rs`) ----
    s.const.foreach { v =>
      add("const", eqValue(c, dt, v),
        lit(s"${JsonValue.render(v)} was expected"))
    }

    // ---- enum (`keywords/enum_.rs`) ----
    s.enumVals.foreach { vs =>
      val nullOk = vs.exists(_ == JNull)
      val nonNullPred: Column = {
        // string fast path → isin (Catalyst OptimizeIn handles InSet)
        val strs = vs.collect { case JStr(x) => x }
        if (dt == StringType && strs.length == vs.count(_ != JNull))
          if (strs.isEmpty) lit(false)
          else coalesce(c.isin(strs: _*), lit(false))
        else {
          val eqs = vs.filter(_ != JNull).map(eqValue(c, dt, _))
          if (eqs.isEmpty) lit(false) else eqs.reduce(_ || _)
        }
      }
      val pred = when(c.isNull, lit(nullOk)).otherwise(nonNullPred)
      val optionsTxt = vs.map(JsonValue.render).mkString(", ")
      add("enum", pred, concat(rendered, lit(s" is not one of $optionsTxt")))
    }

    // ---- numeric bounds (`keywords/minmax.rs`) ----
    if (isNumeric(dt)) {
      s.minimum.foreach(m => add("minimum",
        coalesce(c >= numLit(m), lit(true)),
        concat(rendered, lit(s" is less than the minimum of ${renderNum(m)}"))))
      s.maximum.foreach(m => add("maximum",
        coalesce(c <= numLit(m), lit(true)),
        concat(rendered, lit(s" is greater than the maximum of ${renderNum(m)}"))))
      s.exclusiveMinimum.foreach(m => add("exclusiveMinimum",
        coalesce(c > numLit(m), lit(true)),
        concat(rendered, lit(s" is less than or equal to the minimum of ${renderNum(m)}"))))
      s.exclusiveMaximum.foreach(m => add("exclusiveMaximum",
        coalesce(c < numLit(m), lit(true)),
        concat(rendered, lit(s" is greater than or equal to the maximum of ${renderNum(m)}"))))
      // multipleOf (`keywords/multiple_of.rs`): integral fast path, else an
      // exact compiled kernel over the f64 values (BigFraction-of-f64
      // semantics, `jsonschema-value/src/numeric.rs:126-151`) — a
      // DecimalType(38,15) cast would overflow to null at |x| >= 1e23 and
      // silently accept, and round away >15 fractional digits.
      s.multipleOf.foreach { m =>
        val pred =
          if (isIntegral(dt) && m.isWhole && m.abs <= BigDecimal(Long.MaxValue))
            coalesce((c % lit(m.toLong)) === lit(0), lit(true))
          else
            coalesce(graft.functions.exprs.is_multiple_of(c.cast(DoubleType), m.toDouble), lit(true))
        add("multipleOf", pred, concat(rendered, lit(s" is not a multiple of ${renderNum(m)}")))
      }
    }

    // ---- string checks ----
    if (dt == StringType) {
      s.minLength.foreach(n => add("minLength",
        coalesce(length(c) >= lit(n), lit(true)),
        concat(rendered, lit(s" is shorter than $n character${plural(n)}"))))
      s.maxLength.foreach(n => add("maxLength",
        coalesce(length(c) <= lit(n), lit(true)),
        concat(rendered, lit(s" is longer than $n character${plural(n)}"))))
      s.pattern.foreach { p =>
        val jre = EcmaRegex.compile(p)
        add("pattern", coalesce(c.rlike(jre), lit(true)),
          concat(rendered, lit(s""" does not match "$p"""")))
      }
      if (ctx.opts.validateFormats) s.format.foreach { f =>
        val predOpt = ctx.opts.customFormats.get(f).map(_(c)).orElse(Formats.predicate(f, c))
        predOpt.foreach { p =>
          add("format", when(c.isNull, lit(true)).otherwise(coalesce(p, lit(false))),
            concat(rendered, lit(s""" is not a "$f"""")))
        }
      }
      if (ctx.opts.validateContent) {
        s.contentEncoding.foreach { enc =>
          val predOpt: Option[Column] = ctx.opts.customEncodings.get(enc).map(_(c, dt)).orElse {
            enc match {
              case "base64" => Some(try_to_binary(c, lit("base64")).isNotNull)
              case "base64url" =>
                Some(try_to_binary(translate(c, "-_", "+/"), lit("base64")).isNotNull)
              case "base16" => Some(try_to_binary(c, lit("hex")).isNotNull)
              case "base32" | "base32hex" =>
                Some(graft.functions.exprs.base32_valid(c, enc == "base32hex"))
              case _ => None
            }
          }
          predOpt.foreach { p =>
            add("contentEncoding", when(c.isNull, lit(true)).otherwise(coalesce(p, lit(false))),
              concat(rendered, lit(s""" is not compliant with "$enc" content encoding""")))
          }
        }
        // decoded view of the content for media-type/schema checks
        def decoded: Column = s.contentEncoding match {
          case Some("base64") => try_to_binary(c, lit("base64")).cast(StringType)
          case Some("base64url") => try_to_binary(translate(c, "-_", "+/"), lit("base64")).cast(StringType)
          case Some("base16") => try_to_binary(c, lit("hex")).cast(StringType)
          case _ => c
        }
        s.contentMediaType.foreach {
          case "application/json" =>
            add("contentMediaType",
              when(c.isNull, lit(true)).otherwise(try_parse_json(decoded).isNotNull),
              concat(rendered, lit(s""" is not compliant with "application/json" media type""")))
          case _ => ()
        }
        // contentSchema (`keywords/content.rs:432-494`): applies only when
        // contentMediaType is present (spec rule); we can only decode JSON
        s.contentSchema.foreach { cs =>
          if (s.contentMediaType.contains("application/json")) {
            val prepared = Interp.prepareAt(ctx.root, cs)
            val pred = graft.functions.exprs.content_schema_valid(decoded, prepared)
            add("contentSchema",
              when(c.isNull, lit(true)).otherwise(coalesce(pred, lit(true))),
              concat(rendered, lit(" does not satisfy the contentSchema")))
          }
        }
      }
    } else if (dt == BinaryType && ctx.opts.validateContent) {
      // binary payload: contentEncoding via custom registry (audio hook)
      s.contentEncoding.foreach { enc =>
        ctx.opts.customEncodings.get(enc).foreach { f =>
          add("contentEncoding", when(c.isNull, lit(true)).otherwise(coalesce(f(c, dt), lit(false))),
            concat(rendered, lit(s""" is not compliant with "$enc" content encoding""")))
        }
      }
    }

    // ---- object applicators ----
    dt match {
      case st: StructType => compileStructObj(s, t, st, sp, ctx, out)
      case MapType(StringType, vt, _) => compileMapObj(s, t, vt, sp, ctx, out)
      case _ => ()
    }

    // ---- array applicators ----
    dt match {
      case ArrayType(et, _) => compileArray(s, t, et, sp, ctx, out)
      case _ => ()
    }

    // ---- combinators (`keywords/{all_of,any_of,one_of,not,if_}.rs`) ----
    s.allOf.zipWithIndex.foreach { case (sub, i) =>
      // conjunction: inline each branch's checks (per-branch errors,
      // like the reference evaluating every allOf member)
      out ++= compile(sub, t, s"$sp/allOf/$i", ctx)
    }
    if (s.anyOf.nonEmpty) {
      val pred = s.anyOf.map(predOf(_, t, ctx)).reduce(_ || _)
      add("anyOf", pred,
        concat(rendered, lit(" is not valid under any of the schemas listed in the 'anyOf' keyword")))
    }
    if (s.oneOf.nonEmpty) {
      val counts = s.oneOf.map(predOf(_, t, ctx).cast(IntegerType)).reduce(_ + _)
      add("oneOf", counts === lit(1),
        when(counts === lit(0),
          concat(rendered, lit(" is not valid under any of the schemas listed in the 'oneOf' keyword")))
          .otherwise(concat(rendered, lit(" is valid under more than one of the schemas listed in the 'oneOf' keyword"))))
    }
    s.not.foreach { sub =>
      add("not", !predOf(sub, t, ctx),
        concat(lit("{...} is not allowed for "), rendered))
    }
    s.ifSpec.foreach { i =>
      val ip = predOf(i, t, ctx)
      val tp = s.thenSpec.map(predOf(_, t, ctx)).getOrElse(lit(true))
      val ep = s.elseSpec.map(predOf(_, t, ctx)).getOrElse(lit(true))
      add("if", when(ip, tp).otherwise(ep),
        concat(rendered, lit(" does not satisfy the if/then/else conditional")))
    }

    // ---- custom keywords (`keywords/custom.rs`, `options.rs:438`) ----
    s.others.foreach { case (name, value) =>
      ctx.opts.customKeywords.get(name).foreach { ck =>
        ck.compile(value, c, dt).foreach { p =>
          val msg = ck.messageCol.map(f => f(value, c, dt))
            .getOrElse(concat(rendered, lit(" " + ck.message(value))))
          out += Check(name, s"$sp/$name", t.path, ck.priority,
            when(c.isNull, lit(true)).otherwise(coalesce(p, lit(false))), msg)
        }
      }
    }

    out.result()
  }

  private def plural(n: Long): String = if (n == 1) "" else "s"

  private def refSchemaPath(r: String): String =
    if (r.startsWith("#")) r.stripPrefix("#") else s"/$$ref(${r})"

  private def rebase(ctx: Ctx, r: Registry.Resource): Ctx =
    if (r eq ctx.res) ctx else ctx.copy(res = r, scope = ctx.scope :+ r)

  private def resolveRefOrThrow(r: String, ctx: Ctx): (Spec, Ctx) =
    ctx.registry.resolve(r, ctx.res) match {
      case Some((s, res)) => (s, rebase(ctx, res))
      case None => throw new SpecError(
        s"unresolvable $$ref: $r (remote retrieval is unsupported — bundle external resources into the document)")
    }

  /** Non-throwing resolution for annotation-coverage walks (compile of the
    * ref itself already threw if unresolvable). */
  private def resolveRefOpt(r: String, ctx: Ctx): Option[(Spec, Ctx)] =
    ctx.registry.resolve(r, ctx.res).map { case (s, res) => (s, rebase(ctx, res)) }

  // ---- object keywords over a StructType (static field set) -----------

  private def compileStructObj(s: Spec.Obj, t: Target, st: StructType, sp: String,
                               ctx: Ctx, out: scala.collection.mutable.Builder[Check, Vector[Check]]): Unit = {
    val c = t.col
    def field(name: String): Option[StructField] = st.fields.find(_.name == name)
    def fieldCol(name: String): Column = c.getField(name)
    def rendered: Column = renderValue(c, t.dtype, ctx.opts.maskedErrors)
    def add(kw: String, pred: Column, msg: Column): Unit =
      if (!isTrueLit(pred))
        out += Check(kw, s"$sp/$kw", t.path, priority.getOrElse(kw, 49), pred, msg)
    // Presence model for relational data: a property is "present" iff the
    // field exists in the schema AND is non-null (SURVEY §1.2: presence =
    // non-null); NullType fields (suite-built rows) count as present.
    def present(name: String): Column = field(name) match {
      case None => lit(false)
      case Some(f) if f.dataType == NullType => c.isNotNull
      case Some(_) => c.isNotNull && fieldCol(name).isNotNull
    }
    // Wrap a nested check so a null outer object passes vacuously.
    def outerNullSafe(p: Column): Column =
      if (isTrueLit(p)) p else when(c.isNull, lit(true)).otherwise(p)

    s.required.foreach { r =>
      add("required", outerNullSafe(present(r)), lit(s""""$r" is a required property"""))
    }
    val presentCount: Column =
      if (st.fields.isEmpty) lit(0)
      else st.fields.toSeq.map(f => present(f.name).cast(IntegerType)).reduce(_ + _)
    s.minProperties.foreach(n => add("minProperties",
      outerNullSafe(presentCount >= lit(n)),
      concat(rendered, lit(s" has less than $n propert${if (n == 1) "y" else "ies"}"))))
    s.maxProperties.foreach(n => add("maxProperties",
      outerNullSafe(presentCount <= lit(n)),
      concat(rendered, lit(s" has more than $n propert${if (n == 1) "y" else "ies"}"))))

    def compileField(name: String, sub: Spec, subSp: String): Unit =
      field(name).foreach { f =>
        val nested = compile(sub, Target(fieldCol(name), f.dataType, s"${t.path}/$name"), subSp, ctx)
        out ++= nested.map(ch => ch.copy(predicate = outerNullSafe(ch.predicate)))
      }

    s.properties.foreach { case (name, sub) =>
      compileField(name, sub, s"$sp/properties/$name")
    }
    s.patternProperties.foreach { case (pat, sub) =>
      val re = java.util.regex.Pattern.compile(EcmaRegex.compile(pat))
      st.fieldNames.filter(n => re.matcher(n).find()).foreach { n =>
        compileField(n, sub, s"$sp/patternProperties/$pat")
      }
    }
    s.additionalProperties.foreach { ap =>
      val propNames = s.properties.map(_._1).toSet
      val pats = s.patternProperties.map(p =>
        java.util.regex.Pattern.compile(EcmaRegex.compile(p._1)))
      val extra = st.fieldNames.filterNot(n =>
        propNames.contains(n) || pats.exists(_.matcher(n).find()))
      ap match {
        case Spec.Reject =>
          // "no additional": presence of any extra field is a violation
          extra.foreach { n =>
            add("additionalProperties", outerNullSafe(!present(n)),
              lit(s"""Additional properties are not allowed ('$n' was unexpected)"""))
          }
        case sub =>
          extra.foreach(n => compileField(n, sub, s"$sp/additionalProperties"))
      }
    }
    s.propertyNames.foreach { pn =>
      // field names are static ⇒ evaluate at compile time via the
      // reference-faithful interpreter. An invalid name only fails rows
      // where that field is PRESENT (presence = non-null) — consistent
      // with additionalProperties:false.
      st.fieldNames.filterNot(n => Interp.isValid(pn, JStr(n))).foreach { n =>
        add("propertyNames", outerNullSafe(!present(n)),
          lit(s""""$n" is not a valid property name"""))
      }
    }
    s.dependentRequired.foreach { case (key, deps) =>
      val pred = when(present(key), deps.map(present).foldLeft(lit(true))(_ && _))
        .otherwise(lit(true))
      add("dependentRequired", outerNullSafe(pred),
        lit(s"""dependencies of "$key" are missing: ${deps.mkString(", ")}"""))
    }
    s.dependentSchemas.foreach { case (key, sub) =>
      val pred = when(present(key), predOf(sub, t, ctx)).otherwise(lit(true))
      add("dependentSchemas", outerNullSafe(pred),
        concat(rendered, lit(s""" does not satisfy the schema dependent on "$key"""")))
    }

    // ---- unevaluatedProperties (`keywords/unevaluated_properties.rs`) —
    // a property is "evaluated" if matched by properties /
    // patternProperties / additionalProperties at this level, or by any
    // in-place applicator branch that successfully applies (annotations
    // flow only from valid subschemas). Static field set ⇒ the branch
    // conditions are the only dynamic part.
    s.unevaluatedProperties.foreach { usub =>
      st.fieldNames.foreach { f =>
        val cond = evaluatedCond(s, t, st, f, ctx, includeSelfUneval = false)
        if (!isTrueLit(cond)) {
          val pred = usub match {
            case Spec.Reject => cond || !present(f)
            case sub =>
              val subPred = compile(sub,
                Target(fieldCol(f), field(f).get.dataType, s"${t.path}/$f"),
                s"$sp/unevaluatedProperties", ctx)
                .map(_.predicate).foldLeft(lit(true))(_ && _)
              cond || subPred
          }
          add("unevaluatedProperties", outerNullSafe(pred),
            lit(s"""Unevaluated properties are not allowed ('$f' was unexpected)"""))
        }
      }
    }
  }

  /** Is field `f` evaluated by schema `s` (applied to target `t`)?
    * `includeSelfUneval=false` at the level whose own unevaluatedProperties
    * is being compiled (it applies to the leftovers, it doesn't cover). */
  private def evaluatedCond(s: Spec.Obj, t: Target, st: StructType,
                            f: String, ctx: Ctx,
                            includeSelfUneval: Boolean = true,
                            visited: List[Spec.Obj] = Nil): Column = {
    // identity-based bounding: revisiting the same schema node at the SAME
    // target is a fixpoint — contribute "not evaluated" (conservative for
    // recursive $dynamicRef chains; the instance can't nest further)
    if (visited.exists(_ eq s)) return lit(false)
    val vis = s :: visited
    def branchCondIn(sub: Spec, bctx: Ctx): Column = sub match {
      case Spec.Accept => lit(false)
      case Spec.Reject => lit(false)
      case o: Spec.Obj =>
        val evaluatesF = evaluatedCond(o, t, st, f, enter(bctx, o), includeSelfUneval = true, vis)
        if (isTrueLit(evaluatesF)) predOf(sub, t, bctx)
        else predOf(sub, t, bctx) && evaluatesF
      case _ => lit(false)
    }
    def branchCond(sub: Spec): Column = branchCondIn(sub, ctx)
    val static =
      s.properties.exists(_._1 == f) ||
      s.patternProperties.exists { case (p, _) =>
        java.util.regex.Pattern.compile(EcmaRegex.compile(p)).matcher(f).find()
      } ||
      s.additionalProperties.nonEmpty ||
      (includeSelfUneval && s.unevaluatedProperties.nonEmpty)
    if (static) lit(true)
    else {
      val branches = Vector.newBuilder[Column]
      s.allOf.foreach(b => branches += branchCond(b))
      s.anyOf.foreach(b => branches += branchCond(b))
      s.oneOf.foreach(b => branches += branchCond(b))
      s.ref.flatMap(resolveRefOpt(_, ctx)).foreach { case (r, rc) => branches += branchCondIn(r, rc) }
      s.dynamicRef.flatMap(r => ctx.registry.resolveDynamic(r, ctx.res, ctx.scope))
        .foreach { case (r, res) => branches += branchCondIn(r, rebase(ctx, res)) }
      s.recursiveRef.foreach { _ =>
        val (r, res) = ctx.registry.resolveRecursive(ctx.res, ctx.scope)
        branches += branchCondIn(r, rebase(ctx, res))
      }
      s.ifSpec.foreach { i =>
        val ip = predOf(i, t, ctx)
        branches += branchCond(i)
        s.thenSpec.foreach(th => branches += (ip && branchCond(th)))
        s.elseSpec.foreach(el => branches += (!ip && branchCond(el)))
      }
      s.dependentSchemas.foreach { case (_, sub) => branches += branchCond(sub) }
      val bs = branches.result().filterNot(c =>
        graft.functions.exprs.toExpr(c) ==
          org.apache.spark.sql.catalyst.expressions.Literal(false,
            org.apache.spark.sql.types.BooleanType))
      if (bs.isEmpty) lit(false) else bs.reduce(_ || _)
    }
  }

  // ---- object keywords over a MapType column (dynamic keys) -----------

  private def compileMapObj(s: Spec.Obj, t: Target, vt: DataType, sp: String,
                            ctx: Ctx, out: scala.collection.mutable.Builder[Check, Vector[Check]]): Unit = {
    val c = t.col
    def rendered: Column = renderValue(c, t.dtype, ctx.opts.maskedErrors)
    def add(kw: String, pred: Column, msg: Column): Unit =
      if (!isTrueLit(pred))
        out += Check(kw, s"$sp/$kw", t.path, priority.getOrElse(kw, 49), pred, msg)
    def ns(p: Column): Column = when(c.isNull, lit(true)).otherwise(coalesce(p, lit(false)))
    def valuePred(sub: Spec): Column => Column = { v =>
      predOf(sub, Target(v, vt, s"${t.path}/*"), ctx)
    }

    s.required.foreach { r =>
      add("required", ns(map_contains_key(c, lit(r))), lit(s""""$r" is a required property"""))
    }
    s.minProperties.foreach(n => add("minProperties", ns(size(c) >= lit(n)),
      concat(rendered, lit(s" has less than $n propert${if (n == 1) "y" else "ies"}"))))
    s.maxProperties.foreach(n => add("maxProperties", ns(size(c) <= lit(n)),
      concat(rendered, lit(s" has more than $n propert${if (n == 1) "y" else "ies"}"))))
    s.properties.foreach { case (name, sub) =>
      val p = when(!map_contains_key(c, lit(name)), lit(true))
        .otherwise(valuePred(sub)(element_at(c, lit(name))))
      add("properties", ns(p),
        concat(lit(s"property \"$name\" of "), rendered, lit(" is invalid")))
    }
    s.patternProperties.foreach { case (pat, sub) =>
      val jre = EcmaRegex.compile(pat)
      val p = forall(map_values(map_filter(c, (k, _) => k.rlike(jre))), valuePred(sub))
      add("patternProperties", ns(p),
        concat(lit(s"""properties matching "$pat" of """), rendered, lit(" are invalid")))
    }
    s.additionalProperties.foreach { ap =>
      val names = s.properties.map(_._1)
      val pats = s.patternProperties.map(p => EcmaRegex.compile(p._1))
      def isExtra(k: Column): Column = {
        val notNamed = if (names.isEmpty) lit(true) else !k.isin(names: _*)
        val notPat = pats.map(p => !k.rlike(p)).foldLeft(lit(true))(_ && _)
        notNamed && notPat
      }
      val p = ap match {
        case Spec.Reject => size(map_filter(c, (k, _) => isExtra(k))) === lit(0)
        case sub => forall(map_values(map_filter(c, (k, _) => isExtra(k))), valuePred(sub))
      }
      add("additionalProperties", ns(p),
        lit("Additional properties are not allowed"))
    }
    s.propertyNames.foreach { pn =>
      val p = forall(map_keys(c), k => predOf(pn, Target(k, StringType, s"${t.path}/<key>"), ctx))
      add("propertyNames", ns(p), concat(lit("a property name of "), rendered, lit(" is invalid")))
    }
    s.dependentRequired.foreach { case (key, deps) =>
      val p = when(map_contains_key(c, lit(key)),
        deps.map(d => map_contains_key(c, lit(d))).foldLeft(lit(true))(_ && _))
        .otherwise(lit(true))
      add("dependentRequired", ns(p),
        lit(s"""dependencies of "$key" are missing: ${deps.mkString(", ")}"""))
    }
    s.dependentSchemas.foreach { case (key, sub) =>
      val p = when(map_contains_key(c, lit(key)), predOf(sub, t, ctx)).otherwise(lit(true))
      add("dependentSchemas", ns(p),
        concat(rendered, lit(s""" does not satisfy the schema dependent on "$key"""")))
    }
  }

  // ---- array keywords (`keywords/items.rs` et al.) ---------------------

  private def compileArray(s: Spec.Obj, t: Target, et: DataType, sp: String,
                           ctx: Ctx, out: scala.collection.mutable.Builder[Check, Vector[Check]]): Unit = {
    val c = t.col
    def rendered: Column = renderValue(c, t.dtype, ctx.opts.maskedErrors)
    def add(kw: String, pred: Column, msg: Column): Unit =
      if (!isTrueLit(pred))
        out += Check(kw, s"$sp/$kw", t.path, priority.getOrElse(kw, 49), pred, msg)
    def ns(p: Column): Column = when(c.isNull, lit(true)).otherwise(coalesce(p, lit(false)))
    def elemPred(sub: Spec): Column => Column = { x =>
      predOf(sub, Target(x, et, s"${t.path}/*"), ctx)
    }

    s.minItems.foreach(n => add("minItems", ns(size(c) >= lit(n)),
      concat(rendered, lit(s" has less than $n item${plural(n)}"))))
    s.maxItems.foreach(n => add("maxItems", ns(size(c) <= lit(n)),
      concat(rendered, lit(s" has more than $n item${plural(n)}"))))
    if (s.uniqueItems) {
      // JSON-equality dedup (`unique.rs:57-100`) — Spark array_distinct
      // uses type-level equality, equivalent under a uniform element type
      add("uniqueItems", ns(size(array_distinct(c)) === size(c)),
        concat(rendered, lit(" has non-unique elements")))
    }
    val nPrefix = s.prefixItems.length
    s.prefixItems.zipWithIndex.foreach { case (sub, i) =>
      val p = when(size(c) <= lit(i), lit(true))
        .otherwise(elemPred(sub)(element_at(c, lit(i + 1))))
      add("prefixItems", ns(p),
        concat(lit(s"item $i of "), rendered, lit(" does not match the prefixItems schema")))
    }
    // items/contains element loops go through the codegen-capable
    // ForallElems/CountTrueElems kernels (graft.functions.arrexprs):
    // Spark's forall/filter HOFs have no codegen, and one of them evicted
    // the WHOLE per-check aggregation from WholeStageCodegen (r06 plan
    // audit). The builders fall back to the plain HOFs whenever the bound
    // element predicate needs analyzer coercion, so results are identical.
    val containsNull = t.dtype match {
      case ArrayType(_, n) => n
      case _ => true
    }
    s.items.foreach { sub =>
      val body =
        if (nPrefix == 0)
          graft.functions.arrexprs.forall_elems(c, et, containsNull, elemPred(sub))
        else when(size(c) <= lit(nPrefix), lit(true))
          .otherwise(graft.functions.arrexprs.forall_elems(
            slice(c, lit(nPrefix + 1), size(c) - lit(nPrefix)), et, containsNull,
            elemPred(sub)))
      add("items", ns(body),
        concat(lit("items of "), rendered, lit(" do not match the items schema")))
    }
    if (s.contains.nonEmpty || s.minContains.nonEmpty || s.maxContains.nonEmpty) {
      s.contains.foreach { sub =>
        val cnt = graft.functions.arrexprs.count_true(c, et, containsNull, elemPred(sub))
        val minC = s.minContains.getOrElse(1L)
        val p = (cnt >= lit(minC)) && s.maxContains.map(mx => cnt <= lit(mx)).getOrElse(lit(true))
        add("contains", ns(p),
          concat(lit("None of "), rendered, lit(" are valid under the given schema")))
      }
    }

    // ---- unevaluatedItems (`keywords/unevaluated_items.rs`) — an element
    // is evaluated if covered by prefixItems/items/contains at this level
    // or by a successfully-applied in-place branch; the leftover elements
    // must satisfy the unevaluatedItems subschema.
    s.unevaluatedItems.foreach { usub =>
      val cov = itemCoverage(s, t, et, ctx, includeSelfUneval = false)
      val uPred: Column => Column = usub match {
        case Spec.Reject => _ => lit(false)
        case sub => elemPred(sub)
      }
      def containsMatch(x: Column): Column =
        cov.containsConds.map { case (cond, p) => cond && p(x) }
          .foldLeft(lit(false))(_ || _)
      val leftover = filter(c, (x, i) => i >= cov.prefixLen && !containsMatch(x))
      val p = cov.allCovered || forall(leftover, uPred)
      add("unevaluatedItems", ns(p),
        concat(lit("Unevaluated items are not allowed in "), rendered))
    }
  }

  private final case class ItemCoverage(allCovered: Column, prefixLen: Column,
                                        containsConds: Vector[(Column, Column => Column)])

  /** Which elements of the array target does schema `s` evaluate? */
  private def itemCoverage(s: Spec.Obj, t: Target, et: DataType, ctx: Ctx,
                           includeSelfUneval: Boolean = true,
                           visited: List[Spec.Obj] = Nil): ItemCoverage = {
    if (visited.exists(_ eq s)) // fixpoint for recursive ref chains
      return ItemCoverage(lit(false), lit(0), Vector.empty)
    val vis = s :: visited
    var all: Column = lit(s.items.nonEmpty ||
      (includeSelfUneval && s.unevaluatedItems.nonEmpty))
    var prefix: Column = lit(s.prefixItems.length)
    var conds = Vector.newBuilder[(Column, Column => Column)]
    s.contains.foreach { sub =>
      conds += ((lit(true), (x: Column) => predOf(sub, Target(x, et, s"${t.path}/*"), ctx)))
    }
    def addBranchIn(b: Spec, extraCond: Option[Column], bctx: Ctx): Unit = b match {
      case o: Spec.Obj =>
        val applies = extraCond match {
          case Some(e) => e && predOf(b, t, bctx)
          case None => predOf(b, t, bctx)
        }
        val sub = itemCoverage(o, t, et, enter(bctx, o), includeSelfUneval = true, vis)
        all = all || (applies && sub.allCovered)
        prefix = greatest(prefix, when(applies, sub.prefixLen).otherwise(lit(0)))
        sub.containsConds.foreach { case (cnd, p) => conds += ((applies && cnd, p)) }
      case _ => ()
    }
    def addBranch(b: Spec, extraCond: Option[Column]): Unit = addBranchIn(b, extraCond, ctx)
    s.allOf.foreach(addBranch(_, None))
    s.anyOf.foreach(addBranch(_, None))
    s.oneOf.foreach(addBranch(_, None))
    s.ref.flatMap(resolveRefOpt(_, ctx)).foreach { case (r, rc) => addBranchIn(r, None, rc) }
    s.dynamicRef.flatMap(r => ctx.registry.resolveDynamic(r, ctx.res, ctx.scope))
      .foreach { case (r, res) => addBranchIn(r, None, rebase(ctx, res)) }
    s.recursiveRef.foreach { _ =>
      val (r, res) = ctx.registry.resolveRecursive(ctx.res, ctx.scope)
      addBranchIn(r, None, rebase(ctx, res))
    }
    s.ifSpec.foreach { i =>
      val ip = predOf(i, t, ctx)
      addBranch(i, None)
      s.thenSpec.foreach(addBranch(_, Some(ip)))
      s.elseSpec.foreach(addBranch(_, Some(!ip)))
    }
    s.dependentSchemas.foreach { case (_, sub) => addBranch(sub, None) }
    ItemCoverage(all, prefix, conds.result())
  }
}
