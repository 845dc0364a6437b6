package graft.spec

/** Meta-schema validation — the analog of the reference validating every
  * schema against its meta-schema before compilation
  * (`/root/reference/crates/jsonschema/src/compiler.rs:945-966`; public
  * `meta` module `lib.rs:1705`). The meta-schema below is a SELF-CONTAINED
  * single-dialect rendering of the 2020-12 core+validation vocabulary
  * keyword shapes (the official meta-schema splits them across vocabulary
  * resources; we fix one dialect, SURVEY §7 non-goals) — and it is itself
  * validated by this engine's own interpreter, so `meta.validate` is the
  * engine eating its own dog food. */
object Meta {

  val metaSchemaJson: String = """{
    "$id": "https://graft.example/meta/dialect",
    "$ref": "#/$defs/schema",
    "$defs": {
      "schema": {
        "anyOf": [ {"type": "boolean"}, {"$ref": "#/$defs/schemaObject"} ]
      },
      "schemaArray": {
        "type": "array", "minItems": 1, "items": {"$ref": "#/$defs/schema"}
      },
      "schemaMap": {
        "type": "object", "additionalProperties": {"$ref": "#/$defs/schema"}
      },
      "stringArray": {
        "type": "array", "items": {"type": "string"}
      },
      "nonNegativeInteger": {"type": "integer", "minimum": 0},
      "simpleType": {
        "enum": ["null", "boolean", "integer", "number", "string", "array", "object"]
      },
      "schemaObject": {
        "type": "object",
        "properties": {
          "$id": {"type": "string", "format": "uri-reference"},
          "$schema": {"type": "string", "format": "uri"},
          "$ref": {"type": "string", "format": "uri-reference"},
          "$anchor": {"type": "string", "pattern": "^[A-Za-z_][-A-Za-z0-9._]*$"},
          "$dynamicRef": {"type": "string", "format": "uri-reference"},
          "$dynamicAnchor": {"type": "string", "pattern": "^[A-Za-z_][-A-Za-z0-9._]*$"},
          "$recursiveRef": {"type": "string", "format": "uri-reference"},
          "$recursiveAnchor": {"type": "boolean"},
          "$comment": {"type": "string"},
          "$defs": {"$ref": "#/$defs/schemaMap"},
          "definitions": {"$ref": "#/$defs/schemaMap"},

          "type": {
            "anyOf": [
              {"$ref": "#/$defs/simpleType"},
              {"type": "array", "items": {"$ref": "#/$defs/simpleType"},
               "minItems": 1, "uniqueItems": true}
            ]
          },
          "enum": {"type": "array"},
          "multipleOf": {"type": "number", "exclusiveMinimum": 0},
          "maximum": {"type": "number"},
          "exclusiveMaximum": {"type": "number"},
          "minimum": {"type": "number"},
          "exclusiveMinimum": {"type": "number"},
          "maxLength": {"$ref": "#/$defs/nonNegativeInteger"},
          "minLength": {"$ref": "#/$defs/nonNegativeInteger"},
          "pattern": {"type": "string", "format": "regex"},
          "format": {"type": "string"},

          "maxItems": {"$ref": "#/$defs/nonNegativeInteger"},
          "minItems": {"$ref": "#/$defs/nonNegativeInteger"},
          "uniqueItems": {"type": "boolean"},
          "maxContains": {"$ref": "#/$defs/nonNegativeInteger"},
          "minContains": {"$ref": "#/$defs/nonNegativeInteger"},
          "items": {"$ref": "#/$defs/schema"},
          "prefixItems": {"$ref": "#/$defs/schemaArray"},
          "additionalItems": {"$ref": "#/$defs/schema"},
          "contains": {"$ref": "#/$defs/schema"},
          "unevaluatedItems": {"$ref": "#/$defs/schema"},

          "maxProperties": {"$ref": "#/$defs/nonNegativeInteger"},
          "minProperties": {"$ref": "#/$defs/nonNegativeInteger"},
          "required": {"$ref": "#/$defs/stringArray"},
          "properties": {"$ref": "#/$defs/schemaMap"},
          "patternProperties": {"$ref": "#/$defs/schemaMap"},
          "additionalProperties": {"$ref": "#/$defs/schema"},
          "propertyNames": {"$ref": "#/$defs/schema"},
          "dependentRequired": {
            "type": "object", "additionalProperties": {"$ref": "#/$defs/stringArray"}
          },
          "dependentSchemas": {"$ref": "#/$defs/schemaMap"},
          "dependencies": {
            "type": "object",
            "additionalProperties": {
              "anyOf": [ {"$ref": "#/$defs/schema"}, {"$ref": "#/$defs/stringArray"} ]
            }
          },
          "unevaluatedProperties": {"$ref": "#/$defs/schema"},

          "allOf": {"$ref": "#/$defs/schemaArray"},
          "anyOf": {"$ref": "#/$defs/schemaArray"},
          "oneOf": {"$ref": "#/$defs/schemaArray"},
          "not": {"$ref": "#/$defs/schema"},
          "if": {"$ref": "#/$defs/schema"},
          "then": {"$ref": "#/$defs/schema"},
          "else": {"$ref": "#/$defs/schema"},

          "contentEncoding": {"type": "string"},
          "contentMediaType": {"type": "string"},
          "contentSchema": {"$ref": "#/$defs/schema"},

          "title": {"type": "string"},
          "description": {"type": "string"},
          "deprecated": {"type": "boolean"},
          "readOnly": {"type": "boolean"},
          "writeOnly": {"type": "boolean"},
          "examples": {"type": "array"}
        }
      }
    }
  }"""

  lazy val metaSchema: Spec = Spec.parseJson(metaSchemaJson)
  private lazy val prepared = Interp.prepare(metaSchema)

  /** Is `schemaDoc` a structurally valid schema under this dialect? */
  def isValid(schemaDoc: JsonValue): Boolean = prepared.isValid(schemaDoc)

  def isValidJson(schemaText: String): Boolean = isValid(JsonValue.parse(schemaText))

  /** Fail-fast check, the build-time behavior of the reference compiler. */
  def check(schemaDoc: JsonValue): Unit =
    if (!isValid(schemaDoc))
      throw new SpecError("schema does not validate against the meta-schema")

  // ---- the REAL draft 2020-12 meta-schema (vendored spec documents) ----

  private def resource(name: String): JsonValue = {
    val in = getClass.getResourceAsStream(s"/metaschema-2020-12/$name")
    require(in != null, s"missing vendored meta-schema resource $name")
    JsonValue.parse(new String(in.readAllBytes(), "UTF-8"))
  }

  private val vocabNames = Seq("core", "applicator", "unevaluated", "validation",
    "meta-data", "format-annotation", "content")

  /** The official 2020-12 meta-schema family bundled into one compound
    * document: relative `$ref "meta/core"` against the root `$id`, one
    * resource per vocabulary, `$dynamicRef "#meta"` recursion — validated
    * by the tree-walk interpreter (dynamic scope). This is the exact
    * authority the reference compiler checks against
    * (`compiler.rs:945-966`); the dialect meta-schema above remains the
    * stricter single-document advisory form. */
  lazy val officialPrepared: Interp.Prepared = {
    val root = Spec.parse(resource("schema.json"))
    val external = vocabNames.map { n =>
      s"https://json-schema.org/draft/2020-12/meta/$n" -> Spec.parse(resource(s"meta/$n.json"))
    }.toMap
    Interp.prepare(Bundler.bundle(root, external))
  }

  /** Verdict under the OFFICIAL 2020-12 meta-schema. */
  def isValidOfficial(schemaDoc: JsonValue): Boolean =
    officialPrepared.isValid(schemaDoc)
}
