package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** The reference's CITM and GeoJSON benchmark workloads
  * (`crates/benchmark/data/{citm_catalog_schema,citm_catalog,geojson,
  * canada}.json`, published numbers `crates/benchmark-suite/README.md:48-49`)
  * validated through every lane: tree walker, compiled closures, and the
  * fused streaming parse+validate kernel. CITM exercises a WIDE
  * non-recursive object (maps via additionalProperties, nested arrays of
  * structs); GeoJSON/canada exercises deep oneOf geometry dispatch over a
  * 2.1 MB numeric-array document. */
class RefWorkloadsSpec extends AnyFunSuite {

  def res(name: String): String =
    new String(getClass.getResourceAsStream(s"/bench/$name").readAllBytes(), "UTF-8")

  def lanes(schema: String, doc: String): (Boolean, Boolean, Boolean) = {
    val spec = Spec.parseJson(schema)
    val tree = Interp.isValid(spec, JsonValue.parse(doc))
    val p = Interp.prepare(spec)
    (tree, p.isValid(JsonValue.parse(doc)), p.isValidText(doc))
  }

  test("CITM catalog: 501 KB instance valid through all three lanes") {
    val (t, c, s) = lanes(res("citm_catalog_schema.json"), res("citm_catalog.json"))
    assert(t && c && s)
  }

  test("CITM catalog: planted violations fail in every lane") {
    val schema = res("citm_catalog_schema.json")
    // events.*.id must be an integer; name must be a string
    val broken1 = res("citm_catalog.json").replaceFirst("\"id\":\\s*(\\d+)", "\"id\":\"$1\"")
    // drop a required top-level key
    val broken2 = res("citm_catalog.json").replaceFirst("\"venueNames\"", "\"venueNamesX\"")
    for (broken <- Seq(broken1, broken2)) {
      val (t, c, s) = lanes(schema, broken)
      assert(!t && !c && !s)
    }
  }

  test("GeoJSON: 2.1 MB canada.json valid through all three lanes") {
    val (t, c, s) = lanes(res("geojson.json"), res("canada.json"))
    assert(t && c && s)
  }

  test("GeoJSON: planted violations fail in every lane") {
    val schema = res("geojson.json")
    // geometry type outside the oneOf dispatch set
    val broken1 = res("canada.json").replaceFirst("\"Polygon\"", "\"Pentagon\"")
    // FeatureCollection tag broken
    val broken2 = res("canada.json").replaceFirst("\"FeatureCollection\"", "\"FC\"")
    for (broken <- Seq(broken1, broken2)) {
      val (t, c, s) = lanes(schema, broken)
      assert(!t && !c && !s)
    }
  }
}
