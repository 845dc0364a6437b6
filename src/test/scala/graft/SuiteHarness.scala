package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.spec._
import graft.run.Validation
import graft.compile.SpecCompiler

/** Harness for vendored JSON-Schema-Test-Suite triples (FIXTURES.md §5):
  * files of [{description, schema, tests: [{description, data, valid}]}],
  * the exact format of the official corpus
  * (`/root/reference/crates/jsonschema-testsuite/README.md:29-41`).
  *
  * Each case builds a 1-row DataFrame typed from the instance, compiles
  * the schema, and asserts the engine verdict — and the reference-
  * faithful interpreter's verdict — both match `valid`. */
object SuiteHarness {

  /** Spark type for a JSON instance; None ⇒ not representable in the
    * relational model (heterogeneous arrays etc.) → case is skipped. */
  def sparkType(v: JsonValue): Option[DataType] = v match {
    case JNull => Some(NullType)
    case _: JBool => Some(BooleanType)
    case n: JNum =>
      // keep the int/float distinction: 1.0 must stay fractional so the
      // "integral double is an integer" semantic is exercised
      if (n.value.scale <= 0) Some(LongType) else Some(DoubleType)
    case _: JStr => Some(StringType)
    case JArr(xs) =>
      val elems = xs.map(sparkType)
      if (elems.exists(_.isEmpty)) None
      else {
        val ts = elems.flatten.distinct
        ts match {
          case Seq() => Some(ArrayType(NullType, containsNull = true))
          case Seq(t) => Some(ArrayType(t, containsNull = t == NullType))
          case many =>
            // int+double promotes; anything else is heterogeneous
            if (many.toSet == Set(LongType, DoubleType))
              Some(ArrayType(DoubleType, containsNull = false))
            else if (many.toSet.subsetOf(Set[DataType](LongType, DoubleType, NullType)))
              Some(ArrayType(DoubleType, containsNull = true))
            else if (many.contains(NullType) && many.size == 2)
              Some(ArrayType(many.filter(_ != NullType).head, containsNull = true))
            else None
        }
      }
    case JObj(fields) =>
      val fts = fields.map { case (k, fv) => sparkType(fv).map(t => StructField(k, t)) }
      if (fts.exists(_.isEmpty)) None else Some(StructType(fts.flatten))
  }

  def sparkValue(v: JsonValue, dt: DataType): Any = (v, dt) match {
    case (JNull, _) => null
    case (JBool(b), _) => b
    case (n: JNum, LongType) => n.value.toLong
    case (n: JNum, DoubleType) => n.value.toDouble
    case (JStr(s), _) => s
    case (JArr(xs), ArrayType(et, _)) => xs.map(sparkValue(_, et))
    case (o: JObj, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f => sparkValue(o.get(f.name).getOrElse(JNull), f.dataType)))
    case _ => null
  }

  /** Build the 1-row DataFrame + the compile entry for an instance:
    * objects become the table row (root model), scalars/arrays become a
    * single `value` column. */
  def buildAndCompile(spark: SparkSession, schema: Spec, data: JsonValue,
                      opts: graft.compile.CompileOptions = graft.compile.CompileOptions()): Option[Boolean] = {
    data match {
      case o: JObj =>
        sparkType(o).map { case st: StructType =>
          val df = spark.createDataFrame(
            java.util.List.of(sparkValue(o, st).asInstanceOf[Row]), st)
          verdict(df, SpecCompiler.compileRoot(schema, st, opts))
        }
      case other =>
        sparkType(other).map { dt =>
          val st = StructType(Seq(StructField("value", dt)))
          val df = spark.createDataFrame(
            java.util.List.of(Row(sparkValue(other, dt))), st)
          verdict(df, SpecCompiler.compileColumn(schema, "value", dt, opts))
        }
    }
  }

  private def verdict(df: DataFrame, checks: Vector[graft.compile.Check]): Boolean =
    graft.run.ValidationPlan(checks).withValid(df)
      .select("valid").collect()(0).getBoolean(0)

  final case class SuiteCase(group: String, description: String,
                             schema: JsonValue, data: JsonValue, valid: Boolean)

  def loadResource(name: String): Vector[SuiteCase] = {
    val in = getClass.getResourceAsStream(s"/suite/$name")
    require(in != null, s"missing resource /suite/$name")
    val text = new String(in.readAllBytes(), "UTF-8")
    val JArr(groups) = JsonValue.parse(text): @unchecked
    groups.flatMap { g =>
      val go = g.asInstanceOf[JObj]
      val desc = go.get("description").collect { case JStr(s) => s }.getOrElse("")
      val schema = go.get("schema").get
      val JArr(tests) = go.get("tests").get: @unchecked
      tests.map { t =>
        val to = t.asInstanceOf[JObj]
        SuiteCase(desc,
          to.get("description").collect { case JStr(s) => s }.getOrElse(""),
          schema, to.get("data").get,
          to.get("valid").collect { case JBool(b) => b }.get)
      }
    }
  }
}
