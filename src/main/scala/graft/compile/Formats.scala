package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Built-in `format` validators as pure Catalyst expressions.
  *
  * Mirrors the reference's 19 built-in formats
  * (`/root/reference/crates/jsonschema/src/keywords/format.rs:1400-1517`)
  * including the cheap length pre-filters before expensive parsing
  * (`format.rs:1481-1491`). Everything here is `functions._` composition —
  * no UDFs — so the whole check stays inside whole-stage codegen.
  *
  * Returns None for unknown formats (annotation-only, like the reference
  * when a format isn't recognized).
  */
object Formats {

  /** Date component validity for `yyyy-MM-dd`-shaped strings (shape must
    * already be guaranteed by regex): real month/day incl. leap years. */
  private def dateValid(c: Column): Column = {
    val y = substring(c, 1, 4).cast("int")
    val m = substring(c, 6, 2).cast("int")
    val d = substring(c, 9, 2).cast("int")
    val leap = (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
    val dim = when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(m.isin(4, 6, 9, 11), 30)
      .otherwise(when(leap, 29).otherwise(28))
    m.between(1, 12) && d.between(1, dim)
  }

  private val dateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  // RFC 3339 full-time: HH:MM:SS[.frac](Z|±HH:MM); case-insensitive T/Z.
  private val timeRe =
    "^([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)(\\.[0-9]+)?([zZ]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])$"

  /** Leap-second rule: seconds==60 only when the time, adjusted to UTC,
    * is 23:59:60 (`format.rs` time validation). */
  private def timeValid(c: Column): Column = {
    val hh = substring(c, 1, 2).cast("int")
    val mm = substring(c, 4, 2).cast("int")
    val ss = substring(c, 7, 2).cast("int")
    val offPart = regexp_extract(c, "([zZ]|[+-][0-9]{2}:[0-9]{2})$", 1)
    val offMin = when(lower(offPart) === "z", lit(0)).otherwise(
      (when(substring(offPart, 1, 1) === "-", -1).otherwise(1)) *
        (substring(offPart, 2, 2).cast("int") * 60 + substring(offPart, 5, 2).cast("int")))
    val utcMin = ((hh * 60 + mm) - offMin + lit(24 * 60 * 2)) % (24 * 60)
    when(ss === 60, utcMin === (23 * 60 + 59)).otherwise(lit(true))
  }

  private def rlikeAll(c: Column, re: String): Column = c.rlike(re)

  /** Strict IPv4 dotted quad, no leading zeros (`format.rs` ipv4). */
  private val ipv4Re =
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"

  /** Full IPv6 incl. ::, embedded IPv4, zoneless (RFC 4291). */
  private val ipv6Re = {
    val h = "[0-9A-Fa-f]{1,4}"
    val v4 = "((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    s"^(($h:){7}$h|($h:){1,7}:|($h:){1,6}:$h|($h:){1,5}(:$h){1,2}|($h:){1,4}(:$h){1,3}|" +
      s"($h:){1,3}(:$h){1,4}|($h:){1,2}(:$h){1,5}|$h:(:$h){1,6}|:((:$h){1,7}|:)|" +
      s"($h:){6}$v4|($h:){1,5}:$v4|($h:){1,4}(:$h){0,1}:$v4|($h:){1,3}(:$h){0,2}:$v4|" +
      s"($h:){1,2}(:$h){0,3}:$v4|$h:(:$h){0,4}:$v4|:(:$h){0,5}:$v4|::$v4)$$"
  }

  private val uuidRe =
    "^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"

  // RFC 1123 hostname: labels of alnum/hyphen, no leading/trailing hyphen,
  // each label <= 63 chars, total <= 253.
  private val hostnameRe =
    "^(?=.{1,253}\\z)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\\.?$"

  // Practical email (reference validates addr-spec pragmatically).
  private val emailRe =
    "^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"

  // RFC 3986 URI — the grammar is regular; absolute URI with optional
  // fragment. pct-encoded enforced.
  private val pchar = "[A-Za-z0-9\\-._~!$&'()*+,;=:@]|%[0-9A-Fa-f]{2}"
  private val segment = s"(?:$pchar)*"
  private val query = s"(?:$pchar|[/?])*"
  private val userinfo = "(?:[A-Za-z0-9\\-._~!$&'()*+,;=:]|%[0-9A-Fa-f]{2})*"
  private val regName = "(?:[A-Za-z0-9\\-._~!$&'()*+,;=]|%[0-9A-Fa-f]{2})*"
  private val ipLit = "\\[[0-9A-Fa-f:.]+\\]"
  private val host = s"(?:$ipLit|$regName)"
  private val authority = s"(?:$userinfo@)?$host(?::[0-9]*)?"
  private val hierPart = s"(?://$authority(?:/$segment)*|/(?:$segment(?:/$segment)*)?|(?:$pchar)+(?:/$segment)*|)"
  private val uriRe = s"^[A-Za-z][A-Za-z0-9+.\\-]*:$hierPart(?:\\?$query)?(?:#$query)?$$"
  private val relRef = s"^(?://$authority(?:/$segment)*|/(?:$segment(?:/$segment)*)?|(?:[A-Za-z0-9\\-._~!$$&'()*+,;=@]|%[0-9A-Fa-f]{2})+(?:/$segment)*|)(?:\\?$query)?(?:#$query)?$$"
  private val uriRefRe = s"(?:$uriRe)|(?:$relRef)"

  // RFC 6570 URI template (levels 1-4) — regular grammar.
  private val uriTemplateRe = {
    val lit = "(?:[^\\x00-\\x20\\x7f\"'%<>\\\\^`{|}]|%[0-9A-Fa-f]{2})"
    val varchar = "(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})"
    val varname = s"$varchar(?:\\.?$varchar)*"
    val varspec = s"$varname(?::[1-9][0-9]{0,3}|\\*)?"
    s"^(?:$lit|\\{[+#./;?&=,!@|]?$varspec(?:,$varspec)*\\})*$$"
  }

  // ISO 8601 duration (`format.rs` duration): P…; at least one component;
  // weeks exclusive with date/time designators.
  private val durationRe =
    "^P(?:[0-9]+W|(?=[0-9T])(?:[0-9]+Y)?(?:[0-9]+M)?(?:[0-9]+D)?(?:T(?=[0-9])(?:[0-9]+H)?(?:[0-9]+M)?(?:[0-9]+(?:\\.[0-9]+)?S)?)?)$"

  private val jsonPointerRe = "^(?:/(?:[^/~]|~[01])*)*$"
  private val relJsonPointerRe = "^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^/~]|~[01])*)*)$"

  /** Returns Some(predicate) for known formats; None → annotation only.
    * Predicates assume a non-null string input (caller wraps nulls). */
  def predicate(name: String, c: Column): Option[Column] = name match {
    case "date" =>
      Some(length(c) === 10 && rlikeAll(c, dateRe) && dateValid(c))
    case "time" =>
      Some(rlikeAll(c, timeRe) && timeValid(c))
    case "date-time" =>
      val datePart = substring(c, 1, 10)
      val timePart = substring(c, 12, 1000000)
      Some(length(c) >= 20 &&
        rlikeAll(c, "^[0-9]{4}-[0-9]{2}-[0-9]{2}[tT ].*") &&
        rlikeAll(datePart, dateRe) && dateValid(datePart) &&
        rlikeAll(timePart, timeRe) && timeValid(timePart))
    case "duration" => Some(rlikeAll(c, durationRe))
    case "email" => Some(rlikeAll(c, emailRe))
    case "idn-email" => Some(graft.functions.exprs.idn_email_valid(c))
    case "hostname" => Some(rlikeAll(c, hostnameRe))
    // real punycode (java.net.IDN) + RFC 1123 label checks on ASCII form
    case "idn-hostname" => Some(graft.functions.exprs.idn_hostname_valid(c))
    case "ipv4" => Some(length(c).between(7, 15) && rlikeAll(c, ipv4Re))
    case "ipv6" => Some(length(c) <= 45 && rlikeAll(c, ipv6Re))
    case "uuid" => Some(length(c) === 36 && rlikeAll(c, uuidRe))
    case "uri" | "iri" => Some(rlikeAll(c, uriRe))
    case "uri-reference" | "iri-reference" => Some(rlikeAll(c, uriRefRe))
    case "uri-template" => Some(rlikeAll(c, uriTemplateRe))
    case "json-pointer" => Some(rlikeAll(c, jsonPointerRe))
    case "relative-json-pointer" => Some(rlikeAll(c, relJsonPointerRe))
    case "regex" => Some(graft.functions.exprs.regex_valid(c))
    case _ => None
  }

  // ---- scala-side predicates (single-document validation) ---------------

  private def dateValidS(s: String): Boolean = {
    val y = s.substring(0, 4).toInt
    val m = s.substring(5, 7).toInt
    val d = s.substring(8, 10).toInt
    val leap = (y % 4 == 0 && y % 100 != 0) || (y % 400 == 0)
    val dim = m match {
      case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
      case 4 | 6 | 9 | 11 => 30
      case _ => if (leap) 29 else 28
    }
    m >= 1 && m <= 12 && d >= 1 && d <= dim
  }

  private def timeValidS(s: String): Boolean = {
    val hh = s.substring(0, 2).toInt
    val mm = s.substring(3, 5).toInt
    val ss = s.substring(6, 8).toInt
    val offM = java.util.regex.Pattern.compile("([zZ]|[+-][0-9]{2}:[0-9]{2})$").matcher(s)
    if (!offM.find()) return false
    val off = offM.group(1)
    val offMin =
      if (off.equalsIgnoreCase("z")) 0
      else {
        val sign = if (off.charAt(0) == '-') -1 else 1
        sign * (off.substring(1, 3).toInt * 60 + off.substring(4, 6).toInt)
      }
    val utcMin = ((hh * 60 + mm) - offMin + 24 * 60 * 2) % (24 * 60)
    ss != 60 || utcMin == 23 * 60 + 59
  }

  private def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** Scala predicate for single-document validation (`Interp`/`Compiled`
    * with assertFormats) — the SAME regex constants and arithmetic as the
    * Column form above; equivalence is asserted by the format suite driven
    * through both engines. `rlike` is find-semantics, so `find()` here. */
  def scalaPredicate(name: String): Option[String => Boolean] = {
    def re(r: String): String => Boolean = {
      val p = java.util.regex.Pattern.compile(r)
      s => p.matcher(s).find()
    }
    name match {
      case "date" =>
        val r = re(dateRe); Some(s => s.length == 10 && r(s) && dateValidS(s))
      case "time" =>
        val r = re(timeRe); Some(s => r(s) && timeValidS(s))
      case "date-time" =>
        val head = re("^[0-9]{4}-[0-9]{2}-[0-9]{2}[tT ].*")
        val dr = re(dateRe); val tr = re(timeRe)
        Some { s =>
          s.length >= 20 && head(s) && {
            val dp = s.substring(0, 10); val tp = s.substring(11)
            dr(dp) && dateValidS(dp) && tr(tp) && timeValidS(tp)
          }
        }
      case "duration" => Some(re(durationRe))
      case "email" => Some(re(emailRe))
      case "idn-email" => Some(s => graft.functions.GraftFns.idnEmailValid(u8(s)))
      case "hostname" => Some(re(hostnameRe))
      case "idn-hostname" => Some(s => graft.functions.GraftFns.idnHostnameValid(u8(s)))
      case "ipv4" =>
        val r = re(ipv4Re); Some(s => s.length >= 7 && s.length <= 15 && r(s))
      case "ipv6" =>
        val r = re(ipv6Re); Some(s => s.length <= 45 && r(s))
      case "uuid" =>
        val r = re(uuidRe); Some(s => s.length == 36 && r(s))
      case "uri" | "iri" => Some(re(uriRe))
      case "uri-reference" | "iri-reference" => Some(re(uriRefRe))
      case "uri-template" => Some(re(uriTemplateRe))
      case "json-pointer" => Some(re(jsonPointerRe))
      case "relative-json-pointer" => Some(re(relJsonPointerRe))
      case "regex" => Some(s => graft.functions.GraftFns.regexValid(u8(s)))
      case _ => None
    }
  }
}
