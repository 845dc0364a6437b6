package graft.spec

/** ECMA-262 → Java regex translation (best effort).
  *
  * Analog of the reference's translator
  * (`/root/reference/crates/jsonschema-regex/src/lib.rs:16-178`,
  * `to_rust_regex`). Java regex is much closer to ECMA than Rust's regex
  * crate — lookarounds, backreferences and named groups work natively —
  * so the translation concentrates on the true semantic gaps:
  *
  *  - `$` / `^` (no `m` flag): ECMA anchors to the very ends of the input;
  *    Java `$` also matches before a trailing newline → `$` becomes `\z`.
  *  - `\s` / `\S`: ECMA whitespace is Unicode (ASCII ws + NBSP + the
  *    space-separator category + BOM, `lib.rs:195-208`); Java's default
  *    `\s` is ASCII-only → expanded to the explicit character set.
  *  - `\cX` control escapes: ECMA maps the letter MOD 32 (upper AND lower
  *    case, Annex B); Java's `\cx` XORs with 64, which differs for
  *    lowercase → replaced with the literal control char (`lib.rs:22-47`).
  *    `\c` before a non-letter is rejected, like the reference.
  *  - Annex-B octal escapes: `\NNN` where `NNN` exceeds the number of
  *    capturing groups is a LegacyOctalEscape, not a backreference;
  *    `\0` is NUL. Java would reject the dangling backreference → the
  *    escape is rewritten to `\x{..}`. `\8`/`\9` with no matching group
  *    are identity escapes (literal digits).
  *  - `\v`: ECMA is the single char U+000B; Java 8+ `\v` is a vertical-
  *    whitespace CLASS → rewritten to `\x0B`.
  *  - `[\b]`: inside a class ECMA `\b` is backspace → `\x08`.
  *  - `\u{...}` without the `u` flag: Annex B treats `\u` not followed by
  *    4 hex digits as an identity escape for `u` (so `\u{2}` is `u`
  *    twice); same for `\x` without 2 hex digits.
  *  - Lone `{` / `}` that do not form a quantifier are literal characters
  *    in Annex B (ExtendedPatternCharacter); Java throws → escaped.
  *  - `[]` never matches and `[^]` matches everything in ECMA; Java
  *    rejects the empty class → `(?!)` / `[\s\S]`.
  *  - `\a` (Bell) is not an ECMA escape → rejected, mirroring the
  *    reference (`lib.rs:160-170`).
  *
  * Patterns invalid under Java regex after translation are rejected at
  * spec-compile time, like the reference rejects at validator build.
  * JSON-Schema `pattern`/`patternProperties` are unanchored searches; the
  * anchors above only change meaning when the schema author wrote them.
  */
object EcmaRegex {

  /** ECMA `\s` member chars, as a Java class body (no brackets). */
  private val WsBody =
    "\\t\\n\\x0B\\f\\r \\xA0\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}\\x{FEFF}"

  private def isOctal(c: Char) = c >= '0' && c <= '7'
  private def isHex(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Capturing groups (plain + named), for octal-vs-backreference. */
  private def countGroups(p: String): Int = {
    var i = 0; var inClass = false; var groups = 0
    val n = p.length
    while (i < n) {
      p.charAt(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (i + 1 >= n || p.charAt(i + 1) != '?') groups += 1
          else if (i + 2 < n && p.charAt(i + 2) == '<' &&
            i + 3 < n && p.charAt(i + 3) != '=' && p.charAt(i + 3) != '!') groups += 1
        case _ => ()
      }
      i += 1
    }
    groups
  }

  def translate(ecma: String): String = {
    val n = ecma.length
    val groups = countGroups(ecma)
    val sb = new StringBuilder
    var i = 0
    var inClass = false

    def fail(msg: String): Nothing = throw new SpecError(s"invalid pattern '$ecma': $msg")

    /** Valid quantifier at i (pointing at '{')? Returns end index after '}' or -1. */
    def quantifierEnd(at: Int): Int = {
      var j = at + 1
      val d0 = j
      while (j < n && ecma.charAt(j).isDigit) j += 1
      if (j == d0) return -1
      if (j < n && ecma.charAt(j) == ',') {
        j += 1
        while (j < n && ecma.charAt(j).isDigit) j += 1
      }
      if (j < n && ecma.charAt(j) == '}') j + 1 else -1
    }

    while (i < n) {
      val c = ecma.charAt(i)
      c match {
        case '\\' =>
          if (i + 1 >= n) fail("trailing backslash")
          val e = ecma.charAt(i + 1)
          e match {
            case 'c' =>
              // ECMA control escape: letter mod 32 (Annex B: lower too)
              if (i + 2 < n && ecma.charAt(i + 2).isLetter &&
                  ecma.charAt(i + 2) < 128) {
                sb.append(f"\\x${ecma.charAt(i + 2) % 32}%02X")
                i += 3
              } else fail("\\c must be followed by an ASCII letter")
            case 'u' =>
              if (i + 5 < n && (2 to 5).forall(k => isHex(ecma.charAt(i + k)))) {
                sb.append(ecma.substring(i, i + 6)); i += 6 // \uXXXX — Java-native
              } else { sb.append('u'); i += 2 }   // Annex-B identity escape
            case 'x' =>
              if (i + 3 < n && isHex(ecma.charAt(i + 2)) && isHex(ecma.charAt(i + 3))) {
                sb.append(ecma.substring(i, i + 4)); i += 4
              } else { sb.append('x'); i += 2 }
            case 's' =>
              sb.append(if (inClass) WsBody else s"[$WsBody]"); i += 2
            case 'S' =>
              sb.append(if (inClass) s"[^$WsBody]" else s"[^$WsBody]"); i += 2
            case 'v' => sb.append("\\x0B"); i += 2
            case 'b' if inClass => sb.append("\\x08"); i += 2
            case 'a' => fail("\\a is not an ECMA-262 escape")
            case d if d.isDigit =>
              // decimal run: backreference if <= group count, else Annex-B
              var j = i + 1
              while (j < n && ecma.charAt(j).isDigit) j += 1
              val num = ecma.substring(i + 1, j)
              val asInt = if (num.length <= 3) num.toInt else Int.MaxValue
              if (d != '0' && asInt <= groups && !inClass) {
                sb.append('\\').append(num); i = j
              } else {
                // LegacyOctalEscape: up to 3 octal digits, value <= 0377
                var k = i + 1; var v = 0
                while (k < n && isOctal(ecma.charAt(k)) && k - i <= 3 &&
                       v * 8 + (ecma.charAt(k) - '0') <= 255) {
                  v = v * 8 + (ecma.charAt(k) - '0'); k += 1
                }
                if (k == i + 1) { sb.append(d); i += 2 } // \8 \9 → identity
                else { sb.append(f"\\x$v%02X"); i = k }
              }
            case _ =>
              sb.append(c).append(e); i += 2
          }
        case '[' if !inClass =>
          // ECMA empty classes: `[]` never matches, `[^]` matches all
          if (i + 1 < n && ecma.charAt(i + 1) == ']') {
            sb.append("(?!)"); i += 2
          } else if (i + 2 < n && ecma.charAt(i + 1) == '^' && ecma.charAt(i + 2) == ']') {
            sb.append("[\\s\\S]"); i += 3
          } else { inClass = true; sb.append(c); i += 1 }
        case ']' if inClass => inClass = false; sb.append(c); i += 1
        case '$' if !inClass => sb.append("\\z"); i += 1
        case '{' if !inClass =>
          val qe = quantifierEnd(i)
          if (qe > 0) { sb.append(ecma.substring(i, qe)); i = qe }
          else { sb.append("\\{"); i += 1 } // Annex-B literal brace
        case '}' if !inClass => sb.append("\\}"); i += 1
        case _ => sb.append(c); i += 1
      }
    }
    if (inClass) fail("unclosed character class")
    sb.toString
  }

  /** Compile-check a pattern; throws SpecError on invalid pattern. */
  def compile(ecma: String): String = {
    val j = translate(ecma)
    try { java.util.regex.Pattern.compile(j); j }
    catch { case e: java.util.regex.PatternSyntaxException =>
      throw new SpecError(s"invalid pattern '$ecma': ${e.getMessage}") }
  }
}
