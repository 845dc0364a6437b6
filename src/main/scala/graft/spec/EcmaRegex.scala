package graft.spec

/** Best-effort ECMA-262 → Java regex translation.
  *
  * Analog of the reference's translator
  * (`/root/reference/crates/jsonschema-regex/src/lib.rs:16-60`,
  * `to_rust_regex`). Java regex is closer to ECMA than Rust's regex crate
  * (lookarounds and backreferences work natively), so translation is
  * lighter:
  *  - unescaped `$` → `\z` (ECMA `$` without `m` = end of input; Java `$`
  *    also matches before a trailing newline);
  *  - `\cX` control escapes pass through (Java supports);
  *  - `\d \w \s` ASCII classes match ECMA semantics under Java defaults.
  * Patterns invalid under Java regex are rejected at spec-compile time,
  * like the reference rejects at validator build.
  */
object EcmaRegex {
  def translate(ecma: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    val n = ecma.length
    while (i < n) {
      val c = ecma.charAt(i)
      c match {
        case '\\' if i + 1 < n =>
          sb.append(c).append(ecma.charAt(i + 1)); i += 1
        case '[' => inClass = true; sb.append(c)
        case ']' => inClass = false; sb.append(c)
        case '$' if !inClass => sb.append("\\z")
        case _ => sb.append(c)
      }
      i += 1
    }
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
