package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.{EcmaRegex, SpecError}

/** Unit tests for the ECMA-262 → Java translator — the cases the
  * reference translator asserts (`crates/jsonschema-regex/src/lib.rs`
  * test table) plus the Java-specific gaps it doesn't need to handle. */
class EcmaRegexSpec extends AnyFunSuite {

  private def matches(pattern: String, s: String): Boolean =
    java.util.regex.Pattern.compile(EcmaRegex.translate(pattern)).matcher(s).find()

  test("control escapes: letter mod 32, both cases (reference lib.rs:22-47)") {
    assert(EcmaRegex.translate("\\cA\\cB\\cC") == "\\x01\\x02\\x03")
    assert(EcmaRegex.translate("\\ca\\cb\\cc") == "\\x01\\x02\\x03")
    assert(matches("^\\cI$", "\t"))
    assert(matches("^\\ci$", "\t"))
    assert(!matches("^\\ci$", "!")) // Java's xor-64 result for \ci must not leak
  }

  test("invalid patterns reject at build (reference invalid table)") {
    for (p <- Seq("\\c", "\\c?", "[a-z", "\\", "\\a"))
      intercept[SpecError](EcmaRegex.compile(p))
    // Java-level rejections surface as SpecError too
    for (p <- Seq("(abc", "a{3,2}", "[a-\\w]"))
      intercept[SpecError](EcmaRegex.compile(p))
  }

  test("octal vs backreference disambiguation (Annex B)") {
    assert(matches("^\\1$", "\u0001"))       // no group -> octal
    assert(matches("^(a)\\1$", "aa"))        // group -> backreference
    assert(!matches("^(a)\\1$", "a\u0001"))
    assert(matches("^\\101$", "A"))          // 0o101
    assert(matches("^\\0$", "\u0000"))
    assert(matches("^\\8$", "8"))            // \8 identity escape
    // \12 with 1 group: backref to group 1 then literal 2? ECMA takes the
    // longest decimal run; 12 > groups -> octal 0o12 = \n
    assert(matches("^\\12$", "\n"))
  }

  test("ECMA whitespace set for \\s / \\S (reference is_ecma_whitespace)") {
    for (c <- Seq(" ", "\t", "\n", "\u000b", "\u00a0", "\u1680", "\u2000",
                  "\u2028", "\u3000", "\ufeff"))
      assert(matches("^\\s$", c), s"U+${c.codePointAt(0).toHexString}")
    for (c <- Seq("a", "0", "\u200b"))
      assert(!matches("^\\s$", c) && matches("^\\S$", c))
    assert(!matches("^\\S$", "\u00a0"))
    assert(matches("^[\\s]$", "\u00a0"))
    assert(!matches("^[^\\s]$", "\u00a0"))
    assert(!matches("^[\\S]$", "\u00a0"))
  }

  test("\\v and [\\b] are single characters") {
    assert(matches("^\\v$", "\u000b") && !matches("^\\v$", "\n"))
    assert(matches("^[\\b]$", "\b") && !matches("^[\\b]$", "b"))
    assert(matches("^\\b.$", "x")) // word boundary outside class unchanged
  }

  test("Annex B literal braces; quantifiers unaffected") {
    assert(matches("^a{$", "a{"))
    assert(matches("^a}b$", "a}b"))
    assert(matches("^a{,3}$", "a{,3}"))
    assert(matches("^a{2}$", "aa") && !matches("^a{2}$", "a{2}"))
    assert(matches("^a{2,}$", "aaa"))
  }

  test("empty classes: [] never matches, [^] matches all") {
    assert(!matches("[]", "anything"))
    assert(matches("^[^]$", "\n") && matches("^[^]$", "a") && !matches("^[^]$", ""))
  }

  test("$ is a hard end-of-input anchor") {
    assert(matches("^abc$", "abc") && !matches("^abc$", "abc\n"))
  }

  test("\\u / \\x identity escapes without full hex (Annex B)") {
    assert(matches("^\\u{2}$", "uu") && !matches("^\\u{2}$", "u"))
    assert(matches("^\\u00e9$", "é"))
    assert(matches("^\\x$", "x"))
    assert(matches("^\\x41$", "A"))
  }

  test("group counting sees named groups and skips non-capturing") {
    assert(matches("^(?<g>a)\\1$", "aa"))    // named group is capturing
    assert(matches("^(?:a)\\1$", "a\u0001")) // non-capturing -> \1 is octal
  }
}
