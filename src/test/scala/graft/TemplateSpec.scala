package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.core.TemplateCompiler
import graft.core.TemplateCompiler.{Lit, Var}

class TemplateSpec extends AnyFunSuite {

  /** Plain-ScalaCheck property loop (scalatestplus bridge not on the
    * offline classpath). */
  private def forAll[T](gen: Gen[T], n: Int = 50)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.sample.foreach(check)
    }

  test("parse basics") {
    assert(TemplateCompiler.parse("Classify: {text}") ==
      Seq(Lit("Classify: "), Var("text")))
    assert(TemplateCompiler.parse("{a}{b}") == Seq(Var("a"), Var("b")))
    assert(TemplateCompiler.parse("none") == Seq(Lit("none")))
  }

  test("brace escaping like str.format") {
    assert(TemplateCompiler.parse("{{json}} {x}") ==
      Seq(Lit("{json} "), Var("x")))
    assert(TemplateCompiler.parse("a}}b{{c") == Seq(Lit("a}b{c")))
  }

  test("variables are deduped in order of first use") {
    assert(TemplateCompiler.variables("{b} {a} {b}") == Seq("b", "a"))
  }

  test("unclosed placeholder rejected") {
    intercept[IllegalArgumentException](TemplateCompiler.parse("bad {oops"))
  }

  test("property: literal-only templates round-trip") {
    val litGen = Gen.alphaNumStr
    forAll(litGen) { s =>
      val parts = TemplateCompiler.parse(s)
      val rendered = parts.map {
        case Lit(l) => l
        case Var(v) => s"{$v}"
      }.mkString
      assert(rendered == s)
    }
  }

  test("property: n placeholders -> n Var parts") {
    val nameGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.listOfN(5, nameGen)) { names =>
      val t = names.map(n => s"[{$n}]").mkString("-")
      val vars = TemplateCompiler.parse(t).collect { case Var(v) => v }
      assert(vars == names)
    }
  }

  test("property: parse splits any brace-free text as one literal") {
    val safe = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ':', '!', '?')))
      .map(_.mkString)
    forAll(safe) { s =>
      assert(TemplateCompiler.parse(s) == Seq(Lit(s)))
    }
  }

  // ---- JinjaLite -------------------------------------------------------

  import graft.core.JinjaLite

  private def jrender(t: String, scope: Map[String, Any]): String =
    JinjaLite.render(JinjaLite.parseTemplate(t), scope)

  test("jinja: auto-detect on delimiters") {
    assert(JinjaLite.detect("{{ x }}"))
    assert(JinjaLite.detect("{% if a %}b{% endif %}"))
    assert(!JinjaLite.detect("Classify: {text}"))
  }

  test("jinja: output, filters, null-as-empty") {
    assert(jrender("Hi {{ name | upper }}!", Map("name" -> "bob")) == "Hi BOB!")
    assert(jrender("[{{ missing }}]", Map.empty) == "[]")
    assert(jrender("{{ s | trim | lower }}", Map("s" -> "  AbC ")) == "abc")
    assert(jrender("{{ x | default('n/a') }}", Map("x" -> null)) == "n/a")
    assert(jrender("{{ t | truncate(3) }}", Map("t" -> "abcdef")) == "abc")
    assert(jrender("{{ t | replace('a', 'o') }}", Map("t" -> "banana")) == "bonono")
    assert(jrender("{{ xs | join(', ') }}", Map("xs" -> Seq("a", "b"))) == "a, b")
    assert(jrender("{{ xs | length }}", Map("xs" -> Seq(1, 2, 3))) == "3")
  }

  test("jinja: if / elif / else with comparisons and boolean ops") {
    val t = "{% if n > 10 and lang == 'en' %}big-en{% elif n > 10 %}big{% else %}small{% endif %}"
    assert(jrender(t, Map("n" -> 20, "lang" -> "en")) == "big-en")
    assert(jrender(t, Map("n" -> 20, "lang" -> "de")) == "big")
    assert(jrender(t, Map("n" -> 3, "lang" -> "en")) == "small")
    assert(jrender("{% if not x %}empty{% endif %}", Map("x" -> "")) == "empty")
  }

  test("jinja: for loop with scoped variable") {
    val t = "{% for w in words %}<{{ w | upper }}>{% endfor %}{{ w | default('gone') }}"
    assert(jrender(t, Map("words" -> Seq("a", "b"))) == "<A><B>gone")
  }

  test("jinja: comments and nested blocks") {
    val t = "{# note #}{% for x in xs %}{% if x > 1 %}{{ x }}{% endif %}{% endfor %}"
    assert(jrender(t, Map("xs" -> Seq(1, 2, 3))) == "23")
  }

  test("jinja: free variables exclude loop-bound names") {
    val vars = TemplateCompiler.variables(
      "{% if lang == 'en' %}{{ text }}{% endif %}{% for w in ws %}{{ w }}{% endfor %}")
    assert(vars == Seq("lang", "text", "ws"))
  }

  test("jinja: syntax errors fail fast") {
    intercept[IllegalArgumentException](JinjaLite.parseTemplate("{% if x %}no end"))
    intercept[IllegalArgumentException](JinjaLite.parseTemplate("{{ x"))
    intercept[IllegalArgumentException](JinjaLite.parseTemplate("{% endspam %}"))
  }

  test("templateFormat flag overrides Jinja auto-detect (brace escapes)") {
    // auto-detect routes {{ to Jinja (the reference rule)...
    assert(TemplateCompiler.isJinja("{{ x }}", None))
    // ...but an explicit format template keeps the str.format escape
    val t = """Reply as JSON like {{"label": "x"}}. Input: {text}"""
    assert(!TemplateCompiler.isJinja(t, Some("format")))
    assert(TemplateCompiler.variables(t, Some("format")) == Seq("text"))
    val parts = TemplateCompiler.parse(t)
    assert(parts.head == Lit("""Reply as JSON like {"label": "x"}. Input: """))
    // the flag also forces Jinja for delimiter-free templates
    assert(TemplateCompiler.isJinja("plain", Some("jinja")))
    intercept[IllegalArgumentException](
      TemplateCompiler.isJinja("x", Some("nonsense")))
  }
}
