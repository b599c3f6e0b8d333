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
}
