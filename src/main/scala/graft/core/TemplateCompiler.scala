package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a `{column}` prompt template into a single Catalyst `concat`
  * expression — the whole-row render happens inside whole-stage codegen, no
  * UDF, no per-row interpretation.
  *
  * Semantics follow the reference's python `str.format(**row)` renderer
  * (ondine/stages/prompt_formatter_stage.py:139-144) with one deliberate
  * deviation: null column values render as the empty string (python would
  * render "None"), which is the sane choice for prompt text. `{{`/`}}`
  * escape to literal braces, as in str.format.
  */
object TemplateCompiler {

  sealed trait Part
  final case class Lit(s: String) extends Part
  final case class Var(name: String) extends Part

  /** Parse the template into literal / variable parts. */
  def parse(template: String): Seq[Part] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Part]
    val lit = new StringBuilder
    var i = 0
    val n = template.length
    while (i < n) {
      val c = template.charAt(i)
      if (c == '{' && i + 1 < n && template.charAt(i + 1) == '{') {
        lit.append('{'); i += 2
      } else if (c == '}' && i + 1 < n && template.charAt(i + 1) == '}') {
        lit.append('}'); i += 2
      } else if (c == '{') {
        val close = template.indexOf('}', i)
        require(close > i, s"unclosed placeholder at offset $i in: $template")
        if (lit.nonEmpty) { parts += Lit(lit.toString); lit.clear() }
        parts += Var(template.substring(i + 1, close).trim)
        i = close + 1
      } else {
        lit.append(c); i += 1
      }
    }
    if (lit.nonEmpty) parts += Lit(lit.toString)
    parts.toSeq
  }

  /** Is this template Jinja? The spec flag wins; None auto-detects on the
    * Jinja delimiters — exactly the reference's rule
    * (prompt_formatter_stage.py:79-89: Jinja2 iff `{{` present AND the
    * flag is unset). A format template that needs literal braces via the
    * `{{`/`}}` escape sets templateFormat = "format". */
  def isJinja(template: String, format: Option[String]): Boolean =
    format match {
      case Some("jinja")  => true
      case Some("format") => false
      case Some(other) => throw new IllegalArgumentException(
        s"unknown template format: $other (use \"format\" or \"jinja\")")
      case None => JinjaLite.detect(template)
    }

  /** Column names referenced by the template, in order of first use.
    * Jinja templates report the AST's free variables. */
  def variables(template: String,
                format: Option[String] = None): Seq[String] =
    if (isJinja(template, format))
      JinjaLite.freeVariables(JinjaLite.parseTemplate(template))
    else parse(template).collect { case Var(name) => name }.distinct

  /** Compile to one Column. Null-safe: missing values become "".
    * `{col}` templates compile to a codegen'd concat expression; Jinja
    * templates render through the JinjaLite interpreter (a UDF over a
    * struct of only the free variables — dynamic control flow cannot be
    * a static expression, but pruning still reaches the scan). */
  def compile(template: String,
              format: Option[String] = None): Column =
    if (isJinja(template, format)) compileJinja(template)
    else {
      val cols = parse(template).map {
        case Lit(s)    => lit(s)
        case Var(name) => coalesce(col(name).cast("string"), lit(""))
      }
      if (cols.isEmpty) lit("") else concat(cols: _*)
    }

  private def compileJinja(template: String): Column = {
    val ast = JinjaLite.parseTemplate(template) // driver-side: fail fast
    val vars = JinjaLite.freeVariables(ast)
    val render = udf { (row: org.apache.spark.sql.Row) =>
      val scope = vars.zipWithIndex.map { case (v, i) =>
        v -> (row.get(i) match {
          case s: scala.collection.Seq[_] => s.toSeq
          case other                      => other
        })
      }.toMap
      JinjaLite.render(ast, scope)
    }
    if (vars.isEmpty) render(struct()) else render(struct(vars.map(col): _*))
  }

  /** Preamble prepended to appended evidence
    * (prompt_formatter_stage.py:156-160, byte-for-byte). */
  val EvidencePreamble: String =
    "Previously validated answers for similar inputs " +
      "(use as reference, not as ground truth):\n"

  /** Compile with the formatter's full assembly order
    * (reference: ondine/stages/prompt_formatter_stage.py:145-167):
    * render template → PREPEND KB context ("Context:\n{kb}\n\n", external
    * docs are authoritative) → APPEND evidence context after the prompt
    * with the "Previously validated answers…" preamble (prior LLM answers
    * are weaker than external docs) → PREPEND the few-shot block. Each
    * context block is injected only when non-empty, as in the reference's
    * `if kb_ctx` / `if ev_ctx` guards. */
  def compileFull(spec: PromptSpec, kbContext: Option[Column] = None,
                  evidenceContext: Option[Column] = None): Column = {
    val base = compile(spec.template, spec.templateFormat)
    val withKb = kbContext match {
      case Some(c) =>
        val kb = coalesce(c, lit(""))
        when(length(kb) > 0,
          concat(lit("Context:\n"), kb, lit("\n\n"), base)).otherwise(base)
      case None => base
    }
    val withEv = evidenceContext match {
      case Some(c) =>
        val ev = coalesce(c, lit(""))
        when(length(ev) > 0,
          concat(withKb, lit("\n\n" + EvidencePreamble), ev))
          .otherwise(withKb)
      case None => withKb
    }
    if (spec.fewShot.isEmpty) withEv
    else concat(lit(spec.fewShot.map { case (q, a) => s"$q\n$a" }
      .mkString("", "\n\n", "\n\n")), withEv)
  }
}
