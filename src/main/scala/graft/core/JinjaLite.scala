package graft.core

/** Minimal Jinja2-compatible template engine for prompt rendering — the
  * Spark-side equivalent of the reference's auto-detected Jinja2 path
  * (ondine/stages/prompt_formatter_stage.py:79-96,141-143; spec flag
  * specifications.py:482-485). The environment has no Jinja library on the
  * classpath, so the needed subset is implemented directly:
  *
  *   - `{{ expr }}` output, `{# comment #}`
  *   - `{% if %}` / `{% elif %}` / `{% else %}` / `{% endif %}`
  *   - `{% for x in expr %}` / `{% endfor %}`
  *   - expressions: identifiers, 'str' / "str" / number / true / false /
  *     none literals, comparisons (== != < <= > >=), and/or/not, parens
  *   - filters: upper lower trim title length default(x) join(sep)
  *     truncate(n) replace(a,b) int
  *
  * Jinja semantics kept: null/absent renders as empty string, truthiness is
  * Python-like (null/false/0/empty are falsy). Templates parse once on the
  * driver (fail-fast on syntax errors); rendering happens executor-side via
  * a UDF over a struct of only the template's free variables, so column
  * pruning still reaches the scan. A genuinely dynamic template language
  * cannot be a static Catalyst expression — this is the documented UDF
  * exception (SURVEY §7.3).
  */
object JinjaLite {

  // ---- AST -------------------------------------------------------------

  sealed trait Node extends Serializable
  final case class Text(s: String) extends Node
  final case class Output(e: Expr) extends Node
  final case class IfNode(branches: List[(Expr, List[Node])],
                          otherwise: List[Node]) extends Node
  final case class ForNode(v: String, seq: Expr,
                           body: List[Node]) extends Node

  sealed trait Expr extends Serializable
  final case class Ident(name: String) extends Expr
  final case class StrLit(s: String) extends Expr
  final case class NumLit(d: Double) extends Expr
  final case class BoolLit(b: Boolean) extends Expr
  case object NullLit extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Filtered(e: Expr, name: String,
                            args: List[Expr]) extends Expr

  /** A template is Jinja iff it uses Jinja delimiters. Deliberate SUPERSET
    * of the reference's auto-detect (prompt_formatter_stage.py:81 triggers
    * on `{{` only): a `{% if %}`-only template is unambiguously Jinja and
    * would mis-parse as a `{col}` format template, so `{%` also triggers.
    * The templateFormat flag overrides either way. */
  def detect(template: String): Boolean =
    template.contains("{{") || template.contains("{%")

  // ---- template parser -------------------------------------------------

  private sealed trait Tok
  private final case class TText(s: String) extends Tok
  private final case class TOut(expr: String) extends Tok
  private final case class TTag(content: String) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = s.length
    val text = new StringBuilder
    def flush(): Unit =
      if (text.nonEmpty) { out += TText(text.toString); text.clear() }
    while (i < n) {
      if (s.startsWith("{{", i)) {
        val close = s.indexOf("}}", i + 2)
        require(close >= 0, s"unclosed {{ at offset $i")
        flush(); out += TOut(s.substring(i + 2, close).trim); i = close + 2
      } else if (s.startsWith("{%", i)) {
        val close = s.indexOf("%}", i + 2)
        require(close >= 0, s"unclosed {% at offset $i")
        flush(); out += TTag(s.substring(i + 2, close).trim); i = close + 2
      } else if (s.startsWith("{#", i)) {
        val close = s.indexOf("#}", i + 2)
        require(close >= 0, s"unclosed {# at offset $i")
        flush(); i = close + 2
      } else { text.append(s.charAt(i)); i += 1 }
    }
    flush()
    out.toList
  }

  def parseTemplate(template: String): List[Node] = {
    val (nodes, rest) = parseNodes(lex(template), stopAt = Set.empty)
    require(rest.isEmpty, "dangling block tag")
    nodes
  }

  /** Parse until one of `stopAt` tag keywords; returns (nodes, remaining
    * tokens INCLUDING the stop tag). */
  private def parseNodes(toks: List[Tok], stopAt: Set[String])
      : (List[Node], List[Tok]) = {
    val nodes = scala.collection.mutable.ListBuffer.empty[Node]
    var rest = toks
    while (rest.nonEmpty) {
      rest.head match {
        case TText(s) => nodes += Text(s); rest = rest.tail
        case TOut(e)  => nodes += Output(parseExpr(e)); rest = rest.tail
        case TTag(content) =>
          val kw = content.takeWhile(!_.isWhitespace)
          if (stopAt.contains(kw)) return (nodes.toList, rest)
          kw match {
            case "if" =>
              val (node, r) = parseIf(content.drop(2).trim, rest.tail)
              nodes += node; rest = r
            case "for" =>
              val m = "^for\\s+(\\w+)\\s+in\\s+(.+)$".r
              content match {
                case m(v, seqExpr) =>
                  val (body, r) = parseNodes(rest.tail, Set("endfor"))
                  require(r.nonEmpty, "missing {% endfor %}")
                  nodes += ForNode(v, parseExpr(seqExpr), body)
                  rest = r.tail
                case _ => throw new IllegalArgumentException(
                  s"malformed for tag: $content")
              }
            case other => throw new IllegalArgumentException(
              s"unknown or misplaced tag: $other")
          }
      }
    }
    (nodes.toList, Nil)
  }

  private def parseIf(cond: String, toks: List[Tok]): (Node, List[Tok]) = {
    val branches = scala.collection.mutable.ListBuffer.empty[(Expr, List[Node])]
    var curCond = parseExpr(cond)
    var rest = toks
    var otherwise: List[Node] = Nil
    var done = false
    while (!done) {
      val (body, r) = parseNodes(rest, Set("elif", "else", "endif"))
      require(r.nonEmpty, "missing {% endif %}")
      branches += ((curCond, body))
      r.head match {
        case TTag(t) if t.startsWith("elif") =>
          curCond = parseExpr(t.drop(4).trim); rest = r.tail
        case TTag(t) if t == "else" =>
          val (els, r2) = parseNodes(r.tail, Set("endif"))
          require(r2.nonEmpty, "missing {% endif %}")
          otherwise = els; rest = r2.tail; done = true
        case _ => rest = r.tail; done = true // endif
      }
    }
    (IfNode(branches.toList, otherwise), rest)
  }

  // ---- expression parser (precedence: or < and < not < cmp < primary) --

  private def parseExpr(s: String): Expr = {
    val p = new ExprParser(s)
    val e = p.orExpr()
    p.expectEnd()
    e
  }

  private final class ExprParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peek(tok: String): Boolean = { ws(); s.startsWith(tok, i) }
    private def eat(tok: String): Boolean =
      if (peek(tok)) { i += tok.length; true } else false
    private def peekWord(w: String): Boolean = {
      ws()
      s.startsWith(w, i) &&
        (i + w.length == s.length || !isIdentChar(s.charAt(i + w.length)))
    }
    private def eatWord(w: String): Boolean =
      if (peekWord(w)) { i += w.length; true } else false
    private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

    def expectEnd(): Unit = {
      ws()
      require(i == s.length, s"unexpected trailing input in expression: '$s'")
    }

    def orExpr(): Expr = {
      var l = andExpr()
      while (eatWord("or")) l = Bin("or", l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (eatWord("and")) l = Bin("and", l, notExpr())
      l
    }
    private def notExpr(): Expr =
      if (eatWord("not")) Not(notExpr()) else cmpExpr()
    private def cmpExpr(): Expr = {
      val l = filtered()
      val ops = Seq("==", "!=", "<=", ">=", "<", ">")
      ops.find(peek) match {
        case Some(op) => eat(op); Bin(op, l, filtered())
        case None     => l
      }
    }
    private def filtered(): Expr = {
      var e = primary()
      while (peek("|")) {
        eat("|"); ws()
        val start = i
        while (i < s.length && isIdentChar(s.charAt(i))) i += 1
        val name = s.substring(start, i)
        require(name.nonEmpty, s"missing filter name in: '$s'")
        val args =
          if (eat("(")) {
            val as = scala.collection.mutable.ListBuffer.empty[Expr]
            if (!peek(")")) {
              as += orExpr()
              while (eat(",")) as += orExpr()
            }
            require(eat(")"), s"missing ) in filter args: '$s'")
            as.toList
          } else Nil
        e = Filtered(e, name, args)
      }
      e
    }
    private def primary(): Expr = {
      ws()
      require(i < s.length, s"empty expression in: '$s'")
      val c = s.charAt(i)
      if (c == '(') {
        i += 1; val e = orExpr(); require(eat(")"), s"missing ) in: '$s'"); e
      } else if (c == '\'' || c == '"') {
        i += 1
        val start = i
        while (i < s.length && s.charAt(i) != c) i += 1
        require(i < s.length, s"unclosed string in: '$s'")
        val str = s.substring(start, i); i += 1
        StrLit(str)
      } else if (c.isDigit || (c == '-' && i + 1 < s.length &&
                 s.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        NumLit(s.substring(start, i).toDouble)
      } else if (eatWord("true")) BoolLit(true)
      else if (eatWord("false")) BoolLit(false)
      else if (eatWord("none")) NullLit
      else {
        val start = i
        while (i < s.length && isIdentChar(s.charAt(i))) i += 1
        require(i > start, s"unexpected character '${s.charAt(i)}' in: '$s'")
        Ident(s.substring(start, i))
      }
    }
  }

  // ---- free variables (for column pruning + input-column detection) ----

  def freeVariables(nodes: List[Node]): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    def walkE(e: Expr, bound: Set[String]): Unit = e match {
      case Ident(n) => if (!bound.contains(n)) out += n
      case Bin(_, l, r) => walkE(l, bound); walkE(r, bound)
      case Not(x) => walkE(x, bound)
      case Filtered(x, _, args) =>
        walkE(x, bound); args.foreach(walkE(_, bound))
      case _ => ()
    }
    def walk(ns: List[Node], bound: Set[String]): Unit = ns.foreach {
      case Text(_) => ()
      case Output(e) => walkE(e, bound)
      case IfNode(branches, otherwise) =>
        branches.foreach { case (c, b) => walkE(c, bound); walk(b, bound) }
        walk(otherwise, bound)
      case ForNode(v, seq, body) =>
        walkE(seq, bound); walk(body, bound + v)
    }
    walk(nodes, Set.empty)
    out.toSeq
  }

  // ---- evaluation ------------------------------------------------------

  def render(nodes: List[Node], scope: Map[String, Any]): String = {
    val sb = new StringBuilder
    renderInto(nodes, scope, sb)
    sb.toString
  }

  private def renderInto(nodes: List[Node], scope: Map[String, Any],
                         sb: StringBuilder): Unit = nodes.foreach {
    case Text(s)   => sb.append(s)
    case Output(e) => sb.append(toStr(eval(e, scope)))
    case IfNode(branches, otherwise) =>
      branches.find { case (c, _) => truthy(eval(c, scope)) } match {
        case Some((_, body)) => renderInto(body, scope, sb)
        case None            => renderInto(otherwise, scope, sb)
      }
    case ForNode(v, seqE, body) =>
      asSeq(eval(seqE, scope)).foreach { item =>
        renderInto(body, scope + (v -> item), sb)
      }
  }

  private def eval(e: Expr, scope: Map[String, Any]): Any = e match {
    case Ident(n)   => scope.getOrElse(n, null)
    case StrLit(s)  => s
    case NumLit(d)  => d
    case BoolLit(b) => b
    case NullLit    => null
    case Not(x)     => !truthy(eval(x, scope))
    case Bin("and", l, r) =>
      val lv = eval(l, scope); if (!truthy(lv)) lv else eval(r, scope)
    case Bin("or", l, r) =>
      val lv = eval(l, scope); if (truthy(lv)) lv else eval(r, scope)
    case Bin(op, l, r) => compare(op, eval(l, scope), eval(r, scope))
    case Filtered(x, name, args) =>
      applyFilter(name, eval(x, scope), args.map(eval(_, scope)))
  }

  private def compare(op: String, l: Any, r: Any): Boolean = (l, r) match {
    case _ if op == "==" => cmpEq(l, r)
    case _ if op == "!=" => !cmpEq(l, r)
    case _ =>
      val (a, b) = (asNum(l), asNum(r))
      (a, b) match {
        case (Some(x), Some(y)) => op match {
          case "<" => x < y; case "<=" => x <= y
          case ">" => x > y; case ">=" => x >= y
        }
        case _ =>
          val (x, y) = (toStr(l), toStr(r))
          op match {
            case "<" => x < y; case "<=" => x <= y
            case ">" => x > y; case ">=" => x >= y
          }
      }
  }

  private def cmpEq(l: Any, r: Any): Boolean = (asNum(l), asNum(r)) match {
    case (Some(x), Some(y)) => x == y
    case _ if l == null || r == null => l == null && r == null
    case _ => toStr(l) == toStr(r)
  }

  private def asNum(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _         => None
  }

  private def asSeq(v: Any): Seq[Any] = v match {
    case null => Nil
    case s: Seq[_] => s
    case a: Array[_] => a.toSeq
    case it: java.lang.Iterable[_] =>
      import scala.jdk.CollectionConverters._
      it.asScala.toSeq
    case other => Seq(other)
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case n: Number => n.doubleValue() != 0.0
    case s: Seq[_] => s.nonEmpty
    case a: Array[_] => a.nonEmpty
    case _ => true
  }

  private def toStr(v: Any): String = v match {
    case null => ""
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
        d.toLong.toString
      else d.toString
    case f: Float => toStr(f.toDouble)
    case s: Seq[_] => s.map(toStr).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def applyFilter(name: String, v: Any, args: List[Any]): Any =
    name match {
      case "upper"    => toStr(v).toUpperCase
      case "lower"    => toStr(v).toLowerCase
      case "trim"     => toStr(v).trim
      case "title"    => toStr(v).split(" ", -1)
        .map(w => if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase)
        .mkString(" ")
      case "length"   => v match {
        case s: String => s.length.toDouble
        case other     => asSeq(other).size.toDouble
      }
      case "default"  => if (v == null) args.headOption.orNull else v
      case "join"     =>
        asSeq(v).map(toStr).mkString(toStr(args.headOption.getOrElse("")))
      case "truncate" =>
        val n = args.headOption.flatMap(asNum).getOrElse(255.0).toInt
        val s = toStr(v)
        if (s.length <= n) s else s.take(n)
      case "replace"  => args match {
        case a :: b :: Nil => toStr(v).replace(toStr(a), toStr(b))
        case _ => throw new IllegalArgumentException(
          "replace filter needs 2 arguments")
      }
      // Jinja/Python int() truncates toward zero: -2.7|int == -2 (floor
      // would give -3).
      case "int"      => asNum(v).map(_.toLong).getOrElse(0L)
      case other => throw new IllegalArgumentException(
        s"unknown filter: $other")
    }
}
