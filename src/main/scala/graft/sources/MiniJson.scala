package graft.sources

import graft.core.MalformedSidecarException

/** Minimal recursive-descent JSON parser for the lineage sidecar — no
  * external dependency, full grammar (objects, arrays, strings with
  * escapes, numbers, booleans, null). Replaces the old regex scraping,
  * which silently misparsed nested or adversarial sidecars.
  *
  * Values map to: `Map[String, Any]`, `Vector[Any]`, `String`,
  * `Double`, `Boolean`, `null`. Any syntax error throws
  * [[graft.core.MalformedSidecarException]] with the offset.
  */
private[graft] object MiniJson {

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content after JSON value")
    v
  }

  /** parse + require a top-level object. */
  def parseObject(s: String): Map[String, Any] = parse(s) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other        => throw new MalformedSidecarException(
      s"expected a JSON object at top level, got ${other.getClass.getSimpleName}")
  }

  private final class Parser(s: String) {
    private var i = 0

    def atEnd: Boolean = i >= s.length

    def fail(msg: String): Nothing =
      throw new MalformedSidecarException(s"$msg at offset $i")

    def skipWs(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case c => fail(s"unexpected character '$c'")
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail(s"invalid literal (expected $word)")
      i += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (!atEnd && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += (k -> value())
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _   => fail("expected ',' or '}'")
        }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      expect('['); skipWs()
      val b = Vector.newBuilder[Any]
      if (!atEnd && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case _   => fail("expected ',' or ']'")
        }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        s.charAt(i) match {
          case '"' => i += 1; return sb.result()
          case '\\' =>
            i += 1
            if (atEnd) fail("unterminated escape")
            s.charAt(i) match {
              case '"'  => sb += '"';  i += 1
              case '\\' => sb += '\\'; i += 1
              case '/'  => sb += '/';  i += 1
              case 'b'  => sb += '\b'; i += 1
              case 'f'  => sb += '\f'; i += 1
              case 'n'  => sb += '\n'; i += 1
              case 'r'  => sb += '\r'; i += 1
              case 't'  => sb += '\t'; i += 1
              case 'u' =>
                if (i + 4 >= s.length) fail("truncated \\u escape")
                val hex = s.substring(i + 1, i + 5)
                // Integer.parseInt accepts a leading sign ("+0ab"), which
                // JSON forbids — require 4 strict hex digits
                if (!hex.forall(c => (c >= '0' && c <= '9') ||
                    (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
                  fail(s"invalid \\u escape '$hex'")
                sb += Integer.parseInt(hex, 16).toChar
                i += 5
              case c => fail(s"invalid escape '\\$c'")
            }
          case c if c < ' ' => fail("unescaped control character in string")
          case c => sb += c; i += 1
        }
      }
      sb.result() // unreachable
    }

    private def num(): Double = {
      val start = i
      if (!atEnd && s.charAt(i) == '-') i += 1
      while (!atEnd && s.charAt(i).isDigit) i += 1
      if (!atEnd && s.charAt(i) == '.') {
        i += 1
        while (!atEnd && s.charAt(i).isDigit) i += 1
      }
      if (!atEnd && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (!atEnd && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (!atEnd && s.charAt(i).isDigit) i += 1
      }
      if (i == start) fail("invalid number")
      try s.substring(start, i).toDouble
      catch { case _: NumberFormatException => fail("invalid number") }
    }
  }
}
