package graft.operators

/** Punycode (RFC 3492) and IDN hostname bridging — internationalized
  * domains arrive in crawls as `xn--` ACE labels, and URL/domain
  * dedup keys diverge when the same host appears both ways. The
  * decoder/encoder below are the full bootstring algorithm with the
  * IDNA parameters; [[hostToUnicode]]/[[hostToAscii]] apply them
  * label-wise so a pipeline can canonicalize either direction.
  *
  * Scope: the bootstring transform itself, case-insensitively, with
  * outputs lowercased — NOT the IDNA2008 mapping/bidi/contextual
  * rules (those need Unicode property tables out of scope here;
  * documented). Lowercase ASCII-safe inputs round-trip through the
  * JDK's own IDN implementation, which IdnSpec pins against as an
  * independent reference.
  *
  * Reference behavior studied: pytrousse has no URL layer
  * (/root/reference/src/trousse/dataset.py:1); beyond-parity
  * crawl-curation surface beside [[LinkGraph]]'s domain extraction.
  */
object Idn {

  // bootstring parameters for IDNA (RFC 3492 §5)
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private object IdnFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean)
      : Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= (Base - TMin)
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw IdnFail

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Decode one punycode label body (WITHOUT the `xn--` prefix) to
    * its Unicode form, lowercased. None for malformed/overflowing
    * input.
    */
  def punyDecode(label: String): Option[String] = {
    if (label == null) return None
    try {
      val delim = label.lastIndexOf('-')
      val out = new java.lang.StringBuilder
      var basicEnd = 0
      if (delim > 0) {
        var i = 0
        while (i < delim) {
          val c = label.charAt(i)
          if (c >= 128) throw IdnFail
          out.append(Character.toLowerCase(c))
          i += 1
        }
        basicEnd = delim + 1
      } else if (delim == 0) basicEnd = 1 // leading '-' only
      var n = InitialN
      var bias = InitialBias
      var idx = 0 // insertion index in code points
      var pos = basicEnd
      while (pos < label.length) {
        val oldIdx = idx
        var w = 1
        var k = Base
        var done = false
        while (!done) {
          if (pos >= label.length) throw IdnFail
          val digit = digitValue(label.charAt(pos))
          pos += 1
          if (digit > (Int.MaxValue - idx) / w) throw IdnFail
          idx += digit * w
          val t = if (k <= bias) TMin
            else if (k >= bias + TMax) TMax
            else k - bias
          if (digit < t) done = true
          else {
            if (w > Int.MaxValue / (Base - t)) throw IdnFail
            w *= (Base - t)
            k += Base
          }
        }
        val numPoints = out.codePointCount(0, out.length) + 1
        bias = adapt(idx - oldIdx, numPoints, oldIdx == 0)
        if (idx / numPoints > Int.MaxValue - n) throw IdnFail
        n += idx / numPoints
        idx %= numPoints
        if (n < InitialN || !Character.isValidCodePoint(n) ||
          (n >= 0xd800 && n <= 0xdfff)) throw IdnFail
        // insert code point n at position idx
        val off = out.offsetByCodePoints(0, idx)
        out.insert(off, new String(Character.toChars(
          Character.toLowerCase(n))))
        idx += 1
      }
      Some(out.toString)
    } catch {
      case IdnFail => None
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Encode one Unicode label to its punycode body (no prefix),
    * lowercasing first. Pure-ASCII labels return themselves.
    */
  def punyEncode(label0: String): Option[String] = {
    if (label0 == null) return None
    try {
      val label = label0.toLowerCase(java.util.Locale.ROOT)
      val cps = label.codePoints().toArray
      val out = new java.lang.StringBuilder
      cps.foreach { cp =>
        if (cp < 128) out.append(cp.toChar)
        else if (cp >= 0xd800 && cp <= 0xdfff) throw IdnFail
      }
      val basicLen = out.length
      if (basicLen == cps.length) return Some(label) // all-ASCII
      if (basicLen > 0) out.append('-')
      var n = InitialN
      var delta = 0
      var bias = InitialBias
      var handled = basicLen
      while (handled < cps.length) {
        var m = Int.MaxValue
        cps.foreach(cp => if (cp >= n && cp < m) m = cp)
        if (m - n > (Int.MaxValue - delta) / (handled + 1))
          throw IdnFail
        delta += (m - n) * (handled + 1)
        n = m
        cps.foreach { cp =>
          if (cp < n) {
            delta += 1
            if (delta == Int.MaxValue) throw IdnFail
          } else if (cp == n) {
            var q = delta
            var k = Base
            var done = false
            while (!done) {
              val t = if (k <= bias) TMin
                else if (k >= bias + TMax) TMax
                else k - bias
              if (q < t) done = true
              else {
                out.append(digitChar(t + (q - t) % (Base - t)))
                q = (q - t) / (Base - t)
                k += Base
              }
            }
            out.append(digitChar(q))
            bias = adapt(delta, handled + 1, handled == basicLen)
            delta = 0
            handled += 1
          }
        }
        delta += 1
        n += 1
      }
      Some(out.toString)
    } catch {
      case IdnFail => None
    }
  }

  /** ACE host → Unicode: each `xn--` label decodes, others
    * lowercase; any undecodable label refuses the whole host (a
    * half-translated key is worse than none).
    */
  def hostToUnicode(host: String): Option[String] = {
    if (host == null || host.isEmpty) return None
    val labels = host.toLowerCase(java.util.Locale.ROOT)
      .split("\\.", -1)
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.startsWith("xn--")) {
        punyDecode(l.substring(4)) match {
          case Some(u) if u.nonEmpty => out(i) = u
          case _ => return None
        }
      } else out(i) = l
      i += 1
    }
    Some(out.mkString("."))
  }

  /** Unicode host → ACE: non-ASCII labels gain `xn--`. */
  def hostToAscii(host: String): Option[String] = {
    if (host == null || host.isEmpty) return None
    val labels = host.toLowerCase(java.util.Locale.ROOT)
      .split("\\.", -1)
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.forall(_ < 128)) out(i) = l
      else punyEncode(l) match {
        case Some(a) => out(i) = "xn--" + a
        case None => return None
      }
      i += 1
    }
    Some(out.mkString("."))
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types.{BinaryType, BooleanType,
    StringType, StructField, StructType}

  val idnSchema: StructType = StructType(Seq(
    StructField("uni_host", StringType),
    StructField("ace_roundtrip", BooleanType)))

  /** Decode kernel: ACE host bytes → Unicode host + a round-trip
    * check (our encoder must reproduce the input ACE exactly).
    */
  def decodeIdnHost(bytes: Array[Byte]): Seq[Any] = {
    if (bytes == null) return Seq[Any](null, null)
    val ace = new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8)
    hostToUnicode(ace) match {
      case Some(uni) =>
        Seq[Any](uni, hostToAscii(uni).contains(ace))
      case None => Seq[Any](null, null)
    }
  }

  /** Per-row synthesizer: the Unicode host column converts to its
    * ACE form via the JDK's own IDN implementation — an INDEPENDENT
    * reference encoder, so the oracle round-trip pins this module
    * against it, not against itself.
    */
  def synthAceHosts(df: DataFrame, hostCol: String, outCol: String)
      : DataFrame = {
    val hi = df.schema.fieldIndex(hostCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val uni = Option(r.getString(hi)).getOrElse("")
        val ace = java.net.IDN.toASCII(uni)
        Row.fromSeq(r.toSeq :+ ace.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
    }(enc)
  }
}
