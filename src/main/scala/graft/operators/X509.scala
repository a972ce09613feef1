package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** X.509 certificate triage (C245) — crawls, TLS dumps and code
  * repos are full of .pem/.der/.crt material, and a curation pass
  * wants the census facts (who signed what, with which algorithm,
  * valid when, for which names) without an X.509 stack. The wire
  * format is public (RFC 5280 over DER): Certificate ::= SEQUENCE
  * { tbsCertificate, signatureAlgorithm, signature }, names as
  * SEQUENCE OF SET OF (OID, value), validity as UTC/Generalized
  * time, extensions under [3] with subjectAltName = 2.5.29.17.
  *
  * The DER walk is strict the way DER is strict: definite lengths
  * only (indefinite is BER, refused), minimal multi-byte lengths,
  * bounded depth. PEM armor unwraps first. Surfaced: version,
  * serial (leading-zero-stripped uppercase hex, exactly as openssl
  * prints it), signature and public-key algorithm names across the
  * common OID arcs, subject/issuer CN and O, self-signed-ness (raw
  * DER name equality), ISO validity instants, extension count, and
  * the SAN DNS/IP lists.
  *
  * Pinning: X509Spec replays DER fixtures OpenSSL 3.0.19 itself
  * generated (RSA + EC, with SANs) against the facts
  * `openssl x509 -text` recorded at generation time.
  *
  * Totality: None on damage. Scale: per-value map-only.
  */
object X509 {

  private val MaxDepth = 32
  private val MaxLen = 1 << 24

  final case class CertMeta(version: Int, serialHex: String,
      sigAlg: String, pubKeyAlg: String, subjectCn: String,
      subjectO: String, issuerCn: String, selfSigned: Boolean,
      notBefore: String, notAfter: String, nExtensions: Int,
      sanDns: Seq[String], sanIp: Int)

  private final case class XFail() extends RuntimeException

  val OidNames: Map[String, String] = Map(
    "1.2.840.113549.1.1.1" -> "rsaEncryption",
    "1.2.840.113549.1.1.5" -> "sha1WithRSAEncryption",
    "1.2.840.113549.1.1.11" -> "sha256WithRSAEncryption",
    "1.2.840.113549.1.1.12" -> "sha384WithRSAEncryption",
    "1.2.840.113549.1.1.13" -> "sha512WithRSAEncryption",
    "1.2.840.10045.2.1" -> "id-ecPublicKey",
    "1.2.840.10045.4.3.2" -> "ecdsa-with-SHA256",
    "1.2.840.10045.4.3.3" -> "ecdsa-with-SHA384",
    "1.3.101.112" -> "ED25519",
    "2.5.4.3" -> "CN", "2.5.4.10" -> "O", "2.5.4.6" -> "C",
    "2.5.29.17" -> "subjectAltName")

  /** One TLV: (tag, content-from, content-until, next). */
  private def tlv(b: Array[Byte], p: Int, end: Int)
      : (Int, Int, Int, Int) = {
    if (p + 2 > end) throw XFail()
    val tag = b(p) & 0xff
    if ((tag & 0x1f) == 0x1f) throw XFail() // high tags unused
    var q = p + 1
    val l0 = b(q) & 0xff
    q += 1
    val len =
      if (l0 < 0x80) l0
      else if (l0 == 0x80) throw XFail() // indefinite = BER
      else {
        val n = l0 & 0x7f
        if (n > 4) throw XFail()
        var v = 0L
        var i = 0
        while (i < n) {
          if (q >= end) throw XFail()
          v = (v << 8) | (b(q) & 0xff)
          q += 1
          i += 1
        }
        if (v > MaxLen) throw XFail()
        v.toInt
      }
    if (len < 0 || q + len > end) throw XFail()
    (tag, q, q + len, q + len)
  }

  private def oidStr(b: Array[Byte], from: Int, until: Int)
      : String = {
    if (until <= from) throw XFail()
    val sb = new StringBuilder
    val first = b(from) & 0xff
    sb.append(first / 40).append('.').append(first % 40)
    var v = 0L
    var i = from + 1
    while (i < until) {
      v = (v << 7) | (b(i) & 0x7fL)
      if ((b(i) & 0x80) == 0) {
        sb.append('.').append(v)
        v = 0
      }
      i += 1
    }
    sb.toString
  }

  /** AlgorithmIdentifier ::= SEQUENCE { OID, params? } → name. */
  private def algName(b: Array[Byte], from: Int, until: Int)
      : String = {
    val (t, f, u, _) = tlv(b, from, until)
    if (t != 0x30) throw XFail()
    val (ot, of, ou, _) = tlv(b, f, u)
    if (ot != 0x06) throw XFail()
    val oid = oidStr(b, of, ou)
    OidNames.getOrElse(oid, oid)
  }

  /** Name → (CN, O) via SEQUENCE OF SET OF SEQ(OID, value). */
  private def nameParts(b: Array[Byte], from: Int, until: Int)
      : (String, String) = {
    var cn = ""
    var o = ""
    val (t, f, u, _) = tlv(b, from, until)
    if (t != 0x30) throw XFail()
    var p = f
    while (p < u) {
      val (st, sf, su, next) = tlv(b, p, u)
      if (st != 0x31) throw XFail() // SET
      var q = sf
      while (q < su) {
        val (at, af, au, anext) = tlv(b, q, su)
        if (at != 0x30) throw XFail()
        val (ot, of, ou, vAt) = tlv(b, af, au)
        if (ot != 0x06) throw XFail()
        val oid = oidStr(b, of, ou)
        val (_, vf, vu, _) = tlv(b, vAt, au)
        val value = new String(b, vf, vu - vf,
          java.nio.charset.StandardCharsets.UTF_8)
        if (oid == "2.5.4.3") cn = value
        if (oid == "2.5.4.10") o = value
        q = anext
      }
      p = next
    }
    (cn, o)
  }

  /** UTCTime/GeneralizedTime → ISO instant string. */
  private def timeIso(b: Array[Byte], tag: Int, from: Int,
      until: Int): String = {
    val s = new String(b, from, until - from,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (!s.endsWith("Z")) throw XFail()
    val digits = s.dropRight(1)
    if (!digits.forall(_.isDigit)) throw XFail()
    val (yyyy, rest) =
      if (tag == 0x17) { // UTCTime YYMMDDHHMMSS
        if (digits.length != 12) throw XFail()
        val yy = digits.take(2).toInt
        (if (yy < 50) 2000 + yy else 1900 + yy, digits.drop(2))
      } else { // GeneralizedTime YYYYMMDDHHMMSS
        if (digits.length != 14) throw XFail()
        (digits.take(4).toInt, digits.drop(4))
      }
    f"$yyyy%04d-${rest.take(2)}-${rest.slice(2, 4)}" +
      s"T${rest.slice(4, 6)}:${rest.slice(6, 8)}:" +
      s"${rest.slice(8, 10)}Z"
  }

  /** Unwrap PEM armor if present. */
  def pemToDer(b: Array[Byte]): Option[Array[Byte]] = {
    val s = new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    val begin = s.indexOf("-----BEGIN CERTIFICATE-----")
    if (begin < 0) return None
    val from = begin + "-----BEGIN CERTIFICATE-----".length
    val endAt = s.indexOf("-----END CERTIFICATE-----", from)
    if (endAt < 0) return None
    val b64 = s.substring(from, endAt)
      .filterNot(c => c == '\n' || c == '\r' || c == ' ')
    try Some(java.util.Base64.getDecoder.decode(b64))
    catch { case _: IllegalArgumentException => None }
  }

  /** Parse one certificate (DER, or PEM armor). None on damage. */
  def certMeta(bytes: Array[Byte]): Option[CertMeta] = {
    if (bytes == null || bytes.length < 16) return None
    val b =
      if (bytes(0) == '-') pemToDer(bytes).getOrElse(return None)
      else bytes
    try {
      val (t, f, u, _) = tlv(b, 0, b.length)
      if (t != 0x30 || u != b.length) return None
      // tbsCertificate
      val (tt, tf, tu, sigAt) = tlv(b, f, u)
      if (tt != 0x30) return None
      var p = tf
      // [0] EXPLICIT version?
      var version = 1
      val (vt, vf, vu, vNext) = tlv(b, p, tu)
      if (vt == 0xa0) {
        val (it, iF, iU, _) = tlv(b, vf, vu)
        if (it != 0x02 || iU - iF != 1) return None
        version = (b(iF) & 0xff) + 1
        p = vNext
      }
      // serialNumber INTEGER
      val (st, sf, su, sNext) = tlv(b, p, tu)
      if (st != 0x02 || su - sf > 24) return None
      var serialFrom = sf
      while (serialFrom < su - 1 && b(serialFrom) == 0)
        serialFrom += 1
      val serialHex = (serialFrom until su)
        .map(i => f"${b(i) & 0xff}%02X").mkString
      p = sNext
      // signature AlgorithmIdentifier (inside tbs)
      val (_, _, _, aNext) = tlv(b, p, tu)
      p = aNext
      // issuer
      val issuerSpanStart = p
      val (_, _, _, iNext) = tlv(b, p, tu)
      val (issuerCn, _) = nameParts(b, issuerSpanStart, tu)
      val issuerRaw = java.util.Arrays.copyOfRange(b,
        issuerSpanStart, iNext)
      p = iNext
      // validity
      val (valT, valF, valU, valNext) = tlv(b, p, tu)
      if (valT != 0x30) return None
      val (nbT, nbF, nbU, nbNext) = tlv(b, valF, valU)
      if (nbT != 0x17 && nbT != 0x18) return None
      val notBefore = timeIso(b, nbT, nbF, nbU)
      val (naT, naF, naU, _) = tlv(b, nbNext, valU)
      if (naT != 0x17 && naT != 0x18) return None
      val notAfter = timeIso(b, naT, naF, naU)
      p = valNext
      // subject
      val subjectSpanStart = p
      val (_, _, _, subNext) = tlv(b, p, tu)
      val (subjectCn, subjectO) = nameParts(b, subjectSpanStart, tu)
      val subjectRaw = java.util.Arrays.copyOfRange(b,
        subjectSpanStart, subNext)
      p = subNext
      // subjectPublicKeyInfo ::= SEQ { AlgorithmIdentifier, BIT.. }
      val (pkT, pkF, pkU, pkNext) = tlv(b, p, tu)
      if (pkT != 0x30) return None
      val pubKeyAlg = algName(b, pkF, pkU)
      p = pkNext
      // optional [1]/[2] unique ids, then [3] extensions
      var nExt = 0
      val sanDns = Seq.newBuilder[String]
      var sanIp = 0
      while (p < tu) {
        val (xt, xf, xu, xNext) = tlv(b, p, tu)
        if (xt == 0xa3) {
          val (et, ef, eu, _) = tlv(b, xf, xu)
          if (et != 0x30) return None
          var q = ef
          while (q < eu) {
            val (_, xef, xeu, extNext) = tlv(b, q, eu)
            nExt += 1
            // Extension ::= SEQ { OID, critical?, OCTET STRING }
            val (eot, eof, eou, eValAt) = tlv(b, xef, xeu)
            if (eot != 0x06) return None
            if (oidStr(b, eof, eou) == "2.5.29.17") {
              // skip optional BOOLEAN, take the OCTET STRING
              var vAt = eValAt
              val (bt, _, _, bNext) = tlv(b, vAt, xeu)
              if (bt == 0x01) vAt = bNext
              val (ost, osf, osu, _) = tlv(b, vAt, xeu)
              if (ost != 0x04) return None
              val (gt, gf, gu, _) = tlv(b, osf, osu)
              if (gt != 0x30) return None
              var g = gf
              while (g < gu) {
                val (gnT, gnF, gnU, gnNext) = tlv(b, g, gu)
                if (gnT == 0x82)
                  sanDns += new String(b, gnF, gnU - gnF,
                    java.nio.charset.StandardCharsets.US_ASCII)
                if (gnT == 0x87) sanIp += 1
                g = gnNext
              }
            }
            q = extNext
          }
        }
        p = xNext
      }
      // signatureAlgorithm (outer)
      val sigAlg = algName(b, sigAt, u)
      Some(CertMeta(version, serialHex, sigAlg, pubKeyAlg,
        subjectCn, subjectO, issuerCn,
        java.util.Arrays.equals(issuerRaw, subjectRaw),
        notBefore, notAfter, nExt, sanDns.result(), sanIp))
    } catch {
      case _: XFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (synth): a structurally valid self-signed-shaped cert
  // with a placeholder signature (triage never verifies crypto)
  // ---------------------------------------------------------------

  private def wrap(tag: Int, content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag)
    val n = content.length
    if (n < 0x80) out.write(n)
    else if (n < 0x100) { out.write(0x81); out.write(n) }
    else { out.write(0x82); out.write(n >> 8); out.write(n & 0xff) }
    out.write(content)
    out.toByteArray
  }

  private def derOid(oid: String): Array[Byte] = {
    val parts = oid.split('.').map(_.toLong)
    val out = new java.io.ByteArrayOutputStream()
    out.write((parts(0) * 40 + parts(1)).toInt)
    parts.drop(2).foreach { v =>
      val bs = scala.collection.mutable.ArrayBuffer[Int]()
      var x = v
      bs.prepend((x & 0x7f).toInt)
      x >>= 7
      while (x > 0) { bs.prepend(((x & 0x7f) | 0x80).toInt); x >>= 7 }
      bs.foreach(out.write)
    }
    wrap(0x06, out.toByteArray)
  }

  private def rdn(oid: String, value: String): Array[Byte] =
    wrap(0x31, wrap(0x30, derOid(oid) ++
      wrap(0x0c, value.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))))

  /** A planted v3 cert: serial, CN/O, validity, optional SAN. */
  def certWrite(serial: Long, cn: String, org: String,
      notBeforeYear: Int, years: Int, sanDns: Seq[String],
      ecdsa: Boolean): Array[Byte] =
    certWrite(BigInt(serial), cn, org, notBeforeYear, years,
      sanDns, ecdsa)

  /** BigInt-serial variant: real CA-issued certs carry 16-20 byte
    * random serials (RFC 5280 permits up to 20), well past Long.
    */
  def certWrite(serial: BigInt, cn: String, org: String,
      notBeforeYear: Int, years: Int, sanDns: Seq[String],
      ecdsa: Boolean): Array[Byte] = {
    val sigOid =
      if (ecdsa) "1.2.840.10045.4.3.2"
      else "1.2.840.113549.1.1.11"
    val keyOid =
      if (ecdsa) "1.2.840.10045.2.1" else "1.2.840.113549.1.1.1"
    val alg = wrap(0x30, derOid(sigOid))
    val keyAlg = wrap(0x30, derOid(keyOid))
    val name = wrap(0x30, rdn("2.5.4.3", cn) ++
      rdn("2.5.4.10", org))
    def utc(year: Int): Array[Byte] =
      wrap(0x17, f"${year % 100}%02d0315120000Z".getBytes("US-ASCII"))
    val validity = wrap(0x30, utc(notBeforeYear) ++
      utc(notBeforeYear + years))
    val serialBytes = {
      val raw = serial.toByteArray
      wrap(0x02, raw)
    }
    val spki = wrap(0x30, keyAlg ++
      wrap(0x03, Array[Byte](0, 0x42, 0x13, 0x37)))
    val extensions =
      if (sanDns.isEmpty) Array.emptyByteArray
      else {
        val generalNames = wrap(0x30, sanDns.flatMap(d =>
          wrap(0x82, d.getBytes("US-ASCII"))).toArray)
        val ext = wrap(0x30, derOid("2.5.29.17") ++
          wrap(0x04, generalNames))
        wrap(0xa3, wrap(0x30, ext))
      }
    val versionField = wrap(0xa0, wrap(0x02, Array[Byte](2)))
    val tbs = wrap(0x30, versionField ++ serialBytes ++ alg ++
      name ++ validity ++ name ++ spki ++ extensions)
    wrap(0x30, tbs ++ alg ++
      wrap(0x03, Array[Byte](0, 0x55, 0x66, 0x77)))
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val certSchema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("serial_hex", StringType),
    StructField("sig_alg", StringType),
    StructField("pubkey_alg", StringType),
    StructField("subject_cn", StringType),
    StructField("subject_o", StringType),
    StructField("self_signed", BooleanType),
    StructField("not_before", StringType),
    StructField("not_after", StringType),
    StructField("n_san_dns", IntegerType),
    StructField("san_dns", StringType)))

  def decodeCert(bytes: Array[Byte]): Seq[Any] =
    certMeta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.serialHex, m.sigAlg,
        m.pubKeyAlg, m.subjectCn, m.subjectO, m.selfSigned,
        m.notBefore, m.notAfter, m.sanDns.length,
        m.sanDns.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null,
        null, null, null, null, null)
    }

  /** Per-doc synth: planted identities cycling, RSA/EC by parity,
    * SANs on every third doc, PEM armor on every fourth.
    */
  def synthCerts(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
    val ii = df.schema.fieldIndex(idCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val sans =
          if (id % 3 == 0)
            (0 until (id % 2 + 1).toInt).map(j =>
              s"alt$j.doc${id % 50}.example")
          else Seq.empty
        val der = certWrite(1000 + id % 9000,
          s"doc${id % 50}.example", s"Org ${id % 7}",
          2024 + (id % 3).toInt, 1 + (id % 2).toInt, sans,
          ecdsa = id % 2 == 1)
        val bytes =
          if (java.lang.Math.floorMod(id, 4L) == 0L) {
            val b64 = java.util.Base64.getMimeEncoder(64,
              "\n".getBytes).encodeToString(der)
            ("-----BEGIN CERTIFICATE-----\n" + b64 +
              "\n-----END CERTIFICATE-----\n").getBytes("US-ASCII")
          } else der
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
