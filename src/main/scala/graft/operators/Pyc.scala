package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Python .pyc triage (C242) — compiled bytecode caches ride every
  * Python code drop. The header is public (importlib's pyc layout):
  * a version-specific 4-byte magic, a 4-byte flags word (bit 0 =
  * hash-based invalidation, bit 1 = check_source), then either
  * mtime+size or an 8-byte source hash, then the MARSHAL'd module
  * code object.
  *
  * Marshal is version-specific BY DESIGN (CPython's marshal.c says
  * so), so the triage is tiered the honest way: every known magic
  * maps to its Python version (the public importlib table), and
  * the FULL census — code-object count, top-level names, const
  * counts — runs only for the 3.11 layout this environment's
  * CPython can pin ([MAGIC 3495]); other versions surface
  * version + invalidation and refuse the census rather than guess
  * at a layout nobody here can verify.
  *
  * The walk is a structure census in the C227 mold: it never
  * builds code objects, tracks the FLAG_REF table exactly as
  * r_object does (reserve before children, fill after), and keeps
  * bounded string contents only to surface name lists.
  *
  * Pinning: PycSpec replays fixtures CPython's own py_compile
  * wrote in both invalidation modes against the facts marshal/dis
  * recorded at generation time.
  *
  * Totality: None on damage. Scale: per-value map-only.
  */
object Pyc {

  /** The public importlib magic table (selected stable releases). */
  val MagicVersions: Map[Int, String] = Map(
    3413 -> "3.8", 3425 -> "3.9", 3439 -> "3.10", 3495 -> "3.11",
    3531 -> "3.12", 3571 -> "3.13")

  private val CensusMagic = 3495 // the layout CPython here pins

  private val MaxItems = 1 << 20
  private val MaxDepth = 128
  private val KeepStr = 4096

  final case class PycFacts(version: String, invalidation: String,
      sourceSize: Option[Long], nCode: Option[Int],
      topName: Option[String], names: Option[Seq[String]],
      nConsts: Option[Int])

  private final case class YFail() extends RuntimeException

  /** One walked value: kind, bounded text (strings; for tuples of
    * strings a comma-joined list), and container length.
    */
  private final case class V(kind: String, s: String,
      n: Int = -1)

  /** Walk one pyc. None on damage or an unknown magic. */
  def pycFacts(b: Array[Byte]): Option[PycFacts] = {
    if (b == null || b.length < 16) return None
    if ((b(2) & 0xff) != 0x0d || (b(3) & 0xff) != 0x0a) return None
    val magic = (b(0) & 0xff) | ((b(1) & 0xff) << 8)
    val version = MagicVersions.getOrElse(magic, return None)
    val flags = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
      ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    if ((flags & ~3) != 0) return None
    val hashBased = (flags & 1) != 0
    val invalidation =
      if (!hashBased) "timestamp"
      else if ((flags & 2) != 0) "checked_hash"
      else "unchecked_hash"
    val sourceSize =
      if (hashBased) None
      else Some((b(12) & 0xffL) | ((b(13) & 0xffL) << 8) |
        ((b(14) & 0xffL) << 16) | ((b(15) & 0xffL) << 24))
    if (magic != CensusMagic)
      return Some(PycFacts(version, invalidation, sourceSize,
        None, None, None, None))
    try {
      var p = 16
      var nItems = 0
      var nCode = 0
      var topName: String = null
      var topNames: Seq[String] = null
      var topConsts = -1
      val refs = scala.collection.mutable.ArrayBuffer[V]()

      def u8(): Int = {
        if (p >= b.length) throw YFail()
        val v = b(p) & 0xff; p += 1; v
      }
      def i32(): Int = u8() | (u8() << 8) | (u8() << 16) |
        (u8() << 24)
      def take(n: Long): (Int, Int) = {
        if (n < 0 || n > b.length - p) throw YFail()
        val r = (p, p + n.toInt); p += n.toInt; r
      }
      def str(n: Long): String = {
        val (f, u) = take(n)
        new String(b, f, math.min(u - f, KeepStr),
          java.nio.charset.StandardCharsets.UTF_8)
      }

      def obj(depth: Int): V = {
        if (depth > MaxDepth) throw YFail()
        nItems += 1
        if (nItems > MaxItems) throw YFail()
        val t0 = u8()
        val flagged = (t0 & 0x80) != 0
        val t = t0 & 0x7f
        // r_object reserves the ref slot BEFORE children
        val refAt = if (flagged) {
          refs += null
          refs.length - 1
        } else -1
        def done(v: V): V = {
          if (refAt >= 0) refs(refAt) = v
          v
        }
        (t: @annotation.switch) match {
          case '0' => done(V("null", null))
          case 'N' => done(V("none", null))
          case 'F' | 'T' => done(V("bool", null))
          case 'S' => done(V("stopiter", null))
          case '.' => done(V("ellipsis", null))
          case 'i' => i32(); done(V("int", null))
          case 'I' => take(8); done(V("int", null))
          case 'g' => take(8); done(V("float", null))
          case 'y' => take(16); done(V("complex", null))
          case 'f' => str(u8().toLong); done(V("float", null))
          case 'x' => str(u8().toLong); done(V("complex", null))
          case 'l' =>
            val n = i32()
            take(2L * math.abs(n))
            done(V("long", null))
          case 's' => take(i32().toLong); done(V("bytes", null))
          case 'u' | 't' | 'a' | 'A' =>
            done(V("str", str(i32().toLong)))
          case 'z' | 'Z' => done(V("str", str(u8().toLong)))
          case 'r' =>
            val idx = i32()
            if (idx < 0 || idx >= refs.length ||
              refs(idx) == null) throw YFail()
            // a ref does not re-register
            refs(idx)
          case '(' | '[' | '<' | '>' =>
            val n = i32()
            if (n < 0 || n > MaxItems) throw YFail()
            val items = (0 until n).map(_ => obj(depth + 1))
            done(V(if (t == '(') "tuple" else "seq",
              if (items.nonEmpty && items.forall(_.kind == "str"))
                items.map(_.s).mkString(",")
              else null, n))
          case ')' =>
            val n = u8()
            val items = (0 until n).map(_ => obj(depth + 1))
            done(V("tuple",
              if (items.nonEmpty && items.forall(_.kind == "str"))
                items.map(_.s).mkString(",")
              else null, n))
          case '{' =>
            var going = true
            while (going) {
              val k = obj(depth + 1)
              if (k.kind == "null") going = false
              else obj(depth + 1)
            }
            done(V("dict", null))
          case 'c' => // 3.11 code layout, 16 fields in w_code order
            nCode += 1
            val codeAt = nCode
            i32(); i32(); i32(); i32(); i32() // counts + flags
            obj(depth + 1) // co_code
            val consts = obj(depth + 1)
            val names = obj(depth + 1)
            obj(depth + 1) // localsplusnames
            obj(depth + 1) // localspluskinds
            obj(depth + 1) // filename
            val name = obj(depth + 1)
            obj(depth + 1) // qualname
            i32() // firstlineno
            obj(depth + 1) // linetable
            obj(depth + 1) // exceptiontable
            if (codeAt == 1) {
              topName = name.s
              topNames =
                if (names.s == null) Seq.empty
                else names.s.split(',').toSeq
              topConsts = math.max(consts.n, 0)
            }
            done(V("code", name.s))
          case _ => throw YFail()
        }
      }

      val top = obj(0)
      if (top.kind != "code" || p != b.length) throw YFail()
      Some(PycFacts(version, invalidation, sourceSize,
        Some(nCode), Option(topName),
        Option(topNames), if (topConsts < 0) None
        else Some(topConsts)))
    } catch {
      case _: YFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (synth): a minimal 3.11-layout module code object
  // ---------------------------------------------------------------

  def pycWrite(names: Seq[String], nConsts: Int,
      hashBased: Boolean, sourceSize: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      var i = 0
      while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    out.write(0xA7); out.write(0x0D) // magic 3495
    out.write(0x0D); out.write(0x0A)
    w32(if (hashBased) 3L else 0L)
    if (hashBased) { w32(0x11223344L); w32(0x55667788L) }
    else { w32(1700000000L); w32(sourceSize) }
    def shortAscii(s: String): Unit = {
      out.write('Z'); out.write(s.length)
      out.write(s.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
    }
    def bytesObj(bs: Array[Byte]): Unit = {
      out.write('s'); w32(bs.length.toLong); out.write(bs)
    }
    // module code object (not ref-flagged: the census needs no ref)
    out.write('c')
    w32(0L); w32(0L); w32(0L); w32(1L); w32(0L)
    bytesObj(Array[Byte](0x64, 0x00, 0x53, 0x00)) // RETURN-ish
    // consts: small tuple of n ints
    out.write(')'); out.write(nConsts)
    (0 until nConsts).foreach { i =>
      out.write('i'); w32(i.toLong)
    }
    out.write(')'); out.write(names.length)
    names.foreach(shortAscii)
    out.write(')'); out.write(0) // localsplusnames
    bytesObj(Array.emptyByteArray) // localspluskinds
    shortAscii("fx.py") // filename
    shortAscii("<module>") // name
    shortAscii("<module>") // qualname
    w32(1L)
    bytesObj(Array.emptyByteArray) // linetable
    bytesObj(Array.emptyByteArray) // exceptiontable
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val pycSchema: StructType = StructType(Seq(
    StructField("py_version", StringType),
    StructField("invalidation", StringType),
    StructField("source_size", LongType),
    StructField("n_code", IntegerType),
    StructField("top_name", StringType),
    StructField("names_csv", StringType),
    StructField("n_consts", IntegerType)))

  def decodePyc(bytes: Array[Byte]): Seq[Any] =
    pycFacts(bytes) match {
      case Some(f) => Seq[Any](f.version, f.invalidation,
        f.sourceSize.map(java.lang.Long.valueOf).orNull,
        f.nCode.map(java.lang.Integer.valueOf).orNull,
        f.topName.orNull, f.names.map(_.mkString(",")).orNull,
        f.nConsts.map(java.lang.Integer.valueOf).orNull)
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-doc synth: planted name/const shapes, both invalidation
    * modes cycling by parity.
    */
  def synthPycs(df: DataFrame, idCol: String, outCol: String)
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
        val n = (id % 4 + 1).toInt
        val names = (0 until n).map(j => s"name$j")
        val bytes = pycWrite(names, (id % 3 + 1).toInt,
          hashBased = id % 2 == 1, sourceSize = 100 + id % 900)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
