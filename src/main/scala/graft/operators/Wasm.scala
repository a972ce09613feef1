package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WebAssembly module triage (the public wasm binary spec — .wasm
  * blobs are all over web crawls): `\0asm` + version, then a
  * section walk (id byte + LEB128 size) yielding a section census,
  * custom-section names, the import and export tables (module/
  * field names and kinds), and the start-function flag. Function
  * bodies are never validated or executed — triage only.
  *
  * Pinning: no wasm toolchain exists in this environment (probed:
  * wat2wasm/wasm-tools absent), but Node 20 carries the real
  * WebAssembly validator — the in-repo writer's modules construct
  * cleanly as `new WebAssembly.Module(bytes)` and its exports
  * enumerate to the planted names (WasmPinGen records the run),
  * which pins the emitted section/type/code layout against a
  * production implementation.
  *
  * Totality: None on damage (torn LEB, size past buffer, repeated
  * non-custom sections out of order are accepted — order policing
  * is the validator's job, not triage's — but structural lies
  * refuse). Scale: per-value, map-only.
  */
object Wasm {

  private val MaxItems = 100000

  final case class WasmMeta(version: Int, nSections: Int,
      sectionIds: Seq[Int], customNames: Seq[String],
      nImports: Int, nExports: Int, exportNames: Seq[String],
      hasStart: Boolean)

  private final case class WFail() extends RuntimeException

  private final class R(val b: Array[Byte], var p: Int,
      val end: Int) {
    def u8(): Int = {
      if (p >= end) throw WFail()
      val v = b(p) & 0xff; p += 1; v
    }
    def leb(): Long = {
      var v = 0L
      var shift = 0
      while (true) {
        if (shift > 35) throw WFail()
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      0L
    }
    def name(): String = {
      val n = leb()
      if (n < 0 || n > end - p) throw WFail()
      val s = new String(b, p, n.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      p += n.toInt
      s
    }
  }

  def wasmMeta(b: Array[Byte]): Option[WasmMeta] = {
    if (b == null || b.length < 8) return None
    if (!(b(0) == 0 && b(1) == 'a' && b(2) == 's' && b(3) == 'm'))
      return None
    val version = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
      ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
    try {
      val r = new R(b, 8, b.length)
      val ids = Seq.newBuilder[Int]
      val customs = Seq.newBuilder[String]
      val exports = Seq.newBuilder[String]
      var nSections = 0
      var nImports = 0
      var nExports = 0
      var hasStart = false
      while (r.p < r.end) {
        val id = r.u8()
        if (id > 12) throw WFail()
        val size = r.leb()
        if (size < 0 || size > r.end - r.p) throw WFail()
        val bodyEnd = r.p + size.toInt
        nSections += 1
        if (nSections > MaxItems) throw WFail()
        ids += id
        val s = new R(b, r.p, bodyEnd)
        id match {
          case 0 => customs += s.name()
          case 2 =>
            val n = s.leb()
            if (n < 0 || n > MaxItems) throw WFail()
            var i = 0L
            while (i < n) {
              s.name(); s.name() // module, field
              val kind = s.u8()
              kind match {
                case 0 => s.leb() // func type index
                case 1 => // table: reftype + limits
                  s.u8()
                  val f = s.u8()
                  s.leb(); if (f == 1) s.leb()
                case 2 => // memory limits
                  val f = s.u8()
                  s.leb(); if (f == 1) s.leb()
                case 3 => s.u8(); s.u8() // global type + mut
                case _ => throw WFail()
              }
              nImports += 1
              i += 1
            }
          case 7 =>
            val n = s.leb()
            if (n < 0 || n > MaxItems) throw WFail()
            var i = 0L
            while (i < n) {
              exports += s.name()
              s.u8(); s.leb() // kind, index
              nExports += 1
              i += 1
            }
          case 8 => hasStart = true
          case _ => ()
        }
        r.p = bodyEnd
      }
      Some(WasmMeta(version, nSections, ids.result(),
        customs.result(), nImports, nExports, exports.result(),
        hasStart))
    } catch {
      case _: WFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer: a VALID module (Node's WebAssembly.Module accepts it)
  // ---------------------------------------------------------------

  def wasmWrite(exportNames: Seq[String], customName: String)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def leb(v: Long): Unit = {
      var x = v
      do {
        val part = (x & 0x7f).toInt
        x >>>= 7
        out.write(if (x != 0) part | 0x80 else part)
      } while (x != 0)
    }
    def lebTo(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      var x = v
      do {
        val part = (x & 0x7f).toInt
        x >>>= 7
        o.write(if (x != 0) part | 0x80 else part)
      } while (x != 0)
    }
    def section(id: Int)(body: java.io.ByteArrayOutputStream
        => Unit): Unit = {
      val s = new java.io.ByteArrayOutputStream()
      body(s)
      out.write(id)
      leb(s.size.toLong)
      s.writeTo(out)
    }
    def nameTo(o: java.io.ByteArrayOutputStream, s: String)
        : Unit = {
      val d = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      lebTo(o, d.length.toLong)
      o.write(d, 0, d.length)
    }
    out.write(Array[Byte](0, 'a', 's', 'm', 1, 0, 0, 0), 0, 8)
    val n = exportNames.length
    section(1) { s => // types: one () -> ()
      lebTo(s, 1); s.write(0x60); lebTo(s, 0); lebTo(s, 0)
    }
    section(3) { s => // functions: n of type 0
      lebTo(s, n.toLong)
      (0 until n).foreach(_ => lebTo(s, 0))
    }
    section(7) { s => // exports
      lebTo(s, n.toLong)
      exportNames.zipWithIndex.foreach { case (nm, i) =>
        nameTo(s, nm); s.write(0); lebTo(s, i.toLong)
      }
    }
    section(10) { s => // code: empty bodies
      lebTo(s, n.toLong)
      (0 until n).foreach { _ =>
        lebTo(s, 2) // body size
        lebTo(s, 0) // no locals
        s.write(0x0b) // end
      }
    }
    section(0) { s => // custom
      nameTo(s, customName)
      s.write("graft".getBytes, 0, 5)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val wasmSchema: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("n_sections", IntegerType),
    StructField("section_ids", StringType),
    StructField("n_exports", IntegerType),
    StructField("export_names", StringType),
    StructField("custom_names", StringType)))

  def decodeWasm(bytes: Array[Byte]): Seq[Any] =
    wasmMeta(bytes) match {
      case Some(m) => Seq[Any](m.version, m.nSections,
        m.sectionIds.mkString(","), m.nExports,
        m.exportNames.mkString(","), m.customNames.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-row synth: `n` planted exports + a custom section. */
  def synthWasms(df: DataFrame, idCol: String, nCol: String,
      outCol: String): DataFrame = {
    val (ii, ni) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(nCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        val n = r.getInt(ni)
        val bytes = wasmWrite((0 until n).map(j => s"fn$j"),
          s"meta$id")
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
