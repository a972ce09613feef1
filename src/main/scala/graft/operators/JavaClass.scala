package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Java .class file triage (the public JVMS ClassFile grammar —
  * compiled code rides along in every code corpus and JAR, and the
  * curation decision needs the facts without a classloader):
  * magic/version, the full constant-pool walk (all 17 tags, with
  * Long/Double taking two slots — the classic off-by-one), this/
  * super class names through Class→Utf8 indirection, interface
  * count, field/method censuses with names and descriptors, and
  * the SourceFile attribute when present.
  *
  * Pinning: fixtures are javac-compiled (17.0.20) and asserted
  * against `javap`-recorded facts; the in-repo writer emits
  * minimal-but-valid class files that `javap -p` itself
  * disassembles with the planted names (JavaClassPinGen records
  * the run).
  *
  * Totality: None on damage; bounds everywhere; attribute bodies
  * are skipped by declared length, never parsed. Scale: per-value,
  * map-only.
  */
object JavaClass {

  private val MaxPool = 65535

  final case class ClassMeta(major: Int, className: String,
      superName: String, nInterfaces: Int, nFields: Int,
      nMethods: Int, methodNames: Seq[String], sourceFile: String)

  private final case class CFail() extends RuntimeException

  def classMeta(b: Array[Byte]): Option[ClassMeta] = {
    if (b == null || b.length < 24) return None
    def u1(o: Int): Int = {
      if (o >= b.length) throw CFail()
      b(o) & 0xff
    }
    def u2(o: Int): Int = {
      if (o + 2 > b.length) throw CFail()
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u4(o: Int): Long = {
      if (o + 4 > b.length) throw CFail()
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }
    if (u4(0) != 0xcafebabeL) return None
    try {
      val major = u2(6)
      val cpCount = u2(8)
      if (cpCount <= 0 || cpCount > MaxPool) return None
      // constant pool: record Utf8 strings and Class name indices
      val utf8 = new Array[String](cpCount)
      val classIdx = new Array[Int](cpCount)
      var p = 10
      var i = 1
      while (i < cpCount) {
        val tag = u1(p)
        tag match {
          case 1 =>
            val len = u2(p + 1)
            if (p + 3 + len > b.length) throw CFail()
            utf8(i) = new String(b, p + 3, len,
              java.nio.charset.StandardCharsets.UTF_8)
            p += 3 + len
          case 3 | 4 => p += 5
          case 5 | 6 => p += 9; i += 1 // two slots
          case 7 =>
            classIdx(i) = u2(p + 1); p += 3
          case 8 | 16 | 19 | 20 => p += 3
          case 9 | 10 | 11 | 12 | 17 | 18 => p += 5
          case 15 => p += 4
          case _ => throw CFail()
        }
        i += 1
      }
      def className(idx: Int): String = {
        if (idx == 0) return "" // java.lang.Object's super
        if (idx >= cpCount || classIdx(idx) == 0) throw CFail()
        val n = classIdx(idx)
        if (n >= cpCount || utf8(n) == null) throw CFail()
        utf8(n).replace('/', '.')
      }
      // access, this, super, interfaces
      val thisName = className(u2(p + 2))
      val superName = className(u2(p + 4))
      val nIfaces = u2(p + 6)
      p += 8 + 2 * nIfaces
      var sourceFile = ""
      /** fields/methods share one member layout. */
      def members(collect: Boolean): Seq[String] = {
        val n = u2(p)
        p += 2
        val names = Seq.newBuilder[String]
        var k = 0
        while (k < n) {
          val nameIdx = u2(p + 2)
          if (nameIdx >= cpCount || utf8(nameIdx) == null)
            throw CFail()
          if (collect) names += utf8(nameIdx)
          val nAttrs = u2(p + 6)
          p += 8
          var a = 0
          while (a < nAttrs) {
            val len = u4(p + 2)
            if (len < 0 || p + 6 + len > b.length) throw CFail()
            p += 6 + len.toInt
            a += 1
          }
          k += 1
        }
        names.result()
      }
      val nFields = u2(p)
      members(collect = false) // fields (count read inside again)
      val methodNames = {
        val n = u2(p)
        val res = members(collect = true)
        if (res.length != n) throw CFail()
        res
      }
      // class attributes: surface SourceFile
      val nAttrs = u2(p)
      p += 2
      var a = 0
      while (a < nAttrs) {
        val nameIdx = u2(p)
        val len = u4(p + 2)
        if (len < 0 || p + 6 + len > b.length) throw CFail()
        if (nameIdx < cpCount && utf8(nameIdx) == "SourceFile" &&
          len == 2) {
          val si = u2(p + 6)
          if (si < cpCount && utf8(si) != null) sourceFile = utf8(si)
        }
        p += 6 + len.toInt
        a += 1
      }
      Some(ClassMeta(major, thisName, superName, nIfaces, nFields,
        methodNames.length, methodNames, sourceFile))
    } catch {
      case _: CFail => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  // ---------------------------------------------------------------
  // writer: a minimal-but-valid class (javap disassembles it)
  // ---------------------------------------------------------------

  def classWrite(className: String, methodNames: Seq[String],
      nFields: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w1(v: Int): Unit = out.write(v & 0xff)
    def w2(v: Int): Unit = { w1(v >> 8); w1(v) }
    def w4(v: Long): Unit = { w2((v >> 16).toInt); w2(v.toInt) }
    def utf8(s: String): Unit = {
      val d = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      w1(1); w2(d.length); out.write(d, 0, d.length)
    }
    w4(0xcafebabeL)
    w2(0); w2(52) // Java 8 — every javap reads it
    // pool: 1 this-utf8, 2 this-class, 3 super-utf8, 4 super-class,
    // 5 "()V", 6.. method utf8s, then field utf8s, then "I"
    val nM = methodNames.length
    val cpCount = 6 + nM + nFields + 1
    w2(cpCount)
    utf8(className.replace('.', '/')) // 1
    w1(7); w2(1) // 2: Class(this)
    utf8("java/lang/Object") // 3
    w1(7); w2(3) // 4: Class(super)
    utf8("()V") // 5
    methodNames.foreach(utf8) // 6 .. 5+nM
    (0 until nFields).foreach(j => utf8(s"f$j")) // field names
    utf8("I") // last: field descriptor
    w2(0x0021) // ACC_PUBLIC | ACC_SUPER
    w2(2); w2(4) // this, super
    w2(0) // interfaces
    w2(nFields)
    for (j <- 0 until nFields) {
      w2(0x0002) // private
      w2(6 + nM + j) // name
      w2(cpCount - 1) // "I"
      w2(0) // no attributes
    }
    w2(nM)
    for (j <- 0 until nM) {
      w2(0x0401) // public abstract (no Code attribute needed)
      w2(6 + j)
      w2(5) // "()V"
      w2(0)
    }
    w2(0) // class attributes
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val classSchema: StructType = StructType(Seq(
    StructField("major", IntegerType),
    StructField("class_name", StringType),
    StructField("super_name", StringType),
    StructField("n_fields", IntegerType),
    StructField("n_methods", IntegerType),
    StructField("method_names", StringType)))

  def decodeClass(bytes: Array[Byte]): Seq[Any] =
    classMeta(bytes) match {
      case Some(m) => Seq[Any](m.major, m.className, m.superName,
        m.nFields, m.nMethods, m.methodNames.mkString(","))
      case None => Seq[Any](null, null, null, null, null, null)
    }

  /** Per-row synth: planted class/method/field shapes. */
  def synthClasses(df: DataFrame, idCol: String, nCol: String,
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
        val bytes = classWrite(s"corpus.Doc$id",
          (0 until n).map(j => s"m$j"),
          java.lang.Math.floorMod(id, 3L).toInt)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
