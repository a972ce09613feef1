package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Python pickle census (C227) — ML lakes carry .pkl checkpoints,
  * feature caches and dataset manifests everywhere, and the FIRST
  * question a curation pass asks of an untrusted pickle is not
  * "what's inside" but "what would this import/execute". The wire
  * grammar is public (CPython's pickletools module documents every
  * opcode). This is a CENSUS, not an unpickler: a bounded stack
  * machine replays container/memo/global structure without ever
  * constructing objects or executing anything, and surfaces
  *
  *  - the declared protocol (PROTO arg, 0 for the ASCII dialect),
  *  - opcode / FRAME / memo-put counts,
  *  - the top-level kind (dict/list/tuple/set/str/…/reduce),
  *  - the top-level container length,
  *  - every GLOBAL / STACK_GLOBAL / INST target as `module.name` —
  *    the security-triage fact.
  *
  * Pinning: PickleSpec parses fixtures written by CPython's own
  * pickle at EVERY protocol 0–5 (`tools/pickle_pin.py`) and must
  * replay the facts pickletools recorded at generation time.
  *
  * Totality: None on damage; op/stack/memo bounds; no throw
  * escapes. Scale: per-value map-only work, one linear pass.
  */
object Pickle {

  private val MaxOps = 1 << 20
  private val MaxStack = 1 << 16
  private val MaxMemo = 1 << 20
  private val MaxLine = 1 << 16
  private val KeepStr = 4096

  final case class PickleFacts(protocol: Int, nOps: Int,
      topKind: String, nItems: Option[Int], globals: Seq[String],
      nMemo: Int, nFrames: Int)

  // census value model: structure and kinds only, never contents
  // (strings keep a bounded copy — STACK_GLOBAL needs them)
  private case object PMark
  private final case class PStr(s: String)
  private final case class PVal(kind: String)
  private final class PCont(val kind: String, var n: Int)
  private final case class PGlob(name: String)
  private final class PRed(val name: String)

  private final case class PFail() extends RuntimeException

  /** Census one pickle blob. None on damage or unknown opcodes. */
  def pickleCensus(b: Array[Byte]): Option[PickleFacts] = {
    if (b == null || b.length < 2) return None
    try {
      var p = 0
      val end = b.length
      def u8(): Int = {
        if (p >= end) throw PFail()
        val v = b(p) & 0xff; p += 1; v
      }
      def u16(): Int = u8() | (u8() << 8)
      def u32(): Long = (u16().toLong | (u16().toLong << 16))
      def u64(): Long = u32() | (u32() << 32)
      def skipN(n: Long): Unit = {
        if (n < 0 || n > end - p) throw PFail()
        p += n.toInt
      }
      def takeStr(n: Long): String = {
        if (n < 0 || n > end - p) throw PFail()
        val keep = math.min(n, KeepStr.toLong).toInt
        val s = new String(b, p, keep,
          java.nio.charset.StandardCharsets.UTF_8)
        p += n.toInt
        s
      }
      def line(): String = {
        val start = p
        while (p < end && b(p) != '\n') {
          p += 1
          if (p - start > MaxLine) throw PFail()
        }
        if (p >= end) throw PFail()
        val s = new String(b, start, p - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        p += 1
        s
      }

      val stack = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
      val memo = new scala.collection.mutable.LongMap[AnyRef]()
      val globals = scala.collection.mutable.SortedSet[String]()
      var protocol = 0
      var nOps = 0
      var nMemo = 0
      var nFrames = 0
      var result: AnyRef = null

      def push(v: AnyRef): Unit = {
        if (stack.length >= MaxStack) throw PFail()
        stack += v
      }
      def pop(): AnyRef = {
        if (stack.isEmpty) throw PFail()
        stack.remove(stack.length - 1)
      }
      def top(): AnyRef = {
        if (stack.isEmpty) throw PFail()
        stack(stack.length - 1)
      }
      /** Pop everything above the nearest mark (mark removed too). */
      def popToMark(): Seq[AnyRef] = {
        var i = stack.length - 1
        while (i >= 0 && (stack(i) ne PMark)) i -= 1
        if (i < 0) throw PFail()
        val items = stack.slice(i + 1, stack.length).toSeq
        stack.remove(i, stack.length - i)
        items
      }
      def memoPut(idx: Long): Unit = {
        if (idx < 0 || memo.size >= MaxMemo) throw PFail()
        memo(idx) = top()
        nMemo += 1
      }
      def globalOf(v: AnyRef): String = v match {
        case g: PGlob => g.name
        case _ => "?"
      }
      def intLine(s: String): AnyRef =
        if (s == "01") PVal("bool")
        else if (s == "00") PVal("bool")
        else PVal("int")

      var done = false
      while (!done) {
        if (nOps >= MaxOps) throw PFail()
        nOps += 1
        val op = u8()
        (op: @annotation.switch) match {
          case '(' => push(PMark)
          case '.' =>
            result = pop()
            if (stack.nonEmpty || p != end) throw PFail()
            done = true
          case '0' => pop() // POP
          case '1' => popToMark() // POP_MARK
          case '2' => push(top()) // DUP
          case 'F' => line(); push(PVal("float"))
          case 'I' => push(intLine(line()))
          case 'J' => u32(); push(PVal("int")) // BININT
          case 'K' => u8(); push(PVal("int")) // BININT1
          case 'M' => u16(); push(PVal("int")) // BININT2
          case 'L' => line(); push(PVal("int")) // LONG
          case 'N' => push(PVal("none"))
          case 'P' => line(); push(PVal("persid"))
          case 'Q' => pop(); push(PVal("persid")) // BINPERSID
          case 'R' => // REDUCE: args, callable
            pop(); val callee = pop(); push(new PRed(globalOf(callee)))
          case 'S' => line(); push(PStr("")) // STRING (repr'd)
          case 'T' => push(PStr(takeStr(u32()))) // BINSTRING
          case 'U' => push(PStr(takeStr(u8().toLong)))
          case 'V' => push(PStr(line())) // UNICODE line
          case 'X' => push(PStr(takeStr(u32()))) // BINUNICODE
          case 'B' => skipN(u32()); push(PVal("bytes")) // BINBYTES
          case 'C' => skipN(u8().toLong); push(PVal("bytes"))
          case 'G' => skipN(8); push(PVal("float")) // BINFLOAT
          case 'a' => // APPEND
            pop()
            top() match { case c: PCont => c.n += 1; case _ => () }
          case 'e' => // APPENDS
            val items = popToMark()
            top() match {
              case c: PCont => c.n += items.length
              case _ => ()
            }
          case 'b' => pop() // BUILD: pop state, keep object
          case 'c' => // GLOBAL: two lines
            val mod = line(); val name = line()
            val g = s"$mod.$name"
            globals += g
            push(PGlob(g))
          case 'i' => // INST: mark'd args + two lines
            popToMark()
            val mod = line(); val name = line()
            globals += s"$mod.$name"
            push(new PRed(s"$mod.$name"))
          case 'o' => // OBJ: mark, cls, args
            val items = popToMark()
            if (items.isEmpty) throw PFail()
            push(new PRed(globalOf(items.head)))
          case 'd' => // DICT from mark'd pairs
            val items = popToMark()
            if (items.length % 2 != 0) throw PFail()
            push(new PCont("dict", items.length / 2))
          case '}' => push(new PCont("dict", 0))
          case 'l' =>
            push(new PCont("list", popToMark().length))
          case ']' => push(new PCont("list", 0))
          case 't' =>
            push(new PCont("tuple", popToMark().length))
          case ')' => push(new PCont("tuple", 0))
          case 's' => // SETITEM
            pop(); pop()
            top() match { case c: PCont => c.n += 1; case _ => () }
          case 'u' => // SETITEMS
            val items = popToMark()
            if (items.length % 2 != 0) throw PFail()
            top() match {
              case c: PCont => c.n += items.length / 2
              case _ => ()
            }
          case 'g' => // GET
            val idx = line()
            if (!idx.forall(_.isDigit) || idx.isEmpty ||
              idx.length > 12) throw PFail()
            push(memo.getOrElse(idx.toLong, throw PFail()))
          case 'h' => push(memo.getOrElse(u8().toLong, throw PFail()))
          case 'j' => push(memo.getOrElse(u32(), throw PFail()))
          case 'p' => // PUT
            val idx = line()
            if (!idx.forall(_.isDigit) || idx.isEmpty ||
              idx.length > 12) throw PFail()
            memoPut(idx.toLong)
          case 'q' => memoPut(u8().toLong)
          case 'r' => memoPut(u32())
          case 0x80 => // PROTO
            protocol = u8()
            if (protocol < 1 || protocol > 5) throw PFail()
          case 0x81 => // NEWOBJ: args, cls
            pop(); pop(); push(new PRed("object"))
          case 0x82 => u8(); push(PVal("ext")) // EXT1
          case 0x83 => u16(); push(PVal("ext"))
          case 0x84 => u32(); push(PVal("ext"))
          case 0x85 => // TUPLE1
            pop(); push(new PCont("tuple", 1))
          case 0x86 =>
            pop(); pop(); push(new PCont("tuple", 2))
          case 0x87 =>
            pop(); pop(); pop(); push(new PCont("tuple", 3))
          case 0x88 | 0x89 => push(PVal("bool"))
          case 0x8a => skipN(u8().toLong); push(PVal("int")) // LONG1
          case 0x8b => skipN(u32()); push(PVal("int")) // LONG4
          case 0x8c => push(PStr(takeStr(u8().toLong)))
          case 0x8d => push(PStr(takeStr(u64()))) // BINUNICODE8
          case 0x8e => skipN(u64()); push(PVal("bytes"))
          case 0x8f => push(new PCont("set", 0)) // EMPTY_SET
          case 0x90 => // FROZENSET from mark
            push(new PCont("frozenset", popToMark().length))
          case 0x91 => // ADDITEMS
            val items = popToMark()
            top() match {
              case c: PCont => c.n += items.length
              case _ => ()
            }
          case 0x92 => // NEWOBJ_EX: kwargs, args, cls
            pop(); pop(); pop(); push(new PRed("object"))
          case 0x93 => // STACK_GLOBAL
            val name = pop(); val mod = pop()
            val g = (mod, name) match {
              case (PStr(m), PStr(n)) => s"$m.$n"
              case _ => "?"
            }
            globals += g
            push(PGlob(g))
          case 0x94 => memoPut(memo.size.toLong) // MEMOIZE
          case 0x95 => // FRAME
            val len = u64()
            if (len < 0 || len > end - p) throw PFail()
            nFrames += 1
          case 0x96 => skipN(u64()); push(PVal("bytes")) // BYTEARRAY8
          case 0x97 => push(PVal("buffer")) // NEXT_BUFFER
          case 0x98 => () // READONLY_BUFFER
          case _ => throw PFail()
        }
      }

      val (kind, nItems) = result match {
        case c: PCont => (c.kind, Some(c.n))
        case _: PStr => ("str", None)
        case PVal(k) => (k, None)
        case _: PGlob => ("global", None)
        case _: PRed => ("reduce", None)
        case _ => throw PFail()
      }
      Some(PickleFacts(protocol, nOps, kind, nItems,
        globals.toSeq, nMemo, nFrames))
    } catch {
      case _: PFail => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  // ---------------------------------------------------------------
  // writer (synth): planted structures in the proto-0/2/4 dialects
  // ---------------------------------------------------------------

  private def w32(out: java.io.ByteArrayOutputStream, v: Long)
      : Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 24) & 0xff).toInt)
  }

  /** proto-2 dict of n (str key, int value) pairs. */
  def writeDict2(docId: Long, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2)
    out.write('}'); out.write('(')
    (0 until n).foreach { i =>
      val k = s"k$i".getBytes("UTF-8")
      out.write('X'); w32(out, k.length.toLong); out.write(k)
      out.write('J'); w32(out, docId + i)
    }
    out.write('u'); out.write('.')
    out.toByteArray
  }

  /** proto-4 framed list of m ints, memoized. */
  def writeList4(docId: Long, m: Int): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write(']'); body.write(0x94); body.write('(')
    (0 until m).foreach { i => body.write('J'); w32(body, docId + i) }
    body.write('e'); body.write('.')
    val frame = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(4)
    out.write(0x95) // FRAME
    var j = 0
    var len = frame.length.toLong
    while (j < 8) { out.write((len & 0xff).toInt); len >>= 8; j += 1 }
    out.write(frame)
    out.toByteArray
  }

  /** proto-2 (int, str, None) TUPLE3. */
  def writeTuple2(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2)
    out.write('J'); w32(out, docId)
    out.write('X'); w32(out, 1L); out.write('s')
    out.write('N'); out.write(0x87); out.write('.')
    out.toByteArray
  }

  /** proto-2 REDUCE of collections.OrderedDict(). */
  def writeReduce2(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x80); out.write(2)
    out.write('c')
    out.write("collections\nOrderedDict\n".getBytes("US-ASCII"))
    out.write(')'); out.write('R'); out.write('.')
    out.toByteArray
  }

  /** proto-0 ASCII dict of n pairs. */
  def writeDict0(docId: Long, n: Int): Array[Byte] = {
    val sb = new StringBuilder("(")
    (0 until n).foreach { i =>
      sb.append(s"S'k$i'\n").append(s"I${docId + 2 * i}\n")
    }
    sb.append("d.")
    sb.toString.getBytes("US-ASCII")
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val pickleSchema: StructType = StructType(Seq(
    StructField("protocol", IntegerType),
    StructField("n_ops", IntegerType),
    StructField("top_kind", StringType),
    StructField("n_items", IntegerType),
    StructField("globals_csv", StringType),
    StructField("n_memo", IntegerType),
    StructField("n_frames", IntegerType)))

  def decodePickle(bytes: Array[Byte]): Seq[Any] =
    pickleCensus(bytes) match {
      case Some(f) => Seq[Any](f.protocol, f.nOps, f.topKind,
        f.nItems.map(java.lang.Integer.valueOf).orNull,
        f.globals.mkString(","), f.nMemo, f.nFrames)
      case None => Seq[Any](null, null, null, null, null, null, null)
    }

  /** Per-doc synth: five planted pickle shapes cycling on doc_id. */
  def synthPickles(df: DataFrame, idCol: String, outCol: String)
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
        val bytes = java.lang.Math.floorMod(id, 5L).toInt match {
          case 0 => writeDict2(id, (id % 6 + 2).toInt)
          case 1 => writeList4(id, (id % 4 + 1).toInt)
          case 2 => writeTuple2(id)
          case 3 => writeReduce2()
          case _ => writeDict0(id, (id % 3 + 1).toInt)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
