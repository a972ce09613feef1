package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** Jupyter notebook (.ipynb) text extraction — the dominant
  * code-plus-prose format of the scientific-computing web, and a
  * first-class training corpus in its own right.
  *
  * The reference repo ingests only CSV
  * (`/root/reference/src/trousse/dataset.py:341`); notebooks on a
  * crawl previously fell through to the JSON/text fallback, yielding
  * raw JSON with its escaping as "text". This parses the real
  * nbformat structure (public schema, nbformat.readthedocs.io):
  *
  *  - nbformat 4: top-level `cells`; nbformat 3: `worksheets[*]
  *    .cells` — both walked in order.
  *  - Per cell, `source` is EITHER one string or a list of line
  *    strings to concatenate (both live in the wild; the official
  *    reader normalizes exactly this way); v3 code cells spell it
  *    `input`.
  *  - markdown + code + raw sources are collected in cell order and
  *    joined with one `\n`; outputs (stream text, rich MIME bundles,
  *    tracebacks) are NOT text the author wrote — excluded, the same
  *    call nbconvert's text exporters make by default.
  *  - language from `metadata.language_info.name`, falling back to
  *    `metadata.kernelspec.language`, else empty.
  *
  * Malformed JSON, a non-object root, or a structurally alien object
  * (no `cells`/`worksheets`) → None — never raw-JSON-as-text.
  * Per-row byte work inside [[Multimodal.decodeBatches]] — map-only,
  * no shuffle; scales with input bytes at 100 TB like the other
  * decoders.
  */
object Ipynb {

  private object IpynbFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private val MaxText = 16 << 20

  /** Decoded notebook: sources joined in cell order, cell census,
    * code-cell census, kernel language.
    */
  final case class IpynbDoc(text: String, nCells: Int,
      nCodeCells: Int, language: String)

  private def asObj(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => throw IpynbFail
  }
  private def asArr(v: Any): Vector[Any] = v match {
    case a: Vector[_] => a.asInstanceOf[Vector[Any]]
    case _ => throw IpynbFail
  }

  /** nbformat's source normalization: one string, or a list of line
    * strings concatenated verbatim (lines already carry their own
    * trailing `\n`).
    */
  private def sourceText(v: Any): String = v match {
    case s: String => s
    case a: Vector[_] =>
      val sb = new java.lang.StringBuilder
      a.foreach {
        case s: String =>
          sb.append(s)
          if (sb.length > MaxText) throw IpynbFail
        case _ => throw IpynbFail
      }
      sb.toString
    case null => ""
    case _ => throw IpynbFail
  }

  /** Parse a notebook to its authored text. None on malformed JSON
    * or a structurally alien document.
    */
  def ipynbText(b: Array[Byte]): Option[IpynbDoc] = {
    if (b == null || b.length < 2) return None
    try {
      val root = MiniJson.parse(
        new String(b, StandardCharsets.UTF_8)) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return None
      }
      val cells: Vector[Map[String, Any]] = root.get("cells") match {
        case Some(a) => asArr(a).map(asObj)
        case None => root.get("worksheets") match {
          case Some(ws) =>
            asArr(ws).flatMap(w =>
              asArr(asObj(w).getOrElse("cells", Vector.empty))
                .map(asObj))
          case None => return None
        }
      }
      val meta = root.get("metadata").map(asObj).getOrElse(Map.empty)
      val language = meta.get("language_info").map(asObj)
        .flatMap(_.get("name")) match {
        case Some(s: String) => s
        case _ => meta.get("kernelspec").map(asObj)
          .flatMap(_.get("language")) match {
          case Some(s: String) => s
          case _ => ""
        }
      }
      val parts = new scala.collection.mutable.ArrayBuffer[String](
        cells.length)
      var nCode = 0
      var total = 0L
      cells.foreach { c =>
        val tpe = c.getOrElse("cell_type", "") match {
          case s: String => s
          case _ => throw IpynbFail
        }
        val isCode = tpe == "code"
        if (isCode) nCode += 1
        // v3 spells a code cell's source "input"
        val src = c.get("source").orElse(
          if (isCode) c.get("input") else None)
        val t = sourceText(src.orNull)
        total += t.length
        if (total > MaxText) throw IpynbFail
        parts += t
      }
      Some(IpynbDoc(parts.mkString("\n"), cells.length, nCode,
        language))
    } catch {
      case IpynbFail => None
      case _: graft.core.MalformedSidecarException => None
    }
  }

  // ------------------------------------------------------------------
  // fixture writer
  // ------------------------------------------------------------------

  private[graft] def jsonStr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  /** `source` as nbformat's list-of-lines form: split AFTER each
    * newline, every line keeping its `\n` (the official writer's
    * convention).
    */
  private def asLines(s: String): String = {
    if (s.isEmpty) return "[]"
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') {
        lines += s.substring(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < s.length) lines += s.substring(start)
    lines.map(jsonStr).mkString("[", ", ", "]")
  }

  /** A real notebook holding one markdown cell (`md`) and one python
    * code cell (`code`). mode 0: nbformat 4, string sources; mode 1:
    * nbformat 4, list-of-lines sources; mode 2: nbformat 3 with
    * `worksheets` and the code cell's `input` spelling.
    */
  def ipynbWrite(md: String, code: String, mode: Int): Array[Byte] = {
    val m = ((mode % 3) + 3) % 3
    val src: String => String =
      if (m == 1) asLines else (s => jsonStr(s))
    val json = m match {
      case 2 =>
        s"""{
 "metadata": {"name": "fixture", "language_info": {"name": "python"}},
 "nbformat": 3, "nbformat_minor": 0,
 "worksheets": [{"cells": [
  {"cell_type": "markdown", "source": ${asLines(md)}, "metadata": {}},
  {"cell_type": "code", "input": ${asLines(code)}, "language": "python",
   "outputs": [{"output_type": "stream", "stream": "stdout",
                "text": ["never authored text\\n"]}],
   "collapsed": false, "metadata": {}}
 ]}]
}"""
      case _ =>
        s"""{
 "cells": [
  {"cell_type": "markdown", "metadata": {}, "source": ${src(md)}},
  {"cell_type": "code", "execution_count": 1, "metadata": {},
   "outputs": [
    {"output_type": "stream", "name": "stdout",
     "text": ["decoy output, not authored\\n"]},
    {"output_type": "execute_result", "execution_count": 1,
     "data": {"text/plain": ["'decoy result'"]}, "metadata": {}}
   ],
   "source": ${src(code)}}
 ],
 "metadata": {
  "kernelspec": {"display_name": "Python 3", "language": "python",
                 "name": "python3"},
  "language_info": {"name": "python", "version": "3.11.0"}
 },
 "nbformat": 4, "nbformat_minor": 5
}"""
    }
    json.getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------------
  // Spark plumbing
  // ------------------------------------------------------------------

  val ipynbSchema: StructType = StructType(Seq(
    StructField("nb_text", StringType),
    StructField("n_cells", IntegerType),
    StructField("n_code_cells", IntegerType),
    StructField("language", StringType)))

  /** Decode kernel for [[Multimodal.decodeBatches]]. */
  def decodeIpynb(bytes: Array[Byte]): Seq[Any] =
    ipynbText(bytes) match {
      case Some(IpynbDoc(t, nC, nCo, lang)) =>
        Seq[Any](t, nC, nCo, lang)
      case None => Seq[Any](null, null, null, null)
    }

  /** Per-row .ipynb synthesizer (map-only): the row's text as the
    * markdown cell, a fixed code cell, layout mode rotating on
    * doc_id so all three nbformat spellings are exercised.
    */
  def synthIpynb(df: DataFrame, idCol: String, textCol: String,
      outCol: String, code: String): DataFrame = {
    val (ii, ti) = (df.schema.fieldIndex(idCol),
      df.schema.fieldIndex(textCol))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(ti)).getOrElse("")
        val id = r.get(ii) match {
          case l: java.lang.Long => l.longValue()
          case x => x.hashCode().toLong
        }
        Row.fromSeq(r.toSeq :+
          ipynbWrite(text, code, (id % 3).toInt))
      }
    }(enc)
  }
}
