package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** JSON-Lines census (C237) — training corpora SHIP as .jsonl;
  * before any pipeline trusts a drop it wants the malformed-line
  * rate, the shape mix and the key vocabulary, per file, without a
  * schema. Unlike the C236 Delta census this never refuses: a
  * quality measure must survive garbage by definition — invalid
  * lines are the signal, not an error.
  *
  * Surfaced per blob: non-empty line count, valid/invalid JSON
  * counts, object/array/scalar shape mix, and the distinct
  * top-level key count across object lines (the vocabulary a
  * schema-inference pass would see).
  *
  * Scale: per-value map-only text work, one pass, bounded key set.
  */
object Jsonl {

  private val MaxKeys = 100000

  final case class JsonlFacts(nLines: Int, nValid: Int,
      nInvalid: Int, nObjects: Int, nArrays: Int, nScalars: Int,
      nDistinctKeys: Int)

  /** Census one jsonl blob; total by construction. */
  def jsonlFacts(text: String): JsonlFacts = {
    if (text == null)
      return JsonlFacts(0, 0, 0, 0, 0, 0, 0)
    val lines = text.split('\n').filter(_.trim.nonEmpty)
    var valid = 0
    var objects = 0
    var arrays = 0
    var scalars = 0
    val keys = scala.collection.mutable.HashSet[String]()
    lines.foreach { line =>
      val parsed =
        try Some(MiniJson.parse(line))
        catch { case _: Exception => None }
      parsed match {
        case Some(m: Map[_, _]) =>
          valid += 1
          objects += 1
          if (keys.size < MaxKeys)
            m.asInstanceOf[Map[String, Any]].keysIterator
              .foreach(keys += _)
        case Some(_: Vector[_]) => valid += 1; arrays += 1
        case Some(_) => valid += 1; scalars += 1
        case None => ()
      }
    }
    JsonlFacts(lines.length, valid, lines.length - valid,
      objects, arrays, scalars, keys.size)
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val jsonlSchema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType),
    StructField("n_valid", IntegerType),
    StructField("n_invalid", IntegerType),
    StructField("n_objects", IntegerType),
    StructField("n_arrays", IntegerType),
    StructField("n_scalars", IntegerType),
    StructField("n_distinct_keys", IntegerType)))

  def decodeJsonl(bytes: Array[Byte]): Seq[Any] = {
    val f = jsonlFacts(if (bytes == null) null
      else new String(bytes,
        java.nio.charset.StandardCharsets.UTF_8))
    Seq[Any](f.nLines, f.nValid, f.nInvalid, f.nObjects,
      f.nArrays, f.nScalars, f.nDistinctKeys)
  }

  /** Per-doc synth: n lines mixing objects (even j, keys k$j + a
    * shared "t"), one planted invalid line (j=1) and arrays (other
    * odd j) — every count closed-form.
    */
  def synthJsonls(df: DataFrame, idCol: String, outCol: String)
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
        val n = (id % 6 + 2).toInt
        val sb = new StringBuilder
        (0 until n).foreach { j =>
          if (j % 2 == 0)
            sb.append(s"""{"k$j": ${id + j}, "t": "x"}""")
          else if (j == 1) sb.append("{oops not json")
          else sb.append(s"""[$j, ${j + 1}]""")
          sb.append('\n')
        }
        Row.fromSeq(r.toSeq :+ sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }(enc)
  }
}
