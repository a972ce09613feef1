package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** Delta Lake commit-log census (C236) — lakehouse tables are the
  * thing a 100 TB corpus LIVES in, and the JSON commits under
  * `_delta_log/` are the metadata a lake census reads without
  * touching a data file. The action grammar is public (the Delta transaction
  * protocol): one JSON object per line, each wrapping exactly one
  * action — `commitInfo`, `protocol` (reader/writer versions),
  * `metaData` (schema, partition columns, format provider), `add`
  * (path, size, partitionValues), `remove`, `txn`, and the newer
  * side-car actions which an old reader must tolerate.
  *
  * Surfaced: action counts by kind (unknown kinds counted, not
  * guessed at — the protocol's forward-compat rule), summed added
  * bytes, partition-column count, protocol versions, provider.
  * A line that is not a JSON object REFUSES the blob — Delta
  * readers cannot skip corrupt commit lines.
  *
  * Totality: None on damage. Scale: per-value map-only text work.
  */
object DeltaLog {

  private val MaxLines = 100000

  final case class DeltaFacts(nActions: Int, nAdd: Int,
      nRemove: Int, nOther: Int, addBytes: Long,
      nPartitionCols: Int, minReader: Int, minWriter: Int,
      provider: String)

  /** Census one commit file's text. None on damage. */
  def deltaFacts(log: String): Option[DeltaFacts] = {
    if (log == null) return None
    val lines = log.split('\n').filter(_.trim.nonEmpty)
    if (lines.isEmpty || lines.length > MaxLines) return None
    var nAdd = 0
    var nRemove = 0
    var nOther = 0
    var addBytes = 0L
    var nPartCols = -1
    var minReader = -1
    var minWriter = -1
    var provider = ""
    lines.foreach { line =>
      val obj =
        try MiniJson.parse(line) match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case _ => return None
        } catch { case _: Exception => return None }
      if (obj.size != 1) return None // exactly one action per line
      val (kind, body0) = obj.head
      val body = body0 match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return None
      }
      kind match {
        case "add" =>
          nAdd += 1
          body.get("size") match {
            case Some(d: Double) if d >= 0 && d == math.floor(d) =>
              addBytes += d.toLong
            case _ => return None
          }
        case "remove" => nRemove += 1
        case "protocol" =>
          body.get("minReaderVersion") match {
            case Some(d: Double) => minReader = d.toInt
            case _ => ()
          }
          body.get("minWriterVersion") match {
            case Some(d: Double) => minWriter = d.toInt
            case _ => ()
          }
        case "metaData" =>
          body.get("partitionColumns") match {
            case Some(xs: Vector[_]) => nPartCols = xs.length
            case _ => ()
          }
          body.get("format") match {
            case Some(f: Map[_, _]) =>
              f.asInstanceOf[Map[String, Any]].get("provider") match {
                case Some(p: String) => provider = p
                case _ => ()
              }
            case _ => ()
          }
        case "commitInfo" | "txn" => nOther += 1
        case _ => nOther += 1 // forward-compat: count, don't guess
      }
    }
    Some(DeltaFacts(lines.length, nAdd, nRemove, nOther, addBytes,
      nPartCols, minReader, minWriter, provider))
  }

  /** Serialize a planted commit (writer for synth + spec). */
  def deltaWrite(adds: Seq[Long], removes: Int,
      partCols: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append("""{"commitInfo":{"operation":"WRITE",""")
      .append(""""timestamp":1700000000000}}""").append('\n')
    sb.append("""{"protocol":{"minReaderVersion":1,""")
      .append(""""minWriterVersion":2}}""").append('\n')
    sb.append("""{"metaData":{"id":"fixed-id",""")
      .append(""""format":{"provider":"parquet","options":{}},""")
      .append(""""schemaString":"{}","partitionColumns":[""")
      .append(partCols.map(c => s""""$c"""").mkString(","))
      .append("""],"configuration":{}}}""").append('\n')
    adds.zipWithIndex.foreach { case (size, i) =>
      sb.append(s"""{"add":{"path":"part-$i.parquet",""")
        .append(s""""partitionValues":{},"size":$size,""")
        .append(s""""modificationTime":1700000000000,""")
        .append(s""""dataChange":true}}""").append('\n')
    }
    (0 until removes).foreach { i =>
      sb.append(s"""{"remove":{"path":"old-$i.parquet",""")
        .append(s""""deletionTimestamp":1700000000000,""")
        .append(s""""dataChange":true}}""").append('\n')
    }
    sb.toString
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val deltaSchema: StructType = StructType(Seq(
    StructField("n_actions", IntegerType),
    StructField("n_add", IntegerType),
    StructField("n_remove", IntegerType),
    StructField("n_other", IntegerType),
    StructField("add_bytes", LongType),
    StructField("n_partition_cols", IntegerType),
    StructField("min_reader", IntegerType),
    StructField("min_writer", IntegerType),
    StructField("provider", StringType)))

  def decodeDelta(bytes: Array[Byte]): Seq[Any] =
    deltaFacts(if (bytes == null) null
      else new String(bytes,
        java.nio.charset.StandardCharsets.UTF_8)) match {
      case Some(f) => Seq[Any](f.nActions, f.nAdd, f.nRemove,
        f.nOther, f.addBytes, f.nPartitionCols, f.minReader,
        f.minWriter, f.provider)
      case None => Seq[Any](null, null, null, null, null, null,
        null, null, null)
    }

  /** Per-doc synth: planted commits with closed-form facts. */
  def synthDeltas(df: DataFrame, idCol: String, outCol: String)
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
        val a = (id % 4 + 1).toInt
        val sizes = (0 until a).map(j => 100L + id % 1000 + j)
        val removes = (id % 3).toInt
        val partCols = (0 until (id % 3).toInt).map(j => s"p$j")
        Row.fromSeq(r.toSeq :+ deltaWrite(sizes, removes, partCols)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }(enc)
  }
}
