package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Apache Iceberg table-format METADATA census (the public Iceberg
  * table spec, v2) — the third lakehouse table format next to the
  * Delta log census (DeltaLog.scala) and the parquet/ORC zone-map
  * walks. Iceberg's scan-planning layer is two tiers of Avro object
  * container files:
  *
  *  - the MANIFEST LIST (one per snapshot): `manifest_file` records
  *    — manifest path/length, partition spec id, content kind,
  *    sequence numbers, added/existing/deleted file and row counts,
  *    and per-partition-field `field_summary` records
  *    (contains_null/contains_nan flags, lower/upper bound bytes) —
  *    the facts that prune whole MANIFESTS before any data file is
  *    considered;
  *  - MANIFEST FILES: `manifest_entry` records — status
  *    (existing/added/deleted), optional snapshot id, and the nested
  *    `data_file` record (path, format, partition tuple,
  *    record/byte counts, and the int-keyed stats maps the spec
  *    encodes as arrays of key/value records).
  *
  * Both ride the round-17 Avro surface end-to-end: nested records,
  * arrays of records, nullable unions, bytes — which is the point:
  * a census over table metadata at 100 TB is footer-tier map work,
  * never a data-file read. Fixtures are written from the spec
  * schemas by [[manifestListWrite]]/[[manifestWrite]] with planted
  * closed-form facts the DuckDB oracle replays; refusals null the
  * row (decodeBatches totality contract).
  */
object Iceberg {

  import Avro.{wZlong, wStr}

  private object IceFail extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  // ----------------------------------------------------------------
  // schemas (spec field names, v2 subset)
  // ----------------------------------------------------------------

  private val ManifestListSchema =
    """{"type": "record", "name": "manifest_file", "fields": [
      {"name": "manifest_path", "type": "string"},
      {"name": "manifest_length", "type": "long"},
      {"name": "partition_spec_id", "type": "int"},
      {"name": "content", "type": "int"},
      {"name": "sequence_number", "type": "long"},
      {"name": "min_sequence_number", "type": "long"},
      {"name": "added_snapshot_id", "type": "long"},
      {"name": "added_files_count", "type": "int"},
      {"name": "existing_files_count", "type": "int"},
      {"name": "deleted_files_count", "type": "int"},
      {"name": "added_rows_count", "type": "long"},
      {"name": "existing_rows_count", "type": "long"},
      {"name": "deleted_rows_count", "type": "long"},
      {"name": "partitions", "type": ["null",
        {"type": "array", "items": {"type": "record",
         "name": "field_summary", "fields": [
          {"name": "contains_null", "type": "boolean"},
          {"name": "contains_nan", "type": ["null", "boolean"]},
          {"name": "lower_bound", "type": ["null", "bytes"]},
          {"name": "upper_bound", "type": ["null", "bytes"]}]}}]}
    ]}"""

  private val ManifestSchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
      {"name": "status", "type": "int"},
      {"name": "snapshot_id", "type": ["null", "long"]},
      {"name": "data_file", "type": {"type": "record",
       "name": "r2", "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "partition", "type": {"type": "record",
         "name": "r102", "fields": [
          {"name": "p_bucket", "type": "int"}]}},
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        {"name": "column_sizes", "type": ["null",
          {"type": "array", "items": {"type": "record",
           "name": "k127_v128", "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "long"}]}}]}
      ]}}
    ]}"""

  // ----------------------------------------------------------------
  // fixture writers (planted closed-form facts)
  // ----------------------------------------------------------------

  private[operators] def container(schema: String, records: Seq[Array[Byte]])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    def wr(a: Array[Byte]): Unit = out.write(a, 0, a.length)
    wr(wZlong(2L))
    wr(wStr("avro.schema")); wr(wStr(schema))
    wr(wStr("avro.codec")); wr(wStr("deflate"))
    wr(wZlong(0L))
    val sync = Array.tabulate[Byte](16)(i => (0x1c ^ i * 17).toByte)
    wr(sync)
    // all records in ONE block, deflate-coded
    val raw = records.flatMap(_.toSeq).toArray
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf)
    d.end()
    val payload = java.util.Arrays.copyOf(buf, n)
    wr(wZlong(records.length.toLong))
    wr(wZlong(payload.length.toLong))
    wr(payload); wr(sync)
    out.toByteArray
  }

  private def wBytes(b: Array[Byte]): Array[Byte] =
    wZlong(b.length.toLong) ++ b

  /** A manifest list for snapshot `id`: id%3+1 manifest_file
    * records; every field is an arithmetic function of (id, j) so
    * the census replays closed-form; the partitions union exercises
    * the null branch (j%3==2), nullable bools and bound bytes.
    */
  def manifestListWrite(id: Long): Array[Byte] = {
    val n = (id % 3 + 1).toInt
    val np = (id % 2 + 1).toInt
    val recs = (0 until n).map { j =>
      val b = new java.io.ByteArrayOutputStream()
      def w(a: Array[Byte]): Unit = b.write(a, 0, a.length)
      w(wStr(s"s3://lake/meta/snap-$id-m$j.avro"))
      w(wZlong(1000 * id + 13 * j))
      w(wZlong((id + j) % 4)) // partition_spec_id
      w(wZlong(j % 2)) // content
      w(wZlong(id + j)) // sequence_number
      w(wZlong(id)) // min_sequence_number
      w(wZlong(7 * id + 1)) // added_snapshot_id
      w(wZlong((id + j) % 10)) // added_files_count
      w(wZlong(j.toLong)) // existing_files_count
      w(wZlong((id + j) % 3)) // deleted_files_count
      w(wZlong(100 * id + j)) // added_rows_count
      w(wZlong(10L * j)) // existing_rows_count
      w(wZlong((id + j) % 5)) // deleted_rows_count
      if (j % 3 == 2) w(wZlong(0L)) // partitions: null branch
      else {
        w(wZlong(1L)) // union branch 1 = array
        w(wZlong(np.toLong)) // one item block
        (0 until np).foreach { p =>
          b.write(if ((id + j + p) % 2 == 0) 1 else 0) // contains_null
          if (p % 2 == 0) w(wZlong(0L)) // contains_nan: null
          else {
            w(wZlong(1L))
            b.write(if ((id + p) % 2 == 1) 1 else 0)
          }
          w(wZlong(1L)) // lower_bound: bytes branch
          w(wBytes(Array[Byte]((id % 256).toByte, p.toByte)))
          if ((id + p) % 3 == 0) w(wZlong(0L)) // upper: null
          else {
            w(wZlong(1L))
            w(wBytes(Array[Byte]((id % 256).toByte, (p + 1).toByte)))
          }
        }
        w(wZlong(0L)) // array terminator
      }
      b.toByteArray
    }
    container(ManifestListSchema, recs)
  }

  /** A manifest file for table `id`: id%4+1 manifest_entry records
    * with a nested data_file record, nullable snapshot ids, and the
    * spec's array-of-key/value encoding for column_sizes.
    */
  def manifestWrite(id: Long): Array[Byte] = {
    val m = (id % 4 + 1).toInt
    val nc = (id % 3 + 1).toInt
    val recs = (0 until m).map { e =>
      val b = new java.io.ByteArrayOutputStream()
      def w(a: Array[Byte]): Unit = b.write(a, 0, a.length)
      w(wZlong(e % 3)) // status
      if (e % 4 == 3) w(wZlong(0L)) // snapshot_id: null
      else { w(wZlong(1L)); w(wZlong(7 * id + 1)) }
      // data_file
      w(wZlong(0L)) // content
      w(wStr(s"s3://lake/data/f$id-$e.parquet"))
      w(wStr(Seq("PARQUET", "ORC", "AVRO")(((id + e) % 3).toInt)))
      w(wZlong((id + e) % 8)) // partition.p_bucket
      w(wZlong(50 * id + e)) // record_count
      w(wZlong(1024L * (e + 1))) // file_size_in_bytes
      if (e % 2 == 1) w(wZlong(0L)) // column_sizes: null
      else {
        w(wZlong(1L)); w(wZlong(nc.toLong))
        (0 until nc).foreach { c =>
          w(wZlong(c.toLong)); w(wZlong(10 * id + c))
        }
        w(wZlong(0L))
      }
      b.toByteArray
    }
    container(ManifestSchema, recs)
  }

  // ----------------------------------------------------------------
  // census kernels
  // ----------------------------------------------------------------

  val manifestListSchema: StructType = StructType(Seq(
    StructField("n_manifests", IntegerType),
    StructField("total_added_files", LongType),
    StructField("total_added_rows", LongType),
    StructField("total_deleted_files", LongType),
    StructField("max_seq", LongType),
    StructField("min_seq", LongType),
    StructField("spec_ids", StringType),
    StructField("n_null_partitions", IntegerType),
    StructField("n_summaries", IntegerType),
    StructField("n_contains_null", IntegerType),
    StructField("n_missing_upper", IntegerType),
    StructField("first_path", StringType)))

  def decodeManifestList(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          var added = 0L; var addedRows = 0L; var deleted = 0L
          var maxSeq = Long.MinValue; var minSeq = Long.MaxValue
          val specs = scala.collection.mutable.SortedSet[Long]()
          var nullParts = 0; var nSum = 0; var nNull = 0
          var nMissUp = 0
          var firstPath: String = null
          rows.foreach { r =>
            if (firstPath == null)
              firstPath = r(idx("manifest_path")).asInstanceOf[String]
            added += r(idx("added_files_count")).asInstanceOf[Long]
            addedRows +=
              r(idx("added_rows_count")).asInstanceOf[Long]
            deleted +=
              r(idx("deleted_files_count")).asInstanceOf[Long]
            maxSeq = math.max(maxSeq,
              r(idx("sequence_number")).asInstanceOf[Long])
            minSeq = math.min(minSeq,
              r(idx("min_sequence_number")).asInstanceOf[Long])
            specs +=
              r(idx("partition_spec_id")).asInstanceOf[Long]
            r(idx("partitions")) match {
              case (0, _) => nullParts += 1
              case (1, arr: Vector[_]) =>
                arr.foreach {
                  case s: IndexedSeq[_] =>
                    nSum += 1
                    if (s(0).asInstanceOf[Boolean]) nNull += 1
                    s(3) match {
                      case (0, _) => nMissUp += 1
                      case _ => ()
                    }
                  case _ => throw IceFail
                }
              case _ => throw IceFail
            }
          }
          if (rows.isEmpty) None
          else Some(Seq[Any](rows.length, added, addedRows, deleted,
            maxSeq, minSeq, specs.mkString(","), nullParts, nSum,
            nNull, nMissUp, firstPath))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
          case _: IndexOutOfBoundsException => None
        }
    }
    res.getOrElse(nullRow12)
  }

  private def nullRow12 = Seq[Any](null, null, null, null, null,
    null, null, null, null, null, null, null)

  val manifestSchema: StructType = StructType(Seq(
    StructField("n_entries", IntegerType),
    StructField("n_existing", IntegerType),
    StructField("n_added", IntegerType),
    StructField("n_deleted", IntegerType),
    StructField("n_null_snap", IntegerType),
    StructField("rows_sum", LongType),
    StructField("bytes_sum", LongType),
    StructField("formats", StringType),
    StructField("bucket_sum", LongType),
    StructField("colsize_sum", LongType)))

  def decodeManifest(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          var nExist = 0; var nAdd = 0; var nDel = 0; var nNullSnap = 0
          var rowsSum = 0L; var bytesSum = 0L; var bucketSum = 0L
          var colSum = 0L
          val formats = scala.collection.mutable.SortedSet[String]()
          rows.foreach { r =>
            r(idx("status")).asInstanceOf[Long] match {
              case 0 => nExist += 1
              case 1 => nAdd += 1
              case 2 => nDel += 1
              case _ => throw IceFail
            }
            r(idx("snapshot_id")) match {
              case (0, _) => nNullSnap += 1
              case _ => ()
            }
            r(idx("data_file")) match {
              case df: IndexedSeq[_] =>
                // (content, file_path, file_format, partition,
                //  record_count, file_size_in_bytes, column_sizes)
                formats += df(2).asInstanceOf[String]
                df(3) match {
                  case p: IndexedSeq[_] =>
                    bucketSum += p(0).asInstanceOf[Long]
                  case _ => throw IceFail
                }
                rowsSum += df(4).asInstanceOf[Long]
                bytesSum += df(5).asInstanceOf[Long]
                df(6) match {
                  case (0, _) => ()
                  case (1, arr: Vector[_]) =>
                    arr.foreach {
                      case kv: IndexedSeq[_] =>
                        colSum += kv(1).asInstanceOf[Long]
                      case _ => throw IceFail
                    }
                  case _ => throw IceFail
                }
              case _ => throw IceFail
            }
          }
          if (rows.isEmpty) None
          else Some(Seq[Any](rows.length, nExist, nAdd, nDel,
            nNullSnap, rowsSum, bytesSum, formats.mkString(","),
            bucketSum, colSum))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
          case _: IndexOutOfBoundsException => None
        }
    }
    res.getOrElse(nullRow10)
  }

  private def nullRow10 = Seq[Any](null, null, null, null, null,
    null, null, null, null, null)

  val manifestPairsSchema: StructType = StructType(Seq(
    StructField("pairs_csv", StringType)))

  /** Per-manifest (content, sequence_number) pairs as
    * `content:seq` CSV — the raw material of the v2 SEQUENCING
    * rule (a delete manifest applies to data manifests with
    * sequence numbers at or below its own); the pairing decision
    * itself runs engine-side. Null on refusal.
    */
  def decodeManifestPairs(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          val cI = idx("content")
          val sI = idx("sequence_number")
          val ps = rows.map { r =>
            (r(cI), r(sI)) match {
              case (c: Long, s: Long) => s"$c:$s"
              case _ => throw IceFail
            }
          }
          if (ps.isEmpty) None else Some(Seq[Any](ps.mkString(",")))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
        }
    }
    res.getOrElse(Seq[Any](null))
  }

  val manifestPathsSchema: StructType = StructType(Seq(
    StructField("paths_csv", StringType)))

  /** Just the referenced data-file paths (for the orphan sweep's
    * anti join). Null on refusal.
    */
  def decodeManifestPaths(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          val ps = rows.map { r =>
            r(idx("data_file")) match {
              case df: IndexedSeq[_] => df(1).asInstanceOf[String]
              case _ => throw IceFail
            }
          }
          if (ps.isEmpty) None else Some(Seq[Any](ps.mkString(",")))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
          case _: IndexOutOfBoundsException => None
        }
    }
    res.getOrElse(Seq[Any](null))
  }

  // ----------------------------------------------------------------
  // Spark plumbing (map-only synth, like every decode tier)
  // ----------------------------------------------------------------

  private def synth(df: DataFrame, idCol: String, outCol: String)(
      write: Long => Array[Byte]): DataFrame = {
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
        Row.fromSeq(r.toSeq :+ write(id))
      }
    }(enc)
  }

  def synthManifestLists(df: DataFrame, idCol: String,
      outCol: String): DataFrame =
    synth(df, idCol, outCol)(manifestListWrite)

  def synthManifests(df: DataFrame, idCol: String,
      outCol: String): DataFrame =
    synth(df, idCol, outCol)(manifestWrite)

  // ----------------------------------------------------------------
  // TABLE-LEVEL metadata (vN.metadata.json) — round 18
  // ----------------------------------------------------------------
  //
  // Iceberg scan planning starts one tier ABOVE the manifest list:
  // the table's `vN.metadata.json` holds the current-snapshot
  // pointer, the snapshot list (each with its parent id, sequence
  // number, manifest-list path and operation summary), the
  // snapshot LOG (the time-travel index), schema evolution and
  // partition specs. Without it the manifest census cannot be
  // rooted: the manifest list a reader opens IS the one the
  // current snapshot names here. The census walks the parent chain
  // from the current snapshot (refusing on a broken or cyclic
  // chain), checks the log's timestamps are monotonic, and
  // surfaces the facts a planner reads before touching any Avro.

  /** A planted v2 metadata.json for table `id`: id%4+2 snapshots in
    * one linear parent chain, every field an arithmetic function of
    * (id, k) so the census replays closed-form.
    */
  def metadataJsonWrite(id: Long): Array[Byte] = {
    val n = (id % 4 + 2).toInt
    val ns = (id % 2 + 1).toInt
    val ops = Seq("append", "overwrite", "delete", "replace")
    def sid(k: Int): Long = 1000 * id + k
    def ts(k: Int): Long = 1700000000000L + id * 1000 + k * 7
    val snaps = (0 until n).map { k =>
      val parent = if (k == 0) ""
        else s""""parent-snapshot-id": ${sid(k - 1)}, """
      s"""{"snapshot-id": ${sid(k)}, $parent""" +
      s""""sequence-number": ${k + 1}, """ +
      s""""timestamp-ms": ${ts(k)}, """ +
      s""""manifest-list": "s3://lake/meta/snap-${sid(k)}.avro", """ +
      s""""schema-id": ${k % ns}, """ +
      s""""summary": {"operation": "${ops(((id + k) % 4).toInt)}", """ +
      s""""added-records": "${10 * id + k}"}}"""
    }.mkString("[", ", ", "]")
    val log = (0 until n).map { k =>
      s"""{"timestamp-ms": ${ts(k)}, "snapshot-id": ${sid(k)}}"""
    }.mkString("[", ", ", "]")
    val schemas = (0 until ns).map { s2 =>
      val nf = (id % 3 + 1).toInt + s2
      val fs = (0 until nf).map { f =>
        s"""{"id": ${f + 1}, "name": "c$f", "required": ${f == 0}, """ +
        s""""type": "${if (f % 2 == 0) "long" else "string"}"}"""
      }.mkString("[", ", ", "]")
      s"""{"type": "struct", "schema-id": $s2, "fields": $fs}"""
    }.mkString("[", ", ", "]")
    val specFields = (0 until (id % 3).toInt).map { p =>
      s"""{"name": "p$p", "transform": "bucket[16]", """ +
      s""""source-id": ${p + 1}, "field-id": ${1000 + p}}"""
    }.mkString("[", ", ", "]")
    val fmt = Seq("parquet", "orc", "avro")((id % 3).toInt)
    val doc =
      s"""{"format-version": 2, "table-uuid": "uuid-$id", """ +
      s""""location": "s3://lake/tbl${id % 10}", """ +
      s""""last-sequence-number": $n, """ +
      s""""last-updated-ms": ${ts(n - 1)}, """ +
      s""""current-snapshot-id": ${sid(n - 1)}, """ +
      s""""schemas": $schemas, "current-schema-id": ${ns - 1}, """ +
      s""""partition-specs": [{"spec-id": 0, "fields": $specFields}], """ +
      s""""default-spec-id": 0, """ +
      s""""properties": {"write.format.default": "$fmt"}, """ +
      // refs (round 19): named branches/tags → snapshot ids —
      // main at the head, branch b1 parked mid-history, tag t1
      // pinning the first snapshot
      s""""refs": {""" +
      s""""main": {"snapshot-id": ${sid(n - 1)}, """ +
      s""""type": "branch"}, """ +
      s""""b1": {"snapshot-id": ${sid((id % n).toInt)}, """ +
      s""""type": "branch", """ +
      s""""min-snapshots-to-keep": ${id % 3 + 1}}, """ +
      s""""t1": {"snapshot-id": ${sid(0)}, "type": "tag", """ +
      s""""max-ref-age-ms": 86400000}}, """ +
      s""""snapshots": $snaps, "snapshot-log": $log}"""
    doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  val metadataJsonSchema: StructType = StructType(Seq(
    StructField("format_version", IntegerType),
    StructField("n_snapshots", IntegerType),
    StructField("current_snapshot_id", LongType),
    StructField("ancestry_depth", IntegerType),
    StructField("n_log_entries", IntegerType),
    StructField("log_monotonic", BooleanType),
    StructField("ops_csv", StringType),
    StructField("added_records_sum", LongType),
    StructField("current_manifest_list", StringType),
    StructField("n_schemas", IntegerType),
    StructField("current_schema_fields", IntegerType),
    StructField("n_spec_fields", IntegerType),
    StructField("last_sequence_number", LongType),
    StructField("format_default", StringType),
    StructField("snapshot_ts_csv", StringType),
    StructField("added_records_csv", StringType)))

  private def nullRow14 = Seq[Any](null, null, null, null, null,
    null, null, null, null, null, null, null, null, null, null,
    null)

  /** Census one metadata.json. Refuses (null row) on: malformed
    * JSON, a format version other than 1/2, a current-snapshot-id
    * not present in the snapshot list, a broken or cyclic parent
    * chain, a snapshot-log entry naming an unknown snapshot, or a
    * non-integral numeric where the spec requires an integer.
    */
  def decodeMetadataJson(bytes: Array[Byte]): Seq[Any] = {
    if (bytes == null) return nullRow14
    try {
      val parsed = graft.sources.MiniJson.parse(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      val root = parsed match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return nullRow14
      }
      def lng(v: Any): Long = v match {
        case d: Double if d.isWhole => d.toLong
        case _ => throw IceFail
      }
      def obj(v: Any): Map[String, Any] = v match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => throw IceFail
      }
      def arr(v: Any): Vector[Any] = v match {
        case a: Vector[_] => a.toVector
        case _ => throw IceFail
      }
      val fv = lng(root.getOrElse("format-version", throw IceFail))
      if (fv != 1 && fv != 2) return nullRow14
      val snaps = arr(root.getOrElse("snapshots", throw IceFail))
        .map(obj)
      if (snaps.isEmpty || snaps.length > 100000) return nullRow14
      val byId = snaps.map(s =>
        lng(s.getOrElse("snapshot-id", throw IceFail)) -> s).toMap
      if (byId.size != snaps.length) return nullRow14 // dup ids
      val cur = lng(root.getOrElse("current-snapshot-id",
        throw IceFail))
      if (!byId.contains(cur)) return nullRow14
      // ancestry: walk parent ids from the current snapshot; a
      // parent named but absent, or a cycle, refuses
      var depth = 0
      var at: Option[Long] = Some(cur)
      val seen = scala.collection.mutable.Set[Long]()
      while (at.isDefined) {
        val id = at.get
        if (!seen.add(id)) return nullRow14 // cycle
        val s = byId.getOrElse(id, return nullRow14)
        depth += 1
        at = s.get("parent-snapshot-id").map(lng)
      }
      val log = arr(root.getOrElse("snapshot-log", throw IceFail))
        .map(obj)
      // every log entry must name a known snapshot
      val logPairs = log.map { e =>
        val sid = lng(e.getOrElse("snapshot-id", throw IceFail))
        if (!byId.contains(sid)) return nullRow14
        (lng(e.getOrElse("timestamp-ms", throw IceFail)), sid)
      }
      val monotonic = logPairs.sliding(2).forall {
        case Seq((a, _), (b, _)) => a <= b
        case _ => true
      }
      val ops = scala.collection.mutable.SortedSet[String]()
      var addedSum = 0L
      snaps.foreach { s =>
        val sum = obj(s.getOrElse("summary", throw IceFail))
        sum.get("operation") match {
          case Some(o: String) => ops += o
          case _ => throw IceFail
        }
        sum.get("added-records") match {
          case Some(v: String) =>
            addedSum += java.lang.Long.parseLong(v)
          case None => ()
          case _ => throw IceFail
        }
      }
      val curML = byId(cur).getOrElse("manifest-list",
        throw IceFail) match {
        case s: String => s
        case _ => throw IceFail
      }
      val schemas = arr(root.getOrElse("schemas", throw IceFail))
        .map(obj)
      val curSchemaId = lng(root.getOrElse("current-schema-id",
        throw IceFail))
      val curSchema = schemas.find(s =>
        lng(s.getOrElse("schema-id", throw IceFail)) == curSchemaId)
        .getOrElse(return nullRow14)
      val nFields = arr(curSchema.getOrElse("fields",
        throw IceFail)).length
      val specs = arr(root.getOrElse("partition-specs",
        throw IceFail)).map(obj)
      val defSpecId = lng(root.getOrElse("default-spec-id",
        throw IceFail))
      val defSpec = specs.find(s =>
        lng(s.getOrElse("spec-id", throw IceFail)) == defSpecId)
        .getOrElse(return nullRow14)
      val nSpecFields = arr(defSpec.getOrElse("fields",
        throw IceFail)).length
      val lastSeq = lng(root.getOrElse("last-sequence-number",
        throw IceFail))
      val fmtDefault = root.get("properties").map(obj)
        .flatMap(_.get("write.format.default")) match {
        case Some(s: String) => s
        case _ => ""
      }
      val tsCsv = snaps.map(s =>
        lng(s.getOrElse("timestamp-ms", throw IceFail)))
        .mkString(",")
      val addedCsv = snaps.map { s =>
        obj(s.getOrElse("summary", throw IceFail))
          .get("added-records") match {
          case Some(v: String) => v
          case _ => "0"
        }
      }.mkString(",")
      Seq[Any](fv.toInt, snaps.length, cur, depth, log.length,
        monotonic, ops.mkString(","), addedSum, curML,
        schemas.length, nFields, nSpecFields, lastSeq, fmtDefault,
        tsCsv, addedCsv)
    } catch {
      case IceFail => nullRow14
      case _: NumberFormatException => nullRow14
      case _: ClassCastException => nullRow14
      case _: StackOverflowError => nullRow14
      case _: Exception => nullRow14
    }
  }

  // ----------------------------------------------------------------
  // REFS + partition-spec application (round 19)
  // ----------------------------------------------------------------

  val refsSchema: StructType = StructType(Seq(
    StructField("n_refs", IntegerType),
    StructField("n_branches", IntegerType),
    StructField("n_tags", IntegerType),
    StructField("main_is_current", BooleanType),
    StructField("b1_snapshot", LongType),
    StructField("t1_snapshot", LongType),
    StructField("spec_transforms", StringType)))

  /** Census the `refs` map (branches/tags → snapshot ids, the v2
    * spec's named-ref tier) plus the default partition spec's
    * transform list. Refuses (null row) when a ref lacks a
    * snapshot-id/type, names an unknown snapshot, or `main` is
    * not a branch — the invariants a ref-aware reader relies on.
    */
  def decodeRefs(bytes: Array[Byte]): Seq[Any] = {
    val nulls = Seq[Any](null, null, null, null, null, null, null)
    if (bytes == null) return nulls
    try {
      val doc = graft.sources.MiniJson.parse(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => return nulls
      }
      def lng(v: Any): Long = v match {
        case d: Double if d.isWhole => d.toLong
        case _ => throw IceFail
      }
      val snapIds = doc.get("snapshots") match {
        case Some(xs: Vector[_]) => xs.map {
          case s: Map[_, _] => lng(
            s.asInstanceOf[Map[String, Any]]("snapshot-id"))
          case _ => throw IceFail
        }.toSet
        case _ => return nulls
      }
      val current = lng(doc.getOrElse("current-snapshot-id",
        throw IceFail))
      val refs = doc.get("refs") match {
        case Some(m: Map[_, _]) =>
          m.asInstanceOf[Map[String, Any]].map {
            case (name, body: Map[_, _]) =>
              val bm = body.asInstanceOf[Map[String, Any]]
              val sid = lng(bm.getOrElse("snapshot-id",
                throw IceFail))
              val typ = bm.get("type") match {
                case Some(t: String)
                  if t == "branch" || t == "tag" => t
                case _ => throw IceFail
              }
              if (!snapIds(sid)) throw IceFail // dangling ref
              (name, sid, typ)
            case _ => throw IceFail
          }.toSeq
        case _ => return nulls
      }
      val main = refs.find(_._1 == "main")
      if (main.exists(_._3 != "branch")) throw IceFail
      val transforms = doc.get("partition-specs") match {
        case Some(xs: Vector[_]) => xs.collectFirst {
          case s: Map[_, _]
            if s.asInstanceOf[Map[String, Any]].get("spec-id")
              .contains(0.0) =>
            s.asInstanceOf[Map[String, Any]].get("fields") match {
              case Some(fs: Vector[_]) => fs.map {
                case f: Map[_, _] =>
                  f.asInstanceOf[Map[String, Any]]
                    .get("transform") match {
                    case Some(t: String) => t
                    case _ => throw IceFail
                  }
                case _ => throw IceFail
              }.mkString(",")
              case _ => ""
            }
        }.getOrElse(throw IceFail)
        case _ => throw IceFail
      }
      Seq[Any](refs.length, refs.count(_._3 == "branch"),
        refs.count(_._3 == "tag"),
        main.exists(_._2 == current),
        refs.find(_._1 == "b1").map(_._2).orNull,
        refs.find(_._1 == "t1").map(_._2).orNull,
        transforms)
    } catch {
      case IceFail => nulls
      case _: Exception => nulls // incl. malformed-JSON parse
    }
  }

  val bucketsSchema: StructType = StructType(Seq(
    StructField("buckets_csv", StringType)))

  /** The manifest entries' PARTITION TUPLES under the spec — the
    * values a partition-pruning census compares against a probe
    * bucket ("which files does partition P touch"). Null on
    * refusal.
    */
  def decodeManifestBuckets(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          val bs = rows.map { r =>
            r(idx("data_file")) match {
              case df: IndexedSeq[_] => df(3) match {
                case part: IndexedSeq[_] => part(0) match {
                  case b: Long => b
                  case _ => throw IceFail
                }
                case _ => throw IceFail
              }
              case _ => throw IceFail
            }
          }
          if (bs.isEmpty) None else Some(Seq[Any](bs.mkString(",")))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
          case _: IndexOutOfBoundsException => None
        }
    }
    res.getOrElse(Seq[Any](null))
  }

  def synthMetadataJsons(df: DataFrame, idCol: String,
      outCol: String): DataFrame =
    synth(df, idCol, outCol)(metadataJsonWrite)

  // ----------------------------------------------------------------
  // POSITION DELETES + merge-on-read (round 18)
  // ----------------------------------------------------------------
  //
  // Iceberg v2's row-level deletes: a DELETE writes a position
  // delete file — an Avro (or parquet) file of (file_path, pos)
  // records — and the READ path anti-joins data rows against the
  // delete set (merge-on-read). The delete files ride the same
  // manifest machinery (content=1 in the manifest list, which the
  // C250 census already surfaces); here the delete PAYLOAD is
  // decoded and the MOR join itself is expressed as a Spark
  // left-anti join on (file_path, pos) — the exact shape a 100 TB
  // MOR scan shuffles on.

  private val PosDeleteSchema =
    """{"type": "record", "name": "pos_delete", "fields": [
      {"name": "file_path", "type": "string"},
      {"name": "pos", "type": "long"}]}"""

  /** A planted position-delete file for table `id`: for each data
    * file e in 0..(id%4), delete every pos in 0..9 with
    * pos % 3 == (id + e) % 3 — all closed-form for the oracle.
    */
  def posDeleteWrite(id: Long): Array[Byte] = {
    val nf = (id % 4 + 1).toInt
    val recs = for {
      e <- 0 until nf
      p <- 0 until 10
      if p % 3 == ((id + e) % 3).toInt
    } yield {
      val b = new java.io.ByteArrayOutputStream()
      def w(a: Array[Byte]): Unit = b.write(a, 0, a.length)
      w(wStr(s"s3://lake/data/f$id-$e.parquet"))
      w(wZlong(p.toLong))
      b.toByteArray
    }
    container(PosDeleteSchema, recs)
  }

  val posDeleteSchema: StructType = StructType(Seq(
    StructField("deletes_csv", StringType)))

  /** Decode one position-delete file to `path|pos` CSV (the engine
    * explodes it into join rows; '|' because URI paths contain
    * colons). Null on refusal; spec order (sorted by path then
    * pos) is NOT assumed — the join doesn't need it.
    */
  def decodePosDeletes(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val idx = fields.map(_._1).zipWithIndex.toMap
          val fpI = idx("file_path")
          val posI = idx("pos")
          val ds = rows.map { r =>
            val fp = r(fpI) match {
              case s: String => s
              case _ => throw IceFail
            }
            val p = r(posI) match {
              case l: Long => l
              case _ => throw IceFail
            }
            s"$fp|$p"
          }
          if (ds.isEmpty) None else Some(Seq[Any](ds.mkString(",")))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: NoSuchElementException => None
        }
    }
    res.getOrElse(Seq[Any](null))
  }

  def synthPosDeletes(df: DataFrame, idCol: String,
      outCol: String): DataFrame =
    synth(df, idCol, outCol)(posDeleteWrite)

  // ----------------------------------------------------------------
  // EQUALITY DELETES (round 18) — v2's second row-level delete
  // kind: a file of VALUES on declared equality field ids; the
  // read path anti-joins data rows on those columns (scoped to the
  // table — here the doc id), where position deletes anti-join on
  // (file, pos). Both kinds ride the same manifest machinery
  // (content=2 entries).
  // ----------------------------------------------------------------

  private val EqDeleteSchema =
    """{"type": "record", "name": "eq_delete", "fields": [
      {"name": "k", "type": "long"}]}"""

  /** A planted equality-delete file for table `id`: delete every
    * k in 0..9 with k % 3 == id % 3.
    */
  def eqDeleteWrite(id: Long): Array[Byte] = {
    val recs = (0 until 10).filter(_ % 3 == (id % 3).toInt)
      .map(k => wZlong(k.toLong))
    container(EqDeleteSchema, recs)
  }

  val eqDeleteSchema: StructType = StructType(Seq(
    StructField("eq_csv", StringType)))

  /** Decode one equality-delete file to a CSV of deleted key
    * values. Null on refusal.
    */
  def decodeEqDeletes(bytes: Array[Byte]): Seq[Any] = {
    val res = Avro.readTypedContainer(bytes).flatMap {
      case (fields, rows) =>
        try {
          val kI = fields.map(_._1).zipWithIndex.toMap
            .getOrElse("k", throw IceFail)
          val vs = rows.map { r =>
            r(kI) match {
              case l: Long => l
              case _ => throw IceFail
            }
          }
          if (vs.isEmpty) None else Some(Seq[Any](vs.mkString(",")))
        } catch {
          case IceFail => None
          case _: ClassCastException => None
          case _: IndexOutOfBoundsException => None
        }
    }
    res.getOrElse(Seq[Any](null))
  }

  def synthEqDeletes(df: DataFrame, idCol: String,
      outCol: String): DataFrame =
    synth(df, idCol, outCol)(eqDeleteWrite)
}
