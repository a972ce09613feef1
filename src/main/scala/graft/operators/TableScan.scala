package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** END-TO-END lakehouse table READ (round 19) — the composition
  * every per-tier oracle could not see: one query walks
  * `vN.metadata.json` → current snapshot → manifest list →
  * manifest entries → per-file parquet DATA-PAGE decode →
  * row-level-delete application → row values, on a planted
  * multi-file table, exactly the read path a real engine runs.
  * The seams this proves: path resolution across tiers, the v2
  * sequence-number gate feeding the RIGHT delete set (a position
  * delete at sequence 3 must NOT touch a data file added at
  * sequence 4), and the page decoder feeding real row positions.
  *
  * Two tables, two MOR strategies — the ones the formats actually
  * use at scale:
  *  - Iceberg: position-delete FILES, applied as a broadcast anti
  *    join on (file, pos) after the gate.
  *  - Delta: deletion-vector BITMAPS (the roaring blob), applied
  *    as a reader-side membership probe inside the scan task — no
  *    join at all, which is why DVs win at 100 TB.
  *
  * Data files and position-delete files are written by Spark's own
  * parquet writer (the reference implementation); ALL reading is
  * house code ([[ParquetTyped]], [[Avro.readTypedContainer]],
  * [[DeletionVectors.parseDvBlob]], [[MiniJson]]).
  *
  * Scale: metadata/manifest tiers are planner work (tiny files,
  * driver-side — as in any engine's coordinator); the data tier is
  * a distributed binary scan with map-only decode; deletes are
  * broadcast (Iceberg) or probed in-task (Delta). No shuffle
  * before the final aggregation.
  *
  * Reference surface: pytrousse dataset.py:53 reads one whole CSV
  * eagerly; this is that operation's 100 TB analog.
  */
object TableScan {

  // ---------------------------------------------------------------
  // shared: single-file parquet writes (Spark = reference writer)
  // ---------------------------------------------------------------

  private def writeOneParquet(spark: SparkSession, df: DataFrame,
      target: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_scan_w").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(java.nio.file.Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.walk(java.nio.file.Paths.get(tmp))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
  }

  private def rmrf(dir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(dir))
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
  }

  // ---------------------------------------------------------------
  // ICEBERG: planted table
  // ---------------------------------------------------------------
  //
  // 6 data files f0..f5 of 200 rows each (file k row j: id =
  // 1000k + j, val = 3*id), data sequence numbers f0..f3 = 1,
  // f4 = 4, f5 = 5. Two position-delete files:
  //   pd0 (sequence 3): (fk, j) for k <= 4, j % 10 == 0 — the
  //       k = 4 entries MUST be ignored by the gate (seq 4 > 3)
  //   pd1 (sequence 6): (fk, j) for k in {0,4,5}, j % 9 == 0
  // All closed-form, so the DuckDB oracle replays the live rows.

  private val IceFiles = 6
  private val IceRows = 200
  private def iceDataSeq(k: Int): Long = k match {
    case 4 => 4L
    case 5 => 5L
    case _ => 1L
  }

  private val EntrySchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
      {"name": "status", "type": "int"},
      {"name": "sequence_number", "type": "long"},
      {"name": "data_file", "type": {"type": "record",
       "name": "r2", "fields": [
        {"name": "content", "type": "int"},
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {"name": "record_count", "type": "long"}]}}
    ]}"""

  private val ListSchema =
    """{"type": "record", "name": "manifest_file", "fields": [
      {"name": "manifest_path", "type": "string"},
      {"name": "content", "type": "int"},
      {"name": "sequence_number", "type": "long"}
    ]}"""

  import Avro.{wZlong, wStr}

  private def entryRec(status: Int, seq: Long, content: Int,
      path: String, format: String, records: Long): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def w(a: Array[Byte]): Unit = b.write(a, 0, a.length)
    w(wZlong(status.toLong))
    w(wZlong(seq))
    w(wZlong(content.toLong))
    w(wStr(path))
    w(wStr(format))
    w(wZlong(records))
    b.toByteArray
  }

  private def listRec(path: String, content: Int, seq: Long)
      : Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def w(a: Array[Byte]): Unit = b.write(a, 0, a.length)
    w(wStr(path))
    w(wZlong(content.toLong))
    w(wZlong(seq))
    b.toByteArray
  }

  /** Write the planted Iceberg v2 table under `dir`. Idempotent
    * (full rewrite). Layout: data/f{k}.parquet,
    * deletes/pd{0,1}.parquet, metadata/{m*.avro, ml-*.avro,
    * v3.metadata.json}.
    */
  def plantIcebergTable(spark: SparkSession, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val root = Paths.get(dir)
    // layout-versioned completion marker: planting is idempotent
    // but not free (8 small parquet writes) — bench reps skip it
    val marker = root.resolve("_planted_v1")
    if (Files.exists(marker)) return
    rmrf(root)
    Files.createDirectories(root.resolve("metadata"))
    // data files (Spark-written parquet)
    (0 until IceFiles).foreach { k =>
      val df = spark.range(0, IceRows.toLong).toDF("j")
        .select((col("j") + 1000L * k).as("id"),
          ((col("j") + 1000L * k) * 3).as("val"))
      writeOneParquet(spark, df,
        root.resolve("data").resolve(s"f$k.parquet"))
    }
    // position-delete files (also Spark-written parquet; spec
    // columns file_path, pos — including the gated-out k=4 rows
    // in pd0 that a correct reader must ignore)
    def dataPath(k: Int): String =
      root.resolve("data").resolve(s"f$k.parquet").toString
    val pd0 = (0 to 4).flatMap(k => (0 until IceRows)
      .filter(_ % 10 == 0).map(j => (dataPath(k), j.toLong)))
    val pd1 = Seq(0, 4, 5).flatMap(k => (0 until IceRows)
      .filter(_ % 9 == 0).map(j => (dataPath(k), j.toLong)))
    import spark.implicits._
    writeOneParquet(spark, pd0.toDF("file_path", "pos"),
      root.resolve("deletes").resolve("pd0.parquet"))
    writeOneParquet(spark, pd1.toDF("file_path", "pos"),
      root.resolve("deletes").resolve("pd1.parquet"))
    // manifests: data entries split across two manifests (the
    // multi-manifest walk), one delete manifest
    def meta(name: String): java.nio.file.Path =
      root.resolve("metadata").resolve(name)
    Files.write(meta("m0.avro"), Iceberg.container(EntrySchema,
      (0 to 2).map(k => entryRec(1, iceDataSeq(k), 0, dataPath(k),
        "PARQUET", IceRows.toLong))))
    Files.write(meta("m1.avro"), Iceberg.container(EntrySchema,
      (3 to 5).map(k => entryRec(1, iceDataSeq(k), 0, dataPath(k),
        "PARQUET", IceRows.toLong))))
    Files.write(meta("md.avro"), Iceberg.container(EntrySchema, Seq(
      entryRec(1, 3L, 1,
        root.resolve("deletes").resolve("pd0.parquet").toString,
        "PARQUET", pd0.length.toLong),
      entryRec(1, 6L, 1,
        root.resolve("deletes").resolve("pd1.parquet").toString,
        "PARQUET", pd1.length.toLong))))
    // manifest lists: the STALE snapshot's list names only m0 — a
    // reader that ignores current-snapshot-id reads 3 files and
    // no deletes, which the oracle catches
    Files.write(meta("ml-98.avro"), Iceberg.container(ListSchema,
      Seq(listRec(meta("m0.avro").toString, 0, 1L))))
    Files.write(meta("ml-99.avro"), Iceberg.container(ListSchema,
      Seq(listRec(meta("m0.avro").toString, 0, 1L),
        listRec(meta("m1.avro").toString, 0, 5L),
        listRec(meta("md.avro").toString, 1, 6L))))
    val mj =
      s"""{"format-version": 2, "table-uuid": "planted-ice-scan",
         |"location": "$dir", "last-sequence-number": 6,
         |"current-snapshot-id": 99,
         |"snapshots": [
         |  {"snapshot-id": 98, "sequence-number": 1,
         |   "timestamp-ms": 1700000000000,
         |   "manifest-list": "${meta("ml-98.avro")}"},
         |  {"snapshot-id": 99, "parent-snapshot-id": 98,
         |   "sequence-number": 6, "timestamp-ms": 1700000001000,
         |   "manifest-list": "${meta("ml-99.avro")}"}
         |]}""".stripMargin
    Files.writeString(meta("v3.metadata.json"), mj)
    Files.createFile(marker) // marker LAST: a kill mid-plant replants
  }

  // ---------------------------------------------------------------
  // ICEBERG: the scan
  // ---------------------------------------------------------------

  private def avroRows(path: String)
      : Seq[(Map[String, Int], IndexedSeq[Any])] = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    Avro.readTypedContainer(bytes) match {
      case Some((fields, rows)) =>
        val idx = fields.map(_._1).zipWithIndex.toMap
        rows.map(r => (idx, r))
      case None => throw new IllegalStateException(
        s"unreadable manifest avro: $path")
    }
  }

  /** Decode (pos, id, val) rows of one data file's bytes with the
    * typed page reader. None on refusal.
    */
  private def decodeDataFile(bytes: Array[Byte])
      : Option[(Array[AnyRef], Array[AnyRef])] =
    for {
      ids <- ParquetTyped.readTypedColumn(bytes, "id")
      vals <- ParquetTyped.readTypedColumn(bytes, "val")
      if ids.values.length == vals.values.length
    } yield (ids.values, vals.values)

  private val ScanRowSchema = StructType(Seq(
    StructField("file_path", StringType),
    StructField("pos", LongType),
    StructField("id", LongType),
    StructField("v", LongType)))

  /** Distributed data tier: binary scan of the file list, map-only
    * typed decode to (file_path, pos, id, v) rows. The path column
    * is normalized back to the manifest's plain form so the tiers
    * join.
    */
  private def scanRows(spark: SparkSession, paths: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val bin = spark.read.format("binaryFile").load(paths: _*)
      .select(regexp_replace(col("path"), "^file:/*", "/")
        .as("file_path"), col("content"))
    val enc = org.apache.spark.sql.Encoders.row(ScanRowSchema)
    bin.mapPartitions { it =>
      it.flatMap { r =>
        val path = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodeDataFile(bytes) match {
          case Some((ids, vals)) =>
            ids.indices.iterator.map { i =>
              Row(path, i.toLong,
                ids(i).asInstanceOf[java.lang.Long].longValue(),
                vals(i).asInstanceOf[java.lang.Long].longValue())
            }
          case None => Iterator.single(Row(path, -1L, null, null))
        }
      }
    }(enc)
  }

  /** The end-to-end Iceberg read: metadata.json → current snapshot
    * → manifest list → manifests → typed parquet decode →
    * sequence-gated position-delete anti join → per-file live
    * aggregate (file_k, n_live, sum_val).
    */
  def icebergScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // planner tier (driver, metadata-sized — the coordinator's job
    // in any engine)
    val mj = MiniJson.parseObject(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metadata", "v3.metadata.json")))
    val current = mj("current-snapshot-id") match {
      case d: Double if d.isWhole => d.toLong
      case _ => throw new IllegalStateException(
        "metadata.json without current-snapshot-id")
    }
    val snap = mj("snapshots") match {
      case xs: Vector[_] => xs.collectFirst {
        case m: Map[_, _]
          if m.asInstanceOf[Map[String, Any]].get("snapshot-id")
            .contains(current.toDouble) =>
          m.asInstanceOf[Map[String, Any]]
      }.getOrElse(throw new IllegalStateException(
        "current snapshot missing from snapshot list"))
      case _ => throw new IllegalStateException("no snapshots")
    }
    val mlPath = snap("manifest-list") match {
      case s: String => s
      case _ => throw new IllegalStateException("no manifest-list")
    }
    val manifests = avroRows(mlPath).map { case (idx, r) =>
      (r(idx("manifest_path")).asInstanceOf[String],
        r(idx("content")).asInstanceOf[Long].toInt)
    }
    def entries(content: Int): Seq[(String, Long)] =
      manifests.filter(_._2 == content).flatMap { case (p, _) =>
        avroRows(p).collect { case (idx, r)
          // status 2 = DELETED: not part of the snapshot
          if r(idx("status")).asInstanceOf[Long] != 2L =>
          val df = r(idx("data_file")).asInstanceOf[IndexedSeq[Any]]
          (df(1).asInstanceOf[String],
            r(idx("sequence_number")).asInstanceOf[Long])
        }
      }
    val dataFiles = entries(0)
    val deleteFiles = entries(1)
    // data tier: distributed typed decode
    val data = scanRows(spark, dataFiles.map(_._1))
    import spark.implicits._
    val dataSeq = dataFiles.toDF("file_path", "data_seq")
    // delete tier: the position-delete files are parquet too —
    // decode distributed, tag each row with its delete file's
    // sequence number
    val delSeq = deleteFiles.toDF("file_path", "del_seq")
    val deletes = spark.read.format("binaryFile")
      .load(deleteFiles.map(_._1): _*)
      .select(regexp_replace(col("path"), "^file:/*", "/")
        .as("src"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val src = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          val out = for {
            fp <- ParquetTyped.readTypedColumn(bytes, "file_path")
            pos <- ParquetTyped.readTypedColumn(bytes, "pos")
            if fp.values.length == pos.values.length
          } yield fp.values.indices.iterator.map { i =>
            (src, fp.values(i).asInstanceOf[String],
              pos.values(i).asInstanceOf[java.lang.Long]
                .longValue())
          }
          out.getOrElse(Iterator.empty)
        }
      }.toDF("src", "target_path", "pos")
      .join(broadcast(delSeq),
        col("src") === delSeq("file_path"))
      .select(col("target_path"), col("pos"), col("del_seq"))
    // the v2 SEQUENCE GATE: a position delete applies to a data
    // file iff the file's data sequence number is <= the delete
    // file's — the planted pd0 rows against f4 (seq 4 > 3) must
    // fall out here
    val gated = deletes
      .join(broadcast(dataSeq),
        deletes("target_path") === dataSeq("file_path"))
      .where(col("data_seq") <= col("del_seq"))
      .select(col("target_path").as("file_path"), col("pos"))
    // MOR: broadcast anti join on (file, pos), then one aggregate
    data.join(broadcast(gated), Seq("file_path", "pos"),
        "left_anti")
      .select(regexp_extract(col("file_path"), "f(\\d+)\\.parquet$",
          1).cast("int").as("file_k"),
        col("v"))
      .groupBy(col("file_k"))
      .agg(count(lit(1)).cast("long").as("n_live"),
        sum(col("v")).cast("long").as("sum_val"))
  }

  // ---------------------------------------------------------------
  // DELTA: planted table (checkpoint + deletion vectors)
  // ---------------------------------------------------------------
  //
  // 4 data files part-0..3 of 250 rows (file k row j: id =
  // 1000k + j, val = 2*id + 1). Commits:
  //   v0 protocol+metaData, add part-0, part-1
  //   v1 add part-2, part-3
  //   v2 remove part-1          ← checkpoint parquet here
  //   v3 remove+re-add part-0 with DV (pos % 10 == 0 deleted)
  //   v4 remove+re-add part-2 with DV (pos % 7 == 0 deleted)
  // DV blobs live as separate files (storageType "p", absolute
  // path), framed exactly as DeletionVectors.writeDvBlob pins.

  private val DeltaFiles = 4
  private val DeltaRows = 250

  /** Write the planted Delta table under `dir`. Idempotent. */
  def plantDeltaTable(spark: SparkSession, dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val root = Paths.get(dir)
    val marker = root.resolve("_planted_v1")
    if (Files.exists(marker)) return
    rmrf(root)
    Files.createDirectories(root.resolve("_delta_log"))
    (0 until DeltaFiles).foreach { k =>
      val df = spark.range(0, DeltaRows.toLong).toDF("j")
        .select((col("j") + 1000L * k).as("id"),
          ((col("j") + 1000L * k) * 2 + 1).as("val"))
      writeOneParquet(spark, df, root.resolve(s"part-$k.parquet"))
    }
    def dvBlob(mod: Int): Array[Byte] = {
      val members = (0 until DeltaRows).filter(_ % mod == 0)
      DeletionVectors.writeDvBlob(DeletionVectors.writeRb64(Seq(
        0 -> Seq(DeletionVectors.ArrayC(0,
          members.map(_.toChar).toArray)))))
    }
    Files.write(root.resolve("dv-part0.bin"), dvBlob(10))
    Files.write(root.resolve("dv-part2.bin"), dvBlob(7))
    def addJson(k: Int, dv: Option[(String, Int)]): String = {
      val dvs = dv.map { case (p, card) =>
        s""","deletionVector":{"storageType":"p",""" +
          s""""pathOrInlineDv":"$p","offset":0,""" +
          s""""sizeInBytes":0,"cardinality":$card}"""
      }.getOrElse("")
      s"""{"add":{"path":"part-$k.parquet","partitionValues":{},""" +
        s""""size":1024,"modificationTime":1700000000000,""" +
        s""""dataChange":true$dvs}}"""
    }
    def remJson(k: Int): String =
      s"""{"remove":{"path":"part-$k.parquet",""" +
        s""""deletionTimestamp":1700000002000,"dataChange":true}}"""
    val ci = """{"commitInfo":{"operation":"WRITE",""" +
      """"timestamp":1700000000000}}"""
    def w(v: Int, lines: String*): Unit =
      Files.writeString(root.resolve("_delta_log")
        .resolve(f"$v%020d.json"), lines.mkString("\n") + "\n")
    w(0, ci,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      """{"metaData":{"id":"planted-delta-scan","format":""" +
        """{"provider":"parquet","options":{}},""" +
        """"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{}}}""",
      addJson(0, None), addJson(1, None))
    w(1, ci, addJson(2, None), addJson(3, None))
    w(2, ci, remJson(1))
    val nDv0 = (0 until DeltaRows).count(_ % 10 == 0)
    val nDv2 = (0 until DeltaRows).count(_ % 7 == 0)
    w(3, ci, remJson(0),
      addJson(0, Some((root.resolve("dv-part0.bin").toString,
        nDv0))))
    w(4, ci, remJson(2),
      addJson(2, Some((root.resolve("dv-part2.bin").toString,
        nDv2))))
    // checkpoint parquet at v2 (state: part-0, part-2, part-3
    // live, no DVs yet) + _last_checkpoint — so the scan's replay
    // exercises checkpoint-root + JSON tail, not a full replay
    val ckptSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("provider", StringType))))))
    val rows = Seq(
      Row(null, null, Row(3, 7), null),
      Row(null, null, null, Row("planted-delta-scan", "parquet")),
      Row(null, Row("part-1.parquet"), null, null)) ++
      Seq(0, 2, 3).map(k =>
        Row(Row(s"part-$k.parquet", 1024L, true), null, null, null))
    val tmp = dir + "/_ckpt_tmp"
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), ckptSchema)
      .write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, root.resolve("_delta_log")
        .resolve("00000000000000000002.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    rmrf(Paths.get(tmp))
    Files.writeString(root.resolve("_delta_log")
        .resolve("_last_checkpoint"),
      s"""{"version":2,"size":${rows.size}}""")
    Files.createFile(marker) // marker LAST: a kill mid-plant replants
  }

  // ---------------------------------------------------------------
  // DELTA: the scan
  // ---------------------------------------------------------------

  // ---------------------------------------------------------------
  // DELTA: column mapping (round 19)
  // ---------------------------------------------------------------
  //
  // A column-mapped table stores PHYSICAL column names (or field
  // ids) in its parquet files; the logical schema lives only in
  // metaData.schemaString, whose per-field metadata carries
  // delta.columnMapping.physicalName / .id, with the mode in the
  // table configuration. A reader that ignores the mapping reads
  // physical (wrong) names — current Databricks-written tables use
  // this routinely.

  /** How to find one logical column inside a data file. */
  sealed trait ColRef
  final case class ByName(physical: String) extends ColRef
  final case class ById(fieldId: Int) extends ColRef

  /** metaData tail-line kernel: (schemaString, configuration). */
  def metaDataAction(line: String)
      : Option[(String, Map[String, String])] =
    try {
      MiniJson.parse(line) match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].get("metaData") match {
            case Some(md: Map[_, _]) =>
              val body = md.asInstanceOf[Map[String, Any]]
              val ss = body.get("schemaString") match {
                case Some(s: String) => s
                case _ => return None
              }
              val conf = body.get("configuration") match {
                case Some(c: Map[_, _]) =>
                  c.asInstanceOf[Map[String, Any]].collect {
                    case (k, v: String) => k -> v
                  }
                case _ => Map.empty[String, String]
              }
              Some((ss, conf))
            case _ => None
          }
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Resolve the logical columns from a parsed metaData. Identity
    * when the table is unmapped; physicalName lookups when mode =
    * "name"; field-id lookups when mode = "id". Refuses (throws)
    * a mapped table whose schema lacks the annotations — reading
    * physical names as logical would silently return wrong
    * columns.
    */
  def columnMapping(schemaString: String,
      conf: Map[String, String], logical: Seq[String])
      : Map[String, ColRef] = {
    val mode = conf.getOrElse("delta.columnMapping.mode", "none")
    if (mode == "none")
      return logical.map(c => c -> ByName(c)).toMap
    val fieldsByName = MiniJson.parseObject(schemaString)
      .get("fields") match {
      case Some(xs: Vector[_]) => xs.collect {
        case f: Map[_, _] =>
          val fm = f.asInstanceOf[Map[String, Any]]
          val name = fm.get("name") match {
            case Some(s: String) => s
            case _ => throw new IllegalStateException(
              "schemaString field without a name")
          }
          val meta = fm.get("metadata") match {
            case Some(m: Map[_, _]) =>
              m.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
          name -> meta
      }.toMap
      case _ => throw new IllegalStateException(
        "schemaString without fields")
    }
    logical.map { c =>
      val meta = fieldsByName.getOrElse(c,
        throw new IllegalStateException(s"no schema field $c"))
      val ref = mode match {
        case "name" => meta.get("delta.columnMapping.physicalName")
          match {
          case Some(p: String) => ByName(p)
          case _ => throw new IllegalStateException(
            s"mapped table without physicalName for $c")
        }
        case "id" => meta.get("delta.columnMapping.id") match {
          case Some(d: Double) if d.isWhole => ById(d.toInt)
          case _ => throw new IllegalStateException(
            s"mapped table without column id for $c")
        }
        case other => throw new IllegalStateException(
          s"unknown columnMapping mode $other")
      }
      c -> ref
    }.toMap
  }

  /** Decode one logical column from file bytes via its ColRef. */
  private def decodeRef(bytes: Array[Byte], ref: ColRef)
      : Option[ParquetTyped.PqTyped] = ref match {
    case ByName(p) => ParquetTyped.readTypedColumn(bytes, p)
    case ById(fid) => ParquetTyped.leafNameByFieldId(bytes, fid)
      .flatMap(n => ParquetTyped.readTypedColumn(bytes, n))
  }

  /** Write a column-mapped planted Delta table: 3 files of 150
    * rows (file k row j: id = 1000k + j, val = 5*id + 2) whose
    * parquet columns carry PHYSICAL names (and, in id mode, field
    * ids); the logical schema lives only in metaData.schemaString.
    */
  def plantDeltaMappedTable(spark: SparkSession, dir: String,
      mapMode: String): Unit = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    // "plain" = the unmapped twin: same planted content, logical
    // names in the files, no mapping — the identity baseline
    require(mapMode == "name" || mapMode == "id" || mapMode == "plain")
    val root = Paths.get(dir)
    val marker = root.resolve("_planted_v1")
    if (Files.exists(marker)) return
    rmrf(root)
    Files.createDirectories(root.resolve("_delta_log"))
    val (physId, physVal) = mapMode match {
      case "name" => ("col-9f8a1b2c", "col-3c47e2d9")
      case "id" => ("pc1", "pc2")
      case _ => ("id", "val")
    }
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
      "true")
    (0 until 3).foreach { k =>
      var df = spark.range(0, 150L).toDF("j")
        .select((col("j") + 1000L * k).as(physId),
          ((col("j") + 1000L * k) * 5 + 2).as(physVal))
      if (mapMode == "id") {
        // field ids ride the Spark schema metadata into parquet
        val fields = df.schema.fields.zipWithIndex.map {
          case (f, i) =>
            f.copy(metadata = new org.apache.spark.sql.types
              .MetadataBuilder().withMetadata(f.metadata)
              .putLong("parquet.field.id", 101L + i).build())
        }
        df = spark.createDataFrame(df.rdd,
          StructType(fields))
      }
      writeOneParquet(spark, df, root.resolve(s"part-$k.parquet"))
    }
    def fieldJson(logical: String, idx: Int, phys: String)
        : String = {
      val mapping =
        if (mapMode == "name")
          s""""delta.columnMapping.id":${101 + idx},""" +
            s""""delta.columnMapping.physicalName":"$phys""""
        else s""""delta.columnMapping.id":${101 + idx}"""
      s"""{\\"name\\":\\"$logical\\",\\"type\\":\\"long\\",""" +
        s"""\\"nullable\\":true,\\"metadata\\":{${mapping
          .replace("\"", "\\\"")}}}"""
    }
    val schemaString =
      s"""{\\"type\\":\\"struct\\",\\"fields\\":[""" +
        fieldJson("id", 0, physId) + "," +
        fieldJson("val", 1, physVal) + "]}"
    val ci = """{"commitInfo":{"operation":"WRITE",""" +
      """"timestamp":1700000000000}}"""
    def addJson(k: Int): String =
      s"""{"add":{"path":"part-$k.parquet","partitionValues":{},""" +
        s""""size":1024,"modificationTime":1700000000000,""" +
        s""""dataChange":true}}"""
    def w(v: Int, lines: String*): Unit =
      Files.writeString(root.resolve("_delta_log")
        .resolve(f"$v%020d.json"), lines.mkString("\n") + "\n")
    val conf =
      if (mapMode == "plain") "{}"
      else s"""{"delta.columnMapping.mode":"$mapMode",""" +
        s""""delta.columnMapping.maxColumnId":"102"}"""
    w(0, ci,
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"planted-delta-colmap-$mapMode",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaString",""" +
        s""""partitionColumns":[],"configuration":$conf}}""",
      addJson(0), addJson(1))
    w(1, ci, addJson(2))
    Files.createFile(marker)
  }

  /** Tail-line kernel with the DV descriptor: (kind, path, dvPath)
    * — dvPath empty when the add carries no deletionVector or the
    * storage type is not a path.
    */
  def actionWithDv(line: String): Option[(String, String, String)] =
    try {
      MiniJson.parse(line) match {
        case m: Map[_, _] =>
          val obj = m.asInstanceOf[Map[String, Any]]
          if (obj.size != 1) return None
          val (kind, body0) = obj.head
          val body = body0 match {
            case b: Map[_, _] => b.asInstanceOf[Map[String, Any]]
            case _ => return None
          }
          val path = body.get("path") match {
            case Some(p: String) => p
            case _ => ""
          }
          val dv = body.get("deletionVector") match {
            case Some(d: Map[_, _]) =>
              val dm = d.asInstanceOf[Map[String, Any]]
              (dm.get("storageType"), dm.get("pathOrInlineDv")) match {
                case (Some("p"), Some(p: String)) => p
                case _ => ""
              }
            case _ => ""
          }
          Some((kind, path, dv))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** The end-to-end Delta read: `_last_checkpoint` → checkpoint
    * parquet → JSON tail (last-action-wins, carrying the DV
    * descriptor) → typed parquet decode of the live files → DV
    * bitmap probe INSIDE the scan task → per-file live aggregate
    * (file_k, n_live, sum_val).
    */
  def deltaScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // reconcile tier (driver, metadata-sized): checkpoint adds at
    // the checkpoint version (when one exists) + versioned JSON
    // tail, per-path last-action-wins keeping the newest DV
    // descriptor
    val lcPath = Paths.get(dir, "_delta_log", "_last_checkpoint")
    val ckptV: Int =
      if (!Files.exists(lcPath)) -1
      else MiniJson.parseObject(Files.readString(lcPath))("version")
        match {
        case d: Double if d.isWhole && d >= 0 => d.toInt
        case _ => throw new IllegalStateException(
          "_last_checkpoint without an integral version")
      }
    val ckpt =
      if (ckptV < 0) Array.empty[(String, Long, String, String)]
      else spark.read.parquet(
          s"$dir/_delta_log/" + f"$ckptV%020d.checkpoint.parquet")
        .where(col("add").isNotNull)
        .select(col("add.path")).collect()
        .map(r => (r.getString(0), ckptV.toLong, "add", ""))
    val rx = "(\\d{20})\\.json".r
    var metaData: Option[(Long, (String, Map[String, String]))] =
      None
    val tail = scala.util.Using.resource(
      Files.list(Paths.get(dir, "_delta_log"))) { s =>
      s.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case rx(v) =>
            val lines = Files.readAllLines(p).asScala
              .filter(_.trim.nonEmpty)
            // latest metaData wins (schema + mapping mode); read
            // from EVERY commit, not just the tail — the mapping
            // must resolve even when the metaData predates the
            // checkpoint
            lines.flatMap(metaDataAction).lastOption.foreach { md =>
              if (!metaData.exists(_._1 > v.toLong))
                metaData = Some((v.toLong, md))
            }
            if (v.toLong > ckptV)
              lines.flatMap(actionWithDv)
                .collect { case (k, path, dv)
                  if k == "add" || k == "remove" =>
                  (path, v.toLong, k, dv)
                }
            else Iterator.empty
          case _ => Iterator.empty
        }
      }.toSeq
    }
    // logical -> physical column resolution (identity when the
    // table is unmapped)
    val refs = metaData.map(_._2) match {
      case Some((ss, conf)) =>
        columnMapping(ss, conf, Seq("id", "val"))
      case None => Map[String, ColRef]("id" -> ByName("id"),
        "val" -> ByName("val"))
    }
    val idRef = refs("id")
    val valRef = refs("val")
    val live = (ckpt ++ tail).groupBy(_._1).toSeq.flatMap {
      case (path, acts) =>
        // within a version an add outranks its paired remove
        val last = acts.maxBy(a => (a._2, if (a._3 == "add") 1 else 0))
        if (last._3 == "add") Some((path, last._4)) else None
    }
    val dvByFile = live.collect {
      case (path, dv) if dv.nonEmpty =>
        s"$dir/$path" -> Files.readAllBytes(Paths.get(dv))
    }.toMap
    val dvB = spark.sparkContext.broadcast(dvByFile)
    // data tier: distributed typed decode with the DV membership
    // probe inside the task — rows whose position is set in the
    // file's bitmap never leave the scan
    val bin = spark.read.format("binaryFile")
      .load(live.map { case (p, _) => s"$dir/$p" }: _*)
      .select(regexp_replace(col("path"), "^file:/*", "/")
        .as("file_path"), col("content"))
    val enc = org.apache.spark.sql.Encoders.row(ScanRowSchema)
    val rows = bin.mapPartitions { it =>
      it.flatMap { r =>
        val path = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val dv = dvB.value.get(path)
          .flatMap(DeletionVectors.parseDvBlob)
        val decoded = for {
          ids <- decodeRef(bytes, idRef)
          vals <- decodeRef(bytes, valRef)
          if ids.values.length == vals.values.length
        } yield (ids.values, vals.values)
        decoded match {
          case Some((ids, vals)) =>
            ids.indices.iterator
              .filter(i => !dv.exists(_.contains(i.toLong)))
              .map { i =>
                Row(path, i.toLong,
                  ids(i).asInstanceOf[java.lang.Long].longValue(),
                  vals(i).asInstanceOf[java.lang.Long].longValue())
              }
          case None => Iterator.single(Row(path, -1L, null, null))
        }
      }
    }(enc)
    rows
      .select(regexp_extract(col("file_path"),
          "part-(\\d+)\\.parquet$", 1).cast("int").as("file_k"),
        col("v"))
      .groupBy(col("file_k"))
      .agg(count(lit(1)).cast("long").as("n_live"),
        sum(col("v")).cast("long").as("sum_val"))
  }
}
