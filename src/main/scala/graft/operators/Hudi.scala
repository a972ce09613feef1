package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.MiniJson

/** Apache Hudi TIMELINE census (round 18) — the third lakehouse
  * table format next to Delta (commit log + checkpoint + DVs) and
  * Iceberg (metadata.json + manifests + deletes). Hudi's source of
  * truth is the `.hoodie/` timeline: one file per INSTANT, the
  * state encoded in the file name itself —
  * `<ts>.<action>[.<state>]` where a bare action suffix means
  * COMPLETED and `.inflight`/`.requested` mark in-flight states a
  * reader must ignore. Completed commit instants carry a JSON body
  * whose `partitionToWriteStats` maps partitions to per-file write
  * statistics — the facts an incremental consumer or a table-size
  * census reads without touching a data file.
  *
  * The reader mirrors q_delta_checkpoint's shape: the instant
  * LISTING is driver-side metadata (tiny at any data scale — one
  * file name per commit), the commit BODIES are read and parsed
  * distributed (spark.read.textFile → map-only JSON kernel →
  * explode), and the census is one hash aggregate by partition.
  */
object Hudi {

  /** The planted timeline arithmetic, shared by writer and spec:
    * instants v = 0..9 at ts 20240101000000 + v; v % 3 == 2 is
    * INFLIGHT (no body, ignored by the census), the rest complete;
    * v % 4 == 0 adds a clean instant. A completed commit v writes
    * partitions p0 .. p(v%2) with numWrites = 10 + v + p and
    * totalWriteBytes = 1000 * v + p.
    */
  def plantedCompleted: Seq[Int] = (0 to 9).filterNot(_ % 3 == 2)

  private def commitJson(v: Int): String = {
    val parts = (0 to v % 2).map { p =>
      s""""p$p": [{"fileId": "f-$v-$p", "path": "p$p/f-$v-$p.parquet",""" +
      s""" "numWrites": ${10 + v + p}, "numInserts": ${10 + v + p},""" +
      s""" "totalWriteBytes": ${1000 * v + p}}]"""
    }.mkString(", ")
    s"""{"partitionToWriteStats": {$parts}, """ +
    s""""operationType": "UPSERT", "totalRecordsWritten": 0}"""
  }

  /** Write the planted `.hoodie/` timeline. Idempotent rewrite. */
  def writeTimeline(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val hoodie = Paths.get(dir, ".hoodie")
    if (Files.exists(hoodie))
      Files.walk(hoodie).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(hoodie)
    (0 to 9).foreach { v =>
      val ts = 20240101000000L + v
      if (v % 3 == 2)
        Files.writeString(hoodie.resolve(s"$ts.commit.inflight"), "")
      else
        Files.writeString(hoodie.resolve(s"$ts.commit"),
          commitJson(v))
      if (v % 4 == 0)
        Files.writeString(hoodie.resolve(s"$ts.clean"), "{}")
    }
  }

  /** Instant-name grammar: (ts, action, state). */
  def parseInstant(name: String): Option[(Long, String, String)] = {
    val parts = name.split('.')
    if (parts.length < 2 || parts.length > 3) return None
    val ts = try java.lang.Long.parseLong(parts(0))
      catch { case _: NumberFormatException => return None }
    val state = if (parts.length == 2) "completed" else parts(2)
    if (state != "completed" && state != "inflight" &&
      state != "requested") return None
    Some((ts, parts(1), state))
  }

  /** Map-only commit-body kernel: (partition, numWrites, bytes)
    * triples from one commit JSON; malformed bodies yield nothing
    * (the census is a lake-health measure — a corrupt instant is
    * its own signal, surfaced by count mismatch, not a crash).
    */
  def writeStats(body: String): Seq[(String, Long, Long)] =
    try {
      MiniJson.parse(body) match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]]
            .get("partitionToWriteStats") match {
            case Some(p: Map[_, _]) =>
              p.asInstanceOf[Map[String, Any]].toSeq.flatMap {
                case (part, stats: Vector[_]) =>
                  stats.flatMap {
                    case s: Map[_, _] =>
                      val sm = s.asInstanceOf[Map[String, Any]]
                      (sm.get("numWrites"), sm.get(
                        "totalWriteBytes")) match {
                        case (Some(w: Double), Some(b: Double))
                            if w.isWhole && b.isWhole =>
                          Some((part, w.toLong, b.toLong))
                        case _ => None
                      }
                    case _ => None
                  }
                case _ => Seq.empty
              }
            case _ => Seq.empty
          }
        case _ => Seq.empty
      }
    } catch { case _: Exception => Seq.empty }

  /** Per-partition census over the COMPLETED commit instants:
    * (partition, n_commits, writes, bytes) + the timeline counts
    * rolled in as columns (constant per table).
    */
  def timelineCensus(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val names = scala.util.Using.resource(
      Files.list(Paths.get(dir, ".hoodie"))) { s =>
      s.iterator().asScala.map(_.getFileName.toString).toSeq
    }
    val instants = names.flatMap(n =>
      parseInstant(n).map { case (ts, a, st) => (n, ts, a, st) })
    val nInflight = instants.count(i => i._4 != "completed")
    val nCleans = instants.count(i =>
      i._3 == "clean" && i._4 == "completed")
    val latest = instants.filter(_._4 == "completed")
      .map(_._2).maxOption.getOrElse(-1L)
    val commitFiles = instants
      .filter(i => i._3 == "commit" && i._4 == "completed")
      .map(i => s"$dir/.hoodie/${i._1}")
    import spark.implicits._
    val stats =
      if (commitFiles.isEmpty)
        spark.emptyDataset[(String, Long, Long)]
          .toDF("partition", "writes", "bytes")
      else
        spark.read.textFile(commitFiles: _*)
          .flatMap(l => writeStats(l))
          .toDF("partition", "writes", "bytes")
    stats.groupBy(col("partition"))
      .agg(count(lit(1)).cast("int").as("n_commits"),
        sum(col("writes")).as("writes"),
        sum(col("bytes")).as("bytes"))
      .withColumn("n_inflight", lit(nInflight))
      .withColumn("n_cleans", lit(nCleans))
      .withColumn("latest_ts", lit(latest))
  }

  // ---------------------------------------------------------------
  // MOR read depth (round 19): HoodieLogFormat blocks + file-group
  // resolution — the read path Delta/Iceberg got in r18/r19 and
  // Hudi lacked. A MOR file group = the latest base file per
  // fileId (at or before the latest completed instant) plus the
  // ordered log files rooted at that base instant; the log files
  // are HoodieLogFormat: per block
  //   [#HUDI# magic][block length][format version][block type]
  //   [header map<int,string>][content length][content]
  //   [footer map][total block length]
  // (the public log-format layout; block types by ordinal —
  // 0 COMMAND, 1 DELETE, 2 CORRUPT, 3 AVRO_DATA, 5 PARQUET_DATA).
  // A damaged block refuses forward to the next magic and is
  // counted CORRUPT, exactly the reader's recovery rule.
  // ---------------------------------------------------------------

  private val LogMagic = "#HUDI#".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  final case class LogBlock(version: Int, btype: Int,
      headers: Map[Int, String], content: Array[Byte])

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (b(o + j) & 0xffL); j += 1 }
    v
  }

  /** Serialize one log block (the planted writer). */
  def logBlockWrite(version: Int, btype: Int,
      headers: Map[Int, String], content: Array[Byte])
      : Array[Byte] = {
    // body first (its length rides the block-length field)
    val tmp = new java.io.ByteArrayOutputStream()
    def t32(v: Int): Unit = {
      tmp.write((v >>> 24) & 0xff); tmp.write((v >>> 16) & 0xff)
      tmp.write((v >>> 8) & 0xff); tmp.write(v & 0xff)
    }
    def t64(v: Long): Unit = { t32((v >>> 32).toInt); t32(v.toInt) }
    def tmap(m: Map[Int, String]): Unit = {
      t32(m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val bytes = v.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
        t32(k); t32(bytes.length); tmp.write(bytes, 0, bytes.length)
      }
    }
    t32(version)
    t32(btype)
    tmap(headers)
    t64(content.length.toLong)
    tmp.write(content, 0, content.length)
    tmap(Map.empty) // footer
    val body = tmp.toByteArray
    val o = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    def w64(v: Long): Unit = { w32((v >>> 32).toInt); w32(v.toInt) }
    o.write(LogMagic, 0, LogMagic.length)
    // block length = body + the trailing total-length long
    w64(body.length.toLong + 8)
    o.write(body, 0, body.length)
    w64(LogMagic.length.toLong + 8 + body.length + 8)
    o.toByteArray
  }

  /** Walk a log file's blocks. Damage refuses FORWARD: a bad
    * block scans to the next magic and surfaces as type -1
    * (corrupt), never a crash — the reader's recovery rule.
    */
  def logBlocks(b: Array[Byte]): Seq[LogBlock] = {
    if (b == null) return Seq.empty
    val out = Seq.newBuilder[LogBlock]
    var p = 0
    def magicAt(q: Int): Boolean =
      q + LogMagic.length <= b.length &&
        (0 until LogMagic.length).forall(i =>
          b(q + i) == LogMagic(i))
    def nextMagic(from: Int): Int = {
      var q = from
      while (q < b.length && !magicAt(q)) q += 1
      q
    }
    while (p < b.length) {
      if (!magicAt(p)) {
        val q = nextMagic(p)
        if (q > p) out += LogBlock(-1, -1, Map.empty,
          java.util.Arrays.copyOfRange(b, p, math.min(q, b.length)))
        p = q
      } else {
        val blk = try {
          var q = p + LogMagic.length
          val blockLen = be64(b, q); q += 8
          if (blockLen < 24 ||
            p + LogMagic.length + 8 + blockLen - 8 > b.length)
            throw new IllegalStateException("len")
          val version = be32(b, q); q += 4
          val btype = be32(b, q); q += 4
          val nh = be32(b, q); q += 4
          if (nh < 0 || nh > 1000)
            throw new IllegalStateException("hdr")
          var headers = Map.empty[Int, String]
          (0 until nh).foreach { _ =>
            val k = be32(b, q); q += 4
            val len = be32(b, q); q += 4
            if (len < 0 || q + len > b.length)
              throw new IllegalStateException("hv")
            headers += k -> new String(b, q, len,
              java.nio.charset.StandardCharsets.UTF_8)
            q += len
          }
          val clen = be64(b, q); q += 8
          if (clen < 0 || q + clen > b.length)
            throw new IllegalStateException("clen")
          val content = java.util.Arrays.copyOfRange(b, q,
            q + clen.toInt)
          q += clen.toInt
          val nf = be32(b, q); q += 4
          (0 until nf).foreach { _ =>
            q += 4
            val len = be32(b, q); q += 4
            q += len
          }
          val total = be64(b, q); q += 8
          if (total != q - p)
            throw new IllegalStateException("total")
          Some((LogBlock(version, btype, headers, content), q))
        } catch { case _: Exception => None }
        blk match {
          case Some((lb, q)) =>
            out += lb
            p = q
          case None =>
            val q = nextMagic(p + 1)
            out += LogBlock(-1, -1, Map.empty, Array.empty)
            p = q
        }
      }
    }
    out.result()
  }

  /** Base-file name grammar `<fileId>_<writeToken>_<instant>
    * .parquet` → (fileId, instant).
    */
  def parseBaseName(name: String): Option[(String, Long)] = {
    if (!name.endsWith(".parquet")) return None
    val stem = name.dropRight(".parquet".length)
    val parts = stem.split('_')
    if (parts.length != 3) return None
    try Some((parts(0), java.lang.Long.parseLong(parts(2))))
    catch { case _: NumberFormatException => None }
  }

  /** Log-file name grammar `.<fileId>_<baseInstant>.log.<version>
    * _<writeToken>` → (fileId, baseInstant, logVersion).
    */
  def parseLogName(name: String): Option[(String, Long, Int)] = {
    if (!name.startsWith(".")) return None
    val ix = name.indexOf(".log.")
    if (ix < 0) return None
    val head = name.substring(1, ix)
    val tail = name.substring(ix + 5)
    val hu = head.lastIndexOf('_')
    if (hu < 0) return None
    val tu = tail.indexOf('_')
    if (tu < 0) return None
    try Some((head.substring(0, hu),
      java.lang.Long.parseLong(head.substring(hu + 1)),
      Integer.parseInt(tail.substring(0, tu))))
    catch { case _: NumberFormatException => None }
  }

  /** The planted MOR table: timeline with completed instants
    * 1,3,5,7 and an INFLIGHT 9; partitions p0/p1 holding three
    * file groups —
    *  fg-a (p0): bases at 1 AND 5 (resolution must pick 5, count
    *     the stale 1), logs for base 5 at versions 1,2 (data +
    *     delete blocks) plus a STALE log rooted at base 1;
    *  fg-b (p0): base at 3, one log with one data block;
    *  fg-c (p1): base only at 5;
    * plus a base at the inflight instant 9 that must be ignored.
    * All content closed-form.
    */
  def writeMorTable(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(dir)
    if (Files.exists(root))
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    val hoodie = root.resolve(".hoodie")
    Files.createDirectories(hoodie)
    Seq(1, 3, 5, 7).foreach(v =>
      Files.writeString(hoodie.resolve(s"$v.deltacommit"), "{}"))
    Files.writeString(hoodie.resolve("9.deltacommit.inflight"), "")
    val p0 = root.resolve("p0")
    val p1 = root.resolve("p1")
    Files.createDirectories(p0)
    Files.createDirectories(p1)
    def touch(p: java.nio.file.Path): Unit =
      Files.write(p, Array[Byte](80, 65, 82, 49)) // placeholder
    touch(p0.resolve("fg-a_0-0-0_1.parquet")) // stale version
    touch(p0.resolve("fg-a_0-0-0_5.parquet"))
    touch(p0.resolve("fg-b_0-0-0_3.parquet"))
    touch(p1.resolve("fg-c_0-0-0_5.parquet"))
    touch(p0.resolve("fg-a_0-0-0_9.parquet")) // inflight: ignore
    def dataBlock(instant: Long, records: Int): Array[Byte] =
      logBlockWrite(1, 3, Map(1 -> instant.toString),
        (0 until records).map(i => s"""{"r":$i}""")
          .mkString("\n").getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
    def deleteBlock(instant: Long, keys: Int): Array[Byte] =
      logBlockWrite(1, 1, Map(1 -> instant.toString),
        (0 until keys).map(i => s"k$i").mkString(",").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
    // fg-a logs rooted at base 5: v1 = data(7 recs), v2 = data(4)
    // + delete(3)
    Files.write(p0.resolve(".fg-a_5.log.1_0-0-0"),
      dataBlock(7L, 7))
    Files.write(p0.resolve(".fg-a_5.log.2_0-0-0"),
      dataBlock(7L, 4) ++ deleteBlock(7L, 3))
    // STALE log rooted at the replaced base 1 — must not attach
    Files.write(p0.resolve(".fg-a_1.log.1_0-0-0"),
      dataBlock(3L, 99))
    // fg-b: one log, one data block of 5 records
    Files.write(p0.resolve(".fg-b_3.log.1_0-0-0"),
      dataBlock(7L, 5))
  }

  /** FILE-GROUP resolution + log decode: per file group the
    * latest COMPLETED base, its ordered log files, and the block
    * census from walking each log's HoodieLogFormat blocks. The
    * listing tier is driver-side metadata; the log DECODE is a
    * distributed binary scan (map-only per file), aggregated per
    * file group.
    */
  def fileGroups(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir)
    val completed = scala.util.Using.resource(
      Files.list(root.resolve(".hoodie"))) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .flatMap(parseInstant)
        .filter(_._3 == "completed").map(_._1).toSet
    }
    val partitions = scala.util.Using.resource(Files.list(root)) {
      s => s.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          !p.getFileName.toString.startsWith("."))
        .toSeq
    }
    final case class Group(partition: String, fileId: String,
      baseInstant: Long, nStale: Int, logs: Seq[(String, Int)])
    val groups = partitions.flatMap { part =>
      val names = scala.util.Using.resource(Files.list(part)) { s =>
        s.iterator().asScala.map(_.getFileName.toString).toSeq
      }
      val bases = names.flatMap(parseBaseName)
        .filter { case (_, inst) => completed(inst) }
      val logs = names.flatMap(n => parseLogName(n).map(n -> _))
      bases.groupBy(_._1).map { case (fileId, versions) =>
        val latest = versions.map(_._2).max
        val attached = logs
          .filter { case (_, (fid, base, _)) =>
            fid == fileId && base == latest
          }
          .sortBy(_._2._3)
          .map { case (n, (_, _, v)) =>
            (part.resolve(n).toString, v)
          }
        Group(part.getFileName.toString, fileId, latest,
          versions.length - 1, attached)
      }
    }
    import spark.implicits._
    val groupDf = groups.map(g => (g.partition, g.fileId,
        g.baseInstant, g.nStale, g.logs.length))
      .toDF("partition", "file_group", "base_instant",
        "n_stale_bases", "n_logs")
    val logFiles = groups.flatMap(g =>
      g.logs.map { case (path, _) => (path, g.fileId) })
    if (logFiles.isEmpty)
      return groupDf
        .withColumn("n_data_blocks",
          org.apache.spark.sql.functions.lit(0))
        .withColumn("n_delete_blocks",
          org.apache.spark.sql.functions.lit(0))
        .withColumn("n_corrupt_blocks",
          org.apache.spark.sql.functions.lit(0))
        .withColumn("log_records",
          org.apache.spark.sql.functions.lit(0L))
    // distributed log decode: one map task per log file. NOT
    // spark.read.format("binaryFile") — Spark's file index treats
    // dot-prefixed files as hidden and silently lists zero log
    // files, which is exactly why Hudi ships its own log reader.
    // The paths distribute as data; each task opens its own file.
    val blockRows = logFiles.toDF("path", "file_group")
      .repartition(math.min(logFiles.length, 32))
      .flatMap { r =>
        val fg = r.getString(1)
        val bytes =
          try java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(r.getString(0)))
          catch { case _: java.io.IOException => null }
        logBlocks(bytes).map { blk =>
          val records =
            if (blk.btype == 3)
              new String(blk.content,
                java.nio.charset.StandardCharsets.UTF_8)
                .split('\n').count(_.trim.nonEmpty)
            else 0
          (fg, blk.btype, records.toLong)
        }
      }.toDF("file_group", "btype", "records")
    val census = blockRows.groupBy(col("file_group"))
      .agg(
        sum(when(col("btype") === 3, 1).otherwise(0)).cast("int")
          .as("n_data_blocks"),
        sum(when(col("btype") === 1, 1).otherwise(0)).cast("int")
          .as("n_delete_blocks"),
        sum(when(col("btype") === -1, 1).otherwise(0)).cast("int")
          .as("n_corrupt_blocks"),
        sum(when(col("btype") === 3, col("records"))
          .otherwise(0L)).as("log_records"))
    groupDf.join(census, Seq("file_group"), "left_outer")
      .na.fill(0, Seq("n_data_blocks", "n_delete_blocks",
        "n_corrupt_blocks"))
      .na.fill(0L, Seq("log_records"))
  }
}
