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
}
