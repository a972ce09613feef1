package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The LAKEHOUSE-metadata analog of [[ArtifactOmni]]/[[MlOmni]]:
  * one sniff-routed dispatch over the table-format metadata tier a
  * 100 TB lake actually plans scans with — Delta commit logs
  * (JSON actions), both Iceberg Avro tiers (manifest list /
  * manifest file, told apart by their spec field names after the
  * Avro magic routes them), and parquet/ORC footers — flattened to
  * the same (label, fact, measure) row shape. Routing never
  * guesses: the Delta branch demands a full action-by-action parse
  * (JSON text alone is not a commit log), the Iceberg branches
  * demand the schema walk, and damage classifies as an all-null
  * row.
  *
  * Every branch rides an individually-tested decoder
  * ([[DeltaLog]], [[Iceberg]], [[ParquetMeta]], [[Orc]]); this
  * compose proves the DISPATCH — the thing a metadata census over
  * a mixed lake does all day, map-only, no data-file reads.
  */
object LakehouseOmni {

  val lakehouseSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("fact", StringType),
    StructField("measure", LongType)))

  /** Route one payload. */
  def decodeLakehouse(bytes: Array[Byte]): Seq[Any] = {
    val sniffed = Sniff.sniff(bytes)
    val res: Option[(String, String, Long)] = sniffed match {
      case "application/avro" =>
        // the two Iceberg tiers are both Avro containers — their
        // spec schemas are the discriminator
        Avro.containerFieldNames(bytes).flatMap { names =>
          if (names.contains("manifest_path") &&
            names.contains("added_files_count")) {
            Iceberg.decodeManifestList(bytes) match {
              case Seq(_, _, addedRows: Any, _, _, _,
                  specIds: Any, _, _, _, _, _) if addedRows != null =>
                Some(("application/x-iceberg-manifest-list",
                  specIds.asInstanceOf[String],
                  addedRows.asInstanceOf[Long]))
              case _ => None
            }
          } else if (names.contains("status") &&
            names.contains("data_file")) {
            Iceberg.decodeManifest(bytes) match {
              case Seq(_, _, _, _, _, rowsSum: Any, _,
                  formats: Any, _, _) if rowsSum != null =>
                Some(("application/x-iceberg-manifest",
                  formats.asInstanceOf[String],
                  rowsSum.asInstanceOf[Long]))
              case _ => None
            }
          } else None
        }
      case "application/vnd.apache.parquet" =>
        ParquetMeta.parquetMeta(bytes).map(m =>
          (sniffed, m.codecs.mkString(","), m.numRows))
      case "application/x-orc" =>
        Orc.orcMeta(bytes).map(m =>
          (sniffed, m.compression, m.numRows))
      case "text/plain" =>
        // a Delta commit log is newline-delimited single-action
        // JSON objects — demand the full census, never a guess
        DeltaLog.deltaFacts(new String(bytes,
          java.nio.charset.StandardCharsets.UTF_8)).map(f =>
          ("application/x-delta-log", f.provider, f.addBytes))
      case _ => None
    }
    res match {
      case Some((label, fact, measure)) =>
        Seq[Any](label, fact, measure)
      case None => Seq[Any](null, null, null)
    }
  }

  /** Per-row synth: the kind cycles by id over the five branches;
    * the parquet/ORC fixture index rides id/5 so it varies
    * independently of the kind.
    */
  def synthLakehouse(df: DataFrame, idCol: String, outCol: String)
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
        val fxIdx = java.lang.Math.floorMod(id / 5, 5L).toInt
        val bytes = java.lang.Math.floorMod(id, 5L).toInt match {
          case 0 =>
            val a = (id % 4 + 1).toInt
            DeltaLog.deltaWrite(
              (0 until a).map(i => 100 * id + i),
              (id % 3).toInt,
              if (id % 2 == 0) Seq("dt") else Seq.empty)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case 1 => Iceberg.manifestListWrite(id)
          case 2 => Iceberg.manifestWrite(id)
          case 3 => ParquetMeta.Fixtures(fxIdx)
          case _ => Orc.Fixtures(fxIdx)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
