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
          } else if (names == Seq("file_path", "pos")) {
            // v2 position-delete payload (round 18)
            Iceberg.decodePosDeletes(bytes) match {
              case Seq(csv: String) =>
                Some(("application/x-iceberg-pos-delete",
                  "pos-delete",
                  (csv.count(_ == ',') + 1).toLong))
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
        val text = new String(bytes,
          java.nio.charset.StandardCharsets.UTF_8)
        // Iceberg table metadata FIRST (one JSON object with the
        // spec's format-version + snapshot machinery — the full
        // census must parse, never a key sniff); a multi-line
        // commit log fails that parse and falls through to the
        // Delta branch, whose one-action-per-line rule a
        // metadata.json fails symmetrically
        (Iceberg.decodeMetadataJson(bytes) match {
          case Seq(fv: Any, _, cur: Any, _, _, _, _, _, _, _, _, _,
              _, fmt: Any, _, _) if fv != null =>
            Some(("application/x-iceberg-metadata",
              fmt.asInstanceOf[String], cur.asInstanceOf[Long]))
          case _ => None
        }).orElse(
          DeltaLog.deltaFacts(text).map(f =>
            ("application/x-delta-log", f.provider, f.addBytes)))
      case "application/octet-stream" =>
        // a Delta deletion-vector blob (round 18): version byte +
        // BE size + CRC-framed portable roaring — the checksum
        // must verify or the payload stays unclassified
        DeletionVectors.parseDvBlob(bytes).map(rb =>
          ("application/x-delta-dv",
            s"maps=${rb.maps.length}", rb.cardinality))
      case _ => None
    }
    res match {
      case Some((label, fact, measure)) =>
        Seq[Any](label, fact, measure)
      case None => Seq[Any](null, null, null)
    }
  }

  /** Per-row synth: the kind cycles by id over the eight branches
    * (round 18 adds metadata.json, the DV blob and the
    * position-delete payload); the parquet/ORC fixture index rides
    * id/8 so it varies independently of the kind.
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
        val fxIdx = java.lang.Math.floorMod(id / 8, 5L).toInt
        val bytes = java.lang.Math.floorMod(id, 8L).toInt match {
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
          case 4 => Orc.Fixtures(fxIdx)
          case 5 => Iceberg.metadataJsonWrite(id)
          case 6 => DeletionVectors.dvWrite(id)
          case _ => Iceberg.posDeleteWrite(id)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
