package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The binary-artifact analog of [[OmniCrawl]]: one sniff-routed
  * dispatch over the NON-document tier a 100 TB corpus carries —
  * executables (ELF/PE), bytecode (.class/.wasm), fonts, columnar
  * data (parquet), package metadata (.torrent) and VCS packs —
  * each routed by magic bytes to its metadata extractor and
  * flattened into one uniform (label, fact, measure) row shape for
  * downstream census/filter joins. The routing never guesses: an
  * unrecognized or damaged payload classifies as an all-null row.
  *
  * Every branch rides a decoder that is individually
  * reference-pinned (readelf, objdump's BFD, javap, Node's
  * WebAssembly, fc-scan, parquet-mr, hashlib, git) — this compose
  * proves the DISPATCH over a mixed corpus, the thing a real
  * curation run does all day.
  */
object ArtifactOmni {

  val artifactSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("fact", StringType),
    StructField("measure", LongType)))

  /** Route one payload: (sniff label, a type-specific headline
    * fact, a type-specific count).
    */
  def decodeArtifact(bytes: Array[Byte]): Seq[Any] = {
    val label = Sniff.sniff(bytes)
    val res: Option[(String, Long)] = label match {
      case "application/x-elf" =>
        Elf.elfMeta(bytes).map(m => (m.machine,
          m.nSections.toLong))
      case "application/vnd.microsoft.portable-executable" =>
        Pe.peMeta(bytes).map(m => (m.machine, m.nSections.toLong))
      case "application/java-vm" =>
        JavaClass.classMeta(bytes).map(m => (m.className,
          m.nMethods.toLong))
      case "application/wasm" =>
        Wasm.wasmMeta(bytes).map(m => (m.customNames.mkString(","),
          m.nExports.toLong))
      case "font/ttf" | "font/woff" | "font/woff2" | "font/otf" =>
        Font.fontMeta(bytes).map(m => (m.family, m.nGlyphs.toLong))
      case "application/vnd.apache.parquet" =>
        ParquetMeta.parquetMeta(bytes).map(m =>
          (m.codecs.mkString(","), m.numRows))
      case "application/x-bittorrent" =>
        Torrent.torrentMeta(bytes).map(m => (m.name, m.totalLength))
      case "application/x-git-pack" =>
        GitPack.packObjects(bytes).map(os =>
          (os.map(_.objType).distinct.sorted.mkString(","),
            os.length.toLong))
      case "application/x-mach-binary" =>
        MachO.machMeta(bytes).map(m =>
          (s"${m.container}:${m.cpu}",
            m.nCmds.toLong + m.nArchs))
      case "application/java-archive" =>
        Jar.jarMeta(bytes).map(m =>
          (m.mainClass, m.nClasses.toLong))
      case "application/x-git-loose-object" =>
        GitLoose.looseObject(bytes).map(o =>
          (o.objType, o.size))
      case "application/pkix-cert" |
           "application/x-pem-certificate" =>
        // real CA serials are 16-20 random bytes (> 2^63):
        // BigInteger keeps the dispatch total where parseLong would
        // throw; longValue() truncation is deterministic either way
        X509.certMeta(bytes).map(m =>
          (m.subjectCn,
            new java.math.BigInteger(m.serialHex, 16).longValue()))
      case "application/vnd.tcpdump.pcap" =>
        Pcap.pcapMeta(bytes).map(m => (m.linktype, m.nPackets))
      case _ => None
    }
    res match {
      case Some((fact, measure)) => Seq[Any](label, fact, measure)
      case None => Seq[Any](null, null, null)
    }
  }

  /** Per-row synth: the artifact kind cycles by id over all eight
    * branches (fonts additionally cycle their three containers).
    */
  def synthArtifacts(df: DataFrame, idCol: String, outCol: String)
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
        val bytes = java.lang.Math.floorMod(id, 13L).toInt match {
          case 0 => Elf.elfWrite(is64 = true, 62,
            (0 until (java.lang.Math.floorMod(id, 3L).toInt + 1))
              .map(j => s".s$j"))
          case 1 => Pe.peWrite(is64 = true, isDll = false,
            (0 until (java.lang.Math.floorMod(id, 3L).toInt + 1))
              .map(j => s".s$j"))
          case 2 => JavaClass.classWrite(s"corpus.Doc$id",
            (0 until (java.lang.Math.floorMod(id, 3L).toInt + 1))
              .map(j => s"m$j"), 0)
          case 3 => Wasm.wasmWrite(
            (0 until (java.lang.Math.floorMod(id, 3L).toInt + 1))
              .map(j => s"fn$j"), s"meta$id")
          case 4 =>
            val sfnt = Font.sfntWrite(s"Family $id", "Regular",
              (100 + java.lang.Math.floorMod(id, 900L)).toInt, 2048)
            java.lang.Math.floorMod(id, 3L).toInt match {
              case 0 => sfnt
              case 1 => Font.woffWrap(sfnt)
              case _ => Font.woff2Wrap(sfnt)
            }
          case 5 => ParquetMeta.Fixtures(
            java.lang.Math.floorMod(id, 5L).toInt)
          case 6 => Torrent.torrentWrite(s"corpus-$id", 16384L,
            Seq(10000L + java.lang.Math.floorMod(id, 5000L)), id)
          case 7 => GitPack.packWrite(
            (0 until (java.lang.Math.floorMod(id, 3L).toInt + 1))
              .map(j => s"blob $id content $j padded for realism"
                .getBytes("UTF-8")),
            useDeltas = false)
          case 8 =>
            val thinX = MachO.machWrite(0x01000007, 2,
              java.lang.Math.floorMod(id, 3L).toInt + 1,
              Seq("/usr/lib/libfix0.dylib"))
            if (id % 2 == 0) thinX
            else MachO.fatWrite(Seq((0x01000007, thinX),
              (0x0100000C, MachO.machWrite(0x0100000C, 2,
                java.lang.Math.floorMod(id, 3L).toInt + 1,
                Seq("/usr/lib/libfix0.dylib")))))
          case 9 => Jar.jarWrite("com.corpus.Main",
            "omni-created-by",
            java.lang.Math.floorMod(id, 2L).toInt + 1, 2)
          case 10 => GitLoose.looseWrite("blob",
            s"omni blob $id".getBytes("UTF-8"))
          case 11 => X509.certWrite(1000 + id % 9000,
            s"doc${id % 50}.example", s"Org ${id % 7}",
            2024 + (id % 3).toInt, 1, Seq.empty,
            ecdsa = id % 2 == 1)
          case _ =>
            val pkts = Seq((40 + (id % 20).toInt,
              40 + (id % 20).toInt))
            if (id % 2 == 0) Pcap.pcapWrite(1, pkts)
            else Pcap.pcapngWrite(1, pkts)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
