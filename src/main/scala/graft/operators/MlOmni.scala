package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The ML-ARTIFACT analog of [[ArtifactOmni]] (C234): one
  * sniff-routed dispatch over the model/array tier a training lake
  * carries — numpy arrays (.npy and zip-wrapped .npz), pickles,
  * safetensors, GGUF models, and the three columnar blobs' newest
  * siblings here (ORC, Arrow IPC) — each routed by magic (or, for
  * magic-less safetensors, by full validation; for .npz, by the
  * zip walk proving every member is an .npy) to its
  * individually-pinned extractor and flattened into the same
  * (label, fact, measure) row shape as C225. Unrecognized or
  * damaged payloads classify as all-null rows, never guesses.
  */
object MlOmni {

  val mlSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("fact", StringType),
    StructField("measure", LongType)))

  /** Route one payload: (label, headline fact, count). */
  def decodeMl(bytes: Array[Byte]): Seq[Any] = {
    val sniffed = Sniff.sniff(bytes)
    val res: Option[(String, String, Long)] = sniffed match {
      case "application/x-npy" =>
        Npy.npyMeta(bytes).map(m =>
          (sniffed, m.descr, m.nElems))
      case "application/zip" =>
        // an archive whose EVERY member parses as .npy is an .npz
        Npy.npzEntries(bytes).flatMap { es =>
          if (es.isEmpty || !es.forall(e =>
            e._1.endsWith(".npy") && e._2.isDefined)) None
          else Some(("application/x-npz",
            es.map(_._2.get.descr).mkString(","),
            es.map(_._2.get.nElems).sum))
        }
      case "application/x-python-pickle" =>
        Pickle.pickleCensus(bytes).map(f =>
          (sniffed, f.topKind, f.nOps.toLong))
      case "application/x-safetensors" =>
        SafeTensors.stMeta(bytes).map(m =>
          (sniffed, m.dtypes.mkString(","), m.totalParams))
      case "application/x-gguf" =>
        Gguf.ggufMeta(bytes).map(m =>
          (sniffed, m.arch, m.totalParams))
      case "application/x-orc" =>
        Orc.orcMeta(bytes).map(m =>
          (sniffed, m.compression, m.numRows))
      case "application/vnd.apache.arrow.file" =>
        ArrowIpc.arrowMeta(bytes).map(m =>
          (sniffed, m.types.mkString(","), m.rows))
      case "application/x-python-bytecode" =>
        Pyc.pycFacts(bytes).map(f =>
          (sniffed, f.invalidation,
            f.nConsts.getOrElse(0).toLong))
      case "application/x-hdf5" =>
        Hdf5.h5Meta(bytes).map(m =>
          (sniffed, s"v${m.version}",
            if (m.eofMatches) 1L else 0L))
      case _ => None
    }
    res match {
      case Some((label, fact, measure)) =>
        Seq[Any](label, fact, measure)
      case None => Seq[Any](null, null, null)
    }
  }

  /** Per-row synth: the kind cycles by id over all seven branches. */
  def synthMl(df: DataFrame, idCol: String, outCol: String)
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
        def le(v: Long, w: Int,
            out: java.io.ByteArrayOutputStream): Unit = {
          var j = 0
          while (j < w) {
            out.write(((v >> (8 * j)) & 0xff).toInt); j += 1
          }
        }
        val bytes = java.lang.Math.floorMod(id, 9L).toInt match {
          case 0 =>
            val n = (id % 7 + 3).toInt
            val out = new java.io.ByteArrayOutputStream()
            (0 until n).foreach(j => le(id + j, 8, out))
            Npy.npyWrite("<i8", fortran = false, Seq(n.toLong),
              out.toByteArray)
          case 1 =>
            val n = (id % 5 + 2).toInt
            val a = new java.io.ByteArrayOutputStream()
            (0 until n).foreach(j => le(j.toLong, 8, a))
            val bo = new java.io.ByteArrayOutputStream()
            (0 until 4).foreach(j => le(j.toLong, 4, bo))
            val c = new java.io.ByteArrayOutputStream()
            (0 until 3).foreach(_ => c.write(1))
            Archive.zipWrite(Seq(
              ("a.npy", Npy.npyWrite("<i8", fortran = false,
                Seq(n.toLong), a.toByteArray), id % 2 == 0),
              ("b.npy", Npy.npyWrite("<f4", fortran = false,
                Seq(2L, 2L), bo.toByteArray), false),
              ("c.npy", Npy.npyWrite("|b1", fortran = false,
                Seq(3L), c.toByteArray), true)))
          case 2 => Pickle.writeDict2(id, (id % 6 + 2).toInt)
          case 3 => SafeTensors.stWrite(Seq(
            ("emb", "BF16", Seq(id % 7 + 2, 8L)),
            ("ids", "I64", Seq(id % 3 + 1))))
          case 4 =>
            val arch = java.lang.Math.floorMod(id, 3L).toInt match {
              case 0 => "llama"
              case 1 => "gptneox"
              case _ => "qwen2"
            }
            Gguf.ggufWrite(arch, s"m$id", 0,
              Seq(("t", Seq(id % 6 + 2, 16L), 8)))
          case 5 => Orc.Fixtures(
            java.lang.Math.floorMod(id, 5L).toInt)
          case 6 => ArrowIpc.Fixtures(
            java.lang.Math.floorMod(id, 5L).toInt)
          case 7 => Pyc.pycWrite(
            (0 until (id % 3 + 1).toInt).map(j => s"name$j"),
            (id % 4 + 1).toInt, hashBased = id % 2 == 1,
            sourceSize = 100 + id % 50)
          case _ => Hdf5.h5Write(if (id % 2 == 0) 0 else 3,
            (id % 40 + 10).toInt)
        }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
