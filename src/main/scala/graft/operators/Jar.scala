package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JAR triage (C239) — code corpora are full of jars, and the
  * triage facts live in two places the existing walks already
  * reach: the ZIP directory (via [[Archive.zipEntries]]) and
  * `META-INF/MANIFEST.MF`, whose format is public (the JAR file
  * specification): `Key: value` main attributes with 72-byte line
  * folding (a continuation line starts with a single space).
  *
  * Surfaced: manifest presence and version, Main-Class and
  * Created-By, the .class member count, the distinct package count
  * (directories of class members), and total member count — what a
  * code-lake census filters on (executable vs library, toolchain).
  *
  * Totality: None only when the ZIP itself refuses; a jar without
  * a manifest still counts members. Scale: directory + one small
  * member extract, map-only.
  */
object Jar {

  final case class JarMeta(hasManifest: Boolean,
      manifestVersion: String, mainClass: String, createdBy: String,
      nClasses: Int, nPackages: Int, nMembers: Int)

  /** Unfold manifest continuation lines, then split main-attribute
    * `Key: value` pairs (the section before the first blank line).
    */
  def parseManifest(text: String): Map[String, String] = {
    val main = text.replace("\r\n", "\n").replace("\r", "\n")
      .split("\n\n", 2)(0)
    val unfolded = main.split('\n').foldLeft(List.empty[String]) {
      case (acc, line) if line.startsWith(" ") && acc.nonEmpty =>
        (acc.head + line.substring(1)) :: acc.tail
      case (acc, line) => line :: acc
    }.reverse
    unfolded.flatMap { line =>
      val at = line.indexOf(": ")
      if (at <= 0) None
      else Some(line.substring(0, at) -> line.substring(at + 2))
    }.toMap
  }

  /** Triage one jar. None when the ZIP walk refuses. */
  def jarMeta(b: Array[Byte]): Option[JarMeta] =
    Archive.zipEntries(b).map { es =>
      val classes = es.filter(_.name.endsWith(".class"))
      val packages = classes.map { e =>
        val at = e.name.lastIndexOf('/')
        if (at < 0) "" else e.name.substring(0, at)
      }.distinct
      val manifest = es.find(_.name == "META-INF/MANIFEST.MF")
        .flatMap(e => Archive.zipExtract(b, e))
        .map(mb => parseManifest(new String(mb,
          java.nio.charset.StandardCharsets.UTF_8)))
      JarMeta(manifest.isDefined,
        manifest.flatMap(_.get("Manifest-Version")).getOrElse(""),
        manifest.flatMap(_.get("Main-Class")).getOrElse(""),
        manifest.flatMap(_.get("Created-By")).getOrElse(""),
        classes.length, packages.length, es.length)
    }

  /** A planted jar: manifest (with a folded line), k classes across
    * p packages, one resource.
    */
  def jarWrite(mainClass: String, createdBy: String, packages: Int,
      classesPerPackage: Int): Array[Byte] = {
    // fold Created-By across the 72-byte boundary the spec way:
    // a continuation line starts with one space
    val manifest = "Manifest-Version: 1.0\r\n" +
      s"Main-Class: $mainClass\r\n" +
      s"Created-By: ${createdBy.take(40)}\r\n" +
      s" ${createdBy.drop(40)}\r\n" + "\r\n"
    val entries = Seq(("META-INF/MANIFEST.MF",
      manifest.getBytes("UTF-8"), false)) ++
      (0 until packages).flatMap { p =>
        (0 until classesPerPackage).map { c =>
          (s"com/corpus/p$p/C$c.class",
            JavaClass.classWrite(s"com.corpus.p$p.C$c",
              Seq("m"), 0), true)
        }
      } ++ Seq(("resources/data.txt",
      "planted resource".getBytes("UTF-8"), false))
    Archive.zipWrite(entries)
  }

  // ---------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------

  val jarSchema: StructType = StructType(Seq(
    StructField("has_manifest", BooleanType),
    StructField("manifest_version", StringType),
    StructField("main_class", StringType),
    StructField("created_by", StringType),
    StructField("n_classes", IntegerType),
    StructField("n_packages", IntegerType),
    StructField("n_members", IntegerType)))

  def decodeJar(bytes: Array[Byte]): Seq[Any] =
    jarMeta(bytes) match {
      case Some(m) => Seq[Any](m.hasManifest, m.manifestVersion,
        m.mainClass, m.createdBy, m.nClasses, m.nPackages,
        m.nMembers)
      case None => Seq[Any](null, null, null, null, null, null,
        null)
    }

  /** Per-doc synth: planted package/class shapes cycling. */
  def synthJars(df: DataFrame, idCol: String, outCol: String)
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
        val p = (id % 3 + 1).toInt
        val c = (id % 4 + 1).toInt
        val bytes = jarWrite(s"com.corpus.Main${id % 10}",
          "graft-fixture-toolchain-version-" +
            s"${id % 5}-with-a-long-vendor-string", p, c)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
