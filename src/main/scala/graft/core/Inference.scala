package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass, distributed column classification.
  *
  * The reference computes its classification with N independent full
  * scans per column (nunique, infer_dtype, unique — reference
  * dataset.py:267,339-341,528). Here everything is fused into ONE
  * aggregation job over the frame: ~7 aggregate expressions per column,
  * all partially aggregated map-side, so the cost is a single scan
  * regardless of column count.
  *
  * Scale note (100 TB): with `exact = false` (default) distinct counts
  * use HyperLogLog (`approx_count_distinct`) which keeps the plan free
  * of the `Expand`-based multi-count-distinct rewrite (that rewrite
  * multiplies scan output by the number of distinct aggregates — fatal
  * at scale). Constant detection never needs a distinct count: a column
  * is constant-including-null iff (no nulls ∧ min == max) ∨ (all null).
  */
object Inference {

  private def isNumericType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Aggregate expressions for one column; must stay aligned with the
    * unpacking in [[classify]].
    *
    * NO distinct count here — on purpose, twice over: N exact
    * `countDistinct`s in one agg trigger Catalyst's Expand-based
    * multi-distinct rewrite (scan output × N+1 — fatal at scale), and
    * even the HLL sketch is a TypedImperativeAggregate, which forces
    * the WHOLE operator onto ObjectHashAggregate and knocks every other
    * counter out of whole-stage codegen. Distinct counts run as their
    * own concurrent job(s) — see [[classify]] — keeping this pass a
    * fully codegen'd HashAggregate.
    */
  private def statsExprs(field: StructField): Seq[Column] = {
    val c           = col(field.name)
    val notNull     = count(c) // count(col) skips nulls
    val hasNull = max(c.isNull.cast("int"))
    // min==max on the column's NATIVE type — only the boolean survives
    // into the row, so no uniform-type cast is needed, and no per-value
    // double→string formatting (which dominated the pass at sf0.1).
    val constNonNull = (min(c) <=> max(c)).cast("int")
    val castable = field.dataType match {
      case StringType => count(when(c.try_cast("double").isNotNull, 1))
      case _          => notNull
    }
    val zeroOne = field.dataType match {
      case BooleanType => lit(1)
      case dt if isNumericType(dt) =>
        min(when(c.isNotNull, (c === 0 || c === 1).cast("int")))
      case _ =>
        min(when(c.isNotNull, c.cast("string")
          .isin("0", "1", "0.0", "1.0", "true", "false").cast("int")))
    }
    Seq(
      notNull.cast("long").as(s"${field.name}__nn"),
      hasNull.cast("int").as(s"${field.name}__hn"),
      constNonNull.as(s"${field.name}__cst"),
      castable.cast("long").as(s"${field.name}__cast"),
      zeroOne.cast("int").as(s"${field.name}__zo")
    )
  }

  /** Classify every column of `df` (or `cols` if given).
    *
    * Two jobs, submitted CONCURRENTLY: the fused codegen counter pass,
    * and the distinct counts — one HLL-only aggregate when
    * `exact = false` (isolating the ObjectHashAggregate the sketches
    * force), or one cheap single-distinct job per column when
    * `exact = true` (never the Expand-based multi-distinct rewrite).
    */
  def classify(
      df: DataFrame,
      cols: Seq[String] = Seq.empty,
      exact: Boolean = false
  ): ColumnClassification = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    val fields =
      if (cols.isEmpty) df.schema.fields.toSeq
      else df.schema.fields.toSeq.filter(f => cols.contains(f.name))
    val aggs = count(lit(1)).cast("long").as("__total") +:
      fields.flatMap(statsExprs)
    val mainF = Future(df.agg(aggs.head, aggs.tail: _*).collect()(0))

    val distinctF: Future[Map[String, Long]] =
      if (exact)
        Future.sequence(fields.map { f =>
          Future(f.name ->
            df.select(col(f.name)).agg(countDistinct(col(f.name)))
              .collect()(0).getLong(0))
        }).map(_.toMap)
      else
        Future {
          val hlls = fields.map(f =>
            approx_count_distinct(col(f.name)).cast("long")
              .as(s"${f.name}__nd"))
          val r = df.agg(hlls.head, hlls.tail: _*).collect()(0)
          fields.map(f => f.name -> r.getAs[Long](s"${f.name}__nd"))
            .toMap
        }

    val row: Row  = Await.result(mainF, Duration.Inf)
    val distincts = Await.result(distinctF, Duration.Inf)
    val total     = row.getAs[Long]("__total")

    val stats = fields.map { f =>
      val nn   = row.getAs[Long](s"${f.name}__nn")
      val nd   = distincts(f.name)
      val hn   = Option(row.getAs[Any](s"${f.name}__hn")).exists(_ == 1)
      val cst  = Option(row.getAs[Any](s"${f.name}__cst")).exists(_ == 1)
      val cab  = Option(row.getAs[Any](s"${f.name}__cast"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val zo   = Option(row.getAs[Any](s"${f.name}__zo")).exists(_ == 1)
      val allNull  = nn == 0L
      val constant = allNull || (!hn && cst)
      f.name -> ColumnStats(f.name, f.dataType.sql, total, nn, nd, hn,
        constant, cab, zo && nn > 0)
    }.toMap

    val kinds = fields.map { f =>
      val s = stats(f.name)
      val kind: ColumnKind = f.dataType match {
        case BooleanType               => ColumnKind.Bool
        case dt if isNumericType(dt)   =>
          if (s.onlyZeroOne) ColumnKind.Bool else ColumnKind.Numerical
        case StringType =>
          // Sub-classify strings the way the reference classifies
          // object columns (dataset.py:56-101): all-castable → the
          // column is "actually numeric"; partially castable → mixed;
          // {0,1}-valued → bool.
          if (s.nNotNull == 0) ColumnKind.Str
          else if (s.onlyZeroOne) ColumnKind.Bool
          else if (s.castableToNum == s.nNotNull) ColumnKind.Numerical
          else if (s.castableToNum > 0) ColumnKind.Mixed
          else ColumnKind.Str
        case _ => ColumnKind.Other
      }
      f.name -> kind
    }.toMap

    val categorical = fields.collect {
      case f
          if {
            val s = stats(f.name)
            val k = kinds(f.name)
            (k == ColumnKind.Str || k == ColumnKind.Numerical) &&
            s.nNotNull > 0 &&
            (s.nDistinct < Thresholds.CategUniqueMax ||
              s.nDistinct < s.nNotNull / Thresholds.CategColThreshold)
          } =>
        f.name
    }.toSet

    val constant = stats.collect { case (c, s) if s.isConstant => c }.toSet
    val mixed    = kinds.collect { case (c, ColumnKind.Mixed) => c }.toSet
    ColumnClassification(stats, kinds, categorical, constant, mixed)
  }
}
