package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exception-free numeric castability.
  *
  * Spark's string→double `try_cast` parses with `Double.parseDouble`
  * and swallows a JVM exception per NON-numeric value — exception
  * construction in the codegen'd loop costs ~2.7 µs/row (measured:
  * 3.2 s for 1.2M mostly-non-numeric strings at sf0.1, the single
  * biggest line in the classification pass). Classification and
  * repair scan EVERY value of string columns expecting most to fail,
  * which is exactly the pathological case.
  *
  * [[tryCastDouble]] gates the cast behind a numeric-shape regex
  * (~0.3 µs/row, no allocation on miss): values failing the shape
  * yield null WITHOUT the cast ever running; values passing it parse
  * cleanly, so the exception path is never taken. The conjunction can
  * only REMOVE acceptances relative to a bare `try_cast`: Java-only
  * literal forms ("1.5d", hex floats like "0x1.8p1") now classify as
  * non-numeric — deliberately, since neither the reference's
  * `pandas.to_numeric` (reference: src/trousse/dataset.py:56-101) nor
  * DuckDB's TRY_CAST (the oracle) accepts them; the bare `try_cast`
  * was the outlier.
  */
object SafeCast {

  /** Decimal/scientific shape plus the special literals both engines
    * understand, with the surrounding whitespace `parseDouble` trims.
    */
  val NumericShape: String =
    "^\\s*[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?" +
      "|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])\\s*$"

  /** `try_cast(c AS double)` with the exception path fenced off. */
  def tryCastDouble(c: Column): Column =
    when(c.rlike(NumericShape), c.try_cast("double"))
}
