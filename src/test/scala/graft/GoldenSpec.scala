package graft

import org.apache.spark.sql.DataFrame
import graft.operators._
import graft.sources.Io

/** Golden-file integration tests — the reference's checked-in
  * expectation pattern (tests/integration/test_feature_operations.py:
  * 41-163 over tests/expectations/csv/): run an operator on a fixture
  * CSV, compare the FULL frame (column names, order, and every cell)
  * against a checked-in expectation CSV. Fixture/expectation schemas
  * per FIXTURES.md §1-2.
  */
class GoldenSpec extends SparkSpec {

  private def res(path: String): String =
    getClass.getResource(path).getPath

  private def load(path: String): DataFrame =
    Io.readCsv(spark, res(path)).get

  /** Full-frame equality on stringified cells, order-insensitive rows
    * (tiny frames; CSV write order is not part of the contract).
    */
  private def assertGolden(actual: DataFrame, expectation: String)
      : Unit = {
    val exp = load(s"/expectations/$expectation.csv")
    assert(actual.columns.toSeq == exp.columns.toSeq,
      s"$expectation columns: ${actual.columns.toSeq} vs ${exp.columns.toSeq}")
    def cells(df: DataFrame): Seq[Seq[String]] =
      df.collect().toSeq
        .map(r => (0 until r.length)
          .map(i => if (r.isNullAt(i)) null else r.get(i).toString))
        .sortBy(_.mkString("\u0000"))
    assert(cells(actual) == cells(exp), s"$expectation cell mismatch")
  }

  private lazy val generic   = load("/fixtures/generic.csv")
  private lazy val genericNa = load("/fixtures/generic-na.csv")

  test("replaced d->a col0 inplace") {
    assertGolden(ReplaceStrings(Seq("col0"), Seq("d" -> "a"))(generic),
      "generic-replaced-d-a-col0-inplace")
  }

  test("replaced d->a col0 derived col4") {
    assertGolden(
      ReplaceStrings(Seq("col0"), Seq("d" -> "a"), Seq("col4"))(generic),
      "generic-replaced-d-a-col0-col4")
  }

  test("replaced substrings r->c col3 inplace") {
    assertGolden(
      ReplaceSubstrings(Seq("col3"), Seq("r" -> "c"))(generic),
      "generic-replaced-substrings-r-c-col3-inplace")
  }

  test("replaced substrings r->c col3 derived col4") {
    assertGolden(
      ReplaceSubstrings(Seq("col3"), Seq("r" -> "c"), Seq("col4"))(generic),
      "generic-replaced-substrings-r-c-col3-col4")
  }

  test("ordinal encoded col3 inplace: abc=0, abr=1") {
    assertGolden(OrdinalEncoder(Seq("col3"))(generic),
      "generic-ordinal-encoded-col3-inplace")
  }

  test("ordinal encoded col3 derived col3_enc") {
    assertGolden(OrdinalEncoder(Seq("col3"), Seq("col3_enc"))(generic),
      "generic-ordinal-encoded-col3-col3_enc")
  }

  test("one-hot encoded col3") {
    assertGolden(OneHotEncoder(Seq("col3"), "_enc")(generic),
      "generic-one-hot-encoded-col3-enc")
  }

  test("one-hot encoded col3 with the long _encoded suffix") {
    assertGolden(OneHotEncoder(Seq("col3"), "_encoded")(generic),
      "generic-one-hot-encoded-col3-encoded")
  }

  test("ordinal encoded col3 derived col4") {
    assertGolden(OrdinalEncoder(Seq("col3"), Seq("col4"))(generic),
      "generic-ordinal-encoded-col3-col4")
  }

  test("one-hot encoded col0 (three categories, sorted)") {
    assertGolden(OneHotEncoder(Seq("col0"), "_enc")(generic),
      "generic-one-hot-encoded-col0-enc")
  }

  test("one-hot NaN row gets null in EVERY derived column") {
    assertGolden(OneHotEncoder(Seq("col4"), "_enc")(genericNa),
      "generic-na-one-hot-encoded-col4-enc")
  }

  test("dummy.csv reader contract: all-string schema") {
    val d = load("/fixtures/dummy.csv")
    assert(d.columns.toSeq == Seq("header1", "header2"))
    assert(d.schema.fields.forall(_.dataType.typeName == "string"))
    assert(d.count() == 3)
  }
}
