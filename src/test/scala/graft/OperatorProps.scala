package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.operators.{Binning, OrdinalEncoder}

/** Property-based invariants for the core operators. */
object OperatorProps extends Properties("OperatorProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val thresholdsGen: Gen[List[Double]] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 10.0))
        .map(_.distinct.sorted))

  private val valuesGen: Gen[List[Double]] =
    Gen.listOfN(30, Gen.chooseNum(-1500, 1500).map(_ / 10.0))

  // binIdExpr(v, ts) == |{t in ts : t < v}| for sorted distinct ts
  // (threshold values land in the LOWER bin: v == t is NOT t < v)
  property("bin id counts thresholds strictly below the value") =
    Prop.forAll(thresholdsGen, valuesGen) { (ts, vs) =>
      val spark = TestSpark.spark
      import spark.implicits._
      spark.sparkContext.setLogLevel("ERROR")
      val got = vs.toDF("v")
        .select(col("v"), Binning.binIdExpr(col("v"), ts).as("b"))
        .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
      vs.forall(v => got(v) == ts.count(_ < v))
    }

  // ordinal codes invert exactly through the recorded dictionary
  property("ordinal encode inverts through encodedValuesMap") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
        .map(_.take(20))) { vals =>
      val spark = TestSpark.spark
      import spark.implicits._
      val ds  = core.GraftDataset(vals.toDF("c"))
      val out = OrdinalEncoder(Seq("c"), Seq("code"))(ds)
      val op  = out.history(0).asInstanceOf[OrdinalEncoder]
      val inverse = op.encodedValuesMap.map(_.swap).toMap
      out.data.collect().forall { r =>
        inverse(r.getLong(1)) == r.getString(0)
      }
    }
}
