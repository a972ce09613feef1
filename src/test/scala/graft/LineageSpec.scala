package graft

import graft.core.{GraftDataset, OperationsList}
import graft.operators._

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private val fill = FillNA(Seq("a"), "x", Seq("a2"))
  private val repl = ReplaceStrings(Seq("a2"), Seq("x" -> "y"), Seq("a3"))

  test("append indexes ops under source and derived columns") {
    val l = OperationsList() :+ fill :+ repl
    assert(l.size == 2)
    assert(l(0) == fill)
    assert(l.forColumn("a") == Vector(fill))
    assert(l.forColumn("a2") == Vector(fill, repl))
  }

  test("forward and backward lineage") {
    val l = OperationsList() :+ fill :+ repl
    assert(l.derivedColumnsFrom("a") == Vector("a2"))
    assert(l.derivedColumnsFrom("a2") == Vector("a3"))
    assert(l.originalColumnsFromDerived("a3") == Seq("a2"))
  }

  test("backward lineage errors on 0 or >1 producers") {
    val l = OperationsList() :+ fill
    intercept[IllegalArgumentException] {
      l.originalColumnsFromDerived("nope")
    }
    val dup = l :+ ReplaceStrings(Seq("a"), Seq("p" -> "q"), Seq("a2"))
    intercept[IllegalArgumentException] {
      dup.originalColumnsFromDerived("a2")
    }
  }

  test("op equality is value equality (case classes)") {
    assert(FillNA(Seq("a"), "x") == FillNA(Seq("a"), "x"))
    assert(FillNA(Seq("a"), "x") != FillNA(Seq("a"), "y"))
  }

  test("metadata label propagates to derived cols of metadata sources") {
    val ds  = GraftDataset(Seq("v").toDF("a"), metadataCols = Set("a"))
    val out = fill(ds)
    assert(out.metadataCols == Set("a", "a2"))
    val ds2  = GraftDataset(Seq("v").toDF("a")) // 'a' NOT metadata
    val out2 = fill(ds2)
    assert(out2.metadataCols.isEmpty)
  }

  test("replaceData surfaces lost columns") {
    val ds = GraftDataset(Seq(("v", 1)).toDF("a", "b"), Set("b"))
    val (nds, lost) = ds.replaceData(Seq("v").toDF("a"))
    assert(lost == Set("b"))
    assert(nds.metadataCols.isEmpty)
  }
}
