package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ipynb

/** Jupyter notebook extraction: both nbformat major versions, both
  * source spellings, output exclusion, language resolution, honest
  * refusals on malformed or alien JSON.
  */
class IpynbSpec extends AnyFunSuite {

  test("nbformat 4 with string sources round-trips") {
    val doc = Ipynb.ipynbText(
      Ipynb.ipynbWrite("# Title\nprose", "x = 1\nprint(x)", 0)).get
    assert(doc.text == "# Title\nprose\nx = 1\nprint(x)")
    assert(doc.nCells == 2)
    assert(doc.nCodeCells == 1)
    assert(doc.language == "python")
  }

  test("nbformat 4 with list-of-lines sources round-trips") {
    val doc = Ipynb.ipynbText(
      Ipynb.ipynbWrite("line1\nline2\n", "a\nb", 1)).get
    assert(doc.text == "line1\nline2\n\na\nb")
  }

  test("nbformat 3 worksheets with the 'input' spelling round-trips") {
    val doc = Ipynb.ipynbText(
      Ipynb.ipynbWrite("md ѣ€", "print('Ω')", 2)).get
    assert(doc.text == "md ѣ€\nprint('Ω')")
    assert(doc.nCells == 2)
    assert(doc.nCodeCells == 1)
    assert(doc.language == "python")
  }

  test("outputs are never authored text") {
    for (m <- 0 to 2) {
      val doc = Ipynb.ipynbText(Ipynb.ipynbWrite("m", "c", m)).get
      assert(!doc.text.contains("decoy"), s"mode $m")
      assert(!doc.text.contains("never authored"), s"mode $m")
    }
  }

  test("json-hostile text survives the writer's escaping") {
    val md = "quotes \" backslash \\ tab\t control \u0001 done"
    val code = "s = \"\\n\"  # literal"
    for (m <- 0 to 2) {
      val doc = Ipynb.ipynbText(Ipynb.ipynbWrite(md, code, m)).get
      assert(doc.text == md + "\n" + code, s"mode $m")
    }
  }

  test("kernelspec language is the fallback") {
    val json = """{"cells": [],
      "metadata": {"kernelspec": {"language": "julia"}},
      "nbformat": 4}"""
    val doc = Ipynb.ipynbText(json.getBytes("UTF-8")).get
    assert(doc.language == "julia")
    assert(doc.nCells == 0)
    assert(doc.text == "")
  }

  test("raw cells are collected, missing source is empty") {
    val json = """{"cells": [
      {"cell_type": "raw", "source": "raw text", "metadata": {}},
      {"cell_type": "markdown", "metadata": {}}
    ], "metadata": {}, "nbformat": 4}"""
    val doc = Ipynb.ipynbText(json.getBytes("UTF-8")).get
    assert(doc.text == "raw text\n")
    assert(doc.nCells == 2)
    assert(doc.nCodeCells == 0)
  }

  test("refusals: malformed json, alien shapes, wrong types") {
    assert(Ipynb.ipynbText(null).isEmpty)
    assert(Ipynb.ipynbText("{not json".getBytes).isEmpty)
    assert(Ipynb.ipynbText("[1,2]".getBytes).isEmpty)
    // an object that is not a notebook
    assert(Ipynb.ipynbText("""{"a": 1}""".getBytes).isEmpty)
    // cells of the wrong type
    assert(Ipynb.ipynbText("""{"cells": 3}""".getBytes).isEmpty)
    assert(Ipynb.ipynbText("""{"cells": [7]}""".getBytes).isEmpty)
    // a source that is neither string nor list
    assert(Ipynb.ipynbText(
      """{"cells": [{"cell_type": "markdown", "source": 5}]}"""
        .getBytes).isEmpty)
  }

  test("decoder is total under mutation") {
    val base = Ipynb.ipynbWrite("mutation é→Ω md", "code()", 0)
    val rnd = new scala.util.Random(777)
    for (_ <- 0 until 300) {
      val b = base.clone()
      val n = 1 + rnd.nextInt(4)
      for (_ <- 0 until n)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Ipynb.ipynbText(b) // must not throw
    }
  }
}
