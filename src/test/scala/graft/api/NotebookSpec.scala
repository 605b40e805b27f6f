package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Port of the reference's notebook-script processing contract
  * (`fal_script.py:399-416`): code cells join in order, magic lines
  * (`%…` and the notebook bootstrap lib) are stripped, non-code cells
  * are dropped.
  */
class NotebookSpec extends AnyFunSuite {

  private def nb(cells: String*): String = {
    val cellJson = cells.map { c =>
      val (kind, src) =
        if (c.startsWith("md:")) ("markdown", c.drop(3)) else ("code", c)
      val lines = src.linesWithSeparators.toSeq
        .map(l => "\"" + l.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n") + "\"")
        .mkString("[", ",", "]")
      s"""{"cell_type":"$kind","metadata":{},"source":$lines}"""
    }.mkString(",")
    s"""{"cells":[$cellJson],"nbformat":4,"nbformat_minor":5,
        "metadata":{"kernelspec":{"name":"any"}}}"""
  }

  test("code cells extracted in order; markdown dropped") {
    val doc = nb("SELECT 1 AS a", "md:# heading\nprose", "SELECT 2 AS b")
    assert(Notebook.cells(doc) == Seq("SELECT 1 AS a", "SELECT 2 AS b"))
  }

  test("magic lines and the bootstrap lib are stripped (fal_script.py:400-402)") {
    val doc = nb(
      "%init_fal\nval api = graft.Shell.init(spark)\nSELECT 3 AS c",
      "%%time\n")
    assert(Notebook.cells(doc) == Seq("SELECT 3 AS c"))
  }

  test("nbformat string-source cells and escapes parse") {
    val doc = """{"cells":[{"cell_type":"code",
      "source":"SELECT 'A\n' AS s"}]}"""
    assert(Notebook.cells(doc) == Seq("SELECT 'A\n' AS s"))
  }

  test("non-notebook input is rejected with a clear error") {
    assertThrows[IllegalArgumentException](Notebook.cells("[1,2,3]"))
    assertThrows[IllegalArgumentException](Notebook.cells("{\"a\":1}"))
  }

  test("truncated notebooks fail with the parser's offset error") {
    // every truncation point must surface the parser's own
    // IllegalArgumentException, never StringIndexOutOfBoundsException
    val full = """{"cells":[{"cell_type":"code","source":["SELECT 1"]}]}"""
    for (n <- 1 until full.length) {
      val e = intercept[IllegalArgumentException](
        Notebook.cells(full.substring(0, n)))
      assert(e.getMessage != null)
    }
  }

  test("an .ipynb script attached to a model executes its cells") {
    val spark = TestSpark.spark
    val root = Files.createTempDirectory("graft-nb").toString
    val api = new FalApi(spark, new Registry(root), new RunLedger)
    import spark.implicits._
    api.writeToModel(Seq(1L, 2L, 3L).toDF("x"), "m")
    val proj = Files.createTempDirectory("graft-nb-proj")
    Files.createDirectories(proj.resolve("scripts"))
    Files.writeString(proj.resolve("scripts/report.ipynb"), nb(
      "%init_fal\nSELECT count(*) AS n FROM {{ ref('m') }}",
      "md:## narrative",
      "SELECT sum(x) AS s FROM {{ ref('m') }}"))
    val stmts = Notebook.statementsFromFile(
      proj.resolve("scripts/report.ipynb"))
    assert(stmts.size == 2)
    val outs = stmts.map(sql => api.executeSql(sql).head().getLong(0))
    assert(outs == Seq(3L, 6L))
  }
}
