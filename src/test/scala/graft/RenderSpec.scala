package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Render

/** Golden-log output parity (SURVEY §5 item 1): the reference's
  * acceptance artifact is a beeline-rendered boxed table
  * (/root/reference/examples/example-output.log:831-935). The fixture is
  * synthetic (the reference's data files are git-lfs pointers), so value
  * parity holds only for the columns the fixture reproduces — age,
  * wavelength, is_peculiar — and FORMAT parity (borders, headers, float
  * canonicalization) is asserted byte-for-byte against the golden log.
  */
class RenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val goldenLines: Seq[String] = {
    val p = java.nio.file.Paths.get("/root/reference/examples/example-output.log")
    java.nio.file.Files.readAllLines(p).asScala.toSeq
  }

  /** The golden `SELECT * FROM m33_schem LIMIT 100` block: border, header,
    * border, 100 data rows, border. */
  private lazy val goldenBlock: Seq[String] = {
    val start = goldenLines.indexWhere(_.startsWith("| m33_schem.age_mil")) - 1
    assert(start > 0, "golden m33_schem block not found")
    goldenLines.slice(start, start + 104)
  }

  private lazy val rendered: Seq[String] = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_render_spec").getAbsolutePath
    val root = graft.sources.M33Fixture.generate(base)
    val view = graft.pipeline.M33Pipeline
      .schemView(graft.pipeline.M33Pipeline.rawTable(spark, root))
      // golden block lists the cp (is_peculiar=1) age-11 file in file
      // order = ascending wavelength
      .filter(col("is_peculiar") === 1 && col("age_mil") === 11)
      .orderBy(col("wavelength"))
    Render.box(view, Some("m33_schem"), maxRows = 100).linesIterator.toSeq
  }

  test("boxed header and borders match the golden log byte-for-byte") {
    // header lengths dominate every column width in both datasets, so the
    // border/header lines must be identical
    assert(rendered(0) == goldenBlock(0), s"border:\n${rendered(0)}\n${goldenBlock(0)}")
    assert(rendered(1) == goldenBlock(1), s"header:\n${rendered(1)}\n${goldenBlock(1)}")
    assert(rendered(2) == goldenBlock(2))
    assert(rendered.last == goldenBlock.last)
    assert(rendered.size == goldenBlock.size) // 100 rows + 4 frame lines
  }

  test("age/wavelength/is_peculiar columns match the golden values") {
    def cells(line: String): Seq[String] =
      line.stripPrefix("|").stripSuffix("|").split("\\|").map(_.trim).toSeq
    val goldenRows = goldenBlock.slice(3, 103).map(cells)
    val ourRows = rendered.slice(3, 103).map(cells)
    // float canonicalization: the raw text says 3000.00 / 3000.10; both
    // beeline and our renderer print the parsed double (3000.0 / 3000.1)
    assert(ourRows.map(_(1)) == goldenRows.map(_(1)), "wavelength column diverged")
    assert(ourRows.map(_(0)) == goldenRows.map(_(0)), "age_mil column diverged")
    assert(ourRows.map(_(3)) == goldenRows.map(_(3)), "is_peculiar column diverged")
  }

  test("NULL and non-double cells render beeline-style") {
    import spark.implicits._
    val df = Seq((Some(1.5), "x"), (None, "y"))
      .toDF("d", "s")
    val out = Render.box(df)
    assert(out.contains("| 1.5"))
    assert(out.contains("| NULL"))
  }
}
