package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Statements

/** Property tests (SURVEY §5.4) — scalacheck generators driven with fixed
  * seeds for reproducibility. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: m33 row parse is total on whitespace-padded numeric rows") {
    val rowGen = for {
      pad <- Gen.oneOf("", " ", "  ", "\t".replace("\t", " ")) // leading ws
      wl <- Gen.chooseNum(0L, 999999L)
      fl <- Gen.chooseNum(-99999L, 99999L)
    } yield (pad, wl / 100.0, fl / 10.0)
    val rows = cases(rowGen, 200)
    val df = rows
      .map { case (pad, wl, fl) => (f"$pad$wl%.2f  $fl%.1f", "f") }
      .toDF("row_str", "input_file")
      .withColumn("peculiarity", org.apache.spark.sql.functions.lit("cp"))
    val parsed = graft.pipeline.M33Pipeline.schemView(df)
      .select($"wavelength", $"flam")
      .as[(Option[Double], Option[Double])]
      .collect()
    parsed.zip(rows).foreach { case ((wl, fl), (_, ewl, efl)) =>
      assert(wl.contains(ewl) && fl.contains(efl))
    }
  }

  test("property: CSV CTAS round-trip preserves typed rows") {
    val rowGen = for {
      age <- Gen.chooseNum(0L, 999999L)
      wl <- Gen.chooseNum(0L, 10000000L).map(_ / 100.0)
      fl <- Gen.chooseNum(-1000000L, 1000000L).map(_ / 10.0)
      pec <- Gen.oneOf(0, 1)
    } yield (age, wl, fl, pec)
    val rows = cases(rowGen, 300).distinct
    val df = rows.toDF("age_mil", "wavelength", "flam", "is_peculiar")
    val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
    val path = graft.pipeline.M33Pipeline.ctasCsv(df, dir)
    val back = graft.pipeline.M33Pipeline.readM33Csv(spark, path)
      .as[(Long, Double, Double, Int)].collect().toSet
    assert(back == rows.toSet)
  }

  test("property: field() equals its Scala reference semantics") {
    val word = Gen.oneOf("cp", "nocp", "x", "yy", "")
    val caseGen = for {
      target <- word
      args <- Gen.listOfN(4, word)
    } yield (target, args)
    cases(caseGen, 100).foreach { case (target, args) =>
      val expected = args.indexOf(target) + 1 // 0 when absent (indexOf = -1)
      val sql = (target +: args).map(s => s"'$s'").mkString("field(", ", ", ")")
      val got = spark.sql(s"SELECT $sql").head().getInt(0)
      assert(got == expected, s"field($target, $args): got $got want $expected")
    }
  }

  test("property: statement splitter inverts joining with semicolons") {
    val stmtGen = Gen.oneOf(
      "SELECT 1", "SELECT 'a;b'", "UPDATE t SET x = 2", "SELECT \"q;q\"",
      "INSERT INTO t VALUES (1, 'x')")
    cases(Gen.listOfN(5, stmtGen), 50).foreach { stmts =>
      assert(Statements.split(stmts.mkString(";")) == stmts)
    }
  }

  test("property: AsOfJoinExec == window composition on random data") {
    // random multi-key event sets with NULL keys/timestamps, duplicate
    // timestamps, and keys present on only one side — the custom merge
    // exec and the declarative composition must agree row-for-row
    val rowGen = for {
      k1 <- Gen.option(Gen.chooseNum(0L, 4L))
      k2 <- Gen.oneOf("a", "b", null)
      ts <- Gen.option(Gen.chooseNum(0L, 40L))
      v <- Gen.chooseNum(0, 1000)
    } yield (k1, k2, ts, v.toDouble)
    (0 until 5).foreach { round =>
      val lRows = cases(rowGen, 60 + round).zipWithIndex
        .map { case ((k1, k2, ts, v), i) => (k1, k2, ts, v, i.toLong) }
      val rRows = cases(rowGen, 50 + round * 7)
        // right side unique per (key, ts): drop dup timestamps per key
        .groupBy(t => (t._1, t._2, t._3)).map(_._2.head).toSeq
      val left = lRows.toDF("k1", "k2", "t", "lv", "row_id")
      val right = rRows.toDF("k1", "k2", "t", "rv")
        .withColumnRenamed("t", "rt")
      val viaWindow = graft.operators.AsOfJoin(
          left, right.withColumnRenamed("rt", "t"),
          Seq("k1", "k2"), "t", "t", Seq("rv"))
        .select($"row_id", $"asof_rv").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      val viaExec = graft.plans.AsOfJoinApi
        .asofJoinExec(left, right, Seq("k1", "k2"), "t", "rt", Seq("rv"))
        .select($"row_id", $"asof_rv").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(viaExec == viaWindow,
        s"round $round diverged: ${viaExec.toSet.diff(viaWindow.toSet)} / " +
          s"${viaWindow.toSet.diff(viaExec.toSet)}")
    }
  }

  test("property: media codec encode/parse round-trips at arbitrary dims") {
    val C = graft.multimodal.Codecs
    val dimGen = for {
      w <- Gen.chooseNum(1, 200)
      h <- Gen.chooseNum(1, 120)
      frames <- Gen.chooseNum(0, 5000)
      rate <- Gen.chooseNum(1, 192000)
      ch <- Gen.chooseNum(1, 8)
      seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (w, h, frames, rate, ch, seed)
    cases(dimGen, 80).foreach { case (w, h, frames, rate, ch, seed) =>
      val bmp = C.parseBmp(C.encodeBmp(w, h, seed)).get
      assert(bmp.width == w && bmp.height == h && bmp.bitDepth == 24)
      val png = C.parsePng(C.encodePng(w, h, seed)).get
      assert(png.width == w && png.height == h && png.bitDepth == 8)
      val nSamples = frames % 500
      val wav = C.parseWav(C.encodeWav(rate, ch, nSamples, seed)).get
      assert(wav.sampleRate == rate && wav.channels == ch &&
        wav.nSamples == nSamples.toLong && wav.bitsPerSample == 16)
      val avi = C.parseAvi(C.encodeAvi(w, h, frames)).get
      assert(avi.width == w && avi.height == h && avi.nFrames == frames.toLong)
      // sniffing never confuses the four containers
      assert(C.sniff(C.encodeBmp(w, h, seed)).contains("bmp"))
      assert(C.sniff(C.encodePng(w, h, seed)).contains("png"))
      assert(C.sniff(C.encodeWav(rate, ch, nSamples, seed)).contains("wav"))
      assert(C.sniff(C.encodeAvi(w, h, frames)).contains("avi"))
    }
  }
}
