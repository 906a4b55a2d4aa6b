package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Statements

/** Property tests (SURVEY §5.4) — scalacheck generators driven with fixed
  * seeds for reproducibility. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int): Seq[A] = GenCases(g, n, 42)

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

  test("property: stratifiedSample quota is exact floor(n_g * ppm / 1e6) per stratum") {
    val gen = for {
      nGroups <- Gen.choose(1, 5)
      sizes <- Gen.listOfN(nGroups, Gen.choose(1, 60))
      ppm <- Gen.oneOf(0L, 100000L, 250000L, 333333L, 500000L, 1000000L)
    } yield (sizes, ppm)
    cases(gen, 8).foreach { case (sizes, ppm) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => (g.toLong * 1000 + i, s"g$g"))
      }
      val df = rows.toDF("id", "stratum")
      val got = graft.operators.Sampling
        .stratifiedSample(df, "id", "stratum", ppm)
        .groupBy("stratum").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.zipWithIndex.foreach { case (n, g) =>
        val want = n.toLong * ppm / 1000000L
        assert(got.getOrElse(s"g$g", 0L) == want,
          s"stratum g$g: n=$n ppm=$ppm want=$want got=${got.get(s"g$g")}")
      }
    }
  }

  test("property: pagerank conserves structure on symmetric graphs") {
    // on a vertex-transitive graph (a cycle), every node must get the
    // SAME rank, and every rank is >= the teleport floor
    val gen = Gen.choose(3, 12)
    cases(gen, 5).foreach { n =>
      val edges = (0L until n.toLong).flatMap(i =>
        Seq((i, (i + 1) % n), ((i + 1) % n, i))).toDF("src", "dst")
      val ranks = graft.operators.Graph.pagerank(edges, iterations = 3)
        .collect().map(_.getLong(1))
      assert(ranks.length == n)
      assert(ranks.toSet.size == 1, s"cycle ranks unequal: ${ranks.toSeq}")
      assert(ranks.head >= 150000L)
    }
  }

  test("property: scd2Apply conserves rows (v1 rows + upserts) and id coverage") {
    val gen = for {
      nSnap <- Gen.choose(1, 20)
      ops <- Gen.listOfN(nSnap, Gen.oneOf("none", "upsert", "delete"))
      nIns <- Gen.choose(0, 5)
    } yield (nSnap, ops, nIns)
    cases(gen, 6).foreach { case (nSnap, ops, nIns) =>
      val snap = (0 until nSnap).map(i => (i.toLong, i.toLong * 10)).toDF("id", "bal")
      val changes =
        ops.zipWithIndex.collect {
          case (op, i) if op != "none" => (i.toLong, op, 999L)
        } ++ (0 until nIns).map(i => (1000L + i, "upsert", 5L))
      if (changes.nonEmpty) {
        val out = graft.operators.Cdc
          .scd2Apply(snap, changes.toDF("id", "op", "bal"), "id", Seq("bal"))
        val nUpserts = changes.count(_._2 == "upsert")
        assert(out.count() == nSnap.toLong + nUpserts)
        // current rows: one per surviving id
        val current = out.filter($"is_current").select("id")
          .collect().map(_.getLong(0)).toSet
        val deleted = ops.zipWithIndex.collect {
          case ("delete", i) => i.toLong }.toSet
        val expected = (0 until nSnap).map(_.toLong).toSet -- deleted ++
          (0 until nIns).map(i => 1000L + i).toSet
        assert(current == expected)
      }
    }
  }

  test("property: wordpiece pointer-doubling == sequential greedy reference") {
    // The distributed encode (vocab derivation + log-round walk) must
    // equal a direct per-word sequential greedy scan with the same
    // vocab rule — random small-alphabet corpora stress gram ties (the
    // freq-desc, gram-asc cut) and the doubling depth
    def refCounts(ws: Seq[String], maxGram: Int, topK: Int): Map[String, Long] = {
      val freq = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gramFreq = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- freq; n <- 2 to maxGram; i <- 0 to w.length - n) {
        val g = w.substring(i, i + n)
        gramFreq(g) = gramFreq.getOrElse(g, 0L) + f
      }
      val top = gramFreq.toSeq.sortBy { case (g, c) => (-c, g) }.take(topK).map(_._1)
      val vocab = top.toSet ++ freq.keys.flatMap(_.map(_.toString))
      freq.keys.map { w =>
        var pos = 0; var tok = 0L
        while (pos < w.length) {
          val len = (math.min(maxGram, w.length - pos) to 1 by -1)
            .find(n => vocab.contains(w.substring(pos, pos + n))).get
          pos += len; tok += 1
        }
        w -> tok
      }.toMap
    }
    val wordGen = for {
      len <- Gen.choose(1, 12)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val corpusGen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, wordGen)
      topK <- Gen.oneOf(1, 3, 200)
    } yield (ws, topK)
    cases(corpusGen, 6).foreach { case (ws, topK) =>
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = graft.operators.TextAnalysis
        .wordpieceEncodeStats(docs, "doc_id", "text", maxGram = 4, topK = topK)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long)].collect()
      val ref = refCounts(ws, 4, topK)
      ws.zipWithIndex.foreach { case (w, i) =>
        assert(got(i)._4 == ref(w),
          s"word '$w' topK=$topK: got ${got(i)._4} want ${ref(w)} (corpus $ws)")
      }
    }
  }

  test("property: chunkWindows with stride == size partitions the token stream exactly") {
    val docGen = for {
      n <- Gen.choose(0, 90)
      toks <- Gen.listOfN(n, Gen.oneOf("x", "yy", "zzz"))
    } yield toks
    cases(Gen.listOfN(4, docGen), 6).foreach { docsToks =>
      val docs = docsToks.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val chunks = graft.operators.TextAnalysis
        .chunkWindows(docs, "doc_id", "text", size = 32, stride = 32)
        .orderBy("doc_id", "chunk_id")
        .as[(Long, Long, Long, Long, String)].collect()
      docsToks.zipWithIndex.foreach { case (toks, i) =>
        val mine = chunks.filter(_._1 == i.toLong)
        assert(mine.map(_._4).sum == toks.length, s"doc $i token count")
        val rebuilt = mine.map(_._5).mkString(" ")
        assert(rebuilt == toks.mkString(" "), s"doc $i reassembly")
      }
    }
  }

  test("property: sourceDrift tv_num equals the direct full-grid computation") {
    val srcGen = for {
      n <- Gen.choose(1, 15)
      toks <- Gen.listOfN(n, Gen.oneOf("p", "q", "r", "s"))
    } yield toks
    cases(Gen.listOfN(3, srcGen), 6).foreach { perSource =>
      val docs = perSource.zipWithIndex
        .map { case (t, i) => (s"src$i", t.mkString(" ")) }
        .toDF("source", "text")
      val got = graft.operators.TextAnalysis.sourceDrift(docs, "source", "text")
        .orderBy("source")
        .as[(String, Long, Long, Long, Double, String, Long)].collect()
      // reference: the literal Σ_w |f_sw·T − f_w·t_s| over ALL words
      val corpus = perSource.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bigT = perSource.map(_.size.toLong).sum
      perSource.zipWithIndex.foreach { case (toks, i) =>
        val fs = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ts = toks.size.toLong
        // .toSeq: mapping over the key SET would collapse equal scores
        val num = corpus.keys.toSeq.map { w =>
          math.abs(fs.getOrElse(w, 0L) * bigT - corpus(w) * ts)
        }.sum
        val row = got.find(_._1 == s"src$i").get
        assert(row._4 == num,
          s"src$i tv_num: got ${row._4} want $num (sources $perSource)")
        assert(row._5 >= 0.0 && row._5 <= 1.0, s"src$i tv out of range: ${row._5}")
      }
    }
  }
}
