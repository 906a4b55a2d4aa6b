package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Functions => F}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("field(): Hive semantics — 1-based index, 0 on miss, 0 on NULL") {
    val r = spark
      .sql("SELECT field('cp','nocp','cp') a, field('nocp','nocp','cp') b, " +
        "field('zz','nocp','cp') c, field(NULL,'nocp','cp') d")
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1 && r.getInt(2) == 0 && r.getInt(3) == 0)
  }

  test("field() as Column matches SQL registration") {
    val df = Seq("cp", "nocp", "other").toDF("p")
    val got = df
      .select((F.field(col("p"), lit("nocp"), lit("cp")) - 1).as("x"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 0, -1))
  }

  test("SQL registration covers the signature-math expressions") {
    val r = spark.sql(
      "SELECT md5_hash64('tok') h, md5_hash64_full('tok') hf, " +
        "dot_product(array(1.0D,2.0D), array(3.0D,4.0D)) dp, " +
        "word_shingles('a b c d', 3) sh").head()
    // hash64 == first 15 md5 hex chars; full == first 8 digest bytes BE
    assert(r.getLong(0) == java.lang.Long.parseLong("60ae136e5d49fbd", 16))
    assert(r.getLong(1) == (r.getLong(0) << 4 | 0xf))
    assert(r.getDouble(2) == 11.0)
    assert(r.getSeq[String](3) == Seq("a b c", "b c d"))
  }

  test("cosine_sim: identical ~1, orthogonal 0, zero-norm NULL") {
    val r = spark
      .sql("SELECT cosine_sim(array(1.0D,2.0D,3.0D), array(1.0D,2.0D,3.0D)) a, " +
        "cosine_sim(array(1.0D,0.0D), array(0.0D,1.0D)) b, " +
        "cosine_sim(array(0.0D,0.0D), array(1.0D,1.0D)) c")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
  }

  test("cosine_sim / dot_product: mismatched dimensionality yields NULL") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      F.cosineSim(col("a"), col("b")).as("c"),
      F.dotProduct(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("cosine_sim works on float arrays (embeddings schema)") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    val c = df.select(F.cosineSim(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hash64 is the md5-derived value (engine-portable contract)") {
    // cross-checked against DuckDB: ('0x'||substr(md5('abc'),1,15))::BIGINT
    val got = Seq("abc").toDF("s").select(F.hash64(col("s"))).as[Long].head()
    assert(got == 648541476951500027L)
  }

  test("shingles: distinct n-grams, empty below n tokens") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(F.shingles(F.tokens(col("t")), 3)).as[Seq[String]].collect()
    assert(got(0).toSet == Set("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("wordShingles matches the composed shingles(tokens(...)) form") {
    val df = Seq(
      "a b c d e", "  leading and trailing  ", "double  space here",
      "a b", "", "a a a a a").toDF("t")
    val composed = df.select(F.shingles(F.tokens(col("t")), 3)).as[Seq[String]].collect()
    val fused = df.select(F.wordShingles(col("t"), 3)).as[Seq[String]].collect()
    composed.zip(fused).foreach { case (c, f) =>
      assert(f.toSet == c.toSet, s"mismatch: composed=$c fused=$f")
    }
  }

  test("jaccard set semantics") {
    val df = Seq((Seq("a", "b", "b"), Seq("b", "c"))).toDF("x", "y")
    val j = df.select(F.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("minhash signatures: more similar docs share more hashes; empty gets sentinel") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different content with no overlap whatsoever here now"),
      (4L, "too short"))
      .toDF("id", "t")
    val sigs = graft.operators.Dedup
      .minhashSignatures(docs, "id", "t", shingleN = 3, numHashes = 16)
      .as[(Long, Seq[Long])].collect().toMap
    def matches(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(matches(sigs(1L), sigs(2L)) > matches(sigs(1L), sigs(3L)))
    assert(sigs(4L).forall(_ == Long.MaxValue)) // < 3 tokens -> sentinel
  }
}
