package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Deduplication operators for large text corpora.
  *
  * All signature math is built on the engine-portable [[graft.functions.Functions.hash64]]
  * (md5-derived) so results are bit-reproducible across engines — that is
  * what makes these operators oracle-checkable, and at 100 TB it also makes
  * incremental dedup runs stable across Spark versions (Spark's internal
  * `hash()` is not a cross-version contract).
  *
  * Scale notes: every op here is one shuffle (groupBy doc or join on
  * bucket key); candidate generation never materializes the O(n^2) pair
  * space — pairs only exist within an LSH band bucket / blocking key.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `cols`. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact-duplicate groups by content hash: (fingerprint, n_docs, min id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** MinHash + LSH near-duplicate candidates.
    *
    * shingle(n) -> `numHashes` seeded min-hashes -> `bands` bands of
    * `numHashes/bands` rows -> docs sharing any band bucket are candidates.
    * Output: (doc_a, doc_b, est_jaccard) where est_jaccard is the fraction
    * of matching minhashes. Join is on the band key (shuffle, no cartesian).
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = df
      .select(
        col(idCol).as("doc_id"),
        minhashSignature(shingles(tokens(col(textCol)), shingleN), numHashes).as("sig"))
    val banded = sigs.select(
      col("doc_id"),
      col("sig"),
      explode(
        array((0 until bands).map { b =>
          struct(
            lit(b).as("band"),
            concat_ws("_", slice(col("sig"), b * rows + 1, rows).cast("array<string>")).as("bkey"))
        }: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        round(
          aggregate(
            zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)),
            lit(0),
            (acc, x) => acc + x).cast("double") / numHashes,
          6).as("est_jaccard"))
      .distinct()
  }

  /** Per-document SimHash signature (`bits` wide, default 32). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      simhash(tokens(col(textCol)), bits).as("simhash"))

  /** SimHash near-duplicate pairs within a hamming radius, blocked on the
    * top `blockBits` bits so candidate generation is a bucket join. */
  def simhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 32,
      blockShift: Int = 16,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol, bits)
      .withColumn("block", shiftright(col("simhash"), blockShift))
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs inside a blocking
    * key (cheap equality blocking keeps the pair space linear-ish). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[org.apache.spark.sql.Column],
      shingleN: Int = 2,
      minJaccard: Double = 0.0): DataFrame = {
    val docs = df.select(
      col(idCol).as("doc_id"),
      struct(blockCols: _*).as("block"),
      shingles(tokens(col(textCol)), shingleN).as("grams"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        round(jaccard(col("a.grams"), col("b.grams")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding near-duplicate pairs: block on provided columns plus a
    * 4-bit sign-bucket of the leading dimensions, then exact cosine. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val signBucket = (0 until 4)
      .map(j => when(col(vecCol).getItem(j) > 0f, 1 << j).otherwise(0))
      .reduce(_ + _)
    val docs = df.select(
      col(idCol).as("vec_a_id"),
      struct(blockCols :+ signBucket.as("sb"): _*).as("block"),
      col(vecCol).as("v"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.vec_a_id") < col("b.vec_a_id"))
      .select(
        col("a.vec_a_id").as("vec_a"),
        col("b.vec_a_id").as("vec_b"),
        round(graft.functions.Functions.cosineSim(col("a.v"), col("b.v")), 6).as("cos"))
  }
}
