package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side
  * (the classic hot-key problem at 100 TB), a plain shuffle join lands
  * the whole hot key in one task. Salting splits each big-side key into
  * `salts` sub-keys deterministically (hash of the full row, not RNG —
  * reruns produce identical partitioning) and replicates the small side
  * across all salt values, so the hot key fans out over `salts` tasks.
  *
  * AQE's skew-join splitting handles sort-merge cases adaptively; this
  * operator is the explicit form for when the small side is too big to
  * broadcast but cheap to replicate `salts` times — and it composes with
  * any downstream aggregation.
  */
object SkewJoin {

  /** `saltCols`: the columns hashed into the salt. Default (empty) hashes
    * the FULL row — always correct, but it references every column and so
    * defeats column pruning at the scan (a 16-column parquet read for a
    * 3-column query). Pass columns the query already reads (any per-row-
    * varying subset spreads the hot key) to keep the scan narrow — the
    * salt only needs to vary within a key, not be collision-free. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int = 8,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    val hashed = if (saltCols.isEmpty) big.columns.toSeq else saltCols
    val bigSalted = big.withColumn(
      "_salt",
      pmod(xxhash64(struct(hashed.map(col): _*)), lit(salts)).cast("int"))
    val smallSalted = small.withColumn(
      "_salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted
      .join(smallSalted, Seq(key, "_salt"))
      .drop("_salt")
  }
}
