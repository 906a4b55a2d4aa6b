package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton) clustering.
  *
  * Range-partitioning and sorting by ONE column makes parquet min/max
  * stats razor-sharp for that column and useless for every other; a
  * corpus queried by two selective dimensions (e.g. customer AND date)
  * wants both tight. Interleaving the bits of the two normalized keys
  * gives a single sort key whose contiguous ranges are small rectangles
  * in (a, b) space — so each output file covers a narrow span of BOTH
  * columns, and row-group/file skipping prunes on either predicate.
  * This is the same maintenance action as Delta/Iceberg `ZORDER BY`,
  * expressed as a plain repartition-by-range + sort-within-partitions
  * write (one shuffle, no driver-side data movement).
  */
object Layout {

  /** Morton-interleave two already-normalized keys (each in
    * [0, 2^bits)): bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Pure integer column expressions — codegen'd, zero shuffle. */
  def zorderKey2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Min-max normalize an integer column to [0, 2^bits) with pure Long
    * arithmetic (no doubles — exact at any magnitude). `lo`/`hi` are the
    * column's actual bounds, collected once driver-side (two longs). */
  def normalize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = math.max(1L, hi - lo)
    // (v - lo) * (2^bits - 1) / span, staged so the product can't
    // overflow for spans up to 2^(63 - bits)
    ((v - lit(lo)) * lit((1L << bits) - 1) / lit(span)).cast("long")
  }

  /** Rewrite `df` into `outDir` z-ordered on two integer-valued columns:
    * normalize each to `bits` bits from its observed min/max, interleave,
    * range-partition into `numFiles` and sort within partitions by the
    * z-key. One pass, one shuffle; the only driver traffic is the 4-long
    * min/max row. Readers then prune files/row-groups on EITHER column's
    * parquet stats. */
  /** Integer view of a column for z-key purposes (ordering is all that
    * matters): timestamps via epoch micros — TIMESTAMP_NTZ has no direct
    * BIGINT cast in Spark 4. */
  private def asLong(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case org.apache.spark.sql.types.DateType =>
        col(c).cast("timestamp").cast("long")
      case _ => col(c).cast("long")
    }

  def zorderWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      outDir: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    val (la, lb) = (asLong(df, colA), asLong(df, colB))
    val r = df.agg(min(la), max(la), min(lb), max(lb)).head()
    val z = zorderKey2(
      normalize(la, r.getLong(0), r.getLong(1), bits),
      normalize(lb, r.getLong(2), r.getLong(3), bits),
      bits)
    df.withColumn("_zkey", z)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(outDir)
  }
}
