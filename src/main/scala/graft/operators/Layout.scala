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
  def zorderKey2(a: Column, b: Column, bits: Int): Column =
    zorderKeyN(Seq(a, b), bits)

  /** n-column Morton interleave: bit i of column j lands at position
    * i·n + j, so every contiguous z-key range is a small hyper-
    * rectangle in all n dimensions. `zorderKey2` is the n = 2 case
    * bit-for-bit. Pure integer expressions — codegen'd, zero shuffle. */
  def zorderKeyN(colsN: Seq[Column], bits: Int): Column = {
    val n = colsN.size
    require(n >= 2, s"z-order needs >= 2 columns, got $n")
    require(bits > 0 && n * bits <= 62,
      s"n*bits must fit a positive long: got $n*$bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      colsN.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Min-max normalize an integer column to [0, 2^bits) with exact
    * arithmetic at any magnitude: the product (v − lo)·(2^bits − 1) is
    * staged through DECIMAL(38,0) and floored with IntegralDivide.
    * Neither of the two obvious stagings survives real data — Long
    * math overflows 2^63 once span > 2^(63−bits) (an epoch-micros
    * DATE RANGE at bits = 16 already does: TPC-H o_orderdate spans
    * 2.08e14 µs > 2^63/65535 ≈ 1.41e14, silently wrapping ~31% of
    * rows negative under ansi=false), and `Column./` widens to double
    * whose 53-bit mantissa rounds the same product. Decimal
    * multiply/divide is exact to 38 digits (a 20-digit span times a
    * 5-digit multiplier is well inside), and IntegralDivide floors —
    * non-negative here — back to a LONG in [0, 2^bits).
    * `lo`/`hi` are the column's actual bounds, collected once
    * driver-side (two longs). The subtraction and the span are both
    * staged OUTSIDE Long arithmetic — `v` is cast to decimal before
    * `lo` is subtracted and the span is computed in BigInt — because a
    * column whose observed span exceeds 2^63 (bounds near both Long
    * extremes) would wrap a Long `v - lo` pre-cast, and `hi - lo`
    * itself would wrap driver-side (masked by the max(1, _) clamp). */
  def normalize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = (BigInt(hi) - BigInt(lo)).max(BigInt(1))
    org.apache.spark.sql.graftbridge.Bridge.integralDivide(
      (v.cast("decimal(38,0)") - lit(java.math.BigDecimal.valueOf(lo)))
        * lit((1L << bits) - 1),
      lit(new java.math.BigDecimal(span.bigInteger)))
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
      bits: Int = 16): Unit =
    zorderWriteN(df, Seq(colA, colB), outDir, numFiles, bits)

  /** n-column z-ordered rewrite: same one-shuffle shape as the 2-column
    * form — normalize each integer-valued column from its observed
    * bounds, interleave all n, range-partition + sort-within by the
    * z-key. Driver traffic is the 2n-long bounds row. Readers prune
    * files/row-groups on ANY of the n columns' parquet stats. */
  def zorderWriteN(
      df: DataFrame,
      colsN: Seq[String],
      outDir: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    val longs = colsN.map(c => asLong(df, c))
    val boundExprs = longs.flatMap(l => Seq(min(l), max(l)))
    val r = df.agg(boundExprs.head, boundExprs.tail: _*).head()
    val z = zorderKeyN(
      longs.zipWithIndex.map { case (l, i) =>
        normalize(l, r.getLong(2 * i), r.getLong(2 * i + 1), bits)
      }, bits)
    df.withColumn("_zkey", z)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Hilbert-curve clustered rewrite on two integer-valued columns — the
    * [[zorderWrite]] twin at the same bit budget with strictly better
    * locality: the Hilbert curve has no Morton seams (consecutive curve
    * positions are ALWAYS grid neighbors), so each contiguous key range —
    * hence each output file — covers a tighter (a, b) rectangle and
    * min/max stats prune harder on both dimensions (Round11Spec measures
    * both layouts on the same harness). Same one-shuffle shape:
    * normalize from observed bounds, one codegen'd
    * [[graft.functions.HilbertKey2]] per row, range-partition + sort
    * within by the curve key; driver traffic is the 4-long bounds row. */
  def hilbertWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      outDir: String,
      numFiles: Int,
      bits: Int = 16): Unit = {
    val (la, lb) = (asLong(df, colA), asLong(df, colB))
    val r = df.agg(min(la), max(la), min(lb), max(lb)).head()
    val h = graft.functions.Functions.hilbertKey2(
      normalize(la, r.getLong(0), r.getLong(1), bits),
      normalize(lb, r.getLong(2), r.getLong(3), bits), bits)
    df.withColumn("_hkey", h)
      .repartitionByRange(numFiles, col("_hkey"))
      .sortWithinPartitions(col("_hkey"))
      .drop("_hkey")
      .write.mode("overwrite").parquet(outDir)
  }
}
