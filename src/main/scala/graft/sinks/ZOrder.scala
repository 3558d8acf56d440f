package graft.sinks

import scala.collection.immutable.NumericRange

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — multi-dimensional pruning
  * for the rectangle predicates a single sort column cannot serve: a
  * table queried by BOTH `a BETWEEN ..` and `b BETWEEN ..` lays out
  * partitioned by interleaved-bit buckets, so either-dimension
  * selectivity prunes at the file-listing level. A layout sorted only
  * by `a` answers `a`-ranges with few files but scans everything for a
  * `b`-range; the Morton curve bounds locality in all dims at once.
  *
  * Everything here is EXACT integer arithmetic (bin = floor-scaled
  * rank, z = bit interleave via shift/and/or — all codegen'd
  * primitives), so the driver-side probe planner provably computes the
  * same cell for the same value as the column expression, and a
  * cross-engine twin can replay the binning bit-for-bit.
  *
  * Scale shape: the write is one `repartition(zbucket)` + partitioned
  * write (the writeIvfLayout small-file discipline — salt the
  * repartition key at 100 TB for more files per bucket); a rectangle
  * read enumerates candidate cells DRIVER-SIDE over the query's own
  * bin ranges only (cost = product of the rect's per-dim bin spans,
  * never the table), maps them to bucket directories, and scans just
  * those with the residual predicate pushed to parquet. */
object ZOrder {

  /** Exact floor division of a non-negative long column (`/` on longs
    * is a DOUBLE divide whose truncation can miss at exact multiples). */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** Integer bin of `c` into [0, 2^bits): values clamp to [min, max],
    * then rank-scale by exact long arithmetic. Requires
    * (max - min + 1) * 2^bits < 2^63. */
  def zbin(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(max >= min, s"empty bin domain [$min, $max]")
    require(bits >= 1 && bits <= 20, s"bits $bits not in [1, 20]")
    val range = max - min + 1
    require(range <= (Long.MaxValue >> bits),
      s"bin domain $range * 2^$bits overflows")
    val clamped = greatest(least(c.cast("long"), lit(max)), lit(min))
    floorDiv((clamped - lit(min)) * lit(1L << bits), range)
  }

  /** Driver-side twin of [[zbin]] — same clamp, same exact arithmetic. */
  def zbinLocal(v: Long, min: Long, max: Long, bits: Int): Long = {
    val clamped = math.max(min, math.min(max, v))
    (clamped - min) * (1L << bits) / (max - min + 1)
  }

  /** Morton interleave of per-dimension bins: bit k of dim i lands at
    * position k * ndims + i. All shift amounts are compile-time
    * literals — the whole expression stays in codegen. */
  def zValue(bins: Seq[Column], bits: Int): Column = {
    val n = bins.length
    require(n >= 1, "at least one dimension")
    require(n * bits <= 62, s"$n dims x $bits bits exceeds a long")
    bins.zipWithIndex.foldLeft(lit(0L)) { case (acc, (b, i)) =>
      (0 until bits).foldLeft(acc) { (a, k) =>
        a.bitwiseOR(shiftleft(shiftright(b, k).bitwiseAND(lit(1L)),
          k * n + i))
      }
    }
  }

  /** Driver-side twin of [[zValue]]. */
  def zValueLocal(bins: Seq[Long], bits: Int): Long = {
    val n = bins.length
    var z = 0L
    var i = 0
    while (i < n) {
      var k = 0
      while (k < bits) {
        z |= ((bins(i) >> k) & 1L) << (k * n + i)
        k += 1
      }
      i += 1
    }
    z
  }

  /** Per-dimension spec: source column plus its frozen [min, max]
    * domain (fix the domain like IVF centroids are frozen — readers and
    * appenders must bin against the SAME bounds or cells shift). */
  final case class Dim(name: String, min: Long, max: Long)

  private def bucketOf(z: Column, bits: Int, ndims: Int,
                       zBuckets: Int): Column =
    floorDiv(z, (1L << (bits * ndims)) / zBuckets)

  /** The z-bucket assignment as a column — the [[writeZOrderLayout]]
    * partition key exposed for appenders (the assignCells/srpBucket
    * role): a pure function of the row given frozen dims, so appended
    * rows land in exactly the directory a from-scratch build derives. */
  def zbucketColumn(dims: Seq[Dim], bits: Int, zBuckets: Int): Column = {
    val total = 1L << (bits * dims.length)
    require(zBuckets >= 1 && zBuckets <= total &&
      java.lang.Long.bitCount(zBuckets.toLong) == 1,
      s"zBuckets $zBuckets must be a power of two <= $total")
    val z = zValue(
      dims.map(d => zbin(col(d.name), d.min, d.max, bits)), bits)
    bucketOf(z, bits, dims.length, zBuckets).cast("int")
  }

  /** Write `df` partitioned by z-bucket. `zBuckets` must be a power of
    * two dividing 2^(bits*ndims) — each bucket directory then owns one
    * contiguous Morton range. */
  def writeZOrderLayout(df: DataFrame, path: String, dims: Seq[Dim],
                        bits: Int, zBuckets: Int): Unit =
    df.withColumn("zbucket", zbucketColumn(dims, bits, zBuckets))
      .repartition(col("zbucket"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(path)

  /** The bucket directories a rectangle can touch: enumerate the cells
    * of the rect's per-dim BIN ranges (only those — not the full grid)
    * through the local z twin. Sound by construction: every row inside
    * the rect bins inside these ranges, so its cell is enumerated. */
  def bucketsForRect(dims: Seq[Dim], rect: Seq[(Long, Long)], bits: Int,
                     zBuckets: Int): Seq[Int] = {
    require(rect.length == dims.length, "one (lo, hi) per dimension")
    val binRanges = dims.zip(rect).map { case (d, (lo, hi)) =>
      require(lo <= hi, s"empty rect side [$lo, $hi] on ${d.name}")
      zbinLocal(lo, d.min, d.max, bits) to zbinLocal(hi, d.min, d.max, bits)
    }
    val bucketSize = (1L << (bits * dims.length)) / zBuckets
    def cells(ranges: Seq[NumericRange[Long]]): Iterator[List[Long]] =
      ranges match {
        case Seq() => Iterator(Nil)
        case r +: rest =>
          r.iterator.flatMap(b => cells(rest).map(b :: _))
      }
    cells(binRanges)
      .map(bins => (zValueLocal(bins, bits) / bucketSize).toInt)
      .toSet.toSeq.sorted
  }

  /** Rectangle read over a [[writeZOrderLayout]] path: scans ONLY the
    * bucket directories [[bucketsForRect]] admits (`zbucket IN` is a
    * partition filter — plan-guarded in ZOrderSpec), with the exact
    * rectangle predicate applied on top (and pushed to the parquet
    * row groups of the surviving files). */
  def readRect(spark: org.apache.spark.sql.SparkSession, path: String,
               dims: Seq[Dim], rect: Seq[(Long, Long)], bits: Int,
               zBuckets: Int): DataFrame = {
    val buckets = bucketsForRect(dims, rect, bits, zBuckets)
    val residual = dims.zip(rect).map { case (d, (lo, hi)) =>
      col(d.name).between(lo, hi)
    }.reduce(_ && _)
    spark.read.parquet(path)
      .where(col("zbucket").isin(buckets: _*))
      .where(residual)
  }
}
