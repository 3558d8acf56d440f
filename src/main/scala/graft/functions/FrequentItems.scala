package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate — the
  * bounded-memory "top terms" operator a 100 TB corpus needs where an
  * exact `GROUP BY term` would shuffle billions of distinct keys: the
  * sketch keeps fewer than 2·`capacity` counters per group, updates are
  * O(1) amortized (batched purge at the 2x watermark — the textbook
  * per-miss decrement-all costs O(capacity) per row and loses to the
  * exact aggregate on high-cardinality streams, measured in ScaleBench),
  * and partial aggregation works map-side like any other aggregate
  * (this is a [[TypedImperativeAggregate]], so it rides
  * ObjectHashAggregate with partial merge — the corpus never shuffles,
  * only sketch-sized maps do).
  *
  * Guarantees (Misra & Gries 1982; batched purge per the Frequent-Items
  * literature, merge rule from Agarwal et al. 2013): every reported
  * count is an UNDERCOUNT by at most N/(capacity+1) (N = stream
  * length; each purge's δ is absorbed in full by its top capacity+1
  * entries, so Σδ ≤ N/(capacity+1)), and any term with true frequency
  * > N/(capacity+1) is guaranteed present. When the number of DISTINCT
  * terms in the group is < 2·capacity, no purge ever fires and the
  * result is the EXACT multiset count, independent of arrival and
  * merge order — the regime the DuckDB oracle gates bit-for-bit. Below
  * that, counts depend (within the error bound) on partition order;
  * callers wanting reproducible approximate runs fix the partitioning
  * upstream. Rank fidelity among near-ties is NOT guaranteed — an
  * adversarially tied key space (ScaleBench's replicated-doc grams)
  * reorders survivors within the error band.
  *
  * Output: array<struct<term,count>> sorted by (count desc, term asc) —
  * deterministic for any fixed final counter set. Null inputs are
  * skipped (SQL aggregate convention). */
case class FrequentItems(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity >= 1 && capacity <= (1 << 22),
    s"capacity must be in [1, 2^22]: $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FrequentItems.resultType
  override def prettyName: String = "frequent_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buffer.get(key) match {
        case Some(c) => buffer.update(key, c + 1L)
        case None =>
          // the input UTF8String may point into a reused row buffer —
          // copy before retaining it across rows
          buffer.update(key.copy(), 1L)
          // batched purge (the DataSketches-style amortization of the
          // textbook decrement-all, which costs O(capacity) per MISS and
          // makes high-cardinality streams slower than the exact
          // aggregate they're meant to beat): let the map grow to
          // 2·capacity, then subtract the (capacity+1)-th largest count
          // from everything in one pass. The top capacity+1 entries each
          // absorb the full δ, so Σδ ≤ N/(capacity+1) — the classic MG
          // bound survives, and eviction work amortizes to O(1) per row
          // (each purge removes ≥ capacity entries).
          if (buffer.size >= capacity * 2) FrequentItems.purge(buffer, capacity)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    // same batched rule at the same 2x watermark: merged partials purge
    // only when they genuinely overflow, so the exact regime (distinct
    // keys < capacity — no purge ever fires anywhere) is preserved
    if (buffer.size >= capacity * 2) FrequentItems.purge(buffer, capacity)
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buffer.toArray
    // (count desc, term asc): deterministic for any fixed counter set
    java.util.Arrays.sort(entries, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val byCount = java.lang.Long.compare(b._2, a._2)
        if (byCount != 0) byCount else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(k, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buffer.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(child = newChildren.head)
}

object FrequentItems {
  /** Subtract the (capacity+1)-th largest count from every entry and drop
    * the non-positive. Shared by update (at the 2x watermark) and merge. */
  private[functions] def purge(buffer: mutable.HashMap[UTF8String, Long],
                               capacity: Int): Unit = {
    val counts = buffer.values.toArray
    java.util.Arrays.sort(counts)
    val thresh = counts(counts.length - 1 - capacity)
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buffer.foreach { case (k, c) =>
      if (c - thresh <= 0L) dead += k else buffer.update(k, c - thresh)
    }
    dead.foreach(buffer.remove)
  }

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  /** Column-API surface: `frequentItems(col, capacity)` aggregates to
    * array<struct<term,count>> — explode it for one row per term. */
  def frequentItems(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      FrequentItems(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
