package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, tiebreak
  * ASC) payload structs per group in a size-k heap.
  *
  * This is the scale-correct shape for "top N per key": the window
  * formulation (`row_number().over(partitionBy(key).orderBy(...))`
  * + filter) shuffles EVERY row to its key's partition and sorts the
  * whole partition; this aggregate is a partial aggregate — each map
  * task keeps at most k rows per key, the shuffle carries k rows per
  * (key, mapper), and no sort larger than k ever happens. At 100 TB
  * the difference is the whole fact table's width in shuffle bytes.
  *
  * Determinism: ordering is (score DESC, tiebreak ASC); with a unique
  * tiebreak the k-boundary is exact — the same rows surface under any
  * partitioning. Result is the payload array in that order.
  */
case class TopKAgg(
    payload: Expression,
    score: Expression,
    tiebreak: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(payload, score, tiebreak)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)
  override def prettyName: String = "top_k_structs"

  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKAgg.Heap =
    new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    val p = payload.eval(input)
    if (s != null && t != null && p != null) {
      val row = p.asInstanceOf[InternalRow] match {
        case u: UnsafeRow => u.copy()
        case r => proj(r).copy()
      }
      buf.offer(s.asInstanceOf[Number].doubleValue(),
        t.asInstanceOf[Number].longValue(), row)
    }
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    b.foreach { e => a.offer(e.score, e.tie, e.row) }
    a
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedRows.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      out.writeDouble(e.score)
      out.writeLong(e.tie)
      val bytes = e.row.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val t = in.readLong()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(payloadType.size)
      row.pointTo(rowBytes, len)
      buf.offer(s, t, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(payload = newChildren(0), score = newChildren(1),
      tiebreak = newChildren(2))
}

object TopKAgg {
  final class Entry(val score: Double, val tie: Long, val row: InternalRow)

  /** Size-bounded min-heap on (score ASC, tie DESC) — the root is the
    * WORST kept entry, evicted when a better one arrives. "Better" =
    * higher score, or equal score and lower tiebreak. */
  final class Heap(k: Int) {
    // ordering: root = minimum by (score, -tie) ⇒ worst of the kept
    private val pq = new java.util.PriorityQueue[Entry](k + 1,
      (a: Entry, b: Entry) => {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.tie, a.tie)
      })

    def size: Int = pq.size()

    def offer(score: Double, tie: Long, row: InternalRow): Unit = {
      if (pq.size() < k) {
        pq.offer(new Entry(score, tie, row))
      } else {
        val worst = pq.peek()
        // Double.compare, NOT IEEE >/==: the eviction test must use
        // the same total order as the heap comparator and sortedRows
        // (-0.0 < 0.0, NaN greatest), or -0.0/NaN scores make the
        // kept set diverge from the (score DESC, tie ASC) contract.
        val c = java.lang.Double.compare(score, worst.score)
        val better = c > 0 || (c == 0 && tie < worst.tie)
        if (better) { pq.poll(); pq.offer(new Entry(score, tie, row)) }
      }
    }

    def foreach(f: Entry => Unit): Unit = pq.forEach(e => f(e))

    /** Payload rows ordered (score DESC, tie ASC). */
    def sortedRows: Array[InternalRow] = {
      val arr = pq.toArray(new Array[Entry](pq.size()))
      java.util.Arrays.sort(arr, (a: Entry, b: Entry) => {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else java.lang.Long.compare(a.tie, b.tie)
      })
      arr.map(_.row)
    }
  }

  /** Wrap score/tiebreak in casts so eval always yields primitives —
    * Spark's Decimal is not a java.lang.Number, so an uncast DECIMAL
    * score would ClassCastException per row at runtime. */
  def withCasts(payload: Expression, score: Expression,
                tiebreak: Expression, k: Int): TopKAgg =
    TopKAgg(payload,
      org.apache.spark.sql.catalyst.expressions.Cast(score, DoubleType),
      org.apache.spark.sql.catalyst.expressions.Cast(tiebreak, LongType), k)

  /** Column builder: top-`k` `payload` structs per group by
    * (`score` DESC, `tiebreak` ASC). */
  def topK(payload: Column, score: Column, tiebreak: Column,
           k: Int): Column =
    GraftColumnBridge.column(
      withCasts(GraftColumnBridge.expression(payload),
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(tiebreak), k)
        .toAggregateExpression())
}
