package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Entry held by the bounded heap. `tieBytes` lazily serializes the item
  * for deterministic ordering when scores are exactly equal.
  */
private[graft] final class ScoredItem(
    val score: Double, val item: Any, tieBytesFn: Any => Array[Byte]) {
  lazy val tieBytes: Array[Byte] = tieBytesFn(item)
}

private[graft] object ScoredItem {
  /** Unsigned lexicographic byte compare — a total, run-stable order. */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  }

/** Bounded top-k heap keyed by a Double score.
  *
  * `asc = true` keeps the k SMALLEST scores (L2 metric), `asc = false` the k
  * LARGEST (inner product / cosine). The heap root is always the current
  * evictable (worst-kept) element.
  *
  * This is the Spark-native analog of vearch's per-partition top-k +
  * router k-way merge (reference internal/router/document/doc_service.go
  * merge path, internal/client/client.go:1497-1576): Spark's partial
  * aggregation runs one heap per partition (map-side), the shuffle moves at
  * most k rows per group per partition, and merge() is the k-way combine.
  * Unlike a window `row_number() <= k`, nothing ever materializes a full
  * per-group sort — this is what keeps per-query KNN viable at 100 TB.
  */
private[graft] final class TopKBuffer(
    val k: Int, val asc: Boolean, tieBytesFn: Any => Array[Byte],
    tieCompare: Comparator[ScoredItem]) {
  // full (score, tie) ordering: k-boundary decisions on exactly-equal
  // scores are otherwise partition-arrival-order dependent (nondeterministic
  // across runs — the same bug class as rounding-before-ordering). The tie
  // always orders items ASCENDING regardless of score direction — matching
  // SQL's `ORDER BY score DESC, id` (id still ascending).
  private val bestFirst: Comparator[ScoredItem] = new Comparator[ScoredItem] {
    def compare(x: ScoredItem, y: ScoredItem): Int = {
      val c =
        if (asc) java.lang.Double.compare(x.score, y.score)
        else java.lang.Double.compare(y.score, x.score)
      if (c != 0) c else tieCompare.compare(x, y)
    }
  }
  // heap root = evictable (worst kept) => reverse of bestFirst.
  // initial CAPACITY is clamped — a degenerate "exactness" k (recall_num =
  // 1<<30) must not preallocate a k-element array; the queue grows to
  // min(k, observed rows) on its own
  val heap = new PriorityQueue[ScoredItem](
    math.min(math.max(k, 1), 1024), bestFirst.reversed())

  def add(score: Double, item: Any): Unit = {
    val cand = new ScoredItem(score, item, tieBytesFn)
    if (heap.size < k) { heap.offer(cand); () }
    else if (bestFirst.compare(cand, heap.peek()) < 0) {
      heap.poll(); heap.offer(cand); ()
    }
  }

  /** Best-first (query result order: L2 asc, IP desc). */
  def sorted: Array[ScoredItem] = {
    val arr = heap.toArray(new Array[ScoredItem](heap.size))
    java.util.Arrays.sort(arr, bestFirst)
    arr
  }
}

/** topk(score, item, k, asc) → array<struct<score double, item ITEM_TYPE>>
  * best-first. Registered as SQL function `graft_topk`.
  */
case class TopKAgg(
    score: Expression,
    payload: Expression,
    k: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk k must be > 0, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("item", payload.dataType, payload.nullable))),
    containsNull = false)

  @transient private lazy val itemProj =
    UnsafeProjection.create(Array[DataType](payload.dataType))
  @transient private lazy val itemRow = new GenericInternalRow(1)
  private def tieBytesOf(item: Any): Array[Byte] = {
    itemRow.update(0, item)
    itemProj(itemRow).getBytes.clone()
  }

  /** Tie-break on exactly-equal scores: the payload's NATIVE ordering
    * (numeric for numbers, SQL struct order for structs — what an oracle's
    * `ORDER BY score, id` produces) when the type is orderable; the
    * unsigned-lexicographic serialized-bytes order (still total and
    * run-stable, but not numeric) only for non-orderable payloads.
    */
  @transient private lazy val tieComparator: Comparator[ScoredItem] =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payload.dataType)) {
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(payload.dataType)
      new Comparator[ScoredItem] {
        // interpreted orderings don't accept null operands; null items
        // sort FIRST (Spark's asc NULLS FIRST convention)
        def compare(x: ScoredItem, y: ScoredItem): Int = {
          val a = x.item
          val b = y.item
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else ord.compare(a, b)
        }
      }
    } else new Comparator[ScoredItem] {
      def compare(x: ScoredItem, y: ScoredItem): Int =
        ScoredItem.compareBytes(x.tieBytes, y.tieBytes)
    }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, asc, tieBytesOf, tieComparator)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val p = payload.eval(input)
      buf.add(s.asInstanceOf[Double], InternalRow.copyValue(p))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e.score, e.item) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { e =>
      new GenericInternalRow(Array[Any](e.score, e.item)): Any
    }
    new GenericArrayData(rows)
  }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](DoubleType, payload.dataType))
  @transient private lazy val serRow = new GenericInternalRow(2)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      serRow.update(0, e.score)
      serRow.update(1, e.item)
      val ur = serProj(serRow)
      out.writeInt(ur.getSizeInBytes)
      out.write(ur.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = new TopKBuffer(k, asc, tieBytesOf, tieComparator)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val ur = new UnsafeRow(2)
      ur.pointTo(rowBytes, len)
      val item = InternalRow.copyValue(ur.get(1, payload.dataType))
      buf.add(ur.getDouble(0), item)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_topk"
}
