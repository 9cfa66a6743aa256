package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV ("k minimum values" / bottom-k) distinct-value sketch: the k
  * smallest DISTINCT hash values seen. Public construction: Bar-Yossef
  * et al. 2002 ("Counting distinct elements in a data stream"); the
  * unbiased estimator and the multi-set union/intersection algebra are
  * Beyer et al. SIGMOD 2007 ("On synopses for approximate distinct-value
  * estimation") and Cohen & Kaplan 2007 (bottom-k sketches).
  *
  * Why this next to HLL ([[graft.ops.Sketches.hllRegisters]]): HLL
  * estimates ONE set's cardinality in 2^b registers but supports no
  * intersection; a KMV sketch is a uniform sample of the set's hash
  * space, so two sketches compose — bottom-k of a union is computable
  * from the parts' sketches alone, and the Jaccard of the underlying
  * sets is estimated by counting union-sketch members present in both
  * parts (Beyer et al. §5). That is exactly the cross-corpus overlap /
  * contamination-rate question a training-data lake asks ("how much of
  * source A is in source B?") without ever shuffling the sets.
  *
  * State is bounded: k longs, maintained as a sorted array with a cap —
  * the map-side combine collapses every partition to <= k values before
  * the exchange (the [[BloomBuildAgg]] scale shape). Merge inserts one
  * bounded array into the other; eval returns the ascending array.
  *
  * Determinism: pure order statistics of the input hash column — no RNG,
  * no floats — so a DuckDB oracle replaying `row_number() OVER (ORDER BY
  * h) <= k` over the same hashes reproduces the sketch bit-for-bit.
  * Feed it avalanched hashes ([[graft.ops.Sketches.avalanche31]]): the
  * estimator assumes uniformity in [0, 2^31), which raw polyHash does
  * not provide (its high bits follow string shape — the q123 HLL
  * lesson).
  */
case class KmvAgg(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {
  require(k >= 2 && k <= 65536, s"kmv k must be in [2, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_agg"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvState, b: KmvState): KmvState = {
    var i = 0
    while (i < b.size) { a.insert(b.values(i)); i += 1 }
    a
  }

  override def eval(buf: KmvState): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.values, buf.size))

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.insert(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg = copy(child = c.head)
}

/** Bounded sorted distinct-long buffer: the k smallest values seen.
  * Insertion keeps `values(0 until size)` ascending; a value >= the
  * current max of a full buffer is rejected in O(1), otherwise binary
  * search + arraycopy — O(log k + k) worst case against tiny k. */
final class KmvState(k: Int) {
  val values = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit = {
    if (size == k && v >= values(k - 1)) return
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (values(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < size && values(lo) == v) return // distinct-only
    val last = if (size == k) k - 1 else size
    System.arraycopy(values, lo, values, lo + 1, last - lo)
    values(lo) = v
    if (size < k) size += 1
  }
}
