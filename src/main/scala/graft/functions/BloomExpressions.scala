package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Bloom-filter primitives for the exact-dedup ingest gate.
  *
  * Position family: Kirsch–Mitzenmacher double hashing (public result:
  * "Less Hashing, Same Performance", 2006) — `pos_i = (h1 + i*h2) mod m`
  * with two derived base hashes, which preserves the classic Bloom
  * false-positive asymptotics with only two multiplications per row.
  * Everything is plain BIGINT-safe arithmetic (every intermediate
  * < 2^63), so a DuckDB oracle replays the identical positions:
  *
  * {{{ h' = ((h mod P) + P) mod P          // normalize into [0, P)
  *     h1 = (h' * 2654435761) mod P        // < P, product < 2^63
  *     h2 = 2*((h' * 2246822519) mod 2^30-ish) + 1   // odd => full period
  *     pos_i = (h1 + i*h2) mod m }}}
  *
  * `h2` odd plus power-of-two `m` makes the k probe positions distinct.
  * The multiplier constants are the public xxhash/Knuth primes; the
  * LCG-lattice hazard that bit the hyperplane family (PERF lesson) does
  * not arise here because Bloom positions only need per-key uniformity,
  * not cross-dimension independence — and KM's guarantees are exactly
  * about this construction.
  */
object BloomHash {
  final val P = 2147483647L

  /** The i-th probe position of hash `h` in an m-bit filter (m > 0,
    * power of two recommended). */
  @inline def position(h: Long, i: Int, mBits: Long): Long = {
    val hn = ((h % P) + P) % P
    val h1 = (hn * 2654435761L) % P
    val h2 = 2L * ((hn * 2246822519L) % 1073741823L) + 1L
    (h1 + i * h2) % mBits
  }

  /** Set the k probe bits of `h` in `words` (little-endian 64-bit words). */
  def set(words: Array[Long], h: Long, k: Int, mBits: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = position(h, i, mBits)
      words((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  /** True iff all k probe bits of `h` are set — "maybe present". */
  def maybe(words: Array[Long], h: Long, k: Int, mBits: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = position(h, i, mBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Aggregate a LONG hash column into an m-bit Bloom bitmap
  * (`array<bigint>` of m/64 words). Partial buffers OR together, so the
  * map-side combine reduces EVERY partition to one m/8-byte bitmap
  * before the exchange — building a filter over 10^10 corpus hashes
  * shuffles `#partitions * m/8` bytes, never the hashes themselves. */
case class BloomBuildAgg(child: Expression, mBits: Int, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"bloom m must be a power of two >= 64, got $mBits")
  require(k >= 1 && k <= 32, s"bloom k must be in [1, 32], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomHash.set(buf, v.asInstanceOf[Long], k, mBits)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomBuildAgg = copy(child = c.head)
}

/** `bloom_maybe(words, h)` — true iff all k probe bits of `h` are set in
  * the bitmap. The bitmap arrives as an ordinary array column (one row
  * per shard from [[graft.ops.Dedup.bloomIndex]], broadcast by the
  * gate's join), so the probe runs where the batch rows already are. */
case class BloomMaybeExpr(left: Expression, right: Expression,
    mBits: Int, k: Int)
  extends BinaryExpression with CodegenFallback {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"bloom m must be a power of two >= 64, got $mBits")
  require(k >= 1 && k <= 32, s"bloom k must be in [1, 32], got $k")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_maybe"

  override protected def nullSafeEval(wordsAny: Any, hAny: Any): Any = {
    val arr = wordsAny.asInstanceOf[ArrayData]
    val h = hAny.asInstanceOf[Long]
    var i = 0
    while (i < k) {
      val pos = BloomHash.position(h, i, mBits)
      if ((arr.getLong((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMaybeExpr = copy(left = l, right = r)
}
