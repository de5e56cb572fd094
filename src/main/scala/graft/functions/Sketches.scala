package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` UDAFs for near-duplicate sketching (SURVEY.md
  * §4.3 item 2; fills the G20 UDAF surface).
  *
  * Both aggregators keep FIXED-SIZE buffers (k longs / 64 ints) — the
  * spill-safety rule of SURVEY.md §4.4: per-group state never grows
  * with group size, so a hot document with millions of shingles costs
  * the same memory as a tiny one.
  */
object Sketches {

  /** MinHash: element-wise minimum over per-permutation hash arrays.
    * Input rows are the k-vector of hashes of ONE shingle; the
    * aggregate is the k-vector of minima — an unbiased estimator of
    * Jaccard similarity via component agreement. Commutative +
    * associative, so Spark's partial/final split applies untouched. */
  class MinHashAgg(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < k) { val v = a(i); if (v < b(i)) b(i) = v; i += 1 }
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** SimHash: 64 signed bit-counters over per-feature 64-bit hashes;
    * finish() collapses to the sign bit-vector. Hamming distance
    * between signatures approximates angular distance between the
    * feature multisets. */
  class SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    override def zero: Array[Int] = new Array[Int](64)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) { b(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1 }
      b
    }
    override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { b1(j) += b2(j); j += 1 }
      b1
    }
    override def finish(b: Array[Int]): Long = {
      var sig = 0L
      var j = 0
      while (j < 64) { if (b(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  }

  /** Count-min sketch: d×w counter grid; each input row carries its d
    * pre-hashed bucket indices (computed with the codegen'd `hash()`
    * builtin, so the aggregator itself never hashes). Estimate(item) =
    * min over rows of its d counters — never an underestimate, over by
    * at most ε·N with ε = e/w (Cormode & Muthukrishnan 2005). Fixed
    * 8·d·w-byte buffer regardless of stream size or group count — the
    * same spill-safety rule as MinHash/SimHash above. */
  class CountMinAgg(d: Int, w: Int) extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(b: Array[Long], idxs: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + idxs(i)) += 1L; i += 1 }
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded top-k: per-group best k (score, id) pairs ordered by
    * (score DESC, id ASC), kept as sorted arrays capped at k. Unlike a
    * `row_number()<=k` window — which funnels every group into one task
    * and sorts the ENTIRE group — this is an ordinary aggregation:
    * partial buffers of ≤k entries combine map-side, so a hot group
    * costs O(n·k) streaming work and k memory, never an n·log n sort.
    * The id tiebreak makes results engine-deterministic. */
  class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[(Double, Long)]] {

    override def zero: (Array[Double], Array[Long]) =
      (Array.empty[Double], Array.empty[Long])

    private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    override def reduce(b: (Array[Double], Array[Long]),
                        a: (Double, Long)): (Array[Double], Array[Long]) = {
      val (ss, ids) = b
      val n = ss.length
      if (n == k && !beats(a._1, a._2, ss(n - 1), ids(n - 1))) return b
      var pos = n
      while (pos > 0 && beats(a._1, a._2, ss(pos - 1), ids(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      System.arraycopy(ss, 0, ns, 0, pos)
      System.arraycopy(ids, 0, ni, 0, pos)
      if (pos < m) { ns(pos) = a._1; ni(pos) = a._2 }
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(ss, pos, ns, pos + 1, tail)
        System.arraycopy(ids, pos, ni, pos + 1, tail)
      }
      (ns, ni)
    }

    override def merge(b1: (Array[Double], Array[Long]),
                       b2: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
      var acc = b1
      var i = 0
      while (i < b2._1.length) { acc = reduce(acc, (b2._1(i), b2._2(i))); i += 1 }
      acc
    }

    override def finish(b: (Array[Double], Array[Long])): Seq[(Double, Long)] =
      b._1.toSeq.zip(b._2.toSeq)

    override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
      ExpressionEncoder[(Array[Double], Array[Long])]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Column form: `topK(k)(scoreCol, idCol)`. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    (s, i) => fn(s, i)
  }

  /** [[TopKAgg]] over PAIR rows: best k (score, id1, id2) triples per
    * group, ordered (score DESC, id1 ASC, id2 ASC). Same bounded-heap
    * contract — ≤k state per group, map-side partial merge — but the
    * payload is an edge, not a row id, so pair-emitting operators
    * (near-dup mining, kNN edges) can cap their per-group output
    * without packing two ids into one long (ids stay full-range
    * BIGINT, safe at 100 TB corpus sizes). */
  class TopKPairAgg(k: Int)
      extends Aggregator[(Double, Long, Long),
        (Array[Double], Array[Long], Array[Long]), Seq[(Double, Long, Long)]] {

    override def zero: (Array[Double], Array[Long], Array[Long]) =
      (Array.empty[Double], Array.empty[Long], Array.empty[Long])

    private def beats(s1: Double, a1: Long, b1: Long,
                      s2: Double, a2: Long, b2: Long): Boolean =
      s1 > s2 || (s1 == s2 && (a1 < a2 || (a1 == a2 && b1 < b2)))

    override def reduce(buf: (Array[Double], Array[Long], Array[Long]),
                        a: (Double, Long, Long)): (Array[Double], Array[Long], Array[Long]) = {
      val (ss, i1, i2) = buf
      val n = ss.length
      if (n == k && !beats(a._1, a._2, a._3, ss(n - 1), i1(n - 1), i2(n - 1))) return buf
      var pos = n
      while (pos > 0 && beats(a._1, a._2, a._3, ss(pos - 1), i1(pos - 1), i2(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val n1 = new Array[Long](m); val n2 = new Array[Long](m)
      System.arraycopy(ss, 0, ns, 0, pos)
      System.arraycopy(i1, 0, n1, 0, pos)
      System.arraycopy(i2, 0, n2, 0, pos)
      if (pos < m) { ns(pos) = a._1; n1(pos) = a._2; n2(pos) = a._3 }
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(ss, pos, ns, pos + 1, tail)
        System.arraycopy(i1, pos, n1, pos + 1, tail)
        System.arraycopy(i2, pos, n2, pos + 1, tail)
      }
      (ns, n1, n2)
    }

    override def merge(b1: (Array[Double], Array[Long], Array[Long]),
                       b2: (Array[Double], Array[Long], Array[Long])): (Array[Double], Array[Long], Array[Long]) = {
      var acc = b1
      var i = 0
      while (i < b2._1.length) { acc = reduce(acc, (b2._1(i), b2._2(i), b2._3(i))); i += 1 }
      acc
    }

    override def finish(b: (Array[Double], Array[Long], Array[Long])): Seq[(Double, Long, Long)] = {
      val out = new Array[(Double, Long, Long)](b._1.length)
      var i = 0
      while (i < out.length) { out(i) = (b._1(i), b._2(i), b._3(i)); i += 1 }
      out.toSeq
    }

    override def bufferEncoder: Encoder[(Array[Double], Array[Long], Array[Long])] =
      ExpressionEncoder[(Array[Double], Array[Long], Array[Long])]()
    override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
      ExpressionEncoder[Seq[(Double, Long, Long)]]()
  }

  /** Column form: `topKPair(k)(scoreCol, id1Col, id2Col)`. */
  def topKPair(k: Int): (Column, Column, Column) => Column = {
    val fn = udaf(new TopKPairAgg(k), ExpressionEncoder[(Double, Long, Long)]())
    (s, a, b) => fn(s, a, b)
  }

  /** Column form: `countMin(d, w)(idxsCol)` over `array<int>` rows. */
  def countMin(d: Int, w: Int): Column => Column = {
    val fn = udaf(new CountMinAgg(d, w), ExpressionEncoder[Seq[Int]]())
    c => fn(c)
  }

  /** Column form: `minhash(k)(hashesCol)` over `array<bigint>` rows. */
  def minhash(k: Int): Column => Column = {
    val fn = udaf(new MinHashAgg(k), ExpressionEncoder[Seq[Long]]())
    c => fn(c)
  }

  /** Column form: `simhash(hashCol)` over `bigint` rows. */
  val simhash: Column => Column = {
    val fn = udaf(new SimHashAgg, ExpressionEncoder[Long]())
    c => fn(c)
  }

  /** Bloom filter: fixed `numBits`-bit set as a long-word array, k bit
    * positions per key by double hashing pos_i = h1 + i·h2 (mod
    * numBits; h2 forced odd upstream so the probe sequence never
    * degenerates). Input rows are precomputed (h1, h2) hash pairs,
    * already reduced mod numBits by the caller — position arithmetic is
    * overflow-free by construction, so `floorMod` here and Spark `pmod`
    * on the probe side agree bit-for-bit (ANSI mode forbids relying on
    * wrap-around). Merge is word-wise OR: commutative,
    * associative, fixed-size — the partial/final and spill rules apply
    * untouched. No false negatives ever; false-positive rate set by
    * numBits/k vs the insert count (BloomSpec pins both properties). */
  class BloomAgg(numBits: Int, k: Int) extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h._1 + i.toLong * h._2, numBits.toLong).toInt
        b(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `bloom(numBits, k)(h1Col, h2Col)`. */
  def bloom(numBits: Int, k: Int): (Column, Column) => Column = {
    val fn = udaf(new BloomAgg(numBits, k), ExpressionEncoder[(Long, Long)]())
    (h1, h2) => fn(h1, h2)
  }
}
