package vfsidx.build

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import vfsidx.codec.VarByte

/** Direct unit coverage for the SPIMI map-side machinery — the components
  * where a silent bug corrupts index CONTENTS rather than crashing: the
  * bounded-memory chunk driver, the LongListMap grow/order-break paths
  * (grow only triggers above ~45,875 distinct keys in one task, a scale no
  * integration spec reaches), and the range-split / group-pool helpers. */
class SpimiSpec extends AnyFunSuite {

  /** Decode every chunk back to (key, id) pairs. */
  private def decodeAll(chunks: Seq[(Long, Long, Long, Long, Int, Array[Byte])]): Seq[(Long, Long)] =
    chunks.flatMap { case (key, _, first, last, cnt, bytes) =>
      val ids = new Array[Long](cnt)
      VarByte.unpackIds(bytes, cnt, ids, 0)
      assert(ids.head == first && ids.last == last, s"chunk metadata mismatch for key $key")
      var i = 1
      while (i < cnt) { assert(ids(i - 1) < ids(i), "chunk ids not strictly ascending"); i += 1 }
      ids.map(key -> _).toSeq
    }

  test("chunkPartition: 50k distinct keys exercises LongListMap.grow without losing a posting") {
    // 50,000 distinct keys > the 0.7 * 2^16 grow threshold (~45,875)
    val input = (0 until 50000).map(k => (k.toLong * 131 + 7, k.toLong))
    val chunks = TrigramIndex.chunkPartition(input.iterator, preShardDocs = 1 << 20,
      flushPostings = Int.MaxValue).toSeq
    assert(decodeAll(chunks).sorted == input.sorted)
  }

  test("chunkPartition: order breaks (out-of-order file packing) cut chunks, lose nothing") {
    // two 'files' with disjoint doc ranges arriving high-range first: every
    // key's second id breaks monotonicity and must cut the first run
    val keys = (0L until 10L).toVector
    val fileB = keys.map(k => (k, 1000L + k)) // high range first
    val fileA = keys.map(k => (k, k))         // then low range
    val chunks = TrigramIndex.chunkPartition((fileB ++ fileA).iterator,
      preShardDocs = 1 << 20, flushPostings = Int.MaxValue).toSeq
    assert(chunks.size == 20, "each key should cut exactly two chunks")
    assert(decodeAll(chunks).sorted == (fileA ++ fileB).sorted)
  }

  test("chunkPartition: no chunk spans a pre_shard boundary; flushed partials stay exact") {
    val rng = new scala.util.Random(53)
    val input = Vector.tabulate(20000) { i =>
      (rng.nextInt(40).toLong, i.toLong) // 40 keys, ascending ids
    }
    val preShard = 1000L
    val chunks = TrigramIndex.chunkPartition(input.iterator, preShard,
      flushPostings = 500).toSeq // tiny flush bound -> many partial lists
    chunks.foreach { case (_, ps, first, last, _, _) =>
      assert(first / preShard == ps && last / preShard == ps,
        "chunk spans a pre_shard boundary")
    }
    assert(decodeAll(chunks).sorted == input.sorted)
  }

  test("chunks flushes on distinct-key count, not only postings count") {
    // a tail-heavy partition (millions of df=1 keys) must flush before the
    // postings bound: key-entry overhead, not posting count, is what OOMs
    final class Acc extends Spimi.Accumulator[(Long, Long), (Long, Int)] {
      val map = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
      var maxKeys = 0
      def add(kv: (Long, Long), out: ArrayBuffer[(Long, Int)]): Int = {
        map(kv._1) = map.getOrElse(kv._1, 0) + 1
        maxKeys = math.max(maxKeys, map.size)
        1
      }
      def flushAll(out: ArrayBuffer[(Long, Int)]): Unit = {
        map.foreach { case (k, c) => out += ((k, c)) }
        map.clear()
      }
      def keyCount: Int = map.size
    }
    val acc = new Acc
    val input = (0 until 100).map(i => (i.toLong, i.toLong))
    val chunks = Spimi.chunks(input.iterator, acc,
      flushPostings = Int.MaxValue, flushKeys = 8).toSeq
    assert(acc.maxKeys <= 8, s"accumulator held ${acc.maxKeys} keys past the flush bound")
    assert(chunks.map(_._2).sum == 100)
    assert(chunks.map(_._1).distinct.sorted == (0L until 100L))
  }

  test("chunk driver is lazy: chunks drain before the input is exhausted") {
    var consumed = 0
    val n = 10000
    val input = Iterator.tabulate(n) { i => consumed = i + 1; (i.toLong % 5, i.toLong) }
    val it = TrigramIndex.chunkPartition(input, preShardDocs = 1 << 20, flushPostings = 100)
    assert(it.hasNext)
    val consumedAtFirstChunk = consumed
    assert(consumedAtFirstChunk < n,
      "first chunk should be available after ~flushPostings inputs, not after the whole partition")
    val all = decodeAll(it.toSeq) // drain the rest
    assert(all.size == n && all.toSet == (0 until n).map(i => (i.toLong % 5, i.toLong)).toSet)
    assert(consumed == n)
  }

  test("splitByRange emits maximal runs with exact boundaries") {
    val ids = Array(0L, 1L, 9L, 10L, 11L, 25L, 99L, 100L)
    val out = ArrayBuffer.empty[(Int, Int, Long)]
    Spimi.splitByRange(ids, ids.length, 10L)((i, j, r) => out += ((i, j, r)))
    assert(out.toSeq == Seq((0, 3, 0L), (3, 5, 1L), (5, 6, 2L), (6, 7, 9L), (7, 8, 10L)))
    out.clear()
    Spimi.splitByRange(ids, 0, 10L)((i, j, r) => out += ((i, j, r)))
    assert(out.isEmpty)
  }

  test("mergeGroups pools consecutive equal groups and survives empty emissions") {
    val rows = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5), ("c", 6))
    val merged = Spimi.mergeGroups[(String, Int), String](
      rows.iterator, (x, y) => x._1 == y._1,
      g => if (g(0)._1 == "b") Nil // a group may legally emit nothing
      else List(s"${g(0)._1}:${g.map(_._2).sum}")).toSeq
    assert(merged == Seq("a:3", "c:15"))
    assert(Spimi.mergeGroups[Int, Int](Iterator.empty, (_, _) => true, _ => Nil).isEmpty)
  }

  test("chunk driver: empty input and all-emitting flush behave") {
    val none = TrigramIndex.chunkPartition(Iterator.empty, 1L << 20, 100)
    assert(!none.hasNext)
    intercept[NoSuchElementException](none.next())
  }

  test("observeBuckets: numeric key ordering above 2^48, totals, empty stream") {
    // keys straddling 2^48: hex widths 12 and 13+ — numeric ordering must
    // pick min/max by VALUE (a string compare would rank "1000000000000"
    // below "f00000000000")
    val rows = Seq(
      (0xf00000000000L, 3L, 10L),   // 12 hex digits
      (0x1000000000000L, 2L, 20L),  // 13 hex digits, numerically larger
      (0x000000000abcL, 5L, 30L))
    val acc = new Spimi.BucketStatsAcc
    val out = Spimi.observeBuckets(rows.iterator, acc)(
      _._1, (k: Long) => f"$k%012x", _._2, _._3).toList
    assert(out == rows.toList) // pass-through, order preserved
    val st = acc.value(org.apache.spark.TaskContext.getPartitionId())
    assert(st.first == "000000000abc")
    assert(st.last == "1000000000000")
    assert(st.nPostings == 10L && st.bytes == 60L)

    // empty stream registers nothing (matches the former groupBy(bucket))
    val acc2 = new Spimi.BucketStatsAcc
    assert(Spimi.observeBuckets(Iterator.empty[(Long, Long, Long)], acc2)(
      _._1, (k: Long) => f"$k%012x", _._2, _._3).isEmpty)
    assert(acc2.value.isEmpty)
  }

  test("BucketStatsAcc: keyed replacement, never additive (retry/speculation-safe)") {
    val acc = new Spimi.BucketStatsAcc
    acc.add((3, Spimi.BucketStat("a", "z", 100L, 1000L)))
    // a speculative duplicate / stage-retry attempt re-puts the identical
    // deterministic value — the entry must replace, not accumulate
    acc.add((3, Spimi.BucketStat("a", "z", 100L, 1000L)))
    assert(acc.value == Map(3 -> Spimi.BucketStat("a", "z", 100L, 1000L)))
    // driver-side merge of task copies is also keyed replacement
    val other = new Spimi.BucketStatsAcc
    other.add((3, Spimi.BucketStat("a", "z", 100L, 1000L)))
    other.add((4, Spimi.BucketStat("b", "c", 1L, 2L)))
    acc.merge(other)
    assert(acc.value.keySet == Set(3, 4))
    assert(acc.value(3).nPostings == 100L)
  }
}
