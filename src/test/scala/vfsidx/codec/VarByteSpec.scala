package vfsidx.codec

import org.scalatest.funsuite.AnyFunSuite

class VarByteSpec extends AnyFunSuite {

  /** Deterministic seeded property loop (scalatestplus bridge is not on the
    * offline classpath; a fixed seed is also more reproducible). */
  private def randomPostings(rng: scala.util.Random): (Array[Long], Array[Int], Array[Int]) = {
    val n = rng.nextInt(1000)
    val ids = new Array[Long](n)
    val tfs = new Array[Int](n)
    val dls = new Array[Int](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev += 1 + rng.nextInt(1 << 20)
      ids(i) = prev
      tfs(i) = 1 + rng.nextInt(500)
      dls(i) = 1 + rng.nextInt(10000)
      i += 1
    }
    (ids, tfs, dls)
  }

  test("decode(encode(xs)) == xs for 200 random sorted posting lists") {
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val (ids, tfs, dls) = randomPostings(rng)
      val enc = VarByte.encode(ids, tfs, dls, avgdl = 100.0)
      val (i2, t2, d2) = VarByte.decode(enc.bytes, enc.count)
      assert(i2.toSeq == ids.toSeq)
      assert(t2.toSeq == tfs.toSeq)
      assert(d2.toSeq == dls.toSeq)
    }
  }

  test("per-block decode reproduces full decode") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 100) {
      val (ids, tfs, dls) = randomPostings(rng)
      val enc = VarByte.encode(ids, tfs, dls, avgdl = 100.0)
      val all = enc.blocks.zipWithIndex.flatMap { case (b, bi) =>
        val cnt = VarByte.blockCount(enc.count, bi)
        val (i2, _, _) = VarByte.decodeBlock(enc.bytes, b.offset, cnt)
        i2
      }
      assert(all.toSeq == ids.toSeq)
    }
  }

  test("block metadata covers exactly the docs of the block") {
    val ids = (1L to 300L).toArray
    val tfs = Array.fill(300)(2)
    val dls = Array.fill(300)(50)
    val enc = VarByte.encode(ids, tfs, dls, avgdl = 50.0)
    assert(enc.blocks.length == 3) // 128 + 128 + 44
    assert(enc.blocks(0).firstDoc == 1L && enc.blocks(0).lastDoc == 128L)
    assert(enc.blocks(1).firstDoc == 129L && enc.blocks(1).lastDoc == 256L)
    assert(enc.blocks(2).firstDoc == 257L && enc.blocks(2).lastDoc == 300L)
    val norm = VarByte.bm25Norm(2, 50, 50.0, 1.2, 0.75).toFloat
    assert(enc.blocks.forall(b => math.abs(b.maxNorm - norm) < 1e-6))
  }

  test("block max-norm upper-bounds every posting in the block") {
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val (ids, tfs, dls) = randomPostings(rng)
      val enc = VarByte.encode(ids, tfs, dls, avgdl = 500.0)
      enc.blocks.zipWithIndex.foreach { case (b, bi) =>
        val cnt = VarByte.blockCount(enc.count, bi)
        val (_, t2, d2) = VarByte.decodeBlock(enc.bytes, b.offset, cnt)
        var i = 0
        while (i < cnt) {
          assert(VarByte.bm25Norm(t2(i), d2(i), 500.0, 1.2, 0.75) <= b.maxNorm + 1e-6)
          i += 1
        }
      }
    }
  }

  test("empty list encodes to empty") {
    val enc = VarByte.encode(Array.empty, Array.empty, Array.empty, 1.0)
    assert(enc.bytes.isEmpty && enc.blocks.isEmpty && enc.count == 0)
  }

  test("packIds/unpackIds round-trip, including sub-range windows") {
    val rng = new scala.util.Random(31)
    for (_ <- 0 until 200) {
      val (ids, _, _) = randomPostings(rng)
      if (ids.nonEmpty) {
        val from = rng.nextInt(ids.length)
        val until = from + 1 + rng.nextInt(ids.length - from)
        val bytes = VarByte.packIds(ids, from, until)
        val dst = new Array[Long](until - from + 3)
        VarByte.unpackIds(bytes, until - from, dst, 3)
        assert(dst.slice(3, 3 + until - from).toSeq == ids.slice(from, until).toSeq)
      }
    }
    assert(VarByte.packIds(Array(5L, 9L), 1, 1).isEmpty)
  }

  test("packPostings/unpackPostings round-trip parallel arrays, including windows") {
    val rng = new scala.util.Random(37)
    for (_ <- 0 until 200) {
      val (ids, tfs, dls) = randomPostings(rng)
      if (ids.nonEmpty) {
        val from = rng.nextInt(ids.length)
        val until = from + 1 + rng.nextInt(ids.length - from)
        val n = until - from
        val bytes = VarByte.packPostings(ids, tfs, dls, from, until)
        val (di, dt, dd) = (new Array[Long](n + 2), new Array[Int](n + 2), new Array[Int](n + 2))
        VarByte.unpackPostings(bytes, n, di, dt, dd, 2)
        assert(di.slice(2, 2 + n).toSeq == ids.slice(from, until).toSeq)
        assert(dt.slice(2, 2 + n).toSeq == tfs.slice(from, until).toSeq)
        assert(dd.slice(2, 2 + n).toSeq == dls.slice(from, until).toSeq)
      }
    }
  }

  test("sortPostings keeps parallel arrays aligned across both sort branches") {
    val rng = new scala.util.Random(41)
    // sizes straddle the insertion-sort cutoff (32) and go far past it so
    // the quicksort recursion + median-of-three pivoting actually runs
    for (n <- Seq(0, 1, 2, 31, 32, 33, 100, 1000, 50000)) {
      // distinct ids (one posting per (term, doc)), shuffled; tf/dl are
      // deterministic functions of the id so misalignment is detectable
      val ids = rng.shuffle((1L to n.toLong).map(_ * 7 + 3).toVector).toArray
      val tfs = ids.map(id => (id % 97).toInt + 1)
      val dls = ids.map(id => (id % 1009).toInt + 1)
      VarByte.sortPostings(ids, tfs, dls)
      var i = 0
      while (i < n) {
        if (i > 0) assert(ids(i - 1) < ids(i), s"not ascending at $i (n=$n)")
        assert(tfs(i) == (ids(i) % 97).toInt + 1, s"tf detached from id at $i (n=$n)")
        assert(dls(i) == (ids(i) % 1009).toInt + 1, s"dl detached from id at $i (n=$n)")
        i += 1
      }
    }
    // adversarial shapes for the pivot: already-sorted, reverse-sorted
    for (shape <- Seq((1L to 500L).toArray, (1L to 500L).reverse.toArray)) {
      val tfs = shape.map(id => (id % 13).toInt + 1)
      val dls = shape.map(id => (id % 17).toInt + 1)
      VarByte.sortPostings(shape, tfs, dls)
      assert(shape.toSeq == (1L to 500L))
      assert(shape.indices.forall(i => tfs(i) == (shape(i) % 13).toInt + 1))
    }
  }

  test("sortPostings stays within a tiny thread stack (O(log n) recursion depth)") {
    // a reduce group pools up to preShardDocs (~4.2M) postings whose ids are
    // concatenations of sorted runs — a pivot-adverse distribution must not
    // drive O(n) recursion depth. 2M elements under a 256 KB stack passes
    // only with the recurse-smaller / loop-larger scheme.
    val n = 2000000
    val ids = new Array[Long](n)
    // many ascending runs laid back-to-back (the real chunk-pool shape)
    val runLen = 1024
    var i = 0
    // distinct by construction: 2048 > n/runLen, so (a, b) -> a*2048 + b is injective
    while (i < n) { ids(i) = (i % runLen).toLong * 2048 + i / runLen + 1; i += 1 }
    val tfs = ids.map(id => (id % 7).toInt + 1)
    val dls = ids.map(id => (id % 11).toInt + 1)
    var failure: Option[Throwable] = None
    val t = new Thread(null, () => {
      try VarByte.sortPostings(ids, tfs, dls)
      catch { case e: Throwable => failure = Some(e) }
    }, "tiny-stack-sort", 256 * 1024)
    t.start(); t.join()
    assert(failure.isEmpty, s"sort failed under a 256 KB stack: $failure")
    var j = 1
    while (j < n) { assert(ids(j - 1) < ids(j)); j += 1 }
    assert(ids.indices.forall(k => tfs(k) == (ids(k) % 7).toInt + 1))
  }

  test("ids-only codec: per-block decode reproduces the list, blocks cover it") {
    val rng = new scala.util.Random(23)
    for (_ <- 0 until 200) {
      val (ids, _, _) = randomPostings(rng)
      val enc = VarByte.encodeIds(ids)
      assert(enc.blockFirst.length == enc.blockOff.length)
      assert(enc.blockLast.length == enc.blockOff.length)
      val all = enc.blockOff.indices.flatMap { bi =>
        val cnt = VarByte.blockCount(enc.count, bi)
        val dec = VarByte.decodeIdsBlock(enc.bytes, enc.blockOff(bi), cnt)
        assert(dec.head == enc.blockFirst(bi) && dec.last == enc.blockLast(bi))
        dec
      }
      assert(all == ids.toSeq)
    }
    val empty = VarByte.encodeIds(Array.emptyLongArray)
    assert(empty.bytes.isEmpty && empty.count == 0 && empty.blockOff.isEmpty)
  }
}
