package vfsidx.codec

import java.io.ByteArrayOutputStream

/** Delta + variable-byte posting-list codec with block-max skip metadata.
  *
  * The reference (kazu/vfs-index) stores posting lists as FlatBuffers
  * `KeyRecord{key, [Record]}` sorted by key (/root/reference/spec/index.fbs:22-29,
  * /root/reference/index_file.go:1780-1808) and relies on zero-copy reads for
  * speed. Our Spark-native equivalent compresses each (term, shard) posting
  * list into one binary blob: docIDs are sorted, delta-encoded, and each
  * posting is written as three varints `(docIdGap, tf, dl)`. `dl` (document
  * length) rides along so BM25 can be scored straight off the blob without a
  * join against a doc-stats table — at 10^12-doc scale a doc-stats broadcast
  * is impossible and a shuffle join per query is wasteful.
  *
  * Block-max metadata (every [[BlockSize]] postings): last docID, byte offset,
  * and the block's maximum BM25 tf-normalization term
  * `tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))` — so query-time pruning can upper-
  * bound a block's score contribution by `idf * maxNorm` and skip decoding
  * blocks that cannot make top-k (block-max WAND).
  *
  * Pure JVM code, no Spark deps; property-tested (VarByteSpec).
  */
object VarByte {
  val BlockSize = 128

  /** Per-block skip entry: postings in the block end at `lastDoc`; the block's
    * bytes start at `offset` within the blob; `maxNorm` upper-bounds the BM25
    * tf-normalization of any posting in the block (for the avgdl the index was
    * built with); `firstDoc` allows doc-range intersection tests. */
  final case class Block(firstDoc: Long, lastDoc: Long, offset: Int, maxNorm: Float)

  final case class Encoded(bytes: Array[Byte], count: Int, blocks: Array[Block])

  @inline def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint must be non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** BM25 tf-normalization term (the score is idf * this). */
  @inline def bm25Norm(tf: Int, dl: Int, avgdl: Double, k1: Double, b: Double): Double =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  /** Encode postings sorted ascending by docId. tfs/dls parallel arrays. */
  def encode(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
             avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Encoded = {
    val n = docIds.length
    require(tfs.length == n && dls.length == n)
    val out = new ByteArrayOutputStream(n * 3)
    val blocks = Array.newBuilder[Block]
    var i = 0
    var prev = 0L
    var blockFirst = 0L
    var blockOff = 0
    var blockMax = 0.0
    while (i < n) {
      val d = docIds(i)
      require(d > prev || i == 0, s"docIds must be strictly ascending: $prev -> $d at $i")
      if (i % BlockSize == 0) {
        if (i > 0) blocks += Block(blockFirst, prev, blockOff, blockMax.toFloat)
        blockFirst = d
        blockOff = out.size()
        blockMax = 0.0
        // each block restarts delta from 0 so blocks decode independently
        prev = 0L
      }
      writeVarLong(out, d - prev)
      writeVarLong(out, tfs(i).toLong)
      writeVarLong(out, dls(i).toLong)
      val norm = bm25Norm(tfs(i), dls(i), avgdl, k1, b)
      if (norm > blockMax) blockMax = norm
      prev = d
      i += 1
    }
    if (n > 0) blocks += Block(blockFirst, prev, blockOff, blockMax.toFloat)
    Encoded(out.toByteArray, n, blocks.result())
  }

  /** Decode the whole blob into parallel arrays (docIds, tfs, dls). */
  def decode(bytes: Array[Byte], count: Int): (Array[Long], Array[Int], Array[Int]) = {
    val docIds = new Array[Long](count)
    val tfs = new Array[Int](count)
    val dls = new Array[Int](count)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      if (i % BlockSize == 0) prev = 0L
      var shift = 0; var v = 0L; var bb = 0
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      prev += v
      docIds(i) = prev
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      tfs(i) = v.toInt
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      dls(i) = v.toInt
      i += 1
    }
    (docIds, tfs, dls)
  }

  /** Decode a single block (blockIdx within the blob) given its byte offset
    * and the number of postings it holds. Used by the block-skipping query
    * path: blocks whose upper bound cannot beat the running top-k threshold
    * are never touched. */
  def decodeBlock(bytes: Array[Byte], offset: Int, count: Int): (Array[Long], Array[Int], Array[Int]) = {
    val docIds = new Array[Long](count)
    val tfs = new Array[Int](count)
    val dls = new Array[Int](count)
    var pos = offset
    var prev = 0L
    var i = 0
    while (i < count) {
      var shift = 0; var v = 0L; var bb = 0
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      prev += v
      docIds(i) = prev
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      tfs(i) = v.toInt
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      dls(i) = v.toInt
      i += 1
    }
    (docIds, tfs, dls)
  }

  /** Number of postings in block `blockIdx` for a blob of `count` postings. */
  @inline def blockCount(count: Int, blockIdx: Int): Int = {
    val start = blockIdx * BlockSize
    math.min(BlockSize, count - start)
  }

  // ---- ids-only variant (trigram / docs-that-contain-key postings) ----
  // The trigram index stores pure membership — no tf/dl/norm — so postings
  // are 1-2 bytes instead of 3+. Same block structure (delta restart per
  // block, [first,last] skip metadata) as the scored codec above.

  final case class EncodedIds(bytes: Array[Byte], count: Int,
                              blockFirst: Array[Long], blockLast: Array[Long],
                              blockOff: Array[Int])

  /** Encode a strictly-ascending docId list. */
  def encodeIds(docIds: Array[Long]): EncodedIds = {
    val n = docIds.length
    val out = new ByteArrayOutputStream(n * 2)
    val bf = Array.newBuilder[Long]
    val bl = Array.newBuilder[Long]
    val bo = Array.newBuilder[Int]
    var i = 0
    var prev = 0L
    var blockFirst = 0L
    while (i < n) {
      val d = docIds(i)
      require(d > prev || i == 0, s"docIds must be strictly ascending: $prev -> $d at $i")
      if (i % BlockSize == 0) {
        if (i > 0) { bf += blockFirst; bl += prev; }
        blockFirst = d
        bo += out.size()
        prev = 0L
      }
      writeVarLong(out, d - prev)
      prev = d
      i += 1
    }
    if (n > 0) { bf += blockFirst; bl += prev }
    EncodedIds(out.toByteArray, n, bf.result(), bl.result(), bo.result())
  }

  // ---- flat chunk packing (SPIMI map-side partial posting lists) ----
  // Chunks are TRANSIENT shuffle payload (map-side partial lists merged on
  // the reduce side into canonical blocked segments), so they carry no
  // block metadata: one flat delta-varint run, decoded whole.

  /** Pack ids[from, until) — strictly ascending — as flat delta varints. */
  def packIds(ids: Array[Long], from: Int, until: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream((until - from) * 2)
    var prev = 0L
    var i = from
    while (i < until) {
      val d = ids(i)
      require(d > prev || i == from, s"ids must be strictly ascending: $prev -> $d")
      writeVarLong(out, d - prev)
      prev = d
      i += 1
    }
    out.toByteArray
  }

  /** Unpack `count` flat delta-varint ids into dst[dstOff, dstOff+count). */
  def unpackIds(bytes: Array[Byte], count: Int, dst: Array[Long], dstOff: Int): Unit = {
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      var shift = 0; var v = 0L; var bb = 0
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      prev += v
      dst(dstOff + i) = prev
      i += 1
    }
  }

  /** Pack scored postings [from, until) — ids strictly ascending — as flat
    * (docIdGap, tf, dl) varint triples (SPIMI chunk payload). */
  def packPostings(ids: Array[Long], tfs: Array[Int], dls: Array[Int],
                   from: Int, until: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream((until - from) * 4)
    var prev = 0L
    var i = from
    while (i < until) {
      val d = ids(i)
      require(d > prev || i == from, s"ids must be strictly ascending: $prev -> $d")
      writeVarLong(out, d - prev)
      writeVarLong(out, tfs(i).toLong)
      writeVarLong(out, dls(i).toLong)
      prev = d
      i += 1
    }
    out.toByteArray
  }

  /** Unpack `count` packed postings into the dst arrays at dstOff. */
  def unpackPostings(bytes: Array[Byte], count: Int, dstIds: Array[Long],
                     dstTfs: Array[Int], dstDls: Array[Int], dstOff: Int): Unit = {
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      var shift = 0; var v = 0L; var bb = 0
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      prev += v
      dstIds(dstOff + i) = prev
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      dstTfs(dstOff + i) = v.toInt
      shift = 0; v = 0L
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      dstDls(dstOff + i) = v.toInt
      i += 1
    }
  }

  /** In-place quicksort of parallel (ids, tfs, dls) arrays by ids —
    * the reduce-side SPIMI merge pools chunks whose doc ranges may overlap
    * (scan partitions pack files out of doc order), and the JDK has no
    * primitive sort-by-key. Ids are distinct (one posting per (term, doc)),
    * so no equal-pivot pathologies arise. */
  def sortPostings(ids: Array[Long], tfs: Array[Int], dls: Array[Int]): Unit = {
    def swap(a: Int, b: Int): Unit = {
      val t0 = ids(a); ids(a) = ids(b); ids(b) = t0
      val t1 = tfs(a); tfs(a) = tfs(b); tfs(b) = t1
      val t2 = dls(a); dls(a) = dls(b); dls(b) = t2
    }
    def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val (ki, kt, kd) = (ids(i), tfs(i), dls(i))
        var j = i - 1
        while (j >= lo && ids(j) > ki) {
          ids(j + 1) = ids(j); tfs(j + 1) = tfs(j); dls(j + 1) = dls(j)
          j -= 1
        }
        ids(j + 1) = ki; tfs(j + 1) = kt; dls(j + 1) = kd
        i += 1
      }
    }
    // Recurse only into the SMALLER partition and loop on the larger:
    // stack depth is then O(log n) regardless of pivot quality. The pooled
    // ids are concatenations of sorted runs (not random), so a pivot-adverse
    // distribution over a multi-million-posting reduce group could otherwise
    // drive O(n) recursion depth and a StackOverflowError inside a task.
    def qs(lo0: Int, hi0: Int): Unit = {
      var lo = lo0
      var hi = hi0
      while (hi - lo >= 32) {
        val mid = lo + (hi - lo) / 2
        // median-of-three pivot
        if (ids(mid) < ids(lo)) swap(lo, mid)
        if (ids(hi) < ids(lo)) swap(lo, hi)
        if (ids(hi) < ids(mid)) swap(mid, hi)
        val pivot = ids(mid)
        var i = lo
        var j = hi
        while (i <= j) {
          while (ids(i) < pivot) i += 1
          while (ids(j) > pivot) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (j - lo < hi - i) { if (lo < j) qs(lo, j); lo = i }
        else { if (i < hi) qs(i, hi); hi = j }
      }
      if (lo < hi) insertion(lo, hi)
    }
    if (ids.length > 1) qs(0, ids.length - 1)
  }

  /** Decode one ids-only block at `offset` holding `count` postings. */
  def decodeIdsBlock(bytes: Array[Byte], offset: Int, count: Int): Array[Long] = {
    val docIds = new Array[Long](count)
    var pos = offset
    var prev = 0L
    var i = 0
    while (i < count) {
      var shift = 0; var v = 0L; var bb = 0
      do { bb = bytes(pos) & 0xff; pos += 1; v |= (bb & 0x7fL) << shift; shift += 7 } while ((bb & 0x80) != 0)
      prev += v
      docIds(i) = prev
      i += 1
    }
    docIds
  }
}
