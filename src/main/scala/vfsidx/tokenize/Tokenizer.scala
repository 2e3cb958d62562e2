package vfsidx.tokenize

/** Tokenization for the full-text index.
  *
  * Two modes, matching the reference's two index kinds:
  *
  *  - '''code tokens''' — the primary mode for the source-code corpus
  *    (`input_hint` schema): ASCII identifier/number words, lowercased.
  *    Divergence from the reference documented in SURVEY.md §7.4(4): the
  *    reference silently drops strings shorter than 3 runes
  *    (/root/reference/util.go:65-67); we index 1-2 char identifiers as whole
  *    terms (they are real code tokens: `i`, `fn`, `db`).
  *
  *  - '''trigram keys''' — exact functional parity with the reference's
  *    48-bit rune-trigram encoding `EncodeTri`/`DecodeTri`
  *    (/root/reference/util.go:60-83): sliding window of 3 Unicode code
  *    points, each packed as 4 hex digits. Pinned against the reference's own
  *    test vectors (/root/reference/vfsindex_internal_test.go:707-718,
  *    /root/reference/vfsindex_test.go:305-312) in TokenizerSpec.
  *
  * Pure functions (no Spark deps) so Catalyst-planned typed transforms
  * (`Dataset.flatMap`) can call them from codegen'd stages.
  */
object Tokenizer {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Extract the lowercased [i, j) token. Avoids substring+toLowerCase
    * double allocation when the run is already lowercase (the common case
    * in code). Hand-rolled scanner instead of a Regex: tokenization runs on
    * every byte of a 100 TB corpus, and Matcher/boxing allocation rates
    * saturate memory bandwidth long before the CPUs are busy. */
  @inline private def tokenAt(content: String, i: Int, j: Int): String = {
    var k = i
    var upper = false
    while (k < j && !upper) { val c = content.charAt(k); upper = c >= 'A' && c <= 'Z'; k += 1 }
    if (!upper) content.substring(i, j)
    else {
      val arr = new Array[Char](j - i)
      var p = i
      while (p < j) {
        val c = content.charAt(p)
        arr(p - i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        p += 1
      }
      new String(arr)
    }
  }

  @inline private def scan(content: String)(emit: String => Unit): Unit = {
    var i = 0
    val n = content.length
    while (i < n) {
      if (isWordChar(content.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(content.charAt(j))) j += 1
        emit(tokenAt(content, i, j))
        i = j
      } else i += 1
    }
  }

  /** Lowercased identifier/number tokens of a source-code document. */
  def codeTokens(content: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    scan(content)(b += _)
    b.result()
  }

  /** (term -> tf) entries plus document length (total token count). */
  def termFreqs(content: String): (java.util.HashMap[String, Int], Int) = {
    val m = new java.util.HashMap[String, Int]()
    var dl = 0
    scan(content) { t =>
      dl += 1
      m.put(t, m.getOrDefault(t, 0) + 1)
    }
    (m, dl)
  }

  /** Reference-parity trigram encoding: 3 code points -> hex string
    * "%04x%04x%04x" (/root/reference/util.go:60-74). Strings shorter than 3
    * code points yield an empty result (the reference's silent-drop rule,
    * pinned by /root/reference/vfsindex_test.go:149-159). */
  def encodeTri(s: String): Seq[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) Seq.empty
    else (0 to cps.length - 3).map(i => f"${cps(i)}%04x${cps(i + 1)}%04x${cps(i + 2)}%04x")
  }

  /** Trigram hex string -> 48-bit key (reference TriKeys,
    * /root/reference/search_cond.go:115-135). Keys longer than 12 hex digits
    * (supplementary-plane runes) are dropped, mirroring the reference's
    * ParseUint(16,64) failure path. */
  def triKeys(s: String): Seq[Long] =
    encodeTri(s).flatMap { hexs =>
      if (hexs.length > 16) None
      else Some(java.lang.Long.parseUnsignedLong(hexs, 16))
    }

  /** 48-bit key -> 12-hex-digit filename/key form (reference
    * /root/reference/util.go:88-90, `fmt.Sprintf("%012x", i)`). */
  def keyToHex(v: Long): String = f"$v%012x"

  /** Inverse of [[keyToHex]] (accepts any hex length the reference's
    * ParseUint(16,64) accepts). */
  def hexToKey(s: String): Long = java.lang.Long.parseUnsignedLong(s, 16)

  /** 48-bit key -> 3-rune string (reference DecodeTri,
    * /root/reference/util.go:76-83). */
  def decodeTri(v: Long): String = {
    val sb = new StringBuilder(3)
    var i = 4
    while (i > -1) {
      sb.append(((v >> (i * 8)) & 0xffff).toChar)
      i -= 2
    }
    sb.toString
  }

  /** Space-split then trigram keys (reference str2keys,
    * /root/reference/search_cond.go:538-545). */
  def str2keys(s: String): Seq[Long] =
    s.split(' ').toSeq.flatMap(triKeys)

  /** Distinct [[triKeys]] of a document, allocation-light: BMP-only windows
    * (the overwhelmingly common case) pack 3×16-bit code points directly —
    * identical to parsing the reference's "%04x%04x%04x" hex — and only
    * windows containing a supplementary-plane rune fall back to the string
    * encoding (where the reference's variable-width hex concat is NOT plain
    * bit-shifting). Parity with `triKeys(s).distinct` is property-tested.
    * This is the index-build hot path: it runs over every byte of the corpus. */
  /** Open-addressing primitive long set — the dedup structure of the
    * trigram-build hot loop. A boxed java.util.HashSet allocates one
    * java.lang.Long per insert (billions per build); this allocates two
    * arrays per DOCUMENT. Sentinel -1 is safe: trigram keys are never
    * negative (a 16-hex-digit key can only start with code point 0x100000+
    * whose hex starts "10", top nibble 1). */
  private final class LongSet(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
    private var mask = cap - 1
    private var table = {
      val t = new Array[Long](cap); java.util.Arrays.fill(t, -1L); t
    }
    private var size = 0
    def add(k: Long): Boolean = {
      var i = (java.lang.Long.hashCode(k) * 0x9e3779b9) & mask
      while (true) {
        val v = table(i)
        if (v == k) return false
        if (v == -1L) {
          table(i) = k
          size += 1
          if (size * 4 > cap * 3) grow()
          return true
        }
        i = (i + 1) & mask
      }
      false
    }
    private def grow(): Unit = {
      val old = table
      cap <<= 1; mask = cap - 1; size = 0
      table = new Array[Long](cap); java.util.Arrays.fill(table, -1L)
      var j = 0
      while (j < old.length) { if (old(j) != -1L) add(old(j)); j += 1 }
    }
  }

  def distinctTriKeys(s: String): Array[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) return Array.emptyLongArray
    val seen = new LongSet(math.min(cps.length, 1 << 15))
    val out = Array.newBuilder[Long]
    out.sizeHint(cps.length - 2)
    var i = 0
    while (i <= cps.length - 3) {
      val a = cps(i); val b = cps(i + 1); val c = cps(i + 2)
      if (a <= 0xffff && b <= 0xffff && c <= 0xffff) {
        val k = (a.toLong << 32) | (b.toLong << 16) | c.toLong
        if (seen.add(k)) out += k
      } else {
        val hexs = f"$a%04x$b%04x$c%04x"
        if (hexs.length <= 16) {
          val k = java.lang.Long.parseUnsignedLong(hexs, 16)
          if (seen.add(k)) out += k
        }
      }
      i += 1
    }
    out.result()
  }

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Word shingles for near-dup detection (n consecutive whitespace tokens).
    * Hot path of the MinHash/Jaccard dedup operators — the pattern is
    * compiled ONCE (String.split("\\s+") re-compiles the regex per row) and
    * each shingle builds through one StringBuilder instead of a
    * slice+mkString collection round-trip. Output identical. */
  def shingles(text: String, n: Int): Seq[String] = {
    val ws = Whitespace.split(text).filter(_.nonEmpty)
    if (ws.length < n) Seq.empty
    else {
      val out = new Array[String](ws.length - n + 1)
      var i = 0
      while (i <= ws.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }
}
