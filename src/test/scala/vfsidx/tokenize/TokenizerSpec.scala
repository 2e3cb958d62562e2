package vfsidx.tokenize

import org.scalatest.funsuite.AnyFunSuite

/** Trigram parity pinned against the reference's own test vectors:
  * /root/reference/vfsindex_internal_test.go:707-718 (Test_decodeTri),
  * /root/reference/vfsindex_test.go:305-312 (TestEncodeTri),
  * /root/reference/vfsindex_test.go:149-159 (<3-rune silent drop). */
class TokenizerSpec extends AnyFunSuite {

  test("encodeTri('好きな') == Seq(\"597d304d306a\") (reference Test_decodeTri)") {
    assert(Tokenizer.encodeTri("好きな") == Seq("597d304d306a"))
  }

  test("decodeTri round-trips the reference vector") {
    val k = Tokenizer.triKeys("好きな").head
    assert(k == java.lang.Long.parseLong("597d304d306a", 16))
    assert(Tokenizer.decodeTri(k) == "好きな")
  }

  test("encodeTri yields len(runes)-2 grams (reference TestEncodeTri)") {
    val s = "おはよう俺様の世界へwellcome"
    assert(Tokenizer.encodeTri(s).length == s.codePoints().count().toInt - 2)
  }

  test("strings shorter than 3 runes produce zero keys (reference drop rule)") {
    assert(Tokenizer.encodeTri("ab").isEmpty)
    assert(Tokenizer.triKeys("の").isEmpty)
    assert(Tokenizer.encodeTri("").isEmpty)
  }

  test("keyToHex pins the reference's %012x key form (F2) and round-trips") {
    val k = Tokenizer.triKeys("好きな").head
    assert(Tokenizer.keyToHex(k) == "597d304d306a")
    assert(Tokenizer.hexToKey(Tokenizer.keyToHex(k)) == k)
    assert(Tokenizer.keyToHex(0xffL) == "0000000000ff") // zero-padded to 12
  }

  test("str2keys splits on space then encodes (reference str2keys)") {
    assert(Tokenizer.str2keys("好きな の") == Tokenizer.triKeys("好きな"))
  }

  test("codeTokens extracts lowercased identifiers incl. 1-2 char tokens") {
    assert(Tokenizer.codeTokens("val x = Foo_bar(42); // コメント db.fn")
      == Seq("val", "x", "foo_bar", "42", "db", "fn"))
  }

  test("termFreqs counts tf and dl") {
    val (tfs, dl) = Tokenizer.termFreqs("a b a c a")
    assert(dl == 5 && tfs.get("a") == 3 && tfs.get("b") == 1)
  }

  test("shingles produce n-word windows") {
    assert(Tokenizer.shingles("a b c d", 3) == Seq("a b c", "b c d"))
    assert(Tokenizer.shingles("a b", 3).isEmpty)
  }
}
