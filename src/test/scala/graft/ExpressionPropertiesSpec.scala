package graft

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, IndelRatio, MinHashSigs, SimHash32, ZValue}

/** Property-based checks of the custom expressions' static kernels against
  * independently re-derived reference implementations (full-matrix DP,
  * DigestUtils-based hashing) over randomized inputs — unicode (including
  * astral-plane code points), empty strings, and null array elements
  * included. Pure JVM, no Spark session. */
class ExpressionPropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // token pool: ascii, accented (2-byte utf8), CJK (3-byte), astral (4-byte)
  private val tokenGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "xy", " ", "é", "漢", new String(Character.toChars(0x1F600)))
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString)

  private def utf8Array(words: Seq[Option[String]]): GenericArrayData =
    new GenericArrayData(words.map {
      case Some(s) => UTF8String.fromString(s)
      case None => null
    }.toArray[Any])

  private val wordGen: Gen[Option[String]] =
    Gen.frequency(8 -> strGen.map(Some(_)), 1 -> Gen.const(None))
  private val wordsGen: Gen[List[Option[String]]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, wordGen))

  // --- IndelRatio vs full-matrix LCS DP over code points ---------------

  private def refRatio(s1: String, s2: String): Double = {
    val a = s1.codePoints().toArray
    val b = s2.codePoints().toArray
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    val total = a.length + b.length
    if (total == 0) 100.0
    else 100.0 * (1.0 - (total - 2 * dp(a.length)(b.length)).toDouble / total)
  }

  test("indel_ratio == full-matrix LCS reference; symmetric; bounded") {
    check("ref equality", Prop.forAll(strGen, strGen) { (s1, s2) =>
      math.abs(IndelRatio.ratio(s1, s2) - refRatio(s1, s2)) < 1e-12
    })
    check("symmetry", Prop.forAll(strGen, strGen) { (s1, s2) =>
      IndelRatio.ratio(s1, s2) == IndelRatio.ratio(s2, s1)
    })
    check("identity and bounds", Prop.forAll(strGen) { s =>
      val r = IndelRatio.ratio(s, s)
      r == 100.0 && IndelRatio.ratio(s, s.reverse) >= 0.0
    })
  }

  // --- MinHashSigs vs DigestUtils md5-hex reference --------------------

  private def refMinhash(words: Seq[Option[String]]): Seq[String] = {
    val shingles: Seq[String] =
      if (words.length >= 3)
        (0 to words.length - 3).map(i => words.slice(i, i + 3).flatten.mkString(" "))
      else Seq(words.flatten.mkString(" "))
    (0 until MinHashSigs.NumHashes).map(i =>
      shingles.map(sh => DigestUtils.md5Hex(s"$i|$sh")).min)
  }

  test("minhash_sigs == md5-hex reference on random word arrays") {
    check("minhash", Prop.forAll(wordsGen) { words =>
      val got = MinHashSigs.compute(utf8Array(words))
      (0 until MinHashSigs.NumHashes).forall(i =>
        got.getUTF8String(i).toString == refMinhash(words)(i))
    })
  }

  test("minhash_sigs: duplicated shingle windows never change the signature") {
    // appending a copy of the first 3 words re-creates existing shingles
    // plus boundary ones — min over a superset can only stay or shrink;
    // against the reference this is exact
    check("superset-min", Prop.forAll(wordsGen.suchThat(_.length >= 3)) { words =>
      val dup = words ++ words.take(3)
      val got = MinHashSigs.compute(utf8Array(dup))
      (0 until MinHashSigs.NumHashes).forall(i =>
        got.getUTF8String(i).toString == refMinhash(dup)(i))
    })
  }

  // --- SimHash32 vs per-word digest-bit reference ----------------------

  private def refSimhash(words: Seq[Option[String]]): Long = {
    val counts = new Array[Int](32)
    words.foreach {
      case Some(w) =>
        val hex = DigestUtils.md5Hex(w)
        var b = 0
        while (b < 32) {
          val digit = Integer.parseInt(hex.charAt(b / 4).toString, 16)
          counts(b) += 2 * ((digit >> (b % 4)) & 1) - 1
          b += 1
        }
      case None => ()
    }
    (0 until 32).map(b => if (counts(b) > 0) 1L << b else 0L).sum
  }

  test("simhash32 == digest-bit reference on random word arrays") {
    check("simhash", Prop.forAll(wordsGen) { words =>
      SimHash32.compute(utf8Array(words)) == refSimhash(words)
    })
  }

  // --- ZValue Morton interleave ----------------------------------------

  test("z_value: deinterleave inverts compute; result non-negative") {
    val dim = Gen.chooseNum(0L, 0x7FFFFFFFL)
    check("z roundtrip", Prop.forAll(dim, dim) { (x, y) =>
      val z = ZValue.compute(x, y)
      z >= 0L && ZValue.deinterleave(z) == ((x, y))
    })
    // high bits beyond 31 are masked, never smeared into the key
    check("z mask", Prop.forAll(dim, dim) { (x, y) =>
      ZValue.compute(x | (1L << 40), y) == ZValue.compute(x, y)
    })
  }

  // --- DotProduct vs sequential zip-sum --------------------------------

  test("dot_product == sequential sum, exactly (same accumulation order)") {
    val vecGen = Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3)))
    check("dot", Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n).toArray
      val b = b0.take(n).toArray
      val expected = {
        var s = 0.0; var i = 0
        while (i < n) { s += a(i) * b(i); i += 1 }
        s
      }
      DotProduct.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)) == expected
    })
  }

  // --- BloomMightContain: no false negatives, probe == build encoding --

  test("bloom_might_contain never yields a false negative (incl. unicode keys)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, StringType}
    import org.apache.spark.util.sketch.BloomFilter
    val setGen = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, strGen))
    check("no false negatives", Prop.forAll(setGen) { keys =>
      // build exactly as Decontam.overlapBloom ships it: putString side,
      // serialized bytes, probe through the expression's eval path
      val bf = BloomFilter.create(keys.size.toLong.max(1L), 0.01)
      keys.foreach(bf.putString)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val sketch = Literal(bos.toByteArray, BinaryType)
      keys.forall { k =>
        graft.functions.BloomMightContain(
          Literal.create(k, StringType), sketch).eval(null) == true
      }
    })
  }
}
