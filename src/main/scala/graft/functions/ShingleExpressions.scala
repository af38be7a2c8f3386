package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing.
  *
  * The composable form (`transform(sequence(...), i => substring(s,i,n))`)
  * is O(len²) per document — `substring` re-scans from the string start
  * for every shingle because UTF-8 codepoint offsets aren't random
  * access — and allocates one UTF8String per shingle through an
  * interpreted lambda. Profiled at 13 s for 5 000 docs (sf0.1); these
  * expressions do one O(len) byte-offset sweep and hash shingle bytes
  * in place, no per-shingle allocation.
  */

private object ShingleUtil {
  /** Byte length of the UTF-8 codepoint starting at `b`. */
  @inline def cpLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else 4

  /** murmur3 fmix64 — cheap high-quality long mixer. */
  @inline def mix(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }
}

/** `shingle_hashes(text, n)` → array<bigint>: xxhash64 of every
  * n-codepoint sliding window. Docs shorter than n → empty array.
  * Normalization (lowercasing, whitespace collapse) is the caller's
  * job — those are codegen'd built-ins. */
case class ShingleHashes(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes // materialize once; offsets below are into this array
    val len = bytes.length
    // collect codepoint start offsets in one sweep
    var nCp = 0
    var i = 0
    val starts = new Array[Int](len + 1)
    while (i < len) {
      starts(nCp) = i
      i += ShingleUtil.cpLen(bytes(i))
      nCp += 1
    }
    starts(nCp) = len
    if (nCp < shingleLen) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nCp - shingleLen + 1)
    var w = 0
    while (w + shingleLen <= nCp) {
      val from = starts(w)
      val until = starts(w + shingleLen)
      out(w) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 0L)
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ngram_hashes(tokens, n)` → array<bigint>: order-sensitive combined
  * hash of every n consecutive tokens (polynomial combine of per-token
  * xxhash64 values — equality of combined hashes ⇔ equality of the
  * n-gram up to 64-bit collision). */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      th(i) = if (t == null) 0L
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 0L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    var w = 0
    while (w + n <= m) {
      var c = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < n) {
        c = ShingleUtil.mix(c ^ th(w + j)) + java.lang.Long.rotateLeft(c, 17)
        j += 1
      }
      out(w) = c
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_longs(hashes, k)` → array<bigint> minhash signature over a
  * pre-hashed shingle array (Kirsch–Mitzenmacher: h_i = h1 + i·h2 with
  * h1 = v, h2 = mix(v)|1). Empty → null (see MinHashSignature). */
case class MinHashFromLongs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h1 = arr.getLong(i)
      val h2 = ShingleUtil.mix(h1) | 1L
      var v = h1
      var h = 0
      while (h < numHashes) {
        if (v < mins(h)) mins(h) = v
        v += h2
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sorted_jaccard(a, b)` → exact Jaccard of two SORTED distinct
  * long arrays via a linear merge — O(|a|+|b|) with no per-pair hash
  * set, unlike `array_intersect`/`array_union`. This runs once per
  * candidate PAIR (not per doc), so it is the hot loop of every
  * verify stage. Inputs must be sorted ascending and duplicate-free
  * (as produced by `array_sort(array_distinct(...))`). */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 && ny == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (nx + ny - inter).toDouble)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `minhash_agreement(a, b)` → count of equal slots in two equal-length
  * minhash signatures; est. Jaccard = agreement / k. Runs once per
  * candidate pair, replacing an interpreted `aggregate(zip_with(...))`
  * lambda chain. Null on length mismatch. */
case class MinHashAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var i = 0; var eq = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    java.lang.Integer.valueOf(eq)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ShingleFunctions {
  def minhash_agreement(a: Column, b: Column): Column =
    toColumn(MinHashAgreement(toExpression(a), toExpression(b)))
  def shingle_hashes(text: Column, n: Int): Column =
    toColumn(ShingleHashes(toExpression(text), n))
  def ngram_hashes(tokens: Column, n: Int): Column =
    toColumn(NGramHashes(toExpression(tokens), n))
  def minhash_longs(hashes: Column, k: Int): Column =
    toColumn(MinHashFromLongs(toExpression(hashes), k))
  def sorted_jaccard(a: Column, b: Column): Column =
    toColumn(SortedLongJaccard(toExpression(a), toExpression(b)))
}
