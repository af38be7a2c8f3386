package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch expressions for near-duplicate detection (SURVEY tier-B;
  * generalizes the reference's keyed exact dedup,
  * publish_to_catalog.py:93-124, to fuzzy matching at scale).
  *
  * Both read `ArrayData` in place and compute the full sketch in ONE
  * pass over the tokens — the composable-built-in alternative
  * (`transform` + `array_min` per hash function) re-walks the token
  * array k times through interpreted lambdas. CodegenFallback is
  * acceptable here: the per-row cost is dominated by the hash loop
  * itself, which is a tight JVM loop either way, and sketching is a
  * once-per-document cost, not a per-pair cost.
  */

/** `minhash(tokens, k)` → array<bigint> of k minimum hash values.
  *
  * Uses Kirsch–Mitzenmacher double hashing: two real xxhash64 passes
  * per token (seeds 0 and 1), then h_i = h1 + i·h2 — O(tokens·(2 hashes
  * + k adds)) instead of O(tokens·k hashes), which matters because
  * sketching is the map-side cost paid on every document of the corpus.
  *
  * Null input → null; empty token array → null (a doc with no shingles
  * has no meaningful signature and must not collide with everything).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
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
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h1 = XxHash64Function.hash(s, StringType, 0L)
        val h2 = XxHash64Function.hash(s, StringType, 1L) | 1L // odd → full period
        var v = h1
        var h = 0
        while (h < numHashes) {
          if (v < mins(h)) mins(h) = v
          v += h2
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash(tokens)` → 64-bit SimHash as bigint: per-token xxhash64,
  * each bit votes ±1, sign of the tally sets the output bit. Documents
  * with small Hamming distance between simhashes share most tokens.
  * Empty/null → null.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val tally = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XxHash64Function.hash(s, StringType, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hamming64(a, b)` → bit distance between two 64-bit sketches. */
object HashFunctions {
  def minhash(tokens: Column, numHashes: Int): Column =
    toColumn(MinHashSignature(toExpression(tokens), numHashes))
  def simhash(tokens: Column): Column =
    toColumn(SimHash64(toExpression(tokens)))
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}
