package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Sketch expressions for near-duplicate detection (SURVEY tier-B;
  * generalizes the reference's keyed exact dedup,
  * publish_to_catalog.py:93-124, to fuzzy matching at scale).
  *
  * Both read `ArrayData` in place and compute the full sketch in ONE
  * pass over the tokens via [[ShingleKernels]] — the
  * composable-built-in alternative (`transform` + `array_min` per hash
  * function) re-walks the token array k times through interpreted
  * lambdas. `doGenCode` keeps them inside whole-stage codegen.
  */

/** `minhash(tokens, k)` → array<bigint> of k minhash values over a
  * string-token array (Kirsch–Mitzenmacher double hashing: two real
  * xxhash64 passes per token, then h_i = h1 + i·h2).
  * Null input → null; empty token array → null. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.minhashTokens(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = ${K.cls}.minhashTokens($c, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash(tokens)` → 64-bit SimHash as bigint: per-token xxhash64,
  * each bit votes ±1, sign of the tally sets the output bit. Documents
  * with small Hamming distance between simhashes share most tokens.
  * Empty/null → null. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // empty-check lives HERE, not via a sentinel: a real simhash can
    // take any 64-bit value, so no output value is safe to overload
    if (arr.numElements() == 0) null else java.lang.Long.valueOf(ShingleKernels.simhash(arr))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) { ${ev.isNull} = true; }
      else { ${ev.value} = ${K.cls}.simhash($c); }
    """)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

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
