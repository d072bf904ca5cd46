package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused signature kernels for the dedup pipelines.
  *
  * Round 2 computed MinHash/SimHash signatures via explode → md5 once per
  * shingle → groupBy(doc) with K min / 60 bit-sum aggregates: correct,
  * but it shuffles every (doc, shingle-hash) row twice (round-robin
  * spread + group exchange) purely to work around higher-order-function
  * limits (CodegenFallback, captured subtrees re-evaluated per element —
  * measured in round 1). With the per-shingle hash now a fused expression
  * ([[Md5Prefix60]]), the remaining obstacle is the K-pass reduction —
  * which these kernels do in ONE loop over the hash array per document.
  * Signature computation becomes a narrow per-row projection: no explode,
  * no shuffle, embarrassingly parallel at 100 TB (LSH band buckets are
  * then the only exchange in the whole near-dup pipeline).
  *
  * The math is unchanged from the aggregate formulation, so the DuckDB
  * oracles (affine min over the base hash / per-bit majority vote)
  * still hash-match bit for bit.
  */

/** sig_j = min over hashes h of (a_j·h + b_j) mod p, j < numHashes —
  * the affine MinHash family over one md5-derived base hash
  * ([[graft.operators.Dedup.MinhashPrime]]; constants small enough that
  * a_j·h stays in a 64-bit long). */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  protected override def nullSafeEval(h: Any): Any =
    new GenericArrayData(
      MinhashSignature.compute(h.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinhashSignature.compute($c, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object MinhashSignature {
  val Prime = 2147483647L // 2^31 - 1
  def affineA(j: Int): Long = (j + 1L) * 1000003L
  def affineB(j: Int): Long = j * 999983L

  /** One pass over the hash array, k running minima. Inputs are reduced
    * into [0, Prime) here rather than assumed pre-reduced: a full-width
    * 60-bit hash would overflow `affineA(j) * h` into negative signature
    * entries, and the [[graft.operators.Dedup.baseHash]] precondition is
    * not enforceable on an arbitrary Array[Long] column. For already-
    * reduced inputs the `%` is a no-op, so existing signatures (and their
    * oracles) are bit-identical. */
  def compute(hashes: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      var h = hashes.getLong(i) % Prime
      if (h < 0) h += Prime
      var j = 0
      while (j < k) {
        val v = (affineA(j) * h + affineB(j)) % Prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}

/** 60-bit SimHash from an array of 60-bit shingle hashes: bit j of the
  * signature is set when more than half the hashes have bit j set. */
case class SimhashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_signature"

  protected override def nullSafeEval(h: Any): Any =
    SimhashSignature.compute(h.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimhashSignature.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object SimhashSignature {
  val Bits = 60

  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < Bits) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (2 * counts(j) > n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Winnowing (Schleimer–Wilkerson–Aiken) fingerprint selection as ONE
  * fused per-row kernel: hash every `k`-char gram of the (already
  * normalized) text with [[Md5Hash.prefix60]], take the minimum of each
  * `w`-gram window (tail windows shrink), and return the
  * first-occurrence-ordered distinct minima.
  *
  * This replaces the round-13 zip-slice formulation in
  * [[graft.operators.Dedup.winnowFingerprints]] — a
  * `transform(sequence(...), md5…)` gram pass plus a w−1-step
  * `zip_with(…, least)` chain. Higher-order functions are
  * CodegenFallback and re-enter interpreted Catalyst eval per array
  * ELEMENT (plus one array allocation per zip_with step); the driver's
  * round-13 bench billed that interpretation at ~11% on dd12 and pipe2.
  * Here the whole selection is one compiled loop per document: grams are
  * hashed once, the rolling minimum is computed in place, and duplicates
  * never leave the row. Gram/window/dedup semantics are bit-identical to
  * the chain (same `substr`, same md5 prefix, `least`-skips-null tail
  * shrink, `array_distinct` first-occurrence order), so the DuckDB
  * winnow oracles still hash-match. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"need k, w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  protected override def nullSafeEval(t: Any): Any =
    new GenericArrayData(WinnowFingerprints.compute(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowFingerprints.compute($c, $k, $w))")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object WinnowFingerprints {
  /** Distinct rolling-window minima of the k-gram hash sequence.
    * Matches the zip-slice chain exactly:
    *  - nGrams = max(numChars − (k−1), 1): strings shorter than one gram
    *    contribute their whole text as the single gram (`substr`
    *    truncates at the end in Spark and DuckDB alike);
    *  - window j (0-based, j < nWins = max(nGrams − (w−1), 1)) is
    *    min(h[j .. min(j+w, nGrams)−1]) — the chain's null-padded
    *    `least` makes tail windows shrink the same way;
    *  - output keeps first-occurrence order (array_distinct's rule). */
  def compute(t: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int)
  : Array[Long] = {
    val nGrams = math.max(t.numChars() - (k - 1), 1)
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      h(i) = Md5Hash.prefix60(t.substringSQL(i + 1, k))
      i += 1
    }
    val nWins = math.max(nGrams - (w - 1), 1)
    val seen = new java.util.HashSet[Long](math.min(nWins, 64))
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var j = 0
    while (j < nWins) {
      var m = h(j)
      var x = j + 1
      val end = math.min(j + w, nGrams)
      while (x < end) { if (h(x) < m) m = h(x); x += 1 }
      if (seen.add(m)) out += m
      j += 1
    }
    out.result()
  }
}

object SignatureExpressions {
  /** Fused MinHash signature of an Array[Long] base-hash column. */
  def minhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinhashSignature(ColumnBridge.expr(hashes), numHashes))

  /** Fused 60-bit SimHash of an Array[Long] hash column. */
  def simhashSig(hashes: Column): Column =
    ColumnBridge.column(SimhashSignature(ColumnBridge.expr(hashes)))

  /** Fused winnowing fingerprint selection over a normalized-text
    * column: distinct w-window k-gram-hash minima, first-occurrence
    * order. NULL text yields NULL (callers keep the chain's
    * one-null-fp-row contract explicitly — see
    * [[graft.operators.Dedup.winnowFingerprints]]). */
  def winnowFps(normalizedText: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expr(normalizedText), k, w))
}
