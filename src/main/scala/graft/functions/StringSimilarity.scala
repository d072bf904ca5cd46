package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression.
  *
  * Spark ships `levenshtein` but no Jaro–Winkler, the standard
  * name/address comparator of the entity-resolution tier (er1/er2 use
  * token and edit distances; JW is the classic complement that rewards
  * shared prefixes — exactly how real-world name typos behave). A Scala
  * UDF would black-box the hot per-pair loop; this is a plain
  * `BinaryExpression` whose codegen emits one static call, so it inlines
  * into whole-stage codegen like the built-in string functions.
  *
  * The arithmetic deliberately BIT-MIRRORS the RapidFuzz reference
  * implementation (the one DuckDB embeds for `jaro_winkler_similarity`),
  * so the DuckDB oracle hash-matches on raw doubles with no
  * quantization:
  *  - operates on UTF-8 BYTES (ASCII fixtures: identical to chars);
  *  - the SECOND string drives the match scan into the first's
  *    ±(max(l1,l2)/2 − 1) window, first-unflagged-wins;
  *  - transpositions = in-order flagged mismatches, integer-HALVED
  *    (`half / 2`, floor) before entering the float tree;
  *  - sim = ((m/l1 + m/l2) + (m−t)/m) / 3, summed in that order;
  *  - Winkler boost `+ prefix·0.1·(1−sim)` (prefix ≤ 4) only when
  *    sim > 0.7 — RapidFuzz's threshold semantics;
  *  - either side empty → 0.0 (both-empty included, matching DuckDB).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** See the case-class scaladoc for the exact RapidFuzz contract this
    * mirrors. O(l2 · window) time, two small boolean scratch arrays. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes // P — the flagged side
    val b = ub.getBytes // T — the scanning side
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val mx = math.max(l1, l2)
    val bound = if (mx > 1) mx / 2 - 1 else 0
    val af = new Array[Boolean](l1)
    val bf = new Array[Boolean](l2)
    var m = 0
    var j = 0
    while (j < l2) {
      val lo = math.max(0, j - bound)
      val hi = math.min(l1 - 1, j + bound)
      var i = lo
      var found = false
      while (i <= hi && !found) {
        if (!af(i) && a(i) == b(j)) {
          af(i) = true; bf(j) = true; m += 1; found = true
        }
        i += 1
      }
      j += 1
    }
    if (m == 0) return 0.0
    // in-order flagged mismatches, then integer-halved — RapidFuzz floors
    // the half-transposition count before it ever becomes a double
    var half = 0
    var ip = 0
    j = 0
    while (j < l2) {
      if (bf(j)) {
        while (!af(ip)) ip += 1
        if (a(ip) != b(j)) half += 1
        ip += 1
      }
      j += 1
    }
    val t = half / 2
    var sim = m.toDouble / l1.toDouble
    sim += m.toDouble / l2.toDouble
    sim += (m.toDouble - t.toDouble) / m.toDouble
    sim /= 3.0
    if (sim > 0.7) {
      var p = 0
      val maxP = math.min(math.min(l1, l2), 4)
      while (p < maxP && a(p) == b(p)) p += 1
      sim += p.toDouble * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Column-level entry points for the string-similarity expressions. */
object StringSimilarity {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expr(a), ColumnBridge.expr(b)))
}
