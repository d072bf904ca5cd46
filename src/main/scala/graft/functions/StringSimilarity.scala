package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
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

/** Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner, the
  * `da[]`-alphabet form) as a native codegen expression — edit distance
  * where a transposition of ADJACENT characters costs 1 instead of 2,
  * the variant that prices real keyboard typos correctly ("marhta" is
  * 1 edit from "martha", not 2). Spark ships only plain `levenshtein`;
  * DuckDB's `damerau_levenshtein` is the same unrestricted algorithm
  * (probe: CA→ABC = 2, not OSA's 3), and the output is an exact integer
  * — zero float-divergence surface. Byte-level like [[JaroWinkler]];
  * O(l1·l2) time/space per pair, so intended for NAME-length strings
  * (the ER tier), not documents.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "damerau_levenshtein"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // (l1+2) × (l2+2) DP with the sentinel row/col at index 0
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256) // last DP row each byte was seen at
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k = da(b(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(a(i - 1) & 0xFF) = i
      i += 1
    }
    d(l1 + 1)(l2 + 1)
  }
}

/** American Soundex phonetic code as a native codegen expression — the
  * classic blocking key of the entity-resolution tier (er1's n-gram
  * blocking catches typos; Soundex catches HOMOPHONE variants — Smith /
  * Smyth — that share no grams). Same inlining story as [[JaroWinkler]]:
  * a `UnaryExpression` whose codegen is one static call.
  *
  * Contract (mirrored letter-for-letter by the SQL oracle, which
  * re-implements the scan with `translate` + one last-non-transparent
  * window):
  *  - uppercase, strip non-A–Z; empty after stripping → NULL;
  *  - letter→digit map `01230129022455012623019202` (A..Z; H/W = the
  *    transparent marker 9);
  *  - emit a digit when it is 1–6 AND differs from the digit of the
  *    LAST non-H/W letter seen (so same-code letters across H/W
  *    collapse, across a vowel they repeat — the full Ashcraft→A261
  *    rule, not the lossy variant);
  *  - first letter kept verbatim, digits truncated/zero-padded to 3.
  */
case class Soundex4(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "soundex4"
  // letterless input codes to NULL even when the child is non-null
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any): Any =
    Soundex4.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // compute() returns null on letterless input, so codegen must
    // re-check for null after the call (defineCodeGen assumes non-null)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.Soundex4.compute($c);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Soundex4 {

  private val codes = "01230129022455012623019202"

  /** See the case-class scaladoc for the exact contract. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString.toUpperCase
    val sb = new java.lang.StringBuilder(4)
    var prev = ' '
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= 'A' && ch <= 'Z') {
        val d = codes.charAt(ch - 'A')
        if (sb.length == 0) {
          sb.append(ch)
          prev = d
        } else {
          if (d >= '1' && d <= '6' && d != prev && sb.length < 4)
            sb.append(d)
          if (d != '9') prev = d
        }
      }
      i += 1
    }
    if (sb.length == 0) return null
    while (sb.length < 4) sb.append('0')
    UTF8String.fromString(sb.toString)
  }
}

/** Column-level entry points for the string-similarity expressions. */
object StringSimilarity {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expr(a), ColumnBridge.expr(b)))
  def damerauLevenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(
      DamerauLevenshtein(ColumnBridge.expr(a), ColumnBridge.expr(b)))
  def soundex4(c: Column): Column =
    ColumnBridge.column(Soundex4(ColumnBridge.expr(c)))
}
