package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — Jaro–Winkler string similarity as a native
  * Catalyst expression (Spark ships levenshtein but no Jaro family; the
  * record-linkage verb a dedup verify stage wants for short fields where
  * edit distance over-penalizes transpositions).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the
  * rapidfuzz definition), probed and spec-locked:
  *  - either side empty → 0.0 (NOT 1.0 — DuckDB's convention);
  *  - match window = max(len)/2 − 1 (floor, min 0), transpositions
  *    counted over matched sequences, t halved by integer division;
  *  - jaro = (m/len₁ + m/len₂ + (m−t)/m) / 3, accumulated in that
  *    textual order;
  *  - Winkler prefix bonus sim + 0.1·p·(1−sim) with p = common prefix
  *    capped at 4, applied only when jaro > 0.7 (the boost threshold —
  *    verified against DuckDB: prefix 1 at jaro 0.54 stays unboosted).
  * Positions count CODEPOINTS (not UTF-16 units), matching DuckDB's
  * codepoint iteration on non-ASCII input.
  *
  * Codegen emits one static call (JaroWinklerImpl.jw) so the expression
  * stays inside whole-stage codegen without inlining the two-pass
  * matching loop into every generated plan.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two STRING, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerImpl.jw($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain object (no companion class) so the Scala compiler emits a static
  * forwarder `JaroWinklerImpl.jw` that generated Java can call. */
object JaroWinklerImpl {
  def jw(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.toString.codePoints().toArray
    val s2 = u2.toString.codePoints().toArray
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(0, math.max(len1, len2) / 2 - 1)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val hi = math.min(len2 - 1, i + window)
      var j = math.max(0, i - window)
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val sim = (m.toDouble / len1 + m.toDouble / len2
      + (m - half).toDouble / m) / 3.0
    if (sim > 0.7) {
      val maxP = math.min(4, math.min(len1, len2))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      sim + 0.1 * p * (1.0 - sim)
    } else sim
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}
