package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash16(codes)` — the k-bit SimHash fingerprint in ONE pass over the
  * token-code array: per bit i, s_i = Σ_c (((a_i·c + b_i) mod p mod 2)·2−1);
  * fingerprint = Σ (s_i > 0) << i. The hash is the EXACT mathematical mod
  * for any 64-bit code — the code folds to [0, p) before the multiply
  * (the MinHashSig fold; unfolded, a·c wraps past 2⁶³ at code ≈ 8.2e12
  * and the % p % 2 of a negative wrap votes −3 instead of ±1, silently
  * skewing the fingerprint while the DuckDB oracle's HUGEINT arithmetic
  * stays exact — r11 oracle audit).
  *
  * Integer-only, bit-identical to the folded HOF twin (one
  * `aggregate(codes, signed-bit sum)` per bit position), which interprets
  * 1 lambda × k bits per element per row. Empty input → 0, matching the
  * zero-seeded aggregate (no bit sum is positive).
  */
case class SimHash16(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
  extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)
  // a, b ∈ [0, p): keeps a·(c mod p) + b < 2⁶³ (the MinHashSig bound)
  require(as.forall(a => a >= 0 && a < prime) && bs.forall(b => b >= 0 && b < prime),
    s"simhash params must lie in [0, prime=$prime)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects ARRAY<BIGINT>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val s = new Array[Long](k)
    var i = 0
    while (i < n) {
      // element null → null fingerprint (the MinHashSig convention):
      // getLong would silently read the slot as code 0 and bias the
      // bit-vote — a silently wrong sketch on the simhash16 SQL surface
      if (arr.isNullAt(i)) return null
      val c = java.lang.Math.floorMod(arr.getLong(i), prime)
      var p = 0
      while (p < k) {
        s(p) += ((as(p) * c + bs(p)) % prime % 2) * 2 - 1
        p += 1
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < k) {
      if (s(p) > 0) fp |= (1L << p)
      p += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addMutableState("long[]", "shA",
      v => s"$v = new long[]{${as.mkString("L,")}L};")
    val bArr = ctx.addMutableState("long[]", "shB",
      v => s"$v = new long[]{${bs.mkString("L,")}L};")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |long[] $s = new long[${as.length}];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $c = java.lang.Math.floorMod($a.getLong($i), ${prime}L);
         |  for (int $p = 0; $p < ${as.length}; $p++) {
         |    $s[$p] += (($aArr[$p] * $c + $bArr[$p]) % ${prime}L % 2L) * 2L - 1L;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $fp = 0L;
         |  for (int $p = 0; $p < ${as.length}; $p++) {
         |    if ($s[$p] > 0L) $fp |= (1L << $p);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  def simhash16(c: Column, params: Seq[(Int, Long, Long)], prime: Long): Column =
    GraftBridge.column(SimHash16(GraftBridge.expression(c),
      params.map(_._2), params.map(_._3), prime))
}
