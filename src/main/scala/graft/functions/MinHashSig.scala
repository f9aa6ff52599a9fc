package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(codes)` — the full k-permutation MinHash signature in ONE
  * pass over the shingle-code array: min_c (a_i·c + b_i) mod p for each of
  * the k affine permutations, computed as the EXACT mathematical mod for
  * any 64-bit code (the code folds to [0, p) first — see nullSafeEval).
  *
  * Integer-only arithmetic, so bit-identity with the folded HOF twin
  * (`array_min(transform(codes, (a·pmod(c,p)+b) % p))` per permutation) is
  * exact, not just ulp-close; the HOF twin interprets 2 lambdas × k
  * permutations per row. Empty input yields null, matching array_min on
  * an empty array.
  */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
  extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty)
  // a, b ∈ [0, p) makes a·(c mod p) + b ≤ (p−1)² + p−1 < 2⁶³ for the
  // 2³¹−1 prime — the bound that keeps the folded hash below exact-long
  // range (see the fold note on nullSafeEval)
  require(as.forall(a => a >= 0 && a < prime) && bs.forall(b => b >= 0 && b < prime),
    s"minhash params must lie in [0, prime=$prime)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects ARRAY<BIGINT>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // element null → null signature (the HOF twin's null arithmetic
      // nulls the fold): getLong would silently read the slot as code 0,
      // whose hash is often the per-plane minimum — a silently WRONG
      // sketch on the public minhash_sig SQL surface
      if (arr.isNullAt(i)) return null
      // fold the code to [0, p) BEFORE the multiply (r11 oracle audit):
      // mod distributes over ·/+, so (a·c + b) mod p = (a·(c mod p) + b)
      // mod p EXACTLY — but the unfolded product a·c wraps past 2⁶³ at
      // code ≈ 8.2e12 (a ~360k-char shingle: minified JS, base64 blobs),
      // where Java silently goes negative while the DuckDB oracle's
      // HUGEINT arithmetic stays exact; a negative "hash" then dominates
      // every per-plane min and degenerates the whole signature. The
      // folded form IS the exact mathematical value for any long code
      // (floorMod also covers negative codes on the public SQL surface).
      val c = java.lang.Math.floorMod(arr.getLong(i), prime)
      var p = 0
      while (p < k) {
        val h = (as(p) * c + bs(p)) % prime
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addMutableState("long[]", "mhA",
      v => s"$v = new long[]{${as.mkString("L,")}L};")
    val bArr = ctx.addMutableState("long[]", "mhB",
      v => s"$v = new long[]{${bs.mkString("L,")}L};")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[${as.length}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $c = java.lang.Math.floorMod($a.getLong($i), ${prime}L);
         |    for (int $p = 0; $p < ${as.length}; $p++) {
         |      long $h = ($aArr[$p] * $c + $bArr[$p]) % ${prime}L;
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(c: Column, params: Seq[(Int, Long, Long)], prime: Long): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c),
      params.map(_._2), params.map(_._3), prime))
}
