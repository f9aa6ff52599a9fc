package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_code(s)` = Σ codepoint(char_j) · j (1-based) — the engine-neutral
  * integer token code used by the MinHash/SimHash family (TextOps), as a
  * codegen'd expression.
  *
  * Semantics match both the HOF formulation
  * (`aggregate(transform(split(tok, ""), ascii(c)·(i+1)))`) and the DuckDB
  * oracle (`list_sum(list_transform(range(1, length+1),
  * j -> ascii(substr(tok, j, 1)) * j))`): per-character codepoint times
  * 1-based position. The HOF version allocates a per-character array of
  * singleton strings and interprets three lambdas per token — this is one
  * generated loop.
  *
  * Honest overflow bound (r11 oracle audit): the long accumulator wraps
  * past 2⁶³, which for ASCII text needs a SINGLE token of ≈ 4×10⁸ chars
  * (Σ c·j ≈ 100·L²/2) — a 400 MB unbroken run without whitespace, larger
  * than any realistic document, let alone token. Below that the code is
  * exact and equals the oracle's HUGEINT fold; downstream hash sites stay
  * exact for ANY long code via their [0, p) folds (MinHashSig,
  * SimHash16, dpNoisedCounts), so a wrap here would change WHICH
  * signature a pathological token gets, never the arithmetic's validity.
  */
case class TokenCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_code expects STRING, got ${child.dataType.sql}")

  /** Codepoint iteration (not UTF-16 code units): positions count
    * codepoints and the multiplier is the full codepoint value, matching
    * the oracle's codepoint-based substr/ascii exactly for non-ASCII
    * tokens (surrogate pairs advance one position, not two). */
  @inline private def codeOf(s: String): Long = {
    var acc = 0L
    var j = 0
    var pos = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      pos += 1
      acc += cp.toLong * pos
      j += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(v: Any): Any = codeOf(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val pos = ctx.freshName("pos")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $pos = 0;
         |for (int $j = 0; $j < $s.length(); ) {
         |  int $cp = $s.codePointAt($j);
         |  $pos += 1;
         |  $acc += (long) $cp * $pos;
         |  $j += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCode {
  def tokenCode(c: Column): Column = GraftBridge.column(TokenCode(GraftBridge.expression(c)))
}
