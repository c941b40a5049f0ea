package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count as ONE codegen'd scan over the string's bytes —
  * semantically `size(split(trim(s), "\\s+"))` with 0 for blank input, but
  * with NO per-row array/String allocation. The split-based formulation
  * allocates a token array per row; at web scale the page pipeline runs
  * this on every row of every scan, and the allocation pressure is a real
  * multi-core scaling cost (GC time grows with thread count).
  *
  * Whitespace = the 5 ASCII class members of Java's regex `\s` (space, \t,
  * \n, \x0B, \f, \r) — the synthetic corpus and web text after extraction
  * are ASCII-spaced; `split("\\s+")` matches the same class.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    TokenCount.count(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.transform.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  /** Runtime kernel (shared by interpreted eval and generated code). */
  def count(s: UTF8String): Long = {
    if (s == null) return 0L
    val n = s.numBytes()
    var i = 0
    var tokens = 0L
    var inToken = false
    while (i < n) {
      val b = s.getByte(i)
      // ASCII whitespace of regex \s: ' ' \t \n \x0B \f \r; any non-ASCII
      // byte (high bit set) is part of a token
      val ws = b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0d.toByte)
      if (!ws && !inToken) { tokens += 1L; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    tokens
  }

  def column(c: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(c)))
}
