package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit document fingerprint: FNV-1a over the Unicode code points of the
  * lowercased, trimmed text — the codegen form of what used to be a Scala
  * UDF in [[graft.text.TextOps.fingerprint]]. Stays inside whole-stage
  * codegen (no UDF boxing / encoder round-trip) on a path that runs once
  * per row of every scanned page.
  *
  * FNV (not Spark's builtin xxhash64) so the value is portable across
  * engines: the correctness oracle recomputes it in plain SQL with
  * HUGEINT modular arithmetic over `unicode()` code points.
  */
case class Fnv1aFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1aFingerprint.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.transform.Fnv1aFingerprint.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1aFingerprint =
    copy(child = newChild)
}

/** Raw FNV-1a over a string's code points — NO lowercase/trim
  * normalization. The portable hash for sampling/split keys
  * ([[graft.sample.Sampling]]): the correctness oracle replays it in plain
  * SQL, unlike xxhash64. Codegen'd; null in, null out.
  */
case class Fnv1aRaw(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a_raw"

  override protected def nullSafeEval(input: Any): Any =
    graft.dedup.Dedup.fnv1a(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.Dedup.fnv1a($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1aRaw =
    copy(child = newChild)
}

object Fnv1aRaw {
  def column(c: Column): Column =
    ColumnBridge.column(Fnv1aRaw(ColumnBridge.expression(c)))
}

object Fnv1aFingerprint {
  /** Runtime kernel (shared by interpreted eval and generated code).
    * Locale.ROOT lowercasing: deterministic across JVM default locales
    * (the Turkish-I pitfall), and identical to default-locale lowercasing
    * for the ASCII range the web corpus normalization targets.
    */
  def hash(s: UTF8String): Long = {
    val t = s.toString.toLowerCase(java.util.Locale.ROOT).trim
    graft.dedup.Dedup.fnv1a(t)
  }

  def column(c: Column): Column =
    ColumnBridge.column(Fnv1aFingerprint(ColumnBridge.expression(c)))
}
