package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen forms of the dedup signature kernels (the last Scala UDFs on the
  * dedup family's hottest scans): the generated code calls the same pure
  * kernels ([[graft.dedup.Dedup.minhashSig]] / [[graft.dedup.Dedup.simhashOf]])
  * directly — identical hashes to the UDF formulation, but no UDF boxing /
  * encoder round-trip, and the projection stays inside whole-stage codegen
  * alongside the tokenCount/langId/fingerprint expressions it scans with.
  */
case class MinhashSignature(child: Expression, numHashes: Int, shingleK: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.eval(input.asInstanceOf[UTF8String], numHashes, shingleK, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.transform.MinhashSignature.eval($c, $numHashes, $shingleK, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** Runtime kernel shared by interpreted eval and generated code. */
  def eval(s: UTF8String, numHashes: Int, shingleK: Int, seed: Long): ArrayData =
    new GenericArrayData(
      graft.dedup.Dedup.minhashSig(
        graft.dedup.Dedup.shingleHashes(s.toString, shingleK), numHashes, seed))

  def column(c: Column, numHashes: Int, shingleK: Int, seed: Long): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(c), numHashes, shingleK, seed))
}

/** 64-bit SimHash over whitespace tokens — codegen form of
  * [[graft.dedup.Dedup.simhashOf]]. Null in, null out (the callers'
  * quarantine contracts key off text nullability, not a sentinel).
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.dedup.Dedup.simhashOf(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.Dedup.simhashOf($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  def column(c: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(c)))
}
