package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** O(1) literal-map lookup for the categorical scoring path (SURVEY.md X2).
  *
  * `element_at(typedlit(map), key)` plans as Catalyst `GetMapValue` over an
  * `ArrayBasedMapData` literal, which LINEARLY SCANS the key array per row
  * — a 100k-modality vocabulary costs 100k string comparisons per row on
  * the transform hot path. This expression compiles the fitted
  * value→bin map into a reference `java.util.HashMap<UTF8String,Integer>`
  * probed once per row, inside whole-stage codegen.
  *
  * Null input and unseen values yield `miss` (-1 sentinel mapped to null /
  * nan-bin handling by the caller, mirroring the previous coalesce shape):
  * the caller wraps with its own null/__OTHER__ semantics.
  */
case class MapLookup(child: Expression, map: Map[String, Int], miss: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = miss == MapLookup.NullMiss
  override def prettyName: String = "map_lookup"

  // the probe table is built once per executor deserialization, not per row
  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = MapLookup.buildTable(map)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out =
      if (v == null) miss
      else {
        val hit = table.get(v.asInstanceOf[UTF8String])
        if (hit == null) miss else hit.intValue()
      }
    if (out == MapLookup.NullMiss) null else out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("lookupTable", table, "java.util.HashMap")
    val childGen = child.genCode(ctx)
    val hit = ctx.freshName("hit")
    val nullOut =
      if (nullable) s"${ev.isNull} = true;"
      else s"${ev.value} = $miss;" // unreachable when miss is a real bin
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        int ${ev.value} = $miss;
        if (${childGen.isNull}) {
          $nullOut
        } else {
          Object $hit = $tableRef.get(${childGen.value});
          if ($hit == null) { $nullOut }
          else { ${ev.value} = ((java.lang.Integer) $hit).intValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): MapLookup =
    copy(child = newChild)
}

object MapLookup {
  /** miss sentinel meaning "emit SQL null" (no default bucket). */
  val NullMiss: Int = Int.MinValue

  private[transform] def buildTable(map: Map[String, Int]): java.util.HashMap[UTF8String, Integer] = {
    val t = new java.util.HashMap[UTF8String, Integer](math.max(8, map.size * 2))
    map.foreach { case (k, v) => t.put(UTF8String.fromString(k), Integer.valueOf(v)) }
    t
  }

  /** value→bin probe returning `miss` for unseen values (or null when
    * `miss` is [[NullMiss]]); null input handled by the caller.
    */
  def column(c: Column, map: Map[String, Int], miss: Int): Column =
    ColumnBridge.column(MapLookup(ColumnBridge.expression(c), map, miss))
}
