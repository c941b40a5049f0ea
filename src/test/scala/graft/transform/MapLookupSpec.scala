package graft.transform

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** X2 hash-probe lookup: parity with element_at(typedlit(map)) semantics,
  * in both codegen and interpreted evaluation.
  */
class MapLookupSpec extends SparkSuite {
  import spark.implicits._

  private val m = Map("a" -> 0, "b" -> 1, "weird'k" -> 2)

  test("hit / miss / null semantics match element_at + coalesce") {
    val df = Seq(Some("a"), Some("b"), Some("weird'k"), Some("zz"), None).toDF("v")
    val gotNullMiss = df.select(MapLookup.column(col("v"), m, MapLookup.NullMiss).as("bin"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(gotNullMiss.toSeq == Seq(0, 1, 2, null, null))
    val gotOther = df.select(MapLookup.column(col("v"), m, 9).as("bin"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    // miss sentinel applies to unseen AND null child (caller handles null)
    assert(gotOther.toSeq == Seq(0, 1, 2, 9, 9))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = MapLookup(BoundReference(0, StringType, nullable = true), m, 7)
    assert(e.eval(InternalRow(UTF8String.fromString("b"))) == 1)
    assert(e.eval(InternalRow(UTF8String.fromString("nope"))) == 7)
    val eNull = MapLookup(BoundReference(0, StringType, nullable = true), m, MapLookup.NullMiss)
    assert(eNull.eval(InternalRow(UTF8String.fromString("nope"))) == null)
  }

  test("large vocabulary: 100k keys probe correctly") {
    val big = (0 until 100000).map(i => s"k$i" -> (i % 97)).toMap
    val df = Seq("k0", "k99999", "missing").toDF("v")
    val got = df.select(MapLookup.column(col("v"), big, -1).as("bin"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 99999 % 97, -1))
  }
}
