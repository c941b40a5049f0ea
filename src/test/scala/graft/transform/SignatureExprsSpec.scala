package graft.transform

import graft.SparkSuite
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** The codegen signature expressions must be hash-identical to the pure
  * Scala kernels they replaced (the former UDF formulation), in both
  * codegen and interpreted eval, with null-in → null-out.
  */
class SignatureExprsSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The quick  brown fox!",
    "",
    "   ",
    "ab", // shorter than shingleK
    "emoji 🌍 text with 🌍 supplementary planes",
    "der die das und ist nicht mit ein eine zu"
  )

  test("minhash expression matches the Scala kernel; null -> null") {
    val df = (texts.map(Option(_)) :+ None).zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("id", "text")
    val out = df.withColumn("mh", MinhashSignature.column(col("text"), 16, 5, 42L))
      .select("id", "text", "mh").collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2), "null text must give a null signature")
      else {
        val expected = Dedup.minhashSig(Dedup.shingleHashes(r.getString(1), 5), 16, 42L).toSeq
        assert(r.getSeq[Long](2) == expected, s"row ${r.getLong(0)}")
      }
    }
    // interpreted (non-codegen) eval agrees
    val expr = MinhashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(texts.head),
        org.apache.spark.sql.types.StringType), 16, 5, 42L)
    val interp = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(interp.toLongArray().toSeq ==
      Dedup.minhashSig(Dedup.shingleHashes(texts.head, 5), 16, 42L).toSeq)
  }

  test("simhash expression matches the Scala kernel; null -> null") {
    val df = (texts.map(Option(_)) :+ None).zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("id", "text")
    val out = df.withColumn("sh", Simhash64.column(col("text")))
      .select("id", "text", "sh").collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getLong(2) == Dedup.simhashOf(r.getString(1)), s"row ${r.getLong(0)}")
    }
  }
}
