package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenCount handles empty, blank, multi-space") {
    val df = Seq("", "  ", "one", "one two", "a  b   c").toDF("t")
    val out = df.select(TextOps.tokenCount($"t")).as[Long].collect()
    assert(out.sameElements(Array(0L, 0L, 1L, 2L, 3L)))
  }

  test("langIdOf picks the dominant marker language") {
    assert(TextOps.langIdOf("the cat and the dog is on the mat") == "en")
    assert(TextOps.langIdOf("der hund und die katze ist nicht da") == "de")
    assert(TextOps.langIdOf("xyzzy plugh") == "und")
    assert(TextOps.langIdOf("") == "und")
    assert(TextOps.langIdOf(null) == "und")
  }

  test("charShingles emits all k-grams, empty below k") {
    val df = Seq("abcde", "ab").toDF("t")
    val out = df.select(TextOps.charShingles($"t", 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("abc", "bcd", "cde"))
    assert(out(1).isEmpty)
  }

  test("quality score in [0,1] and favors clean prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs on through the field for a while today",
      "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!!"
    ).toDF("t")
    val out = df.select(TextOps.qualityScore($"t")).as[Double].collect()
    assert(out.forall(s => s >= 0.0 && s <= 1.0))
    assert(out(0) > out(1))
  }
}
