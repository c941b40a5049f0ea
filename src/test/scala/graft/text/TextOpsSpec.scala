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

  test("LangId expression matches the reference scorer byte-for-byte (incl. ties, unicode, null)") {
    val texts = Seq(
      "the quick brown fox is on the run with all of this",
      "der hund ist nicht mit der katze und dem vogel",
      "le chat est pour la maison et les oiseaux des villes",
      "el perro es una casa por que con los gatos para todos",
      "il gatto non sono per una casa che del mare con te",
      "o que os gatos para uma casa com mais dos pratos das",
      "xyzzy plugh qwerty",              // no markers -> und
      "", "   ", "\t\n",                 // blank -> und
      "la la la",                        // shared marker (es/fr/it) -> tie, first sorted lang wins
      "que con para",                    // es/pt overlap tie
      "THE AND OF TO IS IT",             // case folding
      "the  and\tof\nto",                // multi-separator
      "emoji 😀 the and of to is it for with that this",
      "ümläut the and of tōkens"
    ) ++ Seq(null)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
    val got = df.select($"i", TextOps.langId($"t")).as[(Int, String)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == TextOps.langIdOf(t), s"text='$t': got ${got(i)} want ${TextOps.langIdOf(t)}")
    }
    // and no UDF in the plan: the expression codegen-compiles
    val plan = df.select(TextOps.langId($"t")).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
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
