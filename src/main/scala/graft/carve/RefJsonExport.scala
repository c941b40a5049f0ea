package graft.carve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interop utility: fit the golden dataset and write the model in the
  * REFERENCE's JSON schema — `tools/gen_ref_saved.py --check-load <out>`
  * then loads it with the reference's own `BinaryCarver.load` and verifies
  * the transforms agree (the write half of the S3 contract).
  *
  * Usage: `RefJsonExport <golden_dataset.csv> <out.json>`
  */
object RefJsonExport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-refjson-export")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.option("header", "true").csv(args(0))
      .select(col("num_a").cast("double"), col("num_b").cast("double"),
        col("cat_a"), col("cat_b"), col("y_binary").cast("int"))
    val m = BinaryCarver.fit(df, "y_binary", Seq(
      BinaryCarver.FeatureSpec("num_a", "quantitative"),
      BinaryCarver.FeatureSpec("num_b", "quantitative"),
      BinaryCarver.FeatureSpec("cat_a", "categorical"),
      BinaryCarver.FeatureSpec("cat_b", "categorical")),
      config = BinaryCarver.Config(minFreq = 0.05, maxNMod = 5))
    RefJson.save(m, args(1))
    println(s"wrote ${args(1)}")
    spark.stop()
  }
}
