package graft.cli

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON-lines REPL over [[CarverSession]] — the reference MCP server's 13
  * tool verbs (`mcp/server.py:34-108`) as a transport anyone can drive:
  * one request per stdin line, one response per stdout line.
  *
  * Request:  `{"tool": "<verb>", "args": {...}}`
  * Response: `{"ok": true, "result": ...}` or `{"ok": false, "error": "..."}`
  *
  * Verbs: load_dataset, list_columns, profile_column, feature_distribution,
  * validate_nesting, datetime_reference_candidates, suggest_features,
  * set_feature, drop_feature, preview_features, run_carver, save_carver,
  * evaluate_stability. An MCP stdio binding would register these same
  * dispatch entries as tools one-to-one.
  */
object Cli {

  def dispatch(session: CarverSession, tool: String, args: JValue): JValue = {
    def s(k: String): Option[String] = (args \ k) match {
      case JString(v) => Some(v); case _ => None
    }
    def d(k: String, default: Double): Double = (args \ k) match {
      case JDouble(v) => v; case JInt(v) => v.toDouble; case JLong(v) => v.toDouble
      case _ => default
    }
    def i(k: String, default: Int): Int = (args \ k) match {
      case JInt(v) => v.toInt; case JLong(v) => v.toInt; case JDouble(v) => v.toInt
      case _ => default
    }
    def list(k: String): Seq[String] = (args \ k) match {
      case JArray(vs) => vs.collect { case JString(x) => x }; case _ => Nil
    }
    tool match {
      case "load_dataset" =>
        session.loadDataset(s("path").getOrElse(sys.error("load_dataset needs 'path'")), s("target"))
      case "list_columns" => session.listColumns()
      case "profile_column" =>
        session.profileColumn(s("column").getOrElse(sys.error("profile_column needs 'column'")),
          i("top_n", 20))
      case "feature_distribution" =>
        session.featureDistribution(
          s("column").getOrElse(sys.error("feature_distribution needs 'column'")),
          (args \ "min_freq") match {
            case JDouble(v) => Some(v); case JInt(v) => Some(v.toDouble); case _ => None
          },
          i("top_n", 50))
      case "validate_nesting" =>
        session.validateNesting(s("child").getOrElse(sys.error("validate_nesting needs 'child'")),
          list("parents"))
      case "datetime_reference_candidates" => session.datetimeReferenceCandidates()
      case "suggest_features" => session.suggestFeatures()
      case "set_feature" =>
        session.setFeature(
          s("column").getOrElse(sys.error("set_feature needs 'column'")),
          s("kind").getOrElse(sys.error("set_feature needs 'kind'")),
          list("values"), s("reference"), list("parents"))
      case "drop_feature" =>
        session.dropFeature(s("column").getOrElse(sys.error("drop_feature needs 'column'")))
      case "preview_features" => session.previewFeatures()
      case "run_carver" =>
        session.runCarver(s("task").getOrElse("auto"), d("min_freq", 0.05), i("max_n_mod", 5))
      case "save_carver" =>
        session.saveCarver(s("path").getOrElse(sys.error("save_carver needs 'path'")))
      case "evaluate_stability" =>
        session.evaluateStability(
          s("path").getOrElse(sys.error("evaluate_stability needs 'path'")), s("target"))
      case other => sys.error(s"unknown tool '$other'; 13 verbs: load_dataset list_columns " +
        "profile_column feature_distribution validate_nesting datetime_reference_candidates " +
        "suggest_features set_feature drop_feature preview_features run_carver save_carver " +
        "evaluate_stability")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val session = new CarverSession(spark)
    val in = scala.io.Source.stdin.getLines()
    try {
      in.filter(_.trim.nonEmpty).foreach { line =>
        val response: JValue =
          try {
            val req = JsonMethods.parse(line)
            val tool = (req \ "tool") match {
              case JString(t) => t
              case _ => sys.error("request needs a 'tool' field")
            }
            JObject("ok" -> JBool(true), "result" -> dispatch(session, tool, req \ "args"))
          } catch {
            case e: Throwable =>
              JObject("ok" -> JBool(false),
                "error" -> JString(Option(e.getMessage).getOrElse(e.getClass.getName)))
          }
        println(JsonMethods.compact(JsonMethods.render(response)))
        System.out.flush()
      }
    } finally spark.stop()
  }
}
