package graft.tools

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config generator tool (SURVEY.md §2.12 O7; reference
  * tools/confgenerotor/conf_generate.go:39-108): template conf + source
  * db/table + target + time unit → conf.json whose WHERE is a now-relative
  * window `t1 >= now-unit AND t1 < now` (day→1d, week→7d, month→1 calendar
  * month) and whose sourceQuery is `select * from db.tbl`. Like the
  * reference, the template is NOT validated here — validation happens at
  * load time in the archiver itself.
  *
  * Usage: runMain graft.tools.ConfGen <template.json> <sourceDb>
  *        <sourceTable> <targetDbTable> [day|week|month] [outPath]
  */
object ConfGen {

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Pure body (testable with an injected `now`). */
  def generate(templateJson: String, sourceDb: String, sourceTable: String,
      targetDbTable: String, timeUnit: String,
      now: LocalDateTime): Either[String, String] = {
    val start = timeUnit match {
      case "day"   => Right(now.minusDays(1))
      case "week"  => Right(now.minusDays(7))
      case "month" => Right(now.minusMonths(1))
      case other   => Left(s"Invalid time unit: $other. Must be day, week, or month")
    }
    start.flatMap { st =>
      JsonMethods.parseOpt(templateJson) match {
        case Some(tmpl: JObject) =>
          val merged = tmpl merge JObject(
            "sourceDB" -> JString(sourceDb),
            "sourceTable" -> JString(sourceTable),
            "sourceQuery" -> JString(s"select * from $sourceDb.$sourceTable"),
            "sourceWhereCondition" -> JString(
              s"t1 >= '${st.format(Fmt)}' AND t1 < '${now.format(Fmt)}'"),
            "databendTable" -> JString(targetDbTable))
          Right(JsonMethods.pretty(JsonMethods.render(merged)))
        case _ => Left("Error parsing template JSON")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: ConfGen <template.json> <sourceDb> " +
        "<sourceTable> <targetDbTable> [day|week|month] [outPath]")
      sys.exit(1)
    }
    val unit = if (args.length > 4) args(4) else "day"
    val out = if (args.length > 5) args(5) else "conf.json"
    generate(Files.readString(Paths.get(args(0))), args(1), args(2), args(3),
        unit, LocalDateTime.now()) match {
      case Right(json) =>
        Files.writeString(Paths.get(out), json)
        println(s"Configuration file generated successfully: $out")
      case Left(err) =>
        System.err.println(err); sys.exit(1)
    }
  }
}
