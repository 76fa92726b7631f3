package graft

import graft.streaming.{Cep, StreamRunner}
import graft.streaming.Cep.{CepEvent, Pattern, Step}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL `MATCH_RECOGNIZE` subset (reference: flink-sql-parser
  * MATCH_RECOGNIZE → StreamExecMatch + flink-cep NFA, SURVEY.md §2.10 /
  * §7 step 10): translates the Flink 1.11 SQL surface onto the
  * [[graft.streaming.Cep]] NFA processor, which runs it as a real
  * streaming job with event-time replay.
  *
  * Pattern concatenation follows the SQL standard / Flink semantics:
  * STRICT row-adjacency per key (`PATTERN (A B)` requires B to be the
  * key's immediately-next row after A — flink-cep `next()`); the Cep
  * DSL's relaxed `followedBy` contiguity is reachable through the DSL
  * directly. Supported grammar (single variables, no quantifiers):
  *
  * {{{
  * SELECT * FROM <events-table> MATCH_RECOGNIZE (
  *   PARTITION BY <keyCol>
  *   ORDER BY <rowtimeCol>
  *   MEASURES A.event_id AS a_id, …
  *   [ONE ROW PER MATCH]
  *   AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW
  *   PATTERN (A B C …)
  *   WITHIN INTERVAL '<n>' DAY|HOUR|MINUTE|SECOND
  *   DEFINE A AS A.<tagCol> = '<literal>', …
  * )
  * }}}
  *
  * DEFINE predicates are tag-equality (the classic event-type
  * sequencing CEP); richer predicates use the Cep DSL directly.
  */
object MatchRecognizeSql {

  final case class MrSpec(
      table: String, partitionBy: String, orderBy: String,
      measures: Seq[(String, String, String)], // (variable, field, alias)
      skipPastLast: Boolean,
      patternVars: Seq[String],
      withinMs: Long,
      defines: Map[String, (String, String)]) // var -> (tagCol, literal)

  private def re(p: String) = ("(?is)" + p).r

  def parse(sql: String): MrSpec = {
    val body = re("""FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)""")
      .findFirstMatchIn(sql)
      .getOrElse(throw new IllegalArgumentException(
        s"no MATCH_RECOGNIZE clause: $sql"))
    val table = body.group(1)
    val inner = body.group(2)

    def one(p: String, what: String): String =
      re(p).findFirstMatchIn(inner).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"missing $what"))

    val partitionBy = one("""PARTITION\s+BY\s+(\w+)""", "PARTITION BY")
    val orderBy = one("""ORDER\s+BY\s+(\w+)""", "ORDER BY")
    val measuresBlock = one(
      """MEASURES\s+(.*?)\s+(?:ONE\s+ROW|AFTER\s+MATCH|PATTERN)""",
      "MEASURES")
    val measures = measuresBlock.split(",").toSeq.map(_.trim).map { m =>
      re("""(\w+)\.(\w+)\s+AS\s+(\w+)""").findFirstMatchIn(m) match {
        case Some(g) => (g.group(1), g.group(2), g.group(3))
        case None => throw new IllegalArgumentException(s"bad measure: $m")
      }
    }
    val skipPastLast =
      re("""AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW""")
        .findFirstIn(inner).isDefined
    val patternVars = one("""PATTERN\s*\(([\w\s]+)\)""", "PATTERN")
      .trim.split("\\s+").toSeq
    val (amt, unit) = {
      val m = re("""WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)""")
        .findFirstMatchIn(inner)
        .getOrElse(throw new IllegalArgumentException("missing WITHIN"))
      (m.group(1).toLong, m.group(2).toUpperCase)
    }
    val withinMs = unit match {
      case "DAY" => amt * 86400000L
      case "HOUR" => amt * 3600000L
      case "MINUTE" => amt * 60000L
      case "SECOND" => amt * 1000L
      case u => throw new IllegalArgumentException(s"bad WITHIN unit $u")
    }
    val definesBlock = one("""DEFINE\s+(.*)$""", "DEFINE")
    val defines = definesBlock.split(",").toSeq.map(_.trim).map { d =>
      re("""(\w+)\s+AS\s+\w+\.(\w+)\s*=\s*'([^']*)'""")
        .findFirstMatchIn(d) match {
        case Some(g) => g.group(1) -> ((g.group(2), g.group(3)))
        case None => throw new IllegalArgumentException(s"bad DEFINE: $d")
      }
    }.toMap
    MrSpec(table, partitionBy, orderBy, measures, skipPastLast,
      patternVars, withinMs, defines)
  }

  /** Translates and RUNS the pattern as a streaming job over the
    * `events` fixture in `dir` (the one keyed event stream the engine
    * ships; `watermarkDelay` mirrors the table's watermark DDL).
    */
  def run(spark: SparkSession, dir: String, sql: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val spec = parse(sql)
    require(spec.table == "events",
      s"MATCH_RECOGNIZE subset runs over the events stream, got ${spec.table}")
    import spark.implicits._

    val tagCols = spec.defines.values.map(_._1).toSet
    require(tagCols.size == 1,
      s"DEFINE predicates must test one tag column, got $tagCols")
    val tagCol = tagCols.head

    // MATCH_RECOGNIZE pattern concatenation is STRICT row-adjacency
    // (Flink `next()`): an intervening non-matching row kills the
    // partial. The relaxed followedBy semantics belong to the Cep DSL.
    val steps = spec.patternVars.map { v =>
      val (_, lit) = spec.defines.getOrElse(v,
        throw new IllegalArgumentException(s"pattern var $v not DEFINEd"))
      Step(v, _.tag == lit, strict = true)
    }
    val ev = StreamRunner.eventsStream(spark, dir)
      .withWatermark(spec.orderBy, watermarkDelay)
      .select(col(spec.partitionBy).as("key"),
        expr(s"unix_micros(${spec.orderBy}) div 1000").as("tsMs"),
        col(tagCol).as("tag"), col("event_id").as("id"),
        col(spec.orderBy).as("ts"))
      .as[CepEvent]
    val matches = Cep(ev,
      Pattern(steps, spec.withinMs, spec.skipPastLast)).toDF()

    val stepIdx = spec.patternVars.zipWithIndex.toMap
    val measureCols = spec.measures.map { case (v, field, alias) =>
      require(field == "event_id",
        s"measure field must be event_id in this subset, got $field")
      col("ids").getItem(stepIdx(v)).as(alias)
    }
    StreamRunner.runToTable(
      matches.select(col("key").as(spec.partitionBy) +: measureCols: _*),
      "append")
  }
}
