package graft

import graft.streaming.{Cep, StreamRunner}
import graft.streaming.Cep.{CepEvent, MatchCtx, Pattern, Step}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * directly. Supported grammar:
  *
  * {{{
  * SELECT * FROM <events-table> MATCH_RECOGNIZE (
  *   PARTITION BY <keyCol>
  *   ORDER BY <rowtimeCol>
  *   MEASURES A.<field> AS a, FIRST(B.<field>) AS b, LAST(C.<field>) AS c, …
  *   [ONE ROW PER MATCH]
  *   AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW
  *   PATTERN (A B+ C{2} D{1,3} …)
  *   WITHIN INTERVAL '<n>' DAY|HOUR|MINUTE|SECOND
  *   DEFINE A AS A.<tagCol> = '<literal>',
  *          B AS B.value < PREV(B.value),
  *          C AS C.value > A.value, …
  * )
  * }}}
  *
  * Quantifiers `+` / `{n}` / `{n,m}` compile to the NFA's GREEDY
  * quantified steps (flink-cep `Pattern#oneOrMore/#times` with
  * `greedy()` + `consecutive()` under SQL strict contiguity). DEFINE
  * predicates: tag-equality, and `value` comparisons against `PREV`
  * (the previous matched row — under strict contiguity the previous
  * partition row), a bare cross-variable reference (`A.value`, the
  * variable's LAST matched occurrence, Flink's running semantics), or
  * explicit `FIRST(X.value)` / `LAST(X.value)`. A pattern variable with
  * no DEFINE entry matches any row (SQL standard). MEASURES fields:
  * `event_id` or `value`; a bare `V.<field>` is the variable's LAST
  * occurrence.
  */
object MatchRecognizeSql {

  sealed trait Rhs
  final case class LitStr(v: String) extends Rhs
  final case class PrevRef(col: String) extends Rhs
  /** Cross-variable reference; `first` = FIRST(X.col), else LAST. */
  final case class VarRef(variable: String, col: String, first: Boolean)
      extends Rhs

  /** One DEFINE predicate: `<selfCol> <op> <rhs>`. */
  final case class Define(selfCol: String, op: String, rhs: Rhs)

  /** One MEASURES item. `fn`: "first" | "last" (bare access ≡ last). */
  final case class Measure(fn: String, variable: String, field: String,
      alias: String)

  final case class Quantified(name: String, min: Int, max: Int,
      optional: Boolean = false)

  /** `skipTo`: AFTER MATCH SKIP TO (FIRST|LAST) <var> as
    * (variable, isFirst); exclusive with `skipPastLast`.
    */
  final case class MrSpec(
      table: String, partitionBy: String, orderBy: String,
      measures: Seq[Measure],
      skipPastLast: Boolean,
      patternVars: Seq[Quantified],
      withinMs: Long,
      defines: Map[String, Define],
      skipTo: Option[(String, Boolean)] = None)

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
      re("""(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)\s+AS\s+(\w+)""")
        .findFirstMatchIn(m) match {
        case Some(g) =>
          Measure(g.group(1).toLowerCase, g.group(2), g.group(3), g.group(4))
        case None =>
          re("""(\w+)\.(\w+)\s+AS\s+(\w+)""").findFirstMatchIn(m) match {
            case Some(g) => Measure("last", g.group(1), g.group(2), g.group(3))
            case None => throw new IllegalArgumentException(s"bad measure: $m")
          }
      }
    }
    val skipPastLast =
      re("""AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW""")
        .findFirstIn(inner).isDefined
    val skipTo =
      re("""AFTER\s+MATCH\s+SKIP\s+TO\s+(FIRST|LAST)\s+(\w+)""")
        .findFirstMatchIn(inner)
        .map(g => (g.group(2), g.group(1).equalsIgnoreCase("first")))
    val patternVars = one("""PATTERN\s*\(([^)]+)\)""", "PATTERN")
      .trim.split("\\s+").toSeq.map { tok =>
        re("""(\w+)(\+|\?|\{(\d+)(?:\s*,\s*(\d+))?\})?""").findFirstMatchIn(tok)
          .filter(_.matched == tok) match {
          case Some(g) =>
            val name = g.group(1)
            Option(g.group(2)) match {
              case None => Quantified(name, 1, 1)
              case Some("+") => Quantified(name, 1, Int.MaxValue)
              case Some("?") => Quantified(name, 1, 1, optional = true)
              case Some(_) =>
                val n = g.group(3).toInt
                val m = Option(g.group(4)).map(_.toInt).getOrElse(n)
                Quantified(name, n, m)
            }
          case None =>
            throw new IllegalArgumentException(s"bad pattern token: $tok")
        }
      }
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
    // split on commas that are NOT inside parentheses (PREV(...),
    // FIRST(...) arguments contain none today, but be safe)
    val defines = definesBlock.split(""",(?![^(]*\))""").toSeq
      .map(_.trim).filter(_.nonEmpty).map { d =>
        val (v, expr) = re("""(\w+)\s+AS\s+(.*)""").findFirstMatchIn(d) match {
          case Some(g) => (g.group(1), g.group(2).trim)
          case None => throw new IllegalArgumentException(s"bad DEFINE: $d")
        }
        val tagEq = re("""\w+\.(\w+)\s*=\s*'([^']*)'""")
          .findFirstMatchIn(expr).filter(_.matched == expr)
        val cmp = re(
          """\w+\.(\w+)\s*(<=|>=|<|>|=)\s*(?:PREV\s*\(\s*\w+\.(\w+)\s*\)|(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)|(\w+)\.(\w+))""")
          .findFirstMatchIn(expr).filter(_.matched == expr)
        val define = tagEq match {
          case Some(g) => Define(g.group(1), "=", LitStr(g.group(2)))
          case None => cmp match {
            case Some(g) =>
              val rhs =
                if (g.group(3) != null) PrevRef(g.group(3))
                else if (g.group(4) != null)
                  VarRef(g.group(5), g.group(6),
                    g.group(4).equalsIgnoreCase("first"))
                else VarRef(g.group(7), g.group(8), first = false)
              Define(g.group(1), g.group(2), rhs)
            case None =>
              throw new IllegalArgumentException(s"bad DEFINE predicate: $expr")
          }
        }
        v -> define
      }.toMap
    MrSpec(table, partitionBy, orderBy, measures, skipPastLast,
      patternVars, withinMs, defines, skipTo)
  }

  private def cmpOp(op: String): (Double, Double) => Boolean = op match {
    case "<" => _ < _
    case ">" => _ > _
    case "<=" => _ <= _
    case ">=" => _ >= _
    case "=" => _ == _
  }

  /** Compiles one pattern variable to an NFA step. */
  private def toStep(q: Quantified, defines: Map[String, Define]): Step = {
    val base = Step(q.name, _ => true, strict = true,
      minTimes = q.min, maxTimes = q.max, isOptional = q.optional)
    defines.get(q.name) match {
      case None => base // undefined variable matches any row
      case Some(Define(_, "=", LitStr(lit))) =>
        base.copy(where = _.tag == lit)
      case Some(Define(selfCol, op, rhs)) =>
        require(selfCol == "value",
          s"comparison DEFINE supports the value column, got $selfCol")
        val cmp = cmpOp(op)
        val ctx: (CepEvent, MatchCtx) => Boolean = rhs match {
          case PrevRef(_) =>
            (e, m) => m.prev.exists(p => cmp(e.num, p.num))
          case VarRef(v, _, first) =>
            (e, m) => (if (first) m.first(v) else m.last(v))
              .exists(r => cmp(e.num, r.num))
          case LitStr(_) => throw new IllegalStateException("unreachable")
        }
        base.copy(ctxWhere = ctx)
    }
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

    val tagCols = spec.defines.values.collect {
      case Define(c, "=", LitStr(_)) => c
    }.toSet
    require(tagCols.size <= 1,
      s"DEFINE tag predicates must test one tag column, got $tagCols")
    val tagCol = tagCols.headOption.getOrElse("event_type")

    val steps = spec.patternVars.map(toStep(_, spec.defines))
    val ev = StreamRunner.eventsStream(spark, dir)
      .withWatermark(spec.orderBy, watermarkDelay)
      .select(col(spec.partitionBy).as("key"),
        expr(s"unix_micros(${spec.orderBy}) div 1000").as("tsMs"),
        col(tagCol).as("tag"), col("event_id").as("id"),
        col(spec.orderBy).as("ts"), col("value").as("num"))
      .as[CepEvent]
    val matches = Cep(ev,
      Pattern(steps, spec.withinMs, spec.skipPastLast,
        skipToVar = spec.skipTo.map(_._1).orNull,
        skipToFirst = spec.skipTo.exists(_._2))).toDF()

    val stepIdx = spec.patternVars.map(_.name).zipWithIndex.toMap
    val measureCols: Seq[Column] = spec.measures.map { m =>
      val arr = m.field match {
        case "event_id" => "ids"
        case "value" => "values"
        case f => throw new IllegalArgumentException(
          s"measure field must be event_id or value, got $f")
      }
      val i = stepIdx.getOrElse(m.variable,
        throw new IllegalArgumentException(
          s"measure variable ${m.variable} not in PATTERN"))
      val pos = if (m.fn == "first") "1" else "-1"
      // try_element_at: an optional variable absent from the match has
      // an empty occurrence list → the measure is NULL (SQL standard)
      expr(s"try_element_at(filter(arrays_zip(stepIdxs, $arr), " +
        s"x -> x.stepIdxs = $i), $pos).$arr").as(m.alias)
    }
    StreamRunner.runToTable(
      matches.select(col("key").as(spec.partitionBy) +: measureCols: _*),
      "append")
  }
}
