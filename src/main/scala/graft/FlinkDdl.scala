package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Flink 1.11 `CREATE TABLE` DDL shim — SURVEY.md §1.4 / §7 step 1
  * (flink-sql-parser ddl/{SqlCreateTable,SqlWatermark,SqlTableColumn},
  * filesystem connector FileSystemTableFactory): parses the declared
  * schema, the `WATERMARK FOR col AS col - INTERVAL '…' unit` spec —
  * which in the reference is part of the SCHEMA — and the `WITH(…)`
  * connector options, and maps them onto Spark reads.
  *
  * The watermark lives in Spark as a property of the QUERY, not the
  * schema, so the shim carries it from DDL to `withWatermark` when the
  * table is read as a stream ([[readStream]]); batch reads ignore it,
  * exactly like the reference's batch mode. Supported connector:
  * `filesystem` (path + format csv/json/parquet/orc); schema is the
  * declared one — 1.11 formats do no inference.
  */
object FlinkDdl {

  final case class TableDef(
      name: String,
      schema: StructType,
      watermark: Option[(String, String)], // (column, spark delay string)
      options: Map[String, String])

  private val CreateRe =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*""".r
  private val WatermarkRe =
    """(?i)WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s+'([^']+)'\s+(\w+)""".r
  private val OptionRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  /** Flink column type → Spark DDL type (SURVEY.md §1.2 table). */
  private[graft] def sparkType(flinkType: String): String = {
    val t = flinkType.trim.toUpperCase
    val noParam = t.takeWhile(_ != '(')
    noParam match {
      case "STRING" | "VARCHAR" | "CHAR" => "STRING"
      case "BYTES" | "VARBINARY" | "BINARY" => "BINARY"
      case "TINYINT" => "TINYINT"
      case "SMALLINT" => "SMALLINT"
      case "INT" | "INTEGER" => "INT"
      case "BIGINT" => "BIGINT"
      case "FLOAT" => "FLOAT"
      case "DOUBLE" => "DOUBLE"
      case "DECIMAL" | "NUMERIC" =>
        if (t.contains("(")) "DECIMAL" + t.dropWhile(_ != '(') else "DECIMAL"
      case "BOOLEAN" => "BOOLEAN"
      case "DATE" => "DATE"
      // TIMESTAMP(p): µs runtime — p>6 loses sub-µs, documented
      case "TIMESTAMP" => "TIMESTAMP"
      case "TIMESTAMP_LTZ" => "TIMESTAMP"
      case other => throw new IllegalArgumentException(
        s"unsupported Flink type in DDL shim: $other")
    }
  }

  /** Splits the column block on top-level commas (ignores commas inside
    * parens, e.g. DECIMAL(12,2)).
    */
  private def splitColumns(block: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    block.foreach {
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(ddl: String): TableDef = ddl.trim match {
    case CreateRe(name, colBlock, optBlock) =>
      var watermark: Option[(String, String)] = None
      val fields = splitColumns(colBlock).flatMap { c =>
        WatermarkRe.findFirstMatchIn(c) match {
          case Some(m) =>
            watermark = Some((m.group(1),
              s"${m.group(2)} ${m.group(3).toLowerCase}"))
            None
          case None =>
            val Array(colName, colType) = c.split("\\s+", 2)
            Some(StructField(colName,
              org.apache.spark.sql.catalyst.parser.CatalystSqlParser
                .parseDataType(sparkType(colType))))
        }
      }
      val options = OptionRe.findAllMatchIn(optBlock)
        .map(m => m.group(1) -> m.group(2)).toMap
      TableDef(name, StructType(fields), watermark, options)
    case _ =>
      throw new IllegalArgumentException(s"unparseable CREATE TABLE: $ddl")
  }

  private def format(td: TableDef): String =
    td.options.getOrElse("format", "parquet")

  private def path(td: TableDef): String =
    td.options.getOrElse("path",
      throw new IllegalArgumentException(s"table ${td.name}: no 'path'"))

  /** Batch read; registers the table under its DDL name. */
  def register(spark: SparkSession, ddl: String): DataFrame = {
    val td = parse(ddl)
    require(td.options.get("connector").forall(_ == "filesystem"),
      s"unsupported connector for ${td.name}")
    val df = spark.read.schema(td.schema).format(format(td)).load(path(td))
    df.createOrReplaceTempView(td.name)
    df
  }

  /** Streaming read: same source, with the DDL watermark applied. */
  def readStream(spark: SparkSession, ddl: String): DataFrame = {
    val td = parse(ddl)
    val df = spark.readStream.schema(td.schema)
      .format(format(td)).load(path(td))
    td.watermark.fold(df) { case (c, delay) => df.withWatermark(c, delay) }
  }
}
