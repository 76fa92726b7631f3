package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CDC envelope decoding (FLIP-105): debezium-json and canal-json
  * payloads → changelog rows tagged with a Flink-style `row_kind`
  * column (`+I` INSERT, `-U` UPDATE_BEFORE, `+U` UPDATE_AFTER, `-D`
  * DELETE — flink-core RowKind, SURVEY.md §1.1).
  *
  * Spark has no native retract streams (SURVEY.md §2.1 CDC row), so the
  * changelog is materialized as an explicit column over exploded
  * envelope parts — the convention the changelog layer (§7.4) builds
  * on: downstream either aggregates kinds directly or applies them as a
  * MERGE in foreachBatch. Pure narrow ops (from_json + explode):
  * parallelism is the source's, no shuffle.
  *
  * Reference: flink-formats/flink-json debezium/DebeziumJsonDeserializationSchema.java,
  * canal/CanalJsonDeserializationSchema.java.
  */
object CdcFormats {

  /** Decodes a debezium-json envelope column
    * `{"before":…,"after":…,"op":"c|r|u|d","ts_ms":…}` into changelog
    * rows: one `+I` for c/r, `-U`+`+U` for u, `-D` for d.
    */
  def fromDebezium(df: DataFrame, json: Column, payload: StructType): DataFrame = {
    val envelope = new StructType()
      .add("before", payload).add("after", payload)
      .add("op", "string").add("ts_ms", "long")
    val parts = df.withColumn("__env", from_json(json, envelope))
      .withColumn("__parts", expr(
        """CASE __env.op
             WHEN 'u' THEN array(struct('-U' AS row_kind, __env.before AS data),
                                 struct('+U' AS row_kind, __env.after AS data))
             WHEN 'd' THEN array(struct('-D' AS row_kind, __env.before AS data))
             ELSE array(struct('+I' AS row_kind, __env.after AS data))
           END"""))
      .withColumn("__p", explode(col("__parts")))
    parts.select(
      col("__p.row_kind").as("row_kind"),
      col("__env.ts_ms").as("ts_ms"),
      col("__p.data.*"))
  }

  /** Decodes a canal-json envelope column
    * `{"data":[…],"old":[…],"type":"INSERT|UPDATE|DELETE"}`. UPDATE's
    * `old` carries only changed fields; the emitted `-U` row is
    * `data` overlaid with `old` (canal semantics).
    */
  def fromCanal(df: DataFrame, json: Column, payload: StructType): DataFrame = {
    val envelope = new StructType()
      .add("data", org.apache.spark.sql.types.ArrayType(payload))
      .add("old", org.apache.spark.sql.types.ArrayType(payload))
      .add("type", "string")
    // Decode like the debezium path: parse the envelope once, build the
    // whole changelog array with transform() over data (the old[] row
    // is zipped positionally via the lambda index), ONE explode. The
    // previous shape — explode(sequence) + per-index array access + a
    // second explode — paid two Generate nodes and re-evaluated the
    // parsed envelope per index reference (4x slower than debezium on
    // identical data).
    val overlaid = payload.fieldNames.map(f =>
      s"coalesce(__env.old[i].$f, d.$f) AS $f").mkString(", ")
    df.withColumn("__env", from_json(json, envelope))
      .withColumn("__parts", expr(
        s"""CASE __env.type
             WHEN 'UPDATE' THEN flatten(transform(__env.data, (d, i) -> array(
               struct('-U' AS row_kind, struct($overlaid) AS data),
               struct('+U' AS row_kind, d AS data))))
             WHEN 'DELETE' THEN transform(__env.data,
               d -> struct('-D' AS row_kind, d AS data))
             ELSE transform(__env.data,
               d -> struct('+I' AS row_kind, d AS data))
           END"""))
      .withColumn("__p", explode(col("__parts")))
      .select(col("__p.row_kind").as("row_kind"), col("__p.data.*"))
  }
}
