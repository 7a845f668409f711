package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.SourceReader
import graft.spec.SourceSpec

/** Reference `validate_schema` parity (main.py:476-497): the report is
  * the UNION of per-row OBSERVED value types for each field — Python
  * type names, because that's the reference's vocabulary — not the
  * engine's static column type. A JSON field holding `5` in one row
  * and `"5"` in another reports `["int", "str"]` even though the
  * engine coerces the column to string.
  *
  * Observation strategy per source family:
  *  - json: one distributed pass over the RAW text (JSONL: per line;
  *    array/object root: per file via wholetext) — Spark's reader
  *    coerces mixed scalars, so types must be read off the unparsed
  *    rows. Work is (field, type-name) pairs + a collect_set agg:
  *    scales with the corpus, never materializes documents.
  *  - inline: types straight from the spec's JSON rows (driver-local
  *    by construction). Absent keys are unobserved — matching the
  *    reference, which only unions types for keys present in a row.
  *  - csv: every present cell is a string (DictReader parity);
  *    missing/null cells observe NoneType. One distributed agg.
  *  - typed stores (parquet/sqlite/jdbc): the storage class already
  *    fixes one type per column, so the union is the mapped column
  *    type plus NoneType where nulls occur. (Declared deviation: a
  *    sqlite column with per-value mixed storage classes reports the
  *    codec's inferred column type, not the per-value classes.)
  *
  * Empty sources return the reference's exact empty shape:
  * `{"valid": true, "schema": {}, "rows": 0, "warning": "Empty dataset"}`.
  */
object SchemaValidate extends Serializable {

  /** Full JSON report for the CLI (reference return-dict shape). */
  def report(spark: SparkSession, s: SourceSpec): String = {
    val df =
      try SourceReader.read(spark, s)
      catch { case e: Throwable => return s"""{"valid": false, "error": ${q(e.getMessage)}}""" }
    val rows = df.count()
    if (rows == 0)
      """{"valid": true, "schema": {}, "rows": 0, "warning": "Empty dataset"}"""
    else {
      val types = s.sourceType match {
        case "json"   => jsonObservedTypes(spark, s)
        case "inline" => inlineObservedTypes(s)
        case "csv"    => columnObservedTypes(df, _ => "str")
        case _        => columnObservedTypes(df, pyName)
      }
      val schema = types.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${q(k)}: ${v.sorted.map(q).mkString("[", ", ", "]")}"
      }.mkString(", ")
      s"""{"valid": true, "rows": $rows, "schema": {$schema}}"""
    }
  }

  private def q(s: String): String =
    "\"" + Option(s).getOrElse("").replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t") + "\""

  /** Distributed per-column observation for sources whose column type
    * is static: mapped type name where non-null, NoneType where null.
    */
  private def columnObservedTypes(
      df: DataFrame, name: DataType => String): Map[String, Seq[String]] = {
    val fields = df.schema.fields
    val aggs = fields.map { f =>
      collect_set(when(df.col(f.name).isNull, "NoneType")
        .otherwise(name(f.dataType))).as(f.name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    fields.zipWithIndex.map { case (f, i) => f.name -> row.getSeq[String](i) }.toMap
  }

  private def pyName(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int"
    case FloatType | DoubleType | _: DecimalType      => "float"
    case BooleanType                                   => "bool"
    case BinaryType                                    => "bytes"
    case _: ArrayType                                  => "list"
    case _: StructType | _: MapType                    => "dict"
    case _                                             => "str" // strings, dates, timestamps
  }

  /** One pass over the raw JSON text: Spark's reader coerces mixed
    * scalars to one column type, so observed types must come from the
    * unparsed rows. JSONL → line per row; array/object root → file per
    * doc (wholetext — those roots are unsplittable by nature).
    */
  private def jsonObservedTypes(spark: SparkSession, s: SourceSpec): Map[String, Seq[String]] = {
    import spark.implicits._
    val lines = s.config.bool("lines").getOrElse(false)
    val path = s.config.reqStr("path")
    val raw =
      if (lines) spark.read.textFile(path).filter(t => t.trim.nonEmpty)
      else spark.read.option("wholetext", true).textFile(path)
    raw.mapPartitions { it =>
      it.flatMap { txt =>
        JsonMethods.parse(txt) match {
          case JArray(els) => els.iterator.flatMap(rowFieldTypes)
          case v           => rowFieldTypes(v)
        }
      }
    }.toDF("field", "tpe")
      .groupBy("field").agg(collect_set("tpe").as("ts"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
  }

  private def inlineObservedTypes(s: SourceSpec): Map[String, Seq[String]] =
    s.config.rawList("data").iterator.flatMap(rowFieldTypes)
      .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }

  private def rowFieldTypes(v: JValue): Iterator[(String, String)] = v match {
    case JObject(fs) => fs.iterator.map { case (k, fv) => (k, jsonTypeName(fv)) }
    case _           => Iterator.empty
  }

  /** Python's type-name vocabulary over JSON values (what the
    * reference's `type(v).__name__` yields after `json.loads`). */
  private def jsonTypeName(v: JValue): String = v match {
    case JInt(_) | JLong(_)       => "int"
    case JDouble(_) | JDecimal(_) => "float"
    case JString(_)               => "str"
    case JBool(_)                 => "bool"
    case JNull | JNothing         => "NoneType"
    case JArray(_)                => "list"
    case _: JObject               => "dict"
    case JSet(_)                  => "list"
  }
}
