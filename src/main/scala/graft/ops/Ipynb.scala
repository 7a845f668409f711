package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Jupyter notebook (.ipynb) cell extraction — the CODE-corpus rung
  * of the document tier: notebooks are a first-class pre-training
  * source for code models, and the format is public (nbformat 4, a
  * JSON schema): a `cells` array of `{cell_type, source}` objects
  * where `source` is either one string or the on-disk line-array
  * form (lines keeping their trailing newlines — joined verbatim,
  * not re-terminated), plus `metadata.language_info.name`. Outputs,
  * execution counts, and attachments are metadata a text corpus
  * drops — declared. nbformat 3 (`worksheets`) is refused, not
  * half-read.
  *
  * Long output format, one row per cell: (id, seq, cell_type,
  * language, source) — downstream filters keep code cells, drops
  * markdown, or interleaves them into training documents with
  * ordinary ops. Never throws; malformed JSON or schema emits
  * nothing / quarantines at the source surface.
  */
object Ipynb {

  /** (language, cells as (cell_type, source)) — None on malformed
    * or non-nbformat-4 payloads. */
  def cells(payload: Array[Byte]): Option[(String, Seq[(String, String)])] = {
    val root = try {
      JsonMethods.parse(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => return None }
    root match {
      case obj: JObject =>
        obj \ "worksheets" match {
          case JNothing => ()
          case _ => return None // nbformat 3: refused, declared
        }
        val cellsJ = obj \ "cells" match {
          case JArray(cs) => cs
          case _ => return None
        }
        val lang = obj \ "metadata" \ "language_info" \ "name" match {
          case JString(s) => s
          case _ => null
        }
        val out = Seq.newBuilder[(String, String)]
        cellsJ.foreach {
          case c: JObject =>
            val tpe = c \ "cell_type" match {
              case JString(t) => t
              case _ => return None
            }
            val source = c \ "source" match {
              case JString(s) => s
              case JArray(parts) =>
                val sb = new StringBuilder
                parts.foreach {
                  case JString(p) => sb.append(p)
                  case _ => return None
                }
                sb.toString
              case JNothing => ""
              case _ => return None
            }
            out += ((tpe, source))
          case _ => return None
        }
        Some((lang, out.result()))
      case _ => None
    }
  }

  /** (id, seq, cell_type, language, source) rows — scan-local,
    * malformed payloads emit nothing. */
  def decodeCells(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        cells(if (payload == null) Array.emptyByteArray else payload) match {
          case Some((lang, cs)) => cs.zipWithIndex.map { case ((t, s), i) =>
            (id, i, t, lang, s)
          }
          case None => Seq.empty
        }
      }
      .toDF("id", "seq", "cell_type", "language", "source")
  }

  /** Minimal spec-valid nbformat-4 notebook per document: one cell
    * per text line in the on-disk ARRAY source form, cell types
    * alternating code/markdown, python language_info. json4s does
    * the escaping, so arbitrary corpus bytes round-trip. */
  def packTextIpynb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val cellsJ = text.split("\n", -1).toList.zipWithIndex.map { case (line, i) =>
          JObject(
            "cell_type" -> JString(if (i % 2 == 0) "code" else "markdown"),
            "metadata" -> JObject(),
            "source" -> JArray(List(JString(line))))
        }
        val nb = JObject(
          "cells" -> JArray(cellsJ),
          "metadata" -> JObject("language_info" -> JObject("name" -> JString("python"))),
          "nbformat" -> JInt(4), "nbformat_minor" -> JInt(5))
        (id, JsonMethods.compact(JsonMethods.render(nb)).getBytes("UTF-8"))
      }
      .toDF("id", "payload")
  }
}
