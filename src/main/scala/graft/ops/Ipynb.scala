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
  * drops — declared. nbformat 3 (`worksheets`) reads too (round 13;
  * was refused): worksheets concatenate in order, code cells take
  * their `input` field, and `heading` cells convert to markdown with
  * a `'#' * level` prefix — exactly the published nbformat
  * v3-to-v4 upgrade rules, so both vintages surface one schema.
  * v3 language comes from `metadata.language`, else the first code
  * cell's own `language`.
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
    def joined(v: JValue): Option[String] = v match {
      case JString(s) => Some(s)
      case JArray(parts) =>
        val sb = new StringBuilder
        parts.foreach {
          case JString(p) => sb.append(p)
          case _ => return None
        }
        Some(sb.toString)
      case JNothing => Some("")
      case _ => None
    }
    root match {
      case obj: JObject =>
        obj \ "worksheets" match {
          case JNothing =>
            // nbformat 4: top-level cells array
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
                val source = joined(c \ "source") match {
                  case Some(s) => s
                  case None => return None
                }
                out += ((tpe, source))
              case _ => return None
            }
            Some((lang, out.result()))
          case JArray(sheets) =>
            // nbformat 3: worksheets concatenate; the v3->v4 upgrade
            // rules applied (input -> source, heading -> markdown)
            var lang: String = obj \ "metadata" \ "language" match {
              case JString(s) => s
              case _ => null
            }
            val out = Seq.newBuilder[(String, String)]
            sheets.foreach {
              case ws: JObject =>
                val cellsJ = ws \ "cells" match {
                  case JArray(cs) => cs
                  case JNothing => Nil
                  case _ => return None
                }
                cellsJ.foreach {
                  case c: JObject =>
                    val tpe = c \ "cell_type" match {
                      case JString(t) => t
                      case _ => return None
                    }
                    tpe match {
                      case "code" =>
                        val source = joined(c \ "input") match {
                          case Some(s) => s
                          case None => return None
                        }
                        if (lang == null) c \ "language" match {
                          case JString(s) => lang = s
                          case _ => ()
                        }
                        out += (("code", source))
                      case "heading" =>
                        val level = c \ "level" match {
                          case JInt(l) if l >= 1 && l <= 6 => l.toInt
                          case JNothing => 1
                          case _ => return None
                        }
                        val source = joined(c \ "source") match {
                          case Some(s) => s
                          case None => return None
                        }
                        out += (("markdown", "#" * level + " " + source))
                      case _ =>
                        val source = joined(c \ "source") match {
                          case Some(s) => s
                          case None => return None
                        }
                        out += ((tpe, source))
                    }
                  case _ => return None
                }
              case _ => return None
            }
            Some((lang, out.result()))
          case _ => return None
        }
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

  /** nbformat-3 twin of [[packTextIpynb]]: worksheets layout, code
    * cells carrying `input` (per-cell `language`, no notebook-level
    * one), every third line a `heading` cell with level cycling 1-3
    * — so the v3→v4 upgrade rules (input→source, heading→`#`-prefixed
    * markdown, language from the first code cell) are all
    * load-bearing in the gate. Two worksheets when id % 4 == 0: the
    * concatenation order is part of the contract. */
  def packTextIpynbV3(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(coalesce(col(idCol).cast("long"), lit(0L)),
        coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .map { case (id, text) =>
        def cellOf(line: String, i: Int): JObject =
          if (i % 3 == 2) JObject(
            "cell_type" -> JString("heading"),
            "level" -> JInt((i / 3) % 3 + 1), // cycles 1..3
            "source" -> JArray(List(JString(line))))
          else if (i % 3 == 0) JObject(
            "cell_type" -> JString("code"),
            "language" -> JString("python"),
            "input" -> JArray(List(JString(line))),
            "outputs" -> JArray(Nil),
            "collapsed" -> JBool(false))
          else JObject(
            "cell_type" -> JString("markdown"),
            "source" -> JArray(List(JString(line))))
        val lines = text.split("\n", -1).toList.zipWithIndex
        val cells = lines.map { case (l, i) => cellOf(l, i) }
        val (wsA, wsB) = if (id % 4 == 0 && cells.length > 1)
          cells.splitAt(cells.length / 2) else (cells, Nil)
        def ws(cs: List[JObject]) = JObject("cells" -> JArray(cs), "metadata" -> JObject())
        val nb = JObject(
          "metadata" -> JObject("name" -> JString(s"nb $id")),
          "nbformat" -> JInt(3), "nbformat_minor" -> JInt(0),
          "worksheets" -> JArray(ws(wsA) :: (if (wsB.nonEmpty) List(ws(wsB)) else Nil)))
        (id, JsonMethods.compact(JsonMethods.render(nb)).getBytes("UTF-8"))
      }
      .toDF("id", "payload")
  }
}
