package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.GraftAnalysisException

/** Pipeline specification model.
  *
  * Mirrors the reference's metadata-catalog schema (reference
  * main.py:35-79: pipelines / sources / transforms / sinks tables with
  * JSON `config` columns) as immutable Scala case classes. The catalog
  * is control-plane only; the dataflow compiles to Spark DataFrames
  * (see [[graft.compile.PipelineCompiler]]).
  *
  * `dependsOn` is kept for surface parity with the reference
  * (main.py:59,149) but — like the reference (main.py:429,446-447) —
  * execution order is `orderIndex`; we additionally *validate* that
  * every declared dependency names an existing transform, which the
  * reference never does (SURVEY §1.3).
  */
final case class SourceSpec(name: String, sourceType: String, config: Config = Config.empty)

final case class TransformSpec(
    name: String,
    transformType: String,
    config: Config = Config.empty,
    dependsOn: Seq[String] = Nil,
    orderIndex: Int = 0)

final case class SinkSpec(name: String, sinkType: String, config: Config = Config.empty)

final case class PipelineSpec(
    name: String,
    description: String = "",
    sources: Seq[SourceSpec] = Nil,
    transforms: Seq[TransformSpec] = Nil,
    sinks: Seq[SinkSpec] = Nil) {
  def json: String = SpecJson.render(this)
}

/** Thin dynamic-config wrapper over a json4s JObject: the JSON `config`
  * column of the reference catalog (main.py:48,58,66), with typed,
  * error-checked accessors. Unknown keys are ignored (reference
  * behavior); missing required keys are analysis errors.
  */
final case class Config(jv: JObject) {
  private def get(k: String): Option[JValue] =
    jv.obj.collectFirst { case (`k`, v) if v != JNull && v != JNothing => v }

  def has(k: String): Boolean = get(k).isDefined

  def str(k: String): Option[String] = get(k).map {
    case JString(s) => s
    case JInt(i)    => i.toString
    case JLong(i)   => i.toString
    case JDouble(d) => d.toString
    case JBool(b)   => b.toString
    case other      => JsonMethods.compact(JsonMethods.render(other))
  }
  def reqStr(k: String): String =
    str(k).getOrElse(throw new GraftAnalysisException(s"missing required config key '$k'"))

  def int(k: String): Option[Int] = get(k).map {
    case JInt(i)    => i.toInt
    case JLong(i)   => i.toInt
    case JDouble(d) => d.toInt
    case JString(s) => s.toInt
    case other => throw new GraftAnalysisException(s"config key '$k' is not an int: $other")
  }
  def long(k: String): Option[Long] = get(k).map {
    case JInt(i)    => i.toLong
    case JLong(i)   => i
    case JDouble(d) => d.toLong
    case JString(s) => s.toLong
    case other => throw new GraftAnalysisException(s"config key '$k' is not a long: $other")
  }
  def reqLong(k: String): Long =
    long(k).getOrElse(throw new GraftAnalysisException(s"missing required config key '$k'"))

  def double(k: String): Option[Double] = get(k).map {
    case JInt(i)    => i.toDouble
    case JLong(i)   => i.toDouble
    case JDouble(d) => d
    case JString(s) => s.toDouble
    case other => throw new GraftAnalysisException(s"config key '$k' is not a number: $other")
  }
  def bool(k: String): Option[Boolean] = get(k).map {
    case JBool(b)   => b
    case JString(s) => s.toBoolean
    case other => throw new GraftAnalysisException(s"config key '$k' is not a bool: $other")
  }

  def strList(k: String): Seq[String] = get(k) match {
    case Some(JArray(xs)) => xs.map {
      case JString(s) => s
      case other => throw new GraftAnalysisException(s"config key '$k' has non-string element: $other")
    }
    case Some(JString(s)) => Seq(s)
    case Some(other) => throw new GraftAnalysisException(s"config key '$k' is not a list: $other")
    case None => Nil
  }

  /** Raw JSON value, e.g. the comparison literal of a filter. */
  def value(k: String): Option[JValue] = get(k)

  /** Nested object as string→string map (e.g. rename mapping). */
  def strMap(k: String): Map[String, String] = get(k) match {
    case Some(JObject(fields)) => fields.map {
      case (kk, JString(v)) => kk -> v
      // scalar values stringify (a JSON author writing {"en": 3} means
      // "3"); only structured values are a type error
      case (kk, JInt(v))    => kk -> v.toString
      case (kk, JLong(v))   => kk -> v.toString
      case (kk, JDouble(v)) => kk -> v.toString
      case (kk, JBool(v))   => kk -> v.toString
      case (kk, other) => throw new GraftAnalysisException(s"mapping '$k.$kk' is not a scalar: $other")
    }.toMap
    case Some(other) => throw new GraftAnalysisException(s"config key '$k' is not an object: $other")
    case None => Map.empty
  }

  /** List of nested objects (e.g. multi-aggregation list). */
  def objList(k: String): Seq[Config] = get(k) match {
    case Some(JArray(xs)) => xs.map {
      case o: JObject => Config(o)
      case other => throw new GraftAnalysisException(s"config key '$k' has non-object element: $other")
    }
    case Some(o: JObject) => Seq(Config(o))
    case Some(other) => throw new GraftAnalysisException(s"config key '$k' is not a list: $other")
    case None => Nil
  }

  /** List of raw rows for the inline source (reference main.py:113-114). */
  def rawList(k: String): Seq[JValue] = get(k) match {
    case Some(JArray(xs)) => xs
    case Some(other) => throw new GraftAnalysisException(s"config key '$k' is not a list: $other")
    case None => Nil
  }
}

object Config {
  val empty: Config = Config(JObject(Nil))
  def parse(json: String): Config = JsonMethods.parse(json) match {
    case o: JObject => Config(o)
    case other => throw new GraftAnalysisException(s"config is not a JSON object: $other")
  }
  def of(kvs: (String, Any)*): Config = Config(JObject(kvs.toList.map { case (k, v) => k -> toJ(v) }))
  private def toJ(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case i: Int => JInt(i)
    case l: Long => JInt(l)
    case d: Double => JDouble(d)
    case b: Boolean => JBool(b)
    case j: JValue => j
    case m: Map[_, _] => JObject(m.toList.map { case (k, vv) => k.toString -> toJ(vv) })
    case xs: Seq[_] => JArray(xs.toList.map(toJ))
    case other => JString(other.toString)
  }
}

/** JSON (de)serialization of pipeline specs — the persistence format of
  * the catalog (see [[graft.catalog.MetaStore]]).
  */
object SpecJson {
  def render(p: PipelineSpec): String = {
    def srcJ(s: SourceSpec): JValue =
      JObject("name" -> JString(s.name), "type" -> JString(s.sourceType), "config" -> s.config.jv)
    def trJ(t: TransformSpec): JValue = JObject(
      "name" -> JString(t.name), "type" -> JString(t.transformType), "config" -> t.config.jv,
      "depends_on" -> JArray(t.dependsOn.toList.map(JString(_))), "order_index" -> JInt(t.orderIndex))
    def snkJ(s: SinkSpec): JValue =
      JObject("name" -> JString(s.name), "type" -> JString(s.sinkType), "config" -> s.config.jv)
    JsonMethods.pretty(JsonMethods.render(JObject(
      "name" -> JString(p.name),
      "description" -> JString(p.description),
      "sources" -> JArray(p.sources.toList.map(srcJ)),
      "transforms" -> JArray(p.transforms.toList.map(trJ)),
      "sinks" -> JArray(p.sinks.toList.map(snkJ)))))
  }

  def parse(json: String): PipelineSpec = {
    val c = Config.parse(json)
    PipelineSpec(
      name = c.reqStr("name"),
      description = c.str("description").getOrElse(""),
      sources = c.objList("sources").map(s =>
        SourceSpec(s.reqStr("name"), s.reqStr("type"),
          s.value("config").collect { case o: JObject => Config(o) }.getOrElse(Config.empty))),
      transforms = c.objList("transforms").zipWithIndex.map { case (t, i) =>
        TransformSpec(
          t.str("name").getOrElse(s"t$i"), t.reqStr("type"),
          t.value("config").collect { case o: JObject => Config(o) }.getOrElse(Config.empty),
          t.strList("depends_on"),
          t.int("order_index").getOrElse(i))
      },
      sinks = c.objList("sinks").map(s =>
        SinkSpec(s.reqStr("name"), s.reqStr("type"),
          s.value("config").collect { case o: JObject => Config(o) }.getOrElse(Config.empty))))
  }
}
