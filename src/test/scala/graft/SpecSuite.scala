package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spec._

/** Spec model + JSON codec + validation (pure JVM, no Spark). */
class SpecSuite extends AnyFunSuite {

  private val spec = PipelineSpec(
    name = "p1", description = "d",
    sources = Seq(SourceSpec("s1", "inline", Config.of("data" -> Seq(Map("x" -> 1))))),
    transforms = Seq(
      TransformSpec("f", "filter", Config.of("field" -> "x", "op" -> "gt", "value" -> 0), Nil, 0),
      TransformSpec("a", "aggregate", Config.of("group_by" -> Seq("x")), Seq("f"), 1)),
    sinks = Seq(SinkSpec("out", "stdout")))

  test("spec JSON round-trip preserves everything") {
    val parsed = SpecJson.parse(spec.json)
    assert(parsed.name == "p1")
    assert(parsed.sources.head.sourceType == "inline")
    assert(parsed.transforms.map(_.name) == Seq("f", "a"))
    assert(parsed.transforms(1).dependsOn == Seq("f"))
    assert(parsed.transforms(1).orderIndex == 1)
    assert(parsed.sinks.head.sinkType == "stdout")
    assert(parsed.transforms.head.config.str("op").contains("gt"))
    assert(parsed.transforms.head.config.int("value").contains(0))
  }

  test("config accessors: typed reads and errors") {
    val c = Config.parse("""{"s":"x","i":7,"d":1.5,"b":true,"l":["a","b"],"m":{"k":"v"}}""")
    assert(c.reqStr("s") == "x")
    assert(c.int("i").contains(7))
    assert(c.double("d").contains(1.5))
    assert(c.bool("b").contains(true))
    assert(c.strList("l") == Seq("a", "b"))
    assert(c.strMap("m") == Map("k" -> "v"))
    assert(c.str("missing").isEmpty)
    assertThrows[GraftAnalysisException](c.reqStr("missing"))
  }

  test("missing order_index defaults to position") {
    val p = SpecJson.parse(
      """{"name":"x","sources":[{"name":"a","type":"inline","config":{"data":[{"v":1}]}}],
         "transforms":[{"type":"filter","config":{}},{"type":"select","config":{}}],
         "sinks":[]}""")
    assert(p.transforms.map(_.orderIndex) == Seq(0, 1))
    assert(p.transforms.map(_.name) == Seq("t0", "t1"))
  }

  test("driver contract: every oracle key names a query; rows-only set is the declared whitelist") {
    // a typo'd oracleSql key would silently downgrade that query to a
    // rows-only check in the driver compare — fail loudly instead
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql keys with no query: $dangling")
    // every query must carry an oracle: since round 8 even the sketch
    // gate (x_approx) ships a hash-checkable exact-value + verdict
    // contract, so the rows-only whitelist is empty
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"unexpected rows-only queries (add an oracle or document here): $rowsOnly")
  }
}
