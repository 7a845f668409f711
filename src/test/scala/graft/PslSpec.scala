package graft

import graft.ops.Psl
import org.apache.spark.sql.functions.col

/** Public-suffix algorithm: the format spec's own worked example
  * (the hokkaido/tokyo geographic block), the published test-vector
  * conventions (mixed case, leading dot, unlisted TLD), rule
  * selection rungs, and the Spark column surface. */
class PslSpec extends SparkSuite {
  import spark.implicits._

  // the format spec's own example block, comments included
  private val JpRules = Psl.parse(Seq(
    "// jp : https://en.wikipedia.org/wiki/.jp",
    "jp",
    "// jp geographic type names",
    "*.hokkaido.jp",
    "*.tokyo.jp",
    "!pref.hokkaido.jp",
    "!metro.tokyo.jp",
    ""))

  private def reg(h: String, r: Psl.Rules = JpRules) = Psl.registrableDomain(h, r)
  private def ps(h: String, r: Psl.Rules = JpRules) = Psl.publicSuffix(h, r)

  test("format spec's jp example: wildcards and exceptions") {
    assert(ps("foo.bar.hokkaido.jp").contains("bar.hokkaido.jp"))
    assert(reg("foo.bar.hokkaido.jp").contains("foo.bar.hokkaido.jp"))
    assert(reg("bar.hokkaido.jp").isEmpty) // IS a public suffix
    // exception: pref.hokkaido.jp is registrable despite the wildcard
    assert(ps("pref.hokkaido.jp").contains("hokkaido.jp"))
    assert(reg("pref.hokkaido.jp").contains("pref.hokkaido.jp"))
    assert(reg("www.pref.hokkaido.jp").contains("pref.hokkaido.jp"))
    assert(reg("metro.tokyo.jp").contains("metro.tokyo.jp"))
    assert(reg("anything.jp").contains("anything.jp"))
    assert(reg("jp").isEmpty)
  }

  test("test-vector conventions: case, dots, unlisted TLD, default rule") {
    val r = Psl.parse(Seq("com", "biz"))
    assert(reg("example.COM", r).contains("example.com"))
    assert(reg("WwW.example.COM", r).contains("example.com"))
    assert(reg(".com", r).isEmpty)          // leading dot invalid
    assert(reg("a..com", r).isEmpty)        // empty label invalid
    assert(reg("", r).isEmpty)
    assert(reg(null, r).isEmpty)
    assert(reg("example.com.", r).contains("example.com")) // root dot stripped
    assert(reg("biz", r).isEmpty)
    assert(reg("domain.biz", r).contains("domain.biz"))
    // unlisted TLD: default rule '*' makes the last label the suffix
    assert(reg("example.unlisted", r).contains("example.unlisted"))
    assert(reg("a.b.example.unlisted", r).contains("example.unlisted"))
    assert(reg("unlisted", r).isEmpty)
  }

  test("rule selection: most labels wins, exception beats all") {
    val r = Psl.parse(Seq("uk", "co.uk", "sch.uk", "*.sch.uk"))
    assert(ps("x.co.uk", r).contains("co.uk"))        // 2 > 1
    assert(reg("a.b.x.co.uk", r).contains("x.co.uk"))
    assert(ps("y.kent.sch.uk", r).contains("kent.sch.uk")) // wildcard 3 > 2
    val ex = Psl.parse(Seq("uk", "*.uk", "!special.uk"))
    assert(reg("special.uk", ex).contains("special.uk"))
    assert(reg("w.special.uk", ex).contains("special.uk"))
    assert(reg("other.uk", ex).isEmpty) // *.uk: other.uk IS a suffix
  }

  test("column surface: url host extraction + schemeless null") {
    val r = Psl.parse(Seq("com", "co.uk"))
    val df = Seq(
      (1L, "https://www.shop.example.com/p?x=1"),
      (2L, "http://news.bbc.co.uk/story"),
      (3L, "no-scheme/path")).toDF("id", "url")
    val got = Psl.withRegistrableDomain(df, "url", "rd", r)
      .select("id", "rd").collect().map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(got(1L).contains("example.com"))
    assert(got(2L).contains("bbc.co.uk"))
    assert(got(3L).isEmpty)
  }
}
