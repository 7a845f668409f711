package graft

import graft.ops.Xml
import org.scalatest.funsuite.AnyFunSuite

/** From-spec XML 1.0 subset: structure, the misc layer, references,
  * and the well-formedness refusal ladder — pure JVM, no Spark. The
  * `xml` SOURCE surface (record-per-element reads) is in
  * [[XmlSourceSpec]]. */
class XmlSpec extends AnyFunSuite {

  test("structure: nesting, attributes in both quote styles, self-closing") {
    val e = Xml.parse(
      """<r a="1" b='two'><c x="y"/><c>t1<d>deep</d>t2</c></r>""").get
    assert(e.name == "r" && e.attrs == List("a" -> "1", "b" -> "two"))
    assert(e.elems("c").size == 2)
    assert(e.elems("c")(1).text == "t1deept2")
    assert(e.elems("c").head.attr("x").contains("y"))
    assert(e.attr("nope").isEmpty)
  }

  test("misc layer: declaration, PI, comments, DOCTYPE with internal subset") {
    val doc = """<?xml version="1.0" encoding="UTF-8"?>
                |<!-- lead comment -->
                |<!DOCTYPE r [ <!ELEMENT r (#PCDATA)> ]>
                |<?pi target data?>
                |<r>a<!-- mid -->b<?pi2?>c</r>
                |<!-- trail -->""".stripMargin
    assert(Xml.parse(doc).get.text == "abc")
  }

  test("references: predefined entities, decimal and hex char refs") {
    val e = Xml.parse("<r t=\"&lt;&amp;&quot;\">&gt;&apos;&#65;&#x42;&#x1F600;</r>").get
    assert(e.attr("t").contains("<&\""))
    assert(e.text == ">'AB😀")
  }

  test("CDATA: markup inside is character data") {
    val e = Xml.parse("<r><![CDATA[<not><a>tag &amp;]]>x</r>").get
    assert(e.text == "<not><a>tag &amp;x")
  }

  test("namespace prefixes kept, local() strips them") {
    val e = Xml.parse("""<ns:r xmlns:ns="u"><ns:c>v</ns:c></ns:r>""").get
    assert(e.name == "ns:r" && e.local == "r")
    assert(e.elems("c").head.text == "v")
  }

  test("well-formedness refusals") {
    assert(Xml.parse("").isEmpty)
    assert(Xml.parse("just text").isEmpty)
    assert(Xml.parse("<r><c></r></c>").isEmpty)       // mismatched close
    assert(Xml.parse("<r>").isEmpty)                  // unterminated
    assert(Xml.parse("<r></r><r2></r2>").isEmpty)     // two roots
    assert(Xml.parse("<r>&undeclared;</r>").isEmpty)  // undeclared entity
    assert(Xml.parse("<r>&#xZZ;</r>").isEmpty)        // malformed char ref
    assert(Xml.parse("<r>a & b</r>").isEmpty)         // stray ampersand
    assert(Xml.parse("<r>a ]]> b</r>").isEmpty)       // §2.4 in char data
    assert(Xml.parse("<r a=unquoted></r>").isEmpty)   // XML requires quotes
    assert(Xml.parse("<r a=\"x\" a2=\"<\"></r>").isEmpty) // '<' in AttValue
    assert(Xml.parse("<r><!-- a -- b --></r>").isEmpty)   // '--' in comment
    assert(Xml.parse("<1bad></1bad>").isEmpty)        // name start char
  }

  test("depth cap refuses crafted nesting, flat breadth is fine") {
    val deep = "<a>" * 400 + "</a>" * 400
    assert(Xml.parse(deep).isEmpty)
    val wide = "<r>" + "<c/>" * 5000 + "</r>"
    assert(Xml.parse(wide).get.elems("c").size == 5000)
  }
}
