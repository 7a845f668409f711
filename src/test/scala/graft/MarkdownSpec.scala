package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** markdownExtract: each rule on hand fixtures, the nesting order
  * (image before link), the declared underscore exemption, and code
  * content survival. */
class MarkdownSpec extends SparkSuite {
  import spark.implicits._

  private def md(s: String): String =
    Seq(s).toDF("m").select(TextAnalysis.markdownExtract(col("m"))).as[String].head()

  test("headers, quotes, lists") {
    assert(md("# H1\n### deep\nSetext\n====\n> quote\n- a\n* b\n+ c\n12. num") ==
      "H1\ndeep\nSetext\nquote\na\nb\nc\nnum")
  }

  test("fences drop, code content survives") {
    assert(md("before\n```python\nx = 1 < 2\n```\nafter") ==
      "before\nx = 1 < 2\nafter")
    assert(md("  ```\nindented fence\n  ```\n") == "indented fence\n")
  }

  test("links: image-before-link nesting, reference style, definitions, autolinks") {
    assert(md("![alt text](http://i.png)") == "alt text")
    assert(md("a [b](http://c) d") == "a b d")
    assert(md("a [b][r] d\n[r]: http://x\n") == "a b d\n")
    assert(md("go <https://ex.com/p> now") == "go https://ex.com/p now")
    // non-autolink angle content untouched
    assert(md("keep <tag> here") == "keep <tag> here")
  }

  test("emphasis marks drop; underscores are exempt (snake_case survives)") {
    assert(md("**bold** *em* `code` ~~gone~~") == "bold em code gone")
    assert(md("my_variable_name and _loose_") == "my_variable_name and _loose_")
  }

  test("plain prose and horizontal rules") {
    assert(md("no markdown here.") == "no markdown here.")
    assert(md("a\n---\nb\n***\nc") == "a\nb\nc")
  }
}
