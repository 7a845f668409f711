package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every shipped example pipeline must PARSE and VALIDATE against
  * the current op registry — the README claims they run as-is, and
  * ops evolve; this is the drift guard (pure JVM, no Spark: paths in
  * the examples point at user data). */
class ExamplesSpec extends AnyFunSuite {

  private val dir = new java.io.File("examples")

  test("examples directory ships pipelines") {
    assert(dir.isDirectory)
    assert(dir.listFiles().count(_.getName.endsWith(".json")) >= 8)
  }

  dir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).foreach { f =>
    test(s"example ${f.getName} parses and validates") {
      val spec = graft.spec.SpecJson.parse(
        java.nio.file.Files.readString(f.toPath))
      graft.compile.PipelineCompiler.validate(spec)
      assert(spec.name.nonEmpty && spec.sources.nonEmpty && spec.sinks.nonEmpty)
    }
  }
}
