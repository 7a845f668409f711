package graft

import java.nio.file.{Files, Path}
import scala.sys.process._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.catalog.SqliteData
import graft.sinks.SinkWriter
import graft.sources.SourceReader
import graft.spec.{Config, SinkSpec, SourceSpec}

/** Data-plane sqlite source/sink (reference main.py:130-138 source,
  * main.py:326-341 sink) proven against REAL SQLite: python3's sqlite3
  * module writes files we read, and reads files we write — the same
  * cross-library contract the catalog spec establishes, now for
  * arbitrary user data.
  */
class SqliteDataSpec extends SparkSuite {
  import spark.implicits._

  private def python(script: String): String = {
    val f = Files.createTempFile("sqlitedata", ".py")
    Files.writeString(f, script)
    Seq("python3", f.toString).!!.trim
  }

  private def tmpDb(): Path =
    Files.createTempDirectory("graftsqlitedata").resolve("data.db")

  test("reads a typed table real sqlite3 wrote: ints, reals, text, blobs, NULLs") {
    val db = tmpDb()
    python(s"""
import sqlite3
conn = sqlite3.connect("$db")
conn.execute("CREATE TABLE t (id INTEGER, score REAL, name TEXT, payload BLOB)")
conn.execute("INSERT INTO t VALUES (1, 1.5, 'alpha', x'DEADBEEF')")
conn.execute("INSERT INTO t VALUES (-9007199254740993, -0.25, 'uni\\u00e9\\u4e2d\\u6587', NULL)")
conn.execute("INSERT INTO t VALUES (NULL, NULL, NULL, x'00FF')")
conn.commit(); conn.close()
print("ok")
""")
    val df = SqliteData.readTable(spark, db.toString, "t")
    assert(df.columns.toSeq == Seq("id", "score", "name", "payload"))
    assert(df.schema.map(_.dataType.typeName) == Seq("long", "double", "string", "binary"))
    val rows = df.orderBy(asc_nulls_last("id")).collect()
    assert(rows(0) match {
      case Row(-9007199254740993L, -0.25, s: String, null) => s == "unié中文"
      case _ => false
    })
    assert(rows(1).getLong(0) == 1L && rows(1).getDouble(1) == 1.5)
    assert(rows(1).getAs[Array[Byte]](3).toSeq == Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("mixed-type column (sqlite dynamic typing) infers string; int+real infers double") {
    val db = tmpDb()
    python(s"""
import sqlite3
conn = sqlite3.connect("$db")
conn.execute("CREATE TABLE m (a, b)")
conn.execute("INSERT INTO m VALUES (1, 1)")
conn.execute("INSERT INTO m VALUES ('two', 2.5)")
conn.commit(); conn.close()
print("ok")
""")
    val df = SqliteData.readTable(spark, db.toString, "m")
    assert(df.schema.map(_.dataType.typeName) == Seq("string", "double"))
    assert(df.orderBy("a").as[(String, Double)].collect().toSeq == Seq(("1", 1.0), ("two", 2.5)))
  }

  test("query mode joins two tables in the file through Spark SQL") {
    val db = tmpDb()
    python(s"""
import sqlite3
conn = sqlite3.connect("$db")
conn.execute("CREATE TABLE emp (name TEXT, dept_id INTEGER)")
conn.execute("CREATE TABLE dept (dept_id INTEGER, dept TEXT)")
conn.executemany("INSERT INTO emp VALUES (?,?)", [("ann",1),("bob",2),("cy",1)])
conn.executemany("INSERT INTO dept VALUES (?,?)", [(1,"eng"),(2,"ops")])
conn.commit(); conn.close()
print("ok")
""")
    val out = SqliteData.readQuery(spark, db.toString,
      "SELECT d.dept, count(*) AS n FROM emp e JOIN dept d ON e.dept_id = d.dept_id GROUP BY d.dept")
      .as[(String, Long)].collect().toMap
    assert(out == Map("eng" -> 2L, "ops" -> 1L))
  }

  test("sink writes a db real sqlite3 reads back, typed; append mode appends") {
    val db = tmpDb()
    val df = Seq((1L, 2.5, "x"), (2L, -1.0, "y")).toDF("k", "v", "s")
    SinkWriter.write(df, SinkSpec("out", "sqlite",
      Config.of("database" -> db.toString, "table" -> "results")))
    // second write with default (append) mode — reference CREATE IF
    // NOT EXISTS + INSERT semantics (main.py:333-339)
    SinkWriter.write(df.limit(1), SinkSpec("out", "sqlite",
      Config.of("database" -> db.toString, "table" -> "results")))
    val out = python(s"""
import sqlite3, json
conn = sqlite3.connect("$db")
ic = conn.execute("PRAGMA integrity_check").fetchone()[0]
rows = conn.execute("SELECT k, v, s FROM results ORDER BY k, v").fetchall()
types = conn.execute("SELECT typeof(k), typeof(v), typeof(s) FROM results LIMIT 1").fetchone()
conn.close()
print(json.dumps({"ic": ic, "rows": rows, "types": list(types)}))
""")
    assert(out.contains(""""ic": "ok""""), s"integrity_check: $out")
    assert(out.contains("""[1, 2.5, "x"], [1, 2.5, "x"], [2, -1.0, "y"]"""), out)
    assert(out.contains("""["integer", "real", "text"]"""), out)
  }

  test("sink fails fast at analysis when input exceeds spark.graft.sqlite.maxRows") {
    val db = tmpDb()
    spark.conf.set("spark.graft.sqlite.maxRows", "3")
    try {
      val big = spark.range(10).selectExpr("id", "cast(id as string) as s")
      val e = intercept[graft.GraftAnalysisException] {
        SinkWriter.write(big, SinkSpec("out", "sqlite",
          Config.of("database" -> db.toString, "table" -> "big")))
      }
      assert(e.getMessage.contains("spark.graft.sqlite.maxRows"), e.getMessage)
      // nothing was written — the cap fires before any file mutation
      assert(!java.nio.file.Files.exists(db) ||
        java.nio.file.Files.size(db) == 0L)
      // an in-cap frame still writes normally under the tightened knob
      SinkWriter.write(big.limit(3), SinkSpec("out", "sqlite",
        Config.of("database" -> db.toString, "table" -> "big")))
      assert(SqliteData.readTable(spark, db.toString, "big").count() == 3L)
    } finally spark.conf.unset("spark.graft.sqlite.maxRows")
  }

  test("sink overwrite replaces the table but preserves sibling tables") {
    val db = tmpDb()
    val a = Seq((1L, "keep")).toDF("id", "v")
    val b = Seq((9L, "old")).toDF("id", "v")
    SqliteData.write(db.toString, "sibling", a, overwrite = false)
    SqliteData.write(db.toString, "target", b, overwrite = false)
    SqliteData.write(db.toString, "target", Seq((7L, "new")).toDF("id", "v"), overwrite = true)
    assert(SqliteData.readTable(spark, db.toString, "target")
      .as[(Long, String)].collect().toSeq == Seq((7L, "new")))
    assert(SqliteData.readTable(spark, db.toString, "sibling")
      .as[(Long, String)].collect().toSeq == Seq((1L, "keep")))
  }

  test("SourceReader sqlite spec: table + query modes; sink→source round-trip") {
    val db = tmpDb()
    val df = Seq((10L, "a"), (20L, "b"), (30L, "a")).toDF("n", "g")
    SinkWriter.write(df, SinkSpec("out", "sqlite",
      Config.of("database" -> db.toString, "table" -> "vals")))
    val back = SourceReader.read(spark, SourceSpec("in", "sqlite",
      Config.of("database" -> db.toString, "table" -> "vals")))
    assert(back.orderBy("n").as[(Long, String)].collect().toSeq ==
      Seq((10L, "a"), (20L, "b"), (30L, "a")))
    val agg = SourceReader.read(spark, SourceSpec("in", "sqlite",
      Config.of("database" -> db.toString,
        "query" -> "SELECT g, sum(n) AS total FROM vals GROUP BY g")))
    assert(agg.orderBy("g").as[(String, Long)].collect().toSeq == Seq(("a", 40L), ("b", 20L)))
    // missing table is an analysis error, not a crash
    intercept[GraftAnalysisException] {
      SourceReader.read(spark, SourceSpec("in", "sqlite",
        Config.of("database" -> db.toString, "table" -> "nope")))
    }
  }

  test("column-name parser handles quoting styles and table constraints") {
    import graft.catalog.SqliteDataTestBridge.colNames
    assert(colNames("""CREATE TABLE t ("a b" TEXT, [c,d] INT, `e` REAL, f)""") ==
      Seq("a b", "c,d", "e", "f"))
    assert(colNames(
      "CREATE TABLE t (id INTEGER, name TEXT, PRIMARY KEY (id), FOREIGN KEY (name) REFERENCES x(y))") ==
      Seq("id", "name"))
    assert(colNames("CREATE TABLE t (x DECIMAL(10,2) NOT NULL, y TEXT DEFAULT 'a,b')") ==
      Seq("x", "y"))
  }
}
