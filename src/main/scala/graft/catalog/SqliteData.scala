package graft.catalog

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.GraftAnalysisException

/** Data-plane SQLite source/sink over the pure-Scala [[SqliteFile]]
  * codec — the reference's sqlite surface (main.py:130-138 source,
  * main.py:326-341 sink) without any JDBC driver dependency.
  *
  * Scale contract, stated honestly: SQLite is a single-file,
  * driver-local format. Reading one is inherently a one-node scan and
  * writing one is inherently a one-node write — at 100 TB this surface
  * is for SIDE INPUTS (dimension tables, run manifests, small exports
  * a downstream tool opens in sqlite3), never the bulk path; parquet
  * is the bulk path. What we guarantee here:
  *   - source: the file is decoded once on the driver into a
  *     LocalRelation; every downstream transform is distributed as
  *     usual (and Catalyst folds local scans into broadcast sides for
  *     free when the table is a join dim).
  *   - sink: the DataFrame is collected to the driver. Caller-visible
  *     and documented; a >driver-memory dataset belongs in parquet.
  *
  * Arbitrary-SQL pushdown (the reference's `query` config,
  * main.py:133-136) is re-expressed Spark-first: every table in the
  * file becomes a temp view named as in the database, and the query
  * runs through Catalyst (`spark.sql`). The reference hands the string
  * to sqlite3; we hand it to Spark SQL — ANSI-overlap queries behave
  * identically, sqlite-only syntax is a documented deviation
  * (SURVEY §2.5 family).
  */
object SqliteData {

  // ----------------------------------------------------------- read

  /** One table → DataFrame (columns named/ordered per the table DDL). */
  def readTable(spark: SparkSession, dbPath: String, table: String): DataFrame = {
    val t = tables(dbPath).find(_.name == table).getOrElse(
      throw new GraftAnalysisException(s"sqlite $dbPath: no such table '$table'"))
    toDf(spark, t)
  }

  /** All tables registered as temp views, then `spark.sql(query)`. */
  def readQuery(spark: SparkSession, dbPath: String, query: String): DataFrame = {
    tables(dbPath).foreach(t => toDf(spark, t).createOrReplaceTempView(t.name))
    spark.sql(query)
  }

  private def tables(dbPath: String): Seq[SqliteFile.Table] = {
    val p = Paths.get(dbPath)
    if (!Files.exists(p)) throw new GraftAnalysisException(s"sqlite database not found: $dbPath")
    SqliteFile.readTables(p)
  }

  private def toDf(spark: SparkSession, t: SqliteFile.Table): DataFrame = {
    import SqliteFile._
    val names = columnNames(t.createSql)
    val width = names.length
    // SQLite columns are dynamically typed (type affinity, not
    // enforcement) — infer each column's Spark type from the observed
    // values, the same union-type-per-field report `validate` gives:
    //   all-int → long; int/real mix → double; any text (or a
    //   text/number mix) → string; all-blob → binary; all-null → string.
    val kinds = Array.fill(width)(0) // bitmask: 1=int 2=real 4=text 8=blob
    t.rows.foreach { r =>
      var i = 0
      while (i < width) {
        if (i < r.length) r(i) match {
          case SInt(_)  => kinds(i) |= 1
          case SReal(_) => kinds(i) |= 2
          case SText(_) => kinds(i) |= 4
          case SBlob(_) => kinds(i) |= 8
          case SNull    =>
        }
        i += 1
      }
    }
    val types: Seq[DataType] = kinds.toSeq.map {
      case 0 => StringType // all NULL
      case 1 => LongType
      case 3 => DoubleType
      case 2 => DoubleType
      case 8 => BinaryType
      case _ => StringType // any text, or text/number/blob mix
    }
    val schema = StructType(names.zip(types).map { case (n, dt) => StructField(n, dt, nullable = true) })
    val rows: java.util.List[Row] = new java.util.ArrayList[Row](t.rows.length)
    t.rows.foreach { r =>
      val vals = (0 until width).map { i =>
        val v = if (i < r.length) r(i) else SNull
        (v, types(i)) match {
          case (SNull, _)              => null
          case (SInt(x), LongType)     => x
          case (SInt(x), DoubleType)   => x.toDouble
          case (SInt(x), StringType)   => x.toString
          case (SReal(x), DoubleType)  => x
          case (SReal(x), StringType)  => x.toString
          case (SText(s), StringType)  => s
          case (SBlob(b), BinaryType)  => b
          case (SBlob(b), StringType)  => new String(b, "UTF-8")
          case (v, dt) => throw new GraftAnalysisException(s"sqlite value $v vs inferred $dt")
        }
      }
      rows.add(Row.fromSeq(vals))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Column names from a CREATE TABLE statement — the body between the
    * outer parens, split on top-level commas, first token of each
    * definition, quotes stripped; table-level constraint clauses
    * skipped. Covers everything sqlite3 itself emits into
    * sqlite_master plus the common quoting styles.
    */
  private[catalog] def columnNames(createSql: String): Seq[String] = {
    val open = createSql.indexOf('(')
    val close = createSql.lastIndexOf(')')
    if (open < 0 || close <= open)
      throw new GraftAnalysisException(s"cannot parse CREATE TABLE: $createSql")
    val body = createSql.substring(open + 1, close)
    val parts = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    body.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`'  => quote = ch; cur += ch
        case '['               => quote = ']'; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    parts += cur.result()
    val constraintKw = Set("primary", "unique", "check", "foreign", "constraint")
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(p => constraintKw.contains(p.takeWhile(!_.isWhitespace).toLowerCase))
      .map { p =>
        p.head match {
          case '"' | '`'  => p.tail.takeWhile(_ != p.head)
          case '\''       => p.tail.takeWhile(_ != '\'')
          case '['        => p.tail.takeWhile(_ != ']')
          case _          => p.takeWhile(!_.isWhitespace)
        }
      }
  }

  // ---------------------------------------------------------- write

  /** Write `df` as table `table` in the file at `dbPath`; other tables
    * in an existing file are preserved (rebuild-on-write, same as the
    * catalog). `overwrite=false` appends to an existing table like the
    * reference's CREATE IF NOT EXISTS + INSERT (main.py:333-339).
    * Returns rows written this call.
    */
  def write(dbPath: String, table: String, df: DataFrame, overwrite: Boolean): Long = {
    import SqliteFile._
    // Fail-fast cap before the driver collect (same pattern as
    // Similarity.assertQueryCap): "sqlite is a side-input/export
    // surface" is a contract, and documentation isn't enforcement — a
    // spec pointing a corpus-scale frame here must die at analysis
    // with a pointer to parquet, not OOM the driver mid-collect. The
    // probe is bounded (`limit(cap+1).count()`), so it never scans
    // more than cap+1 rows no matter the input size.
    val cap = df.sparkSession.conf.get("spark.graft.sqlite.maxRows", "1000000").toInt
    if (df.limit(cap + 1).count() > cap) throw new GraftAnalysisException(
      s"sqlite sink '$table': input exceeds $cap rows. The sqlite sink collects to " +
        s"the driver (single-file, single-writer format) and is meant for side " +
        s"inputs and small exports; write bulk data to parquet, or raise " +
        s"spark.graft.sqlite.maxRows if the driver can hold it.")
    val p = Paths.get(dbPath)
    val existing: Seq[Table] = if (Files.exists(p)) SqliteFile.readTables(p) else Nil

    val schema = df.schema
    val newRows: Seq[Seq[SqlValue]] = df.collect().toSeq.map { row =>
      schema.fields.zipWithIndex.toSeq.map { case (f, i) =>
        if (row.isNullAt(i)) SNull
        else f.dataType match {
          case ByteType | ShortType | IntegerType => SInt(row.get(i).asInstanceOf[Number].longValue())
          case LongType      => SInt(row.getLong(i))
          case BooleanType   => SInt(if (row.getBoolean(i)) 1L else 0L)
          case FloatType     => SReal(row.getFloat(i).toDouble)
          case DoubleType    => SReal(row.getDouble(i))
          case StringType    => SText(row.getString(i))
          case BinaryType    => SBlob(row.getAs[Array[Byte]](i))
          // No native sqlite representation → ISO text, the
          // sqlite3-conventional encoding (and the reference's: it
          // stringifies everything, main.py:333-339).
          case DateType | TimestampType | TimestampNTZType | _: DecimalType =>
            SText(row.get(i).toString)
          case other =>
            throw new GraftAnalysisException(s"sqlite sink: unsupported column type $other (${f.name})")
        }
      }
    }

    val ddlTypes = schema.fields.toSeq.map { f =>
      val t = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
        case FloatType | DoubleType => "REAL"
        case BinaryType             => "BLOB"
        case _                      => "TEXT"
      }
      s""""${f.name.replace("\"", "\"\"")}" $t"""
    }
    val createSql = s"""CREATE TABLE "${table.replace("\"", "\"\"")}" (${ddlTypes.mkString(", ")})"""

    val merged = existing.find(_.name == table) match {
      case Some(prev) if !overwrite =>
        if (columnNames(prev.createSql).length != schema.fields.length)
          throw new GraftAnalysisException(
            s"sqlite sink: table '$table' exists with a different column count")
        existing.map(t => if (t.name == table) t.copy(rows = t.rows ++ newRows) else t)
      case Some(_) => existing.map(t => if (t.name == table) Table(table, createSql, newRows) else t)
      case None    => existing :+ Table(table, createSql, newRows)
    }
    if (p.toAbsolutePath.getParent != null) Files.createDirectories(p.toAbsolutePath.getParent)
    SqliteFile.write(p, merged)
    newRows.length.toLong
  }
}
