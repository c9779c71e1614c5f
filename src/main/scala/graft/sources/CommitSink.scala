package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K2's upload half as a DataSource V2 WRITE path — the reference loops
  * `put_object` per file on one machine (`dags/tasks/s3_operations
  * .py:9-12`); here every task uploads its own partition and the
  * driver's two-phase commit decides visibility. This is the piece of
  * the DSv2 protocol the engine's custom surface was missing (read side:
  * [[PaginatedSource]]):
  *
  *  - each [[CsvDataWriter]] streams its partition to a UNIQUE
  *    attempt-named temp object under `<path>/_tmp/` — concurrent
  *    speculative attempts of the same partition can never collide;
  *  - a task's `commit()` only RETURNS a message naming its temp object;
  *    nothing becomes visible yet;
  *  - the driver's [[CsvBatchWrite.commit]] promotes exactly the objects
  *    named in the surviving messages — a failed/speculated-away
  *    attempt's output is left in `_tmp` and swept, so readers never see
  *    rows from an attempt Spark discarded;
  *  - `abort()` (task- and job-level) deletes temp objects.
  *
  * The file I/O sits behind plain local-FS calls, the same client seam
  * idea as [[PaginatedSource.fetchPage]]: a cloud deployment replaces
  * them with the object-store client (multipart upload per task, then
  * server-side copy/complete on driver commit) without touching the
  * protocol. CSV fields are minimally quoted (quote when a comma/quote/
  * newline appears); NULL serializes as the empty field, matching the
  * K1 sink's discipline.
  */
class CommitSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-commit-csv"
  // Write-only source: the schema is whatever DataFrame is written —
  // Spark passes it through to getTable when this returns true.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "graft-commit-csv requires option(\"path\", ...)")
    new CommitSinkTable(schema, path)
  }
}

private[sources] class CommitSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-commit-csv($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CsvBatchWrite(info.schema(), path)
      }
    }
}

/** One committed temp object: (temp name, target part name, row count). */
private[graft] case class CsvFileCommit(tmpName: String, finalName: String, rows: Long)
    extends WriterCommitMessage

private[graft] class CsvBatchWrite(schema: StructType, path: String)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CsvWriterFactory(schema, path)

  /** Promote ONLY the surviving attempts' objects, then sweep `_tmp`
    * (which may still hold discarded speculative attempts).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val base = java.nio.file.Paths.get(path)
    messages.foreach { case CsvFileCommit(tmp, fin, _) =>
      java.nio.file.Files.move(base.resolve("_tmp").resolve(tmp), base.resolve(fin),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    sweepTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepTmp()

  private def sweepTmp(): Unit = {
    val tmp = java.nio.file.Paths.get(path, "_tmp")
    if (java.nio.file.Files.exists(tmp)) {
      val entries = java.nio.file.Files.list(tmp)
      try entries.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally entries.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}

private[graft] class CsvWriterFactory(schema: StructType, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CsvDataWriter(schema, path, partitionId, taskId)
}

private[graft] class CsvDataWriter(schema: StructType, path: String,
                                     partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val tmpName = s"attempt-$taskId-part-$partitionId.csv"
  private var rows = 0L
  private lazy val out = {
    val dir = java.nio.file.Paths.get(path, "_tmp")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.newBufferedWriter(dir.resolve(tmpName),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Serialize one field in EXTERNAL form — internal representations
    * (timestamp micros longs, date day-number ints) must never leak
    * into the CSV (reviewer finding). Unsupported types fail loudly at
    * first row rather than silently writing `Object.toString` garbage.
    */
  private def field(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) ""
    else {
      val s = schema(i).dataType match {
        case TimestampType | TimestampNTZType =>
          java.time.Instant.EPOCH.plus(row.getLong(i),
            java.time.temporal.ChronoUnit.MICROS).toString
        case DateType =>
          java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
        case _: StringType | BooleanType | ByteType | ShortType |
             IntegerType | LongType | FloatType | DoubleType | _: DecimalType =>
          String.valueOf(row.get(i, schema(i).dataType))
        case dt => throw new UnsupportedOperationException(
          s"graft-commit-csv cannot serialize column '${schema(i).name}' of type $dt")
      }
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }

  override def write(row: InternalRow): Unit = {
    out.write((0 until schema.length).map(field(row, _)).mkString(","))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    CsvFileCommit(tmpName, f"part-$partitionId%05d.csv", rows)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path, "_tmp", tmpName))
  }

  override def close(): Unit = ()
}
