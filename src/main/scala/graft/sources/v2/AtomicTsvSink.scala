package graft.sources.v2

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 ATOMIC batch sink — the transactional write half of
  * the connector surface (the read half is [[SynthEventsProvider]]).
  * The reference's sinks are batched JDBC inserts with rollback-on-
  * error semantics (`lambda/trips_lambda.py:199-206` wraps
  * execute_values in one transaction); at 100 TB the same guarantee —
  * readers NEVER observe a half-written job — comes from the V2
  * commit protocol this sink implements, the way object-store writers
  * (Iceberg/Delta-style) do:
  *
  *  - every task writer streams rows to a STAGED file under
  *    `dir/_staging/<jobId>/` whose name embeds the task id, so retry
  *    and speculative attempts can never collide;
  *  - `commit(task)` returns the staged path + row count as the
  *    commit message; `abort(task)` deletes the staged file;
  *  - the DRIVER's `commit(job)` renames every staged file into the
  *    target directory and then publishes a `_MANIFEST` — written to
  *    a temp name and atomically renamed — listing exactly the
  *    visible files. Readers ([[AtomicTsv.read]]) list the MANIFEST,
  *    never the directory, so an orphaned staged/renamed file from a
  *    failed attempt is invisible by construction;
  *  - `abort(job)` deletes the whole job staging directory — the
  *    target is untouched, the previous manifest (if any) still
  *    describes a consistent dataset (append = manifest rewrite that
  *    includes the previous entries).
  *
  * Rows serialize as TSV; the schema is restricted to long/int/double
  * columns (raised at build time otherwise) so the text round-trip is
  * exact — doubles use Java's shortest-round-trip formatting, the
  * same contract q55's CSV gate proves lossless.
  *
  * Failure injection for the protocol specs: option
  * `failPartitionFirstAttempt=<p>` makes partition p's writer throw
  * after 3 rows on ATTEMPT 0 only — exercising staged-file abort and
  * retry uniqueness without touching the committed output.
  */
class AtomicTsvSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft atomic-tsv is a write-only table: pass the dataframe " +
        "schema (read back with AtomicTsv.read)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AtomicTsvTable(schema, properties.get("path"),
      Option(properties.get("failPartitionFirstAttempt")).map(_.toInt))
}

class AtomicTsvTable(tableSchema: StructType, dir: String,
                     failPart: Option[Int])
    extends Table with SupportsWrite {
  require(dir != null, "atomic-tsv sink requires option 'path'")
  tableSchema.fields.foreach(f => require(
    f.dataType == LongType || f.dataType == IntegerType ||
      f.dataType == DoubleType,
    s"atomic-tsv supports long/int/double columns only, got " +
      s"${f.name}: ${f.dataType}"))

  override def name(): String = s"atomic_tsv($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AtomicTsvBatchWrite(dir, info.schema(), failPart)
      }
    }
}

/** Task commit message: where the staged bytes are, and how many rows. */
case class StagedFile(path: String, partitionId: Int, rows: Long)
    extends WriterCommitMessage

class AtomicTsvBatchWrite(dir: String, schema: StructType,
                          failPart: Option[Int]) extends BatchWrite {
  private val jobId = UUID.randomUUID().toString
  private def stagingDir = s"$dir/_staging/$jobId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(stagingDir))
    AtomicTsvWriterFactory(stagingDir,
      schema.fields.map(_.dataType.typeName), failPart.getOrElse(-1))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val manifest = Paths.get(s"$dir/_MANIFEST")
    // append semantics: the new manifest carries the previous entries
    val previous: Seq[String] =
      if (Files.exists(manifest))
        Files.readAllLines(manifest).asScala.toSeq
      else Seq.empty
    val renamed = messages.toSeq.map { case StagedFile(path, pid, rows) =>
      val fin = s"part-$pid-$jobId.tsv"
      val ok = new File(path).renameTo(new File(s"$dir/$fin"))
      require(ok, s"atomic-tsv commit: rename failed for $path")
      s"$fin\t$rows"
    }
    // publish atomically: temp manifest + rename (same filesystem)
    val tmp = Paths.get(s"$dir/_MANIFEST.$jobId.tmp")
    Files.write(tmp,
      (previous ++ renamed).mkString("\n").getBytes(StandardCharsets.UTF_8))
    require(tmp.toFile.renameTo(manifest.toFile),
      "atomic-tsv commit: manifest rename failed")
    deleteRecursively(new File(stagingDir))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // target dir and previous manifest untouched: the job simply
    // never becomes visible
    deleteRecursively(new File(stagingDir))

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}

case class AtomicTsvWriterFactory(stagingDir: String,
                                  types: Array[String], failPart: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new AtomicTsvWriter(stagingDir, partitionId, taskId, types, failPart)
}

class AtomicTsvWriter(stagingDir: String, partitionId: Int, taskId: Long,
                      types: Array[String], failPart: Int)
    extends DataWriter[InternalRow] {
  // task id embeds the attempt — two attempts of one partition can
  // never write the same staged file
  private val staged =
    s"$stagingDir/staged-$partitionId-$taskId.tsv"
  private var out: BufferedWriter = _
  private var rows = 0L
  private def attempt: Int =
    Option(TaskContext.get()).map(_.attemptNumber()).getOrElse(0)

  override def write(row: InternalRow): Unit = {
    if (out == null) out = new BufferedWriter(new FileWriter(staged))
    if (partitionId == failPart && attempt == 0 && rows == 3)
      throw new RuntimeException(
        "atomic-tsv injected failure (failPartitionFirstAttempt)")
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      types(i) match {
        case "long" => sb.append(row.getLong(i))
        case "integer" => sb.append(row.getInt(i))
        case "double" => sb.append(row.getDouble(i))
      }
      i += 1
    }
    out.write(sb.toString)
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) out = new BufferedWriter(new FileWriter(staged))
    out.close()
    StagedFile(staged, partitionId, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    new File(staged).delete()
  }

  override def close(): Unit = if (out != null) { out.close() }
}

/** Manifest-driven reader for the atomic sink: lists the `_MANIFEST`,
  * never the directory — uncommitted or orphaned files are invisible.
  * (The counterpart of an Iceberg/Delta snapshot read, minimally.) */
object AtomicTsv {
  def read(spark: SparkSession, dir: String,
           schema: StructType): DataFrame = {
    val manifest = Paths.get(s"$dir/_MANIFEST")
    val files =
      if (Files.exists(manifest))
        Files.readAllLines(manifest).asScala.toSeq
          .filter(_.nonEmpty).map(l => s"$dir/${l.split('\t')(0)}")
      else Seq.empty
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("sep", "\t").csv(files: _*)
  }

  /** Committed row count per the manifest (driver-side metadata read). */
  def manifestRows(dir: String): Long = {
    val manifest = Paths.get(s"$dir/_MANIFEST")
    if (!Files.exists(manifest)) 0L
    else Files.readAllLines(manifest).asScala
      .filter(_.nonEmpty).map(_.split('\t')(1).toLong).sum
  }
}
