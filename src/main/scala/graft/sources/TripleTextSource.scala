package graft.sources

import graft.core.TripleSchema
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for the reference's triple text format (one
  * `Subject Predicate Object` line of signed integers per line —
  * `/root/reference/src/main/java/com/github/nkoutroumanis/PartitionQueryingSubject.java:82-98`),
  * exposed as `spark.read.format("graft-triples").load(path)`.
  *
  * Unlike the CSV-based [[TripleIO.readText]] (which relies on Catalyst to
  * prune AFTER a full 3-column parse), this source implements the V2
  * pushdown surfaces so the engine-negotiated plan reaches the reader
  * itself:
  *   - [[SupportsPushDownRequiredColumns]] — a `SELECT Subject` parses ONE
  *     integer per line, not three;
  *   - [[SupportsPushDownFilters]] — comparison/equality predicates on the
  *     triple columns are evaluated during the scan, before any row is
  *     materialized into the engine (`BatchScanExec` shows them under the
  *     scan's description, and rejected rows never allocate).
  *
  * 100 TB shape: one [[InputPartition]] per file (the text format has no
  * intra-file index; at warehouse scale the triple store is the parquet /
  * bucketed layout — this source is the INGEST boundary, where pushdown
  * cuts the parse cost of point-predicate extraction jobs). Malformed
  * lines are skipped, matching [[TripleIO.readText]]'s null-filter
  * semantics.
  */
final class TripleTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-triples"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripleSchema.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-triples requires a path"))
    new TripleTextTable(path, schema)
  }
}

/** Java-serializable carrier for the SESSION's Hadoop configuration —
  * executor-side readers/writers must open files with the same fs settings
  * (credentials, scheme impls) the driver planned with; a fresh
  * `new Configuration()` only loads default resources and silently drops
  * anything set on the SparkSession. Serialized via Hadoop's own
  * `Configuration.write/readFields` (the Writable contract).
  */
private[sources] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] object SerializableHadoopConf {
  /** Broadcast the active session's Hadoop conf (driver-side call): one
    * executor fetch per host instead of a conf copy per task. */
  def broadcastActive(): org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] = {
    val sc = SparkSession.active.sparkContext
    sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
  }
}

private[sources] final class TripleTextTable(path: String, tblSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-triples:$path"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TripleTextScanBuilder(path, tblSchema)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new TripleTextWriteBuilder(path, info.schema(), info.queryId())
}

private[sources] final class TripleTextScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  /** A filter is accepted iff the reader can evaluate it exactly: simple
    * comparisons against one triple column. Everything else stays with
    * Spark (returned as leftover).
    */
  private def supported(f: Filter): Boolean = f match {
    case EqualTo(c, _: Int) => full.fieldNames.contains(c)
    case GreaterThan(c, _: Int) => full.fieldNames.contains(c)
    case GreaterThanOrEqual(c, _: Int) => full.fieldNames.contains(c)
    case LessThan(c, _: Int) => full.fieldNames.contains(c)
    case LessThanOrEqual(c, _: Int) => full.fieldNames.contains(c)
    case In(c, vs) => full.fieldNames.contains(c) && vs.forall(_.isInstanceOf[Int])
    case IsNotNull(c) => full.fieldNames.contains(c) // parsed rows are never null
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(supported)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TripleTextScan(path, required, pushed)
}

private[sources] final class TripleTextScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-triples pushed=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq(stat)
    files.map(_.getPath.toString)
      .filterNot { f =>
        val n = f.substring(f.lastIndexOf('/') + 1)
        n.startsWith("_") || n.startsWith(".")
      }
      .sorted
      .map(f => TripleFilePartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TripleReaderFactory(required.fieldNames, pushed,
      SerializableHadoopConf.broadcastActive())

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TripleTextMicroBatchStream(path, required.fieldNames, pushed)
}

/** STREAMING read of the triple text directory: files (name-sorted, the
  * append-only file-source convention) are the offset space; each
  * micro-batch admits ONE new file (source-side throttling — the
  * maxFilesPerTrigger analogue), and Trigger.AvailableNow drains to the
  * file set snapshotted at query start ([[SupportsTriggerAvailableNow]]).
  * The SAME ScanBuilder negotiates pushdown, so a streamed point-predicate
  * extraction parses and filters inside the reader exactly like the batch
  * path — a pushdown-capable streaming source.
  *
  * Offsets are the LAST-PROCESSED FILE PATH (high-water mark), not an
  * index into a re-sorted listing: a batch admits the first path strictly
  * greater than the mark, so adding a file whose name sorts before
  * already-processed files can never shift indices into replaying or
  * skipping OTHER files (such a late low-sorting file is itself ignored —
  * the documented append-only contract, same as FileStreamSource's
  * name-ordering assumption, but enforced rather than assumed).
  *
  * 100 TB shape: offsets are one path string (no per-record state);
  * partitions are whole files; restart resumes strictly after the
  * checkpointed path.
  */
private[sources] final class TripleTextMicroBatchStream(path: String,
    cols: Array[String], pushed: Array[Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.Offset

  /** `mark` = full path of the last processed file; "" before any. */
  private case class FileOffset(mark: String) extends Offset {
    override def json(): String = mark
  }

  private def listFiles(): Array[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq(stat)
    files.map(_.getPath.toString)
      .filterNot { f =>
        val n = f.substring(f.lastIndexOf('/') + 1)
        n.startsWith("_") || n.startsWith(".")
      }
      .sorted.toArray
  }

  // file set snapshotted at AvailableNow prepare time; null = continuous
  // mode (live listing per advance)
  private var availableNowFiles: Array[String] = null

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowFiles = listFiles()

  override def initialOffset(): Offset = FileOffset("")

  /** Admission-controlled advance: ONE new file per micro-batch — the
    * first path strictly greater than the high-water mark, drawn from the
    * AvailableNow snapshot (or the live listing in continuous mode).
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val mark = start.asInstanceOf[FileOffset].mark
    val files =
      if (availableNowFiles != null) availableNowFiles else listFiles()
    files.find(_ > mark) match {
      case Some(next) => FileOffset(next)
      case None       => FileOffset(mark)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def deserializeOffset(json: String): Offset = FileOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileOffset].mark
    val e = end.asInstanceOf[FileOffset].mark
    listFiles().filter(f => f > s && f <= e)
      .map(f => TripleFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TripleReaderFactory(cols, pushed, SerializableHadoopConf.broadcastActive())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final case class TripleFilePartition(file: String)
    extends InputPartition

private[sources] final class TripleReaderFactory(cols: Array[String],
    pushed: Array[Filter],
    conf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TripleFilePartition].file
    new PartitionReader[InternalRow] {
      // executor-side open through the Hadoop FS API with the SESSION's
      // broadcast conf — the same fs settings/credentials the driver-side
      // listing used (a fresh Configuration would drop them)
      private val p = new org.apache.hadoop.fs.Path(file)
      private val fs = p.getFileSystem(conf.value.value)
      private val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))

      private val idx = Map(TripleSchema.subject -> 0,
        TripleSchema.predicate -> 1, TripleSchema.objekt -> 2)
      private val outIdx: Array[Int] = cols.map(idx)
      private var row: InternalRow = _

      private def eval(f: Filter, t: Array[Int]): Boolean = f match {
        case EqualTo(c, v: Int) => t(idx(c)) == v
        case GreaterThan(c, v: Int) => t(idx(c)) > v
        case GreaterThanOrEqual(c, v: Int) => t(idx(c)) >= v
        case LessThan(c, v: Int) => t(idx(c)) < v
        case LessThanOrEqual(c, v: Int) => t(idx(c)) <= v
        case In(c, vs) => vs.exists(v => t(idx(c)) == v.asInstanceOf[Int])
        case IsNotNull(_) => true
        case _ => true
      }

      /** Strict 3-signed-int parse; null on anything else (skipped). */
      private def parse(line: String): Array[Int] = {
        val parts = line.split(' ')
        if (parts.length != 3) return null
        val out = new Array[Int](3)
        var i = 0
        while (i < 3) {
          try out(i) = java.lang.Integer.parseInt(parts(i))
          catch { case _: NumberFormatException => return null }
          i += 1
        }
        out
      }

      override def next(): Boolean = {
        var line = in.readLine()
        while (line != null) {
          val t = parse(line)
          if (t != null && pushed.forall(eval(_, t))) {
            val vals = new Array[Any](outIdx.length)
            var i = 0
            while (i < outIdx.length) { vals(i) = t(outIdx(i)); i += 1 }
            row = new GenericInternalRow(vals)
            return true
          }
          line = in.readLine()
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** V2 WRITE path: the reference's text sink (`saveAsTextFile` after a
  * manual directory delete — `PartitionQueryingSubject.java:72-73,153`) as
  * a proper DSv2 BatchWrite. Each task streams its partition to a private
  * temp file and COMMIT renames it into place (task-attempt atomicity —
  * a failed attempt leaves only an uncommitted temp, never a torn file);
  * `mode("overwrite")` maps to [[SupportsTruncate]], which clears the
  * directory once at job start. Final file names carry the job's queryId,
  * so a second job appending into the same directory can never rename onto
  * an earlier job's part file (silent replacement on RawLocalFileSystem,
  * job-failing false rename on HDFS). Schema must be the 3 integer triple
  * columns.
  */
private[sources] final class TripleTextWriteBuilder(path: String,
    schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var doTruncate = false

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true
    this
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
        require(schema.length == 3,
          s"graft-triples writes 3-column triple rows, got ${schema.length}")
        if (doTruncate) {
          val conf = SparkSession.active.sparkContext.hadoopConfiguration
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(conf)
          if (fs.exists(p)) fs.delete(p, true)
          fs.mkdirs(p)
        }
        new TripleTextBatchWrite(path, queryId)
      }
    }
}

private[sources] final class TripleTextBatchWrite(path: String, queryId: String)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TripleTextWriterFactory(path, queryId,
      SerializableHadoopConf.broadcastActive())

  // commit/abort run on the driver: the session conf is directly at hand
  private def driverConf = SparkSession.active.sparkContext.hadoopConfiguration

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // rename every committed temp into place — driver-side, one per task
    val conf = driverConf
    messages.foreach {
      case TripleFileCommit(tmp, fin) =>
        val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
        val ok = fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(fin))
        require(ok, s"commit rename failed: $tmp -> $fin")
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = driverConf
    messages.foreach {
      case TripleFileCommit(tmp, _) =>
        val p = new org.apache.hadoop.fs.Path(tmp)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.delete(p, false)
      case _ => ()
    }
  }
}

private[sources] final case class TripleFileCommit(tmp: String, fin: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] final class TripleTextWriterFactory(path: String,
    queryId: String,
    conf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp = f"$path/.part-$partitionId%05d-$taskId.tmp"
      private val fin = f"$path/part-$partitionId%05d-$queryId.txt"
      private val p = new org.apache.hadoop.fs.Path(tmp)
      private val fs = p.getFileSystem(conf.value.value)
      private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))

      override def write(row: InternalRow): Unit = {
        out.write(s"${row.getInt(0)} ${row.getInt(1)} ${row.getInt(2)}")
        out.newLine()
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        TripleFileCommit(tmp, fin)
      }
      override def abort(): Unit = {
        out.close()
        if (fs.exists(p)) fs.delete(p, false)
      }
      override def close(): Unit = ()
    }
}
