package graft.sources.v2

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the vspace corpus format: documents separated
  * by a multi-byte record delimiter (reference `base.py:36,56-73`, where the
  * same format is read through `newAPIHadoopFile` with
  * `textinputformat.record.delimiter`). The built-in `lineSep` text source
  * covers the simple path (`CorpusSources.loadRawCorpus`); this connector is
  * the scale path — it plans explicit byte-range splits per file (so a
  * single 1 TB corpus file fans out across a cluster without relying on
  * codec splittability heuristics), prunes columns at the source, and
  * exposes each record's byte offset so downstream id assignment is
  * deterministic without a global sort.
  *
  * Split ownership (TextInputFormat semantics, adapted for a multi-byte
  * delimiter): a record belongs to the split containing its first byte. A
  * non-initial split starts scanning `delimLen - 1` bytes BEFORE its range
  * so a delimiter straddling the boundary is still visible — a delimiter
  * wholly inside the previous range can never match there (it would have to
  * end past the boundary), so every record is owned by exactly one split.
  * Each split reads records whose start offset is <= its end, following the
  * last one past the boundary if needed.
  *
  * Contract: multi-split reads are canonical when every delimiter
  * occurrence in the byte stream is a real separator — the corpus format's
  * sentinel guarantee. A delimiter that can overlap itself (has a border,
  * like the repeated-stopword corpus delimiter) admits MISALIGNED
  * occurrences when content embeds delimiter fragments or empty documents
  * make separators adjacent; no local split algorithm can tokenize those
  * canonically (a boundary inside a misaligned run has no way to recover
  * the global scan's alignment — the same caveat applies to Hadoop's
  * delimited TextInputFormat the reference reads through). Border-free
  * delimiters are canonical at every possible boundary (CorpusV2Spec
  * sweeps 1-byte chunks to prove it).
  *
  * Usage: `spark.read.format("vspace-corpus").option("delimiter", d)
  * .option("chunkBytes", n).load(path)` → (path string, pos long, text
  * string, split int, seq long): `pos` = record start byte offset in its
  * file, `split` = planned split ordinal in (path, byte range) order,
  * `seq` = record ordinal within its split — the carriers for sort-free
  * contiguous id assignment (CorpusSources.loadRawCorpusV2).
  */
class CorpusDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "vspace-corpus"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CorpusV2.FullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(schema == CorpusV2.FullSchema,
      s"vspace-corpus has a fixed schema ${CorpusV2.FullSchema.simpleString}; " +
        "project columns instead of overriding the schema")
    new CorpusTable(new CaseInsensitiveStringMap(properties))
  }
}

object CorpusV2 {
  val FullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    // split = the split's planned ordinal in (lexicographic path, byte
    // range) order; seq = the record's ordinal among the rows this split
    // emits. Together they make contiguous id assignment a metadata-sized
    // problem: one per-split count pass + cumulative bases, no global sort
    // and no RDD zipWithIndex (see CorpusSources.loadRawCorpusV2).
    StructField("split", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  val DefaultChunkBytes: Long = 128L * 1024 * 1024
}

final class CorpusTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"vspace_corpus(${options.get("path")})"
  override def schema(): StructType = CorpusV2.FullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: reads expose (path, pos, text) but a write only
    // needs the text column — without it the analyzer would demand data
    // for the read-side metadata columns; CorpusWriteBuilder resolves the
    // text column from the INCOMING schema instead
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new CorpusWriteBuilder(options, info)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties (from load(path)) with read options
    val merged = new java.util.HashMap[String, String]()
    merged.putAll(options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new CorpusScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class CorpusScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = CorpusV2.FullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty pruning (e.g. count(*)) still needs row cardinality; keep the
    // cheap offset column as the carrier
    required =
      if (requiredSchema.isEmpty) StructType(CorpusV2.FullSchema.filter(_.name == "pos"))
      else requiredSchema

  override def build(): Scan = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("vspace-corpus: no path specified"))
    val delim = Option(options.get("delimiter"))
      .getOrElse(graft.sources.CorpusSources.RecordDelimiter)
    require(delim.nonEmpty, "vspace-corpus: delimiter must be non-empty")
    val chunk = Option(options.get("chunkBytes")).map(_.toLong)
      .getOrElse(CorpusV2.DefaultChunkBytes)
    require(chunk > 0, "vspace-corpus: chunkBytes must be positive")
    // ship the driver's filesystem-relevant conf entries so executors
    // resolve the same fs implementations — including HDFS HA nameservice
    // (dfs.*) and security overrides that arrive via spark.hadoop.*
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()
    val shipPrefixes = Seq("fs.", "dfs.", "hadoop.", "io.")
    val fsConf = hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) => shipPrefixes.exists(k.startsWith) }.toMap
    new CorpusScan(path, delim.getBytes(StandardCharsets.UTF_8), chunk,
      required, fsConf)
  }
}

final case class CorpusInputPartition(file: String, start: Long, end: Long,
    index: Int) extends InputPartition

final class CorpusScan(path: String, delim: Array[Byte], chunkBytes: Long,
    required: StructType, fsConf: Map[String, String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"vspace-corpus $path (chunk=$chunkBytes, delim=${delim.length}B, " +
      s"columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = CorpusReaderFactory.buildConf(fsConf)
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matched.isEmpty)
      throw new java.io.FileNotFoundException(
        s"vspace-corpus: path does not exist or matches no files: $path")
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && {
            val n = f.getPath.getName; !n.startsWith("_") && !n.startsWith(".")
          })
      else Seq(st)
    }.sortBy(_.getPath.toString)
    files.flatMap { st =>
      val len = st.getLen
      val uri = st.getPath.toString
      if (len == 0) Seq.empty
      else (0L until len by chunkBytes).map { s =>
        (uri, s, math.min(s + chunkBytes, len))
      }
    }.zipWithIndex.map { case ((uri, s, e), i) =>
      CorpusInputPartition(uri, s, e, i): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CorpusReaderFactory(delim, required.fieldNames, fsConf)
}

object CorpusReaderFactory {
  def buildConf(fsConf: Map[String, String]): Configuration = {
    val c = new Configuration()
    fsConf.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

final class CorpusReaderFactory(delim: Array[Byte], columns: Array[String],
    fsConf: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CorpusPartitionReader(partition.asInstanceOf[CorpusInputPartition],
      delim, columns, fsConf)
}

/** Knuth–Morris–Pratt matcher fed one byte at a time; linear even on the
  * highly self-repetitive corpus delimiter ("nferstopword " x15, where
  * naive backtracking degrades). Matches leftmost non-overlapping
  * occurrences, like Hadoop's delimited line reader. */
private[v2] final class DelimiterMatcher(delim: Array[Byte]) {
  val length: Int = delim.length
  private val fail: Array[Int] = {
    val f = new Array[Int](delim.length)
    var k = 0
    var i = 1
    while (i < delim.length) {
      while (k > 0 && delim(i) != delim(k)) k = f(k - 1)
      if (delim(i) == delim(k)) k += 1
      f(i) = k
      i += 1
    }
    f
  }
  private var state = 0
  def reset(): Unit = state = 0
  /** Feed one byte; true iff a full delimiter just completed. */
  def advance(b: Byte): Boolean = {
    while (state > 0 && b != delim(state)) state = fail(state - 1)
    if (b == delim(state)) state += 1
    if (state == delim.length) { state = 0; true } else false
  }
}

final class CorpusPartitionReader(p: CorpusInputPartition, delim: Array[Byte],
    columns: Array[String], fsConf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val matcher = new DelimiterMatcher(delim)
  private val fsPath = new Path(p.file)
  private val stream = {
    val fs = fsPath.getFileSystem(CorpusReaderFactory.buildConf(fsConf))
    fs.open(fsPath)
  }
  private val pathUtf8 = UTF8String.fromString(p.file)

  /** Absolute offset of the next unread byte. */
  private var pos: Long = _
  /** Absolute offset where the next record starts. */
  private var recordStart: Long = _
  private var done = false
  private var row: InternalRow = _

  // bulk scan buffer: bytes are consumed array-at-a-time (a per-byte
  // InputStream.read() loop costs a virtual call + bounds logic per byte —
  // at the 1 TB-per-file scale this source targets, that constant factor
  // IS the scan cost)
  private val chunkBuf = new Array[Byte](64 * 1024)
  private var chunkLen = 0
  private var chunkPos = 0

  // constructor-time I/O (seek + skip-to-first-delimiter below) must close
  // the stream on failure: Spark never calls close() on a reader whose
  // constructor threw, so an unguarded I/O error here leaks the file handle
  // on every such task attempt
  private def guardInit[A](body: => A): A =
    try body catch { case t: Throwable => stream.close(); throw t }

  guardInit {
    // non-initial splits look back delimLen-1 bytes so a boundary-straddling
    // delimiter is visible (see class doc of CorpusDataSource)
    val scanFrom = if (p.start == 0) 0L
      else math.max(0L, p.start - (delim.length - 1))
    stream.seek(scanFrom)
    pos = scanFrom
  }

  /** Consume bytes (appending to `sink` unless null) until a full delimiter
    * completes (true) or EOF (false). Consumed delimiter bytes are included
    * in the sink; KMP state carries across buffer refills. */
  private def scanToDelimiter(sink: ByteArrayOutputStream): Boolean = {
    while (true) {
      if (chunkPos >= chunkLen) {
        chunkLen = stream.read(chunkBuf)
        chunkPos = 0
        if (chunkLen < 0) return false
      }
      val from = chunkPos
      var i = from
      var matched = false
      while (i < chunkLen && !matched) {
        if (matcher.advance(chunkBuf(i))) matched = true
        i += 1
      }
      if (sink != null) sink.write(chunkBuf, from, i - from)
      pos += i - from
      chunkPos = i
      if (matched) return true
    }
    false // unreachable
  }

  // A non-initial split owns records starting in (start, end]. Skip to the
  // first delimiter that ends strictly after `start` (or EOF): a delimiter
  // ending at <= start terminates a record the previous split owns — that
  // can only match here when the lookback clamped to 0 (start < delimLen),
  // where the scan legitimately sees the whole file prefix.
  if (p.start == 0) recordStart = 0L
  else guardInit {
    matcher.reset()
    var found = false
    var eof = false
    while (!found && !eof) {
      if (scanToDelimiter(null)) { if (pos > p.start) found = true }
      else eof = true
    }
    if (found) recordStart = pos else done = true
  }

  private val buf = new ByteArrayOutputStream(1 << 16)

  override def next(): Boolean = {
    if (done || recordStart > p.end) return false
    buf.reset()
    matcher.reset()
    if (scanToDelimiter(buf)) {
      val all = buf.toByteArray
      row = makeRow(all, all.length - delim.length, recordStart)
      recordStart = pos
      true
    } else {
      // EOF: the final unterminated segment is a record only if non-empty
      // (a trailing delimiter produces nothing), matching the line reader
      done = true
      val all = buf.toByteArray
      if (all.isEmpty) false
      else { row = makeRow(all, all.length, recordStart); true }
    }
  }

  /** Ordinal of the NEXT record this split emits (post-incremented in
    * makeRow, which runs exactly once per returned row). */
  private var seq: Long = 0L

  private def makeRow(bytes: Array[Byte], textLen: Int, start: Long): InternalRow = {
    val vals = new Array[Any](columns.length)
    var i = 0
    while (i < columns.length) {
      vals(i) = columns(i) match {
        case "path"  => pathUtf8
        case "pos"   => start
        case "text"  => UTF8String.fromBytes(bytes, 0, textLen)
        case "split" => p.index
        case "seq"   => seq
        case other  => throw new IllegalArgumentException(s"unknown column $other")
      }
      i += 1
    }
    seq += 1
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = row
  override def close(): Unit = stream.close()
}

// ---------------------------------------------------------------------------
// Write path: the connector is read/write, so a corpus round-trips through
// the same format contract (records joined by the multi-byte delimiter,
// one output file per task, job-temp + driver rename commit).
// ---------------------------------------------------------------------------

import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}

/** One committed task file, parked in the job temp dir until the driver
  * renames it into place. */
final case class CorpusFileCommit(tempPath: String, partitionId: Int)
    extends WriterCommitMessage

/** Commit message for a task that wrote no rows. A top-level case object
  * (not an anonymous class inside the writer) so it can never capture an
  * `$outer` reference to the writer and its non-serializable stream. */
case object EmptyPartitionCommit extends WriterCommitMessage

final class CorpusWriteBuilder(options: CaseInsensitiveStringMap,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    val merged = new java.util.HashMap[String, String]()
    merged.putAll(options.asCaseSensitiveMap())
    merged.putAll(info.options().asCaseSensitiveMap())
    val opts = new CaseInsensitiveStringMap(merged)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("vspace-corpus: no path specified"))
    val delim = Option(opts.get("delimiter"))
      .getOrElse(graft.sources.CorpusSources.RecordDelimiter)
    require(delim.nonEmpty, "vspace-corpus: delimiter must be non-empty")
    val schema = info.schema()
    val textIdx = schema.fieldIndex(
      if (schema.fieldNames.contains("text")) "text"
      else schema.fields.filter(_.dataType == StringType) match {
        case Array(single) => single.name
        case _ => throw new IllegalArgumentException(
          "vspace-corpus write needs a 'text' column (or exactly one string column)")
      })
    require(schema.fields(textIdx).dataType == StringType,
      "vspace-corpus: text column must be string")
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()
    val shipPrefixes = Seq("fs.", "dfs.", "hadoop.", "io.")
    val fsConf = hadoopConf.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) => shipPrefixes.exists(k.startsWith) }.toMap
    new CorpusWrite(path, delim.getBytes(StandardCharsets.UTF_8), textIdx,
      truncateFirst, fsConf)
  }
}

final class CorpusWrite(path: String, delim: Array[Byte], textIdx: Int,
    truncateFirst: Boolean, fsConf: Map[String, String])
    extends Write with BatchWrite {

  private val jobId = java.util.UUID.randomUUID().toString
  private def tempDir = s"$path/_tmp_write_$jobId"

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CorpusWriterFactory(tempDir, delim, textIdx, fsConf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = CorpusReaderFactory.buildConf(fsConf)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncateFirst && fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
          fs.delete(st.getPath, false)
      }
    }
    fs.mkdirs(dir)
    messages.collect { case m: CorpusFileCommit => m }.foreach { m =>
      val dest = new Path(dir, f"part-${m.partitionId}%05d-$jobId.txt")
      if (!fs.rename(new Path(m.tempPath), dest))
        throw new java.io.IOException(
          s"vspace-corpus: commit rename failed: ${m.tempPath} -> $dest")
    }
    fs.delete(new Path(tempDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = CorpusReaderFactory.buildConf(fsConf)
    val td = new Path(tempDir)
    val fs = td.getFileSystem(conf)
    fs.delete(td, true)
  }
}

final class CorpusWriterFactory(tempDir: String, delim: Array[Byte],
    textIdx: Int, fsConf: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new CorpusDataWriter(tempDir, delim, textIdx, partitionId, taskId, fsConf)
}

/** Streams records into one temp file, the delimiter BETWEEN records (the
  * reader's "trailing delimiter produces nothing" rule makes between-only
  * the canonical spelling). An empty partition commits no file. */
final class CorpusDataWriter(tempDir: String, delim: Array[Byte],
    textIdx: Int, partitionId: Int, taskId: Long,
    fsConf: Map[String, String]) extends DataWriter[InternalRow] {

  private val tempPath =
    new Path(s"$tempDir/task-$partitionId-$taskId")
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var any = false

  override def write(record: InternalRow): Unit = {
    if (out == null) {
      val fs = tempPath.getFileSystem(CorpusReaderFactory.buildConf(fsConf))
      out = fs.create(tempPath, true)
    }
    if (any) out.write(delim)
    out.write(record.getUTF8String(textIdx).getBytes)
    any = true
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    if (any) CorpusFileCommit(tempPath.toString, partitionId)
    else EmptyPartitionCommit // empty partition: nothing to move
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    val fs = tempPath.getFileSystem(CorpusReaderFactory.buildConf(fsConf))
    fs.delete(tempPath, false)
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
