package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the tab-separated "keyed log" format
  * (`key \t seq \t metric` per line) — the custom-connector rung of the
  * extension ladder (SURVEY §4.3): when a format Spark does not know holds
  * the data, a TableProvider brings it into the engine WITH the scan-level
  * optimizations the built-ins enjoy:
  *
  *  - column pruning: [[SupportsPushDownRequiredColumns]] — the reader
  *    materializes only requested fields (a `select(key)` never parses or
  *    allocates seq/metric);
  *  - filter pushdown: [[SupportsPushDownFilters]] — `key = v` / `key IN`
  *    / IsNotNull evaluate inside the per-file reader before a row is
  *    built. Pushed filters are also RETURNED as residuals, so Spark
  *    re-applies them post-scan — pushdown is an optimization, never a
  *    correctness dependency (the DSv2 contract built-ins follow);
  *  - split planning: one [[InputPartition]] per file — parallelism scales
  *    with the file count exactly like the built-in file sources, and a
  *    driver never reads data;
  *  - PARTIAL aggregate pushdown: [[SupportsPushDownAggregates]] — an
  *    unfiltered COUNT/SUM/MIN/MAX group-by-key collapses to one
  *    pre-aggregated row per (group, file) inside the reader, and Spark
  *    merges the partials (the parquet-style scan-side win).
  *
  * Malformed lines (wrong arity, non-numeric longs) surface as null
  * fields, mirroring the CSV source's permissive mode.
  *
  * The write side ([[KeyedLogBatchWrite]]) implements the DSv2 commit
  * protocol: per-task staged temp files renamed visible on task commit,
  * deleted on abort — speculative or retried tasks never leave partial
  * output visible (DataSourceSpec simulates both).
  *
  * Usage: `spark.read.format("graft.sources.KeyedLogSource").load(dir)` /
  * `df.write.format(...).mode("append").save(dir)` (class-name
  * registration — no service-loader file needed).
  */
class KeyedLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new KeyedLogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object KeyedLogSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("seq", LongType),
    StructField("metric", LongType)))

  /** Visible data files under `path` (hidden/_staging names excluded) —
    * the shared listing for batch split planning and streaming offsets. */
  private[sources] def listDataFiles(
      path: String, conf: org.apache.spark.util.SerializableConfiguration): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).sorted
  }

  /** Shared job-abort cleanup for the batch and streaming sinks. */
  private[sources] def deleteCommitted(
      path: String, conf: org.apache.spark.util.SerializableConfiguration,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case KeyedLogCommit(name) => fs.delete(new Path(path, name), false)
      case _                    => ()
    }
  }
}

class KeyedLogTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"keyed_log($path)"
  override def schema(): StructType = KeyedLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedLogScanBuilder(Option(options.get("path")).getOrElse(path))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(KeyedLogSource.schema.fieldNames),
      s"keyed_log write schema must be (key, seq, metric); got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write = {
        val dest = Option(info.options.get("path")).getOrElse(path)
        // opt-in clustered write (`.option("clusterByKey", true)`): the
        // write DECLARES its required distribution/ordering and Spark
        // plans the exchange + sort — each output file then holds sorted
        // runs of few keys (point-lookup and compaction friendly). Opt-in
        // because forcing a shuffle on every log append is the wrong
        // default for an append-mostly sink.
        if (info.options.getBoolean("clusterByKey", false))
          new Write with RequiresDistributionAndOrdering {
            import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
            import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}
            override def requiredDistribution: Distribution =
              Distributions.clustered(Array(Expressions.identity("key")))
            override def requiredOrdering: Array[V2SortOrder] = Array(
              Expressions.sort(Expressions.identity("key"), SortDirection.ASCENDING),
              Expressions.sort(Expressions.identity("seq"), SortDirection.ASCENDING))
            override def toBatch: BatchWrite = KeyedLogBatchWrite(dest, info.queryId())
            override def toStreaming: StreamingWrite =
              KeyedLogStreamingWrite(dest, info.queryId())
          }
        else new Write {
          override def toBatch: BatchWrite = KeyedLogBatchWrite(dest, info.queryId())
          override def toStreaming: StreamingWrite =
            KeyedLogStreamingWrite(dest, info.queryId())
        }
      }
    }
  }
}

/** Task-commit protocol of the sink: each task streams lines to a hidden
  * `.tmp-` file (named by queryId + partition + task attempt, so a retried
  * attempt never collides with a zombie's temp file) and RENAMES it to a
  * DETERMINISTIC per-(queryId, partition) final name on task commit —
  * replace-on-retry, like the streaming writer. A task that dies after its
  * rename but before reporting success is re-attempted; the retry commits
  * the SAME final name and replaces the orphan, so no duplicate rows
  * survive (the idempotence the task-id-qualified names of an earlier
  * revision lacked). Abort deletes the temp; readers ignore dot-files, so
  * partial output from failed attempts is never visible. Job commit is a
  * no-op (files became visible at task commit; fine for an append-only log
  * sink), job abort removes committed files by name. */
case class KeyedLogBatchWrite(path: String, queryId: String) extends BatchWrite {
  private val conf = KeyedLogConf.capture()
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    KeyedLogWriterFactory(path, queryId, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KeyedLogSource.deleteCommitted(path, conf, messages)
}

case class KeyedLogCommit(fileName: String) extends WriterCommitMessage

/** Hadoop-conf propagation: DSv2 plan nodes are built on the driver, so
  * capture the SESSION's Hadoop conf there (carrying `spark.hadoop.*`
  * overrides — s3a credentials, HA nameservices) and ship it to tasks;
  * a bare `new Configuration()` on an executor would see only
  * classpath defaults. */
private[sources] object KeyedLogConf {
  def capture(): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
}

/** Streaming (micro-batch) sink: same staged-rename task commit, with the
  * epoch id baked into the FINAL file name — a RETRIED epoch regenerates
  * the same names and replaces its own files, so replays after a failure
  * between sink commit and offset-log write are idempotent: at-least-once
  * delivery becomes exactly-once output, the deterministic-naming contract
  * the built-in file sink implements via its manifest. The STAGING name
  * still carries the task id, so two live attempts of one (epoch,
  * partition) — speculation, zombie tasks — never write the same temp
  * file; last-committer-wins on the shared final name. */
case class KeyedLogStreamingWrite(path: String, queryId: String) extends StreamingWrite {
  private val conf = KeyedLogConf.capture()
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    KeyedLogStreamingWriterFactory(path, queryId, conf)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    KeyedLogSource.deleteCommitted(path, conf, messages)
}

case class KeyedLogStreamingWriterFactory(path: String, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new KeyedLogWriter(path,
      tmpName = s".tmp-$queryId-e$epochId-$partitionId-t$taskId",
      finalName = s"part-$queryId-e$epochId-$partitionId.log",
      conf = conf)
}

case class KeyedLogWriterFactory(path: String, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KeyedLogWriter(path,
      tmpName = s".tmp-$queryId-$partitionId-$taskId",
      finalName = s"part-$queryId-$partitionId.log",
      conf = conf)
}

class KeyedLogWriter(dir: String, tmpName: String, finalName: String,
    conf: org.apache.spark.util.SerializableConfiguration) extends DataWriter[InternalRow] {
  private val fs = new Path(dir).getFileSystem(conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(new Path(dir, tmpName), true), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    val key = if (row.isNullAt(0)) "" else row.getUTF8String(0).toString
    // empty-string keys are not representable (the reader maps an empty
    // first field back to null, as the null key is written) — reject
    // loudly instead of silently migrating rows to the null group
    require(row.isNullAt(0) || key.nonEmpty,
      "keyed_log: empty-string keys are not representable; use null or a sentinel")
    val seq = if (row.isNullAt(1)) "" else row.getLong(1).toString
    val metric = if (row.isNullAt(2)) "" else row.getLong(2).toString
    out.write(key); out.write('\t'); out.write(seq); out.write('\t')
    out.write(metric); out.write('\n')
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = new Path(dir, finalName)
    // replace-on-retry: a replayed epoch/attempt regenerates the same name
    if (fs.exists(dest) && !fs.delete(dest, false))
      throw new java.io.IOException(s"keyed_log: could not replace $finalName")
    if (!fs.rename(new Path(dir, tmpName), dest))
      throw new java.io.IOException(s"keyed_log: task commit rename failed for $tmpName")
    KeyedLogCommit(finalName)
  }
  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    fs.delete(new Path(dir, tmpName), false)
  }
  override def close(): Unit = ()
}

class KeyedLogScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = KeyedLogSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[KeyedLogAgg] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept key-column predicates; return EVERYTHING as residual (Spark
    * re-applies, keeping pushdown purely an optimization). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("key", _: String) => true
      case In("key", _)              => true
      case IsNotNull("key")          => true
      case _                         => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** PARTIAL aggregate pushdown (supportCompletePushDown stays false):
    * each file's reader emits one pre-aggregated row per group and Spark
    * plans the final merge (sum of counts/sums, min of mins, max of
    * maxes) — the scan ships G rows per file instead of every line, the
    * biggest scan-side lever a connector has. Spark only attempts this
    * when no post-scan filters remain; since this builder reports every
    * filter as residual, aggregate pushdown applies exactly to
    * unfiltered aggregation shapes. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _                                             => None
      }
    val longCols = Set("seq", "metric")
    val groupByKey = aggregation.groupByExpressions match {
      case Array() => false
      case Array(f: NamedReference) if f.fieldNames.sameElements(Array("key")) => true
      case _ => return false
    }
    val ops = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => KeyedLogAgg.CountStarOp
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(KeyedLogAgg.CountOp).getOrElse(return false)
      case s: Sum if !s.isDistinct =>
        fieldOf(s.column).filter(longCols).map(KeyedLogAgg.SumOp).getOrElse(return false)
      case m: Min =>
        fieldOf(m.column).filter(longCols).map(KeyedLogAgg.MinOp).getOrElse(return false)
      case m: Max =>
        fieldOf(m.column).filter(longCols).map(KeyedLogAgg.MaxOp).getOrElse(return false)
      case _ => return false
    }
    val fields = (if (groupByKey) Seq(StructField("key", StringType)) else Nil) ++
      ops.zipWithIndex.map { case (_, i) => StructField(s"agg_$i", LongType) }
    agg = Some(KeyedLogAgg(groupByKey, ops, StructType(fields)))
    true
  }

  override def build(): Scan =
    KeyedLogScan(path, agg.map(_.schema).getOrElse(required), pushed, agg)
}

/** Pushed-aggregation spec shipped to the per-file readers. */
case class KeyedLogAgg(groupByKey: Boolean, ops: Seq[KeyedLogAgg.AggOp],
                       schema: StructType)
object KeyedLogAgg {
  sealed trait AggOp extends Serializable
  case object CountStarOp extends AggOp { override def toString = "COUNT(*)" }
  case class CountOp(field: String) extends AggOp { override def toString = s"COUNT($field)" }
  case class SumOp(field: String) extends AggOp { override def toString = s"SUM($field)" }
  case class MinOp(field: String) extends AggOp { override def toString = s"MIN($field)" }
  case class MaxOp(field: String) extends AggOp { override def toString = s"MAX($field)" }
}

case class KeyedLogScan(path: String, required: StructType,
                        pushed: Array[Filter],
                        agg: Option[KeyedLogAgg] = None) extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Size statistics from the file listing — without them Spark assumes
    * `defaultSizeInBytes` (effectively infinite) for a DSv2 scan, so a
    * small keyed-log table would never be chosen as the broadcast side of
    * a join. Sizes are the on-disk bytes of the visible files (an upper
    * bound on the scan after pruning/pushdown — conservative, like the
    * built-in file sources before filter estimation). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long = {
      val fs = new Path(path).getFileSystem(conf.value)
      KeyedLogSource.listDataFiles(path, conf)
        .map(f => fs.getFileStatus(new Path(f)).getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
  override def description(): String =
    s"KeyedLogScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      agg.map(a => s", PushedAggregates: [${a.ops.mkString(", ")}]").getOrElse("")

  /** Runtime (join-time) filtering: when this scan feeds a join whose other
    * side is selective, Spark executes the build side first and hands the
    * observed key set here as an `In` filter — the DSv2 mechanism behind
    * dynamic file/partition pruning in the lake formats. The keys merge
    * into the reader-level pushdown, so pruning happens inside the per-file
    * readers before any row is built; like static pushdown it is an
    * optimization only (Spark still applies the join). */
  @transient private var runtimeFilters: Array[Filter] = Array.empty
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("key"))
  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters.filter {
      case EqualTo("key", _: String) => true
      case In("key", _)              => true
      case IsNotNull("key")          => true
      case _                         => false
    }

  // captured lazily on the driver (both callers below run there)
  @transient private lazy val conf = KeyedLogConf.capture()

  override def planInputPartitions(): Array[InputPartition] =
    KeyedLogSource.listDataFiles(path, conf)
      .map(f => KeyedLogPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    KeyedLogReaderFactory(required, pushed ++ runtimeFilters, conf, agg)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KeyedLogMicroBatchStream(path, required, pushed, conf)
}

/** Streaming (micro-batch) SOURCE: the offset is the set of files already
  * processed; each batch reads exactly the files that appeared since —
  * the same files-as-log contract as Spark's file stream source, with the
  * connector's column pruning and key-filter pushdown applying per batch.
  * The offset serializes the full (sorted) file-name list, which is fine
  * at demo scale; a production connector compacts this into a ledger the
  * way FileStreamSource's metadata log does. Files must be immutable once
  * visible (the sink's staged-rename commit guarantees exactly that). */
class KeyedLogMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration) extends MicroBatchStream {

  override def initialOffset(): Offset = KeyedLogOffset(Seq.empty)
  override def latestOffset(): Offset =
    KeyedLogOffset(KeyedLogSource.listDataFiles(path, conf).toSeq)
  override def deserializeOffset(json: String): Offset = KeyedLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[KeyedLogOffset].files.toSet
    end.asInstanceOf[KeyedLogOffset].files
      .filterNot(seen).map(f => KeyedLogPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    KeyedLogReaderFactory(required, pushed, conf)
}

/** Offset = the set of files already processed. The encoding MUST be a
  * single line: Spark's OffsetSeqLog stores each source's offset on one
  * line of the checkpoint offset file, so an embedded newline would split
  * one offset into several bogus ones on restart. A compact JSON array
  * (json4s, already on Spark's classpath) keeps it one line and escapes
  * any path character. */
case class KeyedLogOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(files))
  }
}
object KeyedLogOffset {
  def fromJson(s: String): KeyedLogOffset = {
    if (s.isEmpty) return KeyedLogOffset(Seq.empty)
    val parsed = org.json4s.jackson.JsonMethods.parse(s) match {
      case org.json4s.JArray(items) => items.map {
        case org.json4s.JString(f) => f
        case other => throw new IllegalArgumentException(
          s"keyed_log offset: expected string element, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"keyed_log offset: expected JSON array, got $other")
    }
    KeyedLogOffset(parsed)
  }
}

case class KeyedLogPartition(file: String) extends InputPartition

case class KeyedLogReaderFactory(required: StructType, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration,
    agg: Option[KeyedLogAgg] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[KeyedLogPartition].file
    agg match {
      case Some(a) => new KeyedLogAggReader(file, a, pushed, conf)
      case None    => new KeyedLogReader(file, required, pushed, conf)
    }
  }

  /** Plain scans deliver ColumnarBatches (parquet-style vectorized hand-off
    * into whole-stage codegen); aggregate-pushdown scans emit a handful of
    * partial rows per file, where batching buys nothing. */
  override def supportColumnarReads(partition: InputPartition): Boolean = agg.isEmpty
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new KeyedLogColumnarReader(
      partition.asInstanceOf[KeyedLogPartition].file, required, pushed, conf)
}

/** Vectorized reader: parses lines straight into on-heap column vectors,
  * one [[org.apache.spark.sql.vectorized.ColumnarBatch]] per `batchSize`
  * rows. Spark consumes the batch columnar (ColumnarToRow fuses into
  * whole-stage codegen), which removes the per-row InternalRow allocation
  * and virtual next()/get() calls of the row reader — the same reason the
  * built-in parquet scan is vectorized. Parsing, key-filter pushdown, and
  * null semantics are shared with [[KeyedLogReader]] via [[KeyedLogLines]].
  */
class KeyedLogColumnarReader(file: String, required: StructType,
    pushed: Array[Filter], conf: org.apache.spark.util.SerializableConfiguration,
    batchSize: Int = 4096)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val lines = new KeyedLogLines(file, pushed, conf)
  private val fieldNames = required.fields.map(_.name)
  private val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]])

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < batchSize && lines.advance()) {
      var c = 0
      while (c < fieldNames.length) {
        val v = vectors(c)
        fieldNames(c) match {
          case "key" =>
            val k = lines.key
            if (k == null) v.putNull(n)
            else { val b = k.getBytes("UTF-8"); v.putByteArray(n, b, 0, b.length) }
          case "seq" =>
            if (lines.seqIsNull) v.putNull(n) else v.putLong(n, lines.seq)
          case "metric" =>
            if (lines.metricIsNull) v.putNull(n) else v.putLong(n, lines.metric)
        }
        c += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = { lines.close(); batch.close() }
}

/** Shared line scanner for the row and columnar readers: reads, splits,
  * applies pushed key predicates, and exposes the current row's parsed
  * fields. `advance()` positions on the next passing line. */
private[sources] class KeyedLogLines(file: String, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration) {
  private val fs = new Path(file).getFileSystem(conf.value)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(file)), "UTF-8"))

  var key: String = _
  var seq: Long = _
  var seqIsNull: Boolean = true
  var metric: Long = _
  var metricIsNull: Boolean = true

  private def keyPasses(k: String): Boolean = pushed.forall {
    case EqualTo("key", v: String) => k != null && k == v
    case In("key", vs)             => k != null && vs.contains(k)
    case IsNotNull("key")          => k != null
    case _                         => true
  }

  def advance(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val parts = line.split("\t", -1)
      val k = if (parts.nonEmpty && parts(0).nonEmpty) parts(0) else null
      if (keyPasses(k)) {
        key = k
        seqIsNull = true; metricIsNull = true
        if (parts.length > 1) try {
          seq = java.lang.Long.parseLong(parts(1).trim); seqIsNull = false
        } catch { case _: NumberFormatException => () }
        if (parts.length > 2) try {
          metric = java.lang.Long.parseLong(parts(2).trim); metricIsNull = false
        } catch { case _: NumberFormatException => () }
        return true
      }
      line = in.readLine()
    }
    false
  }
  def close(): Unit = in.close()
}

/** Per-file pre-aggregation: one pass over the lines builds a per-group
  * accumulator table and emits one PARTIAL row per group; Spark's final
  * aggregate merges partials across files. Null-group and all-null-sum
  * semantics mirror Spark's (null keys form a group; SUM/MIN/MAX of no
  * non-null values is null; counts are 0-based). */
class KeyedLogAggReader(file: String, agg: KeyedLogAgg, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration) extends PartitionReader[InternalRow] {
  import KeyedLogAgg._

  private var out: Iterator[InternalRow] = _
  private var row: InternalRow = _

  private def fieldValue(op: String, key: String, seq: Any, metric: Any): Any = op match {
    case "key" => key
    case "seq" => seq
    case "metric" => metric
  }

  private def compute(): Iterator[InternalRow] = {
    val inner = new KeyedLogReader(file, KeyedLogSource.schema, pushed, conf)
    val opsArr = agg.ops.toArray // hoisted: the zip below runs per LINE
    // per group: per-op (value, seen) accumulators
    val groups = new java.util.LinkedHashMap[String, Array[Array[Long]]]()
    try {
      while (inner.next()) {
        val r = inner.get()
        val key = if (r.isNullAt(0)) null else r.getUTF8String(0).toString
        val seq: Any = if (r.isNullAt(1)) null else r.getLong(1)
        val metric: Any = if (r.isNullAt(2)) null else r.getLong(2)
        val gk = if (agg.groupByKey) key else ""
        var accs = groups.get(gk)
        if (accs == null) {
          accs = opsArr.map(_ => Array(0L, 0L)) // (value, seen)
          groups.put(gk, accs)
        }
        var i = 0
        while (i < opsArr.length) {
          val op = opsArr(i)
          val acc = accs(i)
          op match {
            case CountStarOp => acc(0) += 1; acc(1) = 1
            case CountOp(f) => if (fieldValue(f, key, seq, metric) != null) { acc(0) += 1; acc(1) = 1 }
            case SumOp(f) => fieldValue(f, key, seq, metric) match {
              case v: Long => acc(0) += v; acc(1) = 1
              case _       => ()
            }
            case MinOp(f) => fieldValue(f, key, seq, metric) match {
              case v: Long => if (acc(1) == 0 || v < acc(0)) acc(0) = v; acc(1) = 1
              case _       => ()
            }
            case MaxOp(f) => fieldValue(f, key, seq, metric) match {
              case v: Long => if (acc(1) == 0 || v > acc(0)) acc(0) = v; acc(1) = 1
              case _       => ()
            }
          }
          i += 1
        }
      }
    } finally inner.close()
    groups.entrySet().iterator().asScala.map { e =>
      val groupVals: Seq[Any] = if (agg.groupByKey)
        Seq(if (e.getKey == null) null else UTF8String.fromString(e.getKey)) else Nil
      val aggVals: Seq[Any] = agg.ops.zip(e.getValue.toSeq).map {
        case (CountStarOp | _: CountOp, acc) => acc(0)
        case (_, acc)                        => if (acc(1) == 0) null else acc(0)
      }
      InternalRow.fromSeq(groupVals ++ aggVals)
    }
  }

  override def next(): Boolean = {
    if (out == null) out = compute()
    if (out.hasNext) { row = out.next(); true } else false
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

class KeyedLogReader(file: String, required: StructType, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration) extends PartitionReader[InternalRow] {
  private val lines = new KeyedLogLines(file, pushed, conf)
  private val fieldNames = required.fields.map(_.name) // hoisted off the per-row path
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!lines.advance()) return false
    // build ONLY the pruned columns, in the order Spark asked for
    val values = fieldNames.map {
      case "key"    => if (lines.key == null) null else UTF8String.fromString(lines.key)
      case "seq"    => if (lines.seqIsNull) null else lines.seq
      case "metric" => if (lines.metricIsNull) null else lines.metric
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
