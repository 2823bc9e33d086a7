package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Transports

/** DataSource V2 for the paged-HTTP surface (SURVEY §7.3 "DSv2 if time
  * permits"): `spark.read.format("graft-http")` plans ONE INPUT PARTITION
  * PER PAGE, so a known page range is fetched by executors in parallel —
  * the cluster-parallel sibling of the driver-side discovery loop in
  * [[graft.sources.PagedSource]] (which still owns the unbounded case: the
  * empty-page×2 termination rule needs sequential observation).
  *
  * Options (reference reqOptions surface, `utils.js:84-99`):
  *  - `url`   (required) — template; `{%page%}` / `{%offset%}` / `{%limit%}`
  *    fill from the page index exactly like `Transports.httpPagedFetch`
  *  - `pages` (required) — page count; DSv2 plans partitions up front
  *  - `limit` — page size for `{%offset%}`/`{%limit%}` (default 1000)
  *  - `method`, `auth.user`, `auth.password`, `header.<name>`, `timeoutMs`
  *  - `config.<name>` — `$name` URL-root substitution (lower-case names:
  *    `CaseInsensitiveStringMap` folds option keys)
  *
  * Output schema: `(page int, value string)` — one row per non-empty body
  * line (NDJSON-shaped); parse downstream with `from_json`, exactly like
  * the reference attaches a parser sub-job to its paged reader.
  *
  * Scale shape: fetches happen inside `PartitionReader`s on executors (the
  * per-JVM [[Transports]] client pools connections per executor); no
  * driver round-trip per page, no lineage growth in the page count.
  */
class PagedHttpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedHttp.schema
  // the write path accepts whatever schema the frame has (rows serialize to
  // JSON lines), so any user-supplied schema is fine
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedHttpTable(schema, new CaseInsensitiveStringMap(properties))
}

object PagedHttp {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class PagedHttpTable(schema0: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  import scala.jdk.CollectionConverters._
  override def name(): String = s"graft-http(${options.get("url")})"
  override def schema(): StructType =
    if (schema0 != null && schema0.fields.nonEmpty) schema0 else PagedHttp.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    // supportsExternalMetadata exists for the WRITE path (any frame schema
    // serializes to JSON); the scan always emits (page int, value string),
    // so a divergent user-supplied READ schema must fail loudly here, not
    // produce mismatched InternalRows at execution
    require(schema() == PagedHttp.schema,
      s"graft-http read always produces ${PagedHttp.schema.simpleString}; " +
        "drop the .schema(...) call and parse `value` downstream (from_json)")
    new PagedHttpScan(options.asScala.toMap)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new HttpBatchWrite(info.schema(), options.asScala.toMap)
    }
  }
}

/** DSv2 WRITE path: `df.write.format("graft-http").mode("append")` POSTs
  * each partition's rows as NDJSON request bodies of `batchSize` lines —
  * the standard-writer form of [[graft.sinks.Writers.push]] +
  * [[Transports.httpPoster]] (reference upload stream, `utils.js:38-50`).
  * Best-effort/at-least-once: HTTP has no transactional commit, so a task
  * retry re-POSTs its partition (same caveat as every HTTP sink); commit
  * and abort are no-ops.
  */
class HttpBatchWrite(schema: StructType, opts: Map[String, String]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new HttpDataWriterFactory(schema, opts)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case object HttpWriteDone extends WriterCommitMessage

class HttpDataWriterFactory(schema: StructType, opts: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Literal, StructsToJson}
      private val url = Transports.resolveUrl(
        opts.getOrElse("url", throw new IllegalArgumentException("graft-http: 'url' option is required")),
        opts.collect { case (k, v) if k.startsWith("config.") => k.stripPrefix("config.") -> v })
      private val reqOpts = {
        val o = Transports.ReqOptions.fromOptions(opts)
        if (o.method.equalsIgnoreCase("GET")) o.copy(method = "POST") else o
      }
      private val batchSize = opts.get("batchsize").map(_.toInt).getOrElse(500)
      // StructsToJson is RuntimeReplaceable in Spark 4 — eval its
      // replacement (direct eval asserts)
      private val toJson = StructsToJson(Map.empty,
        CreateNamedStruct(schema.fields.zipWithIndex.flatMap { case (f, i) =>
          Seq(Literal(f.name), BoundReference(i, f.dataType, f.nullable))
        }.toIndexedSeq)).withTimeZone("UTC")
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable]
        .replacement
      private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      private def flush(): Unit = if (buf.nonEmpty) {
        Transports.httpFetch(url, reqOpts.copy(body = Some(buf.mkString("\n"))))
        buf.clear()
      }
      override def write(row: InternalRow): Unit = {
        buf += toJson.eval(row).toString
        if (buf.size >= batchSize) flush()
      }
      override def commit(): WriterCommitMessage = { flush(); HttpWriteDone }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

class PagedHttpScan(opts: Map[String, String]) extends ScanBuilder with Scan with Batch {
  private def required(k: String): String = opts.getOrElse(k,
    throw new IllegalArgumentException(s"graft-http: '$k' option is required"))
  private val url = required("url")
  private val pages = required("pages").toInt
  private val limit = opts.get("limit").map(_.toInt).getOrElse(1000)

  override def build(): Scan = this
  override def readSchema(): StructType = PagedHttp.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    (0 until pages).map(p => PagePartition(url, p, limit, opts): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new PagedHttpReaderFactory
}

/** One page = one partition; carries everything the executor-side fetch
  * needs (plain case class — serializes into the task).
  */
case class PagePartition(urlTemplate: String, page: Int, limit: Int,
                         opts: Map[String, String]) extends InputPartition

class PagedHttpReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private lazy val lines: Iterator[String] = {
        val config = p.opts.collect {
          case (k, v) if k.startsWith("config.") => k.stripPrefix("config.") -> v
        }
        val url = Transports.resolveUrl(p.urlTemplate, config)
          .replace("{%page%}", p.page.toString)
          .replace("{%offset%}", (p.page.toLong * p.limit).toString)
          .replace("{%limit%}", p.limit.toString)
        Transports.httpFetch(url, Transports.ReqOptions.fromOptions(p.opts))
          .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      }
      private var current: String = _
      override def next(): Boolean =
        if (lines.hasNext) { current = lines.next(); true } else false
      override def get(): InternalRow =
        InternalRow(p.page, UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
