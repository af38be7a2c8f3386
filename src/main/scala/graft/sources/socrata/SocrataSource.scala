package graft.sources.socrata

import java.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Http

/** DataSource V2 "socrata" format — a SoQL-resource table with filter
  * and column pushdown (SURVEY §2.1 S2, §4).
  *
  * The reference pushes its predicates server-side by hand-building
  * `$where=` query strings (consent filter publish_to_catalog.py:
  * 524-528, prefix filter :263-265). Here the same happens through
  * Catalyst: `df.filter(...)` lands in [[SocrataScanBuilder.pushFilters]],
  * supported predicates translate to SoQL `$where`, column pruning to
  * `$select`, and `.explain` shows `PushedFilters` on the scan exactly
  * like a parquet source.
  *
  * Usage:
  * Registered by the Spark convention `<package>.DefaultSource`, so
  * `format("graft.sources.socrata")` resolves it.
  * {{{
  * spark.read.format("graft.sources.socrata")
  *   .option("url", "https://host/resource/xxxx.json")
  *   .load()                       // schema inferred from a sample page
  *   .filter($"have_consent_for_ntm" === true)   // → $where=...
  * }}}
  *
  * Scale: reads page in `pageSize` chunks across `numPartitions` input
  * partitions ($limit/$offset windows) so a large resource parallelizes
  * across executors; each partition holds one connection.
  */
class DefaultSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val url = options.get("url")
    require(url != null, "socrata source requires option 'url'")
    val sample = Http.get(pageUrl(url, "$limit=" + options.getOrDefault("sampleSize", "100")))
    require(sample.ok, s"socrata schema sample failed: ${sample.error}")
    SparkSession.active.read.json(
      SparkSession.active.createDataset(Seq(sample.bodyString))(
        org.apache.spark.sql.Encoders.STRING)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // no schema validation HERE: getTable serves both planes, and the
    // read (JSON) and write (CSV) type sets differ — each plane
    // validates in its own builder (newScanBuilder / newWriteBuilder)
    new SocrataTable(schema, properties.get("url"),
      // Socrata 2.x caps $limit at 50000; a larger pageSize would make
      // offset windows skip the capped tail of every page — rows
      // silently lost. Clamp instead.
      math.min(Option(properties.get("pageSize")).map(_.toInt).getOrElse(10000), 50000),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(1),
      // opt-in runtime collation attestation (SocrataCollation): one
      // ordered probe request per (url, column) can unlock string
      // min/max/top-N pushdown where the server provably sorts binary
      Option(properties.get("attestCollation")).exists(_.toBoolean))
  }

  override def supportsExternalMetadata(): Boolean = true

  private def pageUrl(base: String, qs: String): String =
    base + (if (base.contains("?")) "&" else "?") + qs
}

class SocrataTable(tableSchema: StructType, url: String, pageSize: Int, numPartitions: Int,
    attestCollation: Boolean = false)
    extends Table with SupportsRead with SupportsWrite {
  override def schema(): StructType = tableSchema
  override def name(): String = s"socrata($url)"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    JsonRows.validateSchema(tableSchema) // fail at plan time, not mid-scan
    new SocrataScanBuilder(schema, url, pageSize, numPartitions, attestCollation)
  }

  /** K1 as a first-class DSv2 batch write (SURVEY §2.1: the "long-term
    * DSv2 batch write" the reference's POST loop maps to):
    * `df.write.format("graft.sources.socrata").option("url", …)
    * .option("rowIdentifier", "<key col>").mode("append").save()`
    * routes each task's rows through a buffered CSV upsert POST.
    * Append-only by design — Socrata upsert IS the merge; there is no
    * truncate.
    *
    * The write path's task-retry safety rests ENTIRELY on the target
    * dataset having a row identifier (see [[SocrataBatchWrite]]), so
    * the caller must attest to it: declare the key column with
    * `.option("rowIdentifier", …)` (it must be one of the written
    * columns), or explicitly accept duplicate risk on retry/speculation
    * with `.option("unsafeNonIdempotentWrites", "true")`. An id-less
    * dataset with neither option fails at PLAN time instead of
    * silently duplicating already-landed batches. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    CsvRows.validateWriteSchema(info.schema()) // CSV carries atomics only
    val rowId = Option(info.options.get("rowIdentifier")).filter(_.nonEmpty)
    val unsafe = info.options.getBoolean("unsafeNonIdempotentWrites", false)
    require(rowId.isDefined || unsafe,
      "socrata sink: a retried or speculated task re-POSTs its batches, which only " +
        "collapses safely when the target dataset has a row identifier. Declare it with " +
        ".option(\"rowIdentifier\", \"<key column>\"), or accept duplicate risk with " +
        ".option(\"unsafeNonIdempotentWrites\", \"true\").")
    rowId.foreach(c => require(info.schema().fieldNames.contains(c),
      s"socrata sink: rowIdentifier '$c' is not among the written columns " +
        s"${info.schema().fieldNames.mkString("[", ", ", "]")} — the upsert cannot key on it."))
    new SocrataWriteBuilder(info.schema(), url, pageSize)
  }
}

class SocrataWriteBuilder(schema: StructType, url: String, batchRows: Int)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SocrataBatchWrite(schema, url, batchRows)
  }
}

/** Task-level transactionality rides on the sink's keyed-upsert
  * idempotence (the same property the reference's retry relies on,
  * publish_to_catalog.py:347-352): a retried task re-POSTs the same
  * keyed rows, which the upsert collapses — so commit/abort need no
  * driver-side undo. A sink without idempotent keys would need a
  * staging-revision protocol here (the K3 revision flow); that
  * assumption is not left implicit — [[SocrataTable.newWriteBuilder]]
  * refuses to plan a write unless the caller declares the key column
  * (`rowIdentifier`) or explicitly opts into duplicate risk. */
class SocrataBatchWrite(schema: StructType, url: String, batchRows: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SocrataWriterFactory(schema, url, batchRows)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class SocrataCommit(partitionId: Int, rows: Long, posts: Int)
    extends WriterCommitMessage

class SocrataWriterFactory(schema: StructType, url: String, batchRows: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SocrataDataWriter(schema, url, batchRows, partitionId)
}

/** Buffers up to `batchRows` rows as one CSV payload (header + rows,
  * RFC 4180 quoting — same wire format as Http.csvUpsertSink) and
  * POSTs with idempotent retry; a failed POST throws, failing the
  * task so Spark's task retry re-runs it. Memory is bounded by the
  * batch, not the partition. */
class SocrataDataWriter(schema: StructType, url: String, batchRows: Int,
    partitionId: Int) extends DataWriter[InternalRow] {
  // header fields get the same RFC-4180 quoting as data cells — a
  // column name carrying a comma/quote would otherwise shift every
  // payload's column mapping
  private val header = schema.fieldNames.map(CsvRows.quote).mkString(",")
  private val sb = new StringBuilder(header)
  private var buffered = 0
  private var total = 0L
  private var posts = 0

  override def write(row: InternalRow): Unit = {
    sb.append('\n')
    var i = 0
    while (i < schema.fields.length) {
      if (i > 0) sb.append(',')
      sb.append(CsvRows.cell(row, i, schema.fields(i).dataType))
      i += 1
    }
    buffered += 1; total += 1
    if (buffered >= batchRows) flush()
  }

  private def flush(): Unit = if (buffered > 0) {
    val r = Http.postWithRetry(url,
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), "text/csv")
    if (!r.ok) throw new java.io.IOException(
      s"socrata upsert POST failed (partition $partitionId): ${r.error}")
    posts += 1
    sb.setLength(0); sb.append(header)
    buffered = 0
  }

  override def commit(): WriterCommitMessage = {
    flush()
    SocrataCommit(partitionId, total, posts)
  }
  // buffered (un-POSTed) rows vanish with the task; already-landed
  // POSTs are keyed upserts the retry will repeat idempotently
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** InternalRow → CSV cell rendering for the write path. */
object CsvRows {
  /** CSV can carry only atomic values; nested types fail at PLAN time
    * with a named column, mirroring JsonRows.validateSchema. */
  def validateWriteSchema(schema: StructType): Unit = schema.fields.foreach { f =>
    f.dataType match {
      case StringType | BooleanType | LongType | IntegerType | DoubleType |
           FloatType | ShortType | ByteType | DateType | TimestampType => ()
      case _: DecimalType => ()
      case other => throw new IllegalArgumentException(
        s"socrata sink cannot serialize ${other.simpleString} to CSV (column ${f.name})")
    }
  }

  def cell(row: InternalRow, i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) return ""
    dt match {
      case StringType => quote(row.getUTF8String(i).toString)
      case BooleanType => row.getBoolean(i).toString
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toString
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case TimestampType => // micros since epoch → Socrata floating timestamp
        val us = row.getLong(i)
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        // explicit pattern: LocalDateTime.toString drops ':00' seconds,
        // giving whole-minute rows a different wire shape than the rest
        val base = ldt.format(TsFormat)
        val frac = (Math.floorMod(us, 1000000L)).toInt
        if (frac == 0) base else base + f".$frac%06d"
      case other => throw new IllegalStateException(
        s"unreachable: ${other.simpleString} rejected by validateWriteSchema")
    }
  }

  private val TsFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** The ONE RFC-4180 cell/header quoting rule for Socrata CSV payloads
    * (Http.csvUpsertSink shares it — two serializers must not drift). */
  private[sources] def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}

class SocrataScanBuilder(fullSchema: StructType, url: String, pageSize: Int, numPartitions: Int,
    attestCollation: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, NullOrdering, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  // (SoQL $select expressions, $group columns, scan output schema)
  private var pushedAgg: Option[(Seq[String], Seq[String], StructType)] = None
  private var pushedLimit: Option[Int] = None
  private var pushedOrder: Seq[String] = Nil // SoQL $order fragments

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => SoQL.translate(f).isDefined)
    // Return ALL filters as residual: translated predicates still go
    // server-side in $where (reducing transferred rows), but Spark
    // re-applies them post-scan, so correctness never depends on the
    // server honoring $where (defensive pushdown, as in the JDBC
    // source's pushed-but-not-trusted predicates).
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // $select needs at least one column; empty prune (e.g. count(*))
    // falls back to the narrowest field.
    required =
      if (requiredSchema.fields.nonEmpty) requiredSchema
      else StructType(fullSchema.fields.take(1))

  // ---- aggregate pushdown (SupportsPushDownAggregates) ----------------
  // COUNT(*)/COUNT(col)/COUNT(DISTINCT col)/MIN/MAX, with GROUP BY,
  // translate to one SoQL aggregate query ($select=count(*) …&$group=…)
  // — the server answers with the aggregate rows instead of the source
  // paging the entire resource to count it driver-side. COMPLETE
  // pushdown only (the scan returns final values from one partition);
  // anything untranslatable declines, and Spark keeps its own hash
  // aggregate over the row scan. Note the interplay with the defensive
  // residual filters above: a Filter node between Aggregate and scan
  // blocks this rewrite, so filtered aggregates keep the trust-nothing
  // row path — exactly the queries where re-checking $where matters.

  /** min/max ride on the column's own type. Numerics and temporals
    * have ONE ordering both sides agree on; strings are deliberately
    * excluded — the server's text collation (case folding, locale) is
    * not attested to match Spark's binary UTF-8 comparison, and a
    * server-computed min/max over rows this side never sees cannot be
    * re-checked. String aggregates stay on the trust-nothing row
    * path — UNLESS the runtime probe attests binary collation (see
    * [[stringAttested]]). */
  private def minMaxable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | DateType | TimestampType => true
    case _ => false
  }

  /** Opt-in unlock of the string decline above: true when the session
    * option `attestCollation` is set AND [[SocrataCollation]]'s one
    * ordered probe request proved this column sorts in binary UTF-8
    * order on the server (memoized per url+column). Applies to ORDER
    * trust (min/max, top-N row selection); string count_distinct stays
    * declined — an order attestation says nothing about the server's
    * EQUALITY normalization, which is what distinctness trusts. */
  private def stringAttested(f: StructField): Boolean =
    attestCollation && f.dataType == StringType &&
      SocrataCollation.attested(url, f.name, pageSize)

  private def orderTrusted(f: StructField): Boolean =
    minMaxable(f.dataType) || stringAttested(f)

  private def fieldOf(e: V2Expression): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      fullSchema.fields.find(_.name == nr.fieldNames()(0))
    case _ => None
  }

  private def translateAggregation(agg: Aggregation)
      : Option[(Seq[String], Seq[String], StructType)] = {
    val groupFields = agg.groupByExpressions.toSeq.map(fieldOf)
    if (groupFields.exists(_.isEmpty)) return None
    val groups = groupFields.flatten
    val aggCols = agg.aggregateExpressions.toSeq.zipWithIndex.map { case (fn, i) =>
      val alias = s"agg_$i" // SoQL alias: lowercase identifier
      fn match {
        case _: CountStar =>
          Some((s"count(*) AS $alias", StructField(alias, LongType)))
        case c: Count if !c.isDistinct => fieldOf(c.column).map { f =>
          (s"count(${f.name}) AS $alias", StructField(alias, LongType))
        }
        // COUNT(DISTINCT) is a FINAL answer under complete pushdown —
        // nothing re-checks it — so it rides only on types whose
        // equality is unambiguous (the minMaxable set). Server-side
        // text normalization (case/Unicode folding) could make string
        // distinctness disagree with Spark's binary comparison, the
        // same unattested trust the string min/max decline removes.
        // SoQL's documented spelling is count_distinct(col).
        case c: Count => fieldOf(c.column).filter(f => minMaxable(f.dataType)).map { f =>
          (s"count_distinct(${f.name}) AS $alias", StructField(alias, LongType))
        }
        case m: Min => fieldOf(m.column).filter(orderTrusted)
          .map(f => (s"min(${f.name}) AS $alias", StructField(alias, f.dataType)))
        case m: Max => fieldOf(m.column).filter(orderTrusted)
          .map(f => (s"max(${f.name}) AS $alias", StructField(alias, f.dataType)))
        case _ => None
      }
    }
    if (aggCols.exists(_.isEmpty)) return None
    val selects = groups.map(_.name) ++ aggCols.flatten.map(_._1)
    val schema = StructType(groups ++ aggCols.flatten.map(_._2))
    Some((selects, groups.map(_.name), schema))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAggregation(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAggregation(agg) match {
      case Some(t) => pushedAgg = Some(t); true
      // partial pushdown is declined too (a false here, after
      // supportCompletePushDown said false, keeps the plain row scan)
      case None => false
    }

  // ---- limit / top-N pushdown (SupportsPushDownLimit/TopN) ------------
  // LIMIT becomes `$limit` and ORDER BY + LIMIT becomes `$order` +
  // `$limit`, so the server truncates instead of this side paging the
  // whole resource to throw most of it away. Both report PARTIAL
  // pushdown: Spark keeps its own (Take-ordered-)Limit above the ≤N
  // returned rows. For a plain LIMIT that makes correctness fully
  // server-independent (any N rows are a valid answer). A top-N is
  // weaker: the server's sort DISCARDS rows, and Spark's kept sort
  // re-orders only the N that came back — row SELECTION does trust
  // the server's ordering, which is why translateOrder below admits
  // only columns whose ordering is provably identical on both sides
  // (typed, non-nullable). Spark only offers these pushes when no
  // Filter sits between the limit and the scan, so they never reorder
  // around a residual re-check; declined outright when an aggregate is
  // already pushed (the agg result is what should be limited,
  // Spark-side).

  override def pushLimit(limit: Int): Boolean =
    if (pushedAgg.isDefined) false
    else { pushedLimit = Some(limit); true }

  /** A top-N's row selection trusts the server's sort (see the block
    * comment above), so a sort column must have EXACTLY one ordering
    * both sides agree on:
    *  - minMaxable types only — string collation is unattested;
    *  - NON-NULLABLE columns only. SoQL has no NULLS FIRST/LAST
    *    syntax; SODA documents NULL as the smallest value but that
    *    claim is not attested against a live endpoint, and a
    *    nulls-misplaced server sort would silently return the wrong
    *    surviving rows (unrecoverable — Spark re-sorts only the N
    *    survivors). A schema-declared non-nullable column makes null
    *    ordering moot; nullable columns keep the full-scan top-N.
    *    (A pushed IsNotNull can never stand in for the declaration:
    *    this source keeps every filter as a residual Filter node, and
    *    Spark offers top-N pushdown only when no Filter sits between
    *    the limit and the scan.)
    * Direction still must match Spark's default null placement so a
    * future nullable admission can't silently flip it. */
  private def translateOrder(o: V2SortOrder): Option[String] =
    fieldOf(o.expression())
      .filter(f => orderTrusted(f) && !f.nullable)
      .flatMap { f =>
        (o.direction(), o.nullOrdering()) match {
          case (SortDirection.ASCENDING, NullOrdering.NULLS_FIRST) => Some(s"${f.name} ASC")
          case (SortDirection.DESCENDING, NullOrdering.NULLS_LAST) => Some(s"${f.name} DESC")
          case _ => None
        }
      }

  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean = {
    if (pushedAgg.isDefined || orders.isEmpty) return false
    val parts = orders.toSeq.map(translateOrder)
    if (parts.exists(_.isEmpty)) false
    else { pushedOrder = parts.flatten; pushedLimit = Some(limit); true }
  }

  // one override serves both interfaces: the source may return fewer
  // rows than the full result (it returns at most N), Spark re-limits
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = pushedAgg match {
    case Some((selects, groups, aggSchema)) =>
      new SocrataAggScan(aggSchema, url, pageSize,
        pushed.flatMap(SoQL.translate), selects, groups)
    case None =>
      new SocrataScan(required, url, pageSize, numPartitions,
        pushed.flatMap(SoQL.translate), pushedLimit, pushedOrder)
  }
}

/** One-partition scan for a COMPLETELY pushed aggregation: the server
  * computes the aggregate, this side just pages the (group-count-
  * bounded, usually tiny) result rows. Grouped results page under
  * `$order=<group cols>` (aggregate queries can't order by `:id`);
  * a global aggregate is a single row and single page. */
class SocrataAggScan(schema: StructType, url: String, pageSize: Int,
    soqlPredicates: Array[String], selects: Seq[String], groups: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SocrataAggScan(url=$url, select=${selects.mkString(", ")}, " +
      s"group=${groups.mkString(", ")}, where=${soqlPredicates.mkString(" AND ")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SocrataPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new SocrataAggReaderFactory(schema, url, pageSize, soqlPredicates, selects, groups)
}

class SocrataAggReaderFactory(schema: StructType, url: String, pageSize: Int,
    preds: Array[String], selects: Seq[String], groups: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SocrataAggReader(schema, url, pageSize, preds, selects, groups)
}

class SocrataAggReader(schema: StructType, url: String, pageSize: Int,
    preds: Array[String], selects: Seq[String], groups: Seq[String])
    extends PagedJsonReader(schema, pageSize) {

  override protected def firstPage: Int = 0
  override protected def stride: Int = 1
  // a global aggregate is one row, one page; grouped results page
  // until the empty page like the row scan
  override protected def singlePage: Boolean = groups.isEmpty
  override protected def shortPageError: String =
    "socrata returned a short non-final aggregate page: result groups were " +
      s"skipped — either the server caps $$limit below pageSize=$pageSize " +
      "(lower the pageSize option) or the resource changed between fetches " +
      "(re-run against a quiet resource)"

  override protected def pageUrl(pageLimit: Long, offset: Long): String = {
    val qs = new StringBuilder()
    qs.append("$select=").append(java.net.URLEncoder.encode(selects.mkString(","), "UTF-8"))
    if (groups.nonEmpty) {
      qs.append("&$group=").append(java.net.URLEncoder.encode(groups.mkString(","), "UTF-8"))
      qs.append("&$order=").append(java.net.URLEncoder.encode(groups.mkString(","), "UTF-8"))
    }
    if (preds.nonEmpty)
      qs.append("&$where=").append(java.net.URLEncoder.encode(
        preds.mkString(" AND "), "UTF-8"))
    qs.append("&$limit=").append(pageLimit).append("&$offset=").append(offset)
    url + (if (url.contains("?")) "&" else "?") + qs
  }
}

/** The ONE `$limit`/`$offset` paging state machine shared by the row
  * and aggregate readers: requests one page via [[pageUrl]], drains
  * it, resolves short pages with an exhaustion probe (below), and
  * terminates on the empty page — or after the first page when
  * [[singlePage]], or at [[rowLimit]] emitted rows under a pushed
  * limit. Subclasses choose only the query-string shape and the
  * paging geometry; the subtle exhaustion/guard protocol exists
  * exactly once.
  *
  * Short-page protocol: a SHORT page (non-empty, fewer rows than
  * asked) is either the genuine end of the resource or a server
  * `$limit` cap below `pageSize` — and the two demand opposite
  * actions, because this reader's offsets advance in fixed
  * `pageSize` strides: under a cap the un-sent remainder of the
  * window would be silently skipped. One probe request at the exact
  * offset where the short page ended distinguishes them without
  * trusting the server: a row there proves data was skipped (fail
  * loudly), an empty probe proves the resource ends inside this
  * window (clean termination). Probing eagerly — rather than
  * flagging and checking whether the NEXT page is non-empty — also
  * catches the cap whose skipped remainder lies entirely before an
  * empty next window (e.g. a 60-row resource under a 50-row cap at
  * pageSize 100), which a next-page check would silently drop. */
private[socrata] abstract class PagedJsonReader(schema: StructType, pageSize: Int)
    extends PartitionReader[InternalRow] {

  /** Full request URL for one page of `pageLimit` rows at `offset`. */
  protected def pageUrl(pageLimit: Long, offset: Long): String
  /** First global page index and stride between this reader's pages. */
  protected def firstPage: Int
  protected def stride: Int
  /** Client-side cap on emitted rows (a pushed LIMIT), if any. */
  protected def rowLimit: Option[Int] = None
  /** True when the first page is known to be the whole result. */
  protected def singlePage: Boolean = false
  protected def shortPageError: String

  private val mapper = new ObjectMapper()
  private var page: Iterator[JsonNode] = Iterator.empty
  private var pageNo: Int = -1
  private var rowsEmitted = 0L
  private var exhausted = false
  private var current: InternalRow = _

  private def parsePage(body: Array[Byte]): Seq[JsonNode] = {
    val node = mapper.readTree(body)
    val items = if (node.isArray) node.elements() else util.Collections.emptyIterator[JsonNode]()
    val buf = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
    items.forEachRemaining(n => buf += n)
    buf.toSeq
  }

  private def fetchPage(): Unit = {
    if (pageNo < 0) pageNo = firstPage
    val remaining = rowLimit.map(l => l - rowsEmitted).getOrElse(Long.MaxValue)
    val pageLimit = math.min(pageSize.toLong, remaining)
    val offset = pageNo.toLong * pageSize
    val full = pageUrl(pageLimit, offset)
    val r = Http.get(full)
    if (!r.ok) throw new RuntimeException(s"socrata page fetch failed: ${r.error} ($full)")
    val buf = parsePage(r.body)
    // short page → exhaustion probe (class scaladoc): a row at the
    // short page's end proves the server capped $limit under what was
    // asked and fixed-stride offsets would skip data — the remedies
    // (lower pageSize under the cap, or re-run against a resource not
    // being mutated mid-scan) are in the error text. An empty probe
    // proves this window is the resource's end.
    if (buf.nonEmpty && buf.length < pageLimit && !singlePage) {
      val probe = pageUrl(1L, offset + buf.length)
      val pr = Http.get(probe)
      if (!pr.ok) throw new RuntimeException(s"socrata probe fetch failed: ${pr.error} ($probe)")
      if (parsePage(pr.body).nonEmpty) throw new IllegalStateException(shortPageError)
      exhausted = true
    }
    if (buf.isEmpty || singlePage) exhausted = true
    pageNo += stride
    page = buf.iterator
  }

  override def next(): Boolean = {
    if (rowLimit.exists(rowsEmitted >= _)) return false
    while (!page.hasNext && !exhausted) fetchPage()
    if (!page.hasNext) return false
    current = JsonRows.toRow(page.next(), schema)
    rowsEmitted += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class SocrataScan(schema: StructType, url: String, pageSize: Int, numPartitions: Int,
    soqlPredicates: Array[String], limit: Option[Int] = None,
    order: Seq[String] = Nil) extends Scan with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SocrataScan(url=$url, where=${soqlPredicates.mkString(" AND ")}" +
      limit.map(l => s", limit=$l").getOrElse("") +
      (if (order.nonEmpty) s", order=${order.mkString(",")}" else "") + ")"

  // a limited scan reads from ONE partition: interleaved paging would
  // fetch up to N rows per partition to keep N overall
  override def planInputPartitions(): Array[InputPartition] = {
    val n = if (limit.isDefined) 1 else numPartitions
    (0 until n).map(i => SocrataPartition(i, n): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SocrataReaderFactory(schema, url, pageSize, soqlPredicates, limit, order)

  /** Planning-time stats via ONE `$select=count(*)` request (with the
    * pushed `$where`), so Catalyst/AQE can size this relation for
    * broadcast decisions instead of assuming worst-case. Failures
    * degrade to unknown — stats must never fail planning. Row width is
    * the schema's Catalyst default estimate. */
  private lazy val remoteCount: java.util.OptionalLong = {
    val qs = new StringBuilder("$select=")
      .append(java.net.URLEncoder.encode("count(*) AS cnt", "UTF-8"))
    if (soqlPredicates.nonEmpty)
      qs.append("&$where=").append(java.net.URLEncoder.encode(
        soqlPredicates.mkString(" AND "), "UTF-8"))
    val full = url + (if (url.contains("?")) "&" else "?") + qs
    scala.util.Try {
      val r = Http.get(full)
      require(r.ok, r.error)
      val node = new ObjectMapper().readTree(r.body)
      node.elements().next().get("cnt").asLong()
    }.fold(_ => java.util.OptionalLong.empty(),
      n => java.util.OptionalLong.of(limit.fold(n)(l => math.min(n, l.toLong))))
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): java.util.OptionalLong = remoteCount
    override def sizeInBytes(): java.util.OptionalLong =
      if (!remoteCount.isPresent) java.util.OptionalLong.empty()
      else java.util.OptionalLong.of(
        remoteCount.getAsLong * schema.fields.map(_.dataType.defaultSize.toLong).sum)
  }
}

case class SocrataPartition(index: Int, of: Int) extends InputPartition

class SocrataReaderFactory(schema: StructType, url: String, pageSize: Int,
    preds: Array[String], limit: Option[Int] = None,
    order: Seq[String] = Nil) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SocrataReader(schema, url, pageSize, preds,
      p.asInstanceOf[SocrataPartition], limit, order)
}

/** Pages through the resource: this partition reads global pages
  * index, index+of, index+2·of, … until a short/empty page (or, under
  * a pushed limit, until `limit` rows have been emitted — the page
  * `$limit` shrinks to the remainder so the server never sends rows
  * this side would discard). A pushed `$order` prefixes the `:id`
  * total-order tiebreak, keeping pagination stable under duplicates
  * of the sort key. Paging protocol lives in [[PagedJsonReader]]. */
class SocrataReader(schema: StructType, url: String, pageSize: Int,
    preds: Array[String], part: SocrataPartition,
    limit: Option[Int] = None, order: Seq[String] = Nil)
    extends PagedJsonReader(schema, pageSize) {

  override protected def firstPage: Int = part.index
  override protected def stride: Int = part.of
  override protected def rowLimit: Option[Int] = limit
  override protected def shortPageError: String =
    "socrata returned a short non-final page: rows were skipped — either " +
      s"the server caps $$limit below pageSize=$pageSize (lower the " +
      "pageSize option) or rows were appended to the resource between " +
      "fetches (re-run against a quiet resource)"

  override protected def pageUrl(pageLimit: Long, offset: Long): String = {
    val qs = new StringBuilder()
    qs.append("$limit=").append(pageLimit)
      .append("&$offset=").append(offset)
      // $limit/$offset paging is only well-defined under a total order;
      // :id is Socrata's stable system row id. Without this, pages can
      // overlap/miss rows across requests and partitions.
      .append("&$order=").append(java.net.URLEncoder.encode(
        (order :+ ":id").mkString(","), "UTF-8"))
    if (preds.nonEmpty)
      qs.append("&$where=").append(java.net.URLEncoder.encode(
        preds.mkString(" AND "), "UTF-8"))
    qs.append("&$select=").append(java.net.URLEncoder.encode(
      schema.fieldNames.mkString(","), "UTF-8"))
    url + (if (url.contains("?")) "&" else "?") + qs
  }
}

/** JSON object → InternalRow for the supported field types. */
object JsonRows {
  def toRow(node: JsonNode, schema: StructType): InternalRow = {
    val vals = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null else convert(v, f.dataType)
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  /** Types this connector can materialize. Checked at PLAN time
    * (validateSchema) so unsupported types fail with a named error
    * instead of stuffing a UTF8String into a mistyped slot that
    * crashes (or silently corrupts) downstream unsafe access. */
  def validateSchema(schema: StructType): Unit = schema.fields.foreach(f =>
    validateType(f.dataType, f.name))

  private def validateType(dt: DataType, path: String): Unit = dt match {
    case StringType | BooleanType | LongType | IntegerType | DoubleType |
         DateType | TimestampType => ()
    case ArrayType(et, _) => validateType(et, s"$path.element")
    case st: StructType => st.fields.foreach(f => validateType(f.dataType, s"$path.${f.name}"))
    case other => throw new IllegalArgumentException(
      s"socrata source does not support ${other.simpleString} (column $path)")
  }

  private def convert(v: JsonNode, dt: DataType): Any = dt match {
    case StringType =>
      UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
    case BooleanType => v.asBoolean()
    case LongType => v.asLong()
    case IntegerType => v.asInt()
    case DoubleType => v.asDouble()
    case DateType => // ISO date string -> days since epoch
      java.time.LocalDate.parse(v.asText().take(10)).toEpochDay.toInt
    case TimestampType => // Socrata floating timestamp (ISO, no zone) as UTC micros
      val inst = java.time.LocalDateTime.parse(v.asText())
        .toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000
    case ArrayType(et, _) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      v.elements().forEachRemaining(e => buf += convert(e, et))
      new GenericArrayData(buf.toArray)
    case st: StructType => toRow(v, st)
    case other => throw new IllegalStateException(
      s"unreachable: ${other.simpleString} rejected by validateSchema")
  }
}

/** Catalyst v1 Filter → SoQL predicate translation (the subset SoQL
  * supports; everything else stays a residual Spark-side filter). */
/** Runtime collation capability probe (VERDICT r15 item 5; hardened
  * per ADVICE r16): string aggregate/top-N pushdown is declined BY
  * DEFAULT because the server's text collation (case folding, locale)
  * is not attested to match Spark's binary UTF-8 comparison. This
  * probe can attest it at runtime: TWO ordered requests
  * (`$select=col&$order=col&$limit=page`, ascending then descending)
  * against the live endpoint. The ASCENDING sample must
  *
  *  1. be in exact binary-UTF-8 byte order (Spark's UTF8String order),
  *  2. contain a DISCRIMINATING adjacent pair — one a case-folding or
  *     locale collator (Collator ROOT) would order the other way, so a
  *     folding server could not have produced the sequence, and
  *  3. contain at least one non-ASCII value (all collations agree on
  *     sorted ASCII-only data — such a sample attests nothing);
  *
  * and the DESCENDING sample must (4) be in non-increasing binary
  * order and (5) bound the ascending sample — the ASC page holds the
  * column's globally smallest values and the DESC page its largest,
  * so max(asc) ≤ max(desc) and min(asc) ≤ min(desc) in binary order.
  * The DESC leg is the spot-check ADVICE r16 asked for: min()/max()
  * and DESC top-N trust the server's ordering of rows this side never
  * pages, and a server whose descending collation disagrees with its
  * ascending one (or whose extremes contradict the probe sample) now
  * fails the attestation instead of being trusted.
  *
  * TRUST BOUNDARY, stated for users of `attestCollation=true`: the
  * attestation is SAMPLE-BASED — it proves the server ordered two
  * `pageSize` pages in binary UTF-8 order, not that every aggregate
  * over every row is binary-collated. Rows beyond the probed pages
  * are trusted by induction from those samples. All checks fail
  * CLOSED: a sample that can't prove binary collation (too small,
  * all-ASCII, already collation-agnostic, inconsistent between
  * directions) keeps the decline, and everything the attestation does
  * NOT unlock (string count_distinct — equality normalization is a
  * different claim than ordering) stays declined. Row-returning
  * paths never trust the attestation at all: top-N is PARTIAL
  * pushdown, so Spark re-sorts whatever rows the server returns
  * (pinned by the lying-server test in SocrataSourceSpec). Verdicts
  * are memoized per (url, column) for the session — one probe (two
  * requests), then the unlock holds. */
object SocrataCollation {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def attested(url: String, column: String, pageSize: Int): Boolean =
    cache.computeIfAbsent(s"$url#$column",
      _ => java.lang.Boolean.valueOf(probe(url, column, pageSize))).booleanValue()

  private[sources] def clearCacheForTests(): Unit = cache.clear()

  /** a <= b in unsigned UTF-8 byte order — UTF8String's comparison
    * (NOT String.compareTo, whose UTF-16 code-unit order disagrees on
    * supplementary characters). */
  private[sources] def binaryLeq(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }

  /** The pure attestation decision over the server-ordered sample. */
  private[sources] def attests(vals: Seq[String]): Boolean = {
    if (vals.length < 2) return false
    val pairs = vals.zip(vals.tail)
    val sortedBinary = pairs.forall { case (a, b) => binaryLeq(a, b) }
    val coll = java.text.Collator.getInstance(java.util.Locale.ROOT)
    val discriminating = pairs.exists { case (a, b) =>
      a != b && binaryLeq(a, b) && coll.compare(a, b) > 0 }
    val nonAscii = vals.exists(_.exists(_ > 127))
    sortedBinary && discriminating && nonAscii
  }

  /** DESC-leg consistency: non-increasing binary order, and the two
    * pages bound each other (asc = globally smallest values, desc =
    * globally largest): max(asc) ≤ max(desc), min(asc) ≤ min(desc). */
  private[sources] def descConsistent(asc: Seq[String],
      desc: Seq[String]): Boolean = {
    if (asc.isEmpty || desc.isEmpty) return false
    val sortedDesc = desc.zip(desc.tail).forall { case (a, b) => binaryLeq(b, a) }
    sortedDesc && binaryLeq(asc.last, desc.head) && binaryLeq(asc.head, desc.last)
  }

  private def probe(url: String, column: String, pageSize: Int): Boolean =
    scala.util.Try {
      def page(orderSuffix: String): Seq[String] = {
        val qs = "$select=" + java.net.URLEncoder.encode(column, "UTF-8") +
          "&$order=" + java.net.URLEncoder.encode(column + orderSuffix, "UTF-8") +
          "&$limit=" + pageSize
        val full = url + (if (url.contains("?")) "&" else "?") + qs
        val r = Http.get(full)
        require(r.ok, r.error)
        val it = new ObjectMapper().readTree(r.body).elements()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val v = it.next().get(column)
          if (v != null && !v.isNull) buf += v.asText()
        }
        buf.toSeq
      }
      val asc = page("")
      // the ASC leg carries the discrimination requirements; probe the
      // DESC leg only if it passed (fail-closed either way, and a
      // failing ASC saves the second request)
      attests(asc) && descConsistent(asc, page(" DESC"))
    }.getOrElse(false) // a failed probe attests nothing

}

object SoQL {
  def translate(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => literal(v).map(l => s"${ident(a)} = $l")
    case GreaterThan(a, v) => literal(v).map(l => s"${ident(a)} > $l")
    case GreaterThanOrEqual(a, v) => literal(v).map(l => s"${ident(a)} >= $l")
    case LessThan(a, v) => literal(v).map(l => s"${ident(a)} < $l")
    case LessThanOrEqual(a, v) => literal(v).map(l => s"${ident(a)} <= $l")
    case StringStartsWith(a, v) => literal(v).map(l => s"starts_with(${ident(a)}, $l)")
    case IsNotNull(a) => Some(s"${ident(a)} IS NOT NULL")
    case IsNull(a) => Some(s"${ident(a)} IS NULL")
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.map(literal)
      if (ls.exists(_.isEmpty)) None
      else Some(ls.flatten.map(l => s"${ident(a)} = $l").mkString("(", " OR ", ")"))
    case And(l, r) =>
      for { lt <- translate(l); rt <- translate(r) } yield s"($lt AND $rt)"
    case Or(l, r) =>
      for { lt <- translate(l); rt <- translate(r) } yield s"($lt OR $rt)"
    case _ => None
  }

  private def ident(a: String): String = a

  /** SoQL literal rendering. Dates/timestamps MUST be quoted — an
    * unquoted 2024-01-01 parses as integer subtraction (= 2022) and
    * silently excludes rows server-side, which the defensive residual
    * re-filter cannot restore. Nulls make the predicate untranslatable
    * (None) rather than NPE-ing during planning. */
  private def literal(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean => Some(b.toString)
    case d: java.sql.Date => Some("'" + d.toString + "'")
    case t: java.sql.Timestamp =>
      Some("'" + t.toLocalDateTime.toString + "'")
    case d: java.time.LocalDate => Some("'" + d.toString + "'")
    case i: java.time.Instant =>
      Some("'" + java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC) + "'")
    case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte |
              _: BigDecimal | _: java.math.BigDecimal) => Some(n.toString)
    case _ => None // unknown external type: leave Spark-side
  }
}
