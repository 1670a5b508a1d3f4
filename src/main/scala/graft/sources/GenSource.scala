package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 form of the q4112 items generator (`graft.gen.Q4112Gen
  * .items`): `spark.read.format("graft.sources.GenSource")` with options
  * `rows`, `seed`, `valMax`, `partitions`. The reference's generator is
  * an in-memory array fill (q4112_gen.o, q4112_main.c:101-119); this is
  * its Spark-native source form — the engine plans AGAINST it like any
  * table instead of materializing it first.
  *
  * Every row is a pure function of (seed, id) via the same xxhash64 fold
  * Catalyst's `xxhash64(lit(seed), $"id")` evaluates, so the source is
  * bit-identical to the declarative generator (pinned by SourceV2Spec
  * and the `source_gen_v2` oracle gate) at any partition count.
  *
  * The three integration points a production source needs are all real:
  *  - column pruning (`SupportsPushDownRequiredColumns`): `select(price)`
  *    never materializes ids;
  *  - predicate pushdown (`SupportsPushDownFilters`): id-range filters
  *    narrow the GENERATED range — the source-level analog of partition
  *    pruning, rows outside the bound are never produced;
  *  - statistics (`SupportsReportStatistics`): rowCount/sizeInBytes
  *    reach the planner with zero I/O, so join-side selection (e.g.
  *    broadcast) works against the source like a parquet table with
  *    catalog stats.
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // getTable receives the reader options with ORIGINAL key case —
    // normalize so option("valMax", …) and option("valmax", …) agree
    val opts = new CaseInsensitiveStringMap(properties)
    new GenTable(
      opts.getLong("rows", 1000L),
      opts.getLong("seed", 42L),
      opts.getLong("valmax", 10000000L),
      opts.getInt("partitions", 8),
      opts.getLong("batchrows", 1000L))
  }
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("price", LongType, nullable = false)))

  /** Catalyst's `xxhash64(lit(seed), id)`: fold over children with
    * initial seed 42, each step `hash(value, LongType, acc)`.
    */
  def priceOf(genSeed: Long, id: Long, valMax: Long): Long = {
    val h1 = XxHash64Function.hash(genSeed, LongType, 42L)
    val h2 = XxHash64Function.hash(id, LongType, h1)
    val m = valMax + 1L
    val r = h2 % m
    if (r < 0) r + m else r
  }
}

class GenTable(rows: Long, seed: Long, valMax: Long, partitions: Int,
    batchRows: Long)
    extends Table with SupportsRead {
  override def name: String = s"graft_gen_items($rows)"
  override def schema: StructType = GenSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, seed, valMax, partitions, batchRows)
}

class GenScanBuilder(rows: Long, seed: Long, valMax: Long, partitions: Int,
    batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = GenSource.schema
  // generated id range [lo, hi), narrowed by pushed id bounds
  private var lo: Long = 1L
  private var hi: Long = rows + 1L
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      // the exclusive-bound rewrites add 1 to v — leave Long.MaxValue
      // bounds unhandled (Spark re-applies them) instead of overflowing
      // into a wrong empty/full scan
      case GreaterThan("id", v: Long) => v < Long.MaxValue
      case LessThanOrEqual("id", v: Long) => v < Long.MaxValue
      case GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) => true
      case _ => false
    }
    handled.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1L)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1L)
      case _ =>
    }
    pushed = handled
    rest // Spark re-applies anything we do not fully handle; id bounds
         // are exact here, so returning `rest` only is also correct
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Limit pushdown: an unordered LIMIT n over a generated range is the
    * range's first n ids — narrow [lo, hi) so out-of-limit rows are
    * never produced (the same generation-elision as the id-range filter
    * pushdown). Spark keeps its own Limit on top (isPartiallyPushed
    * default), which is a no-op over the already-exact row count.
    */
  override def pushLimit(limit: Int): Boolean = {
    // never narrow under a pushed aggregate: the analytic answers are
    // functions of the FULL [lo, hi) range, and a limit-truncated range
    // would make them silently wrong. Spark's optimizer currently makes
    // the combination unreachable (EliminateLimits removes limits over
    // 1-row ungrouped aggregates before V2 pushdown), but the builder
    // must not rely on that ordering (round-9 advice item 4).
    if (pushedAgg.isDefined) return false
    if (limit >= 0 && lo + limit < hi) hi = lo + limit
    true
  }

  /** Aggregate pushdown (`SupportsPushDownAggregates`) — the aggregates
    * a generated range can answer ANALYTICALLY, with zero rows produced:
    * over [lo, hi) (post-filter-pushdown bounds), COUNT(*) = hi−lo,
    * COUNT/COUNT DISTINCT(id) = hi−lo (ids are dense and unique),
    * MIN(id) = lo, MAX(id) = hi−1, SUM(id) = the arithmetic series. The
    * pushdown is COMPLETE (Spark drops its Aggregate node entirely and
    * reads the 1-row answer), which is the strongest form of the
    * scan-side work elimination parquet footers give COUNT(*): at any
    * scale the query is O(1). Anything touching `price` (hash-valued)
    * or grouped is declined and Spark falls back to the row scan.
    */
  private def answers(agg: Aggregation): Option[Array[AggregateFunc]] = {
    def isId(refs: Array[_]): Boolean = refs.length == 1 && (refs(0) match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (agg.groupByExpressions.nonEmpty) return None
    val fns = agg.aggregateExpressions
    // SUM(id) is answered only when the exact arithmetic series fits a
    // signed long over the CURRENT (post-filter-pushdown, clamped)
    // range: a wrapped value would diverge from the engine's own Sum
    // (non-ANSI wraps identically only by accident of implementation;
    // ANSI mode would throw). Declining keeps the pushdown sound under
    // every overflow config (round-9 advice item 5).
    def sumFits: Boolean = {
      val blo = math.max(lo, 1L)
      val bhi = math.min(hi, rows + 1L)
      val n = math.max(0L, bhi - blo)
      n == 0L || ((BigInt(blo) + BigInt(bhi) - 1) * n / 2).isValidLong
    }
    val ok = fns.nonEmpty && fns.forall {
      case _: CountStar => true
      case c: Count => isId(c.children)       // unique ⇒ distinct-safe
      case m: Min => isId(m.children)
      case m: Max => isId(m.children)
      case s: Sum if !s.isDistinct => isId(s.children) && sumFits
      case _ => false
    }
    if (ok) Some(fns) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answers(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    answers(agg) match {
      case Some(_) => pushedAgg = Some(agg); true
      case None => false
    }

  override def build(): Scan = {
    val blo = math.max(lo, 1L)
    val bhi = math.min(hi, rows + 1L)
    pushedAgg match {
      case Some(agg) => new GenAggScan(agg, blo, bhi)
      case None =>
        new GenScan(required, blo, bhi, seed, valMax, partitions, batchRows)
    }
  }
}

/** The 1-row answer scan for a completely-pushed aggregation: the agg
  * values are closed-form functions of the generated id range, so the
  * "scan" is a single partition emitting a single precomputed row.
  * Empty ranges follow Spark's ungrouped-aggregate semantics (count 0,
  * null min/max/sum); SUM is exact — `answers` declines the pushdown
  * whenever the BigInt series would not fit a signed long, so the
  * `.toLong` below never wraps.
  */
class GenAggScan(agg: Aggregation, lo: Long, hi: Long)
    extends Scan with Batch with SupportsReportStatistics {
  private val n = math.max(0L, hi - lo)

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map { case (f, i) =>
      val nullable = !(f.isInstanceOf[CountStar] || f.isInstanceOf[Count])
      StructField(s"agg_$i", LongType, nullable)
    })

  override def toBatch: Batch = this
  override def description(): String =
    s"PushedAggregates: [${agg.aggregateExpressions.mkString(", ")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes: util.OptionalLong =
      util.OptionalLong.of(8L * agg.aggregateExpressions.length)
    override def numRows: util.OptionalLong = util.OptionalLong.of(1L)
  }

  private def row: InternalRow = InternalRow.fromSeq(
    agg.aggregateExpressions.toSeq.map {
      case _: CountStar => n
      case _: Count => n
      case _: Min => if (n == 0) null else lo
      case _: Max => if (n == 0) null else hi - 1L
      case _: Sum =>
        if (n == 0) null
        else ((BigInt(lo) + BigInt(hi) - 1) * n / 2).toLong
    })

  override def planInputPartitions(): Array[InputPartition] =
    Array(GenRange(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory =
    new GenAggReaderFactory(row)
}

class GenAggReaderFactory(answer: InternalRow) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = answer
      override def close(): Unit = ()
    }
}

class GenScan(
    required: StructType, lo: Long, hi: Long,
    seed: Long, valMax: Long, partitions: Int, batchRows: Long)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming form: the same generated range drained in micro-batches
    * of at most `batchRows` ids — the rate-limited backfill pattern (a
    * bounded historical range replayed through the streaming engine so
    * downstream watermarks/sinks/checkpoints see it incrementally).
    * Offsets are plain id positions; restart from a checkpoint resumes
    * at the committed id because generation is a pure function of id.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(required, lo, hi, seed, valMax, partitions,
      math.max(1L, batchRows))

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes: util.OptionalLong =
      util.OptionalLong.of(n * 8L * math.max(1, required.size))
    override def numRows: util.OptionalLong = util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val parts = math.max(1, math.min(partitions, n).toInt)
    (0 until parts).map { i =>
      GenRange(lo + n * i / parts, lo + n * (i + 1) / parts): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames, seed, valMax)
}

case class GenRange(start: Long, end: Long) extends InputPartition

/** Offset = exclusive upper id already visible to the engine. */
case class GenOffset(pos: Long) extends Offset {
  override def json: String = pos.toString
}

class GenMicroBatchStream(
    required: StructType, lo: Long, hi: Long,
    seed: Long, valMax: Long, partitions: Int, batchRows: Long)
    extends MicroBatchStream {

  // admission control: each latestOffset() call reveals at most
  // batchRows more ids, so the engine plans bounded micro-batches
  @volatile private var revealed: Long = lo

  override def initialOffset(): Offset = GenOffset(lo)
  override def latestOffset(): Offset = {
    revealed = math.min(hi, revealed + batchRows)
    GenOffset(revealed)
  }
  override def deserializeOffset(json: String): Offset = {
    // a checkpoint restart resumes here: reveal nothing below it again
    val p = json.toLong
    if (p > revealed) revealed = p
    GenOffset(p)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].pos
    val e = end.asInstanceOf[GenOffset].pos
    val n = math.max(0L, e - s)
    if (n == 0) return Array.empty
    val parts = math.max(1, math.min(partitions, n).toInt)
    (0 until parts).map { i =>
      GenRange(s + n * i / parts, s + n * (i + 1) / parts): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames, seed, valMax)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class GenReaderFactory(fields: Array[String], seed: Long, valMax: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[GenRange]
    // resolve the projection ONCE per reader: the per-row path must not
    // allocate a Seq or string-match field names (this loop runs 1e9
    // times per scan at matrix scale). The reused SpecificInternalRow
    // holds primitive longs — Spark's row-reader contract allows the
    // same row object per get(), downstream copies into UnsafeRow
    val isId: Array[Boolean] = fields.map {
      case "id" => true
      case "price" => false
      case other => throw new IllegalArgumentException(s"unknown gen column: $other")
    }
    new PartitionReader[InternalRow] {
      private var id = r.start - 1L
      private val row = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
        fields.map(_ => LongType: org.apache.spark.sql.types.DataType).toSeq)
      override def next(): Boolean = { id += 1L; id < r.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < isId.length) {
          row.setLong(i, if (isId(i)) id else GenSource.priceOf(seed, id, valMax))
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
