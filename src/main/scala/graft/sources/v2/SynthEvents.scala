package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-events source — the load-generator table
  * a benchmark or soak harness reads instead of files
  * (`spark.read.format("graft.sources.v2.SynthEventsProvider")
  * .option("rows", n)`): every row is a pure deterministic function
  * of its id through the same portable 60-bit md5 hash the dedup
  * tier uses ([[graft.functions.PortableHash]]), so the WHOLE SOURCE
  * is oracle-checkable — DuckDB regenerates identical rows from
  * `range()` (gate query q324).
  *
  * This is the full custom-connector surface (SURVEY §2.1 S1's
  * "custom TableProvider" option, exercised for real):
  *
  *  - [[SupportsPushDownRequiredColumns]]: the reader materializes
  *    ONLY requested columns — a projection never pays for `props`-
  *    style wide fields it didn't ask for;
  *  - [[SupportsPushDownFilters]]: range/equality predicates on
  *    `event_id` narrow the GENERATED id range at planning time —
  *    the source-side analogue of parquet row-group pruning (a
  *    `WHERE event_id < k` scan does k rows of work, not `rows`);
  *    non-id filters are left for Spark to evaluate (returned as
  *    residuals);
  *  - partition planning: the surviving id range splits into `parts`
  *    equal [[InputPartition]]s, so generation parallelizes exactly
  *    like a file scan's splits;
  *  - [[SupportsPushDownAggregates]]: ungrouped COUNT(*) /
  *    COUNT(col) / MIN(event_id) / MAX(event_id) collapse COMPLETELY
  *    at the source into one closed-form row over the (already
  *    filter-narrowed) id range — the connector analogue of
  *    answering MIN/MAX/COUNT from parquet footer stats (gate query
  *    q343 asserts the plan is Project-over-BatchScan with zero
  *    aggregate operators); GROUP BY user_id — and the multi-key
  *    GROUP BY user_id, event_type (either order, or event_type
  *    alone) — with COUNT/MIN(event_id)/MAX(event_id)/SUM(event_id)
  *    pushes PARTIALLY (`supportCompletePushDown = false` — the scan
  *    emits one partial row per (partition, group), Spark finalizes:
  *    COUNT and SUM partials re-aggregate as SUM, MIN/MAX as
  *    themselves; gate queries q358 and q376). Other grouped or
  *    distinct aggregates are declined and evaluated by Spark over
  *    the generated rows.
  *
  * Columns are integers + a low-cardinality string: exact on any
  * engine, no float parity concerns in the oracle.
  */
class SynthEventsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthEventsTable(new CaseInsensitiveStringMap(properties))
}

object SynthEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_l", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_e2", LongType, nullable = false)))

  val types: IndexedSeq[String] =
    IndexedSeq("click", "error", "purchase", "signup", "view")

  /** JVM twin of PortableHash.hash60: first 15 hex digits of md5 as
    * an unsigned long — bit-identical to the Spark column expression
    * and to hash60DuckSql (asserted in SourcesSpec).
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"${b & 0xff}%02x").mkString // 16 hex chars
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def tsL(i: Long): Long = 1704067200L + hash60(s"v2t:$i") % 2592000L
  def userId(i: Long, users: Long): Long = hash60(s"v2u:$i") % users
  /** `layout=mod` user assignment: id mod users — the layout whose
    * per-user id sets are ENUMERABLE (user u owns u, u+users, …), so
    * a scan can plan key-disjoint per-user partitions doing work
    * proportional to their own rows. The hash layout stays the
    * default; mod is the clustered-storage stand-in. */
  def userIdMod(i: Long, users: Long): Long = i % users
  def eventType(i: Long): String = types((hash60(s"v2e:$i") % 5).toInt)
  def valueE2(i: Long): Long = hash60(s"v2v:$i") % 100000L

  /** The DuckDB generator for the oracle: identical rows from
    * range(lo, hi). */
  def duckSql(lo: Long, hi: Long, users: Long,
              layout: String = "hash"): String = {
    import graft.functions.PortableHash.hash60DuckSql
    val uid =
      if (layout == "mod") s"i % $users"
      else s"${hash60DuckSql("'v2u:' || i")} % $users"
    s"""SELECT CAST(i AS BIGINT) AS event_id,
       |  1704067200 + ${hash60DuckSql("'v2t:' || i")} % 2592000 AS ts_l,
       |  $uid AS user_id,
       |  ['click','error','purchase','signup','view']
       |    [1 + CAST(${hash60DuckSql("'v2e:' || i")} % 5 AS INT)]
       |    AS event_type,
       |  ${hash60DuckSql("'v2v:' || i")} % 100000 AS value_e2
       |FROM (SELECT unnest(range($lo, $hi)) AS i)""".stripMargin
  }
}

class SynthEventsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows = options.getLong("rows", 100000L)
  private val users = options.getLong("users", 1500L)
  private val parts = options.getInt("parts", 8)
  // layout=mod: user_id = event_id % users (DuckDB-reproducible like
  // the hash layout, but per-user id sets are enumerable);
  // userparts=true (requires mod): plan ONE KEY-DISJOINT PARTITION
  // PER USER and report KeyGroupedPartitioning(identity(user_id)) —
  // a grouped read over user_id then runs with ZERO exchange, the
  // connector analogue of a bucketed table (gate queries q402/q403)
  private val layout = options.getOrDefault("layout", "hash")
  private val userparts = options.getBoolean("userparts", false)
  require(!userparts || layout == "mod",
    "userparts=true requires layout=mod (per-user id sets must be " +
      "enumerable for key-disjoint partitions)")

  override def name(): String = s"synth_events($rows)"
  override def schema(): StructType = SynthEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, users, parts, layout == "mod", userparts)
}

class SynthScanBuilder(rows: Long, users: Long, parts: Int,
                       mod: Boolean = false, userparts: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset {

  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthEvents.schema
  private var aggs: Option[Seq[AggregateFunc]] = None

  // id-range predicates narrow the generated range at PLANNING time;
  // anything else stays a residual for Spark
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // literals may arrive as Int or Long depending on how the
    // predicate was written; Number covers both
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("event_id", _: Number) => true
      case GreaterThan("event_id", _: Number) => true
      case LessThan("event_id", _: Number) => true
      case LessThanOrEqual("event_id", _: Number) => true
      case EqualTo("event_id", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v: Number) =>
        lo = math.max(lo, v.longValue)
      case GreaterThan(_, v: Number) =>
        lo = math.max(lo, v.longValue + 1)
      case LessThan(_, v: Number) =>
        hi = math.min(hi, v.longValue)
      case LessThanOrEqual(_, v: Number) =>
        hi = math.min(hi, v.longValue + 1)
      case EqualTo(_, v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ =>
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: the connector analogue of parquet footer
  // stats. COUNT(*)/MIN(event_id)/MAX(event_id) over the (already
  // filter-narrowed — Spark pushes filters BEFORE aggregates) id
  // range have closed forms: hi−lo, lo, hi−1. The scan then does
  // ZERO generation work — it emits one precomputed row, exactly as
  // a parquet reader answers MIN/MAX from footers without touching
  // pages. Grouped or non-id aggregates are declined and Spark
  // evaluates them over the generated rows as before.
  private def isIdRef(e: V2Expression): Boolean = e match {
    case r: NamedReference =>
      r.fieldNames.length == 1 && r.fieldNames()(0) == "event_id"
    case _ => false
  }
  private def supported(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    // COUNT(col) over any non-null generated column ≡ COUNT(*);
    // COUNT(lit) likewise — but ONLY a non-NULL literal: SQL's
    // count(NULL) is 0, not hi−lo, so a NULL literal is declined and
    // Spark evaluates it over generated rows. Never COUNT(DISTINCT …).
    case c: Count if !c.isDistinct =>
      c.column.isInstanceOf[NamedReference] ||
        (c.column match {
          case l: V2Literal[_] => l.value() != null
          case _ => false
        })
    case m: Min => isIdRef(m.column)
    case m: Max => isIdRef(m.column)
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(supported)

  // ---- PARTIAL (grouped) pushdown — the supportCompletePushDown=false
  // path: GROUP BY user_id with COUNT/MIN(event_id)/MAX(event_id) is
  // accepted, the scan emits ONE PARTIAL ROW PER (partition, user) —
  // bounded accumulator state, like a smart storage node returning
  // per-block pre-aggregates — and Spark finalizes across partitions
  // (its rewrite re-aggregates COUNT partials with SUM, MIN/MAX with
  // themselves). Scan output order is Spark's contract: group columns
  // first, then aggregate columns.
  private def colRef(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames()(0))
    case _ => None
  }
  // grouped partials additionally accept SUM(event_id): the per-group
  // id sum accumulates exactly like count/min/max (one long of state)
  // and Spark's finalize re-aggregates SUM partials with SUM
  private def groupedAggOk(f: AggregateFunc): Boolean =
    supported(f) || (f match {
      case s: Sum if !s.isDistinct => isIdRef(s.column)
      case _ => false
    })
  private def groupedSupported(agg: Aggregation): Boolean = {
    val ks = agg.groupByExpressions.toSeq.map(colRef)
    val keysOk = ks.nonEmpty && ks.forall(_.isDefined) &&
      ks.flatten.distinct == ks.flatten &&
      ks.flatten.toSet.subsetOf(Set("user_id", "event_type"))
    keysOk && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(groupedAggOk)
  }

  override def pushAggregation(agg: Aggregation): Boolean =
    if (supportCompletePushDown(agg)) {
      aggs = Some(agg.aggregateExpressions.toSeq)
      true
    } else if (groupedSupported(agg)) {
      groupAggs = Some(agg.aggregateExpressions.toSeq)
      groupKeys = agg.groupByExpressions.toSeq.flatMap(colRef)
      true
    } else false

  private var groupAggs: Option[Seq[AggregateFunc]] = None
  private var groupKeys: Seq[String] = Nil

  // ---- LIMIT / TopN pushdown: the generator emits ids in order, so
  // both have closed forms over the (already filter-narrowed) range.
  //  - plain LIMIT k: any k rows satisfy the contract — the range
  //    narrows to its first k ids and every partition shape is kept;
  //  - TopN (ORDER BY event_id [DESC] LIMIT k): the top ids are the
  //    range's first (or last, reversed) k — ONE partition emits them
  //    already sorted, and `isPartiallyPushed = false` lets Spark
  //    drop its Sort + Limit entirely (plan-asserted by q401 /
  //    PlanQualitySpec: a BatchScan with `PushedTopN`, no Sort, no
  //    TakeOrderedAndProject).
  // Declined after an aggregate pushdown (different output grain) —
  // Spark doesn't push a limit through its own finalize agg anyway.
  private var limitK: Option[Int] = None
  private var topNDesc: Boolean = false
  private var topNPushed: Boolean = false

  override def pushLimit(limit: Int): Boolean =
    if (aggs.isDefined || groupAggs.isDefined || limit < 0) false
    else { limitK = Some(limit); true }

  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean = {
    val ok = aggs.isEmpty && groupAggs.isEmpty && limit >= 0 &&
      orders.length == 1 && isIdRef(orders(0).expression())
    if (ok) {
      topNDesc = orders(0).direction() == SortDirection.DESCENDING
      topNPushed = true
      limitK = Some(limit)
    }
    ok
  }

  // complete in both shapes: LIMIT returns exactly min(k, range) rows,
  // TopN returns them in the requested order from one partition
  override def isPartiallyPushed(): Boolean = false

  // ---- OFFSET pushdown (SupportsPushDownOffset): accepted only on
  // top of a pushed TopN — "page k after the first o" over the
  // ordered id stream is then answered in O(k) by shifting the
  // enumerated window; an offset over an UNORDERED scan has no
  // stable meaning and is declined (Spark keeps its own operator).
  private var offsetN: Option[Int] = None
  override def pushOffset(offset: Int): Boolean =
    if (!topNPushed || offset < 0) false
    else { offsetN = Some(offset); true }

  override def build(): Scan = aggs match {
    case Some(fs) => new SynthAggScan(math.min(lo, hi), hi, fs, pushed)
    case None => groupAggs match {
      case Some(fs) =>
        new SynthGroupAggScan(math.min(lo, hi), hi, users, parts,
          groupKeys, fs, pushed, mod, userparts)
      case None =>
        val l = math.min(lo, hi)
        limitK match {
          case Some(k) if topNPushed =>
            new SynthTopNScan(l, hi, users, required, topNDesc, k, mod,
              offsetN.getOrElse(0))
          case Some(k) =>
            new SynthScan(l, math.min(hi, l + k), users, parts, required,
              mod, userparts, pushedLimit = Some(k))
          case None =>
            new SynthScan(l, hi, users, parts, required, mod, userparts)
        }
    }
  }
}

/** Completely-pushed-down ORDER BY event_id [DESC] LIMIT k: one
  * partition emits the first/last k ids of the narrowed range in the
  * requested order — Spark's Sort and Limit disappear from the plan
  * (`isPartiallyPushed = false`). k is an `Int`, so single-partition
  * emission is bounded by contract. */
class SynthTopNScan(lo: Long, hi: Long, users: Long,
                    required: StructType, desc: Boolean, k: Int,
                    mod: Boolean, off: Int = 0) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"synth_events PushedRange($lo,$hi) PushedTopN " +
      s"[event_id ${if (desc) "DESC" else "ASC"} LIMIT $k]" +
      (if (off > 0) s" PushedOffset $off" else "") +
      s" cols=" + required.fieldNames.mkString(",")
  override def planInputPartitions(): Array[InputPartition] = {
    // Spark pushes the TOTAL row budget through pushTopN/pushLimit
    // (limit + offset) and then the offset separately: the scan
    // answers rows [off, k) of its ordered output.
    val span = math.max(0L, hi - lo)
    val oo = math.min(span, off.toLong)
    val n = math.max(0L, math.min(span, k.toLong) - oo)
    val (s, e) = if (desc) (hi - oo - n, hi - oo) else (lo + oo, lo + oo + n)
    Array(SynthOrderedPartition(s, e, desc))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(users, required.fieldNames, mod)
}

/** Contiguous id range emitted in ascending or descending order. */
case class SynthOrderedPartition(start: Long, end: Long, desc: Boolean)
    extends InputPartition

/** Completely-pushed-down aggregate over the generated id range: one
  * partition, one row, closed-form values — no row generation at all.
  */
class SynthAggScan(lo: Long, hi: Long, fs: Seq[AggregateFunc],
                   pushedF: Array[Filter]) extends Scan with Batch {
  private val empty = hi <= lo
  override def readSchema(): StructType = StructType(fs.zipWithIndex.map {
    case (_: CountStar | _: Count, i) =>
      StructField(s"agg$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"synth_events PushedRange($lo,$hi) PushedAggregates [" +
      fs.map(_.toString).mkString(", ") + s"] pushedFilters=" +
      pushedF.mkString(",")
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = fs.map {
      case _: CountStar | _: Count => (math.max(0L, hi - lo)): Any
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi - 1
      case f => throw new IllegalStateException(s"unpushable agg $f")
    }.toArray
    new SynthAggReaderFactory(values)
  }
}

class SynthAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

/** Partially-pushed-down `GROUP BY user_id` aggregate
  * (`supportCompletePushDown = false`): each id-range partition folds
  * its generated rows into a per-user accumulator — bounded at
  * `users` entries, CONSTANT width no matter how many rows the range
  * spans (the q347 fixed-state discipline) — and emits one partial
  * row per user; Spark's rewrite finalizes across partitions (COUNT
  * partials re-aggregate as SUM, MIN/MAX as themselves). The scan
  * output schema follows Spark's partial-pushdown contract: group
  * columns first, then one column per aggregate, in declaration
  * order. Gate query q358 checks the whole path bit-exact against
  * DuckDB's regeneration; PlanQualitySpec asserts `PushedGroupBy`
  * reaches the physical BatchScan.
  */
class SynthGroupAggScan(lo: Long, hi: Long, users: Long, parts: Int,
                        keys: Seq[String], fs: Seq[AggregateFunc],
                        pushedF: Array[Filter],
                        mod: Boolean = false, userparts: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning {
  // AggregateFunc is not Serializable — compile the accepted shapes
  // to opcodes for the executor-side factory (0 = count partial,
  // 1 = min event_id, 2 = max event_id, 3 = sum event_id partial)
  private val ops: Array[Int] = fs.map {
    case _: CountStar | _: Count => 0
    case _: Min => 1
    case _: Max => 2
    case _: Sum => 3
    case f => throw new IllegalStateException(s"unpushable grouped agg $f")
  }.toArray
  override def readSchema(): StructType = StructType(
    keys.map {
      case "user_id" => StructField("user_id", LongType, nullable = false)
      case k => StructField(k, StringType, nullable = false)
    } ++ fs.zipWithIndex.map { case (_, i) =>
      StructField(s"agg$i", LongType, nullable = false)
    })
  override def toBatch: Batch = this
  // key-grouped mode: layout=mod + userparts + GROUP BY exactly
  // [user_id] → one key-disjoint partition per user (its ids are
  // u, u+users, … — work proportional to its own rows), reported as
  // KeyGroupedPartitioning(identity(user_id)). The per-partition
  // "partial" rows are then final by disjointness, and Spark's
  // finalize aggregate runs WITHOUT an exchange — the connector
  // analogue of aggregating over a bucketed table (gate query q403).
  private val keyGrouped = mod && userparts && keys == Seq("user_id")
  override def outputPartitioning(): Partitioning =
    if (keyGrouped)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("user_id")), users.toInt)
    else new UnknownPartitioning(math.max(1, parts))
  override def description(): String =
    s"synth_events PushedRange($lo,$hi) PushedGroupBy " +
      s"[${keys.mkString(", ")}] " +
      "PushedAggregates [" + fs.map(_.toString).mkString(", ") +
      "] mode=" + (if (keyGrouped) "partial+keygrouped" else "partial") +
      " pushedFilters=" + pushedF.mkString(",")
  override def planInputPartitions(): Array[InputPartition] =
    if (keyGrouped)
      (0L until users).map(u =>
        SynthUserPartition(u, lo, hi, users): InputPartition).toArray
    else {
      val n = math.max(1, parts)
      val span = math.max(0L, hi - lo)
      (0 until n).map { p =>
        SynthPartition(lo + span * p / n, lo + span * (p + 1) / n):
          InputPartition
      }.toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthGroupAggReaderFactory(users, keys.toArray, ops, mod)
}

class SynthGroupAggReaderFactory(users: Long, keys: Array[String],
                                 ops: Array[Int], mod: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      // fold the whole range on first advance: per-group
      // (count, min id, max id, sum id) — bounded at users × 5 type
      // entries of fixed width no matter how long the id range is.
      // Group key packs as user*8 + typeIdx (5 types < 8); a key
      // column the query didn't group by contributes 0, so the same
      // packing serves [user_id], [event_type], and both.
      // A SynthUserPartition folds ONLY its user's ids (stepping by
      // `users` — work proportional to its own rows, never a full
      // range scan per partition).
      private val useUser = keys.contains("user_id")
      private val useType = keys.contains("event_type")
      private var rows: Iterator[InternalRow] = _
      private def uid(i: Long): Long =
        if (mod) SynthEvents.userIdMod(i, users)
        else SynthEvents.userId(i, users)
      override def next(): Boolean = {
        if (rows == null) {
          val acc = scala.collection.mutable.LongMap.empty[Array[Long]]
          val (first, step, end) = p match {
            case up: SynthUserPartition =>
              val off = ((up.u - up.start) % users + users) % users
              (up.start + off, users, up.end)
            case sp: SynthPartition => (sp.start, 1L, sp.end)
          }
          var i = first
          while (i < end) {
            val u = if (useUser) uid(i) else 0L
            val t = if (useType)
              (SynthEvents.hash60(s"v2e:$i") % 5).toInt else 0
            val a = acc.getOrElseUpdate(u * 8L + t,
              Array(0L, Long.MaxValue, Long.MinValue, 0L))
            a(0) += 1L
            if (i < a(1)) a(1) = i
            if (i > a(2)) a(2) = i
            // loud on overflow — a silent wrapped partial would
            // finalize into a wrong answer; ids sum past 2^63 only on
            // pathological option settings, and then the scan fails
            a(3) = Math.addExact(a(3), i)
            i += step
          }
          rows = acc.toSeq.sortBy(_._1).iterator.map { case (k, a) =>
            val row = new GenericInternalRow(keys.length + ops.length)
            var c = 0
            while (c < keys.length) {
              row.update(c,
                if (keys(c) == "user_id") k / 8L
                else UTF8String.fromString(
                  SynthEvents.types((k % 8L).toInt)))
              c += 1
            }
            var j = 0
            while (j < ops.length) {
              row.update(keys.length + j, a(ops(j)))
              j += 1
            }
            row
          }
        }
        rows.hasNext
      }
      override def get(): InternalRow = rows.next()
      override def close(): Unit = ()
    }
}

class SynthScan(val lo: Long, val hi: Long, users: Long, parts: Int,
                val required: StructType, mod: Boolean = false,
                userparts: Boolean = false,
                pushedLimit: Option[Int] = None)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning {
  // runtime-narrowed range + optional exact id set: populated by
  // filter() AFTER planning, BEFORE partition planning — the DPP
  // contract. Runtime filters are prune-only (the join re-applies
  // its condition), so ignoring an unrecognized predicate is safe
  // and narrowing by the IN set's min/max is always sound.
  private var rlo: Long = lo
  private var rhi: Long = hi
  private var allowed: Option[Array[Long]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the same generated range served as a micro-batch stream: offsets
  // are plain row ids, each batch plans the same range splits — the
  // streaming face of the connector (exercised by q325's bounded
  // AvailableNow replay)
  override def toMicroBatchStream(chk: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, users, parts, required.fieldNames,
      mod)
  override def description(): String =
    s"synth_events PushedRange($lo,$hi)" +
      pushedLimit.map(k => s" PushedLimit($k)").getOrElse("") +
      (if (keyGrouped) " KeyGroupedBy [user_id]" else "") +
      " cols=" + required.fieldNames.mkString(",")

  // layout=mod + userparts + user_id in the projection → one
  // key-disjoint partition per user, reported as
  // KeyGroupedPartitioning(identity(user_id)): a groupBy(user_id)
  // over the scan — pushable aggregates or not — satisfies its
  // clustered distribution straight off the read and plans ZERO
  // exchanges, like a bucketed-table scan (gate query q402). Not
  // reported when user_id was pruned away (the transform couldn't
  // resolve) or under a pushed LIMIT (the k-row cut is range-based,
  // not key-based).
  private def keyGrouped = mod && userparts && pushedLimit.isEmpty &&
    required.fieldNames.contains("user_id")
  override def outputPartitioning(): Partitioning =
    if (keyGrouped)
      new KeyGroupedPartitioning(
        Array(Expressions.identity("user_id")), users.toInt)
    else new UnknownPartitioning(math.max(1, parts))

  // ---- runtime filtering (the connector analogue of dynamic
  // partition pruning): a join against a filtered dim hands the scan
  // an IN(event_id, ...) predicate at execution time; the generated
  // range narrows to the set's hull and, for broadcast-sized sets,
  // partition planning switches to the exact ids — zero non-matching
  // rows are ever generated, like a parquet scan skipping pruned
  // partitions entirely.
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("event_id"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onId = p.children()(0) match {
          case r: NamedReference =>
            r.fieldNames.length == 1 && r.fieldNames()(0) == "event_id"
          case _ => false
        }
        val vals = p.children().drop(1).collect {
          case l: V2Literal[_] if l.value().isInstanceOf[java.lang.Long] =>
            l.value().asInstanceOf[java.lang.Long].longValue()
        }
        if (onId && vals.length == p.children().length - 1 &&
            vals.nonEmpty) {
          val inRange = vals.filter(v => v >= rlo && v < rhi).sorted
          if (inRange.isEmpty) {
            // disjoint with the narrowed range: NOTHING can match —
            // clear any earlier id set too, or planInputPartitions
            // would still generate its (stale) ids
            rhi = rlo
            allowed = None
          } else {
            rlo = inRange.head
            rhi = inRange.last + 1
            // cap keeps each partition's id list broadcast-sized;
            // beyond it the hull narrowing alone still applies
            val cur: Option[Array[Long]] =
              if (inRange.length <= (1 << 20)) Some(inRange.distinct)
              else None
            // successive runtime predicates are each NECESSARY, so id
            // sets INTERSECT (replacing would re-admit ids an earlier
            // predicate already excluded); a hull-only predicate still
            // narrows an existing set to the new hull
            allowed = (allowed, cur) match {
              case (Some(prev), Some(c)) =>
                val cs = c.toSet
                Some(prev.filter(cs.contains))
              case (Some(prev), None) =>
                Some(prev.filter(v => v >= rlo && v < rhi))
              case (None, c) => c
            }
            if (allowed.exists(_.isEmpty)) rhi = rlo
          }
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    if (keyGrouped)
      // one key-disjoint partition per user over the (runtime-
      // narrowed) range; the `allowed` id set is prune-only, so the
      // hull narrowing alone is sound here
      (0L until users).map(u =>
        SynthUserPartition(u, rlo, rhi, users): InputPartition).toArray
    else allowed match {
      case Some(ids) =>
        // exact-id partitions: contiguous chunks of the sorted set
        (0 until n).flatMap { p =>
          val s = ids.length * p / n
          val e = ids.length * (p + 1) / n
          if (e > s) Some(SynthIdsPartition(
            java.util.Arrays.copyOfRange(ids, s, e)): InputPartition)
          else None
        }.toArray
      case None =>
        val span = math.max(0L, rhi - rlo)
        (0 until n).map { p =>
          val s = rlo + span * p / n
          val e = rlo + span * (p + 1) / n
          SynthPartition(s, e): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(users, required.fieldNames, mod)
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

/** Exact-id partition planned under a runtime IN filter. */
case class SynthIdsPartition(ids: Array[Long]) extends InputPartition

/** Key-disjoint per-user partition (layout=mod): user `u` owns ids
  * ≡ u (mod users) within [start, end). Carries its key for Spark's
  * key-grouped (storage-partitioned) machinery. */
case class SynthUserPartition(u: Long, start: Long, end: Long,
                              users: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](u))
}

class SynthReaderFactory(users: Long, cols: Array[String],
                         mod: Boolean = false)
    extends PartitionReaderFactory {
  private def rowFor(i: Long): InternalRow = {
    val row = new GenericInternalRow(cols.length)
    var c = 0
    while (c < cols.length) {
      val v: Any = cols(c) match {
        case "event_id" => i
        case "ts_l" => SynthEvents.tsL(i)
        case "user_id" =>
          if (mod) SynthEvents.userIdMod(i, users)
          else SynthEvents.userId(i, users)
        case "event_type" =>
          UTF8String.fromString(SynthEvents.eventType(i))
        case "value_e2" => SynthEvents.valueE2(i)
      }
      row.update(c, v)
      c += 1
    }
    row
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case sp: SynthPartition =>
        new PartitionReader[InternalRow] {
          private var i = sp.start - 1
          override def next(): Boolean = { i += 1; i < sp.end }
          override def get(): InternalRow = rowFor(i)
          override def close(): Unit = ()
        }
      case op: SynthOrderedPartition =>
        new PartitionReader[InternalRow] {
          private var i = if (op.desc) op.end else op.start - 1
          override def next(): Boolean =
            if (op.desc) { i -= 1; i >= op.start }
            else { i += 1; i < op.end }
          override def get(): InternalRow = rowFor(i)
          override def close(): Unit = ()
        }
      case up: SynthUserPartition =>
        new PartitionReader[InternalRow] {
          private val off =
            ((up.u - up.start) % up.users + up.users) % up.users
          private var i = up.start + off - up.users
          override def next(): Boolean = { i += up.users; i < up.end }
          override def get(): InternalRow = rowFor(i)
          override def close(): Unit = ()
        }
      case ip: SynthIdsPartition =>
        new PartitionReader[InternalRow] {
          private var idx = -1
          override def next(): Boolean = {
            idx += 1; idx < ip.ids.length
          }
          override def get(): InternalRow = rowFor(ip.ids(idx))
          override def close(): Unit = ()
        }
    }
}

case class SynthOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

class SynthMicroBatchStream(lo: Long, hi: Long, users: Long, parts: Int,
                            cols: Array[String], mod: Boolean = false)
    extends MicroBatchStream {
  override def initialOffset(): Offset = SynthOffset(lo)
  override def latestOffset(): Offset = SynthOffset(hi)
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[SynthOffset].v
    val e0 = end.asInstanceOf[SynthOffset].v
    val n = math.max(1, parts)
    val span = math.max(0L, e0 - s0)
    (0 until n).map { p =>
      SynthPartition(s0 + span * p / n,
        s0 + span * (p + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(users, cols, mod)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
