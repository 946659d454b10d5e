package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.1–2.3, §2.6, §2.7 — scans, sources/sinks, filters,
  * projections, every join variant, sorts/top-k, set operations.
  *
  * Scale posture per operator class:
  *  - Scans: column projection + predicates reach the parquet reader
  *    (Catalyst `ColumnPruning`/`PushDownPredicates`) — verified via
  *    explain in the test suite.
  *  - Joins: equi-joins shuffle on their keys (sort-merge) or broadcast
  *    when one side is a small dim (`broadcast()` hint on part/region/
  *    nation). Non-equi conditions ride on an equi key wherever one
  *    exists so we never fall into a cartesian plan on big inputs.
  *  - As-of join: union + running-window formulation — one shuffle by
  *    key, NO quadratic join (the naive join+filter+row_number explodes
  *    on M:N at 100 TB).
  *  - Top-k: `orderBy().limit(k)` → `TakeOrderedAndProjectExec` (per-
  *    partition heap + driver merge of k·partitions rows, never a full
  *    sort).
  */
object Relational {

  /** Per-JVM scratch root for the sink roundtrips: a FIXED shared path
    * would let concurrent invocations (a bench run overlapping a test
    * run) race each other's mode(overwrite) writes and read a
    * half-written directory. Unique per process, reclaimed on exit;
    * stable WITHIN a process so repeated reps overwrite in place. */
  private[graft] lazy val scratchRoot: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(p.toFile)
    }))
    p.toString
  }

  // ---- §2.1 scans / sources / sinks -------------------------------------

  /** Full scan of lineitem, 4-column projection, stable total order.
    * Reference analogue: `Connection.quick(select …)` SQL forwarding
    * [pub: desdb/desdb.py — SURVEY §0 citation grades]. */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
      // lineitem has NO unique key in this corpus (even (orderkey,
      // linenumber) repeats) — total order needs every output column
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
  }

  /** Synthetic integer source (1..1000 inclusive-exclusive range). */
  def sourceRange(spark: SparkSession, sfDir: String): DataFrame =
    spark.range(1, 1001).agg(
      count(lit(1)).as("n_rows"),
      Det.lsum(col("id")).as("total"))

  /** Scan → CSV sink → CSV source with explicit schema → aggregate.
    * Proves sink/source parity: the oracle computes the same aggregate
    * straight off the original parquet. */
  def sinkCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_csv"
    Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType)))
    spark.read.schema(schema).option("header", "true").csv(dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        Det.dsum($"l_quantity").as("sum_qty"),
        Det.dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"l_returnflag")
  }

  /** Same parity proof through JSON lines. */
  def sinkJsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_json"
    Tables(spark, sfDir, "orders")
      .select($"o_orderstatus", $"o_totalprice")
      .write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    spark.read.schema(schema).json(dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), Det.dsum($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus")
  }

  /** Columnar-format parity through ORC (the other built-in columnar
    * sink besides parquet). */
  def sinkOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_orc"
    Tables(spark, sfDir, "part")
      .select($"p_brand", $"p_size", $"p_retailprice")
      .write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), Det.lsum($"p_size").as("sum_size"),
        Det.dsum($"p_retailprice").as("sum_price"))
      .orderBy($"p_brand")
  }

  /** Spark 4's NATIVE XML source (the donated spark-xml), proven by
    * sink→source parity like the csv/json/orc roundtrips: write
    * supplier rows as <row> elements, read back with an explicit
    * schema, aggregate. */
  def sinkXmlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_xml"
    Tables(spark, sfDir, "supplier")
      .select($"s_suppkey", $"s_nationkey", $"s_acctbal")
      .write.mode("overwrite").option("rowTag", "row").xml(dir)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_nationkey", LongType),
      StructField("s_acctbal", DoubleType)))
    spark.read.schema(schema).option("rowTag", "row").xml(dir)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), Det.dsum($"s_acctbal").as("sum_bal"))
      .orderBy($"s_nationkey")
  }

  /** Hive-style partitioned parquet sink + partition-PRUNED read-back:
    * the write lays events out as event_type=<v>/ directories, and the
    * read-back filter never touches the other partitions' files (the
    * scan's PartitionFilters — asserted in PlanSpec). This is the
    * physical layout that makes selective 100 TB queries cheap: the
    * pruning happens at file listing, before any IO. */
  def sinkPartitionedPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_part"
    val src = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"value", $"event_type")
    src.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // explicit schema: an empty write leaves no partition directories
    // to infer the partition column from
    spark.read.schema(src.schema).parquet(dir)
      .filter($"event_type" === "purchase")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), Det.dsum($"value").as("sum_value"),
        Det.lsum($"user_id").as("sum_uid"))
      .orderBy($"event_type")
  }

  /** Catalog-table sink: `saveAsTable` into the session's EXTERNAL
    * catalog (the durable-catalog analogue of desdb's Oracle tables —
    * metastore-backed on a real cluster) and read back via
    * `spark.table`, proving the managed-table write/read path end to
    * end the same way the file sinks do. The oracle computes the same
    * aggregate straight off the source parquet. */
  /** Per-process table name: two JVMs sharing one cwd (one warehouse
    * dir) must not drop/overwrite each other's managed directory
    * mid-read — same race scratchRoot prevents for the file sinks.
    * The unique directory is reclaimed on JVM exit (the in-memory
    * catalog entry dies with the process anyway). */
  private lazy val rtTable =
    s"graft_nation_rt_p${ProcessHandle.current().pid()}"
  private val rtCleanup = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** DYNAMIC PARTITION PRUNING over a partition-laid-out fact: the
    * fact lands partitioned by the join key's domain (event_type —
    * the layout a 100 TB star schema keeps on disk), the dim carries
    * the selective predicate (category = 'act'), and the fact scan's
    * partition filter is a RUNTIME subquery over the broadcast dim
    * (`dynamicpruning` in PartitionFilters — pinned in PlanSpec), so
    * only the matching partition directories are ever read. This is
    * the scan-elimination half of star-schema performance that static
    * predicate pushdown can't do: the pruning set is only known after
    * the dim filter runs. The dim must be a real SCAN, not a literal:
    * Catalyst's ConvertToLocalRelation folds a Filter over a
    * LocalRelation into plain rows at plan time, after which no
    * selective predicate remains for the PartitionPruning rule to
    * latch onto — so the dim lands as its own (tiny) parquet table,
    * exactly what it is in a warehouse. */
  def joinDpp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/dpp_fact"
    val dimDir = s"$scratchRoot/dpp_dim"
    val src = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"value", $"event_type")
    src.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.schema(src.schema).parquet(dir)
    Seq(
      ("click", "browse"), ("view", "browse"), ("error", "ops"),
      ("purchase", "act"), ("signup", "act"))
      .toDF("event_type", "category")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    fact.join(broadcast(dim.filter($"category" === "act")), "event_type")
      .groupBy($"event_type", $"category")
      .agg(count(lit(1)).as("n"), Det.dsum($"value").as("sum_value"),
        Det.lsum($"user_id").as("sum_uid"))
      .orderBy($"event_type")
  }

  /** MANUAL bloom-filter semi-join reduction — the third member of the
    * runtime-filter family: DPP ([[joinDpp]]) prunes partition
    * DIRECTORIES, the optimizer's injected bloom (PlanSpec's
    * `might_contain` test) prunes rows when its size thresholds fire,
    * and THIS is the hand-rolled version for when neither applies
    * (non-partition-aligned key, thresholds tuned for clusters, or a
    * filter reused across many queries): one bounded-size sketch job
    * over the filtered dim (`stat.bloomFilter` — merged partials, the
    * CMS-probe precedent for a legitimate driver-held artifact),
    * broadcast to executors, and the fact stream is filtered BEFORE
    * the join shuffle. Bloom filters have no false negatives, so the
    * final joined aggregate is byte-identical to the plain join — the
    * oracle hash-match IS that proof; false positives only cost rows
    * that the exact join then drops. At 100 TB the win is the shuffle:
    * only ~selectivity(+fpp) of the fact ever moves. Sketch sizing
    * scales with the DIM (expected items), never the fact. */
  def joinBloomPrejoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val fact = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    // stat.bloomFilter NPEs on a zero-row build side (null agg buffer);
    // an empty dim means an empty join — the prefilter keeps nothing
    val pre =
      if (dim.isEmpty) fact.filter(lit(false))
      else {
        val bfB = spark.sparkContext.broadcast(
          dim.stat.bloomFilter("o_orderkey", 100000L, 0.01))
        fact.as[(Long, Double)]
          .mapPartitions { it =>
            val f = bfB.value
            it.filter(t => f.mightContainLong(t._1))
          }
          .toDF("l_orderkey", "l_quantity")
      }
    pre.join(dim, $"l_orderkey" === $"o_orderkey")
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum($"l_quantity").as("sum_qty"))
  }

  def sinkTableRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.replaceManagedTable(
      Tables(spark, sfDir, "nation")
        .select($"n_nationkey", $"n_regionkey", $"n_name"),
      rtTable)
    if (rtCleanup.compareAndSet(false, true)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), rtTable.toLowerCase)
      val hconf = spark.sparkContext.hadoopConfiguration
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try loc.getFileSystem(hconf).delete(loc, true)
        catch { case _: Throwable => () }
      }))
    }
    spark.table(rtTable)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), min($"n_name").as("first_name"))
      .orderBy($"n_regionkey")
  }

  // ---- bucketed co-located join ------------------------------------
  // Per-process table names + write-once guard: the two bucketed
  // tables are a LAYOUT, written once per (session, sfDir) and then
  // joined shuffle-free by every caller — exactly how a 100 TB
  // deployment amortizes the bucketing write across every downstream
  // join on the key.
  // suffix carries the sfDir fingerprint too: a second sfDir in the
  // same process gets its OWN tables instead of overwriting the ones
  // an earlier (lazily-evaluated) DataFrame still reads
  private def bktSuffix(sfDir: String): String =
    s"_p${ProcessHandle.current().pid()}_${(sfDir.hashCode & 0x7fffffff).toHexString}"
  private val bktWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Writes orders + customer bucketed by custkey (same bucket count)
    * and returns the co-located join, pre-aggregation. Bucketed scans
    * carry HashPartitioning(custkey, 8) so the MERGE-hinted sort-merge
    * join needs NO exchange on either side — the join that would
    * shuffle the fact table on every run at 100 TB becomes a local
    * per-bucket merge (PlanSpec pins the zero-exchange plan). */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfx = bktSuffix(sfDir)
    if (!bktWritten.contains((spark, sfDir))) synchronized {
      if (!bktWritten.contains((spark, sfDir))) {
        // repartition onto the bucket hash first → one file per bucket,
        // so the scan also preserves the sortBy order (multi-file
        // buckets would force the SMJ to re-sort)
        Tables.replaceBucketedTable(
          Tables(spark, sfDir, "orders")
            .select($"o_orderkey", $"o_custkey", $"o_totalprice")
            .repartition(8, $"o_custkey"),
          s"graft_orders_bkt$sfx", 8, "o_custkey")
        Tables.replaceBucketedTable(
          Tables(spark, sfDir, "customer")
            .select($"c_custkey", $"c_mktsegment")
            .repartition(8, $"c_custkey"),
          s"graft_customer_bkt$sfx", 8, "c_custkey")
        val hconf = spark.sparkContext.hadoopConfiguration
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val locs = Seq("graft_orders_bkt", "graft_customer_bkt").map(t =>
          new org.apache.hadoop.fs.Path(wh, s"$t${sfx.toLowerCase}"))
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          locs.foreach(l =>
            try l.getFileSystem(hconf).delete(l, true)
            catch { case _: Throwable => () })
        }))
        bktWritten.add((spark, sfDir))
      }
    }
    spark.table(s"graft_customer_bkt$sfx")
      .hint("merge")
      .join(spark.table(s"graft_orders_bkt$sfx"),
        $"c_custkey" === $"o_custkey")
  }

  /** Declared form: the co-located join rolled up per market segment.
    * The only exchanges in the whole plan are the aggregation's and
    * the presentation orderBy's — the join itself is bucket-local. */
  def joinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bucketedJoin(spark, sfDir)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment")
  }

  /** CDC upsert (MERGE INTO semantics on plain parquet): a change
    * batch (updates for existing keys + inserts for new ones) applied
    * onto a base snapshot via ONE full-outer join on the key +
    * per-column coalesce — no per-row driver logic, one shuffle on the
    * merge key at any scale (table formats like Iceberg/Delta do this
    * same join under MERGE INTO). Output is a per-action audit the
    * oracle can hash-match. */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val base = o.filter($"o_orderkey" % 10 < 8)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"))
    // overlap with base → updates; the rest → inserts
    val changes = o.filter($"o_orderkey" % 10 >= 6)
      .select($"o_orderkey".as("k"),
        ($"o_totalprice" + 1000.0).as("new_price"))
    base.join(changes, Seq("k"), "full_outer")
      .select($"k",
        coalesce($"new_price", $"price").as("price"),
        when($"price".isNull, "insert")
          .when($"new_price".isNull, "keep")
          .otherwise("update").as("action"))
      .groupBy($"action")
      .agg(count(lit(1)).as("n"), Det.dsum($"price").as("sum_price"))
      .orderBy($"action")
  }

  /** CDC changelog application — the MERGE-with-deletes shape under
    * every table format's changefeed apply (Delta CDF / Iceberg
    * changelog / Debezium sink). A sequence-ordered stream of I/U/D
    * operations collapses to latest-per-key (row_number over the key,
    * newest sequence first), then ONE full-outer join against the
    * snapshot applies it: D drops the row, U/I carry new values,
    * untouched keys keep their snapshot row.
    *
    * Scale posture: the changelog exchange (window on k) and the join
    * co-partition on the same key, so AQE plans snapshot⨝latest as a
    * plain co-located SMJ/hash join — two key-hash shuffles total at
    * any scale, per-key window state is O(that key's ops), and nothing
    * touches the driver. The changelog here is synthesized
    * deterministically from the orders key domain (seq 2 overrides a
    * seq-1 update on %10==0 keys — latest-wins is load-bearing). */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val m = $"o_orderkey" % 10
    def ev(filter: org.apache.spark.sql.Column, op: String,
        price: org.apache.spark.sql.Column,
        status: org.apache.spark.sql.Column, seq: Int): DataFrame =
      o.filter(filter).select($"o_orderkey".as("k"), lit(op).as("op"),
        price.as("new_price"), status.as("new_status"),
        lit(seq).as("seq"))
    val nulS = lit(null).cast("string")
    val chg = ev(m <= 1, "U", $"o_totalprice" + 100.0, nulS, 1)
      .unionAll(ev(m === 2 || m === 3, "D", lit(null).cast("double"), nulS, 1))
      .unionAll(ev(m >= 8, "I", $"o_totalprice", lit("N"), 1))
      .unionAll(ev(m === 0, "U", $"o_totalprice" + 200.0, nulS, 2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"seq".desc)
    val latest = chg.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn", "seq")
    val snapshot = o.filter(m < 8)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"),
        $"o_orderstatus".as("status"))
    snapshot.join(latest, Seq("k"), "full_outer")
      .filter($"op".isNull || $"op" =!= "D")
      .select($"k",
        when($"op".isin("U", "I"), $"new_price").otherwise($"price")
          .as("price"),
        coalesce($"new_status", $"status").as("status"))
      .orderBy($"k")
  }

  // ---- §2.2 filter / project / cast -------------------------------------

  /** Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NOT NULL.
    * All of it reaches the parquet scan as pushed filters. */
  def filterPredicates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .filter($"l_quantity".between(10, 30)
        && $"l_returnflag".isin("A", "N")
        && ($"l_linestatus".like("F%") || $"l_discount" < 0.05)
        && !($"l_tax" > 0.07)
        && $"l_shipdate".isNotNull)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_returnflag", $"l_linestatus")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_returnflag", $"l_linestatus")
  }

  /** Computed projections: arithmetic, aliasing, CASE WHEN.
    * Per-row double arithmetic is IEEE-identical across engines — no
    * decimal detour needed (contrast with aggregation, see Det). */
  def projectCompute(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice",
        when($"o_totalprice" > 300000, "big")
          .when($"o_totalprice" > 150000, "mid")
          .otherwise("small").as("bucket"),
        ($"o_totalprice" * 0.1).as("tithe"))
      .orderBy($"o_orderkey")
  }

  /** Casts: double→decimal(12,2), string-digits→int, timestamp→date.
    * Reference analogue: the Oracle-type→NumPy-dtype mapping in
    * `quick(array=True)` [pub: desdb/desdb.py]. */
  def castDecimal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey",
        // The decimal cast is the operator under test; the final cast
        // back to double is presentation-only (exact — ≤2-decimal values
        // are double-representable) so the driver's pandas compare sees
        // float64 on both sides instead of object(Decimal) vs float64.
        $"o_totalprice".cast(DecimalType(12, 2)).cast(DoubleType)
          .as("price_dec"),
        substring($"o_orderpriority", 1, 1).cast(IntegerType).as("prio_num"),
        $"o_orderdate".cast(DateType).as("odate"))
      .orderBy($"o_orderkey")
  }

  // ---- §2.3 joins --------------------------------------------------------

  /** Equi inner join orders ⨝ customer, aggregated per market segment.
    * Large-large equi join → sort-merge on the shuffled key. */
  def joinInner(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val c = Tables(spark, sfDir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment")
  }

  /** Star join with an explicit broadcast of the small dimension —
    * no shuffle of the fact side at any scale. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
    val p = Tables(spark, sfDir, "part").filter($"p_size" <= 10)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        Det.dsumDec(Det.dec($"l_extendedprice")
          * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
          .as("revenue"))
      .orderBy($"p_brand")
  }

  /** Left outer join: customers with / without orders per nation. */
  def joinLeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_nationkey")
      .agg(
        countDistinct($"c_custkey").as("n_cust"),
        countDistinct(when($"o_orderkey".isNull, $"c_custkey"))
          .as("n_no_orders"))
      .orderBy($"c_nationkey")
  }

  /** Full outer join of the two custkey sets, classified. */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val a = Tables(spark, sfDir, "orders").select($"o_custkey").distinct()
    val b = Tables(spark, sfDir, "customer").select($"c_custkey")
    a.join(b, a("o_custkey") === b("c_custkey"), "full_outer")
      .agg(
        sum(when($"o_custkey".isNotNull && $"c_custkey".isNotNull, 1)
          .otherwise(0)).cast("long").as("n_both"),
        sum(when($"c_custkey".isNull, 1).otherwise(0)).cast("long")
          .as("n_orders_only"),
        sum(when($"o_custkey".isNull, 1).otherwise(0)).cast("long")
          .as("n_customer_only"))
  }

  /** Left semi join (EXISTS): customers with a >250k order. */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders").filter($"o_totalprice" > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left anti join (NOT EXISTS): customers with no >250k order. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders").filter($"o_totalprice" > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Cartesian product of the two tiny dims (5 × 25 rows). */
  def joinCross(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "region").crossJoin(Tables(spark, sfDir, "nation"))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")
  }

  /** Theta join: equi key + non-equi residual (l_quantity > p_size) —
    * planned as a hash/sort-merge join with a post-filter, never BNL. */
  def joinTheta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables(spark, sfDir, "part")
    val l = Tables(spark, sfDir, "lineitem")
    p.join(l, p("p_partkey") === l("l_partkey")
        && l("l_quantity") > p("p_size"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("sum_qty"))
      .orderBy($"p_brand")
  }

  /** Interval/range join riding an equi key: lineitem rows shipped
    * within 30 days of their order's date. */
  def joinRangeInterval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
    val o = Tables(spark, sfDir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey")
        && l("l_shipdate") >= o("o_orderdate")
        && l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(year($"l_shipdate").as("yr"))
      .agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("sum_qty"))
      .orderBy($"yr")
  }

  /** PURE interval join (NO equi key — the shape Spark plans as an
    * O(n·m) BroadcastNestedLoop): for each purchase, the number of
    * click events of ANY user within ±5 minutes. Re-expressed as the
    * band-join decomposition (Flink's interval join in batch form):
    * bucketize time into window-width epochs, explode the probe side
    * onto its three adjacent buckets (|Δt| ≤ w ⟹ bucket distance ≤ 1
    * — lossless), equi-join on bucket, exact timestamp range as the
    * residual. Each click carries ONE bucket and the probe's three are
    * distinct, so no match is double-counted; a clickless purchase
    * survives the left join as null rows that count 0.
    *
    * Scale: turns the nested loop into a partial-agged hash join whose
    * fan-out is a CONSTANT 3×; the bucket is also the natural
    * partition key of a time-series corpus at 100 TB. PlanSpec pins
    * the absence of BroadcastNestedLoop/Cartesian in the final plan. */
  def joinIntervalBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = 300L // window = bucket width, seconds
    val e = Tables(spark, sfDir, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id", $"ts".as("pts"),
        floor(unix_timestamp($"ts") / w).as("pb"))
    val c = e.filter($"event_type" === "click")
      .select($"ts".as("cts"), floor(unix_timestamp($"ts") / w).as("cb"))
    p.withColumn("b", explode(array($"pb" - 1, $"pb", $"pb" + 1)))
      .join(c, $"b" === $"cb"
        && $"cts" >= $"pts" - expr("INTERVAL 5 MINUTES")
        && $"cts" <= $"pts" + expr("INTERVAL 5 MINUTES"), "left")
      .groupBy($"event_id", $"pts")
      .agg(count($"cts").as("n_nearby_clicks"))
      .select($"event_id", $"pts".as("ts"), $"n_nearby_clicks")
      .orderBy($"event_id")
  }

  /** As-of join: for each purchase event, the latest click of the same
    * user at-or-before its timestamp. Spark has no native ASOF —
    * formulated as union + running max over an event-time window:
    * ONE shuffle by user_id, linear state, scales to any event count
    * (the naive join+row_number is quadratic per key). */
  def joinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"ts".as("click_ts"),
        lit(null).cast(LongType).as("p_event_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(null).cast(TimestampType).as("click_ts"),
        $"event_id".as("p_event_id"))
    // clicks sort before purchases at equal ts: "at-or-before" includes ties
    val tagged = clicks.withColumn("src", lit(0))
      .unionByName(purchases.withColumn("src", lit(1)))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"src")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", max($"click_ts").over(w))
      .filter($"p_event_id".isNotNull)
      .select($"p_event_id".as("event_id"), $"user_id", $"ts",
        $"last_click_ts")
      .orderBy($"event_id")
  }

  /** FORWARD as-of join — each click joins the NEXT purchase at or
    * after it (conversion-delay measurement), the time-reversed twin
    * of [[joinAsof]]'s latest-prior lookup. Same union + running-
    * window shape — one shuffle on the key, NO quadratic join — with
    * the frame flipped to CURRENT..FOLLOWING and clicks sorting
    * BEFORE purchases at equal ts, so a same-timestamp purchase lands
    * INSIDE the click's forward frame ("at-or-after" includes ties).
    * Delay surfaces in exact integer microseconds. */
  def joinAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"ts".as("p_ts"),
        lit(null).cast(LongType).as("c_event_id"))
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", lit(null).cast(TimestampType).as("p_ts"),
        $"event_id".as("c_event_id"))
    val tagged = clicks.withColumn("src", lit(0))
      .unionByName(purchases.withColumn("src", lit(1)))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"src")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("next_purchase_ts", min($"p_ts").over(w))
      .filter($"c_event_id".isNotNull)
      .select($"c_event_id".as("event_id"), $"user_id", $"ts",
        $"next_purchase_ts",
        (unix_micros($"next_purchase_ts") - unix_micros($"ts"))
          .as("delay_us"))
      .orderBy($"event_id")
  }

  /** NEAREST as-of join — each purchase joins its temporally CLOSEST
    * click in EITHER direction (pandas merge_asof direction='nearest'
    * — the variant a sensor-fusion or attribution pipeline wants when
    * the causal direction is unknown), completing the as-of family
    * (backward / forward / tolerance / native). Still ONE user_id
    * exchange and ONE sort: both candidate timestamps come from two
    * FRAMES over the same window ordering (backward max includes
    * equal-ts clicks — they sort before purchases — so a tie is
    * distance 0 backward; forward min is strictly after), then the
    * winner is a map-side exact-integer-microsecond comparison, ties
    * to the earlier click.
    *
    * Determinism: distances are exact long micros; the tie rule is
    * total; no floats anywhere. Scale posture: per-key window state
    * is one running max + one running min — O(1), layout-free. */
  def joinAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"ts".as("click_ts"),
        lit(null).cast(LongType).as("p_event_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(null).cast(TimestampType).as("click_ts"),
        $"event_id".as("p_event_id"))
    val tagged = clicks.withColumn("src", lit(0))
      .unionByName(purchases.withColumn("src", lit(1)))
    val order = Window.partitionBy($"user_id").orderBy($"ts", $"src")
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dBack = unix_micros($"ts") - unix_micros($"prev_click_ts")
    val dFwd = unix_micros($"next_click_ts") - unix_micros($"ts")
    tagged
      .withColumn("prev_click_ts", max($"click_ts").over(back))
      .withColumn("next_click_ts", min($"click_ts").over(fwd))
      .filter($"p_event_id".isNotNull)
      .select($"p_event_id".as("event_id"), $"user_id", $"ts",
        when($"prev_click_ts".isNotNull &&
            ($"next_click_ts".isNull || dBack <= dFwd),
          $"prev_click_ts").otherwise($"next_click_ts")
          .as("nearest_click_ts"),
        when($"prev_click_ts".isNotNull &&
            ($"next_click_ts".isNull || dBack <= dFwd), dBack)
          .otherwise(dFwd).as("distance_us"),
        when($"prev_click_ts".isNull && $"next_click_ts".isNull, "none")
          .when($"next_click_ts".isNull, "backward")
          .when($"prev_click_ts".isNull, "forward")
          .when(dBack <= dFwd, "backward").otherwise("forward")
          .as("direction"))
      .orderBy($"event_id")
  }

  /** As-of join with a STALENESS TOLERANCE — the feature-store
    * point-in-time contract: a purchase joins its latest prior click
    * only if that click is ≤ 10 minutes old, else NULL (serving a
    * feature staler than the bound is worse than serving none). Same
    * union+window O(1)-state shape as [[joinAsof]]; the bound is one
    * map-side comparison AFTER the window, so tolerance changes cost
    * nothing. */
  def joinAsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"ts".as("click_ts"),
        lit(null).cast(LongType).as("p_event_id"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(null).cast(TimestampType).as("click_ts"),
        $"event_id".as("p_event_id"))
    val tagged = clicks.withColumn("src", lit(0))
      .unionByName(purchases.withColumn("src", lit(1)))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"src")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", max($"click_ts").over(w))
      .filter($"p_event_id".isNotNull)
      .select($"p_event_id".as("event_id"), $"user_id", $"ts",
        when($"last_click_ts" >= $"ts" - expr("INTERVAL 10 MINUTES"),
          $"last_click_ts").as("last_click_ts"))
      .orderBy($"event_id")
  }

  /** The same as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoin → AsOfJoinExec): co-clustered hash
    * exchanges + per-partition (key, time) sorts + one O(1)-state
    * forward merge scan — the plan shape of a sort-merge join, with
    * no union row inflation and no window buffer. Shares
    * q_join_asof's oracle; a differential test pins equality with
    * the union+window formulation row for row. */
  def joinAsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user_id"), $"ts".as("last_click_ts"))
    graft.plans.AsOf
      .join(purchases, clicks, "user_id", "ts", "c_user_id", "last_click_ts")
      .select($"event_id", $"user_id", $"ts", $"last_click_ts")
      .orderBy($"event_id")
  }

  /** 5-way star join (TPC-H Q5 shape): revenue per nation for one
    * region and one order-date year. Dims broadcast; the fact-side
    * scan carries a pushed date-range predicate (not year(col)=…,
    * which would defeat pushdown). */
  def joinMultiwayStar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = Tables(spark, sfDir, "region").filter($"r_name" === "ASIA")
    val n = Tables(spark, sfDir, "nation")
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val l = Tables(spark, sfDir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"n_name")
      .agg(Det.dsumDec(Det.dec($"l_extendedprice")
          * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  // ---- §2.6 sorts / top-k ------------------------------------------------

  /** Multi-key sort, mixed directions, explicit null placement (Spark
    * defaults NULLS FIRST on ASC, DuckDB NULLS LAST — always explicit). */
  def sortMultikey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_shipdate", $"l_orderkey", $"l_linenumber",
        nullif($"l_discount", lit(0.0)).as("disc_n"))
      .orderBy($"l_returnflag".asc, $"l_shipdate".desc,
        $"disc_n".asc_nulls_first, $"l_orderkey".asc, $"l_linenumber".asc)
  }

  /** Global top-25 by price → TakeOrderedAndProject (heap per partition
    * + driver merge — no full sort at any scale). */
  def topkGlobal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(25)
  }

  // ---- §2.7 set operations ----------------------------------------------

  def unionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val hi = o.filter($"o_totalprice" > 350000)
      .select($"o_orderkey", lit("high").as("tag"))
    val lo = o.filter($"o_totalprice" < 20000)
      .select($"o_orderkey", lit("low").as("tag"))
    hi.unionByName(lo).orderBy($"tag", $"o_orderkey")
  }

  def unionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer")
    c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .union(c.filter($"c_acctbal" > 5000).select($"c_custkey"))
      .distinct()
      .orderBy($"c_custkey")
  }

  def intersectKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val y1997 = o.filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp")
      && $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_custkey")
    val y1998 = o.filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp")
      && $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    y1997.intersect(y1998).orderBy($"o_custkey")
  }

  def exceptKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer").select($"c_custkey")
    val big = Tables(spark, sfDir, "orders")
      .filter($"o_totalprice" > 200000)
      .select($"o_custkey".as("c_custkey"))
    c.except(big).orderBy($"c_custkey")
  }

  /** SNAPSHOT DIFF / table reconciliation — the verification step a
    * pipeline runs after a migration, backfill or CDC replay: which
    * rows were added, removed, or changed between two snapshots of a
    * keyed table, and what is the net value drift?
    * ([[Quality.tableFingerprint]] answers "are they equal?" in three
    * numbers; THIS answers "what exactly differs?" when they are not.)
    *
    * The second snapshot applies deterministic edits to orders
    * (delete keys %13, bump price +100 on %11 survivors, insert a
    * shifted copy of %17 keys), so the oracle can replay the same
    * arithmetic — a diff bug cannot hash-match.
    *
    * Scale posture: ONE full-outer equi join on the PK — both 100 TB
    * snapshots hash-partition on the key (or arrive co-located from a
    * bucketed/key-range layout, making the diff exchange-free), and
    * the add/remove/change classification plus the per-column compare
    * is map-side arithmetic on the joined row. Output is the
    * per-status summary — never a materialized row set; the drilldown
    * variant would add the status column to the joined stream and
    * write it partitioned by status. Money deltas ride the exact
    * decimal pipeline (Det rules). */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
        Det.dec($"o_totalprice").as("price"))
    val next = base.filter($"k" % 13 =!= 0)
      .select($"k", $"st",
        when($"k" % 11 === 0, $"price" + Det.dec(lit(100.0)))
          .otherwise($"price").as("price"))
      .unionAll(base.filter($"k" % 17 === 0)
        .select(($"k" + 100000000L).as("k"), lit("N").as("st"),
          $"price"))
    val b = base.select($"k", $"st".as("b_st"), $"price".as("b_price"))
    val n = next.select($"k", $"st".as("n_st"), $"price".as("n_price"))
    b.join(n, Seq("k"), "full_outer")
      .select($"k",
        when($"b_st".isNull, "added")
          .when($"n_st".isNull, "removed")
          .when($"b_st" =!= $"n_st" || $"b_price" =!= $"n_price",
            "changed")
          .otherwise("unchanged").as("diff_status"),
        coalesce($"n_price", lit(0.0).cast("decimal(12,2)")).as("np"),
        coalesce($"b_price", lit(0.0).cast("decimal(12,2)")).as("bp"))
      .groupBy($"diff_status")
      .agg(count(lit(1)).as("n"),
        Det.dsumDec(($"np" - $"bp").cast(
          org.apache.spark.sql.types.DecimalType(27, 4))).as("net_delta"))
      .orderBy($"diff_status")
  }

  /** NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): the join key
    * is nullable by construction (priority '1-URGENT' nullified) and
    * the null group must MATCH across sides — the semantics a plain
    * equi join silently drops. Right side is the per-key census of the
    * same relation, so every output row's n_orders × 1 match is
    * self-checking against dim_n.
    *
    * Scale posture: EqualNullSafe is a first-class hash-join key in
    * Spark (null hashes to a bucket like any value), so this plans as
    * a broadcast hash join on the tiny key census — NOT a
    * BroadcastNestedLoop, which is what naive `k = k OR (both null)`
    * predicates degrade to. The plan shape is pinned in PlanSpec. */
  def joinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
      .select(nullif($"o_orderpriority", lit("1-URGENT")).as("prio"),
        $"o_totalprice")
    val dim = o.groupBy($"prio".as("dprio"))
      .agg(count(lit(1)).as("dim_n"))
    o.join(broadcast(dim), $"prio" <=> $"dprio")
      .groupBy($"prio")
      .agg(count(lit(1)).as("n_orders"), max($"dim_n").as("dim_n"),
        Det.dsum($"o_totalprice").as("sum_price"))
      .orderBy($"prio".asc_nulls_first)
  }

  /** TPC-H Q3 "shipping priority" shape — the canonical 3-way
    * fact-to-fact join + group-by + top-k that every warehouse engine
    * is benchmarked on: building-segment customers, orders placed
    * before the cutoff, lineitems shipped after it, top 10 open orders
    * by exact revenue.
    *
    * Scale posture: customer filters FIRST (segment predicate reaches
    * the scan), joins orders on the shuffled custkey, then lineitem on
    * orderkey — both sort-merge on their natural keys with partial
    * aggregation above; the top-10 is a TakeOrderedAndProject (no
    * global sort materialization). Revenue multiplies the EXACT base
    * decimals (Det rules: cast base columns, multiply in decimal,
    * exact sum, one cast to double at the end). */
  def joinShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1998-01-01").cast(DateType)
    val c = Tables(spark, sfDir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate",
        $"o_orderpriority")
    val l = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(Det.dsumDec(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 "local supplier volume" shape — the 6-way join with a
    * CROSS-DIMENSION equality (customer's nation must equal the
    * supplier's nation) that exercises join ORDER: revenue per ASIA
    * nation for 1996 orders, served by suppliers in the customer's own
    * nation.
    *
    * Scale posture: nation⨝region prunes to the 5-ish ASIA nation keys
    * and BROADCASTS into both the customer and supplier sides, so the
    * region filter reaches the fact joins as a semi-filter instead of
    * a post-join predicate; the three fact joins shuffle on their
    * natural keys (custkey, orderkey, suppkey) and the c↔s nation
    * equality rides the last join as a residual — never a standalone
    * theta join. Exact-decimal revenue, domain-bounded output. */
  def joinLocalVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asiaNations = Tables(spark, sfDir, "nation")
      .join(Tables(spark, sfDir, "region")
        .filter($"r_name" === "ASIA").select($"r_regionkey"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val c = Tables(spark, sfDir, "customer")
      .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey")
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(DateType)
        && $"o_orderdate" < lit("1997-01-01").cast(DateType))
      .select($"o_orderkey", $"o_custkey")
    val s = Tables(spark, sfDir, "supplier")
      .select($"s_suppkey", $"s_nationkey")
    val l = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount")
    c.join(o, $"c_custkey" === $"o_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .join(s, $"l_suppkey" === $"s_suppkey"
        && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(asiaNations.select($"n_nationkey".as("nk"),
        $"n_name")), $"s_nationkey" === $"nk")
      .groupBy($"n_name")
      .agg(Det.dsumDec(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q10 "returned item reporting" shape — revenue lost to
    * returns per customer over one quarter, top 20: the
    * fact→fact→dim reporting join every warehouse runs weekly.
    *
    * Scale posture: the quarter cut reaches the orders scan and the
    * returnflag cut reaches the lineitem scan (both pushed); the two
    * fact joins shuffle on their natural keys (orderkey, custkey)
    * with partial aggregation above; nation broadcasts into the
    * final projection; the top-20 is a TakeOrderedAndProject over
    * the customer-bounded aggregate. Revenue follows the Det rules
    * (base decimals multiplied in decimal, exact sum, one cast) so
    * the top-20 ORDER is exact, not float-luck. */
  def joinReturnedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1996-10-01").cast(DateType)
        && $"o_orderdate" < lit("1997-01-01").cast(DateType))
      .select($"o_orderkey", $"o_custkey")
    val l = Tables(spark, sfDir, "lineitem")
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val n = Tables(spark, sfDir, "nation")
      .select($"n_nationkey", $"n_name")
    o.join(l, $"o_orderkey" === $"l_orderkey")
      .join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
      .agg(sum(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("rev_dec"))
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name", $"c_acctbal",
        $"rev_dec".cast(DoubleType).as("revenue"), $"rev_dec")
      .orderBy($"rev_dec".desc, $"c_custkey")
      .limit(20)
      .drop("rev_dec")
  }

  /** TPC-H Q17 "small-quantity-order revenue" shape — the CORRELATED
    * scalar-aggregate subquery (`l_quantity < 0.2 * avg per part`)
    * decorrelated by hand into a per-part aggregate + join, with the
    * fractional threshold cleared to INTEGER cross-multiplication
    * (5·qty·cnt < sum_qty) so the cut is exact in both engines — no
    * 0.2 float literal anywhere near the comparison.
    *
    * Scale posture: brand filter reaches the part scan and semi-
    * bounds both lineitem passes; the per-part stats relation is
    * part-bounded and broadcast; the probe is one map-side filter —
    * the whole decorrelation costs one partkey shuffle (the stats
    * agg), not the per-row subquery a naive plan re-executes. */
  def subqueryAvgCorrelated(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = Tables(spark, sfDir, "part")
      .filter($"p_brand" === "Brand#12").select($"p_partkey")
    val l = Tables(spark, sfDir, "lineitem")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
        $"l_extendedprice")
    val stats = l.groupBy($"l_partkey".as("sk"))
      .agg(sum($"qty").as("sum_qty"), count(lit(1)).as("cnt"))
    l.join(broadcast(stats), $"l_partkey" === $"sk")
      .filter($"qty" * 5 * $"cnt" < $"sum_qty")
      .agg(count(lit(1)).as("n_lines"),
        (Det.dsum($"l_extendedprice") / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q19 "discounted revenue" shape — the DISJUNCTIVE-predicate
    * join (OR of three conjunctive brand/size/quantity clauses
    * spanning BOTH sides): the planner test every engine fails by
    * planning a cartesian. Catalyst extracts the common
    * `l_partkey = p_partkey` equi key out of the disjunction, plans
    * ONE hash join, and evaluates the OR as a post-join residual —
    * pinned in the spec (no BNL, single equi join).
    *
    * Scale posture: the side-local prefixes of each clause
    * (brand/size on part, quantity on lineitem) are ALSO pushed as
    * scan-level OR filters — each scan reads only rows that could
    * satisfy SOME clause — and part broadcasts. Exact-decimal
    * revenue. */
  def joinDisjunctive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
    val p = Tables(spark, sfDir, "part")
    val clause =
      ($"p_brand" === "Brand#12" && $"p_size".between(1, 20)
        && $"l_quantity".between(1, 20)) ||
      ($"p_brand" === "Brand#23" && $"p_size".between(1, 25)
        && $"l_quantity".between(10, 30)) ||
      ($"p_brand" === "Brand#21" && $"p_size".between(1, 30)
        && $"l_quantity".between(20, 45))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey" && clause)
      .agg(count(lit(1)).as("n_lines"),
        Det.dsumDec(Det.dec($"l_extendedprice")
          * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
          .as("revenue"))
  }

  /** TPC-H Q12 "shipmode priority" shape — conditional (FILTER-clause)
    * aggregation after a fact⨝fact join: per return flag, how many
    * lines belong to critical-priority orders vs the rest. The
    * high/low split is `count(CASE WHEN …)` — ONE pass, no pivot, no
    * second join — the canonical way to fan one grouping into several
    * predicated counts.
    *
    * Scale posture: both sides are facts, so the join shuffles on
    * orderkey (no broadcast); the lineitem side prunes to one ship
    * year AT THE SCAN (pushed filter), and the aggregation partial-
    * aggs map-side into a 3-row (returnflag-domain) result. */
  def aggFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType)
        && $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_returnflag")
    val o = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_orderpriority")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        count(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1))
          .as("high_line_count"),
        count(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1))
          .as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q14 "promotion effect" shape — a single-row percentage-of-
    * total over a dim join: what share of one month's gross revenue
    * came from PROMO-type parts. The classic conditional-numerator /
    * unconditional-denominator pattern computed in ONE aggregation
    * (two predicated decimal sums), not two scans.
    *
    * Determinism: both sums are exact decimal (base 2-decimal columns
    * multiplied in decimal arithmetic — the Det regime), cast to
    * double only at the end; the final ratio is ONE IEEE division of
    * identical operands on both engines.
    *
    * Scale posture: part is the dim → broadcast; lineitem prunes to
    * the month at the scan; the aggregation is a full partial-agg to
    * one row, so the reduce stage moves two decimals per task. */
  def joinPromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-09-01").cast(TimestampType)
        && $"l_shipdate" < lit("1997-10-01").cast(TimestampType))
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
    val p = Tables(spark, sfDir, "part").select($"p_partkey", $"p_type")
    val rev = Det.dec($"l_extendedprice") *
      (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount"))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .agg(
        (lit(100.0) * Det.dsumDec(when($"p_type" === "PROMO", rev)
          .otherwise(lit(0).cast("decimal(12,2)")))
          / Det.dsumDec(rev)).as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q16 "parts/supplier relationship" shape — COUNT(DISTINCT)
    * per attribute group with a NOT-IN exclusion subquery: how many
    * distinct suppliers ship each (brand, type, size) part family,
    * excluding blacklisted (negative-balance) suppliers.
    *
    * Scale posture: the fact collapses to DISTINCT (partkey, suppkey)
    * PAIRS first — a partial-agged 16-byte-row shuffle — so the
    * blacklist anti join, the part attribute join, and the final
    * distinct-agg expand all run over the pair census, and no
    * lineitem-sized relation ever carries the brand/type strings.
    * The blacklist is a handful of keys → Catalyst rewrites the anti
    * to a BROADCAST anti join; part broadcasts on partkey. Output
    * bounded by the attribute domain, top-20 TakeOrdered. */
  def aggPartsSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bad = Tables(spark, sfDir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val p = Tables(spark, sfDir, "part")
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(bad, $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
      .limit(20)
  }

  /** TPC-H Q22 "global quantile gate" shape — a scalar subquery
    * (global average balance over positive-balance customers) gating
    * an anti join (customers with NO orders): per market segment, how
    * many rich-but-dormant customers and their total balance.
    *
    * Determinism: the threshold is a Det.davg (exact decimal sum /
    * count → one IEEE division), and every comparison against it is
    * on base 2-decimal values — no accumulated float crosses the
    * filter boundary.
    *
    * Scale posture: the scalar aggregate is ONE row broadcast into
    * the filter (Catalyst plans the cross of a 1-row relation as a
    * BroadcastNestedLoop over one row — constant work); the
    * dormancy check is a shuffled LEFT ANTI on custkey against the
    * date-pruned orders scan (orders is a fact — never broadcast);
    * output bounded by the segment domain. ("No orders since 2000"
    * rather than Q22's "no orders ever" — this corpus has no
    * order-less customers, and a vacuous anti join tests nothing.) */
  def subqueryGlobalAvgAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, sfDir, "customer")
    val thr = c.filter($"c_acctbal" > 0)
      .agg(Det.davg($"c_acctbal").as("avg_bal"))
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("2000-01-01").cast(TimestampType))
      .select($"o_custkey")
    c.join(broadcast(thr))
      .filter($"c_acctbal" > $"avg_bal")
      .join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        Det.dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  /** TPC-H Q2 "minimum-cost supplier" shape — a per-group ARGMIN with
    * deterministic tie-breaking, WITHOUT a rank window: for each part,
    * the supplier quoting the lowest line price. Two-level aggregation:
    * (part, supplier) → min quote (exact 2-decimal), then part →
    * `min(struct(quote, suppkey))` — struct ordering IS the tiebreak,
    * so ties resolve to the smallest suppkey on both engines.
    *
    * Scale posture: both aggs partial-agg map-side (the first
    * collapses lineitem to the (part, supplier) census, the second to
    * one row per part); no window, no join until the bounded top-15
    * head is taken. The rank-window formulation would shuffle the
    * full census into per-part sorted groups — this shape moves one
    * struct per (part, supplier) and never sorts more than the
    * TakeOrdered heap. */
  def joinMinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "lineitem")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(Det.dec($"l_extendedprice")).as("quote"))
      .groupBy($"l_partkey")
      .agg(min(struct($"quote", $"l_suppkey")).as("best"),
        count(lit(1)).as("n_suppliers"))
      .select($"l_partkey".as("partkey"),
        $"best.quote".cast(DoubleType).as("best_quote"),
        $"best.l_suppkey".as("best_suppkey"),
        $"n_suppliers")
      .orderBy($"best_quote".asc, $"partkey")
      .limit(15)
  }

  /** EXCEPT ALL — multiset difference (each right occurrence cancels
    * ONE left occurrence), the bag semantics `except` (distinct)
    * cannot express: lineitem's orderkey bag minus one occurrence per
    * urgent order = "how many lines beyond the first does each
    * non-cancelled order have". Censused afterwards so the operator's
    * multiplicity arithmetic is what the oracle hashes.
    *
    * Scale posture: Spark plans ExceptAll as a counted aggregation +
    * generate (no join explosion); one shuffle on the key. */
  def exceptAllKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem").select($"l_orderkey".as("k"))
    val urgent = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("k"))
    l.exceptAll(urgent)
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .groupBy($"n").agg(count(lit(1)).as("n_orders"))
      .orderBy($"n")
  }

  /** INTERSECT ALL — multiset intersection (min of the two
    * multiplicities per value): line counts that appear in BOTH the
    * even- and odd-orderkey halves of the lineitem-per-order census.
    * The bag twin of `q_intersect`. */
  def intersectAllKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
    val a = per.filter($"l_orderkey" % 2 === 0).select($"n")
    val b = per.filter($"l_orderkey" % 2 =!= 0).select($"n")
    a.intersectAll(b)
      .groupBy($"n").agg(count(lit(1)).as("n_common"))
      .orderBy($"n")
  }

  /** UNION BY NAME with missing columns — the schema-evolution union:
    * two extracts with DIFFERENT column orders and one column each
    * the other lacks; `unionByName(allowMissingColumns = true)`
    * aligns by NAME and null-fills, where positional UNION would
    * silently mis-associate. Censused per source tag with null
    * counts proving the fill. */
  def unionByNameEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
    val v1 = o.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"),
        $"o_orderpriority".as("priority"), lit("v1").as("src"))
    val v2 = o.filter($"o_orderkey" % 2 =!= 0)
      .select(lit("v2").as("src"), $"o_orderstatus".as("status"),
        $"o_orderkey".as("k"), $"o_totalprice".as("price"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy($"src")
      .agg(count(lit(1)).as("n"),
        count($"priority").as("n_priority"),
        count($"status").as("n_status"),
        Det.dsum($"price").as("sum_price"))
      .orderBy($"src")
  }

  /** TPC-H Q7 "volume shipping" shape — bidirectional cross-nation
    * trade: revenue flowing between two named nations per ship year,
    * keyed by the (supplier-nation, customer-nation) ORDERED pair.
    * The join graph touches both dimension arms of the fact at once
    * (supplier side AND customer→orders side), which is the test of
    * whether nation filters prune BOTH arms before the fact joins.
    *
    * Scale posture: the two-nation filter broadcasts into supplier
    * and customer independently, so each fact join sees a pre-pruned
    * key set (a ~2/25 semi-filter) instead of a post-join predicate;
    * the cross-pair inequality (supp ≠ cust nation) rides the final
    * projection over already-named columns. Exact-decimal revenue;
    * output bounded by 2 pairs × years. */
  def joinNationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val picked = Tables(spark, sfDir, "nation")
      .filter($"n_name".isin("NATION_3", "NATION_7"))
      .select($"n_nationkey", $"n_name")
    val s = Tables(spark, sfDir, "supplier")
      .join(broadcast(picked), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val c = Tables(spark, sfDir, "customer")
      .join(broadcast(picked), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val o = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val l = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType)
        && $"l_shipdate" < lit("1998-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount", year($"l_shipdate").as("l_year"))
    l.join(s, $"l_suppkey" === $"s_suppkey")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(Det.dsumDec(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q8 "national market share" shape — what fraction of the
    * ASIA market's PROMO-part revenue is supplied by one nation, per
    * order year: a conditional-numerator share (like
    * [[joinPromoShare]]) but over a FIVE-table join with the market
    * defined on the customer arm and the share on the supplier arm.
    *
    * Determinism: numerator and denominator are exact decimal sums;
    * the share is ONE IEEE division per year row.
    *
    * Scale posture: part (PROMO) broadcasts into lineitem first —
    * the most selective cut — then orders shuffles on orderkey,
    * customer on custkey; the ASIA nation-set and the supplier→
    * nation name map are both broadcast dims. Output = one row per
    * order year. */
  def joinMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asiaKeys = Tables(spark, sfDir, "nation")
      .join(Tables(spark, sfDir, "region")
        .filter($"r_name" === "ASIA").select($"r_regionkey"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val p = Tables(spark, sfDir, "part")
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val suppNation = Tables(spark, sfDir, "supplier")
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val rev = Det.dec($"l_extendedprice") *
      (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount"))
    Tables(spark, sfDir, "lineitem")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(suppNation, $"l_suppkey" === $"s_suppkey")
      .join(Tables(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(spark, sfDir, "customer")
        .join(broadcast(asiaKeys), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"o_year")
      .agg(
        (Det.dsumDec(when($"supp_nation" === "NATION_9", rev)
          .otherwise(lit(0).cast("decimal(12,2)")))
          / Det.dsumDec(rev)).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy($"o_year")
  }

  /** TPC-H Q13 "customer distribution" shape — the DOUBLE aggregation
    * with an outer join underneath: orders-per-customer (LEFT join so
    * zero-order customers survive as count 0, with a filter that
    * belongs in the JOIN CONDITION, not WHERE — the classic
    * outer-join-filter placement trap), then the census of customers
    * per order-count.
    *
    * Scale posture: first agg shuffles on custkey with partial
    * counts; the second input is customer-bounded and the final
    * census is count-domain-bounded. The priority filter rides the
    * orders SCAN (pushed) because it only references the inner side
    * — Spark and the SQL twin agree precisely because it is in the
    * ON clause. */
  def aggCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    Tables(spark, sfDir, "customer").select($"c_custkey")
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q15 "top supplier" shape — a scalar-max gate over a
    * derived revenue relation: quarterly revenue per supplier, then
    * the supplier(s) achieving the maximum. The comparison happens in
    * EXACT DECIMAL (the derived column, not its double projection) so
    * "equals the max" is a lattice equality, not a float one — ties,
    * if the data ever produces them, are all returned.
    *
    * Scale posture: one suppkey shuffle builds the supplier-bounded
    * revenue relation; the max is a 1-row aggregate broadcast back
    * over it (the sanctioned 1-row crossJoin gate); supplier names
    * broadcast. */
  def joinTopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast(TimestampType)
        && $"l_shipdate" < lit("1997-04-01").cast(TimestampType))
      .groupBy($"l_suppkey")
      .agg(sum(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("rev_dec"))
    val mx = rev.agg(max($"rev_dec").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter($"rev_dec" === $"mx")
      .join(broadcast(Tables(spark, sfDir, "supplier")
        .select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        $"rev_dec".cast(DoubleType).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q18 "large volume customer" shape — a grouped-HAVING
    * subquery gating the outer join chain: orders whose total line
    * quantity exceeds a threshold, reported with customer identity
    * and the quantity itself. The decorrelation is a self-aggregation
    * of lineitem reused as a SEMI filter — the aggregate is computed
    * ONCE, not once per probe row.
    *
    * Scale posture: the quantity census shuffles lineitem on
    * orderkey (cast long — exact); the HAVING cut bounds it hard
    * (~10% of orders); the surviving keys join orders and then
    * customer on their natural keys; top-100 is TakeOrdered. */
  def subqueryInGrouped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("total_qty"))
      .filter($"total_qty" > 180)
    Tables(spark, sfDir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        $"o_orderdate".cast(DateType).as("o_date"), $"o_totalprice",
        $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q21 "suppliers who kept orders waiting" shape, adapted to
    * this corpus (no commit/receipt dates): in multi-supplier orders,
    * the supplier whose lines shipped STRICTLY last (its per-order
    * max shipdate equals the order's global max, and no other
    * supplier ties it) held the order open. The original's
    * EXISTS/NOT-EXISTS double correlation decorrelates into one
    * pair census + one order census — each subquery becomes an
    * aggregate column instead of a per-row probe.
    *
    * Scale posture: lineitem collapses to the (orderkey, suppkey)
    * pair census FIRST (partial-agged max); the order-level census
    * (supplier count, global max, ties-at-max) derives from the pair
    * census — both shuffles are on orderkey and the second input is
    * pair-bounded, never lineitem-sized. The final count groups the
    * guilty pairs by supplier (supplier-bounded) and broadcasts
    * names. Exact timestamp comparisons throughout. */
  def joinWaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"l_shipdate").as("pair_max"))
    val orderStats = pairs
      .groupBy($"l_orderkey".as("ok"))
      .agg(count(lit(1)).as("n_supp"), max($"pair_max").as("global_max"))
    val atMax = pairs.join(orderStats, $"l_orderkey" === $"ok")
      .filter($"pair_max" === $"global_max" && $"n_supp" > 1)
    // ties-at-max census: guilty only when exactly one supplier is last
    val guilty = atMax
      .withColumn("ties", count(lit(1))
        .over(Window.partitionBy($"l_orderkey")))
      .filter($"ties" === 1)
    guilty.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables(spark, sfDir, "supplier")
        .select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  /** TPC-H Q9 "product type profit" shape (adapted — this corpus has
    * no partsupp, so supply cost is the standard retail-margin proxy
    * `0.6 · p_retailprice · l_quantity`): profit per (supplier nation,
    * order year) over parts whose name contains a token. All money
    * arithmetic in exact decimal on BASE columns (price, discount,
    * retailprice are ≤2-decimal; quantity is integral) — the profit
    * sum is exact, the cast to double at the end is exact-nearest.
    *
    * Scale posture: the p_name LIKE cut broadcast-prunes the part side
    * BEFORE the fact join (parts is the small dim); supplier→nation is
    * a second broadcast chain; the only big shuffle is lineitem⨝orders
    * on the natural orderkey. The (nation × year) census is
    * domain-bounded. */
  def joinProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables(spark, sfDir, "part")
      .filter($"p_name".contains("widget"))
      .select($"p_partkey", Det.dec($"p_retailprice").as("retail"))
    val supNation = Tables(spark, sfDir, "supplier")
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    val profit = Tables(spark, sfDir, "lineitem")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
      .join(Tables(spark, sfDir, "orders")
        .select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .select($"nation", $"o_year",
        (Det.dec($"l_extendedprice")
          * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount"))
          - lit(0.6).cast("decimal(4,2)") * $"retail"
            * $"l_quantity".cast("decimal(4,0)")).as("amount"))
    profit.groupBy($"nation", $"o_year")
      .agg(Det.dsumDec($"amount").as("sum_profit"),
        count(lit(1)).as("n"))
      .orderBy($"nation", $"o_year")
  }

  /** TPC-H Q11 "important stock identification" shape (adapted to the
    * shipped-volume proxy: per-part inventory value = Σ qty·retailprice
    * over lineitems supplied by ONE REGION's suppliers): parts whose
    * value exceeds TWICE the average part value — the
    * scalar-subquery-threshold-over-grouped-aggregate pattern. The
    * mean-relative gate (vs Q11's fixed fraction) keeps the cut
    * meaningful at every corpus size; it clears to exact
    * cross-multiplication `value·n_parts > total·2` on decimal sums,
    * so the filter cannot flip on float luck.
    *
    * Scale posture: the region's supplier keys broadcast into the fact
    * scan (semi-join prune before any aggregation); the per-part census
    * aggregates once and is reused for BOTH the global gate (a 1-row
    * re-aggregation, broadcast back) and the output filter — Catalyst
    * plans the reuse as two consumers of one exchange. */
  def aggImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supKeys = Tables(spark, sfDir, "supplier")
      .join(broadcast(Tables(spark, sfDir, "nation")
        .filter($"n_regionkey" === 0).select($"n_nationkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val partRetail = Tables(spark, sfDir, "part")
      .select($"p_partkey", Det.dec($"p_retailprice").as("retail"))
    val perPart = Tables(spark, sfDir, "lineitem")
      .join(broadcast(supKeys), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(partRetail), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey")
      .agg(sum($"retail" * $"l_quantity".cast("decimal(4,0)"))
        .as("value_dec"))
    val gate = perPart
      .agg(sum($"value_dec").as("total"), count(lit(1)).as("nparts"))
    perPart.join(broadcast(gate))
      .filter($"value_dec" * $"nparts" > $"total" * 2)
      .select($"l_partkey".as("p_partkey"),
        $"value_dec".cast(DoubleType).as("stock_value"))
      .orderBy($"stock_value".desc, $"p_partkey")
  }

  /** TPC-H Q20 "potential part promotion" shape (adapted — availqty
    * has no table here, so the threshold compares a supplier's RECENT
    * shipped quantity of promo parts against HALF their all-time
    * total): suppliers of promo parts whose 1997 volume exceeded 20 %
    * of their lifetime volume (the corpus spans ~7 ship years, so the
    * cut isolates 1997-concentrated suppliers), named via the
    * supplier dim — the nested grouped-subquery semi-join chain Q20
    * exists to exercise. The 1/5 threshold clears to INTEGER
    * cross-multiplication (5·recent > total on exact long quantity
    * sums) so the cut is exact in both engines.
    *
    * Scale posture: the promo partkey set broadcast-prunes the fact
    * scan; ONE (suppkey)-grouped census computes recent and lifetime
    * sums together (conditional aggregation — no second scan, no
    * self-join); the supplier dim joins broadcast. */
  def subqueryPartPromotion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val promoParts = Tables(spark, sfDir, "part")
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val vol = Tables(spark, sfDir, "lineitem")
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey")
      .agg(
        sum(when($"l_shipdate" >= lit("1997-01-01").cast(TimestampType)
          && $"l_shipdate" < lit("1998-01-01").cast(TimestampType),
          $"l_quantity".cast("long")).otherwise(0L)).as("recent_qty"),
        sum($"l_quantity".cast("long")).as("total_qty"))
      .filter($"recent_qty" * 5 > $"total_qty")
    Tables(spark, sfDir, "supplier")
      .join(vol, $"s_suppkey" === $"l_suppkey")
      .select($"s_suppkey", $"s_name", $"recent_qty", $"total_qty")
      .orderBy($"s_suppkey")
  }

  /** PLAIN-TEXT source/sink roundtrip — `spark.read.text` is the
    * format every raw-corpus ingestion starts from (one line = one
    * record, schema = a single `value` string). Documents serialize
    * to tab-separated lines (this corpus is space-tokenized — no
    * embedded tabs/newlines, the precondition any text-line format
    * requires), read back through the text source, re-parsed with
    * `split`, and censused per language; the oracle aggregates the
    * ORIGINAL table, so the hash match proves the sink+source+parse
    * chain is lossless.
    *
    * Scale posture: text write/read parallelize per file split like
    * any other source; the census is one partial-agged pass. */
  def sinkTextRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = s"$scratchRoot/sink_text"
    Tables(spark, sfDir, "documents")
      .select(concat_ws("\t", $"doc_id", $"lang", $"text").as("value"))
      .write.mode("overwrite").text(dir)
    spark.read.text(dir)
      .select(split($"value", "\t").as("p"))
      .select($"p".getItem(0).cast("long").as("doc_id"),
        $"p".getItem(1).as("lang"), $"p".getItem(2).as("text"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum(length($"text").cast("long")).as("sum_chars"),
        sum($"doc_id").as("sum_ids"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sink_text_roundtrip" -> sinkTextRoundtrip,
    "q_join_product_profit" -> joinProductProfit,
    "q_agg_important_stock" -> aggImportantStock,
    "q_subquery_part_promotion" -> subqueryPartPromotion,
    "q_join_nation_volume" -> joinNationVolume,
    "q_join_market_share" -> joinMarketShare,
    "q_agg_count_distribution" -> aggCountDistribution,
    "q_join_top_supplier" -> joinTopSupplier,
    "q_subquery_in_grouped" -> subqueryInGrouped,
    "q_join_waiting_supplier" -> joinWaitingSupplier,
    "q_except_all" -> exceptAllKeys,
    "q_intersect_all" -> intersectAllKeys,
    "q_union_byname" -> unionByNameEvolved,
    "q_agg_filtered" -> aggFiltered,
    "q_join_promo_share" -> joinPromoShare,
    "q_agg_parts_suppliers" -> aggPartsSuppliers,
    "q_subquery_global_avg_anti" -> subqueryGlobalAvgAnti,
    "q_join_min_cost_supplier" -> joinMinCostSupplier,
    "q_join_disjunctive" -> joinDisjunctive,
    "q_join_returned_revenue" -> joinReturnedRevenue,
    "q_subquery_avg_correlated" -> subqueryAvgCorrelated,
    "q_join_local_volume" -> joinLocalVolume,
    "q_join_null_safe" -> joinNullSafe,
    "q_join_shipping_priority" -> joinShippingPriority,
    "q_snapshot_diff" -> snapshotDiff,
    "q_scan_project" -> scanProject,
    "q_source_range" -> sourceRange,
    "q_sink_csv_roundtrip" -> sinkCsvRoundtrip,
    "q_sink_json_roundtrip" -> sinkJsonRoundtrip,
    "q_sink_orc_roundtrip" -> sinkOrcRoundtrip,
    "q_sink_table_roundtrip" -> sinkTableRoundtrip,
    "q_sink_partitioned_prune" -> sinkPartitionedPrune,
    "q_join_dpp" -> joinDpp,
    "q_join_bloom_prejoin" -> joinBloomPrejoin,
    "q_sink_xml_roundtrip" -> sinkXmlRoundtrip,
    "q_merge_upsert" -> mergeUpsert,
    "q_cdc_apply" -> cdcApply,
    "q_filter_predicates" -> filterPredicates,
    "q_project_compute" -> projectCompute,
    "q_cast_decimal" -> castDecimal,
    "q_join_inner" -> joinInner,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_left_outer" -> joinLeftOuter,
    "q_join_full_outer" -> joinFullOuter,
    "q_join_semi" -> joinSemi,
    "q_join_anti" -> joinAnti,
    "q_join_cross" -> joinCross,
    "q_join_theta" -> joinTheta,
    "q_join_range_interval" -> joinRangeInterval,
    "q_join_interval_bucketed" -> joinIntervalBucketed,
    "q_join_asof" -> joinAsof,
    "q_join_asof_nearest" -> joinAsofNearest,
    "q_join_asof_forward" -> joinAsofForward,
    "q_join_asof_tolerance" -> joinAsofTolerance,
    "q_join_asof_native" -> joinAsofNative,
    "q_join_multiway_star" -> joinMultiwayStar,
    "q_join_bucketed" -> joinBucketed,
    "q_sort_multikey" -> sortMultikey,
    "q_topk_global" -> topkGlobal,
    "q_union_all" -> unionAll,
    "q_union_distinct" -> unionDistinct,
    "q_intersect" -> intersectKeys,
    "q_except" -> exceptKeys
  )
}
