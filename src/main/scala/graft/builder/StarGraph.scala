package graft.builder

import graft.model.OnionGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The t2 test graph: the driver's TPC-H-ish star schema folded into a
 * multi-layer graph (SURVEY §5.2 / FIXTURES.md §B).
 *
 * Layers: region, nation, customer, supplier, part, order.
 * Edges (all "toward the dimension"):
 *   customer -> nation   (c_nationkey)
 *   supplier -> nation   (s_nationkey)
 *   nation   -> region   (n_regionkey)
 *   order    -> customer (o_custkey)
 *   order    -> part     (lineitem, qty = sum(l_quantity) per pair)
 *   order    -> supplier (lineitem, qty = sum(l_quantity) per pair)
 *
 * The lineitem-derived edges are grouped (not first-row-wins as pandas
 * drop_duplicates would) so edge properties are deterministic under
 * any partitioning — a documented deviation (SURVEY §7.4).
 *
 * `verticesSql` / `edgesSql` emit the identical relation in DuckDB SQL
 * so every graph operator can be oracle-checked.
 */
object StarGraph {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Node rows: (node_id, layer, name, acctbal, price). */
  def nodesDf(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = table(spark, dir, n)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    t("region").select(col("r_regionkey").cast("string").as("node_id"),
        lit("region").as("layer"), col("r_name").as("name"),
        nullD.as("acctbal"), nullD.as("price"), nullS.as("segment"))
      .unionByName(t("nation").select(col("n_nationkey").cast("string").as("node_id"),
        lit("nation").as("layer"), col("n_name").as("name"),
        nullD.as("acctbal"), nullD.as("price"), nullS.as("segment")))
      .unionByName(t("customer").select(col("c_custkey").cast("string").as("node_id"),
        lit("customer").as("layer"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), nullD.as("price"),
        col("c_mktsegment").as("segment")))
      .unionByName(t("supplier").select(col("s_suppkey").cast("string").as("node_id"),
        lit("supplier").as("layer"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"), nullD.as("price"), nullS.as("segment")))
      .unionByName(t("part").select(col("p_partkey").cast("string").as("node_id"),
        lit("part").as("layer"), col("p_name").as("name"),
        nullD.as("acctbal"), col("p_retailprice").as("price"),
        col("p_brand").as("segment")))
      .unionByName(t("orders").select(col("o_orderkey").cast("string").as("node_id"),
        lit("order").as("layer"), col("o_orderpriority").as("name"),
        nullD.as("acctbal"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("segment")))
  }

  /** Edge rows: (source_id, source_layer, target_id, target_layer,
    * relation, qty). */
  def edgesDf(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = table(spark, dir, n)
    def simple(df: DataFrame, sid: String, sl: String, tid: String, tl: String,
               rel: String): DataFrame =
      df.select(col(sid).cast("string").as("source_id"), lit(sl).as("source_layer"),
        col(tid).cast("string").as("target_id"), lit(tl).as("target_layer"),
        lit(rel).as("relation"), lit(1.0).as("qty"))
    val li = t("lineitem")
    // Decimal-exact sums: order-independent, so the qty property is
    // bit-identical under any partitioning AND matches the oracle.
    val qtySum = sum(col("l_quantity").cast("decimal(38,6)")).cast("double")
    val orderPart = li.groupBy(col("l_orderkey"), col("l_partkey"))
      .agg(qtySum.as("qty"))
      .select(col("l_orderkey").cast("string").as("source_id"),
        lit("order").as("source_layer"),
        col("l_partkey").cast("string").as("target_id"),
        lit("part").as("target_layer"), lit("order_part").as("relation"),
        col("qty"))
    val orderSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(qtySum.as("qty"))
      .select(col("l_orderkey").cast("string").as("source_id"),
        lit("order").as("source_layer"),
        col("l_suppkey").cast("string").as("target_id"),
        lit("supplier").as("target_layer"), lit("order_supp").as("relation"),
        col("qty"))
    simple(t("customer"), "c_custkey", "customer", "c_nationkey", "nation", "cust_nation")
      .unionByName(simple(t("supplier"), "s_suppkey", "supplier", "s_nationkey", "nation", "supp_nation"))
      .unionByName(simple(t("nation"), "n_nationkey", "nation", "n_regionkey", "region", "nation_region"))
      .unionByName(simple(t("orders"), "o_orderkey", "order", "o_custkey", "customer", "order_cust"))
      .unionByName(orderPart)
      .unionByName(orderSupp)
  }

  /** Assembled graph. Lineitem-derived edges are already deduped by
    * construction (groupBy), the rest are 1:1; dedup stays on as a
    * safety net matching `grow_onion` defaults.
    *
    * Cached per (session, dir): the realistic deployment ingests the
    * graph once and runs many queries against it (the reference holds
    * one in-memory graph, `onionnet.py:30-41`), so repeated `queries`
    * invocations share one persisted build instead of re-shuffling
    * lineitem per query. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), OnionGraph]

  def graph(spark: SparkSession, dir: String): OnionGraph = {
    // Evict entries whose owning session has stopped (their persisted
    // blocks are already released) so long-lived JVMs that cycle
    // sessions — sbt test, repeated drivers — don't accumulate dead
    // graph references. computeIfAbsent gives exactly-once build under
    // concurrent first access (TrieMap.getOrElseUpdate could run the
    // build twice, double-persisting).
    cache.forEach((k, g) =>
      if (k._1.sparkContext.isStopped) cache.remove(k, g))
    cache.computeIfAbsent((spark, dir), _ => build(spark, dir))
  }

  private def build(spark: SparkSession, dir: String): OnionGraph = {
      // dropDuplicates=false: every node/edge list above is unique by
      // construction (primary keys / grouped pairs) — the dedup
      // shuffle over ~2 rows/edge would be pure overhead at 100 TB.
      val g = OnionBuilder.grow(nodesDf(spark, dir), edgesDf(spark, dir),
        OnionBuilder.GrowOptions(
          nodePropCols = Seq("name", "acctbal", "price", "segment"),
          edgePropCols = Seq("relation", "qty"),
          dropDuplicates = false))
    val cached = OnionGraph(g.vertices.persist(), g.edges.persist())
    // materialize once so every query starts from the built graph
    cached.vertices.count(); cached.edges.count()
    cached
  }

  /** Memoized co-purchase membership list — distinct (l_orderkey,
    * l_partkey) as (g, i) — and its projection (parts sharing >= 2
    * orders). Same ingest-once contract as [[graph]]: five
    * link-analysis queries consume the identical projection, so it is
    * built and PERSISTED once per (session, dir) instead of
    * re-shuffling lineitem per query. Bench pre-warms both before its
    * keep-set snapshot so the blocks survive its per-query unpersist
    * sweep. */
  private val giCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private val peCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  def copurchaseGi(spark: SparkSession, dir: String): DataFrame = {
    giCache.forEach((k, df) =>
      if (k._1.sparkContext.isStopped) giCache.remove(k, df))
    giCache.computeIfAbsent((spark, dir), _ => {
      val gi = table(spark, dir, "lineitem")
        .select(col("l_orderkey").as("g"), col("l_partkey").as("i"))
        .distinct().persist()
      gi.count()
      gi
    })
  }

  def copurchase(spark: SparkSession, dir: String): DataFrame = {
    peCache.forEach((k, df) =>
      if (k._1.sparkContext.isStopped) peCache.remove(k, df))
    peCache.computeIfAbsent((spark, dir), _ => {
      val pe = graft.algos.LinkAnalysis
        .cooccurrenceFromGi(copurchaseGi(spark, dir), 2).persist()
      pe.count()
      pe
    })
  }

  // ------------------------------------------------------------- oracle SQL

  /** DuckDB CTE body producing the same vertex relation:
    * (layer, node_id, name, acctbal, price, segment). */
  val verticesSql: String =
    """SELECT 'region' AS layer, CAST(r_regionkey AS VARCHAR) AS node_id, r_name AS name, CAST(NULL AS DOUBLE) AS acctbal, CAST(NULL AS DOUBLE) AS price, CAST(NULL AS VARCHAR) AS segment FROM region
      |UNION ALL SELECT 'nation', CAST(n_nationkey AS VARCHAR), n_name, NULL, NULL, NULL FROM nation
      |UNION ALL SELECT 'customer', CAST(c_custkey AS VARCHAR), c_name, c_acctbal, NULL, c_mktsegment FROM customer
      |UNION ALL SELECT 'supplier', CAST(s_suppkey AS VARCHAR), s_name, s_acctbal, NULL, NULL FROM supplier
      |UNION ALL SELECT 'part', CAST(p_partkey AS VARCHAR), p_name, NULL, p_retailprice, p_brand FROM part
      |UNION ALL SELECT 'order', CAST(o_orderkey AS VARCHAR), o_orderpriority, NULL, o_totalprice, o_orderstatus FROM orders""".stripMargin

  /** DuckDB CTE body producing the same edge relation:
    * (source_layer, source_id, target_layer, target_id, relation, qty). */
  val edgesSql: String =
    """SELECT 'customer' AS source_layer, CAST(c_custkey AS VARCHAR) AS source_id, 'nation' AS target_layer, CAST(c_nationkey AS VARCHAR) AS target_id, 'cust_nation' AS relation, 1.0 AS qty FROM customer
      |UNION ALL SELECT 'supplier', CAST(s_suppkey AS VARCHAR), 'nation', CAST(s_nationkey AS VARCHAR), 'supp_nation', 1.0 FROM supplier
      |UNION ALL SELECT 'nation', CAST(n_nationkey AS VARCHAR), 'region', CAST(n_regionkey AS VARCHAR), 'nation_region', 1.0 FROM nation
      |UNION ALL SELECT 'order', CAST(o_orderkey AS VARCHAR), 'customer', CAST(o_custkey AS VARCHAR), 'order_cust', 1.0 FROM orders
      |UNION ALL SELECT 'order', CAST(l_orderkey AS VARCHAR), 'part', CAST(l_partkey AS VARCHAR), 'order_part', CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) FROM lineitem GROUP BY l_orderkey, l_partkey
      |UNION ALL SELECT 'order', CAST(l_orderkey AS VARCHAR), 'supplier', CAST(l_suppkey AS VARCHAR), 'order_supp', CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) FROM lineitem GROUP BY l_orderkey, l_suppkey""".stripMargin

  /** WITH-clause prelude shared by every graph oracle query.
    * RECURSIVE so traversal oracles can append recursive CTEs. */
  val withSql: String =
    s"WITH RECURSIVE vertices AS (\n$verticesSql\n), edges AS (\n$edgesSql\n)"
}
