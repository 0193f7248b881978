package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch relational surface (SURVEY.md §2.2 B6–B10, B14–B18, B25, B27 and
  * §7.2 step 7). The reference delegates all relational work to Flink
  * built-ins; here every query is a declarative DataFrame plan so Catalyst
  * provides pushdown/pruning/partial-agg/broadcast automatically.
  *
  * Cross-engine determinism rules (the driver hash-compares our parquet
  * against DuckDB output):
  *  - Money math in DECIMAL: decimal addition is exact and associative, so
  *    Spark's partial/final aggregation order cannot diverge from DuckDB's
  *    single-node sum. Doubles are only compared when both engines perform
  *    the bit-identical operation sequence.
  *  - Every output is totally ordered (full tie-break) and every computed
  *    column is explicitly aliased identically to the oracle SQL.
  *  - Integer outputs normalized to BIGINT (DuckDB's row_number/year/etc.
  *    return BIGINT where Spark returns INT).
  */
object Relational {
  private val D2 = "decimal(18,2)"
  private val D4 = "decimal(18,4)"
  private def dec2(c: Column): Column = c.cast(D2)

  /** Final-output money column: exact decimal math internally, DOUBLE at
    * the output boundary. Decimal→double is correctly rounded in both
    * Spark (BigDecimal.doubleValue) and DuckDB (exact int / exact power
    * of ten, IEEE-rounded) while the unscaled value < 2^53, so the two
    * engines emit bit-identical doubles — and double is the one numeric
    * type whose representation survives every reader (pyarrow, duckdb,
    * pandas) unchanged, which the driver's hash compare requires.
    * (Round-1 lesson: DECIMAL outputs are value-exact but render as
    * Decimal('24851.00') via pyarrow vs 24851.0 via duckdb → hash miss.) */
  private def outD2(c: Column): Column = c.cast(D2).cast("double")
  private def outD4(c: Column): Column = c.cast(D4).cast("double")

  /** Disc price = extendedprice * (1 - discount), computed in exact decimal
    * identically on both engines. */
  private def discPrice: Column =
    (dec2(col("l_extendedprice")) * (lit(1).cast(D2) - dec2(col("l_discount")))).cast(D4)

  /** Q1 — pricing summary (grouped aggregation, partial+final HashAggregate;
    * reference analogue: windowed sum-reduce B27). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        outD2(sum(dec2(col("l_quantity")))).as("sum_qty"),
        outD2(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        outD4(sum(discPrice)).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q2 — selective filter + projection; predicate and column pruning must
    * reach the parquet scan (B6/B8). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        outD2(col("l_extendedprice")).as("price"), col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q3 — multi-way join with broadcast dims: lineitem ⋈ orders ⋈ customer ⋈
    * nation, revenue per nation. Dimension sides are broadcast so the only
    * shuffle is the fact-side join + final agg. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(outD4(sum(discPrice)).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")

  /** Q46 — TPC-H Q5 LOCAL-SUPPLIER REGIONAL REVENUE: the classic
    * 6-table star-with-a-twist — customer and supplier must share a
    * nation, so the plan composes a broadcast dimension chain
    * (region→nation→customer) with a residual locality predicate
    * instead of a sixth shuffle.
    *
    * Scale shape: the ONLY big-big join is lineitem⋈orders on orderkey
    * (one shuffle each side); the date filter prunes orders before the
    * shuffle; customer (+its nation/region chain) and supplier
    * broadcast, and `c_nationkey = s_nationkey` rides the supplier
    * broadcast join as a residual — zero extra exchanges for the
    * locality constraint. Catalyst's join reorder gets the same answer
    * left to itself; the explicit broadcasts pin the intent. */
  def q46RegionalRevenue(s: SparkSession, dir: String): DataFrame = {
    val nr = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(s, dir)
      .filter(datediff(col("o_orderdate"), lit("1996-01-01")) >= 0 &&
        datediff(col("o_orderdate"), lit("1997-01-01")) < 0)
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), discPrice.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(outD4(sum(col("rev"))).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Q47 — TPC-H Q18 LARGE-VOLUME CUSTOMER: the aggregate-THEN-join
    * plan shape — a big fact-side aggregate whose (HAVING-filtered)
    * output feeds the join chain, the one classic shape q46's star
    * family doesn't exercise.
    *
    * Scale shape: lineitem aggregates on l_orderkey FIRST (partial+final
    * HashAggregate — the only full-fact shuffle in the plan), and the
    * HAVING filter cuts the output to the rare large-volume orders
    * (~0.3% of orders at threshold 300) BEFORE any join: orders joins
    * the aggregate on the same orderkey partitioning (no extra exchange;
    * at runtime AQE sees the tiny filtered side and takes the broadcast
    * form, which is exactly right at any scale), then the customer dim
    * broadcasts. Textbook Q18 re-joins lineitem and re-aggregates to
    * recover the per-order sum; reusing `total_qty` from the aggregate
    * is semantically identical and removes a second fact scan + shuffle. */
  def q47TopQuantityCustomers(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(outD2(sum(dec2(col("l_quantity")))).as("total_qty"))
      .filter(col("total_qty") > 300)
    bigOrders
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        outD2(col("o_totalprice")).as("totalprice"), col("total_qty"))
      .orderBy(col("totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** Q48 — TPC-H Q17 SMALL-QUANTITY REVENUE (generalized across
    * brands): the correlated-scalar-subquery shape — a per-group
    * aggregate of the fact table joined BACK to the same fact, filtering
    * each row against its group's statistic (`l_quantity < 0.2 ×
    * avg(l_quantity) over the part`). The decorrelated plan Catalyst
    * (and every serious optimizer) produces is written directly: aggregate
    * once per l_partkey, join back on the same key.
    *
    * Scale shape: both fact instances shuffle on l_partkey — the
    * aggregate's exchange and the join reuse ONE partitioning (no third
    * exchange), part broadcasts, and the threshold comparison is exact
    * integer math (quantities are integral; `5·qty·n_li < sum_qty` ⟺
    * `qty < 0.2·avg` with no float division on either engine). */
  def q48SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val qty = col("l_quantity").cast("long")
    val partStats = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_li"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), qty.as("qty"), col("l_extendedprice"))
      .join(partStats, Seq("l_partkey"))
      .filter(col("qty") * 5 * col("n_li") < col("sum_qty"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(outD2(sum(dec2(col("l_extendedprice")))).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Q49 — ROLLUP multi-level aggregate: detail, per-year subtotal and
    * grand total in ONE pass — the reporting shape that otherwise costs
    * three scans. Spark plans rollup as an Expand (each row replicated
    * once per grouping set, here 3×) feeding a single partial+final
    * HashAggregate — one shuffle, no re-scan; at 100 TB the expand
    * factor (#levels) is the entire cost of the extra levels.
    * `grouping_id` disambiguates subtotal rows from genuine NULL groups;
    * both engines order it a-most-significant. NULLS FIRST is explicit
    * on both sides (Spark's ASC default; DuckDB's is NULLS LAST). */
  def q49Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_orderpriority"))
      .agg(
        outD2(sum(dec2(col("o_totalprice")))).as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid").asc, col("o_year").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Q50 — FUNNEL (sequential pattern detection): per user, the first
    * view, the first click strictly AFTER that view, and the first
    * purchase strictly AFTER that click — the product-analytics shape
    * SQL engines express as chained conditional mins (MATCH_RECOGNIZE's
    * everyday special case). Output: per-cohort stage counts.
    *
    * Scale shape: every stage is a filtered aggregate or join keyed on
    * user_id — ONE hash partitioning carries the whole chain (the
    * type filters prune each stage's input at the scan), and only the
    * final ≤10-row cohort aggregate leaves the user partitioning.
    * Strict `>` ordering on µs-exact timestamps keeps stage boundaries
    * engine-deterministic. */
  def q50Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val tv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, Seq("user_id"))
      .filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tc, Seq("user_id"))
      .filter(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    ev.select("user_id").distinct()
      .join(tv, Seq("user_id"), "left")
      .join(tc, Seq("user_id"), "left")
      .join(tp, Seq("user_id"), "left")
      .groupBy(pmod(col("user_id"), lit(10)).cast("long").as("cohort"))
      .agg(count(lit(1)).as("n_users"),
        count(col("tv")).as("n_viewed"),
        count(col("tc")).as("n_clicked_after_view"),
        count(col("tp")).as("n_purchased_after_click"))
      .orderBy("cohort")
  }

  /** Q51 — TPC-H Q21 EXCLUSIVE-FAULT SUPPLIER (reshaped to this schema:
    * "fault" = a returned line, `l_returnflag = 'R'`): suppliers who had
    * a returned line in a multi-supplier order where NO OTHER supplier's
    * lines were returned — the classic double-correlated EXISTS +
    * NOT EXISTS self-join, the one plan shape the semi/anti gates (q6/q7)
    * don't exercise because here BOTH subqueries correlate to the same
    * fact table.
    *
    * Scale shape: the textbook plan self-joins lineitem twice (semi +
    * anti on l_orderkey). This implementation REWRITES the correlation
    * into per-order supplier statistics — one (l_orderkey, l_suppkey)
    * partial+final aggregate, then an unbounded window over l_orderkey
    * (count of suppliers + count of faulted suppliers), so the whole
    * decision `has_fault ∧ n_fault_supp = 1 ∧ n_supp > 1` is computed
    * with TWO fact exchanges and ZERO self-joins. The DuckDB oracle runs
    * the EXISTS/NOT EXISTS formulation — the gate hash proves the
    * rewrite. At 100 TB the window state per order is just two counters
    * over ≤ #suppliers-per-order rows (single digits), while the
    * self-join form would shuffle the fact twice more. */
  def q51ExclusiveFault(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_fault"))
    val w = Window.partitionBy("l_orderkey")
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_fault_supp", sum(col("has_fault")).over(w))
      .filter(col("has_fault") === 1 && col("n_fault_supp") === 1 &&
        col("n_supp") > 1)
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("s_name").asc)
      .limit(20)
  }

  /** Q52 — TPC-H Q22 IDLE CAPITAL (reshaped to this schema: "idle" =
    * no order since 2000-01-01): rich customers — balance above the
    * positive-balance average — with no recent order, summed per
    * nation. The one classic combination the suite hadn't composed: an
    * UNCORRELATED scalar aggregate feeding a row filter, an anti join
    * against a date-filtered fact, and a final group-by.
    *
    * Scale shape: the global average is a ONE-ROW aggregate broadcast
    * as a cross join (by-construction single row, PlanGuardSpec
    * allowlist) — the threshold filter then runs at scan speed; the
    * anti join's right side is the date-filtered orders projection
    * (AQE broadcasts it when small; otherwise both sides shuffle on
    * custkey once). Balances go through exact integer cents —
    * `cents·n_pos > sum_pos` is the cross-multiplied average compare,
    * so no double summation order can flip a boundary customer in
    * either engine. */
  def q52IdleCapital(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val stats = cust.filter(col("cents") > 0)
      .agg(sum(col("cents")).as("s_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select(col("o_custkey"))
    cust
      .join(broadcast(stats))
      .filter(col("cents") * col("n_pos") > col("s_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("cents")).cast("double") / 100.0).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** Q53 — SEMI-STRUCTURED EXTRACTION: the events table carries a JSON
    * string column (`props`); real event pipelines aggregate over
    * fields buried in it. Uses `from_json` with an EXPLICIT schema —
    * one schema'd parse per row inside codegen, and Catalyst's
    * OptimizeJsonExprs prunes the parse to just the referenced field —
    * rather than per-field `get_json_object` calls (each re-parses the
    * string) or schema inference (a full extra pass at 100 TB).
    * Unparseable/absent fields become NULL and fall out of the
    * aggregates naturally — the count(k) column makes that visible. */
  def q53JsonExtract(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "k", org.apache.spark.sql.types.LongType)))
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  /** Q54 — CO-OCCURRENCE (market-basket pair counts): parts bought
    * together in one order, ranked by how many orders pair them — the
    * frequent-itemset shape behind "customers also bought" and feature
    * co-occurrence matrices.
    *
    * Scale shape: the textbook form self-joins the fact on orderkey
    * (two fact shuffles, and the join ITSELF materializes the
    * quadratic). Here the fact aggregates to per-order sorted part
    * arrays first — ONE fact exchange — and pair generation is a
    * map-side array comprehension over each basket (quadratic only in
    * basket size, which is single-digits by domain; total pairs stay
    * ~avg_basket·n). The pair aggregate then map-side-combines the hot
    * pairs before its exchange. The DuckDB oracle runs the self-join
    * form — the gate hash proves the rewrite. */
  def q54Copurchase(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(guardedBasket(sort_array(collect_set(col("l_partkey")))).as("parts"))
      // pre-expansion rebalance — the q55 recipe (AQE folds the basket
      // exchange to ~4 read partitions, serializing the comprehension)
      .repartition(s.sparkContext.defaultParallelism)
    baskets
      .select(explode(expr(
        "flatten(transform(parts, (x, i) -> " +
          "transform(slice(parts, i + 2, size(parts)), " +
          "y -> struct(x AS pa, y AS pb))))")).as("p"))
      .select(col("p.pa"), col("p.pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("pa").asc, col("pb").asc)
      .limit(20)
  }

  /** Loud ceiling for the basket comprehensions (q54/q66/q68 and the
    * q55 edge expansion): pair/triple generation is quadratic/cubic in
    * basket size — bounded at ≤7 items on this data, UNBOUNDED in
    * general. C(64,3) ≈ 42k structs per row is the most a single
    * pathological basket may expand to before the job fails LOUDLY
    * instead of slowly. */
  val MaxBasketParts = 64

  /** Wraps a basket-array column with the [[MaxBasketParts]] guard:
    * an oversized basket raises a descriptive error at the aggregate
    * that built it, never a silent quadratic explosion downstream. */
  private[graft] def guardedBasket(parts: Column): Column =
    when(size(parts) > MaxBasketParts,
      raise_error(concat(
        lit(s"basket exceeds MaxBasketParts=$MaxBasketParts: size="),
        size(parts).cast("string"))))
      .otherwise(parts)

  /** Sampling rate denominator for [[q55Triangles]]'s DOULION stage:
    * an edge survives iff h32(pa|pb) ≡ 0 (mod this). */
  val TriangleSampleMod = 4L

  /** Q55 — TRIANGLE COUNT of the co-purchase graph (parts as nodes,
    * edge = bought together in ≥1 order): the canonical "needs a
    * distributed trick" graph statistic, shipped with BOTH tricks a
    * 100-TB graph needs.
    *
    * Trick 1 — degree orientation: orient every edge from its
    * lower-(degree, id) endpoint to its higher one; out-degree is then
    * bounded by ~√m, oriented wedges by O(m^1.5), and each triangle is
    * counted EXACTLY once (its two lowest-ordered edges form the
    * wedge, the third closes it). The closing edge set broadcasts so
    * the wedge stream never shuffles.
    *
    * Trick 2 — DOULION edge sampling (Tsourakakis et al. 2009): count
    * on the subgraph of edges whose pair-hash ≡ 0 mod
    * [[TriangleSampleMod]] and estimate T̂ = T_sampled · mod³. The
    * full wedge universe here is ~Σ C(d,2) ≈ 148 M at sf0.1 (the graph
    * is dense-random, not power-law — orientation alone leaves ~37 M
    * wedges, benched 5-12 s); sampling at 1/4 cuts wedges 16× and
    * triangles 64×. HASH-sampling (not rand()) keeps the subgraph
    * deterministic, so the gate hash-checks exact sampled counts
    * cross-engine and the estimator accuracy is spec-pinned
    * (RelationalSpec, vs the exact count at sf0.001 ≈ 0.9% expected
    * error). Edges come from the q54 basket comprehension — never a
    * fact self-join; the DuckDB oracle counts the sampled subgraph by
    * the id-ordered 3-way join, a DIFFERENT once-per-triangle scheme,
    * so the hash match proves the orientation machinery too. */
  def q55Triangles(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable
    // the full edge list feeds the n_edges count and the sampler; the
    // sampled list feeds THREE consumers (degrees, both orientation
    // sides) — materialize both (2 longs per edge; without this every
    // reference re-runs the basket explosion + distinct: 14.3 s → the
    // CC gates' checkpoint justification)
    val allEdges = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(guardedBasket(sort_array(collect_set(col("l_partkey")))).as("parts"))
      // r19: rebalance BEFORE the quadratic pair expansion — AQE's
      // byte-targeted coalesce folds the 5 MB basket exchange to ~4
      // read partitions, serializing the C(b,2) comprehension + the
      // distinct's partial aggregate; REPARTITION_BY_NUM is the one
      // exchange AQE never coalesces (the dedup_editdist recipe). At
      // scale the basket frame is wide anyway and the pre-expansion
      // rebalance is the standard explode-fan-out posture.
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(expr(
        "flatten(transform(parts, (x, i) -> " +
          "transform(slice(parts, i + 2, size(parts)), " +
          "y -> struct(x AS pa, y AS pb))))")).as("p"))
      .select(col("p.pa"), col("p.pb"))
      .distinct()
      // r20: lazy — triangleStats' gating count() is the materializing
      // action for BOTH edge frames (one action + planning pass instead
      // of three; the CC lazy-checkpoint discipline)
      .localCheckpoint(eager = false)
    val edges = allEdges
      .filter(pmod(Portable.h32(
        concat_ws("|", col("pa"), col("pb"))), lit(TriangleSampleMod)) === 0L)
      .localCheckpoint(eager = false)
    allEdges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(triangleStats(edges)))
      .select("n_edges", "n_edges_sampled", "n_wedges_sampled",
        "n_triangles_sampled")
  }

  /** Degree-oriented triangle counter over an undirected edge list
    * (`pa < pb`, distinct): one row (n_edges_sampled, n_wedges_sampled,
    * n_triangles_sampled) — the [[q55Triangles]] core, exposed so the
    * random-graph fuzz spec can drive it against a brute-force model. */
  private[graft] def triangleStats(
      edges: DataFrame,
      closeBroadcastMaxEdges: Long = -1L): DataFrame = {
    // callers hand in a localCheckpoint'd edge frame, so this count is a
    // cheap cached scan — it gates the closing-set broadcast below
    val nEdges = edges.count()
    val deg = edges.select(col("pa").as("v"))
      .unionAll(edges.select(col("pb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.withColumnRenamed("v", "pa").withColumnRenamed("d", "da"), Seq("pa"))
      .join(deg.withColumnRenamed("v", "pb").withColumnRenamed("d", "db"), Seq("pb"))
    val oriented = withDeg.select(
      when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")),
        struct(col("pa").as("src"), col("pb").as("dst"),
          col("db").as("dd"), col("pb").as("di")))
        .otherwise(struct(col("pb").as("src"), col("pa").as("dst"),
          col("da").as("dd"), col("pa").as("di"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.dd"), col("e.di"))
    // wedge enumeration as an oriented SELF-JOIN on src — measured
    // FASTER here than the q54 array-comprehension trick (11.7 s vs
    // 7.0 s): adjacency lists run to hundreds of neighbors, and the
    // interpreted slice-per-position comprehension is quadratic in
    // allocations at that width, while the hash join enumerates pairs
    // tightly. The basket trick wins only when group size is tiny
    // (q54's ≤13-item baskets).
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          struct(col("e1.dd"), col("e1.di")) < struct(col("e2.dd"), col("e2.di")))
      .select(col("e1.dst").as("wv"), col("e2.dst").as("ww"))
    // the closing check must NOT shuffle the wedge stream (wedges ≈
    // Σ outdeg² — tens of millions here): broadcast the 2-long edge
    // set so wedges flow map-side from the enumeration straight into
    // the count. At a scale where the edge set outgrows broadcast
    // (the count gate above), drop the hint and both sides shuffle on
    // (wv, ww) — the standard MR triangle join — with the wedge side
    // staying the bound. Plan-pinned both ways in the triangle spec.
    val closing = oriented.select(col("src").as("wv"), col("dst").as("ww"))
    // byte-aware guard: default threshold is the byte budget divided by
    // the closing frame's ACTUAL schema width (negative override means
    // "derive"; tests pass explicit row thresholds)
    val maxEdges =
      if (closeBroadcastMaxEdges >= 0L) closeBroadcastMaxEdges
      else graphBroadcastRowBudget(closing)
    val triangles = wedges
      .join(if (nEdges <= maxEdges) broadcast(closing) else closing,
        Seq("wv", "ww"), "left_semi")
    edges.agg(count(lit(1)).as("n_edges_sampled"))
      .crossJoin(broadcast(
        deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges_sampled"))))
      .crossJoin(broadcast(
        triangles.agg(count(lit(1)).as("n_triangles_sampled"))))
  }

  /** Q56 — FUNNEL CONVERSION LATENCY: how long users take from first
    * view to first click after it, as per-cohort interpolated
    * percentiles — the time-to-convert companion of q50's stage counts
    * (the product-analytics pair every funnel dashboard ships).
    *
    * Scale shape: the latency build is q50's chain (every stage keyed
    * on user_id — one partitioning end to end), and the percentile fold
    * is the shared-exchange [[sortedPercentilesMulti]] machinery —
    * latencies are exact integer µs diffs, so the interpolation
    * arithmetic is the bit-exact-vs-quantile_cont discipline q28/q38
    * pinned. Per-cohort sorts partition 10 ways; a single giant cohort
    * takes the q41 band-refinement escape. */
  def q56FunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val tv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val tc = ev.filter(col("event_type") === "click")
      .join(tv, Seq("user_id")).filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val lat = tv.join(tc, Seq("user_id"))
      .select(pmod(col("user_id"), lit(10)).cast("long").as("cohort"),
        (unix_micros(col("tc")) - unix_micros(col("tv")))
          .cast("double").as("lat_us"))
    val counts = lat.groupBy("cohort").agg(count(lit(1)).as("n_converted"))
    sortedPercentilesMulti(lat, "cohort",
      Seq("lat_us" -> Seq(("p50_us", 0.5), ("p90_us", 0.9))))
      .join(counts, Seq("cohort"))
      // report in SECONDS: at the raw µs magnitude (~1e11) the two
      // engines' interpolation differs in the last ulp (~6e-5), which
      // a 6-decimal round can't absorb; divided to ~1e5 the ulp noise
      // sits at ~6e-11 — far below the rounding grain
      .select(col("cohort"), col("n_converted"),
        round(col("p50_us") / 1000000.0, 6).as("p50_s"),
        round(col("p90_us") / 1000000.0, 6).as("p90_s"))
      .orderBy("cohort")
  }

  /** Q57 — RETENTION COHORTS (the product-analytics retention
    * triangle): users grouped by the week of their first event; for
    * each cohort and offset k, how many were active k weeks later.
    * Weeks are integer `epoch_days div 7` — identical arithmetic in
    * both engines, no locale/week-start semantics to diverge on.
    *
    * Scale shape: one (user, week) distinct — the only fact shuffle —
    * then everything stays on the user_id partitioning (first-week
    * aggregate + self join) until the final ≤ weeks·horizon-row
    * cohort aggregate. */
  def q57Retention(s: SparkSession, dir: String): DataFrame = {
    val RetentionHorizon = 3
    val wk = expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
    val active = Tables.events(s, dir)
      .select(col("user_id"), wk.as("wk"))
      .distinct()
    val first = active.groupBy("user_id").agg(min(col("wk")).as("wk0"))
    active.join(first, Seq("user_id"))
      .select(col("wk0"), (col("wk") - col("wk0")).as("k"))
      .filter(col("k") <= RetentionHorizon)
      .groupBy("wk0", "k")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("wk0", "k")
  }

  /** DQ — DATA-QUALITY AUDIT (Deequ-style constraint suite): each rule
    * is one declarative check — referential integrity (anti joins),
    * key uniqueness, null and domain-violation rates — reported as
    * (rule, n_violations, n_checked) so a pipeline can gate on
    * violations = 0 (most rules hold on this data BY CONSTRUCTION;
    * the audit proving zero is the point).
    *
    * Scale shape: every rule is a scan + aggregate or a key-partitioned
    * anti join — no rule materializes violating ROWS to the driver;
    * the union is of 1-row aggregates. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    def rule(name: String, violations: DataFrame, checked: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(checked.agg(count(lit(1)).as("n_checked"))))
        .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
    rule("lineitem_orphan_order",
        li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti"), li)
      .unionByName(rule("orders_duplicate_key",
        ord.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1), ord))
      .unionByName(rule("lineitem_null_quantity",
        li.filter(col("l_quantity").isNull), li))
      .unionByName(rule("lineitem_nonpositive_quantity",
        li.filter(col("l_quantity") <= 0), li))
      .unionByName(rule("orders_status_domain",
        ord.filter(!col("o_orderstatus").isin("O", "F", "P")), ord))
      .unionByName(rule("customer_missing_nation",
        Tables.customer(s, dir).join(Tables.nation(s, dir),
          col("c_nationkey") === col("n_nationkey"), "left_anti"),
        Tables.customer(s, dir)))
      .orderBy("rule")
  }

  /** Q58 — EVENT TRANSITION MATRIX (sequence/path analytics): for each
    * user's event stream in (ts, event_id) order, count (previous →
    * current) event-type transitions — the Markov-chain view behind
    * user-journey and next-action analysis; first events transition
    * from the synthetic '_start' state.
    *
    * Scale shape: ONE user_id exchange carries the whole query — the
    * lag window sorts within user partitions, and the transition-pair
    * aggregate map-side-combines to ≤ (types+1)² rows before its tiny
    * final shuffle. The (ts, event_id) tiebreak makes the sequence —
    * and therefore every count — engine-deterministic. */
  def q58Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type",
        coalesce(lag(col("event_type"), 1).over(w), lit("_start")))
      .groupBy(col("prev_type"), col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "cur_type")
  }

  /** Q59 — ROBUST ANOMALY DETECTION (median/MAD): per event type, the
    * median of value, the median absolute deviation around it, and how
    * many events sit beyond 3·MAD — the outlier rule monitoring
    * pipelines prefer over mean/stddev because one spike can't drag
    * the threshold.
    *
    * Scale shape: two passes of the shared-exchange percentile fold on
    * the SAME event_type partitioning (median, then MAD over the
    * broadcast-joined deviations) + one counting pass. Values go
    * through exact integer cents, so deviations are exact binary
    * fractions and the 3·MAD comparison cannot ulp-flip cross-engine;
    * the report divides back to dollars under the q56 magnitude rule. */
  def q59AnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").cast("double").as("vi"))
    val med = sortedPercentilesMulti(ev, "event_type",
      Seq("vi" -> Seq(("med", 0.5))))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("vi") - col("med")))
    val mad = sortedPercentilesMulti(
      dev.select(col("event_type"), col("adev")), "event_type",
      Seq("adev" -> Seq(("mad", 0.5))))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum((col("adev") > col("mad") * 3).cast("long")).as("n_outliers"),
        first(col("med")).as("med_c"), first(col("mad")).as("mad_c"))
      .select(col("event_type"), col("n_events"), col("n_outliers"),
        round(col("med_c") / 100.0, 6).as("median_value"),
        round(col("mad_c") / 100.0, 6).as("mad_value"))
      .orderBy("event_type")
  }

  /** Q60 — GAPS AND ISLANDS (activity streaks): per user, the number
    * of maximal runs of CONSECUTIVE active days and the longest run —
    * the classic islands idiom (day − dense day-rank is constant within
    * an island), the streak/uptime shape engagement and SLA reporting
    * both need. Integer epoch days, so island identity is pure BIGINT
    * arithmetic on both engines.
    *
    * Scale shape: one (user, day) distinct — the only fact shuffle —
    * then the rank window, the island aggregate, and the per-user
    * roll-up all ride the same user_id partitioning; output is one row
    * per user. */
  def q60ActiveIslands(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"))
      .orderBy("user_id")
  }

  /** Q4 — global sort + limit (top-k by totalprice). */
  def q4SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), outD2(col("o_totalprice")).as("totalprice"))
      .limit(10)

  /** Q5 — distinct (shuffle dedup). */
  def q5Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select("c_mktsegment", "c_nationkey").distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  /** Q6 — left-semi join (EXISTS) + agg. */
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Q7 — left-anti join (NOT EXISTS) + agg: customers who never placed a
    * high-value order (threshold ≈ p90 of o_totalprice so the result is
    * non-empty at every scale factor). */
  def q7AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir).filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")

  /** Q8 — set operations: INTERSECT and EXCEPT of customer vs supplier
    * nation keys, tagged and unioned. */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("n"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("n"))
    val inter = c.intersect(sup).withColumn("op", lit("intersect"))
    val exc = c.except(sup).withColumn("op", lit("except"))
    inter.unionByName(exc).select("op", "n").orderBy("op", "n")
  }

  /** Q9 — per-key running sum over event time: the batch oracle of the
    * reference's keyed running reduce (B10, WindowAllKeyedPoC.java:145-151
    * emits the running sums per event). */
  def q9RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("running_sum", outD2(sum(dec2(col("value"))).over(w)))
      .select("user_id", "event_id", "running_sum")
      .orderBy("user_id", "event_id")
  }

  /** Q10 — rank/top-N per group (window function + filter). */
  def q10RankTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), outD2(col("o_totalprice")).as("totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Q11 — tumbling 1h window, global (non-keyed windowAll, B14). Spark's
    * window() grouped agg is naturally parallel partial+final — exactly the
    * plan the reference hand-built in ParAllWindowedStream (C12). */
  def q11WindowGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), outD2(sum(dec2(col("value")))).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start"), col("n_events"), col("sum_value"))
      .orderBy("w_start")

  /** Q12 — tumbling 1h window, keyed, with window metadata (B15/B18:
    * WindowAgg reads window.maxTimestamp; here window.start/end columns). */
  def q12WindowKeyed(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), outD2(sum(dec2(col("value")))).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("w_start"),
        unix_micros(col("window.end")).as("w_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Q13 — keyed count windows of size 2 (B16/B17): bucket each key's
    * arrival sequence into fixed-size windows; incomplete windows never emit
    * (WindowAllKeyedPoC.java:99-103 semantics). */
  def q13CountWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("win_id", expr("(rn - 1) div 2"))
      .groupBy("user_id", "win_id")
      .agg(count(lit(1)).as("n"), outD2(sum(dec2(col("value")))).as("sum_value"))
      .filter(col("n") === 2)
      .orderBy("user_id", "win_id")
  }

  /** TTL used by the sessionization oracle (µs). 30 min of event-time
    * inactivity resets a key's accumulated state — the batch-queryable
    * mirror of MapWithStateTTL eviction (C1/B12). */
  val TtlMicros: Long = 30L * 60 * 1000 * 1000

  /** Q14 — THE flagship oracle: per-key running sum with TTL eviction
    * (MapWithStateIterPoC.java:310-322 semantics, SURVEY §7.2 slice 0).
    * A key idle for > TTL restarts its sum from zero; expressed in batch as
    * gap-sessionization + per-session running sum. */
  def q14MapWithStateTtl(s: SparkSession, dir: String): DataFrame =
    Sessionization.runningSumByGap(
      Tables.events(s, dir),
      key = "user_id", tsMicros = unix_micros(col("ts")), orderCol = "event_id",
      value = col("value"), ttlMicros = TtlMicros)
      .select(col("event_id"), col("user_id"), col("session_id"),
        col("running_value").cast("double").as("running_value"))
      .orderBy("user_id", "event_id")

  /** Q40 — the skew-proof salted sessionization recipe as a gate query:
    * identical output contract to q14 (the plain window form), verified
    * against the SAME DuckDB oracle — hash-equality of the two gates IS
    * the cross-engine proof that the time-slice salting is exact. */
  def q40SessionSalted(s: SparkSession, dir: String): DataFrame =
    Sessionization.runningSumByGapSalted(
      Tables.events(s, dir),
      key = "user_id", tsMicros = unix_micros(col("ts")), orderCol = "event_id",
      value = col("value"), ttlMicros = TtlMicros, sliceMicros = TtlMicros)
      .select(col("event_id"), col("user_id"), col("session_id"),
        col("running_value").cast("double").as("running_value"))
      .orderBy("user_id", "event_id")

  /** Q15 — ROLLUP (grouping sets hierarchy); NULL subtotal labels
    * normalized to 'ALL' for cross-engine comparison. */
  def q15Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(outD2(sum(dec2(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  /** Q16 — scalar function surface (B6 projection + §2.3): string ops,
    * conditional, modular arithmetic. All codegen'd Catalyst built-ins. */
  def q16ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        when(col("p_retailprice") > 1500, "hi").otherwise("lo").as("price_band"),
        outD2(col("p_retailprice")).as("retail"))
      .orderBy("p_partkey")

  /** Q17 — conditional aggregation / manual pivot per user. */
  def q17ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        outD2(sum(when(col("event_type") === "purchase", dec2(col("value"))).otherwise(lit(0).cast(D2))))
          .as("purchase_value"))
      .orderBy("user_id")

  /** Q18 — date/time extraction + agg over orders. */
  def q18DateAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"), outD2(sum(dec2(col("o_totalprice")))).as("sum_price"))
      .orderBy("y", "m")

  /** Q19 — as-of join composed from built-ins (SURVEY §7 preference (a)):
    * for each purchase, the most recent prior click of the same user.
    * Spark-first: no join at all — union the tagged event kinds and carry
    * the last click timestamp forward with an ignore-nulls window, one
    * shuffle on user_id. (DuckDB oracle uses its native ASOF JOIN.) */
  def q19AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // RANGE frame on us alone, upper bound -1: only strictly-earlier rows
    // are visible, matching ASOF JOIN's p.us > c.cus. (A ROWS frame over
    // (us, event_id) would admit a click at the *same* microsecond with a
    // lower event_id — a real risk given the ns→µs truncation in
    // Tables.events.) Ties among visible clicks are harmless: the value
    // carried is `us` itself, identical across tied rows.
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_us",
        last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_click_us").isNotNull)
      .select("event_id", "user_id", "us", "last_click_us")
      .orderBy("user_id", "event_id")
  }

  /** Q20 — explicit GROUPING SETS (beyond q15's rollup): by (flag,status),
    * by flag alone, and by status alone — no grand total. */
  def q20GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM graft_lineitem_gs
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Q21 — native session windows (`session_window`), the capability the
    * reference's TTL eviction approximates: gap-based sessions per user,
    * 30-minute inactivity gap — same session boundaries as q14 (asserted
    * in RelationalSpec). */
  def q21SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), outD2(sum(dec2(col("value")))).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  /** Q22 — sliding event-time windows (1h window, 15min slide): a
    * capability the reference explicitly lacks (SURVEY §0 absences).
    * Each event lands in exactly 4 epoch-aligned windows. */
  def q22SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"), outD2(sum(dec2(col("value")))).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start"), col("n_events"), col("sum_value"))
      .orderBy("w_start")

  /** Q23 — interval (range) join: per purchase, clicks by the same user in
    * the strictly-preceding hour. The reference has no joins at all; this
    * is the time-bounded enrichment shape of stream-stream joins. */
  def q23IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    p.join(c,
        col("user_id") === col("c_user")
          && col("c_us") < col("us") && col("c_us") >= col("us") - 3600L * 1000000,
        "left")
      .groupBy("event_id", "user_id", "us")
      .agg(count(col("c_us")).as("n_clicks_1h"))
      .select("event_id", "user_id", "n_clicks_1h")
      .orderBy("user_id", "event_id")
  }

  /** Q24 — order-sensitive aggregation done deterministically (SURVEY §5:
    * the reference's label concat was arrival-order nondeterministic):
    * first 3 event ids per type in (ts, event_id) order, joined by '-'. */
  def q24OrderedLabel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("event_type")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("rn").as("rn"), col("event_id").cast("string").as("eid")))),
            x => x.getField("eid")),
          "-").as("label"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Q25 — correlated scalar subquery (Catalyst decorrelates it into an
    * aggregate + join; reference has no subquery capability at all). */
  def q25ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_customer_sq")
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  CAST(CAST((SELECT max(o_totalprice) FROM graft_orders_sq WHERE o_custkey = c_custkey)
        |       AS DECIMAL(18,2)) AS DOUBLE) AS max_order
        |FROM graft_customer_sq
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Q26 — CUBE over (returnflag, linestatus): all four grouping sets. */
  def q26Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(outD2(sum(dec2(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")

  /** Q27 — unpivot/melt (wide → long), a standard preprocessing reshape;
    * oracle uses the portable UNION ALL formulation. */
  def q27Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("size"), col("retailprice")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .select(col("p_partkey"), col("measure"), outD2(col("value")).as("value"))
      .orderBy("p_partkey", "measure")

  /** Exact interpolated percentiles of one value column per group via
    * sort + rank arithmetic: pos = (n−1)·q, answer = v_lo + (v_hi−v_lo)·
    * frac over the floor/ceil rank rows. This is the 100 TB formulation:
    * a window sort that spills like any other, where the built-in
    * `percentile()` accumulates every distinct value of a group into one
    * reducer's in-memory map. Interpolation matches `quantile_cont`
    * (exact at frac 0/0.5 — q28; pinned at non-exact fractions by the
    * q38 gate under round-6). */
  private[graft] def sortedPercentiles(
      df: DataFrame, g: String, v: String, qs: Seq[(String, Double)]): DataFrame =
    sortedPercentilesMulti(df, g, Seq(v -> qs))

  /** Multi-column sort-based interpolated percentiles: every value
    * column shares ONE scan and ONE hash exchange on `g` (windows with
    * identical partitioning reuse the exchange — each extra column adds
    * only a sort within the stage), and a single final aggregate
    * computes every requested fraction. q28/q38 previously paid a
    * scan + shuffle per value column plus a join of the results.
    *
    * NULL discipline (percentile()/quantile_cont ignore NULLs): ranks
    * are taken over the whole group with NULLS FIRST, then shifted by
    * the per-group null count, so each column's rank arithmetic runs
    * 0-based over its non-null values only.
    *
    * Scale note: per-group parallelism is bounded by the group count
    * (each group sorts in one task) — right for many-groups corpora;
    * for a handful of giant groups the escape is approx-percentile
    * band refinement (bound the target rank with approx_percentile,
    * exact-rank only the band), not this operator. */
  private[graft] def sortedPercentilesMulti(
      df: DataFrame, g: String,
      specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    val byG = Window.partitionBy(g)
    // group sizes via a pre-aggregate + broadcast join, NOT unordered
    // count windows: an unordered-frame WindowExec buffers every row of
    // the partition just to stamp a constant — a whole extra pass over
    // the data; the aggregate is one tiny hash-agg and a broadcast
    val countAggs = count(lit(1)).cast("double").as("cnt_all") +:
      specs.map { case (v, _) => count(col(v)).cast("double").as(s"n_$v") }
    val counts = df.groupBy(g).agg(countAggs.head, countAggs.tail: _*)
    val withRanks = specs.foldLeft(df) { case (d, (v, _)) =>
      d.withColumn(s"rn_$v",
        (row_number().over(byG.orderBy(col(v).asc_nulls_first)) - 1).cast("double"))
    }.join(broadcast(counts), g)
    val aggs = specs.flatMap { case (v, qs) =>
      // 0-based rank among the column's non-null values (NULLS FIRST)
      val rn = col(s"rn_$v") - (col("cnt_all") - col(s"n_$v"))
      qs.flatMap { case (name, q) =>
        val pos = (col(s"n_$v") - 1) * lit(q)
        Seq(
          sum(when(col(v).isNotNull && rn === floor(pos), col(v))).as(s"${name}_lo"),
          sum(when(col(v).isNotNull && rn === ceil(pos), col(v))).as(s"${name}_hi"),
          max(pos - floor(pos)).as(s"${name}_frac"))
      }
    }
    val folded = withRanks.groupBy(g).agg(aggs.head, aggs.tail: _*)
    val names = specs.flatMap(_._2.map(_._1))
    names.foldLeft(folded) { (d, name) =>
      d.withColumn(name,
        col(s"${name}_lo") + (col(s"${name}_hi") - col(s"${name}_lo")) * col(s"${name}_frac"))
    }.select(col(g) +: names.map(col): _*)
  }

  /** Q28 — exact interpolated percentiles (median + quartiles), computed
    * sort-based (see [[sortedPercentiles]]) and value-matched against
    * DuckDB's `quantile_cont`. */
  def q28Percentile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    sortedPercentilesMulti(li, "l_returnflag", Seq(
      "l_quantity" -> Seq(("median_qty", 0.5)),
      "l_extendedprice" -> Seq(("p25", 0.25), ("p75", 0.75))))
      .select(col("l_returnflag"), col("median_qty"),
        round(col("p25"), 4).as("p25_price"), round(col("p75"), 4).as("p75_price"))
      .orderBy("l_returnflag")
  }

  /** Q38 — interpolated percentiles at fractions whose (n−1)·q is NOT
    * arithmetically exact (0.37/0.63 — closes the parity caveat q28
    * deferred to round 4): pins the sort-based lo + (hi−lo)·frac
    * interpolation against DuckDB's `quantile_cont` (which computes
    * lo·(1−frac) + hi·frac — a different IEEE sequence) under
    * round(·, 6) on both sides; values are cast to double up front so
    * both engines interpolate in the same type. */
  def q38PercentileInterp(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("qty"),
        col("l_extendedprice").cast("double").as("price"))
    sortedPercentilesMulti(li, "l_returnflag", Seq(
      "qty" -> Seq(("p37_qty", 0.37), ("p63_qty", 0.63)),
      "price" -> Seq(("p37_price", 0.37), ("p63_price", 0.63))))
      .select(col("l_returnflag"),
        round(col("p37_qty"), 6).as("p37_qty"),
        round(col("p63_qty"), 6).as("p63_qty"),
        round(col("p37_price"), 6).as("p37_price"),
        round(col("p63_price"), 6).as("p63_price"))
      .orderBy("l_returnflag")
  }

  /** Q39 — pivot (long → wide): daily revenue matrix, one column per
    * event type. The pivot value list is EXPLICIT, so there is no
    * distinct-scan pre-job and the column order is deterministic;
    * Catalyst lowers this to the identical single-shuffle partial+final
    * HashAggregate as q17's CASE-WHEN sums — wide conditional
    * aggregation, not a per-type scan. Inverse of q27's unpivot. */
  def q39Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"),
        dec2(col("value")).as("v"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(outD2(sum(col("v"))))
      .orderBy("day")

  /** EXACT interpolated percentiles WITHOUT a per-group sort — the
    * giant-group escape documented in SCALE.md: [[sortedPercentilesMulti]]
    * sorts each group in one task (right when groups are many/bounded);
    * here the only per-group ordered work happens inside a narrow value
    * band around each target rank.
    *
    *  1. `percentile_approx` (t-digest, map-side mergeable, NO sort) at
    *     q ± 3/accuracy brackets each target — the sketch's rank error
    *     is ≤ n/accuracy, so rows at ranks floor/ceil((n−1)q) are
    *     inside the band by construction;
    *  2. one scan counts rows strictly below each band's lower bound;
    *  3. only band rows (≈ 6n/accuracy per fraction) are ranked — the
    *     window sort that was O(group) is now O(band);
    *  4. absolute rank = below-count + band rank; interpolation is the
    *     identical lo + (hi−lo)·frac sequence as the sort-based path,
    *     so results are bit-equal (q41 gate shares q28's oracle).
    *
    * A band that somehow missed its target rank yields NULL sums — a
    * loud gate/spec failure, never a silently shifted percentile. */
  private[graft] def bandPercentiles(
      df: DataFrame, g: String, v: String,
      qs: Seq[(String, Double)], accuracy: Int = 10000): DataFrame =
    bandPercentilesMulti(df, g, Seq(v -> qs), accuracy)

  /** Multi-column generalization of [[bandPercentiles]]: every value
    * column's sketch bounds ride ONE partial+final aggregate, the
    * below-counts ride one more, and all (column, quantile) bands share a
    * single window pass and a single wide conditional final aggregate —
    * so adding a column or a fraction adds projection width, not jobs.
    * (q41 previously ran the whole pipeline once per value column: two
    * t-digest aggregate jobs, two below scans, and a final join; merged,
    * the data is aggregated twice and band-scanned Σqᵢ times total, with
    * zero result-side joins.) Null values never count (count/sketch/band
    * predicates all null-reject per column), matching the per-column
    * isNotNull filter of the single-column form.
    *
    * NULL GROUPS: rows whose group key is NULL are excluded from the
    * output entirely. The internal equi-joins on `g` (data↔bounds,
    * bands↔belows) null-reject, so a NULL group present in the groupBy
    * stages never survives to the final aggregate — same end state as
    * pre-filtering `g IS NOT NULL`, which callers should do explicitly
    * if they want the scan savings.
    *
    * Quantile output names must be unique ACROSS ALL columns: each name
    * becomes `${name}_lo/_hi/_frac` scratch aliases and a final output
    * column, so a duplicate would make one (column, fraction) silently
    * shadow another. Asserted below rather than left to Catalyst's
    * ambiguous-reference error (which would surface far from the bug). */
  private[graft] def bandPercentilesMulti(
      df: DataFrame, g: String,
      specs: Seq[(String, Seq[(String, Double)])],
      accuracy: Int = 10000): DataFrame = {
    val outNames = specs.flatMap { case (_, qs) => qs.map(_._1) }
    require(outNames.distinct.size == outNames.size,
      s"duplicate quantile output names across specs: " +
        outNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }.mkString(", "))
    val margin = 3.0 / accuracy
    val data = df.select(col(g) +: specs.zipWithIndex.map { case ((v, _), vi) =>
      col(v).cast("double").as(s"bv_$vi") }: _*)
    // ONE t-digest per column: lo and hi bracket fractions ride a single
    // percentile_approx (one sketch build, 2·Σqᵢ evaluations), split back
    // into blos/bhis arrays by slice — halves the dominant sketch cost
    // vs separate lo/hi aggregates
    val boundAggs = specs.zipWithIndex.flatMap { case ((_, qs), vi) =>
      Seq(
        count(col(s"bv_$vi")).cast("double").as(s"nv_$vi"),
        percentile_approx(col(s"bv_$vi"),
          typedLit(qs.map(q => math.max(0.0, q._2 - margin)) ++
            qs.map(q => math.min(1.0, q._2 + margin))), lit(accuracy)).as(s"bb_$vi"))
    }
    val bounds = data.groupBy(g).agg(boundAggs.head, boundAggs.tail: _*)
      .select(col(g) +: specs.zipWithIndex.flatMap { case ((_, qs), vi) =>
        Seq(col(s"nv_$vi"),
          slice(col(s"bb_$vi"), 1, qs.size).as(s"blos_$vi"),
          slice(col(s"bb_$vi"), qs.size + 1, qs.size).as(s"bhis_$vi"))
      }: _*)
    val joined = data.join(broadcast(bounds), Seq(g))
    val belowAggs = specs.zipWithIndex.flatMap { case ((_, qs), vi) =>
      qs.indices.map(i =>
        sum(when(col(s"bv_$vi") < element_at(col(s"blos_$vi"), i + 1), 1L).otherwise(0L))
          .cast("double").as(s"below_${vi}_$i"))
    }
    val belows = joined.groupBy(g).agg(belowAggs.head, belowAggs.tail: _*)
    val bands = specs.zipWithIndex.flatMap { case ((_, qs), vi) =>
      qs.indices.map { i =>
        joined
          .filter(col(s"bv_$vi") >= element_at(col(s"blos_$vi"), i + 1) &&
            col(s"bv_$vi") <= element_at(col(s"bhis_$vi"), i + 1))
          .select(col(g), lit(vi).as("vi"), lit(i).as("qi"),
            col(s"bv_$vi").as("bv"), col(s"nv_$vi").as("nv"))
      }
    }.reduce(_ unionByName _)
    val wBand = Window.partitionBy(col(g), col("vi"), col("qi")).orderBy(col("bv"))
    val ranked = bands
      .join(broadcast(belows), Seq(g))
      .withColumn("rn", row_number().over(wBand).cast("double"))
    val aggs = specs.zipWithIndex.flatMap { case ((_, qs), vi) =>
      qs.zipWithIndex.flatMap { case ((name, q), i) =>
        val pos = (col("nv") - 1) * lit(q)
        val abs0 = col(s"below_${vi}_$i") + col("rn") - 1
        val inQ = col("vi") === vi && col("qi") === i
        Seq(
          sum(when(inQ && abs0 === floor(pos), col("bv"))).as(s"${name}_lo"),
          sum(when(inQ && abs0 === ceil(pos), col("bv"))).as(s"${name}_hi"),
          max(when(inQ, pos - floor(pos))).as(s"${name}_frac"))
      }
    }
    val allQNames = specs.flatMap { case (_, qs) => qs.map(_._1) }
    val wide = ranked.groupBy(g).agg(aggs.head, aggs.tail: _*)
      // LOUD band-miss guard (the ntileBandsDesc discipline): a band
      // that missed its target rank — possible when the margin
      // 3/accuracy is narrower than a rank interval 1/(n−1), e.g. TAIL
      // fractions on small groups — must throw here, not flow NaN
      // thresholds downstream (observed: p01/p99 on 300-row groups at
      // the default accuracy before columnWinsorize lowered it)
      .filter(assert_true(
        allQNames.map(n => col(s"${n}_lo").isNotNull && col(s"${n}_hi").isNotNull)
          .reduce(_ && _),
        lit("bandPercentilesMulti: a percentile band missed its target rank — " +
          "lower `accuracy` so the 3/accuracy margin spans a rank interval")
      ).isNull)
    val allQs = specs.flatMap { case (_, qs) => qs }
    val named = allQs.foldLeft(wide) { case (d, (name, _)) =>
      d.withColumn(name,
        col(s"${name}_lo") + (col(s"${name}_hi") - col(s"${name}_lo")) * col(s"${name}_frac"))
    }
    named.select((col(g) +: allQs.map { case (name, _) => col(name) }): _*)
  }

  /** COLUMN WINSORIZATION — robust statistics after clipping at exact
    * interpolated p01/p99 (the standard outlier-capping step before
    * any mean/σ-based feature lands in a training table): per order
    * priority, the clip thresholds, clip counts, and the winsorized
    * sum, all from the sort-free [[bandPercentilesMulti]] machinery.
    *
    * Determinism shape: values are exact integer CENTS; the clipped
    * interior sums as BIGINT; the two clip tails contribute
    * n_low·p01 + n_high·p99 computed ONCE from the aggregate counts —
    * never a per-row float sum, so no accumulation-order noise exists
    * anywhere (interpolated thresholds are bit-equal to quantile_cont,
    * the q28/q38-pinned discipline, and a single product of identical
    * doubles is identical). Scale shape: the percentile pass is q41's
    * (sketch brackets + banded ranks, no per-group sort); the clip
    * aggregate is one more partial+final pass with the 5-row
    * threshold frame broadcast. */
  def columnWinsorize(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .localCheckpoint() // feeds the 3-pass band machinery + the clip pass
    // accuracy 500 → band margin 3/500 = 0.006: at the TAIL fractions
    // the band must span a whole rank interval (1/(n−1) — ~0.0033 at
    // the smallest 300-row gate groups), which the default 10000's
    // 0.0003 margin cannot; the wider band costs ~6n/500 ranked rows
    // per fraction, still O(n/accuracy) and never a per-group sort
    val pct = bandPercentilesMulti(o, "grp",
      Seq("cents" -> Seq(("p01", 0.01), ("p99", 0.99))), accuracy = 500)
    o.join(broadcast(pct), Seq("grp"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") < col("p01"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("cents") > col("p99"), 1L).otherwise(0L)).as("n_high"),
        sum(when(col("cents") >= col("p01") && col("cents") <= col("p99"),
          col("cents")).otherwise(0L)).as("sum_mid"),
        max(col("p01")).as("p01"),
        max(col("p99")).as("p99"))
      .select(col("grp"), col("n"), col("n_low"), col("n_high"),
        expr("CAST(round(sum_mid + n_low * p01 + n_high * p99) AS BIGINT)")
          .as("winsor_sum_cents"),
        round(col("p01"), 4).as("p01_cents"),
        round(col("p99"), 4).as("p99_cents"))
      .orderBy("grp")
  }

  /** Q41 — q28's exact percentiles recomputed through the band-refinement
    * path; shares q28's DuckDB oracle, so the hash gate proves the
    * sort-free formulation is value-identical. */
  def q41PercentileBand(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    bandPercentilesMulti(
      li.select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
      "l_returnflag",
      Seq(
        "l_quantity" -> Seq(("median_qty", 0.5)),
        "l_extendedprice" -> Seq(("p25", 0.25), ("p75", 0.75))))
      .select(col("l_returnflag"), col("median_qty"),
        round(col("p25"), 4).as("p25_price"), round(col("p75"), 4).as("p75_price"))
      .orderBy("l_returnflag")
  }

  /** Q29 — analytic window-function suite (lag/lead/ntile/dense_rank/
    * cume_dist) over a deterministic (date, key) order — one sort-based
    * window pass per customer partition. */
  def q29WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev_order"),
        lead("o_orderkey", 1).over(w).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        dense_rank().over(w).cast("long").as("drank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q30 — FULL OUTER join of two overlapping-but-distinct customer
    * subsets (high-value orderers vs BUILDING segment): unmatched rows on
    * both sides, NULL-coalesced to a dense output. */
  def q30FullOuter(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
    val bld = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), lit(1L).as("in_building"))
    big.join(bld, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        coalesce(col("in_building"), lit(0L)).as("in_building"))
      .orderBy("custkey")
  }

  /** Q31 — multiple exact COUNT(DISTINCT) per group (expand-based
    * multi-distinct aggregation). */
  def q31CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Q32 — the NATIVE as-of join operator (custom LogicalPlan + Strategy
    * + merge-join SparkPlan, graft.plans.AsOfJoin): last view strictly
    * before each purchase per user. Same semantic family as q19 but a
    * whole-operator implementation — one hash shuffle per side declared
    * via ClusteredDistribution, streaming O(1)-state per-partition
    * merge — instead of a window-function composition. */
  def q32AsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    graft.plans.AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us")
      .select("event_id", "user_id", "us", "view_us")
      .orderBy("user_id", "event_id")
  }

  /** Q33 — explicit salted join (SkewJoin.saltedInner): the skew-handling
    * form for hot keys AQE can't see. The salt only routes rows — result
    * multiplicity is untouched — so the oracle is the PLAIN join: the
    * gate proves salting is semantically invisible. */
  def q33SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val probe = Tables.orders(s, dir)
      .select(col("o_custkey").as("custkey"), dec2(col("o_totalprice")).as("price"))
    val build = Tables.customer(s, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    SkewJoin.saltedInner(probe, build, "custkey", buckets = 4)
      .groupBy("c_mktsegment")
      .agg(outD2(sum(col("price"))).as("sum_price"), count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** Q34 — FORWARD as-of through the native operator: first view
    * strictly after each purchase per user (post-purchase behavior
    * attribution — the time-reversed twin of q32). Oracle: DuckDB
    * ASOF JOIN with the `<` comparator. */
  def q34AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    graft.plans.AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us",
        direction = graft.plans.AsOfJoin.Forward)
      .select("event_id", "user_id", "us", "view_us")
      .orderBy("user_id", "event_id")
  }

  /** Q35 — LEFT OUTER as-of through the native operator: last view
    * strictly before each purchase per user, keeping purchases with no
    * prior view (null view_us) — the default shape of pandas merge_asof
    * and DuckDB `ASOF LEFT JOIN`. */
  def q35AsofLeft(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    graft.plans.AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us",
        joinType = graft.plans.AsOfJoin.LeftOuter)
      .select("event_id", "user_id", "us", "view_us")
      .orderBy("user_id", "event_id")
  }

  /** Q36 — as-of with a TOLERANCE bound (merge_asof tolerance= / "within
    * one hour"): last view strictly before each purchase AND within 1 h
    * of it; LEFT OUTER so out-of-tolerance purchases surface with null
    * view_us rather than silently dropping. The as-of match per left row
    * is unique, so the oracle is ASOF LEFT JOIN with the match nulled
    * out when it misses the tolerance. */
  def q36AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    graft.plans.AsOfJoin.asof(p, v, "user_id", "v_user", "us", "view_us",
        joinType = graft.plans.AsOfJoin.LeftOuter,
        within = Some(3600000000L))
      .select("event_id", "user_id", "us", "view_us")
      .orderBy("user_id", "event_id")
  }

  /** Q37 — MULTI-KEY as-of through the native operator: for each event,
    * the time of the previous event with the same (user_id, event_type)
    * — equality on a Long AND a String key before the time inequality,
    * the DuckDB `ASOF JOIN ... ON k1 = k1' AND k2 = k2' AND t > t'`
    * shape. Proves the operator's keys are general orderable
    * expressions, not just a single Long. Only the matched TIME is
    * output, so same-timestamp ties within a key hash identically
    * regardless of which tied row either engine picked. */
  def q37AsofMultiKey(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val l = ev.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val r = ev.select(col("user_id").as("r_user"), col("event_type").as("r_type"),
      unix_micros(col("ts")).as("prev_us"))
    graft.plans.AsOfJoin.asofMulti(l, r,
        Seq("user_id", "event_type"), Seq("r_user", "r_type"), "us", "prev_us",
        joinType = graft.plans.AsOfJoin.LeftOuter)
      .select("event_id", "user_id", "event_type", "us", "prev_us")
      .orderBy("user_id", "event_id")
  }

  /** Q42 — CDC MERGE/upsert: apply a change set (updates + inserts +
    * deletes) to a base table in one pass — the incremental-refresh
    * primitive of every warehouse pipeline (MERGE INTO). The change set
    * is derived deterministically from the base so both engines build
    * the identical one: every 10th order re-priced, every 17th cloned
    * as a new order (key offset), every 13th-not-10th deleted (the
    * exclusion keeps change keys unique — one change row per key, the
    * MERGE contract). Full-outer join on the key, change side wins via
    * coalesce, delete rows filtered.
    *
    * Scale shape: one hash-partitioned full-outer join on the primary
    * key — CDC batches are usually ≪ base, so production layouts bucket
    * the base by key and the change side shuffles to it (zero base
    * movement; see StorageLayoutSpec for the bucketed co-located join
    * this plan becomes). */
  def q42Upsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), dec2(col("o_totalprice")).as("price"))
    val upd = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"), dec2(col("price") + 100).as("price"),
        lit("upsert").as("op"))
    // insert keys offset past max(o_orderkey), rounded up to the next
    // billion — a fixed constant would collide with real keys at
    // SF ≳ 150 (orderkeys reach ~6M·SF), silently violating the MERGE
    // key-uniqueness contract in a way the cross-engine gate cannot see
    // (both engines would agree). One broadcast 1-row max; exact BIGINT
    // arithmetic so the oracle derives the identical offset.
    val maxKey = base.agg(max(col("o_orderkey")).as("mk"))
    val ins = base.filter(col("o_orderkey") % 17 === 0)
      .crossJoin(broadcast(maxKey))
      .select(
        (col("o_orderkey") + expr("((mk div 1000000000) + 1) * 1000000000"))
          .as("o_orderkey"),
        col("o_custkey"),
        lit("N").as("o_orderstatus"), col("price"), lit("upsert").as("op"))
    val del = base.filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"), lit(null).cast("long").as("o_custkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast(D2).as("price"), lit("delete").as("op"))
    val changes = upd.unionByName(ins).unionByName(del)
    base.as("b")
      .join(changes.as("c"), col("b.o_orderkey") === col("c.o_orderkey"), "full_outer")
      .filter(col("c.op").isNull || col("c.op") =!= "delete")
      .select(
        coalesce(col("c.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
        coalesce(col("c.o_custkey"), col("b.o_custkey")).as("o_custkey"),
        coalesce(col("c.o_orderstatus"), col("b.o_orderstatus")).as("o_orderstatus"),
        outD2(coalesce(col("c.price"), col("b.price"))).as("price"))
      .orderBy("o_orderkey")
  }

  /** Q43 — Z-ORDER (Morton) layout key over (user, time): interleave
    * the low 16 bits of the user id with a 16-bit minute bucket so rows
    * CLOSE IN BOTH dimensions get close z-values. This is the
    * data-clustering lever behind multi-dimensional min/max pruning
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`): a table
    * `repartitionByRange(z).sortWithinPartitions(z)` gives every file a
    * tight (user, time) bounding rectangle, so a scan filtered on
    * EITHER dimension skips most files — single-column sort layouts
    * only prune their own column. The gate checks the key computation
    * and total order; `ZorderSpec` pins the bit-exact decode and the
    * locality property the layout exists for.
    *
    * Pure per-row bit arithmetic (32 codegen'd shift/mask terms), scan
    * speed, no shuffle beyond the final orderBy. */
  def q43Zorder(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        // `div`: exact BIGINT floor division (a double `/` could round
        // up across an integer boundary before truncation)
        expr("unix_micros(ts) div 60000000 AS tb"))
    // Dimension NORMALIZATION is what makes the curve work: naive bit
    // interleave of unbalanced dimensions (a 7-bit user range against a
    // 16-bit time range) degenerates to a time-major sort because the
    // narrow dimension's high bits never discriminate. Production
    // OPTIMIZE ZORDER does the same range mapping from column stats —
    // here one broadcast 1-row min/max aggregate.
    val stats = base.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("tb")).as("tmin"), max(col("tb")).as("tmax"))
    val ev = base.crossJoin(broadcast(stats))
      .select(col("event_id"),
        expr("((user_id - umin) * 65535) div greatest(umax - umin, 1) AS u16"),
        expr("((tb - tmin) * 65535) div greatest(tmax - tmin, 1) AS t16"))
    val z = (0 until 16).map { i =>
      (shiftright(col("u16"), i).bitwiseAND(lit(1L))) * lit(1L << (2 * i)) +
        (shiftright(col("t16"), i).bitwiseAND(lit(1L))) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    ev.select(col("event_id"), col("u16"), col("t16"), z.as("z"))
      .orderBy("z", "event_id")
  }

  /** Q44 — SCD TYPE-2 HISTORY BUILD: turn a change log into validity
    * intervals — the slowly-changing-dimension primitive every
    * warehouse dimension load runs (each change row opens a version;
    * the next change for the same key closes it; the last stays open).
    * Orders are the change log here: per customer, each order's status
    * is a new version effective at its order date.
    *
    * Scale shape: ONE hash exchange on the dimension key feeding a
    * per-partition sort, then `lead()` over (key, date, tiebreak) — the
    * same linear window family as q9/q14; no self-join (the naive SCD2
    * build joins the log to itself on "next change", which at 100 TB is
    * a second full shuffle plus a skew hazard on hot keys).
    * Deterministic: ties on (date) break by orderkey, the open version
    * carries a sentinel end date (9999-12-31, the warehouse
    * convention). Dates emitted as ISO strings at the gate boundary
    * (DATE representation differs across readers; VARCHAR is exact). */
  def q44Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_orderstatus"))
      .withColumn("valid_to_d", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"),
        col("o_orderkey").as("version_key"),
        col("o_orderstatus").as("status"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("valid_from"),
        coalesce(date_format(col("valid_to_d"), "yyyy-MM-dd"), lit("9999-12-31"))
          .as("valid_to"),
        when(col("valid_to_d").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy("o_custkey", "valid_from", "version_key")
  }

  /** Q45 — POINT-IN-TIME ENRICHMENT: each fact row joined to the
    * dimension version in effect at its own timestamp — the standard
    * consumption pattern of an SCD2 dimension (q44), here composed
    * over the custom [[graft.plans.AsOfJoin]] operator: lineitems
    * (facts, at ship date) pick up their customer's order status as of
    * that day. The daily dimension collapses to ONE version per
    * (customer, day) — last writer (max orderkey) wins — because as-of
    * semantics over tied timestamps are engine-ambiguous; end-of-day
    * snapshots are also exactly what warehouse dimension loads publish.
    *
    * Scale shape: fact prep is the standard orderkey equi-join
    * (co-partitioned/bucketed in a production layout — StorageLayoutSpec);
    * the PIT join itself is the AsOfJoin exec — ClusteredDistribution
    * on the customer key + (key, time) sort, streaming O(1)-state merge
    * per partition, never a range-explode join. Output aggregated per
    * status so the gate hash covers the whole join at constant output. */
  def q45PitJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(s, dir)
      .select(col("o_custkey").as("d_cust"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d_days"),
        col("o_orderkey"), col("o_orderstatus"))
      .groupBy("d_cust", "d_days")
      .agg(max_by(col("o_orderstatus"), col("o_orderkey")).as("d_status"))
    // PIT is INCLUSIVE (a version effective on the ship day applies to
    // that day's facts: valid_from ≤ fact_date), while the AsOfJoin
    // Backward comparator is strict (rt < lt, DuckDB `l.t > r.t`) — on
    // an integer day axis `d ≤ ship` is exactly `ship + 1 > d`, so the
    // fact side carries a +1 read frontier
    val facts = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (datediff(col("l_shipdate"), lit("1970-01-01")).cast("long") + 1L)
          .as("frontier_days"),
        discPrice.as("rev"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    graft.plans.AsOfJoin.asofMulti(
        facts, dim, Seq("o_custkey"), Seq("d_cust"), "frontier_days", "d_days")
      .groupBy("d_status")
      .agg(count(lit(1)).as("n_items"), outD4(sum(col("rev"))).as("revenue"))
      .orderBy("d_status")
  }

  /** Fixed-point scale for [[q61Pagerank]]: total rank mass, split
    * integer-exactly across nodes. 1e12 leaves ~7 digits of rank
    * resolution even at 100k+ nodes. */
  val PagerankScale = 1000000000000L

  /** Fixed iteration count for [[q61Pagerank]] — fixed (not
    * convergence-tested) so the DuckDB oracle can replay the exact
    * same rounds as a chained MATERIALIZED CTE (the kcenter recipe). */
  val PagerankIters = 5

  /** Broadcast BYTE budget for the iterative-graph joins (q61's
    * per-round rank frame, q55's closing edge set): a frame whose
    * estimated serialized size (row count × schema width) fits under
    * this takes the broadcast plan; bigger ones fall back to the
    * shuffled both-sides join instead of OOMing the driver/executors.
    * ~1 GiB is a sane ceiling for executor broadcast memory at the
    * 100-TB posture (for the 2-long graph frames this reproduces the
    * former 50M-row guard, but the budget now scales DOWN for wider
    * frames instead of silently keeping the row constant). */
  val GraphBroadcastMaxBytes = 1L << 30

  /** Row budget [[GraphBroadcastMaxBytes]] buys for `df`'s schema:
    * width is estimated from the column types' `defaultSize` (the
    * same estimate Catalyst statistics use) plus a small per-row
    * envelope. Deterministic — derived from the schema, not from
    * plan statistics, which are unreliable after checkpoints. */
  private[graft] def graphBroadcastRowBudget(df: DataFrame): Long = {
    val width = df.schema.map(_.dataType.defaultSize.toLong).sum + 8L
    GraphBroadcastMaxBytes / math.max(width, 1L)
  }

  /** Q61 — PAGERANK over the directed "bought-next" product graph
    * (edge pa→pb iff pb is the next line after pa inside some order):
    * the second member of the iterative graph family
    * (dedup_components = fixpoint closure, q61 = fixed-round
    * degree-normalized mass propagation — the shape every graph stack
    * ships as its centrality primitive).
    *
    * CROSS-ENGINE DETERMINISM: all arithmetic is BIGINT on a
    * [[PagerankScale]] fixed-point grid — contributions are
    * `rank div out_degree`, damping is `(85 · mass) div 100` — so
    * sums are order-independent and both engines land on identical
    * integers (no double accumulation anywhere). Nodes that never
    * appear in a source position (an order's last line only) are
    * genuine DANGLING nodes; their mass is one 1-row aggregate,
    * broadcast back over all nodes per round (bnlj-by-design).
    *
    * Scale shape (100 TB): the edge build is one window over
    * l_orderkey (orders are ≤ 7 lines) + one distinct exchange; the
    * per-round cost is edges⋈ranks on the source key + one partial+
    * final aggregate on the target key — the canonical 2-exchange
    * PageRank round (production would bucket both by part key to
    * drop the join exchange). Edge/degree frames materialize ONCE
    * (localCheckpoint) and every round checkpoints its rank frame —
    * without it round i's plan re-runs rounds 1..i−1 (the CC
    * discipline). Driver traffic: zero rows — even the dangling mass
    * stays in-plan as a broadcast. */
  def q61Pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankRanks(s, dir, PagerankIters)
      .orderBy(col("r").desc, col("part").asc)
      .select(col("part"), col("r").as("rank_scaled"))
      .limit(100)

  /** Full rank frame after `iters` rounds — spec-exposed so the
    * convergence direction (shrinking L1 delta per round) is
    * assertable round over round. */
  private[graft] def pagerankRanks(
      s: SparkSession, dir: String, iters: Int,
      broadcastMaxNodes: Long = -1L): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    // l_linenumber is NOT unique per order in the synthetic data — the
    // part key completes a total sort key (remaining ties are identical
    // rows, so the consecutive-pair set is permutation-invariant)
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    val edges = li
      .withColumn("pb", lead(col("l_partkey"), 1).over(w))
      .filter(col("pb").isNotNull && col("l_partkey") =!= col("pb"))
      .select(col("l_partkey").as("pa"), col("pb"))
      .distinct()
    val odeg = edges.groupBy("pa").agg(count(lit(1)).as("deg"))
    // source-side degree attached once, outside the loop — saves a
    // join per round. Lazy: the node-frame materialization right below
    // is the first consumer, so one action builds both (the CC-family
    // lazy-checkpoint discipline).
    val edgesDeg = edges.join(odeg, "pa").localCheckpoint(eager = false)
    // r20 (VERDICT r19 item 4 — fuse per-round probe work into the
    // round's one materialization): the node frame carries its dangling
    // flag (dangling ⟺ never a source position; the set is FIXED across
    // rounds), and the node/dangling counts ride the checkpoint job as a
    // CollectMetrics observation instead of separate count actions.
    val nObs = Observation()
    val nodesF = li.select(col("l_partkey").as("part")).distinct()
      .join(edgesDeg.select("pa").distinct(), col("part") === col("pa"), "left")
      .select(col("part"), col("pa").isNull.as("dang"))
      .observe(nObs, count(lit(1)).as("n"),
        coalesce(sum(when(col("dang"), lit(1L))), lit(0L)).as("ndang"))
      .localCheckpoint()
    val n = nObs.get("n").asInstanceOf[Long]
    val nDang = nObs.get("ndang").asInstanceOf[Long]
    val r0 = PagerankScale / n
    val base = (r0 * 15L) / 100L
    // the node count is already on the driver — gate the per-round
    // broadcast on it so a node set that outgrows broadcast memory
    // DEGRADES to the shuffled both-sides join instead of OOMing
    // (plan-pinned both ways in PagerankSpec). Default threshold is
    // byte-aware: the rank frame is (part: long, dang: bool, r: long),
    // so the budget is derived from that width, not a fixed row count.
    var ranks = nodesF.withColumn("r", lit(r0))
    val bcastRanks = n <= (if (broadcastMaxNodes >= 0L) broadcastMaxNodes
      else graphBroadcastRowBudget(ranks))
    // r20: the dangling mass is ONE BIGINT per round. It used to be an
    // in-plan 1-row aggregate (ranks ⋈ dangling semi → agg → broadcast →
    // crossJoin): ~4 extra AQE stage jobs per round on top of the round's
    // single real exchange. Each round's rank frame is materialized by
    // its localCheckpoint anyway, so the NEXT round's mass rides that job
    // as a CollectMetrics observation and enters the plan as a literal —
    // the sum of the SAME BIGINT ranks over the SAME node set, so the
    // integers are identical (PagerankSpec + the CTE-replay oracle pin
    // it). Driver traffic: one scalar per round — the q70/q73
    // convergence-probe posture.
    var dang = r0 * nDang
    for (_ <- 1 to iters) {
      // ranks is catalog-sized (one row per product) — BROADCAST it so
      // the edge frame never shuffles; the per-round exchange is only
      // the map-side-combined contribution partials (≤ n rows per
      // partition). A graph whose node set outgrows broadcast switches
      // to the both-sides-bucketed join — the documented q55 fallback.
      val contrib = edgesDeg
        .join(if (bcastRanks) broadcast(ranks) else ranks,
          col("pa") === col("part"))
        .select(col("pb"), expr("r div deg").as("c"))
        .groupBy("pb").agg(sum(col("c")).as("s"))
      val share = dang / n // nonneg BIGINTs: Scala / == SQL div
      val obs = Observation()
      ranks = nodesF
        .join(contrib, col("part") === col("pb"), "left")
        .select(col("part"), col("dang"),
          (lit(base) + expr(
            s"(85 * (coalesce(s, CAST(0 AS BIGINT)) + ${share}L)) div 100"))
            .as("r"))
        .observe(obs,
          coalesce(sum(when(col("dang"), col("r"))), lit(0L)).as("dm"))
        .localCheckpoint()
      dang = obs.get("dm").asInstanceOf[Long]
    }
    ranks.select(col("part"), col("r"))
  }

  /** Attribution lookback for [[q62Attribution]]: 7 days in µs. */
  val AttributionLookbackUs = 7L * 86400L * 1000000L

  /** Q62 — LAST-TOUCH ATTRIBUTION: every purchase is credited to the
    * user's most recent marketing touch (view or click) STRICTLY
    * before it and within a 7-day lookback; purchases with no
    * qualifying touch report as `none`. The canonical "which channel
    * converts" product query, and the third member of the
    * one-user-exchange family (funnel, transitions, attribution all
    * ride the SAME (user_id | ts, event_id) partitioning).
    *
    * Scale shape: ONE fact exchange — a user-partitioned window whose
    * two `last(..., ignoreNulls)` frames (touch type + touch µs,
    * guarded by the same marketing predicate, so they always read the
    * same row) resolve attribution in a single pass — then a 3-row
    * aggregate. No self-join: the textbook formulation joins purchases
    * against touches on user with a range predicate (quadratic in
    * events-per-user); the window form is linear and already ordered.
    * Lag totals stay in integer seconds (µs difference div 1e6), so
    * the cross-engine sums are exact BIGINTs. */
  def q62Attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val marketing = col("event_type").isin("view", "click")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
      // both frames in ONE select so Catalyst plans a single Window
      // operator (two withColumn calls interleave Projects that block
      // CollapseWindow — measured as two passes over the sorted run)
      .select(col("*"),
        last(when(marketing, col("event_type")), ignoreNulls = true).over(w)
          .as("t_type"),
        last(when(marketing, col("us")), ignoreNulls = true).over(w)
          .as("t_us"))
      .filter(col("event_type") === "purchase")
      .withColumn("attribution",
        when(col("t_us").isNull ||
          col("us") - col("t_us") > AttributionLookbackUs, lit("none"))
          .otherwise(col("t_type")))
      .groupBy("attribution")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attribution") === "none", lit(0L))
          .otherwise(expr("(us - t_us) div 1000000"))).as("total_lag_s"))
      .orderBy("attribution")
  }

  /** Q63 — SESSION-SCOPED FUNNEL: the q50 conversion funnel restarted
    * per session (gap > [[TtlMicros]] starts a new session — the same
    * 30-minute rule as q14/q40), reported per cohort as
    * sessions/viewed/clicked-after-view/purchased-after-click. This is
    * the batch twin of the event-time-TTL streaming funnel
    * ([[graft.streaming.StreamingFunnel.sessionStages]]): TTL eviction
    * IS session semantics, which is exactly the reference flagship's
    * point (MapWithState.java:51-393).
    *
    * Scale shape: ONE fact exchange on user_id carries everything —
    * the gap window, the session-id running sum, and the three chained
    * per-session min() windows all share it (hash-partitioning on a
    * prefix of the (user, session) keys co-locates sessions by
    * construction), then a session-level aggregate that is map-side
    * combining on the same partitioning and a ≤10-row cohort fold. */
  def q63SessionFunnel(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("us", unix_micros(col("ts")))
    val prev = lag(col("us"), 1).over(byUser)
    val wS = Window.partitionBy("user_id", "session_id")
    ev
      .withColumn("new_sess",
        when(prev.isNull || col("us") - prev > TtlMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("us"))).over(wS))
      .withColumn("tc",
        min(when(col("event_type") === "click" && col("us") > col("tv"),
          col("us"))).over(wS))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("us") > col("tc"),
          col("us"))).over(wS))
      .groupBy("user_id", "session_id")
      .agg(min(col("tv")).as("tv"), min(col("tc")).as("tc"),
        min(col("tp")).as("tp"))
      .groupBy(pmod(col("user_id"), lit(10)).cast("long").as("cohort"))
      .agg(count(lit(1)).as("n_sessions"),
        count(col("tv")).as("n_viewed"),
        count(col("tc")).as("n_clicked_after_view"),
        count(col("tp")).as("n_purchased_after_click"))
      .orderBy("cohort")
  }

  /** Trailing-window length for [[q64RollingWau]] (7 calendar days). */
  val WauWindowDays = 7

  /** Q64 — ROLLING 7-DAY ACTIVE USERS (WAU): for every calendar day in
    * the data range, how many distinct users were active in the
    * trailing [[WauWindowDays]]-day window — the dashboard metric every
    * product ships next to the retention triangle.
    *
    * Scale shape: the naive forms are a 7-pass fact scan or an
    * UNBOUNDED range self-join (activity × days); the shipped form is
    * the bounded-expansion trick — distinct (user, day) once (the only
    * fact exchange), each activity day exploded map-side to the ≤ 7
    * window days it serves, distinct (user, window_day) (rows grow a
    * FIXED 7×, never |days|×), then a per-day count. The calendar spine
    * (so zero-activity days still report) is a 1-row min/max aggregate
    * exploded and broadcast-joined — the q52 stats-broadcast pattern.
    * All day arithmetic is integer epoch-days — nothing to ulp-flip. */
  def q64RollingWau(s: SparkSession, dir: String): DataFrame = {
    val w = WauWindowDays
    // localCheckpoint: active feeds BOTH the expansion and the spine —
    // without it the fact scan + distinct exchange runs twice
    val active = Tables.events(s, dir)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"))
      .distinct()
      .localCheckpoint()
    val contrib = active
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(w - 1))).as("wday"))
      .distinct()
      .groupBy("wday").agg(count(lit(1)).as("n_active"))
    val spine = active.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("wday"))
    spine
      .join(contrib, Seq("wday"), "left")
      .select(col("wday").as("day"),
        coalesce(col("n_active"), lit(0L)).as("wau"))
      .orderBy("day")
  }

  /** The (customer, last_day, n_orders, m_cents) frame both q65 forms
    * score — ONE fact exchange on custkey, checkpointed because the
    * band path reads it four times (count, sketch, band scan,
    * assignment). */
  private[graft] def rfmPerCustomer(s: SparkSession, dir: String): DataFrame =
    // r20: Tables.spread on the orders scan was TRIED here (the scan +
    // custkey partial-agg is single-task on the one-row-group corpus)
    // and REVERTED: matched-controls fresh-JVM A/B read +0.2-0.3 s at 32
    // cores (the round-robin exchange costs more than the light partial
    // aggregate saves), an 8-core probe was a wash — and spread is a
    // no-op at real file layouts, so the change had no 100 TB upside to
    // justify the local loss.
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        expr("datediff(to_date(o_orderdate), DATE '1970-01-01')")
          .cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("m_cents"))
      .localCheckpoint()

  /** `ntile(k)` over `(metric DESC, key ASC)` for several metric
    * columns WITHOUT a global sort — the [[bandPercentilesMulti]] band
    * trick applied to quantile ASSIGNMENT. ntile's bucket b ends at
    * desc-rank `cum(b) = b·⌊n/k⌋ + min(b, n mod k)`, so a row's bucket
    * is determined by comparing its `(metric, key)` tuple against the
    * k−1 BOUNDARY tuples (the rows AT those ranks):
    *
    *  1. one t-digest per metric brackets each boundary row's metric
    *     value with `[lo, hi]` (sketch rank error ≤ n/accuracy; the
    *     ±3/accuracy fraction margin covers it — the q41 argument);
    *  2. one conditional aggregate counts rows strictly before each
    *     band in desc order (`metric > hi`);
    *  3. only band rows (≈ 6n/accuracy each) are ranked, in a window
    *     partitioned by (metric, boundary) — never a global sort;
    *  4. the boundary tuple is the band row whose absolute desc-rank
    *     (`before + band rank`) equals cum(b); bucket = 1 + #boundaries
    *     the row falls strictly after in `(metric desc, key asc)`.
    *
    * Ties are exact: the boundary is a full (metric, key) TUPLE, so
    * rows sharing the boundary metric split on key exactly as the
    * ntile's total order does (differential-spec-pinned against the
    * window form on a tie-heavy corpus). A bracket that somehow missed
    * its target rank fails LOUDLY (`assert_true` on the boundary row),
    * never a silently shifted quantile.
    *
    * `metrics` maps metric column → output bucket column; `df` must be
    * checkpointed/cached by the caller (it is scanned 3 + k times).
    * Metric columns must be NON-NULL (RFM metrics are aggregates, so
    * they are by construction): a NULL metric would be invisible to
    * the sketch/count stages but ranked by the window form — callers
    * with nullable metrics filter or coalesce first. ENFORCED: a
    * per-metric null probe rides the sizing aggregate (one action, no
    * extra scan) and fails construction loudly on any null. */
  private[graft] def ntileBandsDesc(
      df: DataFrame, key: String, metrics: Seq[(String, String)],
      k: Int, accuracy: Int = 10000): DataFrame = {
    val probeAggs = count(lit(1)).as("nn_all") +:
      metrics.zipWithIndex.map { case ((m, _), vi) => count(col(m)).as(s"nn_$vi") }
    val probe = df.agg(probeAggs.head, probeAggs.tail: _*).collect().head
    val n = probe.getLong(0)
    metrics.zipWithIndex.foreach { case ((m, _), vi) =>
      val nonNull = probe.getLong(vi + 1)
      require(nonNull == n,
        s"ntileBandsDesc: metric column '$m' has ${n - nonNull} NULL row(s) — " +
          "nulls are invisible to the sketch/count stages; filter or coalesce first")
    }
    require(n >= k, s"ntileBandsDesc: need at least k=$k rows, got $n")
    // desc-rank of the last row of bucket b, b = 1..k-1
    val cums = (1L until k.toLong).map(b => b * (n / k) + math.min(b, n % k))
    // asc-multiset fraction of the boundary row's metric value
    val fracs = cums.map { c =>
      val i = n - c
      if (n == 1) 0.0 else i.toDouble / (n - 1)
    }
    val margin = 3.0 / accuracy
    val bIdx = 1 until k
    val boundAggs = metrics.zipWithIndex.map { case ((m, _), vi) =>
      percentile_approx(col(m),
        typedLit(fracs.map(f => math.max(0.0, f - margin)) ++
          fracs.map(f => math.min(1.0, f + margin))), lit(accuracy)).as(s"bb_$vi")
    }
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
      .select(metrics.indices.flatMap { vi =>
        bIdx.map(b => element_at(col(s"bb_$vi"), b).as(s"lo_${vi}_$b")) ++
          bIdx.map(b => element_at(col(s"bb_$vi"), k - 1 + b).as(s"hi_${vi}_$b"))
      }: _*)
    val withB = df.crossJoin(broadcast(bounds))
    val beforeAggs = metrics.zipWithIndex.flatMap { case ((m, _), vi) =>
      bIdx.map(b =>
        sum(when(col(m) > col(s"hi_${vi}_$b"), 1L).otherwise(0L))
          .as(s"before_${vi}_$b"))
    }
    val befores = withB.agg(beforeAggs.head, beforeAggs.tail: _*)
    val bands = metrics.zipWithIndex.flatMap { case ((m, _), vi) =>
      bIdx.map { b =>
        withB.filter(col(m) >= col(s"lo_${vi}_$b") && col(m) <= col(s"hi_${vi}_$b"))
          .select(lit(vi).as("vi"), lit(b).as("bi"),
            col(m).as("bv"), col(key).as("bk"))
      }
    }.reduce(_ unionByName _)
    val wBand = Window.partitionBy("vi", "bi")
      .orderBy(col("bv").desc, col("bk").asc)
    val ranked = bands.withColumn("rn", row_number().over(wBand).cast("long"))
      .crossJoin(broadcast(befores))
    val bndAggs = metrics.indices.flatMap { vi =>
      bIdx.map { b =>
        max(when(col("vi") === vi && col("bi") === b &&
          col(s"before_${vi}_$b") + col("rn") === cums(b - 1),
          struct(col("bv"), col("bk")))).as(s"bnd_${vi}_$b")
      }
    }
    val bndNames = metrics.indices.flatMap(vi => bIdx.map(b => s"bnd_${vi}_$b"))
    val bnd = ranked.agg(bndAggs.head, bndAggs.tail: _*)
      // LOUD band-miss guard: assert_true throws if any boundary rank
      // fell outside its bracket; on success it returns null, keeping
      // the single row
      .filter(assert_true(
        bndNames.map(c => col(c).isNotNull).reduce(_ && _),
        lit("ntileBandsDesc: a percentile bracket missed its boundary rank")
      ).isNull)
    df.crossJoin(broadcast(bnd))
      .select(df.columns.map(col) ++ metrics.zipWithIndex.map { case ((m, out), vi) =>
        bIdx.map { b =>
          // strictly AFTER the boundary tuple in (metric desc, key asc)
          (col(m) < col(s"bnd_${vi}_${b}.bv") ||
            (col(m) === col(s"bnd_${vi}_${b}.bv") &&
              col(key) > col(s"bnd_${vi}_${b}.bk"))).cast("long")
        }.reduce(_ + _).+(lit(1L)).as(out)
      }: _*)
  }

  /** The original window-form RFM scorer — three `ntile(4)` over a
    * TOTAL order (metric desc, custkey asc). Single-partition sorts by
    * construction ("No Partition Defined"), so it is NOT the gate path
    * at the 100-TB posture; kept as the differential ORACLE the band
    * form is spec-pinned against (RfmBandSpec). */
  private[graft] def rfmSegmentsNtile(perCust: DataFrame): DataFrame = {
    val rq = Window.orderBy(col("last_day").desc, col("o_custkey").asc)
    val fq = Window.orderBy(col("n_orders").desc, col("o_custkey").asc)
    val mq = Window.orderBy(col("m_cents").desc, col("o_custkey").asc)
    perCust
      .withColumn("r_q", ntile(4).over(rq).cast("long"))
      .withColumn("f_q", ntile(4).over(fq).cast("long"))
      .withColumn("m_q", ntile(4).over(mq).cast("long"))
  }

  /** Band-form RFM scorer: [[ntileBandsDesc]] on the three metrics —
    * value-identical to [[rfmSegmentsNtile]] (spec-pinned), zero
    * single-partition sorts. */
  private[graft] def rfmSegmentsBand(perCust: DataFrame): DataFrame =
    ntileBandsDesc(perCust, "o_custkey",
      Seq(("last_day", "r_q"), ("n_orders", "f_q"), ("m_cents", "m_q")), 4)

  /** Q65 — RFM SEGMENTATION: customers scored into quartiles on
    * Recency (last order day), Frequency (order count) and Monetary
    * (lifetime cents), reported as segment sizes + segment value — the
    * classic CRM cut. Each quartile is ntile(4) over a TOTAL order
    * (metric, then custkey — the window-total-order rule), computed by
    * the [[ntileBandsDesc]] band machinery so NO single-partition sort
    * appears anywhere in the plan; money stays in exact integer cents.
    *
    * Scale shape: the fact collapses to one row per customer FIRST
    * (the only fact exchange); the quartile boundaries come from one
    * t-digest aggregate + one counting aggregate + a window over the
    * ≈6n/accuracy boundary bands (partitioned per band); assignment is
    * a broadcast comparison. At 10⁹ customers the biggest single task
    * is a band sort of ~6·10⁵ rows — vs the ntile form's three full
    * 10⁹-row single-task sorts. Final output is ≤ 64 segment rows. */
  def q65Rfm(s: SparkSession, dir: String): DataFrame =
    rfmSegmentsBand(rfmPerCustomer(s, dir))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m_cents")).as("segment_cents"))
      .orderBy("r_q", "f_q", "m_q")

  /** Fixed-point ppm scale for [[q66AssocRules]] ratios. */
  val AssocPpm = 1000000L

  /** Q66 — ASSOCIATION RULES over the co-purchase pairs: q54's top
    * pairs extended with the numbers a recommender actually ranks by —
    * support, directional confidence and lift, all as INTEGER ppm
    * (`n_ab·1e6 div n_a` etc.), so the ratios are exact BIGINTs on
    * both engines (no double division to ulp-flip).
    *
    * Scale shape: the pair counts reuse q54's one-exchange basket
    * comprehension (map-side pair generation, never a fact self-join);
    * per-item basket counts are ONE part-keyed aggregate joined twice
    * onto the 20 surviving pairs (broadcast — the pair side is tiny by
    * then); the basket total is a 1-row broadcast. */
  def q66AssocRules(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val items = d.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_item"))
    val total = d.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val pairs = q54Copurchase(s, dir)
      .select(col("pa"), col("pb"), col("n_orders").as("n_ab"))
    // the 20-row pair frame is the broadcast side of both item joins
    // (items is part-dimension-sized — never build the big side)
    val withA = items.select(col("l_partkey").as("pa"), col("n_item").as("n_a"))
      .join(broadcast(pairs), Seq("pa"))
    val withB = items.select(col("l_partkey").as("pb"), col("n_item").as("n_b"))
      .join(broadcast(withA), Seq("pb"))
    withB
      .crossJoin(broadcast(total))
      .select(col("pa"), col("pb"), col("n_ab"),
        expr(s"(n_ab * $AssocPpm) div n_baskets").as("support_ppm"),
        expr(s"(n_ab * $AssocPpm) div n_a").as("conf_ab_ppm"),
        expr(s"(n_ab * $AssocPpm) div n_b").as("conf_ba_ppm"),
        expr(s"(n_ab * n_baskets * $AssocPpm) div (n_a * n_b)").as("lift_ppm"))
      .orderBy(col("n_ab").desc, col("pa").asc, col("pb").asc)
  }

  /** Age horizon (months) reported by [[q67LtvTriangle]]. */
  val LtvHorizonMonths = 12

  /** Q67 — LTV COHORT TRIANGLE: customers grouped by first-order month
    * (integer `year·12 + month`), and for each cohort and age k (months
    * since first order, ≤ [[LtvHorizonMonths]]) the CUMULATIVE revenue
    * and per-customer LTV — the revenue sibling of the q57 retention
    * triangle, in exact integer cents (`cum_cents div cohort_size` for
    * the per-capita line — BIGINT on both engines).
    *
    * Scale shape: ONE fact exchange on custkey — the cohort month is a
    * `min() over (partition by custkey)` window, not an aggregate +
    * join-back — then a (cohort, age) aggregate (≤ months² rows) whose
    * cumulative sum and cohort sizes are window/aggregate work over the
    * tiny triangle. */
  def q67LtvTriangle(s: SparkSession, dir: String): DataFrame = {
    val wCust = Window.partitionBy("o_custkey")
    val wAge = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // collapse to (customer, age) rows on the SAME custkey exchange the
    // cohort window created, and checkpoint — sizes and the triangle
    // both read this customer-sized frame instead of re-running the
    // fact scan + window twice
    val perCustAge = Tables.orders(s, dir)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mth"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("cohort", min(col("mth")).over(wCust))
      .withColumn("age", col("mth") - col("cohort"))
      .filter(col("age") <= LtvHorizonMonths)
      .groupBy(col("o_custkey"), col("cohort"), col("age"))
      .agg(sum(col("cents")).as("cents"))
      .localCheckpoint()
    val sizes = perCustAge.select(col("cohort"), col("o_custkey")).distinct()
      .groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    perCustAge
      .groupBy(col("cohort"), col("age"))
      .agg(sum(col("cents")).as("rev_cents"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(wAge))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("age"), col("cohort_size"),
        col("cum_cents"),
        expr("cum_cents div cohort_size").as("ltv_cents_per_cust"))
      .orderBy("cohort", "age")
  }

  /** Q68 — FREQUENT TRIPLES (Apriori level 3): the co-purchase
    * analysis one itemset size deeper — top product TRIPLES bought
    * together, q54's map-side comprehension extended to ordered
    * 3-subsets. Baskets are ≤ 7 lines, so the per-order expansion is
    * bounded at C(7,3) = 35 structs — still ONE fact exchange and
    * zero self-joins, where the textbook form is a THREE-way fact
    * join. (The oracle runs that three-way join; the gate hash proves
    * the rewrite.) */
  def q68FrequentTriples(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(guardedBasket(sort_array(collect_set(col("l_partkey")))).as("parts"))
      // pre-expansion rebalance — the q55 recipe (cubic comprehension)
      .repartition(s.sparkContext.defaultParallelism)
    baskets
      .select(explode(expr(
        "flatten(transform(parts, (x, i) -> " +
          "flatten(transform(slice(parts, i + 2, size(parts)), (y, j) -> " +
          "transform(slice(parts, i + j + 3, size(parts)), " +
          "z -> struct(x AS pa, y AS pb, z AS pc))))))")).as("t"))
      .select(col("t.pa"), col("t.pb"), col("t.pc"))
      .groupBy("pa", "pb", "pc")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("pa").asc, col("pb").asc,
        col("pc").asc)
      .limit(20)
  }

  /** Q69 — TOP USER-JOURNEY PATHS: the most common 3-event SEQUENCES
    * (consecutive in a user's per-(ts, event_id) order), with each
    * path's user reach — the sequence-mining sibling of q58's
    * transition PAIRS (time-ordered journeys, where q68's triples are
    * unordered baskets). The product query behind "what do users
    * actually do before purchasing".
    *
    * Scale shape: ONE fact exchange on user_id; BOTH lead() columns
    * ride a single window pass (two leads in one select — two
    * withColumn calls would interleave Projects that block
    * CollapseWindow), then a tiny (≤ |types|³) aggregate.
    * `n_users` is an approx-free exact distinct on the already-tiny
    * path groups. Determinism: (ts, event_id) is the established
    * total per-user order (q58's contract). */
  def q69PathTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .select(col("user_id"), col("e1"),
        lead(col("e1"), 1).over(w).as("e2"),
        lead(col("e1"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc,
        col("e3").asc)
      .limit(20)
  }

  /** Peeling rounds and degree threshold for [[q70Kcore]]. Rounds are
    * FIXED, not run-to-fixpoint: peeling is monotone, so extra rounds
    * past the fixpoint are no-ops, and a fixed count is what lets both
    * engines replay the identical computation (the q61 recipe without
    * even needing convergence reasoning). The peel provably CONVERGES
    * within the 8 rounds on every gate corpus (measured with
    * [[graft.KcoreProbe]]: first stable round 6 / 4 / 7 at
    * sf0.001 / 0.01 / 0.1, min in-core degree exactly k at the
    * fixpoint — SCALE.md), and KcoreSpec asserts the fixpoint
    * UNCONDITIONALLY, so q70 is the k-core, not a truncated peel.
    * k = 30 sits below the bought-next graph's ~45 median degree but
    * above its 14-21 minimum, so peeling is REAL at every SF
    * (measured: 200→178 nodes at sf0.001, 20000→19256 at sf0.1 over
    * 8 rounds) without the total-collapse cascade a near-median
    * threshold triggers. */
  val KcoreK = 30
  val KcoreRounds = 8

  /** Q70 — K-CORE DECOMPOSITION of the bought-next graph (q61's edge
    * set, canonicalized undirected): iteratively peel nodes of degree
    * < k until (up to [[KcoreRounds]] rounds) the k-core remains — the
    * standard "dense cohesive subgraph" statistic next to q55's
    * triangles and q61's PageRank. (The all-pairs co-purchase graph is
    * unusable here: its minimum degree exceeds any interesting k, so
    * peeling would be a no-op.) Output: the surviving core's size plus
    * its top nodes by in-core degree.
    *
    * Scale shape: per round ONE degree aggregate (union of both
    * endpoint projections, map-side combined) + two semi joins back
    * onto the edge list, localCheckpoint per round (the CC/PageRank
    * iterative discipline — round i must not re-run rounds 1..i−1).
    * Degrees are exact integers; the DuckDB oracle replays all rounds
    * as a MATERIALIZED CTE chain to identical integers. */
  /** Edge frame after `rounds` peeling rounds — spec-exposed so
    * monotonicity (|E| non-increasing) and the fixpoint invariant
    * (stable ⇒ every in-core degree ≥ k) are assertable per round. */
  private[graft] def kcoreEdges(
      s: SparkSession, dir: String, rounds: Int): DataFrame = {
    var edges = boughtNextEdges(s, dir)
    // early exit once a round is a no-op: peeling is MONOTONE (edges
    // only leave), so an unchanged edge COUNT means an unchanged edge
    // SET and every remaining round would be a no-op — skipping them
    // is result-identical and saves (rounds − convergence) full
    // degree-aggregate + double-semi-join passes (convergence is
    // measured at 6/4/7 of 8 on the gate corpora — KcoreProbe). The
    // per-round count is a cached-scan on the fresh localCheckpoint.
    var n = edges.count()
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      val deg = edges.select(col("pa").as("v"))
        .unionAll(edges.select(col("pb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      // r20: the convergence count below is the round's ONE
      // materializing action, instead of three (keep job, edges job,
      // count job) each with its own planning pass — the
      // dedup-components lazy-checkpoint discipline. `keep` is not even
      // checkpointed: both semi-join builds reference the same deg
      // subtree and ReuseExchange dedupes its exchange within the
      // action (A/B at matched controls: ~0.4 s better than a lazy
      // keep checkpoint, which paid a cache round-trip for a frame
      // consumed twice in the same job).
      val keep = deg.filter(col("d") >= KcoreK).select("v")
      edges = edges
        .join(keep.withColumnRenamed("v", "pa"), Seq("pa"), "left_semi")
        .join(keep.withColumnRenamed("v", "pb"), Seq("pb"), "left_semi")
        .localCheckpoint(eager = false)
      val nn = edges.count()
      converged = nn == n
      n = nn
      round += 1
    }
    edges
  }

  def q70Kcore(s: SparkSession, dir: String): DataFrame = {
    val edges = kcoreEdges(s, dir, KcoreRounds)
    val coreDeg = edges.select(col("pa").as("v"))
      .unionAll(edges.select(col("pb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("core_deg"))
    val stats = coreDeg.agg(
      count(lit(1)).as("n_core_nodes"),
      coalesce(sum(col("core_deg")), lit(0L)).as("sum_core_deg"))
    coreDeg
      .orderBy(col("core_deg").desc, col("v").asc)
      .limit(50)
      .crossJoin(broadcast(stats))
      .select(col("v").as("part"), col("core_deg"),
        col("n_core_nodes"), col("sum_core_deg"))
      .orderBy(col("core_deg").desc, col("part").asc)
  }

  /** Q72 — STICKINESS (DAU/WAU): per day, distinct daily actives over
    * distinct trailing-[[WauWindowDays]] actives, as exact integer ppm
    * — THE canonical engagement ratio next to q64's rolling WAU (whose
    * machinery this rides: same distinct (user, day) base frame, same
    * bounded ×w explode for the trailing window, same day spine).
    *
    * Scale shape: the (user_id, day) distinct is the only fact-sized
    * exchange; dau is one map-side-combined day aggregate on it; wau
    * is q64's bounded expansion; the spine/ratio joins run on
    * day-count-sized frames (broadcast). Ratio BIGINT ppm, zero-WAU
    * days (a >w-day data gap) report 0 — never a division error. */
  def q72Stickiness(s: SparkSession, dir: String): DataFrame = {
    val w = WauWindowDays
    val active = Tables.events(s, dir)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"))
      .distinct()
      .localCheckpoint() // feeds dau + the expansion + the spine
    val dau = active.groupBy("day").agg(count(lit(1)).as("dau"))
      .select(col("day").as("dday"), col("dau"))
    val wau = active
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(w - 1))).as("wday"))
      .distinct()
      .groupBy("wday").agg(count(lit(1)).as("wau"))
    val spine = active.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("wday"))
    spine
      .join(wau, Seq("wday"), "left")
      .join(dau, col("wday") === col("dday"), "left")
      .select(col("wday").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .select(col("day"), col("dau"), col("wau"),
        expr(s"CASE WHEN wau = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE (dau * $AssocPpm) div wau END").as("stickiness_ppm"))
      .orderBy("day")
  }

  /** Top-node cap for [[q71NeighborJaccard]]: similarity pairs are
    * computed among the `JaccardTopNodes` highest-degree products
    * (ties split by id — a total order). The cap is what makes the
    * common-neighbor enumeration scale-safe: per middle vertex u the
    * pair fan-out is (deg_top(u) choose 2) ≤ (cap choose 2), and the
    * candidate-pair frame is ≤ (cap choose 2) rows TOTAL, so the plan
    * never goes all-pairs no matter how big the graph is. */
  val JaccardTopNodes = 100

  /** Q71 — RELATED PRODUCTS BY NEIGHBORHOOD JACCARD: for pairs of
    * popular products, |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over the
    * bought-next graph (q70's edge set) — the classic item-item
    * collaborative-similarity query ("customers who bought around a
    * also bought around b"), fourth member of the graph family
    * (q55 density, q61 centrality, q70 cohesion, q71 similarity).
    *
    * Scale shape: degree aggregate → top-[[JaccardTopNodes]] via
    * TakeOrderedAndProject (map-side partial top-k, never a global
    * sort) → the common-neighbor count as a self-join of the
    * top-filtered HALF-EDGE list keyed on the middle vertex u — each
    * common neighbor contributes exactly one (a < b) pair row, work
    * bounded by Σ_u (deg_top(u) choose 2) with deg_top ≤ cap. The
    * ≤ (cap choose 2)-row pair frame is then broadcast through two
    * degree joins, so the full-degree frame streams map-side. All
    * arithmetic BIGINT: jaccard is reported as exact integer ppm
    * ((ppm·c) div (da+db−c)) — the cross-engine-exact ratio discipline
    * of q66. Output: top 20 pairs by jac_ppm with the exact
    * numerator/denominator columns. */
  def q71NeighborJaccard(s: SparkSession, dir: String): DataFrame =
    neighborJaccard(boughtNextEdges(s, dir), JaccardTopNodes).limit(20)

  /** The [[q71NeighborJaccard]] core over any undirected edge list
    * (`pa < pb`, distinct, localCheckpoint'd) — exposed so the
    * random-graph fuzz spec can drive it against a brute-force model.
    * Returns ALL top-node pairs with ≥1 common neighbor, ordered
    * (jac_ppm desc, pa, pb); the gate takes the first 20. */
  private[graft] def neighborJaccard(
      edges: DataFrame, topNodes: Int): DataFrame = {
    val half = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
    val deg = half.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("v"), col("deg"))
      .localCheckpoint() // consumed 3× (top pick + two ratio joins)
    val top = deg.orderBy(col("deg").desc, col("v").asc)
      .limit(topNodes).select("v")
    val topAdj = half.join(broadcast(top), Seq("v"), "left_semi")
    val c = topAdj.as("a")
      .join(topAdj.as("b"),
        col("a.u") === col("b.u") && col("a.v") < col("b.v"))
      .select(col("a.v").as("pa"), col("b.v").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_common"))
    val withDa = deg.select(col("v").as("pa"), col("deg").as("da"))
      .join(broadcast(c), Seq("pa"))
    val withDb = deg.select(col("v").as("pb"), col("deg").as("db"))
      .join(broadcast(withDa), Seq("pb"))
    withDb.select(col("pa"), col("pb"), col("n_common"), col("da"), col("db"),
        expr(s"($AssocPpm * n_common) div (da + db - n_common)").as("jac_ppm"))
      .orderBy(col("jac_ppm").desc, col("pa").asc, col("pb").asc)
  }

  /** Max BFS depth for [[q73BfsReach]] — generous for the bought-next
    * graph's small diameter (measured: the hub's component is fully
    * reached in 2 / 3 / 4 hops at sf0.001 / 0.01 / 0.1); the loop
    * early-exits on an empty frontier, so the constant is a ceiling,
    * not a cost. */
  val BfsRounds = 6

  /** Q73 — BFS REACHABILITY PROFILE: hop distances from the graph's
    * highest-degree product (ties split by id — a total order) over
    * the undirected bought-next graph: per distance, the node count
    * and an id-sum checksum — the "how far is everything from the
    * hub" diagnostic, fifth member of the graph family (q55 density,
    * q61 centrality, q70 cohesion, q71 similarity, q73 distance).
    *
    * Scale shape: per hop ONE semi join (frontier onto the half-edge
    * list) + distinct + ONE anti join (drop already-reached) +
    * localCheckpoint — the k-core/CC iterative discipline; frontier
    * and reached sets are node-frames, never collected (only each
    * hop's 1-row count/sum aggregate lands on the driver, which the
    * early-exit check needs anyway). The DuckDB oracle replays every
    * hop as a MATERIALIZED CTE chain to identical BIGINTs. */
  def q73BfsReach(s: SparkSession, dir: String): DataFrame =
    bfsReach(boughtNextEdges(s, dir))

  /** Undirected bought-next edge list (pa < pb, distinct,
    * localCheckpoint'd) — the shared graph-family base frame
    * (q70/q71/q73 build on it; q61's directed variant differs).
    * `lead()` runs over the TOTAL (l_linenumber, l_partkey) order —
    * the window-total-order determinism rule. */
  private[graft] def boughtNextEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      .withColumn("pb0", lead(col("l_partkey"), 1).over(w))
      .filter(col("pb0").isNotNull && col("l_partkey") =!= col("pb0"))
      .select(least(col("l_partkey"), col("pb0")).as("pa"),
        greatest(col("l_partkey"), col("pb0")).as("pb"))
      .distinct()
      .localCheckpoint()
  }

  /** The [[q73BfsReach]] core over any undirected edge list (`pa < pb`,
    * distinct, localCheckpoint'd) — exposed so the random-graph fuzz
    * spec can drive it against a brute-force BFS model. */
  private[graft] def bfsReach(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    // r20: LAZY checkpoints throughout — each hop's stats() aggregate is
    // its ONE materializing action (next + whatever it references compute
    // once into cache), instead of hop-wise eager-checkpoint jobs plus a
    // separate stats job, each with its own planning pass.
    val half = edges.select(col("pa").as("u"), col("pb").as("v"))
      .unionAll(edges.select(col("pb").as("u"), col("pa").as("v")))
      .localCheckpoint(eager = false) // probed once per hop
    val seed = half.groupBy("u").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("u").asc).limit(1)
      .select(col("u").as("v"))
      .localCheckpoint(eager = false)
    val out = Seq.newBuilder[(Long, Long, Long)]
    def stats(dist: Long, frontier: DataFrame): Long = {
      val r = frontier.agg(count(lit(1)).as("n"),
        coalesce(sum(col("v")), lit(0L)).as("s")).head()
      if (r.getLong(0) > 0) out += ((dist, r.getLong(0), r.getLong(1)))
      r.getLong(0)
    }
    var frontier = seed
    var reached = seed
    stats(0L, seed)
    var dist = 1L
    var live = true
    while (live && dist <= BfsRounds) {
      val next = half
        .join(frontier.withColumnRenamed("v", "u"), Seq("u"), "left_semi")
        .select(col("v")).distinct()
        .join(reached, Seq("v"), "left_anti")
        .localCheckpoint(eager = false)
      live = stats(dist, next) > 0
      if (live) {
        frontier = next
        // plain union of already-cached hop frames: the anti join reads
        // each cached leg; re-checkpointing the union was one more job +
        // planning pass per hop for a frame only ever consumed once
        reached = reached.unionAll(next)
        dist += 1
      }
    }
    val sess = s
    import sess.implicits._
    out.result().toDF("dist", "n_nodes", "sum_v").orderBy("dist")
  }

  /** User-sampling modulus for [[q74GapFill]] — keeps a real user
    * subset at every gate SF (15 users at sf0.001) while bounding the
    * spine to |users|/5 × |days| rows. */
  val GapFillUserMod = 5

  /** Per-(user, day) closing metric value — the shared base frame of
    * the daily-snapshot family ([[q74GapFill]], [[q75Ewma]]).
    *
    * The close is a packed `max(struct(us, event_id, cents))` argmax:
    * (us, event_id) is a TOTAL order and struct comparison is
    * lexicographic on both engines, so the winner is cross-engine
    * deterministic; values are exact integer cents (generator emits
    * `value ≥ 0`, so cents are non-negative — [[q75Ewma]] relies on
    * this for trunc-vs-floor division agreement).
    *
    * `userMod = 1` keeps every user (no filter in the plan); larger
    * moduli sample `user_id % userMod = 0` — q74 uses
    * [[GapFillUserMod]] to bound its calendar-spine explode. */
  private def dailyCloseCents(s: SparkSession, dir: String,
      userMod: Int): DataFrame = {
    val base = Tables.events(s, dir)
    val ev = (if (userMod == 1) base
              else base.filter(pmod(col("user_id"), lit(userMod)) === 0))
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    ev.groupBy("user_id", "day")
      .agg(max(struct(col("us"), col("event_id"), col("cents"))).as("w"))
      .select(col("user_id"), col("day"), col("w.cents").as("close_cents"))
  }

  /** Q74 — CALENDAR GAP-FILL / FORWARD-FILL: per user, the daily
    * closing metric value carried forward over the full calendar spine
    * — the daily-feature-snapshot build every feature store runs
    * (batch side of the live-profile family; observed days flagged).
    *
    * Determinism shape: the per-(user, day) closing value is a packed
    * `max(struct(us, event_id, cents))` argmax — (us, event_id) is a
    * TOTAL order, and struct comparison is lexicographic on both
    * engines (verified against DuckDB struct max). Values are exact
    * integer cents; the fill is `last(…, ignoreNulls)` over the
    * user-partitioned day order — no floats anywhere.
    *
    * Scale shape: one (user, day) aggregate exchange + one user
    * exchange for the fill window; the spine explode is bounded by
    * |users| × |days| and never touches event payloads; days before a
    * user's first observation drop (no value to carry). */
  def q74GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCloseCents(s, dir, GapFillUserMod)
      .localCheckpoint() // feeds the spine bounds, the user set, and the fill join
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wFill = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_cents",
        last(col("close_cents"), ignoreNulls = true).over(wFill))
      .filter(col("filled_cents").isNotNull)
      .select(col("user_id"), col("day"), col("filled_cents"),
        when(col("close_cents").isNotNull, 1L).otherwise(0L).as("observed"))
      .orderBy("user_id", "day")
  }

  /** EWMA smoothing factor α = EwmaNum/EwmaDen = 0.2 — the recurrence
    * `s' = (EwmaNum·c + (EwmaDen−EwmaNum)·s) div EwmaDen` stays in
    * BIGINT fixed-point, so every step is cross-engine exact. */
  val EwmaNum  = 1
  val EwmaDen  = 5

  /** Deviation threshold for [[q75Ewma]]'s anomaly flag, in ppm of the
    * previous smoothed value: 1.5× jumps flag (~p88 of the per-day
    * deviation distribution on the gate corpora — a genuine 0/1 mix at
    * every SF, probed via DuckDB before the gate was pinned). */
  val EwmaAnomalyPpm = 1500000L

  /** Q75 — EWMA FEATURE SMOOTHING + BAND ANOMALY: per user, the daily
    * closing value exponentially smoothed (α = 0.2) over that user's
    * observed-day sequence, with days whose close deviates > 1.5×
    * from the running smooth flagged — the classic feature-store
    * "smoothed metric + spike detector" pair ([[q59AnomalyMad]]'s
    * robust-statistics sibling, on the [[dailyCloseCents]] base frame
    * the gap-fill snapshot family shares).
    *
    * Determinism shape: the recurrence is a SEQUENTIAL fold —
    * `s₀ = c₀; sₜ = (cₜ + 4·sₜ₋₁) div 5` — in BIGINT fixed-point over
    * a provably total per-user order (day is unique per user after
    * the close aggregate), so Spark's `aggregate()` fold and DuckDB's
    * recursive-CTE replay produce bit-identical trajectories. Closes
    * are non-negative (generator invariant, see [[dailyCloseCents]]),
    * so every intermediate stays non-negative and Spark's
    * truncating `div` equals DuckDB's flooring `//` throughout —
    * including the ppm deviation, whose numerator is an abs().
    *
    * Scale shape: a non-linear floored recurrence has no window-
    * algebra form — the fold is irreducible. It runs over per-user
    * ARRAYS bounded by the CALENDAR (≤ |days| entries regardless of
    * event volume — 100 TB of events still folds ≤ 365·years steps
    * per user per year of data), built by one (user, day) aggregate
    * exchange + one user exchange; the trailing lag() window reuses
    * the user partitioning (no extra exchange). Event payloads never
    * enter the fold. */
  def q75Ewma(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCloseCents(s, dir, 1)
    val perUser = daily.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("day"), col("close_cents"))))
        .as("seq"))
    val traj = perUser.select(col("user_id"), explode(expr(
      s"""aggregate(seq,
         |  CAST(array() AS ARRAY<STRUCT<day: BIGINT, close_cents: BIGINT,
         |                               ewma_cents: BIGINT>>),
         |  (acc, x) -> concat(acc, array(named_struct(
         |    'day', x.day, 'close_cents', x.close_cents,
         |    'ewma_cents', CASE WHEN size(acc) = 0 THEN x.close_cents
         |      ELSE ($EwmaNum * x.close_cents
         |            + ${EwmaDen - EwmaNum} * element_at(acc, -1).ewma_cents)
         |           div $EwmaDen END))))""".stripMargin)).as("t"))
      .select(col("user_id"), col("t.day").as("day"),
        col("t.close_cents").as("close_cents"),
        col("t.ewma_cents").as("ewma_cents"))
    val wu = Window.partitionBy("user_id").orderBy("day")
    traj
      .select(col("user_id"), col("day"), col("close_cents"),
        col("ewma_cents"), lag(col("ewma_cents"), 1).over(wu).as("prev"))
      .select(col("user_id"), col("day"), col("close_cents"),
        col("ewma_cents"),
        when(col("prev").isNotNull &&
          expr(s"abs(close_cents - prev) * 1000000L div greatest(prev, 1L)")
            > EwmaAnomalyPpm, 1L).otherwise(0L).as("anomaly"))
      .orderBy("user_id", "day")
  }

  /** Q76 — INTER-ARRIVAL GAP PERCENTILES: per event type, the exact
    * p50/p90/p99 of the time since the user's PREVIOUS action (any
    * type) — the churn/engagement-cadence signal ("how long do users
    * idle before a purchase?"). The lag runs over the provably total
    * per-user order (us, event_id); gaps are µs BIGINTs cast to double
    * AND re-united to seconds before interpolating (the round-6 rule:
    * µs gaps are ~1e11, where quantile interpolation's last-bit IEEE
    * divergence between the two engines' formulas exceeds the 1e-6
    * rounding grain — at seconds magnitude round-6 clears it; both
    * engines divide the exact-in-double integer gap by the same 1e6
    * literal), and the percentile machinery is the sort-based
    * [[sortedPercentilesMulti]] — no built-in percentile() value map.
    *
    * Scale shape: one user_id exchange for the lag window, then the
    * percentile machinery's one event_type exchange; event payloads
    * never move (3 columns). Per-group parallelism is bounded by the
    * type count — right for this profile-shaped output; giant-group
    * escape is the band machinery (see sortedPercentilesMulti note). */
  def q76Interarrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .select(col("event_type"),
        ((col("us") - lag(col("us"), 1).over(w)).cast("double") /
          lit(1000000.0)).as("gap_s"))
      .filter(col("gap_s").isNotNull)
    sortedPercentilesMulti(gaps, "event_type", Seq(
      "gap_s" -> Seq(("p50_gap", 0.5), ("p90_gap", 0.9), ("p99_gap", 0.99))))
      .select(col("event_type"),
        round(col("p50_gap"), 6).as("p50_gap_s"),
        round(col("p90_gap"), 6).as("p90_gap_s"),
        round(col("p99_gap"), 6).as("p99_gap_s"))
      .orderBy("event_type")
  }

  /** Bayesian m-estimate weight for [[q77TargetEncode]]'s smoothed
    * column: the encoded mean is pulled toward the global prior by
    * `m` virtual prior-valued observations. */
  val TargetEncodeM = 10L

  /** Q77 — LEAVE-ONE-OUT TARGET ENCODING: the categorical-feature
    * encoder every tabular-ML training pipeline runs — each event's
    * `event_type` is replaced by the mean target (cents) of all OTHER
    * events of that type, so a row never leaks its own label into its
    * feature. Two forms: plain LOO `(Σ−x) div (n−1)` and the
    * m-estimate smoothed `(Σ−x+m·prior) div (n−1+m)` (prior = global
    * mean), both in BIGINT cents fixed-point — the generator emits
    * `value ≥ 0`, so every numerator is non-negative and Spark's
    * truncating div equals DuckDB's flooring `//` throughout.
    *
    * Scale shape: the per-category statistics frame is |categories|
    * rows and BROADCASTS; the 1-row global prior rides a by-design
    * broadcast cross join (PlanGuardSpec allowlist). The fact table is
    * touched once at scan speed — encoding 100 TB is a map stage. */
  def q77TargetEncode(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val stats = ev.groupBy("event_type")
      .agg(sum(col("cents")).as("t_sum"), count(lit(1)).as("t_n"))
    val prior = ev.agg(
      expr("sum(cents) div count(1)").as("prior_cents"))
    ev.join(broadcast(stats), "event_type")
      .crossJoin(broadcast(prior))
      .select(col("event_id"), col("event_type"), col("cents"),
        col("prior_cents"),
        expr("CASE WHEN t_n > 1 THEN (t_sum - cents) div (t_n - 1) " +
          "ELSE prior_cents END").as("loo_cents"),
        expr(s"(t_sum - cents + $TargetEncodeM * prior_cents) " +
          s"div (t_n - 1 + $TargetEncodeM)").as("loo_smooth_cents"))
      .orderBy("event_id")
  }

  /** Bin count for [[q78QuantileBins]] — decile discretization. */
  val QuantileBinCount = 10

  /** Q78 — QUANTILE DISCRETIZATION (KBinsDiscretizer): per event type,
    * the 9 decile boundaries of the cents distribution selected by
    * EXACT RANK (the r-th smallest value at r = (n·k) div 10 — type-1
    * quantiles, so boundaries are actual BIGINT data values, never
    * interpolated floats), then every event assigned its decile by
    * counting boundaries strictly below it. Rank→value selection is
    * tie-proof across engines: whatever permutation equal values take,
    * position r of the sorted multiset holds the same value.
    *
    * Scale shape: ONE per-type rank window (the q28 percentile sort —
    * spills like any sort; the band machinery is the giant-group
    * escape, see [[ntileBandsDesc]]), a 9-row-per-type boundary frame
    * that BROADCASTS, and a scan-speed HOF assignment — the fact never
    * shuffles for the encode itself. */
  /** Decile boundaries of `ev`'s cents per event_type, one row per
    * type with the sorted (k, b) boundary array — exact-rank type-1
    * quantiles (see [[q78QuantileBins]]); shared by the binning gate
    * and the drift monitor (which freezes bounds on its REFERENCE
    * half). Expects columns (event_id, event_type, cents). */
  private[graft] def decileBoundsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val targets = counts.select(col("event_type"), col("n"),
      explode(expr(s"sequence(1, ${QuantileBinCount - 1})")).as("k"))
      .select(col("event_type"), col("k"),
        expr(s"(n * k) div $QuantileBinCount").as("target_rn"))
    ev.withColumn("rn", row_number().over(w).cast("long")).as("r")
      .join(broadcast(targets.as("t")),
        col("r.event_type") === col("t.event_type") &&
          col("r.rn") === col("t.target_rn"))
      .select(col("r.event_type").as("event_type"), col("t.k").as("k"),
        col("r.cents").as("b"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("k"), col("b")))).as("bs"))
  }

  /** Bin-assignment column over a broadcast `bs` boundary array:
    * 1 + |{boundaries strictly below cents}|. */
  private[graft] def binOf: Column =
    lit(1L) + expr("size(filter(bs, x -> cents > x.b))")

  /** One chi-square cell `(o−e)²·1e6 div max(e,1)` as WRAP-FREE BIGINT
    * algebra via the split-division identity
    * `(d² div den)·1e6 + ((d² mod den)·1e6) div den` — exact for
    * non-negative d² and positive den (floor and truncating division
    * agree there), and numerically identical to the naive product form
    * wherever that form doesn't wrap. The naive `d²·1e6` silently
    * wraps signed 64-bit once |o−e| exceeds ~3.03e6 — a deviation a
    * divergent arm in a 100M-user experiment reaches; the split form's
    * intermediates are bounded by d² and den·1e6, so it is exact up to
    * |o−e| ≈ 3.03e9 and den ≤ 9.2e12 (beyond any 2×2 margin or
    * per-(type, bin) count a real corpus produces; past THAT the cell
    * VALUE itself exceeds 64 bits and no integer encoding helps). */
  private[graft] def chisqCellPpm(o: Long, e: Long): Long = {
    val d = o - e
    val d2 = d * d
    val den = math.max(e, 1L)
    (d2 / den) * 1000000L + (d2 % den) * 1000000L / den
  }

  /** [[chisqCellPpm]] in SQL, dialect-parameterized (`div` for Spark,
    * `//` for DuckDB) — ONE generator so the batch gates, the DuckDB
    * oracles, and the streaming driver helper stay in algebraic
    * lockstep (the q79/q81/StreamingDrift/StreamingAb contract). */
  private[graft] def chisqCellSql(o: String, e: String, idiv: String): String = {
    val d2 = s"(($o - $e) * ($o - $e))"
    val den = s"greatest($e, 1)"
    s"((($d2 $idiv $den) * 1000000) + ((($d2 % $den) * 1000000) $idiv $den))"
  }

  def q78QuantileBins(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    ev.join(broadcast(decileBoundsOf(ev)), "event_type")
      .select(col("event_id"), col("event_type"), col("cents"),
        binOf.as("bin"))
      .orderBy("event_id")
  }

  /** Q79 — FEATURE DRIFT (two-sample chi-square): the monitor every
    * deployed model needs — per event type, the cents distribution of
    * the LIVE half of the time range tested against the REFERENCE
    * (first) half over decile bins FROZEN on the reference (the
    * production shape: training-time bins, serving-time traffic).
    * The statistic is exact scaled-integer chi-square:
    * `e_i = (L·r_i) div R`, `chisq_ppm = Σ ((o_i−e_i)²·1e6) div
    * max(e_i, 1)` — all BIGINT, so the gate hash-matches (no ln(), no
    * float division; PSI's logarithm is the cross-engine-fragile
    * choice this deliberately avoids).
    *
    * Scale shape: the split point is a 1-row min/max aggregate
    * (by-design broadcast cross join, PlanGuard allowlist); the
    * boundary build ranks only the reference half (q28 sort shape);
    * both halves then bin at scan speed against the broadcast bounds
    * and collapse map-side onto ≤ 10·|types| count rows. Overflow
    * headroom: the cells use [[chisqCellSql]]'s split-division form,
    * wrap-free to |o−e| ≈ 3.03e9 per (type, bin) — any real corpus. */
  def q79DriftChisq(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val split = ev.crossJoin(broadcast(mid))
    val ref = split.filter(col("day") <= col("mid"))
    val live = split.filter(col("day") > col("mid"))
    val bnds = decileBoundsOf(
      ref.select(col("event_id"), col("event_type"), col("cents")))
    def binned(half: DataFrame): DataFrame = half
      .join(broadcast(bnds), "event_type")
      .select(col("event_type"), binOf.as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    val r = binned(ref).withColumnRenamed("c", "r_c")
    val o = binned(live).withColumnRenamed("c", "o_c")
    val totals = r.groupBy("event_type").agg(sum(col("r_c")).as("R"))
      .join(o.groupBy("event_type").agg(sum(col("o_c")).as("L")), "event_type")
    r.join(o, Seq("event_type", "bin"), "full_outer")
      .select(col("event_type"), col("bin"),
        coalesce(col("r_c"), lit(0L)).as("r_c"),
        coalesce(col("o_c"), lit(0L)).as("o_c"))
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("r_c"), col("o_c"), col("R"), col("L"),
        expr("(L * r_c) div R").as("e"))
      .groupBy("event_type")
      .agg(max(col("R")).as("n_ref"), max(col("L")).as("n_live"),
        sum(expr(chisqCellSql("o_c", "e", "div"))).as("chisq_ppm"))
      .orderBy("event_type")
  }

  /** Q81 — A/B EXPERIMENT ANALYSIS: users hash-assigned to two arms
    * (salted portable hash — the real practice: assignment must be
    * sticky, uniform, and independent of other experiments, which
    * `user_id % 2` is not), outcome = converted (≥ [[AbConvertPurchases]]
    * purchases — a median-straddling bar on the gate corpora, so both
    * outcome classes are populated at every SF; ≥ 1 was degenerate:
    * every synthetic user purchases), and
    * the 2×2 contingency tested with the exact scaled-integer
    * chi-square (margins → `e = (rowT·colT) div N`, the q79
    * discipline — no normal approximation, no sqrt, no floats).
    * Output is ONE row: arm sizes, conversions, per-arm conversion ppm
    * and the statistic (1 dof; 3.84e6 ppm ≈ p=0.05).
    *
    * Scale shape: one user-keyed aggregate (map-side combined) folds
    * the fact to |users| rows; everything after is a single
    * conditional aggregate to ONE row. At 100 TB the analysis is the
    * same two exchanges. */
  val AbConvertPurchases = 14L

  def q81AbChisq(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.h32
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= AbConvertPurchases, 1L).otherwise(0L)
        .as("converted"))
      .select(pmod(h32(concat(lit("exp1|"), col("user_id"))), lit(2L))
        .as("arm"), col("converted"))
    perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      // expected cells from the margins: e = (rowT · colT) div N
      .selectExpr("n_a", "n_b", "conv_a", "conv_b",
        "(n_a * (conv_a + conv_b)) div (n_a + n_b) AS e_ac",
        "(n_a * ((n_a - conv_a) + (n_b - conv_b))) div (n_a + n_b) AS e_an",
        "(n_b * (conv_a + conv_b)) div (n_a + n_b) AS e_bc",
        "(n_b * ((n_a - conv_a) + (n_b - conv_b))) div (n_a + n_b) AS e_bn")
      .selectExpr("n_a", "n_b", "conv_a", "conv_b",
        "(conv_a * 1000000) div n_a AS conv_a_ppm",
        "(conv_b * 1000000) div n_b AS conv_b_ppm",
        s"""${chisqCellSql("conv_a", "e_ac", "div")}
           | + ${chisqCellSql("(n_a - conv_a)", "e_an", "div")}
           | + ${chisqCellSql("conv_b", "e_bc", "div")}
           | + ${chisqCellSql("(n_b - conv_b)", "e_bn", "div")}
           | AS chisq_ppm""".stripMargin)
  }

  /** Q82 — SURVIVAL / LIFETIME TABLE (Kaplan-Meier event table,
    * integer-exact): per user the observed lifetime in days
    * (last activity − first activity), then for each observed lifetime
    * k the at-risk count (users with lifetime ≥ k), the ending count
    * (lifetime = k exactly), and the survival fraction after k as
    * exact BIGINT ppm `(n_risk − n_end)·1e6 div n_users` — no
    * censoring in a closed window, so the KM product collapses to this
    * closed form (a Π of (1−dⱼ/nⱼ) in floats would be the
    * cross-engine-fragile choice; the ratio-of-counts form is the same
    * curve, hash-exact).
    *
    * Scale shape: ONE user-keyed aggregate (map-side combined) folds
    * the fact to |users| rows; the lifetime histogram is ≤ |days|
    * rows; the reverse-cumulative at-risk window runs over that tiny
    * frame. At 100 TB the analysis is one exchange + toy-frame
    * windows, the q81 discipline. */
  def q82Survival(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(s, dir)
      .select(col("user_id"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"))
      .groupBy("user_id")
      .agg((max(col("day")) - min(col("day"))).as("lifetime"))
    val hist = life.groupBy("lifetime").agg(count(lit(1)).as("n_end"))
    // tiny frame: the unpartitioned windows run over ≤ |distinct
    // lifetimes| rows, never the fact (structurally whitelisted in
    // PlanGuardSpec's global-window guard; partitionBy(lit(1)) would
    // not survive Spark 4's EliminateWindowPartitions)
    val wRisk = Window.orderBy(col("lifetime").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTotal = Window.partitionBy(lit(1))
    hist
      .withColumn("n_risk", sum(col("n_end")).over(wRisk))
      .withColumn("n_users", sum(col("n_end")).over(wTotal))
      .select(col("lifetime"), col("n_risk"), col("n_end"),
        expr("((n_risk - n_end) * 1000000) div n_users").as("surv_ppm"))
      .orderBy("lifetime")
  }

  /** Q83 — TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT (binning-free
    * complement to q79's chi-square): per event type, the reference
    * (first) and live (second) halves' cents distributions compared by
    * the maximum scaled-CDF gap
    * `D_ppm = max_v |cum_ref(v)·1e6 div n_ref − cum_live(v)·1e6 div
    * n_live|` — counts and floor divisions only, so the statistic is
    * hash-exact where a float CDF would drift between engines. KS
    * needs no frozen bins, so it catches shape changes chi-square's
    * decile binning can wash out (3.84e6 ppm is NOT the KS critical
    * value — use c(α)·sqrt((n+m)/nm) offline).
    *
    * Scale shape: one (type, cents) aggregate folds the fact (map-side
    * combined: |type|·|distinct cents| rows out); the CDF windows run
    * per type over that folded frame — the q78 rank-machinery cost, on
    * a smaller frame. The split point is the q79 1-row broadcast. */
  /** The shared reference/live VALUE FOLD of the binning-free drift
    * family (q83 KS, q84 U/AUC, and the composed panel): one
    * map-side-combined (event_type, cents) aggregate with per-half
    * counts, split on the q79 one-row broadcast midpoint. At 100 TB
    * this is ONE scan of the fact collapsing to |type|·|distinct
    * cents| rows — every statistic below it runs on the folded frame. */
  private[graft] def typeCentsSplitFold(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    ev.crossJoin(broadcast(mid))
      .groupBy(col("event_type"), col("cents"))
      .agg(
        sum(when(col("day") <= col("mid"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("day") > col("mid"), 1L).otherwise(0L)).as("c_live"))
  }

  def q83KsTest(s: SparkSession, dir: String): DataFrame =
    ksOf(typeCentsSplitFold(s, dir))

  /** KS over an already-folded (event_type, cents, c_ref, c_live)
    * frame. */
  private[graft] def ksOf(fold: DataFrame): DataFrame = {
    // distinct cents per type after the groupBy → the CDF window's
    // (cents) order is total within a type
    val wCdf = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("event_type")
    fold
      .withColumn("cum_ref", sum(col("c_ref")).over(wCdf))
      .withColumn("cum_live", sum(col("c_live")).over(wCdf))
      .withColumn("n_ref", sum(col("c_ref")).over(wTot))
      .withColumn("n_live", sum(col("c_live")).over(wTot))
      .select(col("event_type"), col("n_ref"), col("n_live"),
        abs(expr("(cum_ref * 1000000) div greatest(n_ref, 1)") -
          expr("(cum_live * 1000000) div greatest(n_live, 1)")).as("d"))
      .groupBy("event_type")
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_live")).as("n_live"),
        max(col("d")).as("ks_ppm"))
      .orderBy("event_type")
  }

  /** Q84 — MANN–WHITNEY RANK-SUM / AUC (nonparametric effect size,
    * integer-exact): per event type, the reference (first) and live
    * (second) halves' cents distributions compared by the U statistic
    * over DOUBLED midranks — a tied group spanning combined ranks
    * [a, b] has 2·midrank = a + b = 2·cum_le − n_v + 1, an integer, so
    * the whole computation stays BIGINT where textbook average ranks
    * are floats (the q79/q83 discipline; this is the third member of
    * the drift-test family: chi-square for frozen-bin composition, KS
    * for CDF shape, U for stochastic dominance). `auc_ppm` =
    * `u_live_x2·1e6 div (2·n_ref·n_live)` (split-division form, the
    * [[chisqCellPpm]] wrap rule) is the common-language effect size
    * P(live > ref) + ½·P(live = ref) — the probability a random live
    * value exceeds a random reference value, the number an experiment
    * dashboard actually wants next to its p-value; 500000 ppm = no
    * shift. Normal-approximate significance from U offline; overflow
    * headroom: r_live_x2 ≲ 2N² needs N ≲ 2e9 rows per type, and the
    * ppm remainder needs n_ref·n_live ≲ 4.6e12 — beyond that, sample
    * or rescale (documented, as in q83).
    *
    * Scale shape: identical to q83 — one map-side-combined
    * (type, cents) fold, per-type windows over the folded frame, a
    * 1-row broadcast split point. */
  def q84MannWhitney(s: SparkSession, dir: String): DataFrame =
    aucOf(typeCentsSplitFold(s, dir))

  /** Q85 — CORRELATED SCALAR SUBQUERY, DECORRELATED (the TPC-H Q17
    * shape): revenue sitting in "small orders" — lineitems whose
    * quantity is under 20% of their PART's average quantity, rolled up
    * by brand. [[q48SmallQtyRevenue]] computes the SAME Q17 algebra
    * (qty·5·cnt < sum threshold, per-brand rollup) against a
    * pre-decorrelated oracle, and [[q52IdleCapital]] covered the
    * UNCORRELATED scalar aggregate; this gate's delta over q48 is the
    * ORACLE FORM — its DuckDB SQL is the textbook CORRELATED
    * subquery, so the gate pins that the declared decorrelation below
    * is row-identical to the correlated formulation an engine must
    * decorrelate itself. The textbook form re-evaluates a per-part
    * aggregate for every outer
    * row — a re-scan per row at 100 TB unless the planner decorrelates.
    * Here the decorrelation is DECLARED: ONE aggregate over the fact
    * on l_partkey, joined back on that same key. The threshold
    * compares in cross-multiplied integer cents
    * (qty_c·5·cnt < sum_c ⇔ qty < 0.2·avg), so no double division can
    * flip a boundary row in either engine.
    *
    * Scale shape: two passes over the fact (the aggregate, the probe),
    * one hash exchange each on l_partkey; the per-part frame is
    * |parts| rows — AQE broadcasts it at test SF, and at a 1.5B-part
    * 100 TB it degrades to the co-partitioned SMJ both sides already
    * have the partitioning for (which is why it is NOT hard-broadcast
    * here); the brand dim broadcasts. */
  def q85SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_partkey"),
      round(col("l_quantity") * 100).cast("long").as("qty_c"),
      round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum(col("qty_c")).as("sum_c"), count(lit(1)).as("cnt"))
    val brands = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    li.join(perPart, Seq("l_partkey"))
      .filter(col("qty_c") * lit(5L) * col("cnt") < col("sum_c"))
      .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        (sum(col("price_c")).cast("double") / 100.0).as("lost_revenue"))
      .orderBy("p_brand")
  }

  /** U/AUC over an already-folded (event_type, cents, c_ref, c_live)
    * frame. */
  private[graft] def aucOf(fold: DataFrame): DataFrame = {
    val wCdf = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("event_type")
    fold
      // both window columns in ONE select (CollapseWindow discipline)
      .select(col("event_type"), col("c_ref"), col("c_live"),
        sum(col("c_ref") + col("c_live")).over(wCdf).as("cum_le"),
        sum(col("c_ref")).over(wTot).as("n_ref"),
        sum(col("c_live")).over(wTot).as("n_live"))
      .groupBy("event_type")
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_live")).as("n_live"),
        // Σ over distinct values: live count × doubled midrank
        sum(expr("c_live * (2 * cum_le - (c_ref + c_live) + 1)"))
          .as("r_live_x2"))
      .selectExpr("event_type", "n_ref", "n_live",
        "r_live_x2 - n_live * (n_live + 1) AS u_live_x2")
      .selectExpr("event_type", "n_ref", "n_live", "u_live_x2",
        """CASE WHEN n_ref = 0 OR n_live = 0 THEN NULL ELSE
          |  (u_live_x2 div (2 * n_ref * n_live)) * 1000000
          |    + ((u_live_x2 % (2 * n_ref * n_live)) * 1000000)
          |      div (2 * n_ref * n_live) END AS auc_ppm""".stripMargin)
      .orderBy("event_type")
  }

  /** REPORT — DRIFT PANEL: the whole drift-test family as ONE frame
    * per event type — chi-square over frozen decile bins (composition
    * shift), KS (CDF shape), and U/AUC (stochastic dominance + effect
    * size) — the monitoring card a deployed model's dashboard actually
    * renders, composed from the SAME pieces the individual gates pin
    * (the curation_pipeline fusion discipline: compose, don't
    * re-derive).
    *
    * Scale shape: the binning-free pair (KS, AUC) shares ONE
    * [[typeCentsSplitFold]] corpus scan — the folded frame is
    * |type|·|distinct cents| rows, localCheckpointed so its two
    * statistic branches never re-scan the fact; the chi-square side is
    * the q79 plan (its decile-bound machinery needs the raw ref half's
    * event ranks, not just value counts). Two fact scans total for
    * three statistics; the final joins carry |type| rows. */
  def reportDriftPanel(s: SparkSession, dir: String): DataFrame = {
    val fold = typeCentsSplitFold(s, dir).localCheckpoint()
    val ks = ksOf(fold)
      .select(col("event_type"), col("n_ref"), col("n_live"), col("ks_ppm"))
    val auc = aucOf(fold)
      .select(col("event_type"), col("u_live_x2"), col("auc_ppm"))
    val chi = chisqOfFold(fold).select(col("event_type"), col("chisq_ppm"))
    ks.join(auc, "event_type").join(chi, "event_type")
      .orderBy("event_type")
  }

  /** q79's chi-square derived from the FOLDED frame instead of a second
    * event-level pass — the observation the streaming panel already
    * proves (one value histogram subsumes the bins): a value v's bin is
    * `1 + #{k : 1 ≤ (n·k) div 10 ≤ cum_ref(v) − c_ref(v)}`, because the
    * k-th decile bound sits strictly below v exactly when its rank
    * target is covered by the ref mass BEFORE v. Identical integers to
    * [[q79DriftChisq]] (the ReportSpec composition test pins it); the
    * type-drop rules match too (needs ≥1 bound ⟺ (n·9) div 10 ≥ 1, ≥1
    * ref and ≥1 live event — q79's inner joins). With this, the whole
    * three-statistic panel is ONE corpus scan + bounded-frame algebra. */
  private def chisqOfFold(fold: DataFrame): DataFrame = {
    val wCdf = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("event_type")
    val binned = fold
      .select(col("event_type"), col("c_ref"), col("c_live"),
        (sum(col("c_ref")).over(wCdf) - col("c_ref")).as("cumprev"),
        sum(col("c_ref")).over(wTot).as("nr"),
        sum(col("c_live")).over(wTot).as("nl"))
      .filter(expr(s"(nr * ${QuantileBinCount - 1}) div $QuantileBinCount >= 1") &&
        col("nl") >= 1L)
      .withColumn("bin", lit(1L) + (1 to QuantileBinCount - 1).map(k =>
          when(expr(s"(nr * $k) div $QuantileBinCount") >= 1L &&
            expr(s"(nr * $k) div $QuantileBinCount") <= col("cumprev"), 1L)
            .otherwise(0L))
        .reduce(_ + _))
    binned
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("c_ref")).as("r_c"), sum(col("c_live")).as("o_c"),
        max(col("nr")).as("R"), max(col("nl")).as("L"))
      .select(col("event_type"), col("r_c"), col("o_c"), col("R"), col("L"),
        expr("(L * r_c) div R").as("e"))
      .groupBy("event_type")
      .agg(max(col("R")).as("n_ref"), max(col("L")).as("n_live"),
        sum(expr(chisqCellSql("o_c", "e", "div"))).as("chisq_ppm"))
      .orderBy("event_type")
  }

  /** Motifs for [[q80SequenceMotifs]], as event-type-initial strings
    * (types have distinct initials: c/e/p/s/v): the conversion path
    * view→click→purchase, the friction pair click→error, and repeat
    * browsing view→view. */
  val SequenceMotifs = Seq("vcp", "ce", "vv")

  /** Q80 — SEQUENCE MOTIF MINING: per user, the full event-type
    * sequence (one initial per event, ordered by the provably total
    * (us, event_id)), scanned for behavioral motifs; output is the
    * per-motif reach (users with ≥ 1 hit) and total occurrence count.
    * Counting is the exact string algebra
    * `(len(s) − len(replace(s, m, ''))) div len(m)` — leftmost
    * non-overlapping occurrences, identical semantics in both engines,
    * zero regex (cross-engine regex dialects are the fragile choice
    * this avoids).
    *
    * Scale shape: ONE user exchange builds the sequences (map-side
    * partial collect_list); motif scans are per-row string ops at scan
    * speed over |users| rows; the final aggregate is 1 row stacked to
    * |motifs|. Sequence length is bounded by per-user activity, never
    * corpus size. */
  def q80SequenceMotifs(s: SparkSession, dir: String): DataFrame = {
    val seqs = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ini"))
      .groupBy("user_id")
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(us, event_id, ini))), x -> x.ini)"),
        "").as("sq"))
    val occCols = SequenceMotifs.map { m =>
      expr(s"(length(sq) - length(replace(sq, '$m', ''))) div ${m.length}")
        .as(s"occ_$m")
    }
    val agg = seqs.select(occCols: _*).agg(
      SequenceMotifs.map(m =>
        sum(when(col(s"occ_$m") > 0, 1L).otherwise(0L)).as(s"users_$m")).head,
      (SequenceMotifs.tail.map(m =>
        sum(when(col(s"occ_$m") > 0, 1L).otherwise(0L)).as(s"users_$m")) ++
       SequenceMotifs.map(m => sum(col(s"occ_$m")).as(s"total_$m"))): _*)
    val stackArgs = SequenceMotifs
      .map(m => s"'$m', users_$m, total_$m").mkString(", ")
    agg.selectExpr(
      s"stack(${SequenceMotifs.length}, $stackArgs) AS (motif, users_hit, occurrences)")
      .orderBy("motif")
  }

  /** Bucket count for [[featureHash]] — the fixed feature-vector width
    * of the hashing trick. */
  val FeatureHashBuckets = 1024L

  /** FEATURE HASHING (the hashing trick): sparse categorical features
    * — event type, day-of-week, a bounded user-cohort id — mapped to a
    * FIXED-width bucket space by portable hash, then aggregated to the
    * per-bucket (count, Σcents) profile a downstream trainer consumes
    * as a dense vector. Collisions are the accepted trade of the
    * trick; determinism comes from [[graft.functions.Portable.h32]]
    * (md5-derived), which DuckDB replays bit-for-bit.
    *
    * Scale shape: per-row feature synthesis + explode is scan-speed
    * and collapses IN the map stage (partial aggregate on ≤ 1024
    * buckets), so the only exchange moves ≤ |buckets| rows per
    * partition regardless of corpus size. */
  def featureHash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.h32
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        dayofweek(col("ts")).cast("long").as("dow"),
        pmod(col("user_id"), lit(100L)).as("cohort"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    ev
      .select(explode(array(
          concat(lit("type:"), col("event_type")),
          concat(lit("dow:"), col("dow")),
          concat(lit("cohort:"), col("cohort")))).as("feature"),
        col("cents"))
      .select(pmod(h32(col("feature")), lit(FeatureHashBuckets)).as("bucket"),
        col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("bucket")
  }

  /** All relational queries, keyed as registered in SparkEntry. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg"       -> (q3JoinAgg _),
    "q4_sort_limit"     -> (q4SortLimit _),
    "q5_distinct"       -> (q5Distinct _),
    "q6_semi_join"      -> (q6SemiJoin _),
    "q7_anti_join"      -> (q7AntiJoin _),
    "q8_set_ops"        -> (q8SetOps _),
    "q9_running_sum"    -> (q9RunningSum _),
    "q10_rank_topn"     -> (q10RankTopN _),
    "q11_window_global" -> (q11WindowGlobal _),
    "q12_window_keyed"  -> (q12WindowKeyed _),
    "q13_count_window"  -> (q13CountWindow _),
    "q14_mapwithstate_ttl" -> (q14MapWithStateTtl _),
    "q15_rollup"        -> (q15Rollup _),
    "q16_scalar_funcs"  -> (q16ScalarFuncs _),
    "q17_conditional_agg" -> (q17ConditionalAgg _),
    "q18_date_agg"      -> (q18DateAgg _),
    "q19_asof_join"     -> (q19AsofJoin _),
    "q20_grouping_sets" -> (q20GroupingSets _),
    "q21_session_window" -> (q21SessionWindow _),
    "q22_sliding_window" -> (q22SlidingWindow _),
    "q23_interval_join"  -> (q23IntervalJoin _),
    "q24_ordered_label"  -> (q24OrderedLabel _),
    "q25_scalar_subquery" -> (q25ScalarSubquery _),
    "q26_cube"           -> (q26Cube _),
    "q27_unpivot"        -> (q27Unpivot _),
    "q28_percentile"     -> (q28Percentile _),
    "q29_window_funcs"   -> (q29WindowFuncs _),
    "q30_full_outer"     -> (q30FullOuter _),
    "q31_count_distinct" -> (q31CountDistinct _),
    "q32_asof_native"    -> (q32AsofNative _),
    "q33_salted_join"    -> (q33SaltedJoin _),
    "q34_asof_forward"   -> (q34AsofForward _),
    "q35_asof_left"      -> (q35AsofLeft _),
    "q36_asof_tolerance" -> (q36AsofTolerance _),
    "q37_asof_multikey"  -> (q37AsofMultiKey _),
    "q38_percentile_interp" -> (q38PercentileInterp _),
    "q39_pivot"          -> (q39Pivot _),
    "q40_session_salted" -> (q40SessionSalted _),
    "q41_percentile_band" -> (q41PercentileBand _),
    "q42_upsert"         -> (q42Upsert _),
    "q43_zorder"         -> (q43Zorder _),
    "q44_scd2"           -> (q44Scd2 _),
    "q45_pit_join"       -> (q45PitJoin _),
    "q46_regional_revenue" -> (q46RegionalRevenue _),
    "q47_top_qty_customers" -> (q47TopQuantityCustomers _),
    "q48_small_qty_revenue" -> (q48SmallQtyRevenue _),
    "q49_rollup"            -> (q49Rollup _),
    "q50_funnel"            -> (q50Funnel _),
    "q51_exclusive_fault"   -> (q51ExclusiveFault _),
    "q52_idle_capital"      -> (q52IdleCapital _),
    "q53_json_extract"      -> (q53JsonExtract _),
    "q54_copurchase"        -> (q54Copurchase _),
    "q55_triangles"         -> (q55Triangles _),
    "q56_funnel_latency"    -> (q56FunnelLatency _),
    "q57_retention"         -> (q57Retention _),
    "q58_transitions"       -> (q58Transitions _),
    "q59_anomaly_mad"       -> (q59AnomalyMad _),
    "q60_active_islands"    -> (q60ActiveIslands _),
    "q61_pagerank"          -> (q61Pagerank _),
    "q62_attribution"       -> (q62Attribution _),
    "q63_session_funnel"    -> (q63SessionFunnel _),
    "q64_rolling_wau"       -> (q64RollingWau _),
    "q65_rfm"               -> (q65Rfm _),
    "q66_assoc_rules"       -> (q66AssocRules _),
    "q67_ltv_triangle"      -> (q67LtvTriangle _),
    "q68_frequent_triples"  -> (q68FrequentTriples _),
    "q69_path_topk"         -> (q69PathTopk _),
    "q70_kcore"             -> (q70Kcore _),
    "q71_neighbor_jaccard"  -> (q71NeighborJaccard _),
    "q72_stickiness"        -> (q72Stickiness _),
    "q73_bfs_reach"         -> (q73BfsReach _),
    "q74_gap_fill"          -> (q74GapFill _),
    "q75_ewma"              -> (q75Ewma _),
    "q76_interarrival"      -> (q76Interarrival _),
    // the watermark-driven gap emitter run over a SHUFFLED feed must
    // reproduce q76's batch lag() multiset — the streaming operator's
    // correctness gate (oracle is the plain SQL, no streaming side)
    "q76_gaps_watermarked"  -> (graft.streaming.StreamingGaps.watermarkGate _),
    "q77_target_encode"     -> (q77TargetEncode _),
    "feature_hash"          -> (featureHash _),
    "q78_quantile_bins"     -> (q78QuantileBins _),
    "q79_drift_chisq"       -> (q79DriftChisq _),
    "q80_sequence_motifs"   -> (q80SequenceMotifs _),
    "q81_ab_chisq"          -> (q81AbChisq _),
    "q82_survival"          -> (q82Survival _),
    "q83_ks_test"           -> (q83KsTest _),
    "q84_mann_whitney"      -> (q84MannWhitney _),
    "q85_small_qty_revenue" -> (q85SmallQtyRevenue _),
    "report_drift_panel"    -> (reportDriftPanel _),
    "dq_checks"             -> (dqChecks _),
  )
}
