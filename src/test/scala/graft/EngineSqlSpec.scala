package graft

import org.apache.spark.sql.types.TimestampType

/** SQL entry-point coverage (r3 ADVICE): every registered fixture view
  * answers a statement, and the events view carries the microsecond
  * TimestampType the streaming/batch loaders agree on.
  */
class EngineSqlSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("user functions: tier boundaries are exact and the UDAF refuses overflow") {
    import graft.functions.UserFunctions
    // Boundary cents values land on the exact thresholds (integer compares,
    // no float drift): -1 → debt, 0 and 499999 → mid, 500000 → high.
    assert(Seq(-1L, 0L, 499999L, 500000L).map(UserFunctions.acctTier) ==
           Seq("debt", "mid", "mid", "high"))
    // Sum of squares is exact LONG arithmetic; overflow throws (addExact)
    // instead of wrapping into a silently-wrong hash.
    assert(UserFunctions.SumSqLong.reduce(0L, 3L) == 9L)
    intercept[ArithmeticException] {
      UserFunctions.SumSqLong.reduce(Long.MaxValue, 2L)
    }
    UserFunctions.register(spark)
    Engine.registerViews(spark, sfDir)
    val r = spark.sql(
      "SELECT sumsq_long(CAST(o_orderkey AS BIGINT)) AS s, " +
      "  CAST(SUM(o_orderkey * o_orderkey) AS BIGINT) AS expect FROM orders")
      .head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("sql19: the aggregate scans the columnar cache (InMemoryRelation)") {
    Engine.registerViews(spark, sfDir)
    spark.sql("UNCACHE TABLE IF EXISTS graft_cached_orders")
    spark.sql("DROP VIEW IF EXISTS graft_cached_orders")
    try {
      spark.sql(
        """CACHE TABLE graft_cached_orders AS
          |SELECT o_orderstatus, o_orderpriority,
          |  CAST(o_totalprice AS DECIMAL(18,2)) AS price
          |FROM orders WHERE o_totalprice > 1000""".stripMargin)
      val df = spark.sql(
        "SELECT o_orderstatus, COUNT(*) AS n FROM graft_cached_orders GROUP BY 1")
      df.collect()
      // Spark 4 prints the cache scan as "Scan In-memory table" over an
      // InMemoryRelation (the InMemoryTableScan node name is gone).
      assert(df.queryExecution.executedPlan.toString
               .contains("InMemoryRelation"),
             s"aggregate must scan the cache:\n${df.queryExecution.executedPlan}")
    } finally {
      spark.sql("UNCACHE TABLE IF EXISTS graft_cached_orders")
      spark.sql("DROP VIEW IF EXISTS graft_cached_orders")
    }
  }

  test("sql20: the BROADCAST hint overrides a disabled auto-broadcast threshold") {
    Engine.registerViews(spark, sfDir)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "-1")
    try {
      def plan(hint: String): String = {
        val df = spark.sql(
          s"""SELECT $hint c_mktsegment, COUNT(*) AS n
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)
        df.queryExecution.toRdd.foreach(_ => ())
        df.queryExecution.executedPlan.toString
      }
      val hinted = plan("/*+ BROADCAST(customer) */")
      assert(hinted.contains("BroadcastHashJoin"),
             s"hint must force the broadcast:\n$hinted")
      val unhinted = plan("")
      assert(!unhinted.contains("BroadcastHashJoin"),
             s"without the hint, -1 threshold must forbid broadcast:\n$unhinted")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("sql24: ANALYZE + CBO reorders the mis-written star join; without CBO the written order stands") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // The innermost Join of the optimized plan names the pair Catalyst
    // chose to evaluate first. Written order is (lineitem ⋈ orders) ⋈
    // customer; with catalog stats + CBO the cheap pair is the filtered
    // orders ⋈ customer.
    def bottomPair(df: org.apache.spark.sql.DataFrame): (Boolean, Boolean, Boolean) = {
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.nonEmpty, s"no joins in\n${df.queryExecution.optimizedPlan}")
      val s = joins.last.toString  // pre-order collect → last = innermost
      (s.contains("graft_cbo_l_"), s.contains("graft_cbo_o_"),
       s.contains("graft_cbo_c_"))
    }
    var withCbo: (Boolean, Boolean, Boolean) = null
    var withoutCbo: (Boolean, Boolean, Boolean) = null
    val on = graft.operators.SqlQueries
      .cboReorder(spark, sfDir, cbo = true, inspect = df => withCbo = bottomPair(df))
    val off = graft.operators.SqlQueries
      .cboReorder(spark, sfDir, cbo = false, inspect = df => withoutCbo = bottomPair(df))
    assert(withCbo == ((false, true, true)),
           s"CBO must join orders ⋈ customer first, got $withCbo")
    assert(withoutCbo == ((true, true, false)),
           s"without CBO the written (lineitem ⋈ orders) order must stand, got $withoutCbo")
    // Plan-invariance: both runs produce identical rows (the hash gate's
    // contract — statistics move the plan, never the result).
    assert(on.collect().toSeq == off.collect().toSeq)
  }

  test("registerViews: one statement per view returns rows") {
    Engine.registerViews(spark, sfDir)
    Tables.names.foreach { n =>
      val cnt = spark.sql(s"SELECT COUNT(*) AS c FROM $n").head().getLong(0)
      assert(cnt > 0, s"view $n is empty")
    }
  }

  test("events view pins ts to microsecond TimestampType") {
    Engine.registerViews(spark, sfDir)
    val tsField = spark.table("events").schema("ts")
    assert(tsField.dataType == TimestampType)
    // micros survive the re-typing: sub-second precision present
    val us = spark.sql("SELECT unix_micros(ts) % 1000000 AS f FROM events")
      .filter("f != 0").count()
    assert(us > 0, "all timestamps truncated to whole seconds — micros lost")
  }

  test("Engine.sql runs a statement end to end") {
    val df = Engine.sql(spark, sfDir,
      "SELECT r_name FROM region ORDER BY r_name")
    assert(df.collect().map(_.getString(0)).nonEmpty)
  }

  test("sql10 FILTER aggregates equal the CASE-WHEN formulation") {
    val filtered = operators.SqlQueries.queries("sql10_filtered_agg")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val caseWhen = Engine.sql(spark, sfDir,
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
        |  CAST(SUM(CASE WHEN l_discount > 0.05
        |                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
        |       AS DOUBLE) AS disc_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(filtered.toSeq == caseWhen.toSeq)
  }

  test("sql11 LATERAL top-2 equals the window formulation; no cartesian plan") {
    val lateral = operators.SqlQueries.queries("sql11_lateral")(spark, sfDir)
    val viaWindow = Engine.sql(spark, sfDir,
      """SELECT c_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT c_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM customer JOIN orders ON o_custkey = c_custkey)
        |WHERE rn <= 2 ORDER BY c_custkey, o_orderkey""".stripMargin)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(canon(lateral) == canon(viaWindow))
    // Catalyst must decorrelate the per-row LIMIT — a cartesian/nested-loop
    // plan here would be quadratic at scale.
    val plan = lateral.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      "expected the rank-limit pushdown (WindowGroupLimit) in the lateral plan")
  }

  test("sql8 recursive chain walk equals the direct per-customer aggregate") {
    // Independent formulation: the full-depth walk visits every order of
    // each customer exactly once, so chain_len must equal the customer's
    // order count and chain_cents its exact cents total — computed here
    // WITHOUT recursion.
    val got = operators.SqlQueries.queries("sql8_recursive_chain")(spark, sfDir)
    val want = spark.sql(
      """SELECT o_custkey, COUNT(*) AS chain_len,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |       AS BIGINT) AS chain_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("recursive CTE fixpoint UNION is still unsupported (the sql8 boundary canary)") {
    // SURVEY's SQL8 row declares UNION ALL-only recursion with cyclic
    // closures routed to the DataFrame fixpoint (connectedComponents).
    // That boundary is a property of the PINNED Spark distro — this
    // canary re-checks it mechanically every build: the day a patch bump
    // accepts fixpoint UNION, this test fails loudly and the right move
    // is to implement/gate the fixpoint path, not to keep the boundary
    // note.
    val e = intercept[Exception] {
      spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1 UNION SELECT n + 1 FROM r WHERE n < 3)
          |SELECT * FROM r""".stripMargin).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(5)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(m =>
             m.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE") ||
             m.contains("RECURSIVE")),
      s"unexpected failure shape for fixpoint UNION: ${messages(e)}")
  }

  test("Tables.loadEvents works under a bare session conf (defensive nanos)") {
    // Simulate a session missing the Engine.configure conf: unset, load,
    // restore. The loader must set it itself (r3 ADVICE).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    try {
      val n = Tables.loadEvents(spark, sfDir).count()
      assert(n > 0)
    } finally spark.conf.set(key, "true")
  }

  test("sql23 gaps-and-islands sessions match a brute-force per-user scan") {
    val events = Tables.loadEvents(spark, sfDir)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
                   r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(t => (t._2, t._3)).map(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ordered.head))
      ordered.tail.foreach { ts =>
        if (ts - sessions.last.last > 600000000L)
          sessions += scala.collection.mutable.ArrayBuffer(ts)
        else sessions.last += ts
      }
      u -> ((sessions.length.toLong, sessions.map(_.length).max.toLong,
             sessions.map(s => s.last - s.head).sum))
    }
    val got = graft.operators.SqlQueries.queries("sql23_gaps_islands")(
        spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, s"first diff: ${
      expected.collectFirst { case (u, e) if got.get(u) != Some(e) =>
        (u, e, got.get(u)) }}")
  }

  test("Tables.spread widens narrow plans, no-ops wide and streaming ones") {
    import org.apache.spark.sql.functions._
    val p = spark.sparkContext.defaultParallelism
    // Narrow (coalesce(1)) frame → spread to the session parallelism,
    // content unchanged (round-robin placement only moves rows).
    val narrow = spark.range(100).toDF("id").coalesce(1)
    val widened = Tables.spread(narrow)
    assert(widened.rdd.getNumPartitions == p)
    assert(widened.agg(sum(col("id"))).head().getLong(0) == 4950L)
    // Already-wide frame → returned untouched (same plan object).
    val wide = spark.range(100).toDF("id").repartition(p)
    assert(Tables.spread(wide) eq wide)
    // Streaming frame → returned untouched (a .rdd probe would throw).
    val stream = spark.readStream.format("rate").load()
    assert(Tables.spread(stream) eq stream)
  }
}
