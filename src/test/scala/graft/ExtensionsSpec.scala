package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path: a session built with
  * GraftExtensions resolves vec_dot without any runtime registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) makes vec_dot resolvable at build time") {
    // Force the fixture session into existence first so its SparkContext is
    // reused, then build a SEPARATE session object with the extensions.
    val base = SparkFixture.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        val r = withExt.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
          .collect()(0).getDouble(0)
        assert(r == 11.0)
      } finally {
        // Session objects share the context; only clear the references.
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("rollup rewrite serves the aggregate from the rollup scan; guards hold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = SparkFixture.spark
    val dir = SparkFixture.Sf0001
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      PlanCheck.flatten(PlanCheck.finalPlan(df)).collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val q = () => Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        graft.functions.Det.dsum(col("c_acctbal")).as("acctbal_total"))
      .orderBy("c_mktsegment")
    try {
      // Baseline (no registration): served from the corpus.
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val direct = q().collect().map(_.toSeq).toSeq
      assert(scanPaths(q()).exists(_.contains("customer.parquet")))
      // Registered: identical rows, rollup scanned, corpus NOT scanned.
      val rollup = graft.queries.Relational.stagedSegRollup(spark, dir)
      graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
        s"$dir/customer.parquet", "c_mktsegment", "c_acctbal", rollup))
      val served = q()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("customer-seg-rollup")),
        s"rollup not scanned: $paths")
      assert(!paths.exists(_.contains("customer.parquet")),
        s"corpus still scanned: $paths")
      assert(served.collect().map(_.toSeq).toSeq == direct,
        "rewrite changed the result")
      // Guard: a Filter means the rollup does not cover the query.
      val filtered = Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 0)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(filtered).exists(_.contains("customer.parquet")),
        "filtered aggregate must NOT be rewritten")
      // Guard: an unregistered aggregate shape disables the rewrite.
      val otherAgg = Tables.customer(spark, dir)
        .groupBy(col("c_mktsegment"))
        .agg(max(col("c_acctbal")).as("mx"))
      assert(scanPaths(otherAgg).exists(_.contains("customer.parquet")),
        "max() aggregate must NOT be rewritten")
    } finally graft.plans.RollupRewrite.clear()
  }

  test("filter-containment rewrite: day predicates served from the day-grained rollup; residuals pass through") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = SparkFixture.spark
    val dir = SparkFixture.Sf0001
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      PlanCheck.flatten(PlanCheck.finalPlan(df)).collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val part = graft.queries.Relational.stagedEventsByDay(spark, dir)
    val rollup = graft.queries.Relational.stagedEventsDayRollup(spark, dir)
    def q(pred: org.apache.spark.sql.Column) = () =>
      graft.sources.Layout.readPartitioned(spark, part)
        .filter(pred)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Det.dsum(col("value"), 6).as("sum_value"))
        .orderBy("event_type")
    val dayPred = col("day") >= lit("2024-01-08") && col("day") < lit("2024-01-22")
    try {
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val direct = q(dayPred)().collect().map(_.toSeq).toSeq
      assert(scanPaths(q(dayPred)()).exists(_.contains("events-by-day")))
      graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
        part, "event_type", "value", rollup,
        groupOut = "event_type", countOut = "n", sumOut = "sb",
        filterCol = Some("day"), filterOut = "day"))
      // Fires on the day-only predicate: rollup scanned, corpus NOT.
      val served = q(dayPred)()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("events-day-rollup")), s"rollup not scanned: $paths")
      assert(!paths.exists(_.contains("events-by-day")), s"corpus still scanned: $paths")
      assert(served.collect().map(_.toSeq).toSeq == direct, "rewrite changed the result")
      // An IN-list day predicate is also day-only → served.
      val inPred = col("day").isin("2024-01-03", "2024-01-09", "2024-01-17")
      assert(scanPaths(q(inPred)()).exists(_.contains("events-day-rollup")),
        "IN-list day predicate should be served from the rollup")
      val directIn = {
        graft.plans.RollupRewrite.clear()
        val r = q(inPred)().collect().map(_.toSeq).toSeq
        graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
          part, "event_type", "value", rollup,
          groupOut = "event_type", countOut = "n", sumOut = "sb",
          filterCol = Some("day"), filterOut = "day"))
        r
      }
      assert(q(inPred)().collect().map(_.toSeq).toSeq == directIn,
        "IN-list rewrite changed the result")
      // Residual predicate (touches a non-grain column): pass through.
      val residual = q(dayPred && col("value") > 0)()
      assert(scanPaths(residual).exists(_.contains("events-by-day")),
        "a predicate on value must NOT be served from the day rollup")
      // Bare aggregate (no filter) over a filter-grained spec: also served
      // (all partials merge).
      val bare = graft.sources.Layout.readPartitioned(spark, part)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(bare).exists(_.contains("events-day-rollup")),
        "bare aggregate should merge all partials from the rollup")
    } finally graft.plans.RollupRewrite.clear()
  }

  test("grain-containment rewrite: coarser-grain groupings served from the day rollup; guards hold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = SparkFixture.spark
    val dir = SparkFixture.Sf0001
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      PlanCheck.flatten(PlanCheck.finalPlan(df)).collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    val part = graft.queries.Relational.stagedEventsByDay(spark, dir)
    val rollup = graft.queries.Relational.stagedEventsDayRollup(spark, dir)
    def q(group: org.apache.spark.sql.Column) = () =>
      graft.sources.Layout.readPartitioned(spark, part)
        .groupBy(group)
        .agg(count(lit(1)).as("n"),
          graft.functions.Det.dsum(col("value"), 6).as("sum_value"))
    val monthG = date_format(col("day"), "yyyy-MM").as("month")
    val weekG = weekofyear(col("day")).cast("long").as("week")
    try {
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val direct = q(monthG)().orderBy("month").collect().map(_.toSeq).toSeq
      val directWeek = q(weekG)().orderBy("week").collect().map(_.toSeq).toSeq
      assert(scanPaths(q(monthG)()).exists(_.contains("events-by-day")))
      graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
        part, "event_type", "value", rollup,
        groupOut = "event_type", countOut = "n", sumOut = "sb",
        filterCol = Some("day"), filterOut = "day"))
      // Month-of-day grouping fires: rollup scanned, corpus NOT, rows equal.
      val served = q(monthG)()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("events-day-rollup")),
        s"rollup not scanned: $paths")
      assert(!paths.exists(_.contains("events-by-day")),
        s"corpus still scanned: $paths")
      assert(served.orderBy("month").collect().map(_.toSeq).toSeq == direct,
        "grain rewrite changed the result")
      // Any deterministic f(day) qualifies — week-of-year too.
      val servedWeek = q(weekG)()
      assert(scanPaths(servedWeek).exists(_.contains("events-day-rollup")),
        "week grouping should be served from the rollup")
      assert(servedWeek.orderBy("week").collect().map(_.toSeq).toSeq == directWeek,
        "week grain rewrite changed the result")
      // Grain + day-only predicate composes (filter replayed, then grouped).
      val pred = col("day") >= lit("2024-01-08")
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val directFiltered = graft.sources.Layout.readPartitioned(spark, part)
        .filter(pred).groupBy(monthG)
        .agg(count(lit(1)).as("n")).orderBy("month")
        .collect().map(_.toSeq).toSeq
      graft.plans.RollupRewrite.register(graft.plans.RollupSpec(
        part, "event_type", "value", rollup,
        groupOut = "event_type", countOut = "n", sumOut = "sb",
        filterCol = Some("day"), filterOut = "day"))
      val servedFiltered = graft.sources.Layout.readPartitioned(spark, part)
        .filter(pred).groupBy(monthG)
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(servedFiltered).exists(_.contains("events-day-rollup")),
        "grain grouping with a day predicate should be served from the rollup")
      assert(servedFiltered.orderBy("month").collect().map(_.toSeq).toSeq
        == directFiltered, "filtered grain rewrite changed the result")
      // Guard: a grouping touching a NON-grain column passes through.
      val mixed = graft.sources.Layout.readPartitioned(spark, part)
        .groupBy(concat(col("event_type"), date_format(col("day"), "yyyy-MM")).as("g"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(mixed).exists(_.contains("events-by-day")),
        "a grouping over (type, day) columns must NOT take the grain path")
      // Guard: nondeterministic f(day) passes through.
      val nondet = graft.sources.Layout.readPartitioned(spark, part)
        .groupBy((unix_date(col("day")) + floor(rand() * 0)).as("g"))
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(nondet).exists(_.contains("events-by-day")),
        "a nondeterministic grouping must NOT be rewritten")
    } finally graft.plans.RollupRewrite.clear()
  }

  test("join-view rewrite: the star-schema aggregate is served with Join AND Aggregate deleted; guards hold") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = SparkFixture.spark
    val dir = SparkFixture.Sf0001
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      PlanCheck.flatten(PlanCheck.finalPlan(df)).collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    def q() = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
    try {
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.attach(spark)
      val direct = q().collect().map(_.toSeq).toSeq
      assert(scanPaths(q()).exists(_.contains("orders.parquet")))
      val rollup = graft.queries.Relational.stagedSegOrderViewFull(spark, dir)
      graft.plans.RollupRewrite.registerJoin(graft.plans.JoinRollupSpec(
        s"$dir/orders.parquet", s"$dir/customer.parquet",
        "o_custkey", "c_custkey", "c_mktsegment", "o_totalprice", rollup))
      val served = q()
      val paths = scanPaths(served)
      assert(paths.exists(_.contains("seg-order-view-full")), s"rollup not scanned: $paths")
      assert(!paths.exists(_.contains("orders.parquet")), s"fact still scanned: $paths")
      assert(!paths.exists(_.contains("customer.parquet")), s"dim still scanned: $paths")
      assert(served.collect().map(_.toSeq).toSeq == direct, "join rewrite changed the result")
      // Guard: a residual fact-side predicate disqualifies.
      val filtered = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 1000.0)
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(scanPaths(filtered).exists(_.contains("orders.parquet")),
        "a filtered join must NOT be served from the join rollup")
      // Guard: a different join key disqualifies.
      val wrongKey = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("o_orderkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(scanPaths(wrongKey).exists(_.contains("orders.parquet")),
        "a different join key must NOT be served from the join rollup")
      // Guard: an unregistered aggregate shape disqualifies.
      val otherAgg = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(max(col("o_totalprice")).as("mx"))
      assert(scanPaths(otherAgg).exists(_.contains("orders.parquet")),
        "max() over the join must NOT be served from the join rollup")
    } finally graft.plans.RollupRewrite.clear()
  }
}
