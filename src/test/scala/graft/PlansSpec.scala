package graft

import graft.plans.{TopKPerGroup, TopKPerGroupNode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom whole-operator (logical node + rule + strategy + exec):
  * semantics vs the window formulation, plan shape, rule collapse. */
class PlansSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 7.0))
    .toDF("key", "id", "score")

  private def windowTopK(d: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id")
    d.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  test("topKPerGroup == window row_number formulation (incl. ties)") {
    val got = TopKPerGroup(df, Seq("key"),
      Seq(("score", false), ("id", true)), 2)
    assert(rows(got) == rows(windowTopK(df, 2)))
    // k larger than any group passes everything through
    val all = TopKPerGroup(df, Seq("key"),
      Seq(("score", false), ("id", true)), 100)
    assert(rows(all) == rows(df.toDF()))
  }

  test("result is partitioning-invariant and matches at modest scale") {
    val big = spark.range(0, 5000)
      .select(($"id" % 37).cast("string").as("key"), $"id",
        (($"id" * 2654435761L) % 1009).cast("double").as("score"))
    val got = TopKPerGroup(big.repartition(13), Seq("key"),
      Seq(("score", false), ("id", true)), 5)
    assert(rows(got) == rows(windowTopK(big, 5)))
  }

  test("plan: partial+final exec, ONE exchange, no sort, no window") {
    val got = TopKPerGroup(df, Seq("key"),
      Seq(("score", false), ("id", true)), 2)
    got.collect()
    // unwrap AQE: its toString repeats the initial plan below the
    // final one, double-counting every node
    val plan = (got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert("TopKPerGroup".r.findAllMatchIn(plan).size == 2, s"want 2 phases:\n$plan")
    assert("Exchange".r.findAllMatchIn(plan).size == 1, s"want 1 exchange:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"top-k must not sort or window:\n$plan")
  }

  test("CombineTopK collapses stacked same-key top-ks to min(k)") {
    val stacked = TopKPerGroup(
      TopKPerGroup(df, Seq("key"), Seq(("score", false), ("id", true)), 10),
      Seq("key"), Seq(("score", false), ("id", true)), 2)
    val nodes = stacked.queryExecution.optimizedPlan
      .collect { case n: TopKPerGroupNode => n }
    assert(nodes.map(_.k) == Seq(2), s"want one node with k=2, got $nodes")
    assert(rows(stacked) == rows(windowTopK(df, 2)))
  }

  test("partial-phase flush past the group cap stays exact (bounded memory)") {
    // 70k distinct groups × 2 rows through ONE map partition: the
    // partial heap table crosses PartialFlushGroups (64k), flushes
    // mid-stream, and the final phase must still reduce both epochs'
    // emissions to exactly min-v per group
    val d = spark.range(0, 140000).toDF("n").coalesce(1)
      // `/` is double division: first copies get v in [0,1), second
      // copies v in [1,2) — min-v per id is always the first copy
      .select(($"n" % 70000).as("id"), ($"n" / 70000).cast("double").as("v"))
    val got = TopKPerGroup(d, Seq("id"), Seq(("v", true), ("id", true)), 1)
    assert(got.count() == 70000)
    assert(got.agg(max($"v")).head.getDouble(0) < 1.0) // never a second copy
  }

  test("final-phase spill past the group threshold stays exact") {
    // force the final phase onto the disk path with a tiny threshold:
    // ~10k groups per reduce partition against spillGroups=512 means
    // ~20 sorted runs each, re-merged by key — the result must still
    // be the exact window-form top-k, ties and all
    spark.conf.set("spark.graft.topk.spillGroups", "512")
    try {
      val d = spark.range(0, 60000)
        .select(($"id" % 20000).as("g"), $"id",
          (($"id" * 2654435761L) % 977).cast("double").as("v"))
      val got = TopKPerGroup(d, Seq("g"), Seq(("v", true), ("id", true)), 2)
      val w = Window.partitionBy("g").orderBy($"v", $"id")
      val want = d.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 2).drop("rn")
      assert(rows(got) == rows(want))
    } finally spark.conf.unset("spark.graft.topk.spillGroups")
  }

  test("final phase survives 2^21 groups in ONE reduce partition (spill)") {
    // the 100 TB shape the operator must not OOM on: a reduce
    // partition owning millions of groups. 2^21 two-row groups forced
    // through one shuffle partition crosses the default 64k spill
    // threshold 32 times; min-v per group must survive the run merge.
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val n = 1 << 21
      val d = spark.range(0, 2L * n)
        .select(($"id" % n).as("g"), ($"id" / n).cast("double").as("v"))
      val got = TopKPerGroup(d, Seq("g"), Seq(("v", true), ("g", true)), 1)
      assert(got.count() == n)
      assert(got.agg(max($"v")).head.getDouble(0) < 1.0) // never a second copy
    } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  test("fat rows spill on the BYTE threshold below any group count") {
    // wide carried columns (a 128-element array ≈ 1 KB/row) must hit
    // the bytes-based bound (r9 verdict #3): 4000 groups × 2 × ~1.1 KB
    // ≈ 9 MB against spillBytes=256 KB forces dozens of byte-triggered
    // spills in the final phase AND byte-triggered flushes in the
    // partial phase, with the group-count knobs far out of reach —
    // the result must still be the exact window-form top-k
    spark.conf.set("spark.graft.topk.spillBytes", (256L << 10).toString)
    try {
      val d = spark.range(0, 8000)
        .select(($"id" % 4000).as("g"), $"id",
          (($"id" * 2654435761L) % 977).cast("double").as("v"),
          array((0 until 128).map(i => ($"id" + i).cast("double")): _*)
            .as("payload"))
      val got = TopKPerGroup(d, Seq("g"), Seq(("v", true), ("id", true)), 1)
      val w = Window.partitionBy("g").orderBy($"v", $"id")
      val want = d.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 1).drop("rn")
      assert(rows(got) == rows(want))
      assert(got.count() == 4000)
    } finally spark.conf.unset("spark.graft.topk.spillBytes")
  }

  test("null group keys and null order values match the window form") {
    val d = Seq(
      (Option("a"), 1L, Option(1.0)), (Option("a"), 2L, Option.empty[Double]),
      (Option.empty[String], 3L, Option(2.0)), (Option.empty[String], 4L, Option(1.0)),
      (Option.empty[String], 5L, Option.empty[Double]))
      .toDF("key", "id", "score")
    val got = TopKPerGroup(d, Seq("key"), Seq(("score", false), ("id", true)), 2)
    assert(rows(got) == rows(windowTopK(d, 2)))
  }

  test("unknown column and non-positive k fail fast") {
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("nope"), Seq(("score", false)), 2)
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq("key"), Seq(("score", false)), 0)
    }
  }
}
