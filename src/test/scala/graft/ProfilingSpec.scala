package graft

import graft.ext.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  private def mkDocs(n: Int) =
    (1 to n).map(i => (i.toLong, i.toLong * 10, if (i % 7 == 0) null
      else java.lang.Long.valueOf(i.toLong % 50)))
      .toDF("id", "size", "score")

  test("exact moments are correct and null-aware") {
    val p = Profiling.profile(mkDocs(100), "id", Seq("score"), sampleK = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("score", "rows")) == 100.0)
    assert(p(("score", "nulls")) == 14.0) // multiples of 7 up to 100
    assert(p(("score", "min")) == 0.0 && p(("score", "max")) == 49.0)
    val vals = (1 to 100).filter(_ % 7 != 0).map(_ % 50)
    assert(math.abs(p(("score", "mean")) - vals.sum.toDouble / vals.size) < 1e-9)
  }

  test("profile is invariant to partitioning (exact AND sampled legs)") {
    val base = mkDocs(500)
    val a = Profiling.profile(base.repartition(1), "id", Seq("size", "score"), 100)
    val b = Profiling.profile(base.repartition(13, col("score")), "id",
      Seq("size", "score"), 100)
    assert(rows(a) == rows(b))
  }

  test("bottom-k sample is the k smallest md5(id) rows, deterministically") {
    val df = mkDocs(200)
    val got = Profiling.bottomKSample(df, "id", 20)
      .select("id").as[Long].collect().toSeq
    val want = (1 to 200).map(_.toLong)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .take(20)
    assert(got.toSet == want.toSet)
    // and a second invocation returns the identical set
    assert(Profiling.bottomKSample(df.repartition(7), "id", 20)
      .select("id").as[Long].collect().toSet == got.toSet)
  }

  test("grouped profile == per-group ungrouped profiles, and samples ride TopKPerGroup") {
    val df = mkDocs(300).withColumn("grp", (col("id") % 3).cast("string"))
    val grouped = Profiling.profileByGroup(df, "grp", "id", Seq("size", "score"), 50)
    // every group's slice must equal the ungrouped profile of that slice
    for (g <- Seq("0", "1", "2")) {
      val want = rows(Profiling.profile(df.filter(col("grp") === g), "id",
        Seq("size", "score"), 50))
      val got = rows(grouped.filter(col("grp") === g).drop("grp"))
      assert(got == want, s"group $g diverged")
    }
    // the per-group sample must be planned through the custom operator
    val plan = Profiling.bottomKSampleByGroup(df, "grp", "id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"expected TopKPerGroupExec in:\n$plan")
  }

  test("histogramDrift: integer bins/shares, TV bounds, identical corpora = 0") {
    val a = (1 to 100).map(i => (i.toLong, (i * 10).toLong)).toDF("id", "v")
    val b = (1 to 50).map(i => (i.toLong, (i * 10 + 500).toLong)).toDF("id", "v")
    val drift = Profiling.histogramDrift(a, b, "v", 250L)
    val rows0 = drift.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // a: v in 10..1000 -> bins 0,250,500,750,1000 with 24/25/25/25/1
    assert(rows0.contains((0L, 24L, 0L, 240000L, 0L)))
    assert(rows0.contains((500L, 25L, 24L, 250000L, 480000L)))
    val tv = Profiling.tvDistancePpm(drift)
    assert(tv > 0 && tv <= 1000000L)
    // identical corpora drift exactly 0, invariant to partitioning
    assert(Profiling.tvDistancePpm(
      Profiling.histogramDrift(a.repartition(7), a.repartition(3), "v", 250L)) == 0L)
    // disjoint supports -> full TV distance (1e6 ppm exactly, all-integer)
    val c = (1 to 40).map(i => (i.toLong, (i + 100000).toLong)).toDF("id", "v")
    assert(Profiling.tvDistancePpm(Profiling.histogramDrift(a, c, "v", 250L)) == 1000000L)
  }

  test("percentile_disc picks actual data values from the sample") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val p = Profiling.profile(df, "id", Seq("v"), sampleK = 100,
      quantiles = Seq(0.5))
      .collect().map(r => (r.getString(1)) -> r.getDouble(2)).toMap
    assert(p("p50") == 50.0) // smallest v with cume_dist >= 0.5 over 1..100
  }

  test("mergeable state: 3-way batch merge == whole-corpus profile, any grouping") {
    val d = mkDocs(300)
    val whole = Profiling.profile(d, "id", Seq("size", "score"),
        sampleK = 120)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    def state(m: Int) = Profiling.profileState(
      d.filter(pmod(col("id"), lit(3)) === m), "id",
      Seq("size", "score"), sampleK = 120)
    // left fold and a differently-associated fold must both equal the
    // from-scratch profile — sums are exact decimals, the bottom-k
    // sample is a KMV sketch with exact union merge
    val leftFold = Profiling.finalizeProfile(
      Profiling.mergeStates(Profiling.mergeStates(state(0), state(1)),
        state(2)), Seq("size", "score"))
    val rightFold = Profiling.finalizeProfile(
      Profiling.mergeStates(state(0),
        Profiling.mergeStates(state(1), state(2))), Seq("size", "score"))
    for (got <- Seq(leftFold, rightFold)) {
      val g = got.collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
      assert(g == whole)
    }
    // sampleK/idCol mismatches refuse to merge (a silent mismatch
    // would desync the KMV exactness argument)
    intercept[IllegalArgumentException] {
      Profiling.mergeStates(state(0),
        Profiling.profileState(d, "id", Seq("size"), sampleK = 60))
    }
  }

  test("kmvDistinct: exact below capacity, bounded error at capacity, stable") {
    // group "small": 30 distinct values (< k=64) -> exact count
    // group "big": 5000 distinct values -> KMV estimate
    val rows = (0 until 30).map(i => ("small", i.toLong)) ++
      (0 until 5000).flatMap(i => Seq(("big", 100000L + i), ("big", 100000L + i)))
    val d = rows.toDF("g", "v")
    val out = Profiling.kmvDistinct(d, "g", "v", k = 64)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("small") == (30L, 30L)) // exact, duplicates collapsed
    val (nk, est) = out("big")
    assert(nk == 64L)
    // standard KMV error ~1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert(est > 3000L && est < 7000L, s"estimate $est")
    val again = Profiling.kmvDistinct(d.repartition(11), "g", "v", 64)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == out)
  }

  test("HLL approx_count_distinct tracks exact and the KMV estimate (q14's spec pin)") {
    // q14's corpus primary is the auditable KMV sketch; the HLL fast
    // path (engine-internal, unhashable by design) is pinned here:
    // both estimators must track the exact count on the same data.
    val d = (0 until 6000)
      .map(i => (s"g${i % 3}", (i * 2654435761L) % 1500)).toDF("g", "v")
    val exact = d.groupBy("g").agg(countDistinct("v").as("n"))
      .as[(String, Long)].collect().toMap
    val hll = d.groupBy("g")
      .agg(approx_count_distinct("v").as("n"))
      .as[(String, Long)].collect().toMap
    for ((g, n) <- exact) // default rsd 5% -> 3 sigma
      assert(math.abs(hll(g) - n) <= 0.15 * n, s"HLL $g: ${hll(g)} vs $n")
    val kmv = Profiling.kmvDistinct(d, "g", "v", k = 64)
      .select("g", "distinct_est").as[(String, Long)].collect().toMap
    for ((g, n) <- exact) // KMV error ~1/sqrt(62) ≈ 13% -> 3 sigma
      assert(math.abs(kmv(g) - n) <= 0.4 * n, s"KMV $g: ${kmv(g)} vs $n")
  }

  test("datasetCard: hand-computed metrics, all-BIGINT, partition-invariant") {
    val docs = Seq(
      (1L, "alpha beta", "en"),
      (2L, "alpha beta", "en"),   // exact dup of 1
      (3L, "gamma delta eps", "en"),
      (4L, "", "es"),             // empty doc
      (5L, "zeta", "es")).toDF("doc_id", "text", "lang")
    val card = Profiling.datasetCard(docs)
      .as[(String, Long)].collect().toMap
    assert(card("n_docs") == 5L)
    // whitespace tokens: 2+2+3+1+1 ('' splits to one empty token —
    // the shardManifest convention, same on both engines)
    assert(card("n_tokens") == 9L)
    assert(card("n_chars") == (10 + 10 + 15 + 0 + 4))
    assert(card("n_empty") == 1L)
    // 5 docs, 4 distinct texts -> 1/5 duplicated
    assert(card("exact_dup_ppm") == 200000L)
    assert(card("n_langs") == 2L)
    // top lang en = 3/5
    assert(card("top_lang_share_ppm") == 600000L)
    assert(card("mean_chars_micro") == 39L * 1000000L / 5L)
    // sampled median over all 5 lengths (sampleK > n): sorted lengths
    // 0,4,10,10,15 -> percentile_disc(0.5) = 10
    assert(card("p50_chars_sampled") == 10L)
    val again = Profiling.datasetCard(docs.repartition(7))
      .as[(String, Long)].collect().toMap
    assert(again == card)
  }

  test("skewCard: top-N shares and max/mean ratio, exact integers") {
    // a:6 b:3 c:1 -> total 10, distinct 3, max 6
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val out = Profiling.skewCard(df, "k", topN = 2)
      .select("rank", "key", "n", "share_ppm", "max_over_mean_ppm")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, "a", 6L, 600000L, 1800000L),
      (2, "b", 3L, 300000L, 1800000L)))
    // uniform key -> ratio exactly 1e6
    val uni = (0 until 8).map(i => s"k${i % 4}").toDF("k")
    val r = Profiling.skewCard(uni, "k", topN = 1)
      .select("max_over_mean_ppm").as[Long].head()
    assert(r == 1000000L)
    // repartition-invariant
    val again = Profiling.skewCard(df.repartition(5), "k", topN = 2)
      .select("rank", "key", "n", "share_ppm", "max_over_mean_ppm")
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("robustOutliers: hand-computed median/MAD; one extreme can't drag the gate") {
    // 1..9 plus 1000: med = 5 (disc picks the 5th of 10), deviations
    // sorted 0,1,1,2,2,3,3,4,4,995 -> mad = 2; only 1000 exceeds 5*2
    val df = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("grp", "v")
    val out = Profiling.robustOutliers(df, "grp", "v", madK = 5L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("g", 10L, 5L, 2L, 1L, 100000L)))
    // a mean/stddev gate would have been dragged: med/mad ignore the
    // extreme entirely — replacing 1000 with 10 changes no flag count
    val calm = ((1L to 9L) :+ 10L).map(("g", _)).toDF("grp", "v")
    val out2 = Profiling.robustOutliers(calm, "grp", "v", madK = 5L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out2.head._5 == 0L)
  }

  test("kAnonymityAudit: hand-computed generalization ladder") {
    // (lang, src): en/a x3, en/b x1, fr/a x1 -> full level 2:
    // 3 groups, 2 risky (n<2... with k=2: groups en/b, fr/a), 2 rows
    val df = Seq(("en", "a"), ("en", "a"), ("en", "a"), ("en", "b"),
      ("fr", "a")).toDF("lang", "src")
    val out = Profiling.kAnonymityAudit(df, Seq("lang", "src"), k = 2L)
      .orderBy("level").as[(Int, Long, Long, Long, Long)].collect().toSeq
    // level 0: the grand total (1 group of 5, never risky at k=2)
    // level 1: en=4, fr=1 -> 1 risky group, 1 row (200000 ppm)
    // level 2: en/a=3, en/b=1, fr/a=1 -> 2 risky, 2 rows (400000 ppm)
    assert(out == Seq(
      (0, 1L, 0L, 0L, 0L),
      (1, 2L, 1L, 1L, 200000L),
      (2, 3L, 2L, 2L, 400000L)))
  }

  test("correlationCard: perfect / anti / intermediate correlations, listwise null drop (r11)") {
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 2.0)).toDF("x", "y", "z", "w")
    val out = Profiling.correlationCard(df, Seq("x", "y", "z", "w"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 6 && out.values.forall(_._1 == 3L))
    assert(math.abs(out(("x", "y"))._2 - 1.0) < 1e-12)  // y = 2x
    assert(math.abs(out(("x", "z"))._2 + 1.0) < 1e-12)  // z = -x
    assert(math.abs(out(("y", "z"))._2 + 1.0) < 1e-12)
    // brute Pearson for the non-degenerate pair
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val (sa, sb) = (a.sum, b.sum)
      val num = n * a.zip(b).map { case (p, q) => p * q }.sum - sa * sb
      num / (math.sqrt(n * a.map(p => p * p).sum - sa * sa) *
        math.sqrt(n * b.map(q => q * q).sum - sb * sb))
    }
    assert(math.abs(out(("x", "w"))._2 -
      pearson(Seq(1, 2, 3), Seq(1, 5, 2))) < 1e-9)
    // a NULL in any profiled column drops the row for EVERY pair
    val withNull = Seq(
      (Some(1.0), Some(2.0), Some(3.0)),
      (Some(2.0), None, Some(5.0)),
      (Some(3.0), Some(6.0), Some(4.0))).toDF("x", "y", "w")
    val n2 = Profiling.correlationCard(withNull, Seq("x", "y", "w"))
      .select("n").as[Long].collect()
    assert(n2.forall(_ == 2L))
  }
}
