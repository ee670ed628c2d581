package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query corpus against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  * Per-query progress goes to stderr for local profiling.
  *
  * The corpus runs SPARK_GRAFT_BENCH_RUNS (default 5) full passes in
  * this one JVM and reports per-query MEDIANS: single-shot numbers
  * carried 5-50× co-tenancy artifacts (GC/cleanup bleed from
  * neighboring queries, first-query graph-build cost) that cost a
  * round of misdiagnosis each for rounds 2-3. Whole-corpus passes —
  * not back-to-back repeats — so a pass-local disturbance lands on a
  * different query's sample each time and the median discards it.
  * 5 passes (up from 3, r9 verdict #5) because a contended sample
  * landing twice in 3 passes CAPTURES the median — with 5 it takes
  * three bad landings; per-query `spread` (median/min) in
  * BENCH_LOCAL.json is the trust diagnostic separating host noise
  * from code regressions.
  *
  * Round-12 harness hardening (r11 verdict #1 — BENCH_r11.json was
  * rc 124 / parsed null because the driver's 60-minute kill landed one
  * second after the final pass):
  *  - the artifact AND the compact stdout line are rewritten after
  *    EVERY pass (overwrite semantics), so a timeout leaves the last
  *    completed pass parseable instead of nothing;
  *  - adaptive passes: queries whose running median after pass 3
  *    exceeds 3 s stop at 3 samples (the 39 heavy queries cost
  *    ~225 s/pass — two skipped passes save ~7.5 min), the rest get
  *    the full 5;
  *  - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SECS, default
  *    2700 s measured from JVM start, leaving sbt launch + teardown
  *    headroom inside the driver's 60-minute window) stops cleanly
  *    between passes — and mid-pass as a last resort — with the
  *    artifact already on disk;
  *  - every failed pass records its exception class per query
  *    (`errors` in the artifact), so contention kills are
  *    diagnosable after the fact. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Contract: bench runs at local[32]. Default to every core on the
    // host (the driver only sets SPARK_GRAFT_SF_DIR) — a hardcoded low
    // default silently serializes the whole corpus.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    // Optional name filter (substring regex) for LOCAL scale
    // experiments — e.g. excluding the declared bounded-slice exact
    // kernels at a synthesized sf1 (SCALE.md). The driver never sets
    // it, so the round-of-record bench always runs the full corpus.
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val defs = SparkEntry.defs.filter(d =>
      nameFilter.forall(_.pattern.matcher(d.name).find))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // overridable for LOCAL A/B experiments only (the driver never
      // sets it): AQE re-plans per materialization, which is pure
      // overhead on iterative sub-second rounds but essential at scale
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      // q46 enumerates DAG paths; the 1M safety default trips at the
      // scaled decades. Harness-level (the library never mutates a
      // caller session).
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .config(SparkConfs.kryoGraphConf())
      // 60+ queries x iterative sub-executions with large plans: cap
      // the in-memory status store so listener bookkeeping stays O(1)
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.appStateStore.asyncTracking.enable", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pre-build the shared star graph (ingest, not query time), then
    // release every OTHER persistent RDD (BFS checkpoints etc.) after
    // each query so the corpus's localCheckpoint blocks don't pile up.
    // The GraphX projection is NOT pre-built: it materializes lazily
    // on the first Pregel/PageRank/components query (memoized for the
    // rest of the run — GraphOps.pinnedRddIds keeps the sweep off it),
    // so a relational/pipeline-only bench subset never pays for it.
    graft.builder.StarGraph.graph(spark, sfDir)
    // co-purchase membership + projection: ingest-time artifacts
    // shared by five link-analysis queries (must be warmed BEFORE the
    // keep snapshot or the per-query unpersist sweep would drop them)
    graft.builder.StarGraph.copurchase(spark, sfDir)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // Failed passes must be distinguishable from fast passes: a query
    // that throws in 0.1 s would otherwise read as a 0.1 s query.
    // Per failed pass we keep the exception CLASS (r11's 58 one-pass
    // failures were undiagnosable from a bare count).
    val failures = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)
    val jvmStart = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    def elapsedSecs: Double = (System.currentTimeMillis() - jvmStart) / 1e3
    val budgetSecs = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_BUDGET_SECS", "2700").toDouble
    // Queries whose running median exceeds this after 3 passes stop
    // sampling (3 samples still yield a contention-resistant median).
    val heavySecs = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_HEAVY_SECS", "3").toDouble
    // All-passes-failed queries have no samples; report 0 with the
    // failure flag set rather than NaN (which would break the JSON).
    def median(v: Vector[Double]): Double = {
      if (v.isEmpty) return 0.0
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Locale.ROOT explicitly: the f"" interpolator formats with the JVM
    // default locale, and a comma-decimal locale (de_DE) would turn the
    // contract line into invalid JSON.
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    def jstrs(ss: Seq[String]): String =
      ss.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Filtered/scale experiment runs must not clobber the full bench
    // of record: redirect their artifact, keep BENCH_LOCAL.json for
    // unfiltered runs only (overridable via SPARK_GRAFT_BENCH_OUT).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (nameFilter.isEmpty) "BENCH_LOCAL.json" else "BENCH_FILTERED.json")
    // Emit the artifact AND the compact stdout contract line from the
    // samples accumulated SO FAR. Called after every pass (overwrite
    // semantics): if the driver's 60-minute kill lands mid-run, the
    // last completed pass is still fully parseable — r11 lost its
    // entire bench evidence to a kill one second before this point.
    // The compact line is also kept in lastCompact and re-printed as
    // the FINAL stdout act after spark.stop(): r12's run had rc 0 but
    // "parsed": null because the budget-stop notice and sbt's
    // [success] trailer printed after the line — the driver's parser
    // wants the contract line last (r12 verdict #1).
    var lastCompact: String = ""
    // A mid-pass budget stop leaves some queries short one sample;
    // report the sample counts actually collected, not the pass
    // counter (r12 advice: "runs" overstated coverage after a
    // truncated pass / the 3-sample heavy cap).
    var truncatedPass = false
    def emit(passesDone: Int): Unit = {
      val results = defs.map(d => d.name -> median(samples(d.name)))
      val total = results.map(_._2).sum
      // Contention-robust companions (r13 verdict #4): a 2-pass
      // "median" is the mean of a clean and a contended sample, so a
      // contended host reads as a ×2 regression. min_total (sum of
      // per-query minima) is the noise-floor statistic — compare IT
      // round-over-round when contended=true flags that some query's
      // median/min spread exceeded ×3 (host co-tenancy signature,
      // never a code regression, which shifts min too).
      val minTotal = defs.map(d => {
        val s = samples(d.name); if (s.isEmpty) 0.0 else s.min
      }).sum
      val contended = defs.exists { d =>
        val s = samples(d.name)
        s.size >= 2 && s.min > 0 && median(s) / s.min > 3.0
      }
      // Full-precision medians + raw samples -> file (survives any log
      // mangling; the spread column is the bench-trust diagnostic).
      // runs = the LARGEST sample count any query actually collected
      // (== completed passes for the light queries; heavy queries cap
      // at 3 and carry their own samples arrays). passes/truncated
      // record the loop state for after-the-fact diagnosis.
      val runsActual = defs.map(d => samples(d.name).size)
        .foldLeft(0)(_ max _)
      val fullJson =
        s"""{"metric":"total","value":$total,"unit":"sec","min_total":$minTotal,"contended":$contended,"runs":$runsActual,"passes":$passesDone,"truncated":$truncatedPass,"queries":${
          results.map { case (k, v) =>
            val s = samples(k)
            val mn = if (s.isEmpty) 0.0 else s.min
            // spread = median/min: ~1 means a quiet, trustworthy
            // median; >>1 flags host co-tenancy, NOT a code regression
            val spread = if (mn > 0) v / mn else 1.0
            "\"" + k + "\":{\"median\":" + v +
              ",\"min\":" + mn +
              ",\"max\":" + (if (s.isEmpty) 0.0 else s.max) +
              ",\"spread\":" + d3(spread) +
              ",\"failed_passes\":" + failures(k).size +
              ",\"errors\":" + jstrs(failures(k)) +
              ",\"samples\":[" + s.mkString(",") + "]}"
          }.mkString("{", ",", "}")},"sf":"$sfDir"}"""
      try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        fullJson.getBytes("UTF-8"))
      catch { case _: Throwable => () }
      // Stdout contract line: the driver keeps only a ~2000-char tail
      // of the run's output, and the full per-query map (~4 KB)
      // overflowed it in rounds 1-2 ("parsed": null). Emit a COMPACT
      // line instead: total + per-family rollups + a stable headline
      // subset, all 3 dp. Re-printed after every pass so the LAST line
      // in the kept tail always reflects the last completed pass.
      val headline = Seq(
        "q01_pricing_summary", "q04_nation_revenue", "q05_window_top_orders",
        "q09_events_json", "q11_events_sessions", "q15_rollup",
        "q17_exists_subquery", "g01_vertices", "g04_khop_downstream",
        "g05_reachability", "g07_components", "g09_on_shortest",
        "g16_depth_sizes", "g20_pagerank", "g21_scc", "g23_upstream_children",
        "x01_dedup_exact", "x06_ngram_jaccard", "x07_minhash_lsh",
        "x09_sim_bruteforce", "x11_sim_ivf", "x15_asof_join",
        "x21_dedup_clusters", "x23_tfidf", "x30_topk_per_group")
      val byName = results.toMap
      val fam = results.groupBy(_._1.take(1)).toSeq.sortBy(_._1)
        .map { case (p, rs) => (p match {
          case "q" => "relational"; case "g" => "graph"; case "x" => "pipeline"
          case o => o
        }) -> rs.map(_._2).sum }
      // Name which queries failed (not just how many): an aggregate
      // count alone can't be traced back to the offending query from
      // the driver-kept output tail.
      val failedList = jstrs(defs.map(_.name).filter(failures(_).nonEmpty))
      val json =
        s"""{"metric":"total","value":${d3(total)},"unit":"sec","min_total":${d3(minTotal)},"contended":$contended,"n":${results.size},"runs":$runsActual,"passes":$passesDone,"truncated":$truncatedPass,"failures":${failures.values.map(_.size).sum},"failed":$failedList,"groups":${
          jmap(fam)},"queries":${
          jmap(headline.flatMap(h => byName.get(h).map(h -> _)))},"sf":"$sfDir"}"""
      lastCompact = json
      println(json)
      System.out.flush()
    }
    var passesDone = 0
    var stop = false
    var defsRunThisPass = 0
    for (pass <- 1 to runs if !stop) {
      // Adaptive passes: after 3 full passes, heavy queries (running
      // median > heavySecs) already have a trustworthy median — two
      // more samples of a 5-8 s query buy noise resistance the spread
      // diagnostic covers anyway, at ~450 s/corpus the 60-minute
      // window can't afford. All-failed queries (median 0) keep
      // running: they may yet land one good sample.
      val passDefs =
        if (pass <= 3) defs
        else defs.filter(d => median(samples(d.name)) <= heavySecs)
      defsRunThisPass = 0
      passDefs.foreach { d =>
        if (!stop) {
          defsRunThisPass += 1
          val t0 = System.nanoTime()
          val n = try d.fn(spark, sfDir).count() catch {
            case e: Throwable =>
              System.err.println(s"[bench] ${d.name} FAILED: " +
                s"${e.getClass.getName}: ${e.getMessage}")
              failures(d.name) = failures(d.name) :+ e.getClass.getName
              -1L
          }
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(
            f"[bench] pass $pass ${d.name}%-24s ${sec}%8.2f s  ($n rows)")
          val spare = keep ++ graft.algos.GraphOps.pinnedRddIds
          spark.sparkContext.getPersistentRDDs
            .filterNot { case (id, _) => spare.contains(id) }
            .foreach { case (_, rdd) => rdd.unpersist(false) }
          // Failed passes are EXCLUDED from samples: a 0.1 s throw must
          // not lower a query's median (it reads as a fast pass). The
          // failure is carried by failed_passes/errors + the compact
          // line's failed list instead.
          if (n >= 0L) samples(d.name) = samples(d.name) :+ sec
          // Mid-pass last resort: past the hard budget the driver's
          // kill is imminent — emit() below still records a complete
          // artifact for every pass finished so far.
          if (elapsedSecs > budgetSecs) stop = true
        }
      }
      if (stop && defsRunThisPass < passDefs.size) truncatedPass = true
      passesDone = pass
      emit(passesDone)
      // Clean stop between passes when the next full pass can't fit:
      // estimate it at this pass's per-query cost over the next pass's
      // query set.
      val nextDefs =
        if (pass + 1 <= 3) defs
        else defs.filter(d => median(samples(d.name)) <= heavySecs)
      val nextCost = nextDefs.map(d => median(samples(d.name))).sum
      if (pass < runs && elapsedSecs + nextCost * 1.15 > budgetSecs) {
        System.err.println(f"[bench] budget stop after pass $pass: " +
          f"elapsed $elapsedSecs%.0f s + est next $nextCost%.0f s > " +
          f"budget $budgetSecs%.0f s")
        stop = true
      }
    }
    spark.stop()
    // FINAL stdout act: the driver's parser reads the LAST stdout
    // line. Re-print the compact contract line after every notice
    // (budget stop, Spark shutdown chatter) so nothing lands after it
    // from this JVM — only sbt's own trailer can follow, which the
    // parser is expected to skip past (r12 verdict #1).
    if (lastCompact.nonEmpty) {
      println(lastCompact)
      System.out.flush()
    }
  }
}
