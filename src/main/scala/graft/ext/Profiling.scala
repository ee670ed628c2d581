package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus profiling at scale: the `describe()` a 100 TB training-data
 * pipeline can actually afford, with every number re-derivable on any
 * engine (extension beyond the reference — its pandas surface gets
 * `df.describe()` for free at single-node scale; nothing distributed
 * or portable exists there).
 *
 * Two legs, both corpus-shuffle-free:
 *
 *  - EXACT moments (row count, null count, min, max, mean) from ONE
 *    map-side-combined aggregation pass — the corpus is scanned once
 *    and only the per-partition partials move (a handful of rows).
 *    The mean routes through a decimal(38,6) sum, so it is
 *    order-independent and bit-identical under any partitioning.
 *
 *  - ORDER STATISTICS (percentile_disc quantiles) from a
 *    deterministic uniform sample: the `sampleK` rows with the
 *    SMALLEST md5(id) — a bottom-k KMV-style sample. Content-keyed,
 *    so the sample is invariant to partitioning, task order, retries,
 *    cluster size, AND engine (DuckDB's md5 produces the same hex
 *    string, so `ORDER BY md5(id) LIMIT k` is the identical row set).
 *    Spark plans the bottom-k as TakeOrderedAndProject: each
 *    partition keeps its local k, only k-row partials merge — the
 *    corpus never shuffles, state is O(k) per task. percentile_disc
 *    then picks ACTUAL data values from the sample (no interpolation
 *    arithmetic), which keeps the quantile row hash-matchable.
 *
 * Output is long-form `(col_name, stat, value)` — one row per
 * (column × statistic), ready for drift dashboards / profile diffs.
 */
object Profiling {

  /** The deterministic bottom-k sample on its own — reusable as a
    * portable "inspect 1000 random docs" primitive (same contract as
    * [[Sampling]]: content-keyed, never rand()). Ties on md5 are
    * broken by the id itself, so the row set is total-ordered. */
  def bottomKSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(k)

  def profile(df: DataFrame, idCol: String, cols: Seq[String],
              sampleK: Int = 1000,
              quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession

    // ---- exact one-pass moments, wide -> long via stack()
    def exactAggs(c: String): Seq[Column] = Seq(
      count(lit(1)).cast("double").as(s"${c}__rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double").as(s"${c}__nulls"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      // decimal-exact sum, ONE final IEEE division (oracle-identical)
      (sum(col(c).cast("decimal(38,6)")).cast("double") /
        count(col(c)).cast("double")).as(s"${c}__mean"))
    val allAggs = cols.flatMap(exactAggs)
    val wideExact = df.agg(allAggs.head, allAggs.tail: _*)
    val exactStats = Seq("rows", "nulls", "min", "max", "mean")
    val exactStack = cols.flatMap(c => exactStats.map(st =>
      s"'$c', '$st', `${c}__$st`")).mkString(", ")
    val exactLong = wideExact.selectExpr(
      s"stack(${cols.size * exactStats.size}, $exactStack) AS (col_name, stat, value)")

    // ---- sampled order statistics
    val sample = bottomKSample(df, idCol, sampleK)
    def pName(q: Double): String = s"p${math.round(q * 100)}"
    val qAggs = cols.flatMap(c => quantiles.map(q =>
      expr(s"percentile_disc(CAST($q AS DOUBLE)) WITHIN GROUP (ORDER BY `$c`)")
        .cast("double").as(s"${c}__${pName(q)}")))
    val wideQ = sample.agg(qAggs.head, qAggs.tail: _*)
    val qStack = cols.flatMap(c => quantiles.map(q =>
      s"'$c', '${pName(q)}', `${c}__${pName(q)}`")).mkString(", ")
    val qLong = wideQ.selectExpr(
      s"stack(${cols.size * quantiles.size}, $qStack) AS (col_name, stat, value)")

    exactLong.unionByName(qLong)
  }

  /** One-table corpus datasheet — the "dataset card" block a training
    * run records next to its shards (Gebru et al.'s datasheets, the
    * numeric half): doc/token/char totals, empty-doc and exact-dup
    * rates, language spread, and a sampled median length, every value
    * a BIGINT (counts, or integer-ppm rates, or micro-unit means), so
    * the whole card re-derives bit-identically on any engine and two
    * cards diff meaningfully. Returns (metric, value) rows.
    *
    * Scale shape: ONE map-side-combined global aggregation (the
    * count-distinct of content md5s is its only shuffle — 16-byte
    * hashes, never text), one tiny language histogram, and the
    * [[bottomKSample]] partial top-k for the sampled median; the
    * corpus is scanned twice, shuffled never (hash keys aside). */
  def datasetCard(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", langCol: String = "lang",
                  sampleK: Int = 512): DataFrame = {
    val g = df.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col(textCol)), "\\s+"))).cast("long")
        .as("n_tokens"),
      sum(length(col(textCol))).cast("long").as("n_chars"),
      sum(when(trim(col(textCol)) === "", 1L).otherwise(0L)).as("n_empty"),
      countDistinct(md5(col(textCol))).as("n_distinct"))
    val langs = df.groupBy(col(langCol)).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_langs"), max("c").as("top_lang_n"))
    val p50 = bottomKSample(df, idCol, sampleK)
      .agg(expr(s"percentile_disc(CAST(0.5 AS DOUBLE)) WITHIN GROUP " +
        s"(ORDER BY length(`$textCol`))").cast("long").as("p50"))
    g.crossJoin(langs).crossJoin(p50).selectExpr(
      "stack(9, " +
        "'n_docs', n_docs, " +
        "'n_tokens', n_tokens, " +
        "'n_chars', n_chars, " +
        "'n_empty', n_empty, " +
        "'exact_dup_ppm', (n_docs - n_distinct) * 1000000 DIV n_docs, " +
        "'n_langs', n_langs, " +
        "'top_lang_share_ppm', top_lang_n * 1000000 DIV n_docs, " +
        "'mean_chars_micro', n_chars * 1000000 DIV n_docs, " +
        "'p50_chars_sampled', p50" +
        ") AS (metric, value)")
  }

  /** Portable per-group approximate distinct count — the
    * AUDIT-friendly alternative to HLL (`approx_count_distinct`):
    * a bottom-k KMV sketch over 48-bit md5 hashes with the exact-
    * integer estimator `(k-1)·2^48 DIV v_k` at capacity (exact count
    * below it) — the [[graft.algos.LinkAnalysis.kmvCentrality]]
    * estimator relationalized. Unlike HLL, every intermediate (the
    * sketch rows) and the estimate itself re-derive bit-identically
    * on any engine/partitioning/run, so a warehouse can audit the
    * number instead of trusting it. Returns
    * (group, n_k, distinct_est).
    *
    * Scale shape: one map-side-combinable distinct on (group, 48-bit
    * hash) — 12-byte rows, never values — then [[graft.plans
    * .TopKPerGroup]] caps each group at k rows map-side; the final
    * agg runs on ≤ groups·k rows. Standard KMV error ~1/√(k−2);
    * hash collisions (2^-48-scale) shift both engines identically. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 256): DataFrame = {
    require(k > 1, s"kmvDistinct: k must be > 1, got $k")
    val h = df.select(col(groupCol).as("__g"),
        conv(substring(md5(col(valueCol).cast("string")), 1, 12), 16, 10)
          .cast("long").as("__h"))
      .distinct()
    graft.plans.TopKPerGroup(h, Seq("__g"), Seq(("__h", true)), k)
      .groupBy("__g")
      .agg(count(lit(1)).as("n_k"), max("__h").as("__vk"))
      .select(col("__g").as(groupCol), col("n_k"),
        when(col("n_k") < k, col("n_k"))
          .otherwise(expr(s"CAST(${k - 1}L * 281474976710656L DIV " +
            "greatest(__vk, 1L) AS BIGINT)"))
          .as("distinct_est"))
  }

  /** Distribution drift between two corpora (yesterday vs today, web
    * vs books, train vs eval) over a numeric column: fixed-width
    * integer bins, per-corpus counts, integer-ppm shares, and the
    * per-bin absolute share difference — total-variation distance in
    * ppm = sum(abs_diff_ppm) / 2 ([[tvDistancePpm]]). ALL-INTEGER
    * arithmetic (floor-div bins, floor-div ppm shares): the drift
    * report is bit-identical on any engine/partitioning — an
    * auditable pipeline gate, unlike KL/PSI whose ln() is libm-bound.
    *
    * Scale shape: each corpus collapses to its bin histogram in one
    * map-side-combined aggregation (bin keys only — the corpora never
    * shuffle raw rows); the two histograms full-outer join on bin
    * (dozens of rows) with the totals broadcast back (the
    * mixtureSample pattern). */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
                     binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def hist(df: DataFrame, n: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .groupBy((floor(col(valueCol).cast("long") / binWidth) * binWidth)
        .cast("long").as("bin"))
      .agg(count(lit(1)).as(n))
    val ha = hist(a, "n_a")
    val hb = hist(b, "n_b")
    val tot = ha.agg(sum("n_a").as("tot_a"))
      .crossJoin(hb.agg(sum("n_b").as("tot_b")))
    ha.join(hb, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("n_a * 1000000 div tot_a").as("ppm_a"),
        expr("n_b * 1000000 div tot_b").as("ppm_b"),
        abs(expr("n_a * 1000000 div tot_a") -
          expr("n_b * 1000000 div tot_b")).as("abs_diff_ppm"))
  }

  /** Total-variation distance in ppm from a [[histogramDrift]]
    * report: 0 = identical binned distributions, 1e6 = disjoint. */
  def tvDistancePpm(drift: DataFrame): Long =
    drift.agg((sum("abs_diff_ppm") / 2).cast("long")).head().getLong(0)

  /** Mergeable profile state — the incremental/streaming leg of
    * [[profile]]: both of its legs happen to be ALGEBRAIC, so a
    * standing corpus profile can absorb a new batch without
    * re-scanning the corpus.
    *
    *  - moments: (rows, nulls, cnt, decimal sum, min, max) per column
    *    — sums add, min/max fold, and the mean is derived at finalize
    *    time from the EXACT decimal sum, so the merged mean is
    *    bit-identical to the from-scratch one (a stored per-batch
    *    mean would not merge exactly);
    *  - sample: the md5 bottom-k rows — a KMV sketch, whose merge
    *    (union → bottom-k again) is EXACT: bottom-k of A∪B ==
    *    bottom-k of bottom-k(A) ∪ bottom-k(B), so even the sampled
    *    quantiles of the merged state equal the whole-corpus ones.
    *
    * `finalizeProfile(merge(state(A), state(B))) == profile(A ∪ B)`
    * row-for-row (x63 hash-matches it; ProfilingSpec pins 3-way merge
    * associativity). This is the daily-profile loop at 100 TB: each
    * day profiles ITS OWN batch, the standing state folds it in. */
  final case class ProfileState(moments: DataFrame, sample: DataFrame,
                                idCol: String, sampleK: Int)

  def profileState(df: DataFrame, idCol: String, cols: Seq[String],
                   sampleK: Int = 1000): ProfileState = {
    require(cols.nonEmpty, "profileState needs at least one column")
    def aggs(c: String): Seq[Column] = Seq(
      count(lit(1)).as(s"${c}__rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      count(col(c)).as(s"${c}__cnt"),
      sum(col(c).cast("decimal(38,6)")).as(s"${c}__s"),
      min(col(c)).cast("double").as(s"${c}__mn"),
      max(col(c)).cast("double").as(s"${c}__mx"))
    val all = cols.flatMap(aggs)
    val wide = df.agg(all.head, all.tail: _*)
    val st = cols.map(c => s"'$c', `${c}__rows`, `${c}__nulls`, " +
      s"`${c}__cnt`, `${c}__s`, `${c}__mn`, `${c}__mx`").mkString(", ")
    val moments = wide.selectExpr(
      s"stack(${cols.size}, $st) AS (col_name, rows, nulls, cnt, s, mn, mx)")
    ProfileState(moments, bottomKSample(df, idCol, sampleK), idCol, sampleK)
  }

  def mergeStates(a: ProfileState, b: ProfileState): ProfileState = {
    require(a.sampleK == b.sampleK && a.idCol == b.idCol,
      "mergeStates: states must share idCol and sampleK")
    val moments = a.moments.unionByName(b.moments)
      .groupBy("col_name")
      .agg(sum("rows").as("rows"), sum("nulls").as("nulls"),
        sum("cnt").as("cnt"), sum("s").cast("decimal(38,6)").as("s"),
        min("mn").as("mn"), max("mx").as("mx"))
    val sample = bottomKSample(
      a.sample.unionByName(b.sample), a.idCol, a.sampleK)
    ProfileState(moments, sample, a.idCol, a.sampleK)
  }

  /** Render a state to [[profile]]'s long-form output — identical
    * rows to running profile() on the union of everything the state
    * absorbed. */
  def finalizeProfile(st: ProfileState, cols: Seq[String],
                      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val exactLong = st.moments.selectExpr("col_name",
      "stack(5, 'rows', CAST(rows AS DOUBLE), 'nulls', CAST(nulls AS DOUBLE), " +
        "'min', mn, 'max', mx, " +
        "'mean', CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)) AS (stat, value)")
    def pName(q: Double): String = s"p${math.round(q * 100)}"
    val qAggs = cols.flatMap(c => quantiles.map(q =>
      expr(s"percentile_disc(CAST($q AS DOUBLE)) WITHIN GROUP (ORDER BY `$c`)")
        .cast("double").as(s"${c}__${pName(q)}")))
    val wideQ = st.sample.agg(qAggs.head, qAggs.tail: _*)
    val qStack = cols.flatMap(c => quantiles.map(q =>
      s"'$c', '${pName(q)}', `${c}__${pName(q)}`")).mkString(", ")
    val qLong = wideQ.selectExpr(
      s"stack(${cols.size * quantiles.size}, $qStack) AS (col_name, stat, value)")
    exactLong.unionByName(qLong)
  }

  /** Per-group bottom-k sample (e.g. 200 deterministic docs PER
    * LANGUAGE) through the custom [[graft.plans.TopKPerGroup]]
    * physical operator: the partial phase caps shuffle input at k
    * rows per group per partition, so sampling a 100 TB corpus by
    * language shuffles O(groups × k × partitions) rows, never the
    * corpus — the grouped analogue of [[bottomKSample]]'s
    * TakeOrdered. Same portability contract: smallest (md5(id), id)
    * per group is the identical row set on any engine. */
  def bottomKSampleByGroup(df: DataFrame, groupCol: String, idCol: String,
                           k: Int): DataFrame =
    graft.plans.TopKPerGroup(
        df.withColumn("__md5", md5(col(idCol).cast("string"))),
        Seq(groupCol), Seq(("__md5", true), (idCol, true)), k)
      .drop("__md5")

  /** Curation retention funnel — the per-stage survival table every
    * published pretraining recipe reports (how many docs/tokens each
    * filter removed, per source), computed in ONE corpus pass. Stages
    * are named predicates applied CUMULATIVELY: a row survives stage
    * i iff predicates 1..i all pass. Per row we compute the index of
    * the FIRST failing stage (a chained CASE — map-side, codegen'd),
    * then a single groupBy(groupCol) produces every stage's survivor
    * doc and token counts as conditional sums, unpivoted to long form
    * with `stack`. stage_idx 0 is ingest (everything), so the funnel
    * always starts from the raw counts. No per-stage scans, no
    * intermediate materialization — 100 TB pays one scan + one
    * groups-sized shuffle regardless of stage count.
    *
    * Output: (<groupCol>, stage_idx, stage, n_docs, n_tokens),
    * n_tokens from `tokenCol` (defaults to whitespace token count of
    * `text` if present — pass an explicit Column otherwise). */
  def retentionFunnel(df: DataFrame, groupCol: String,
                      stages: Seq[(String, Column)],
                      tokenCol: Option[Column] = None): DataFrame = {
    require(stages.nonEmpty, "retentionFunnel needs at least one stage")
    val toks = tokenCol.getOrElse(TextOps.tokenCount(col("text"))).cast("long")
    // first failing stage index, 1-based; stages.size+1 = all pass
    val firstFail = stages.zipWithIndex.tail
      .foldLeft(when(!stages.head._2, lit(1))) {
        case (acc, ((_, pred), i)) => acc.when(!pred, lit(i + 1))
      }.otherwise(lit(stages.size + 1))
    val names = "ingest" +: stages.map(_._1)
    val sums = (0 to stages.size).flatMap(i => Seq(
      sum(when(col("ff") > i, 1L).otherwise(0L)).as(s"d$i"),
      sum(when(col("ff") > i, col("tk")).otherwise(0L)).as(s"t$i")))
    val agg = df
      .select(col(groupCol), firstFail.as("ff"),
        coalesce(toks, lit(0L)).as("tk"))
      .groupBy(groupCol)
      .agg(sums.head, sums.tail: _*)
    val stackArgs = (0 to stages.size).map(i =>
      s"$i, '${names(i)}', d$i, t$i").mkString(", ")
    agg.select(col(groupCol), expr(
      s"stack(${stages.size + 1}, $stackArgs)" +
        " as (stage_idx, stage, n_docs, n_tokens)"))
      .select(col(groupCol), col("stage_idx").cast("long"),
        col("stage"), col("n_docs"), col("n_tokens"))
  }

  /** Data-quality expectations card (r10) — the machine-checkable
    * contract a warehouse runs against every ingest batch (the
    * Great-Expectations shape, engine-exact): each named rule is a
    * boolean Column over the row (null-rate, range, regex-match,
    * referential predicates…); the card reports per rule the pass /
    * fail counts and the integer-ppm pass rate. A NULL rule result is
    * a FAILURE (three-valued logic made explicit — an unknown is not
    * a pass), which is what makes `col > 0` do the right thing on
    * null columns without every caller remembering coalesce.
    *
    * Scale shape: ONE corpus pass — all rules evaluate map-side into
    * a single hash-aggregate row, then `stack` reshapes to long form
    * (rule count adds zero passes, the retentionFunnel economics).
    * Returns (rule_idx, rule, n_rows, n_pass, n_fail, pass_ppm). */
  def expectationsCard(df: DataFrame,
                       rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectationsCard needs at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__p$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
      s"$i, '${name.replace("'", "''")}', __p$i" }.mkString(", ")
    one.select(col("__n"), expr(
        s"stack(${rules.size}, $stackArgs) AS (rule_idx, rule, n_pass)"))
      .select(col("rule_idx").cast("long"), col("rule"),
        col("__n").as("n_rows"), col("n_pass"),
        (col("__n") - col("n_pass")).as("n_fail"),
        expr("n_pass * 1000000 DIV greatest(__n, 1)").as("pass_ppm"))
  }

  /** The algebraic half of [[expectationsCard]] (r11) — one batch's
    * rule counters as MERGEABLE rows (rule_idx, rule, n_rows, n_pass):
    * counts add, so a standing contract gate absorbs a new micro-batch
    * without rescanning history (the x63 profileState economics
    * applied to the data-contract card). Same one-pass / map-side
    * evaluation and NULL-is-a-failure semantics as the card. */
  def expectationsState(df: DataFrame,
                        rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectationsState needs at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__p$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
      s"$i, '${name.replace("'", "''")}', __p$i" }.mkString(", ")
    one.select(col("__n"), expr(
        s"stack(${rules.size}, $stackArgs) AS (rule_idx, rule, n_pass)"))
      .select(col("rule_idx").cast("long"), col("rule"),
        col("__n").as("n_rows"),
        // an empty batch aggregates sums to NULL — a zero-row state
        // row must carry 0, not NULL, to merge
        coalesce(col("n_pass"), lit(0L)).as("n_pass"))
  }

  /** Fold accumulated [[expectationsState]] rows into the card —
    * row-for-row equal to [[expectationsCard]] over the union of every
    * absorbed batch (StreamingSpec pins it; x141 hash-matches the
    * from-raw oracle). One groups-sized aggregation, never a corpus
    * rescan. */
  def mergeExpectations(states: DataFrame): DataFrame =
    states.groupBy("rule_idx", "rule")
      .agg(sum("n_rows").cast("long").as("n_rows"),
        sum("n_pass").cast("long").as("n_pass"))
      .select(col("rule_idx"), col("rule"), col("n_rows"), col("n_pass"),
        (col("n_rows") - col("n_pass")).as("n_fail"),
        expr("n_pass * 1000000 DIV greatest(n_rows, 1)").as("pass_ppm"))

  /** Streaming expectations gate (r11) — the data-contract verdict as
    * a CONTINUOUS signal over a live ingest: each micro-batch's rule
    * counters land under `stateDir/epoch=N/` (per-epoch Overwrite —
    * idempotent under foreachBatch's at-least-once replay, the
    * streamingNearDup pairs convention), and the up-to-now card at
    * any moment is `mergeExpectations(spark.read.parquet(stateDir))`
    * — a state-sized aggregation, no history rescan, no state store
    * growth beyond rules × epochs rows. */
  def streamingExpectationsGate(stream: DataFrame,
                                rules: Seq[(String, Column)],
                                stateDir: String,
                                checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       epoch: Long) =>
        expectationsState(batch, rules)
          .coalesce(1) // rules-sized output: one tiny file per epoch
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$stateDir/epoch=$epoch")
    }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Pairwise Pearson correlation card (r11) — q20's exact-moment
    * treatment lifted to ALL C(k,2) column pairs in ONE corpus pass:
    * values quantize to micro-units (floor(v·10⁶), the kmeans trick —
    * exact on any engine), a single aggregation computes n, Σq, Σq²
    * and every pairwise Σq_a·q_b as DECIMAL(38,0) (per-row products
    * ride decimal(18,0)² so 10¹¹-scale quantized values cannot wrap a
    * long), and each correlation is the one IEEE chain
    * (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) — sqrt and
    * division are exactly-rounded IEEE ops, so the card re-derives
    * bit-identically (native corr is Welford partial-order-dependent).
    * Rows with a NULL in ANY profiled column are dropped first (the
    * listwise convention, so every pair sees the same n). Headroom:
    * moments are exact to 10³⁸ — same bound as q20.
    *
    * Scale shape: one map-side-combinable aggregation to a single
    * row; `stack` reshapes to C(k,2) long-form rows. O(k²) sum slots
    * per partition — fine for profiling-sized column sets. */
  def correlationCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationCard needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val base = df.na.drop(cols).select(cols.map(c =>
      floor(col(c).cast("double") * 1e6).cast("long")
        .cast("decimal(18,0)").as(s"__q_$c")): _*)
    val aggs = count(lit(1)).cast("decimal(38,0)").as("__n") +:
      (cols.map(c => sum(col(s"__q_$c")).cast("decimal(38,0)")
          .as(s"__s_$c")) ++
        cols.map(c => sum(col(s"__q_$c") * col(s"__q_$c"))
          .cast("decimal(38,0)").as(s"__ss_$c")) ++
        pairs.map { case (a, b) => sum(col(s"__q_$a") * col(s"__q_$b"))
          .cast("decimal(38,0)").as(s"__sp_${a}__$b") })
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', CAST(__n AS BIGINT), " +
        s"CAST(__n * `__sp_${a}__$b` - `__s_$a` * `__s_$b` AS DOUBLE) / " +
        s"(sqrt(CAST(__n * `__ss_$a` - `__s_$a` * `__s_$a` AS DOUBLE)) * " +
        s"sqrt(CAST(__n * `__ss_$b` - `__s_$b` * `__s_$b` AS DOUBLE)))"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, n, corr)")
  }

  /** [[profile]] per group (per-language / per-source corpus
    * profiles): exact moments from one grouped pass + sampled
    * order statistics from the per-group bottom-k sample. Output
    * long-form `(<groupCol>, col_name, stat, value)`. */
  def profileByGroup(df: DataFrame, groupCol: String, idCol: String,
                     cols: Seq[String], sampleK: Int = 200,
                     quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")

    def exactAggs(c: String): Seq[Column] = Seq(
      count(lit(1)).cast("double").as(s"${c}__rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double").as(s"${c}__nulls"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      (sum(col(c).cast("decimal(38,6)")).cast("double") /
        count(col(c)).cast("double")).as(s"${c}__mean"))
    val allAggs = cols.flatMap(exactAggs)
    val exactStats = Seq("rows", "nulls", "min", "max", "mean")
    val exactStack = cols.flatMap(c => exactStats.map(st =>
      s"'$c', '$st', `${c}__$st`")).mkString(", ")
    val exactLong = df.groupBy(col(groupCol)).agg(allAggs.head, allAggs.tail: _*)
      .selectExpr(s"`$groupCol`",
        s"stack(${cols.size * exactStats.size}, $exactStack) AS (col_name, stat, value)")

    def pName(q: Double): String = s"p${math.round(q * 100)}"
    val qAggs = cols.flatMap(c => quantiles.map(q =>
      expr(s"percentile_disc(CAST($q AS DOUBLE)) WITHIN GROUP (ORDER BY `$c`)")
        .cast("double").as(s"${c}__${pName(q)}")))
    val qStack = cols.flatMap(c => quantiles.map(q =>
      s"'$c', '${pName(q)}', `${c}__${pName(q)}`")).mkString(", ")
    val qLong = bottomKSampleByGroup(df, groupCol, idCol, sampleK)
      .groupBy(col(groupCol)).agg(qAggs.head, qAggs.tail: _*)
      .selectExpr(s"`$groupCol`",
        s"stack(${cols.size * quantiles.size}, $qStack) AS (col_name, stat, value)")

    exactLong.unionByName(qLong)
  }

  /** Join-skew preflight card — the check a 100 TB job runs on a
    * prospective join/groupBy key BEFORE paying the shuffle: the
    * `topN` heaviest key values with their integer-ppm share of the
    * table, plus the skew ratio `max_over_mean_ppm = n_max · distinct
    * · 10⁶ DIV total` (1e6 = perfectly uniform; the salting / AQE-
    * skew-join decision threshold). One map-side-combined count
    * aggregation; the top-N rides [[graft.plans.TopKPerGroup]] under
    * a constant group (per-partition bounded heaps, one exchange of
    * ≤ topN·partitions rows — the key-count table is never sorted
    * whole). Products routed through DECIMAL(38,0): n·distinct·10⁶
    * wraps BIGINT at web-corpus counts. Returns
    * (rank, key, n, share_ppm, max_over_mean_ppm). */
  def skewCard(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    require(topN >= 1, s"skewCard: topN >= 1, got $topN")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val stats = counts.agg(
      sum("n").as("total"), count(lit(1)).as("n_distinct"),
      max("n").as("n_max"))
    val top = graft.plans.TopKPerGroup(
      counts.withColumn("__g", lit(1)),
      Seq("__g"), Seq(("n", false), ("key", true)), topN)
    import org.apache.spark.sql.expressions.Window
    top.crossJoin(broadcast(stats))
      .withColumn("rank", row_number().over(
        Window.partitionBy("__g").orderBy(col("n").desc, col("key"))))
      .select(col("rank"), col("key"), col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000" +
          " DIV total AS BIGINT)").as("share_ppm"),
        expr("CAST(CAST(n_max AS DECIMAL(38,0)) * n_distinct * 1000000" +
          " DIV total AS BIGINT)").as("max_over_mean_ppm"))
  }

  /** Robust per-group outlier gate (median / MAD): flag values more
    * than `madK` median-absolute-deviations from their group median —
    * the outlier rule that, unlike mean/stddev z-scores, a single
    * extreme value cannot drag (50% breakdown point). All arithmetic
    * on exact integers (the caller supplies an integer value column —
    * cents, micros, token counts), both quantiles via percentile_disc
    * (actual elements, no interpolation, no float hazard), so the
    * card re-derives bit-identically on any engine.
    *
    * Returns one row per group: (group, n, med, mad, n_outliers,
    * outlier_ppm).
    *
    * Scale shape: two grouped percentile_disc aggregations (Spark
    * plans each as a single shuffle on the group key) + one join back
    * for the flag count — the value column never shuffles twice at
    * once and no global sort exists. The med/mad tables are one row
    * per group but the GROUP CARDINALITY IS CALLER-CONTROLLED (unlike
    * the other broadcast legs here, nothing bounds it by
    * construction), so the joins carry no forced broadcast hint: AQE
    * picks broadcast when the group table is actually small and falls
    * back to a shuffled join when a caller groups by a
    * high-cardinality column, instead of OOMing the driver. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     madK: Long = 5L): DataFrame = {
    val v = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("long").as("v"))
    val med = v.groupBy("grp").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
        .cast("long").as("med"))
    val dev = v.join(med, Seq("grp"))
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = dev.groupBy("grp").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
        .cast("long").as("mad"))
    dev.join(mad, Seq("grp"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        max("med").as("med"), max("mad").as("mad"),
        sum(when(col("ad") > lit(madK) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_ppm",
        expr("n_outliers * 1000000 DIV greatest(n, 1)"))
      .withColumnRenamed("grp", groupCol)
  }

  /** k-anonymity audit over a generalization ladder — the re-
    * identification governance card a dataset release runs per
    * quasi-identifier set: for EVERY prefix level of `quasi` (full
    * combination → progressively generalized → fully aggregated),
    * how many equivalence groups exist, how many hold fewer than `k`
    * rows, and how many rows sit in those risky groups (integer ppm
    * share). Reading down the rows answers "how much generalization
    * until everyone hides in a crowd of k".
    *
    * Spark-first: the whole ladder is ONE rollup aggregation (the
    * grouping-sets machinery computes every prefix in a single pass —
    * no per-level re-scan), then a levels-sized re-aggregation keyed
    * off grouping_id. NULL quasi values are grouped as their own
    * equivalence class by rollup; level L = first L quasi columns
    * kept. */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[String],
                      k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityAudit: need quasi-identifiers")
    val total = df.count() // single-scalar lookup (allowed class)
    df.rollup(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      // rollup's gid sets one bit per AGGREGATED trailing column:
      // level = #quasi columns still kept
      .withColumn("level",
        (lit(quasi.size) - expr("bit_count(gid)")).cast("int"))
      .groupBy("level")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("risky_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"))
      .withColumn("risk_ppm",
        expr(s"CAST(rows_at_risk * 1000000 DIV ${total.max(1L)} AS BIGINT)"))
  }
}
