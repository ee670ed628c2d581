package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text analysis over a document corpus (north-star extension X3):
 * language-ID heuristic, quality scoring, token counting, document
 * fingerprinting. Pure column math (split / HOFs / md5) so every
 * operator is codegen'd and DuckDB-oracle-expressible.
 */
object TextOps {

  /** Whitespace tokenization shared by every text operator and every
    * oracle (`string_split_regex(trim(text), '\s+')`). Known caveat:
    * Java's `\s` includes vertical tab (\x0B), RE2's does not — a
    * corpus containing \x0B would tokenize differently in DuckDB. The
    * driver corpora contain none; [[scrub]] shows the explicit-class
    * alternative if a real corpus needs the stronger guarantee. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonical text normalization for dedup pre-processing: lowercase,
    * strip everything but letters/digits/whitespace, collapse
    * whitespace runs, trim. Pure regexp column math (codegen'd,
    * DuckDB-mirrorable) — normalizing BEFORE shingling is what makes
    * near-dup detection robust to case/punctuation edits. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Pattern scrubbing: canonicalize emails, then URLs, then digit
    * runs to placeholder tokens — the standard cleaning step before
    * dedup/fingerprinting so formatting-only variants collapse.
    * Patterns stay in the Java∩RE2 common syntax (no lookaround, and
    * no `\s`: Java's includes vertical tab, RE2's does not — the URL
    * terminator is the explicit class below, identical in both
    * engines), so the x32 oracle applies the identical regexes;
    * replacement order matters (emails contain digits) and is part of
    * the contract. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        "https?://[^ \\t\\n\\r\\f\\x0B]+", "<URL>"),
      "[0-9]+", "<NUM>")

  /** Collocation mining — adjacent-word PMI over the corpus (the
    * "New York" / "machine learning" detector, the phrase-vocabulary
    * step of tokenizer and embedding pipelines): for bigrams seen at
    * least `minCount` times, pmi_ppm = 1e6·n_ab·N div (n_a·n_b) — the
    * x87 lift formula with word-adjacency as the basket, all-integer
    * (>1e6 = collocated above independence; the log is monotone in
    * the ratio, so ranking survives dropping it). The multiply is
    * routed through DECIMAL(38,0) so 1e6·n_ab·N cannot wrap past 2^63
    * at web-corpus token counts (~1e10+ tokens) — same routing as
    * associationRules' cell sums. One explode + two map-side-combinable counts;
    * the pair table joins the unigram margins on the word key and N
    * arrives as a 1-row broadcast. */
  def collocations(df: DataFrame, minCount: Long = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = df.select(tokens(normalize(col(textCol))).as("t"))
      .localCheckpoint()
    val uni = toks.select(explode(col("t")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
    val nTotal = uni.agg(sum("n").cast("long").as("n_tokens"))
    val bi = toks
      .withColumn("bg", expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
          " (x, y) -> struct(x AS w1, y AS w2))"))
      .select(explode(col("bg")).as("p"))
      .select(col("p.w1").as("a"), col("p.w2").as("b"))
      .where(col("a") =!= "" && col("b") =!= "")
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    bi.join(uni.select(col("w").as("a"), col("n").as("n_a")), "a")
      .join(uni.select(col("w").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(nTotal))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast(1000000 * cast(n_ab as decimal(38,0)) * n_tokens" +
          " div (cast(n_a as decimal(38,0)) * n_b) as bigint)").as("pmi_ppm"))
  }

  /** Hashed n-gram buckets shared by [[importanceWeights]] and its
    * oracle: unigrams + adjacent bigrams over the [[normalize]]d
    * token stream, each feature mapped to an md5-derived bucket in
    * [0, buckets) (the [[Sampling.md5Bucket]] family, so buckets
    * re-derive on any engine). Bigrams join on a single space —
    * unambiguous vs unigrams because tokens cannot contain spaces. */
  private def hashedNgramBuckets(df: DataFrame, buckets: Int,
                                 idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        tokens(normalize(col(textCol))).as("t"))
      .localCheckpoint()
    val uni = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .where(col("w") =!= "")
    val bi = toks
      .withColumn("bg", expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
          " (x, y) -> struct(x AS w1, y AS w2))"))
      .select(col("doc_id"), explode(col("bg")).as("p"))
      .where(col("p.w1") =!= "" && col("p.w2") =!= "")
      .select(col("doc_id"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("w"))
    uni.unionByName(bi)
      .select(col("doc_id"), Sampling.md5Bucket(col("w"), buckets).as("b"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every RAW document by how much its hashed-n-gram distribution
    * looks like the TARGET corpus, so selection can skew a crawl
    * toward a trusted slice without training a model. Features are
    * hashed unigram+bigram buckets; per bucket the smoothed
    * likelihood ratio, in integer ppm with add-one smoothing over the
    * bucket universe:
    *
    *   ratio_ppm(b) = 1e6·(t_b+1)·(R+B) div ((r_b+1)·(T+B)),
    *
    * clamped to ≤ 1e9 (a bucket common in target but near-absent in
    * raw would otherwise dominate and overflow sums); the per-doc
    * importance is the MEAN bucket ratio (score_sum div n_feats).
    * Where the paper sums log-ratios, this sums the ratios
    * themselves — the geometric→arithmetic substitution keeps the
    * whole score in BIGINT (products routed through DECIMAL(38,0), the
    * [[collocations]] overflow discipline), so scores re-derive
    * bit-identically on any engine; docs rich in target-typical
    * n-grams rank high under either mean.
    *
    * Scale shape: one explode per corpus; bucket histograms are two
    * map-side-combined counts onto ≤ `buckets` rows; totals arrive as
    * 1-row broadcasts; the ratio table (≤ `buckets` rows) broadcasts
    * back onto the raw feature stream, which shuffles only on doc_id
    * for the final agg — the corpus never joins anything its own
    * size. Feed the scores to [[Sampling.weightedBernoulli]] /
    * [[Sampling.selectByBudget]] for the resampling leg. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        buckets: Int = 4096, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val rawF = hashedNgramBuckets(raw, buckets, idCol, textCol)
      .localCheckpoint() // feeds the histogram AND the per-doc agg
    val tgtF = hashedNgramBuckets(target, buckets, idCol, textCol)
    val rb = rawF.groupBy("b").agg(count(lit(1)).as("r"))
    val tb = tgtF.groupBy("b").agg(count(lit(1)).as("tc"))
    val rTot = rb.agg(sum("r").cast("long").as("rr"))
    val tTot = tb.agg(sum("tc").cast("long").as("tt"))
    val dist = rb.join(tb, Seq("b"), "left")
      .select(col("b"), col("r"), coalesce(col("tc"), lit(0L)).as("tc"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(tTot))
      .select(col("b"), expr(
        s"cast(least(1000000 * (cast(tc as decimal(38,0)) + 1)" +
          s" * (rr + $buckets)" +
          s" div ((cast(r as decimal(38,0)) + 1) * (tt + $buckets))," +
          " 1000000000) as bigint)").as("ratio_ppm"))
    rawF.join(broadcast(dist), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("ratio_ppm").as("score_sum"))
      .select(col("doc_id"), col("n_feats"), col("score_sum"),
        expr("cast(score_sum div n_feats as bigint)").as("importance_ppm"))
  }

  /** PII detection audit — the REPORT counterpart of [[scrub]]'s
    * removal: per-document match counts for the same email / URL /
    * digit-run pattern family (Java∩RE2 subset, so the counts
    * re-derive identically on any engine), plus a has_pii flag on the
    * identifying classes (emails, URLs — digit runs alone are not
    * identifying). A privacy gate wants the evidence BEFORE the
    * redaction: which slices of a crawl carry contact data, trending
    * how, feeding the x71-style governance card. Map-only codegen'd
    * column algebra over the corpus — no shuffle at all. */
  def piiAudit(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    def cnt(pattern: String) =
      size(regexp_extract_all(coalesce(col(textCol), lit("")),
        lit(pattern), lit(0))).cast("long")
    docs.select(col(idCol).as("doc_id"),
        cnt("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+").as("n_emails"),
        cnt("https?://[^ \\t\\n\\r\\f\\x0B]+").as("n_urls"),
        cnt("[0-9]+").as("n_digit_runs"))
      .withColumn("has_pii", col("n_emails") > 0 || col("n_urls") > 0)
  }

  /** Strip HTML-ish markup from crawled text — the first cleaning
    * step of every web-corpus recipe: drop `<script>`/`<style>`
    * elements WITH their contents (code and CSS are not prose), drop
    * all remaining tags and comments, decode the five XML entities +
    * `&nbsp;`, squeeze runs of whitespace to one space, trim. Same
    * portability contract as [[scrub]]: every pattern sits in the
    * Java∩RE2 subset ((?s) dotall instead of `[\s\S]` tricks, explicit
    * whitespace class, case-insensitive via (?i)), applied in a
    * DOCUMENTED order (script/style before generic tags — the generic
    * pattern would otherwise unwrap them and leak their contents;
    * entities after tags — decoded `&lt;` must NOT create new "tags";
    * squeeze last), so the oracle runs the identical chain. Map-only
    * codegen'd column algebra, no UDF, no parser — the 100 TB path;
    * it is a tag STRIPPER for corpus text, not a sanitizer (adversarial
    * HTML needs a real parser). */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&quot;" -> "\"",
      "&apos;" -> "'", "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v)) // literal, not regex — both engines
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f\\x0B]+", " "))
  }

  /** URL canonicalization — the crawl-dedup normalizer every web
    * pipeline runs BEFORE content dedup (the same page is crawled as
    * `http://`, `https://`, `www.`, with fragments and tracking
    * params; canonical-URL dedup collapses them for free, no shingling
    * needed). Documented step order, every pattern in the Java∩RE2
    * subset and every list op a DuckDB-mirrorable HOF (the [[scrub]]/
    * [[stripMarkup]] portability contract, so the oracle applies the
    * identical chain):
    * 1) trim; 2) drop the `#fragment`; 3) drop an http(s) scheme
    * ((?i)); 4) split the host (through the first `/?#`) from the
    * rest; 5) host: lowercase (hosts are case-insensitive; paths are
    * NOT), drop one leading `www.`, drop a default `:80`/`:443` port;
    * 6) path: drop trailing slashes; 7) query: drop `utm_*` tracking
    * params and empty params, dropping the `?` when nothing survives
    * (param ORDER is preserved — sorting would conflate genuinely
    * order-sensitive endpoints). Map-only column algebra, no UDF.
    * Returns (idCol, host, url_canon). */
  def canonicalUrls(df: DataFrame, idCol: String,
                    urlCol: String): DataFrame = {
    val t1 = regexp_replace(
      regexp_replace(trim(col(urlCol)), "#.*", ""),
      "(?i)^https?://", "")
    df.select(col(idCol), t1.as("__u"))
      .withColumn("__host0", regexp_extract(col("__u"), "^([^/?#]*)", 1))
      .withColumn("host", regexp_replace(regexp_replace(
        lower(col("__host0")), "^www\\.", ""), ":(80|443)$", ""))
      .withColumn("__rest",
        col("__u").substr(length(col("__host0")) + 1, length(col("__u"))))
      .withColumn("__q", instr(col("__rest"), "?"))
      .withColumn("__path", regexp_replace(
        when(col("__q") === 0, col("__rest"))
          .otherwise(col("__rest").substr(lit(1), col("__q") - 1)),
        "/+$", ""))
      .withColumn("__params", filter(
        split(when(col("__q") === 0, lit(""))
          .otherwise(col("__rest").substr(col("__q") + 1,
            length(col("__rest")))), "&"),
        p => p =!= "" && !p.startsWith("utm_")))
      .select(col(idCol), col("host"),
        concat(col("host"), col("__path"),
          when(size(col("__params")) > 0,
            concat(lit("?"), array_join(col("__params"), "&")))
            .otherwise(lit(""))).as("url_canon"))
  }

  /** Overlapping token-window chunks — the context-window prep step of
    * a training pipeline: windows of `window` tokens starting every
    * `stride` tokens (stride < window ⇒ overlap). Start positions run
    * only to `n - window + stride - 1`: a later start would yield a
    * chunk wholly contained in its predecessor (pure duplicate
    * training data), so the last chunk is the one that reaches the
    * final token. Empty/whitespace-only docs produce zero chunks.
    * Pure column algebra (sequence → transform/slice → posexplode):
    * codegen'd, no UDF, and engine-portable (the x31 oracle re-derives
    * every chunk). Returns (idCol, chunk_idx, chunk_text,
    * chunk_tokens). */
  def chunk(docs: DataFrame, window: Int, stride: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0,
      s"chunk: window and stride must be positive, got ($window, $stride)")
    val tks = tokens(col(textCol))
    val n = size(col("__tks"))
    docs
      .select(col(idCol), tks.as("__tks"))
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0),
            greatest(n - lit(window - stride + 1), lit(0)), lit(stride)),
          st => struct(
            array_join(slice(col("__tks"), st + 1, lit(window)), " ").as("text"),
            // no second slice: the clamped length is derivable
            least(lit(window), n - st).as("n")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.text").as("chunk_text"),
        col("col.n").cast("long").as("chunk_tokens"))
      // tokens("") is [""] (split semantics): drop the phantom chunk
      // an empty doc would otherwise emit
      .filter(col("chunk_text") =!= "")
  }

  /** BPE-ish sub-token estimate: whitespace tokens + extra splits at
    * letter/digit and case boundaries approximated by ceil(chars/4) —
    * the standard ~4-chars-per-token heuristic, as a codegen'd column. */
  def bpeTokenEstimate(text: Column): Column =
    greatest(ceil(length(text) / 4.0).cast("long"), lit(0L))

  /** Tiny per-language stopword lists for the n-gram/stopword
    * language-ID heuristic. Deterministic, public common words. */
  val StopwordLists: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"))

  /** Count how many array elements belong to a fixed small vocabulary. */
  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Language-ID: argmax of stopword hit counts across languages.
    * Score ties resolve to the lexicographically LAST language code
    * (greatest over (score, lang) structs); only zero hits fall back
    * to "und" (undetermined). The x03 oracle mirrors this. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = StopwordLists.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hits(t, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Repetition ratio in [0,1): fraction of w-token shingles that are
    * duplicates (1 - distinct/total). High values flag boilerplate /
    * TEMPLATE spam — the Gopher-style repetition quality signal. Docs
    * shorter than w tokens score 0. Pure column math; the single
    * division is bit-identical across engines (no sum ordering). */
  def repetitionRatio(text: Column, w: Int = 2): Column = {
    val t = tokens(text)
    val total = size(t) - (w - 1)
    // capture-free windows (Dedup.shingleWindows): an element_at(t, …)
    // lambda would re-tokenize per element once projections collapse
    val sh = transform(Dedup.shingleWindows(t, w), arr => array_join(arr, " "))
    when(total <= 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / total)
  }

  /** Quality score in [0,1]: blend of length sanity, alpha ratio and
    * stopword density — the standard cheap pre-filter for LLM corpora. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val meanTokLen = (length(text).cast("double") + 1.0) / (nTok + 1.0)
    val stopRatio = hits(t, StopwordLists("en")).cast("double") / greatest(nTok, lit(1.0))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_chars_m", length(text).cast("long"))
      .withColumn("mean_token_len", meanTokLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("quality_score",
        least(lit(1.0), nTok / lit(50.0)) * lit(0.4)
          + when(meanTokLen.between(3.0, 12.0), 0.3).otherwise(0.0)
          + least(stopRatio * 3.0, lit(1.0)) * lit(0.3))
  }

  /** Per-group ADAPTIVE quality gate — keep each doc at or above its
    * OWN group's pct-quantile of the quality score (the FineWeb /
    * Gopher practice: one absolute threshold over-prunes clean
    * domains and under-prunes spammy ones, so each domain/language
    * competes against itself). Scores are [[qualityFeatures]]'s blend
    * floored to integer ppm, and the per-group threshold is
    * `percentile_disc` — an ACTUAL element of the group (smallest
    * value with cume_dist ≥ pct), no interpolation arithmetic — so
    * scores, thresholds and verdicts all re-derive bit-identically on
    * any engine. Returns (doc_id, group, score_ppm, thr_ppm, kept);
    * the curated corpus is `filter(kept)`.
    *
    * Scale shape: scoring is map-only column math; the threshold agg
    * collapses to |groups| rows that broadcast back onto the scored
    * corpus — the corpus itself never shuffles. `percentile_disc`
    * holds one group's values per agg buffer; a single group with
    * billions of rows should gate on [[graft.ext.Profiling]]'s
    * sampled quantiles instead (the x49 machinery). */
  def adaptiveQualityFilter(docs: DataFrame, groupCol: String,
                            pct: Double = 0.25,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(pct > 0.0 && pct < 1.0,
      s"adaptiveQualityFilter: pct in (0,1), got $pct")
    val scored = qualityFeatures(
        docs.select(col(idCol).as("doc_id"), col(groupCol), col(textCol)),
        textCol)
      .select(col("doc_id"), col(groupCol),
        floor(col("quality_score") * lit(1000000.0)).cast("long")
          .as("score_ppm"))
    val thr = scored.groupBy(groupCol)
      .agg(expr(s"percentile_disc($pct) WITHIN GROUP (ORDER BY score_ppm)")
        .cast("long").as("thr_ppm"))
    scored.join(broadcast(thr), Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("score_ppm"),
        col("thr_ppm"), (col("score_ppm") >= col("thr_ppm")).as("kept"))
  }

  /** Sequential token-budget packing — the "concat-and-chunk" rule
    * pretraining pipelines use to fill context windows: docs are laid
    * out in `orderCol` order inside each partition group and each doc
    * joins the pack its FIRST token falls into
    * (pack_id = floor(preceding-token-total / budget)). Pure integer
    * window math — deterministic and engine-exact.
    *
    * Scale: the window partitions by `partitionCols` (packing is
    * per-split/per-shard in practice, never global); a single
    * billion-doc group would need a range-partitioned two-pass cumsum
    * instead of one window partition. */
  def packByTokenBudget(df: DataFrame, budget: Long,
                        partitionCols: Seq[String],
                        orderCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
      .withColumn("pack_id",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(budget.toDouble))
          .cast("long"))
  }

  /** Self-trained bigram predictability score — the deterministic
    * stand-in for an n-gram LM perplexity filter (the quality gate a
    * training pipeline runs between dedup and packing): train bigram
    * counts on the corpus itself, then score each document by the mean
    * conditional frequency of its bigrams. The weight per bigram is
    * the integer-quantized conditional probability
    * `count(w1,w2) * 1e6 DIV count(w1,·)` so every partial sum is
    * exact BIGINT arithmetic (engine-portable, order-independent);
    * the per-doc mean is the single final float division.
    *
    * Output: (doc_id, n_bigrams, pred_sum, pred_score) for docs with
    * at least one bigram. Scale: the bigram STREAM never shuffles on
    * strings — both the count aggregation and the weight join key on
    * `xxhash64(w1, w2)` (8 bytes vs two arbitrary-length tokens;
    * collision probability ~n²/2⁶⁵ is below the hardware-error floor
    * for any real vocabulary), and the conditional denominator keys on
    * `xxhash64(w1)` — token strings never survive the map side; AQE
    * broadcast-joins the vocabulary-sized weight table when small.
    * The oracle twin keeps the raw
    * (w1, w2) pair join — a hash collision would surface as a hash
    * mismatch there. The BIGINT weight assumes count(w1,w2) ≤ ~9e12
    * (1e19 / 1e6). */
  def bigramPredictability(df: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      tokens(normalize(col(textCol))).as("t"))
    // adjacent pairs without a self-join: zip the first n-1 tokens
    // with the last n-1 (empty docs normalize to a single "" token ->
    // slice(t, 1, 0) = [] -> no bigrams). The lambda must reference
    // ONLY its own arguments: an outer-capture formulation like
    // element_at(t, i+2) inlines the whole tokenize chain into every
    // element evaluation once filters/aliases substitute `t` — i.e.
    // O(tokens) regex re-normalizations per document (measured 35s vs
    // ~2s for this query at sf0.1).
    // materialized ONCE (the noveltyScore pattern): the stream feeds
    // both the count aggregation and the weight join, and without the
    // checkpoint each consumer re-runs the regex normalization +
    // explode over every document
    // the checkpointed stream is ALL 8-byte keys — the token strings
    // die at the map side (k keys the bigram, h1 keys the conditional
    // denominator), so the materialized block and every downstream
    // shuffle carry 24 bytes/row regardless of token length
    val bi = toks
      .withColumn("bg", expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
          " (x, y) -> struct(x AS w1, y AS w2))"))
      .select(col("doc_id"), explode(col("bg")).as("b"))
      .select(col("doc_id"),
        xxhash64(col("b.w1"), col("b.w2")).as("k"),
        xxhash64(col("b.w1")).as("h1"))
      .localCheckpoint()
    // groupBy the 8-byte key; h1 rides along via first() — legal
    // because every row in a k-group carries the identical (w1, w2)
    // (xxhash64 treated as injective per the scaladoc analysis, for
    // h1 exactly as for k).
    val cb = bi.groupBy("k")
      .agg(count(lit(1)).as("cb"), first("h1").as("h1"))
    val cp = cb.groupBy("h1").agg(sum("cb").as("cp"))
    // integer DIV (not `/` + cast): bit-identical to the oracle's `//`
    val wt = cb.join(cp, "h1")
      .withColumn("q", expr("CAST(cb * 1000000 DIV cp AS BIGINT)"))
      .select("k", "q")
    bi.select("doc_id", "k").join(wt, Seq("k"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("q").as("pred_sum"))
      .withColumn("pred_score", col("pred_sum").cast("double") / col("n_bigrams"))
  }

  /** Train a count-ratio linear text classifier — the engine-portable
    * stand-in for the fastText-style quality/domain filter every
    * published pretraining recipe runs over its crawl (the classifier
    * itself is a bag-of-words linear model; only the training
    * objective differs). Weight of a term = its class purity minus
    * the corpus base rate, in integer ppm: (positive occurrences ×
    * 1e6) DIV occurrences − (all positive occurrences × 1e6) DIV all
    * occurrences — a term scores positive iff it is MORE positive-
    * class-associated than the prior, so per-doc sums have a
    * meaningful sign even on unbalanced labels (centering on a fixed
    * 500000 would push every weight negative whenever the positive
    * class is a minority). A naive-Bayes-shaped score with NO
    * logarithm, so (unlike log-odds, whose ln() is libm-bound) every
    * engine derives the identical weight table. Terms in fewer than
    * `minDf` distinct docs are pruned (hapax noise dominates
    * otherwise — and pruning is what keeps the vocabulary
    * broadcast-small at corpus scale). Returns (term, df, weight_ppm).
    *
    * Scale shape: one token-count aggregation (8-byte-ish rows) — the
    * classic map-side-combined wordcount — then a distinct-doc count;
    * output is vocabulary-sized, i.e. tiny next to the corpus. */
  def trainLinearWeights(df: DataFrame, labelCol: Column,
                         idCol: String = "doc_id", textCol: String = "text",
                         minDf: Int = 2): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), labelCol.as("y"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .localCheckpoint() // feeds the vocab agg AND the base-rate agg
    val base = tok.agg(
      expr("CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000000" +
        " DIV count(1) AS BIGINT)").as("base"))
    tok.groupBy("term")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(base))
      .select(col("term"), col("df"),
        (expr("CAST(pos * 1000000 DIV cnt AS BIGINT)") - col("base"))
          .as("weight_ppm"))
  }

  /** Score documents under a [[trainLinearWeights]] weight table:
    * per-doc sum of its tokens' weights (bag-of-words dot product,
    * out-of-vocabulary tokens contribute 0), predicted = score > 0.
    * Returns (doc_id, n_tokens, n_scored, score_ppm, predicted).
    * All-integer, so the decision boundary is exact on any engine —
    * the property a filter-the-corpus gate needs (a float score
    * flips boundary docs between runs).
    *
    * Scale shape: the weight table is vocabulary-sized → broadcast;
    * scoring is explode + map-side-combinable per-doc aggregation —
    * the corpus text itself never shuffles (token/weight pairs die at
    * the map side). */
  def scoreLinear(df: DataFrame, weights: DataFrame,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    tok.join(broadcast(weights.select("term", "weight_ppm")),
        Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("weight_ppm")).as("n_scored"),
        coalesce(sum("weight_ppm"), lit(0L)).as("score_ppm"))
      .withColumn("predicted", col("score_ppm") > 0)
  }

  /** Per-group score calibration — quality scores are NOT comparable
    * across sources (a fastText-style classifier scores books higher
    * than forums wholesale), so recipes gate on the WITHIN-SOURCE
    * percentile instead of the raw score: this replaces each row's
    * score with its integer-ppm percentile rank inside its group
    * (`pct_ppm = rows-strictly-below · 1e6 DIV group-rows` — the
    * empirical CDF, ties share a rank), computed WITHOUT sorting the
    * corpus: one map-side-combined (group, score) histogram, a
    * cumulative window over the histogram only, verdicts broadcast
    * back map-only (the selectByBudget execution shape). All-integer,
    * so a threshold like `pct_ppm >= 900000` ("top decile of every
    * source") cuts identically on any engine. */
  def calibrateByGroup(df: DataFrame, groupCol: String,
                       scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol).as("__g"), col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    val wh = Window.partitionBy("__g").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = hist
      .withColumn("__below", coalesce(sum("__n").over(wh), lit(0L)))
      .withColumn("__tot", sum("__n").over(Window.partitionBy("__g")))
      .select(col("__g"), col("__s"),
        expr("__below * 1000000 DIV __tot").as("pct_ppm"))
    df.join(broadcast(ranks),
        df(groupCol) === ranks("__g") && df(scoreCol) === ranks("__s"))
      .drop("__g", "__s")
  }

  /** Greedy left-to-right single-pair merge over a symbol array — the
    * BPE merge step as a codegen'd fold: when the accumulator's last
    * symbol is `a` and the next is `b`, replace the last with `a+b`
    * (try_element_at on the empty accumulator is null — ANSI-mode
    * element_at would throw — so the first symbol always appends). */
  private def bpeMergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** (word, cnt, syms): the corpus word histogram with each word
    * char-split — BPE training state. Training on the HISTOGRAM, not
    * the corpus, is the classic trick that makes tokenizer training
    * cheap at 100 TB: one wordcount shuffle collapses the corpus to a
    * vocabulary-sized table and every merge round runs on that. */
  private def bpeWordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(normalize(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("w"), ""))

  /** Train a byte-pair-encoding merge table on the corpus (the
    * tokenizer-training leg of a pretraining pipeline, à la
    * Sennrich et al. 2016): `rounds` iterations of count-adjacent-
    * symbol-pairs (weighted by word frequency, all positions) →
    * merge the most frequent pair everywhere (greedy left-to-right).
    * Returns (round, lhs, rhs, merged, cnt), the merge table in
    * application order.
    *
    * Deterministic on any engine: counts are exact BIGINTs and the
    * per-round argmax tie-breaks on (count DESC, lhs, rhs) over the
    * ASCII symbols [[normalize]] emits — so the x58 oracle re-derives
    * the identical merge sequence with chained CTEs. Per round ONE
    * row is collected (the argmax pair — the same driver-scalar shape
    * as mixtureSample's rate derivation); everything else stays
    * distributed, and the state table is vocabulary-sized. */
  def learnBpeMerges(df: DataFrame, rounds: Int,
                     textCol: String = "text"): DataFrame = {
    require(rounds > 0, s"learnBpeMerges: rounds must be positive, got $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    var cur = bpeWordHistogram(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    // per-round plans are structurally unique -> run interpreted below
    // the codegen-worthwhile threshold (the kmeans/Lloyd gate)
    graft.SparkConfs.maybeInterpreted(spark, cur.count()) {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = cur
          .select(col("cnt"), explode(expr(
            "zip_with(slice(syms, 1, size(syms)-1)," +
              " slice(syms, 2, size(syms)-1)," +
              " (x, y) -> struct(x AS a, y AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true // every word fully merged
        else {
          val (a, b, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r, a, b, a + b, c))
          cur = cur.withColumn("syms", bpeMergeFold(col("syms"), a, b))
            .localCheckpoint()
          r += 1
        }
      }
    }
    merges.toSeq.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** Encode the corpus under a [[learnBpeMerges]] merge table: apply
    * every merge in round order to each word, greedy left-to-right.
    * Returns (doc_id, n_words, n_bpe) — whitespace-word count and
    * BPE-token count per document (docs that normalize to nothing
    * count 0/0). The concatenation of a word's final symbols always
    * equals the word (spec-pinned invariant).
    *
    * Scale shape: each DISTINCT word is encoded once (vocabulary-
    * sized work, like training) and broadcast back onto the word
    * stream — the corpus itself pays one explode + one map-side-
    * combinable count, never a per-occurrence fold. */
  def applyBpe(df: DataFrame, merges: DataFrame,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect()
    val words = df.select(col(idCol).as("doc_id"),
        explode(tokens(normalize(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
    var uniq = words.select("w").distinct()
      .withColumn("syms", split(col("w"), ""))
    // chain the folds on the vocabulary table; checkpoint every few
    // rounds so the stacked-HOF plan never re-expands
    ms.zipWithIndex.foreach { case ((a, b), i) =>
      uniq = uniq.withColumn("syms", bpeMergeFold(col("syms"), a, b))
      if ((i + 1) % 4 == 0) uniq = uniq.localCheckpoint()
    }
    val enc = uniq.select(col("w"), size(col("syms")).as("n_syms"))
    df.select(col(idCol).as("doc_id"))
      .join(words.join(broadcast(enc), Seq("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_bpe")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"))
  }

  /** Corpus novelty score — the inverse-duplication quality signal:
    * the fraction of a document's distinct w-token shingles that occur
    * in NO other document (corpus shingle-frequency 1). Boilerplate-
    * heavy or templated docs score near 0, original text near 1.
    * One explode + two hash aggregations; counts are exact BIGINTs,
    * the ratio is the single final division. Docs with no shingles
    * (shorter than w tokens) are excluded. */
  def noveltyScore(df: DataFrame, w: Int = 2, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // materialize the shingle projection FIRST (a pre-checkpoint
    // filter/explode would push below it and duplicate the expression)
    val sh = df.select(col(idCol).as("doc_id"),
        Dedup.hashedShingles(col(textCol), w).as("sh"))
      .localCheckpoint()
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .localCheckpoint() // feeds both the df-count and the per-doc agg
    val hdf = sh.groupBy("h").agg(count(lit(1)).as("df"))
    sh.join(hdf, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
  }

  /** Document fingerprints: full-content md5 + winnowing-style minimum
    * shingle fingerprint (lexicographic min of shingle md5s — a
    * deterministic rolling-hash stand-in both Spark and any ANSI SQL
    * engine compute identically). */
  def fingerprint(df: DataFrame, w: Int = 3, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val sh = Dedup.shingles(col(textCol), w)
    df.select(col(idCol),
      md5(col(textCol)).as("content_md5"),
      array_min(transform(sh, x => md5(x))).as("min_shingle_md5"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"))
  }

  /** Persist an inverted text index: `name_postings` (term, doc_id,
    * tf) and `name_df` (term, df), both BUCKETED and sorted on the
    * term — the corpus-search / audit artifact ("which documents
    * contain these terms, ranked") as a LAYOUT, the same
    * index-is-the-layout pattern as the ANN bucketed store and the
    * near-dup band index. A term lookup prunes to its buckets at
    * planning time (`SelectedBucketsCount` — spec-asserted), so a
    * query touches 1/buckets of the postings, never the corpus. */
  def writeInvertedIndex(docs: DataFrame, name: String, buckets: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val postings = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds df, doclen AND the postings write
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // per-doc length + 1-row corpus stats: the length-normalization
    // side of BM25 ([[searchIndexBm25]]) — persisted at build time so
    // a query never scans the corpus for its average document length
    val doclen = postings.groupBy("doc_id")
      .agg(sum("tf").cast("long").as("dl"))
    val stats = doclen.agg(count(lit(1)).cast("long").as("n_docs"),
      sum("dl").cast("long").as("total_len"))
    // _tombstones/_delmarks drop too: a REBUILD invalidates all prior
    // delete state — leaving them would darken freshly-built docs
    // (stale tombstones) and short-circuit re-issued delete batches
    // whose retraction segments the rebuild just erased (stale marks)
    Seq(s"${name}_postings", s"${name}_df", s"${name}_doclen",
        s"${name}_stats", s"${name}_epochs",
        s"${name}_tombstones", s"${name}_delmarks").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // orphaned managed location from a previous JVM (same hazard as
      // Dedup.writeBandIndex — DROP only reaches the live catalog)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // four INDEPENDENT writes off the checkpointed postings — overlap
    // them (guide §2.6; Par.run): a fresh build has no inter-table
    // commit-order contract (unlike append/delete, which keep their
    // pinned sequential recovery semantics)
    Par.run(Seq(
      () => postings.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${name}_postings"),
      () => dfreq.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${name}_df"),
      () => doclen.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .format("parquet").saveAsTable(s"${name}_doclen"),
      () => stats.write.mode(SaveMode.Overwrite)
        .format("parquet").saveAsTable(s"${name}_stats")))
    ()
  }

  /** Fold a NEW batch (ids disjoint from the indexed corpus) into a
    * [[writeInvertedIndex]] layout — the appendBandIndex economics for
    * text retrieval: the batch's postings/doclen rows land as
    * additional bucket-tagged files (nothing rewritten, the corpus is
    * never re-tokenized), and the df/stats tables append SEGMENT rows
    * that the query side aggregates (`SUM(df)` per term over a
    * term-bucketed table — no exchange; stats is a segments-sized
    * sum). Search-after-N-appends == search over a from-scratch
    * rebuild (spec-pinned + the x136 oracle), so a daily crawl
    * increment costs batch-sized work, not a corpus re-index. */
  def appendInvertedIndex(docs: DataFrame, name: String,
                          idCol: String = "doc_id",
                          textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val buckets = spark.sql(s"DESCRIBE FORMATTED ${name}_postings")
      .filter(col("col_name") === "Num Buckets")
      .select("data_type").head().getString(0).trim.toInt
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val postings = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val doclen = postings.groupBy("doc_id")
      .agg(sum("tf").cast("long").as("dl"))
    val stats = doclen.agg(count(lit(1)).cast("long").as("n_docs"),
      sum("dl").cast("long").as("total_len"))
    // the four segment appends overlap (guide §2.6; Par.run): there is
    // no inter-table commit ORDER in the append contract — a crash
    // strictly inside the append sequence leaves a torn segment that
    // needs a rebuild regardless of which table landed first (the
    // boundary documented above), and the epoch marker that makes the
    // batch durable commits strictly AFTER all four either way
    Par.run(Seq(
      () => postings.write.mode(SaveMode.Append)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${name}_postings"),
      () => dfreq.write.mode(SaveMode.Append)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${name}_df"),
      () => doclen.write.mode(SaveMode.Append)
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .format("parquet").saveAsTable(s"${name}_doclen"),
      () => stats.write.mode(SaveMode.Append)
        .format("parquet").saveAsTable(s"${name}_stats")))
    ()
  }

  /** [[appendInvertedIndex]] gated for exactly-once application under
    * foreachBatch's at-least-once replay: a `${name}_epochs` sidecar
    * table records committed epochs, and a replayed epoch (restart
    * from checkpoint after the batch function succeeded but before
    * the sink commit landed — the common replay) short-circuits
    * before touching the index. The marker commits AFTER the four
    * segment appends; a crash strictly inside the append sequence
    * leaves a torn segment that needs a rebuild (documented — the
    * same boundary Dedup.streamingNearDup declares; closing it fully
    * needs a transactional table format). */
  def ingestIndexBatch(batch: DataFrame, name: String, epoch: Long,
                       idCol: String = "doc_id",
                       textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val epochsTable = s"${name}_epochs"
    if (spark.catalog.tableExists(epochsTable) &&
        spark.table(epochsTable).filter(col("epoch") === epoch)
          .head(1).nonEmpty)
      return // epoch already committed — replay is a no-op
    appendInvertedIndex(batch, name, idCol, textCol)
    spark.range(1).select(lit(epoch).as("epoch"))
      .write.mode(SaveMode.Append).format("parquet")
      .saveAsTable(epochsTable)
  }

  /** Streaming ingestion for the inverted index — the third
    * application of the engine's probe/append streaming pattern
    * (Dedup.streamingNearDup for minhash, Similarity
    * .streamingEmbeddingNearDup for vectors; this one feeds the BM25
    * index): each micro-batch tokenizes ONLY ITSELF and folds in via
    * [[ingestIndexBatch]] (bucket-tagged postings/doclen files plus
    * df/stats segment rows — batch-sized work, the corpus is never
    * re-tokenized), epoch-gated so a checkpoint-restart replay
    * applies exactly once. Search-after-stream equals the from-raw
    * rebuild (StreamingSpec pins accumulated == one-shot AND the
    * double-append replay; the x138 oracle re-derives the full
    * corpus). */
  def streamingIndexIngest(name: String, stream: DataFrame,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       epoch: Long) =>
        ingestIndexBatch(batch, name, epoch, idCol, textCol)
    }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** DELETE leg of the [[writeInvertedIndex]] lifecycle (r11 verdict
    * #2 — build/append/stream existed, nothing could retract): marks
    * `ids` deleted WITHOUT rewriting the index. Three batch-sized
    * writes make every later search equal a from-scratch rebuild on
    * the remaining corpus (the x156 oracle):
    *
    *  - a `${name}_tombstones` row per id — probes anti-join it
    *    (broadcast-small: the live tombstone set is bounded by the
    *    delete traffic since the last [[compactInvertedIndex]]);
    *  - NEGATIVE df segment rows — one postings pass keyed by the
    *    broadcast delete batch prices the per-term retraction, so
    *    the query-side `SUM(df)` stays corpus-accurate;
    *  - a NEGATIVE stats row from the deleted docs' doclen rows
    *    (doc_id-bucketed — the scan prunes to the batch's buckets).
    *
    * Idempotent AND torn-replay-repairing (r12 advice): the batch's
    * identity is an order-free 64-bit fold of its distinct id set
    * (deterministic across foreachBatch replays), tombstone rows are
    * stamped with it, and a `${name}_delmarks` sidecar records each
    * retraction stage as it commits. A replay of a fully-applied
    * batch short-circuits on the final mark (StreamingSpec pins
    * double-delete == single); a replay of a TORN delete (crash
    * after the tombstone commit) re-derives the batch's owned id set
    * FROM its stamped tombstones and COMPLETES the missing df/stats
    * retractions instead of short-circuiting — the old tombstone-only
    * guard converted that retryable tear into permanent score drift.
    * Residual boundary: a crash exactly between a retraction write
    * and its mark append double-retracts that one table on replay — a
    * two-job window (vs the old whole-tail window) that
    * [[compactInvertedIndex]] still repairs exactly; closing it fully
    * needs a transactional table format. Deleted ids are RETIRED —
    * re-appending one is undefined until a compaction clears its
    * tombstone (the standard log-structured id contract). */
  def deleteIndexDocs(spark: SparkSession, name: String, ids: DataFrame,
                      idCol: String = "doc_id"): Unit = {
    val tombTable = s"${name}_tombstones"
    val marksTable = s"${name}_delmarks"
    val idsNorm = ids.select(col(idCol).cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    // order-free fold of the id set, decimal-routed: a bare BIGINT
    // sum of full-range xxhash64 values overflows ANSI arithmetic
    // once the batch passes a few hundred ids (caught at sf0.1 —
    // the sf0.01 batch's random walk happened to stay in range)
    val aggRow = idsNorm
      .agg(coalesce(sum(xxhash64(col("doc_id")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")),
        count(lit(1)))
      .head()
    val batchHash = aggRow.getDecimal(0).toBigInteger
      .mod(java.math.BigInteger.valueOf(Long.MaxValue)).longValue()
    // the batch SIZE joins the identity (r13 advice): two distinct
    // delete batches must now collide on the 63-bit fold AND their
    // cardinality before a replay can wrongly short-circuit
    val batchN = aggRow.getLong(1)
    def marked(stage: String): Boolean =
      spark.catalog.tableExists(marksTable) && {
        val m = spark.table(marksTable)
        val sized = // pre-r14 marks carry no batch_n — match hash-only
          if (m.columns.contains("batch_n"))
            m.filter(col("batch_n") === batchN)
          else m
        sized.filter(col("batch_hash") === batchHash &&
            col("stage") === stage)
          .head(1).nonEmpty
      }
    def mark(stage: String): Unit =
      spark.range(1).select(lit(batchHash).as("batch_hash"),
          lit(batchN).as("batch_n"), lit(stage).as("stage"))
        .write.mode(SaveMode.Append).format("parquet")
        .saveAsTable(marksTable)
    if (marked("stats")) return // fully applied — replay is a no-op
    // orphaned managed locations from a previous JVM (the writeInverted
    // Index hazard): the catalog forgot the table but its directory
    // survives, and CREATE TABLE AS would refuse the location
    for (tbl <- Seq(tombTable, marksTable)
         if !spark.catalog.tableExists(tbl)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // ids tombstoned BY THIS BATCH on a prior torn attempt: the
    // replay must redo their retractions, not anti-join them away
    val owned =
      if (spark.catalog.tableExists(tombTable))
        spark.table(tombTable).filter(col("batch_hash") === batchHash)
          .select("doc_id")
      else idsNorm.limit(0)
    val replayTorn = owned.head(1).nonEmpty
    // r13 advice: a fold collision that misattributes another batch's
    // tombstones as "ours" is detectable here — the owned set would
    // differ from the incoming ids. Batch-bounded symmetric diff.
    if (replayTorn) {
      val mismatched = owned.unionAll(idsNorm).groupBy("doc_id")
        .agg(count(lit(1)).as("c")).filter(col("c") === 1)
        .head(1).nonEmpty
      if (mismatched)
        System.err.println(s"[graft] deleteIndexDocs($name): torn-replay " +
          s"batch $batchHash owns tombstones outside the incoming id set " +
          "— possible batch-identity collision; completing with the OWNED set")
    }
    val fresh = (if (replayTorn) owned
      else if (spark.catalog.tableExists(tombTable))
        idsNorm.join(spark.table(tombTable), Seq("doc_id"), "left_anti")
      else idsNorm).localCheckpoint() // one evaluation serves 3 writes
    if (fresh.isEmpty) return
    val buckets = spark.sql(s"DESCRIBE FORMATTED ${name}_postings")
      .filter(col("col_name") === "Num Buckets")
      .select("data_type").head().getString(0).trim.toInt
    // tombstones commit FIRST (docs go dark immediately — no ghost
    // rows in any failure window), stamped with the batch hash so a
    // torn replay can reclaim its id set
    if (!replayTorn)
      fresh.withColumn("batch_hash", lit(batchHash))
        .write.mode(SaveMode.Append)
        .format("parquet").saveAsTable(tombTable)
    // retraction segments ride the SAME bucketed layout the appends
    // use, so the query-side SUM folds them with no extra exchange
    if (!marked("df")) {
      spark.table(s"${name}_postings")
        .join(broadcast(fresh), Seq("doc_id"))
        .groupBy("term").agg((-count(lit(1))).cast("long").as("df"))
        .write.mode(SaveMode.Append)
        .bucketBy(buckets, "term").sortBy("term")
        .format("parquet").saveAsTable(s"${name}_df")
      mark("df")
    }
    if (!marked("stats")) {
      spark.table(s"${name}_doclen")
        .join(broadcast(fresh), Seq("doc_id"))
        .agg((-count(lit(1))).cast("long").as("n_docs"),
          (-coalesce(sum("dl"), lit(0L))).cast("long").as("total_len"))
        .write.mode(SaveMode.Append)
        .format("parquet").saveAsTable(s"${name}_stats")
      mark("stats")
    }
  }

  /** Streaming DELETE maintenance for the inverted index — the
    * retraction twin of [[streamingIndexIngest]], the shape a
    * right-to-be-forgotten feed actually arrives in: each micro-batch
    * of doc ids folds in via [[deleteIndexDocs]]. No epoch sidecar is
    * needed: the batch-hash marker protocol makes a fully-applied
    * replay a no-op AND lets a replay of a TORN delete complete the
    * missing df/stats retractions (see [[deleteIndexDocs]] for the
    * residual two-job boundary compaction repairs). Search after the
    * stream equals the rebuild on the remaining corpus
    * (StreamingSpec pins it). */
  def streamingIndexDeletes(name: String, stream: DataFrame,
                            idCol: String = "doc_id",
                            checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       _: Long) =>
        deleteIndexDocs(batch.sparkSession, name, batch, idCol)
    }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Anti-join `df` against the index's live tombstones (no-op when
    * none exist). The tombstone side broadcasts: it is bounded by
    * deletes since the last compaction, never corpus-sized. */
  private def dropTombstoned(spark: SparkSession, name: String,
                             df: DataFrame): DataFrame = {
    val tombTable = s"${name}_tombstones"
    if (spark.catalog.tableExists(tombTable))
      df.join(broadcast(spark.table(tombTable)), Seq("doc_id"), "left_anti")
    else df
  }

  /** COMPACTION leg: physically drop tombstoned postings, collapse
    * the df/stats segment piles to canonical one-row-per-key tables,
    * and clear the tombstone table — after it, the on-disk layout is
    * byte-equivalent in CONTENT to a fresh [[writeInvertedIndex]] of
    * the remaining corpus (x158 hash-pins search-after-compaction ==
    * rebuild oracle), and probes stop paying the anti-join. One
    * corpus-postings pass: df/doclen/stats re-derive from the
    * surviving postings (map-side-combinable aggs), so the rewrite
    * never re-tokenizes text. */
  def compactInvertedIndex(spark: SparkSession, name: String): Unit = {
    // recovery-first (r13 advice): heal any table stranded in the
    // DROP→RENAME window of a crashed prior compaction BEFORE reading
    // anything — this function consumes all four tables ahead of its
    // first swap, so the per-swap recovery alone would come too late
    for (t <- Seq("postings", "df", "doclen", "stats"))
      TableSwaps.recoverTable(spark, s"${name}_$t")
    // no-op fast path (r12 advice, matching compactBinaryIndex /
    // compactIvfPq): with no tombstones AND no df/stats segment piles
    // (stats holds exactly its build-time row) the layout is already
    // canonical — skip the four-table rewrite entirely
    if (!spark.catalog.tableExists(s"${name}_tombstones") &&
        spark.table(s"${name}_stats").count() == 1L) return
    val buckets = spark.sql(s"DESCRIBE FORMATTED ${name}_postings")
      .filter(col("col_name") === "Num Buckets")
      .select("data_type").head().getString(0).trim.toInt
    // one evaluation feeds the four staged tables (efficiency only —
    // since the staging swap below, nothing overwrites what it reads)
    val p = dropTombstoned(spark, name, spark.table(s"${name}_postings"))
      .localCheckpoint()
    val dfreq = p.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val doclen = p.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
      .localCheckpoint()
    val stats = doclen.agg(count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum("dl"), lit(0L)).cast("long").as("total_len"))
    // crash-safe swap (the compactCodesDir contract for catalog
    // tables): each canonical table lands in a __compacting staging
    // table FIRST, then DROP + RENAME swaps it in. Every mid-sequence
    // state answers queries correctly: until the tombstone drop at
    // the very end, probes still anti-join (a no-op against compacted
    // postings) and un-swapped segment tables still SUM to the same
    // values the canonical rewrite pins. The one recovery window is
    // between a DROP and its RENAME — the complete staging table is
    // on disk under ${table}__compacting.
    // The four STAGING writes are independent of one another and never
    // touch a live table — overlap them (guide §2.6; Par.run). The
    // swaps stay sequential so at most one table is ever in the
    // DROP→RENAME recovery window, exactly the crash story the
    // recovery-first preamble and its specs pin.
    Par.run(Seq(
      () => TableSwaps.stageTable(spark, s"${name}_postings")(st =>
        p.write.bucketBy(buckets, "term").sortBy("term")
          .format("parquet").saveAsTable(st)),
      () => TableSwaps.stageTable(spark, s"${name}_df")(st =>
        dfreq.write.bucketBy(buckets, "term").sortBy("term")
          .format("parquet").saveAsTable(st)),
      () => TableSwaps.stageTable(spark, s"${name}_doclen")(st =>
        doclen.write.bucketBy(buckets, "doc_id").sortBy("doc_id")
          .format("parquet").saveAsTable(st)),
      () => TableSwaps.stageTable(spark, s"${name}_stats")(st =>
        stats.write.format("parquet").saveAsTable(st))))
    Seq("postings", "df", "doclen", "stats")
      .foreach(t => TableSwaps.commitSwap(spark, s"${name}_$t"))
    spark.sql(s"DROP TABLE IF EXISTS ${name}_tombstones")
    // delete-batch markers refer to retractions that no longer exist
    // post-compaction; a replay of one of those batches against the
    // compacted layout re-tombstones physically-absent docs and
    // retracts empty sets — harmless no-ops the next compaction clears
    spark.sql(s"DROP TABLE IF EXISTS ${name}_delmarks")
  }

  /** Rank documents for a bag of query terms against a
    * [[writeInvertedIndex]] layout: score = Σ_term tf·10⁶ DIV df
    * (reciprocal-df weighting, x23's ranking in INTEGER micro-units —
    * a BIGINT sum is partition-order independent, so the ranking is
    * engine-exact where a floating Σ tf/df would drift with addition
    * order). Ties break on doc_id. The term filter prunes index
    * buckets at planning time; only matched postings ever move. */
  def searchIndex(spark: SparkSession, name: String, terms: Seq[String],
                  k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "searchIndex: empty term list")
    val p = dropTombstoned(spark, name, spark.table(s"${name}_postings")
      .filter(col("term").isin(terms: _*)))
    // SUM over segment rows ([[appendInvertedIndex]] appends one df
    // row per term per batch); term-bucketed, so the groupBy needs no
    // exchange, and a never-appended index sums one row to itself
    val d = spark.table(s"${name}_df")
      .filter(col("term").isin(terms: _*))
      .groupBy("term").agg(sum("df").as("df"))
    p.join(d, "term")
      .withColumn("contrib", expr("tf * 1000000 DIV df"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score_ppm"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25-shaped ranking against a [[writeInvertedIndex]] layout — the
    * standard retrieval scorer with its length normalization, made
    * ENGINE-EXACT: at k1 = 1.2, b = 0.75 the per-term score
    * idf · tf(k1+1) / (tf + k1(1−b+b·dl/avgdl)) clears all fractions
    * when multiplied through by 10·avgdl, giving
    * `idf_ppm · 22·tf·avgdl DIV (10·avgdl·tf + 3·avgdl + 9·dl)` —
    * integers end to end (the one product that can cross 2⁶³ at 100 TB
    * doc counts is decimal-routed). Two documented deviations from
    * textbook BM25, both monotone so rankings keep BM25's shape:
    * the Robertson log-idf is replaced by the log-free ratio
    * `(N−df)·10⁶ DIV df` (libm ln is not engine-portable — the x95
    * collocations/PMI treatment), and avgdl quantizes to whole tokens
    * (`total_len DIV n_docs`, identically derived by any engine from
    * the persisted stats row).
    *
    * Scale shape: the term filter prunes postings/df buckets at
    * planning time; the doclen join touches only MATCHED docs (the
    * doclen table is doc_id-bucketed — exchange on the matched-postings
    * side only); corpus stats are a persisted 1-row read. */
  def searchIndexBm25(spark: SparkSession, name: String, terms: Seq[String],
                      k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "searchIndexBm25: empty term list")
    // segments-sized sum: appendInvertedIndex adds one stats row per
    // batch; the fold keeps N and avgdl corpus-accurate without a
    // corpus scan
    val st = spark.table(s"${name}_stats")
      .agg(sum("n_docs"), sum("total_len")).head()
    // an all-empty corpus writes (0, NULL) stats — degrade, don't NPE
    val nDocs = if (st.isNullAt(0)) 0L else st.getLong(0)
    val avgdl = math.max(
      if (nDocs == 0 || st.isNullAt(1)) 1L else st.getLong(1) / nDocs, 1L)
    val p = dropTombstoned(spark, name, spark.table(s"${name}_postings")
      .filter(col("term").isin(terms: _*)))
    val d = spark.table(s"${name}_df")
      .filter(col("term").isin(terms: _*))
      .groupBy("term").agg(sum("df").as("df"))
    val dl = spark.table(s"${name}_doclen")
    p.join(d, "term").join(dl, "doc_id")
      .withColumn("idf_ppm", expr(s"(${nDocs}L - df) * 1000000 DIV df"))
      .withColumn("contrib", expr(
        s"CAST(CAST(idf_ppm AS DECIMAL(38,0)) * (22 * tf * ${avgdl}L) DIV " +
          s"(10 * ${avgdl}L * tf + 3 * ${avgdl}L + 9 * dl) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the
    * standard hybrid-retrieval combiner (BM25 ∪ ANN ∪ anything that
    * emits a ranking): each candidate scores Σ_lists 10⁶ DIV
    * (k + rank), which rewards appearing NEAR THE TOP of several
    * rankers without ever comparing their incomparable raw scores.
    * Integer micro-units end to end (the published 1/(k+r) sum is a
    * float whose addition order is engine-dependent; the DIV form
    * re-derives bit-identically), ties break on doc_id. Inputs are
    * (idCol, rankCol) tables — top-k lists, bounded by construction,
    * so the global fuse window sorts ≤ Σ list sizes, never a corpus.
    * Returns (doc_id, rrf_micro, n_lists, rank) for the fused top
    * `topK`. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10,
              idCol: String = "doc_id",
              rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k >= 1 && topK >= 1, "rrfFuse: k >= 1, topK >= 1")
    val all = rankings.map(_.select(col(idCol).as("doc_id"),
      col(rankCol).cast("long").as("rank"))).reduce(_ unionAll _)
    val scored = all
      .withColumn("contrib", expr(s"1000000L DIV (${k}L + rank)"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("rrf_micro"), count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("doc_id", "rrf_micro", "n_lists", "rank")
  }

  /** The hashed trigram stream shared by [[trigramBackoffScore]]'s
    * train and score legs: one row per trigram position with the
    * xxhash64 keys of all backoff levels (trigram, conditioning
    * bigram, backoff bigram, conditioning unigram, target unigram).
    * Token strings die at the map side — every downstream shuffle
    * carries five 8-byte keys (same injectivity argument as
    * [[bigramPredictability]]; the raw-string oracle would surface a
    * collision as a hash mismatch). Docs under 3 tokens contribute no
    * rows (`greatest(size-2, 0)` keeps the slice length legal). */
  private def trigramStream(df: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        tokens(normalize(col(textCol))).as("t"))
      // capture-free lambdas (the x33 lesson): bodies reference ONLY
      // their own arguments, so filter pushdown cannot inline the
      // tokenize chain into per-element evaluation
      .withColumn("p12", expr(
        "zip_with(slice(t, 1, greatest(size(t)-2, 0))," +
          " slice(t, 2, greatest(size(t)-2, 0))," +
          " (x, y) -> struct(x AS w1, y AS w2))"))
      .withColumn("tg", expr(
        "zip_with(p12, slice(t, 3, greatest(size(t)-2, 0))," +
          " (p, z) -> struct(p.w1 AS w1, p.w2 AS w2, z AS w3))"))
      .select(col("doc_id"), explode(col("tg")).as("g"))
      .select(col("doc_id"),
        xxhash64(col("g.w1"), col("g.w2"), col("g.w3")).as("k3"),
        xxhash64(col("g.w1"), col("g.w2")).as("h12"),
        xxhash64(col("g.w2"), col("g.w3")).as("k23"),
        xxhash64(col("g.w2")).as("h2"),
        xxhash64(col("g.w3")).as("h3"))

  /** Trigram stupid-backoff LM scoring — the CCNet-style perplexity
    * filter shape (train a reference LM on a trusted slice, score the
    * whole crawl, bucket). Unlike [[bigramPredictability]] (self-
    * trained, so every n-gram is in-vocabulary) the TRAIN and SCORE
    * corpora differ, which is what makes backoff real: a scored
    * trigram unseen in the reference falls to the bigram level at
    * stupid-backoff weight 0.4, then to the unigram level at 0.16,
    * then to 0 — all integer micro-units
    * (`c3·10⁶ DIV c12`, `c23·4·10⁵ DIV c2`, `c1·16·10⁴ DIV N`), so
    * per-doc sums are exact BIGINT and the mean is integer DIV:
    * bit-identical under any partitioning and in DuckDB. Counts are
    * slot-defined on the trigram stream (the conditioning bigram is
    * slots 1-2, the backoff bigram slots 2-3) — self-consistent and
    * mirrored exactly by the oracle.
    *
    * Scale: the reference stream aggregates to three vocabulary-sized
    * weight tables (AQE broadcasts them); the score corpus shuffles
    * only 8-byte keys and never joins anything its own size. Returns
    * (doc_id, n_trigrams, score_sum, mean_q) for docs with ≥ 1
    * trigram. */
  def trigramBackoffScore(train: DataFrame, score: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val (wTri, wBi, wUni) = lmWeights(train, idCol, textCol)
    scoreWithWeights(score, wTri, wBi, wUni, idCol, textCol)
  }

  /** The three backoff weight tables of [[trigramBackoffScore]]'s
    * reference LM — (k3, q_tri), (k23, q_bi), (h3, q_uni), all
    * vocabulary-sized. */
  private def lmWeights(train: DataFrame, idCol: String,
                        textCol: String): (DataFrame, DataFrame, DataFrame) = {
    // materialized once: the stream feeds ONE corpus-sized aggregation
    val ref = trigramStream(train, idCol, textCol).localCheckpoint()
    val nRef = ref.count()
    require(nRef > 0, "trigramBackoffScore: reference corpus has no trigrams")
    // Aggregate the corpus-sized trigram stream EXACTLY ONCE (guide
    // §2.3 aggregate-before-shuffle): k3 = xxhash64(w1,w2,w3)
    // determines the trigram, so h12/k23/h2/h3 are functionally
    // dependent on it (the same injectivity assumption the original
    // first("h12") already made) and every lower-order count is a
    // VOCABULARY-sized sum of n3 — n12 = Σ n3 by h12, n23 = Σ n3 by
    // k23, n2 = Σ n23 by h2, n1 = Σ n3 by h3 are each exactly the
    // row counts the previous five corpus-sized groupBys computed.
    // 5 corpus exchanges → 1; checkpointed because three weight
    // tables (and their writes) re-read it.
    val c3 = ref.groupBy("k3")
      .agg(count(lit(1)).as("n3"), first("h12").as("h12"),
        first("k23").as("k23"), first("h2").as("h2"), first("h3").as("h3"))
      .localCheckpoint()
    val c12 = c3.groupBy("h12").agg(sum("n3").as("n12"))
    val wTri = c3.join(c12, "h12")
      .select(col("k3"), expr("CAST(n3 * 1000000 DIV n12 AS BIGINT)").as("q_tri"))
    val c23 = c3.groupBy("k23")
      .agg(sum("n3").as("n23"), first("h2").as("h2"))
    val c2 = c23.groupBy("h2").agg(sum("n23").as("n2"))
    val wBi = c23.join(c2, "h2")
      .select(col("k23"), expr("CAST(n23 * 400000 DIV n2 AS BIGINT)").as("q_bi"))
    val wUni = c3.groupBy("h3").agg(sum("n3").as("n1"))
      .select(col("h3"),
        expr(s"CAST(n1 * 160000 DIV CAST($nRef AS BIGINT) AS BIGINT)").as("q_uni"))
    (wTri, wBi, wUni)
  }

  private def scoreWithWeights(score: DataFrame, wTri: DataFrame,
                               wBi: DataFrame, wUni: DataFrame,
                               idCol: String, textCol: String): DataFrame =
    trigramStream(score, idCol, textCol)
      .select("doc_id", "k3", "k23", "h3")
      .join(wTri, Seq("k3"), "left")
      .join(wBi, Seq("k23"), "left")
      .join(wUni, Seq("h3"), "left")
      .withColumn("q", coalesce(col("q_tri"), col("q_bi"), col("q_uni"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum("q").as("score_sum"))
      .withColumn("mean_q", expr("CAST(score_sum DIV n_trigrams AS BIGINT)"))

  /** Persist [[trigramBackoffScore]]'s reference LM as three bucketed
    * weight tables (`name_tri`/`name_bi`/`name_uni`, bucketed+sorted
    * on their 8-byte key) — the train-once/score-forever layout: a
    * scoring batch joins the standing tables with a probe-side-only
    * exchange (the [[writeInvertedIndex]]/BucketedStore economics),
    * and the corpus that trained the LM is never re-read. */
  def writeLmWeights(name: String, train: DataFrame,
                     buckets: Int = 8, idCol: String = "doc_id",
                     textCol: String = "text"): Unit = {
    val spark = train.sparkSession
    Seq(s"${name}_tri", s"${name}_bi", s"${name}_uni").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // orphaned managed location from a previous JVM (the
      // writeInvertedIndex hazard — DROP only reaches the live catalog)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val (wTri, wBi, wUni) = lmWeights(train, idCol, textCol)
    // three INDEPENDENT writes off the checkpointed trigram counts —
    // overlap them (guide §2.6; Par.run), same rationale as
    // [[writeInvertedIndex]]'s build leg
    Par.run(Seq(
      () => wTri.write.mode(SaveMode.Overwrite).bucketBy(buckets, "k3")
        .sortBy("k3").format("parquet").saveAsTable(s"${name}_tri"),
      () => wBi.write.mode(SaveMode.Overwrite).bucketBy(buckets, "k23")
        .sortBy("k23").format("parquet").saveAsTable(s"${name}_bi"),
      () => wUni.write.mode(SaveMode.Overwrite).bucketBy(buckets, "h3")
        .sortBy("h3").format("parquet").saveAsTable(s"${name}_uni")))
    ()
  }

  /** Score a batch against a persisted [[writeLmWeights]] LM —
    * bit-identical to [[trigramBackoffScore]] with the same train
    * corpus (spec-pinned), without re-deriving the weights. */
  def scoreWithLm(spark: SparkSession, name: String, batch: DataFrame,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    scoreWithWeights(batch, spark.table(s"${name}_tri"),
      spark.table(s"${name}_bi"), spark.table(s"${name}_uni"),
      idCol, textCol)

  /** Continuous LM scoring over a document stream: each micro-batch
    * scores against the standing [[writeLmWeights]] tables and its
    * verdicts land in `outDir/epoch=N/` (per-epoch Overwrite —
    * idempotent under foreachBatch's at-least-once replay; the
    * [[graft.ext.Dedup.streamingNearDup]] pattern, minus the index
    * append since scoring never mutates the LM). Accumulated epochs
    * equal one-shot batch scoring of the same rows (StreamingSpec
    * pins it). */
  def streamingLmScore(name: String, stream: DataFrame, outDir: String,
                       idCol: String = "doc_id", textCol: String = "text",
                       checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        scoreWithLm(batch.sparkSession, name, batch, idCol, textCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/epoch=$epoch")
        ()
    }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** CCNet-style head/middle/tail bucketing of an LM score, per
    * group: tail = bottom quartile, head = top quartile, middle = the
    * rest. Thresholds are ACTUAL elements via percentile_disc (the
    * proven x96 idiom — quartile boundaries, not CCNet's thirds, so
    * the disc semantics match the engine pair exactly as q19/x96
    * already pin), broadcast back; the corpus never re-shuffles. */
  def perplexityBuckets(scored: DataFrame, groupCol: String,
                        valueCol: String = "mean_q"): DataFrame = {
    val thr = scored.groupBy(groupCol).agg(
      expr(s"percentile_disc(0.25) WITHIN GROUP (ORDER BY $valueCol)")
        .cast("long").as("p25"),
      expr(s"percentile_disc(0.75) WITHIN GROUP (ORDER BY $valueCol)")
        .cast("long").as("p75"))
    scored.join(broadcast(thr), Seq(groupCol))
      .withColumn("bucket",
        when(col(valueCol) <= col("p25"), lit("tail"))
          .when(col(valueCol) > col("p75"), lit("head"))
          .otherwise(lit("middle")))
      .drop("p25", "p75")
  }

  /** Per-source corpus diversity card — the governance report that
    * catches mode collapse in a training mix (synthetic or over-
    * deduped slices show depressed type-token ratios and inflated
    * top-token shares): per source, exact token/type counts for
    * unigrams and bigrams, hapax count, and all-integer ppm ratios
    * (type-token ratio, bigram TTR, top-token share). Everything
    * derives from two map-side-combined count aggregations over
    * 8-byte hashed tokens (the x33 injectivity argument; the oracle
    * counts raw strings) — output is sources × 9 integers, tiny.
    *
    * DECIMAL(38,0) routing on the ppm multiplies is unnecessary here:
    * distinct ≤ tokens and tokens·10⁶ < 2⁶³ up to ~9·10¹² tokens per
    * source — beyond that, route like [[collocations]]. */
  def diversityCard(df: DataFrame, groupCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
        tokens(normalize(col(textCol))).as("t"))
      .localCheckpoint()
    val uni = toks.select(col("grp"), explode(col("t")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("grp"), xxhash64(col("w")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("grp").agg(
        count(lit(1)).as("distinct_unigrams"),
        sum("n").as("n_tokens"),
        count(when(col("n") === 1, 1)).as("hapax_unigrams"),
        max("n").as("top_n"))
    val bi = toks
      .withColumn("bg", expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
          " (x, y) -> struct(x AS w1, y AS w2))"))
      .select(col("grp"), explode(col("bg")).as("b"))
      .where(col("b.w1") =!= "" && col("b.w2") =!= "")
      .groupBy(col("grp"), xxhash64(col("b.w1"), col("b.w2")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("grp").agg(
        count(lit(1)).as("distinct_bigrams"),
        sum("n").as("n_bigrams"))
    val nDocs = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    nDocs.join(uni, Seq("grp"), "left").join(bi, Seq("grp"), "left")
      .na.fill(0L, Seq("distinct_unigrams", "n_tokens", "hapax_unigrams",
        "top_n", "distinct_bigrams", "n_bigrams"))
      .withColumn("ttr_ppm",
        expr("CAST(distinct_unigrams * 1000000 DIV greatest(n_tokens, 1) AS BIGINT)"))
      .withColumn("bigram_ttr_ppm",
        expr("CAST(distinct_bigrams * 1000000 DIV greatest(n_bigrams, 1) AS BIGINT)"))
      .withColumn("top_share_ppm",
        expr("CAST(top_n * 1000000 DIV greatest(n_tokens, 1) AS BIGINT)"))
      .withColumnRenamed("grp", groupCol)
      .drop("top_n")
  }

  /** Frequency-of-frequencies vocabulary card — the Good-Turing /
    * Zipf diagnostic of a corpus (how much of the vocabulary is
    * hapax? is the low-count mass Zipfian or templated?): for each
    * term count c ≤ `maxC`, the number of distinct terms occurring
    * exactly c times plus its share of the whole vocabulary in
    * integer ppm. Good-Turing smoothing and OOV-rate estimates read
    * straight off these N_c rows.
    *
    * Scale shape: one token explode + two hashed aggregations (the
    * term-frequency shuffle moves 8-byte xxhash64 keys, never
    * strings — the x102 economics); the counts-of-counts table is
    * tiny and the vocabulary total arrives as a 1-row broadcast. */
  def vocabFreqCard(df: DataFrame, smallest: Int = 20,
                    textCol: String = "text"): DataFrame = {
    val tf = df.select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(xxhash64(col("w")).as("h")).agg(count(lit(1)).as("c"))
    val fof = tf.groupBy("c").agg(count(lit(1)).as("n_terms"))
      .localCheckpoint() // feeds both the low-count slice and the total
    val vocab = fof.agg(sum("n_terms").cast("long").as("vocab"))
    // the `smallest` LOWEST counts PRESENT (not a fixed c <= K cut —
    // a templated corpus may have no hapax at all); fof is counts-of-
    // counts sized, so the top-k is a partial TakeOrdered, never a sort
    fof.orderBy("c").limit(smallest)
      .crossJoin(broadcast(vocab))
      .select(col("c"), col("n_terms"),
        expr("n_terms * 1000000 DIV vocab").as("vocab_share_ppm"))
  }

  /** Heaps-law vocabulary-growth curve: cumulative distinct-term count
    * vs cumulative token count at `buckets` equal-width doc-id
    * checkpoints — the scaling-law card that answers "does vocabulary
    * keep growing if we ingest 10× more of this source, or has it
    * saturated?" (dedup'd corpora saturate; templated ones flatline
    * immediately). `vocab_per_mtok` is the integer-ppm growth gauge.
    *
    * Scale shape: prefix-distinct WITHOUT rescanning prefixes — ONE
    * corpus-sized hashed aggregation to (term-hash, checkpoint)
    * counts (8-byte keys, map-side partial counts), from which both
    * curve legs (token totals; first-checkpoint-per-term mins) derive
    * on the vocab×buckets-sized table. The cumulative window runs
    * over ≤ `buckets` rows (single tiny partition by construction,
    * same economics as [[vocabFreqCard]]'s counts-of-counts tail). */
  def heapsCurve(df: DataFrame, buckets: Int = 10,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0, "heapsCurve: buckets must be positive")
    // single-scalar lookup (allowed collect class): the id domain
    // bound that fixes checkpoint widths
    val maxId = df.agg(max(col(idCol).cast("long"))).head.getLong(0)
    val span = maxId / buckets + 1
    val tok = df.select((col(idCol).cast("long") / span).cast("int").as("b"),
        explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
    // ONE corpus-sized aggregation: per-(term, checkpoint) counts
    // (vocab×buckets rows — the only thing worth materializing; never
    // checkpoint the raw token stream itself); both curve legs then
    // derive from this small table
    val tb = tok.groupBy(xxhash64(col("w")).as("h"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val toksPerB = tb.groupBy("b").agg(sum("cnt").cast("long").as("toks"))
    val newTerms = tb.groupBy("h").agg(min("b").as("b"))
      .groupBy("b").agg(count(lit(1)).as("new_terms"))
    val wdw = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toksPerB.join(newTerms, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
      .select(col("b").cast("long").as("checkpoint"),
        sum("toks").over(wdw).cast("long").as("cum_tokens"),
        sum("new_terms").over(wdw).cast("long").as("cum_vocab"))
      .withColumn("vocab_per_mtok",
        expr("cum_vocab * 1000000 DIV greatest(cum_tokens, 1)"))
  }

  /** Zipf rank-frequency card: the term frequency at probe ranks 1,
    * 2, 4, …, 2^`maxLogRank` plus the rank·frequency product (constant
    * under an ideal Zipf fit — a doubling product means a fatter-than-
    * Zipf tail, a collapsing one means templating). Integer-only, so
    * the card hash-matches an oracle; no float log fits.
    *
    * Scale shape: the rank axis NEVER materializes a ranked vocabulary
    * (no vocab-sized sort/window). Rank r's frequency is read off the
    * counts-of-counts table instead: with fof = (count c, n_terms) and
    * a running Σ n_terms in descending-c order, rank r falls in the
    * first block whose cumulative reaches r, so freq(r) is a probe-
    * range join of ≤ maxLogRank+1 probes against the tiny fof table.
    * The only corpus-sized work is the term-frequency aggregation
    * (8-byte hash shuffle); the window runs over counts-of-counts
    * rows (bounded by the number of DISTINCT frequencies). */
  def zipfCard(df: DataFrame, maxLogRank: Int = 12,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fof = df.select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(xxhash64(col("w")).as("h")).agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n_terms"))
    val wdw = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = fof.select(col("c"),
      sum("n_terms").over(wdw).cast("long").as("cum_terms"),
      (sum("n_terms").over(wdw) - col("n_terms")).cast("long").as("cum_before"))
    val probes = df.sparkSession.range(0, maxLogRank + 1L)
      .select(expr("CAST(1 AS BIGINT) << CAST(id AS INT)").as("rank"))
    probes.join(cum,
        col("rank") > col("cum_before") && col("rank") <= col("cum_terms"))
      .select(col("rank"), col("c").as("freq"),
        (col("rank") * col("c")).as("rank_x_freq"))
      .orderBy("rank")
  }

  /** Gopher-style repetition gates, per document, in integer ppm —
    * the named repetition rules of the published pretraining recipe
    * (Rae 2021 §A1.1: "fraction of {tokens in duplicate n-grams,
    * most-common n-gram}") next to [[repetitionRatio]]'s single
    * float signal:
    *
    *   dup_token_ppm   = 1e6·(n − distinct tokens) div n
    *   top_bigram_ppm  = min(1e6, 1e6·2·(max bigram count) div n)
    *   top_trigram_ppm = min(1e6, 1e6·3·(max trigram count) div n)
    *   passes          = top_bigram ≤ maxTopBigramPpm
    *                     AND top_trigram ≤ maxTopTrigramPpm
    *
    * All integer arithmetic (truncating div, both engines agree on
    * the nonnegative operands), so verdicts hash-match — the
    * "fraction of chars" float form would gate differently per
    * engine at the threshold boundary. Docs shorter than w tokens
    * score 0 for that gate (no n-gram exists to repeat). Default
    * thresholds are Gopher's 0.20 / 0.18.
    *
    * Scale shape: token/distinct counts are map-only column math;
    * each n-gram max is one explode → (doc, shingle-hash) count →
    * (doc) max chain, both aggregations map-side combinable —
    * shingles hash to md5-60bit BEFORE the exchange (the x47 "text
    * never shuffles" treatment; an in-doc collision would only ever
    * merge two counts, and the oracle derives the identical keys),
    * no corpus-wide vocabulary, no window sort. */
  def repetitionCard(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text",
                     maxTopBigramPpm: Long = 200000L,
                     maxTopTrigramPpm: Long = 180000L): DataFrame = {
    // NULL text coalesces to '' BEFORE tokenizing (r11 ADVICE):
    // Spark's non-ANSI size(split(NULL)) yields -1, so n_tokens = -1
    // and the ppm divisions go negative, while the oracle's len(NULL)
    // stays NULL — per-engine verdict divergence. Both engines agree
    // on the ''-degenerate (one empty token).
    val txt = coalesce(col(textCol), lit(""))
    val t = tokens(txt)
    val base = df.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("__nd"))
    def maxNgram(w: Int): DataFrame = {
      val sh = transform(Dedup.shingleWindows(tokens(txt), w),
        arr => array_join(arr, " "))
      df.select(col(idCol),
          explode(when(size(tokens(txt)) < w,
              array().cast("array<string>"))
            .otherwise(sh)).as("sh"))
        .groupBy(col(idCol),
          conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col(idCol)).agg(max("c").as(s"__m$w"))
    }
    base
      .join(maxNgram(2), Seq(idCol), "left")
      .join(maxNgram(3), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        expr("1000000 * (n_tokens - __nd) DIV n_tokens")
          .as("dup_token_ppm"),
        least(lit(1000000L),
          expr("1000000 * (2 * coalesce(__m2, 0)) DIV n_tokens"))
          .as("top_bigram_ppm"),
        least(lit(1000000L),
          expr("1000000 * (3 * coalesce(__m3, 0)) DIV n_tokens"))
          .as("top_trigram_ppm"))
      .withColumn("passes",
        col("top_bigram_ppm") <= maxTopBigramPpm
          && col("top_trigram_ppm") <= maxTopTrigramPpm)
  }
}
