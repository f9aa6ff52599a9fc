package graft.operators

import graft.Tables
import graft.functions.SortedFolds
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus curation verbs (LLM-pipeline mandate, SURVEY §2.3
  * E-DEDUP/E-TEXT neighborhood): deterministic train/val/test splitting,
  * cross-split near-duplicate leakage, benchmark n-gram decontamination,
  * and intra-document repetition screening — the four checks a corpus
  * passes through between "deduplicated" and "ready to train on".
  *
  * Every query is DuckDB-oracle-checkable: the split/threshold
  * arithmetic is engine-neutral integers, and the one engine hash in
  * the file — gram4's xxhash64 token-tuple keys (r11) — never reaches
  * an output column, so the oracles group by the tuple form and agree
  * modulo the documented 64-bit collision bound.
  */
object Curation {

  /** Knuth multiplicative-hash constant (2654435761 = 2^32·φ⁻¹, public
    * domain); (id mod 2³¹−1)·K mod 1000 is a deterministic,
    * engine-neutral bucket. The id is FOLDED to [0, 2³¹−1) before the
    * multiply (r11): a raw id ≥ ~3.48e9 — well within a 100 TB corpus —
    * pushes id·K past 2⁶³, where Spark (non-ANSI) silently wraps while
    * DuckDB raises BIGINT overflow, so the engines would diverge or
    * crash. The folded product caps at (2³¹−2)·K ≈ 5.7e18 < 2⁶³ on both
    * engines, and every fixture id is < 2³¹−1 so recorded bucket values
    * are unchanged. */
  private val SplitMult = 2654435761L

  /** The overflow fold shared by every unbounded-id Knuth site (splitOf,
    * classBalance, TextOps.weightedSample, Relational.replayArrival) and
    * mirrored verbatim in their oracles. */
  private[graft] def knuthFold(id: Column): Column = pmod(id, lit(2147483647L))

  /** Driver-side Long twin of [[knuthFold]] — the specs recompute split/
    * sample/replay hashes locally, and they must pin the FOLDED form: an
    * unfolded spec twin agrees with the engine only while every fixture
    * id is < 2³¹−1, then silently asserts the wrong expected values
    * (r11 second-pass review). */
  private[graft] def knuthFoldLong(id: Long): Long =
    java.lang.Math.floorMod(id, 2147483647L)

  /** Split assignment 90/5/5 by hash bucket — a pure narrow projection.
    * At 100 TB the split is recomputed from the id wherever needed
    * (stateless, no split-table join, no shuffle) — the property that
    * makes hash splits the standard over random draws. */
  private[graft] def splitOf(id: Column): Column = {
    val b = pmod(knuthFold(id) * lit(SplitMult), lit(1000L))
    when(b < 900, lit("train")).when(b < 950, lit("val")).otherwise(lit("test"))
  }

  /** Per-split / per-language corpus accounting: doc and token totals.
    * The report a data curator reads before training — split sizes and
    * language balance in one pass (scan → narrow project → one agg).
    * Token count is the arithmetic space count via `translate`
    * (separators + 1 ≡ `size(split(text, " "))` exactly, empties
    * included on both definitions) — no per-row token-array
    * materialization. At fixture scale the query is scan/overhead-bound
    * either way (measured flat); the allocation-free form is for the
    * 100 TB scan, where per-row array churn is pure GC. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(splitOf(col("doc_id")).as("split"), col("lang"),
        (length(col("text")) - length(translate(col("text"), " ", ""))
          + 1L).cast("long").as("toks"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .orderBy("split", "lang")

  /** Cross-split near-duplicate leakage: MinHash-LSH candidate pairs
    * (TextOps.minhashPairs — the engine's dedup edge set) whose two docs
    * land in DIFFERENT splits. A train/test near-dup silently inflates
    * eval scores; this is the audit that catches it. Scale shape is
    * inherited from minhashPairs (band-key equi-join, no all-pairs); the
    * split columns are recomputed from the ids — zero extra joins. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    TextOps.minhashPairs(spark, dir)
      .select(col("d1"), col("d2"),
        splitOf(col("d1")).as("split1"), splitOf(col("d2")).as("split2"))
      .filter(col("split1") =!= col("split2"))
      .orderBy("d1", "d2")

  /** Benchmark decontamination: train-split docs sharing any word
    * 4-gram with the test split, with the shared-gram count. The
    * standard pre-training hygiene pass (eval n-grams must not appear in
    * training text). 4-grams come from [[gram4]] as 8-byte xxhash64
    * token-tuple codes (r11 reshape — no gram string is materialized).
    *
    * Scale shape (reworked round 7 per the r6 watch item): the test
    * split's distinct-gram set is NOT broadcast — at 100 TB a 5% split's
    * 4-gram vocabulary is far past any broadcast threshold. Instead a
    * Bloom sketch of xxhash64(test grams) prunes the train side BEFORE
    * its shuffle (the Scale.bloomSemiJoin pattern: fixed-size sketch in
    * the task closure, false positives cleared by the exact equi-join
    * behind it, false negatives impossible), and the join itself is left
    * unhinted for AQE to pick shuffle-vs-broadcast from runtime sizes.
    * Cost: ONE extra pass over the 5% split (the bloom agg); the sketch
    * is sized from the parquet row count (metadata-only) times a
    * tokens-per-doc bound rather than an exact distinct-gram count — an
    * overestimate only makes the filter a little larger, never less
    * correct. Payoff: the 95% train side sheds non-candidate grams
    * pre-shuffle. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val grams = gram4(Tables.documents(spark, dir))
    // persisted: the distinct test-gram set feeds BOTH the eager bloom
    // build and the exact join probe — without the persist each consumer
    // re-tokenizes and re-shuffles the test split (the r9 profile showed
    // the bloom job alone at ~0.4 s of the query's 1.25 s). The set is
    // benchmark-suite sized (the 100 TB story: eval corpora are the
    // SMALL side by construction), and MEMORY_AND_DISK spills rather
    // than OOMs if a pathological split inverts that. Bench's
    // clearCache() between queries drops it.
    val testGrams = grams.filter(splitOf(col("doc_id")) === "test")
      .select("gram").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // gram4 keys are already 8-byte xxhash64 codes — the bloom consumes
    // them directly (the old string form hashed here)
    val hashed = testGrams.select(col("gram").as("gk"))
    // test split ≈ 5% of docs, ≤ ~200 grams each; 1% fpp at this size is
    // a few hundred KB — overshooting the estimate is harmless. The doc
    // count comes from the parquet FOOTERS (driver-side metadata read, no
    // Spark job) so sizing the sketch never adds a scan to the query.
    // The estimate is CAPPED at 1e8 items (~120 MB of driver sketch):
    // rows×10 scales linearly with the corpus and would ask for ~120 GB
    // at 1e10 docs — a driver OOM before any pruning (r11 review).
    // Past the cap the fpp degrades GRACEFULLY: the bloom prunes less,
    // the exact equi-join behind it still clears every false positive,
    // correctness is unchanged. (A production decontamination pass sizes
    // from the actual eval-suite gram count — eval corpora are fixed
    // suites, not a 5% hash slice of the corpus like this fixture demo.)
    val estGrams = math.max(1000L, math.min(100000000L,
      Tables.parquetRowCount(spark, dir, "documents") * 10L))
    // a sentinel row keeps the build side non-empty: an empty test-gram
    // set (tiny corpus whose 5% hash slice caught no docs, or an empty
    // fixture) NPEs Spark's bloomFilter aggregate on a null buffer
    // (empty-input sweep). The phantom key only adds its fpp worth of
    // false positives, which the exact equi-join behind the bloom clears
    // like every other false positive — no extra job, no emptiness probe
    // in the hot path (xxhash64 output can collide with the sentinel,
    // harmlessly, for the same reason).
    val buildIn = hashed.unionByName(
      spark.range(1).select(lit(Long.MinValue).as("gk")))
    val bf = buildIn.stat.bloomFilter("gk", expectedNumItems = estGrams, fpp = 0.01)
    grams.filter(splitOf(col("doc_id")) === "train")
      .filter(graft.functions.MightContainLong.mightContainLong(
        col("gram"), bf))
      .join(testGrams, "gram")
      .groupBy("doc_id")
      // grams is already distinct per doc, so count(*) = distinct grams hit
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** q_overlap_frac: pairwise contamination verdicts — for each
    * (test doc, train doc) pair sharing ≥ 1 word 4-gram, the FRACTION of
    * the test doc's distinct grams the train doc contains; pairs at
    * ≥ 30% are the actionable rows. This is the per-pair criterion real
    * decontamination applies (contamination counts shared grams per
    * train doc; this answers "shared with WHOM, and how much of the eval
    * item leaked"). Fan-out is the gram-postings join — same bounded
    * shape as the contamination join, grouped to pair cardinality before
    * anything wide; the test side's gram totals are a dim-sized
    * aggregate joined back on doc id. */
  def overlapFraction(spark: SparkSession, dir: String): DataFrame = {
    val grams = gram4(Tables.documents(spark, dir))
    val test = grams.filter(splitOf(col("doc_id")) === "test")
      .select(col("doc_id").as("test_doc"), col("gram"))
    val train = grams.filter(splitOf(col("doc_id")) === "train")
      .select(col("doc_id").as("train_doc"), col("gram"))
    val totals = test.groupBy("test_doc")
      .agg(count(lit(1)).as("n_test_grams")) // grams are distinct per doc
    test.join(train, "gram")
      .groupBy("test_doc", "train_doc")
      .agg(count(lit(1)).as("n_shared"))
      .join(totals, "test_doc")
      .filter(col("n_shared") * 10 >= col("n_test_grams") * 3) // exact 30% test
      .select(col("test_doc"), col("train_doc"), col("n_shared"),
        col("n_test_grams"),
        round(col("n_shared").cast("double") / col("n_test_grams"), 4)
          .as("overlap_frac"))
      .orderBy("test_doc", "train_doc")
  }

  /** Class-balanced deterministic downsample accounting (q_class_balance):
    * per event_type, a hash-bucket keep-threshold computed from a
    * per-class row target, so rare classes keep everything and common
    * classes downsample toward the target — the class-rebalancing verb a
    * training pipeline runs before fitting on skewed label distributions.
    *
    * Selection is the [[splitOf]] discipline: keep a row iff
    * `(event_id·K) mod 10000 < threshold`, threshold =
    * `min(10000, (10000·target) div n_class)` — pure integer arithmetic
    * both engines compute identically, stateless (recomputable anywhere
    * from the id, no sample-table join), and exact (thresholds derive
    * from integer division, never float rates). Two passes by necessity:
    * class counts first (5-row broadcast), then the keep-count under
    * each class's threshold. At 100 TB both passes are partial-aggregable
    * scans; the selection itself never shuffles. */
  def classBalance(spark: SparkSession, dir: String): DataFrame = {
    val target = 2000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        pmod(knuthFold(col("event_id")) * lit(SplitMult), lit(10000L)).as("bkt"))
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n_total"))
      .withColumn("threshold",
        least(lit(10000L), expr(s"(10000 * $target) div n_total")))
    ev.join(broadcast(counts), "event_type")
      .groupBy("event_type")
      .agg(min("n_total").as("n_total"), min("threshold").as("threshold"),
        sum(when(col("bkt") < col("threshold"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_rate",
        round(col("n_kept").cast("double") / col("n_total"), 4))
      .orderBy("event_type")
  }

  /** N-gram novelty per document (q_novelty): the fraction of a doc's
    * distinct word 4-grams seen in NO earlier document (doc_id order) —
    * the "marginal contribution" audit behind dataset-growth decisions:
    * a crawl increment whose docs score near 0 adds volume, not
    * information. first-seen owner = min(doc_id) per gram — one partial-
    * aggregable gram aggregate joined back onto the (doc, gram) postings
    * (the contamination join shape); docs with no 4-grams (< 4 tokens)
    * have no rows, matching the oracle CTE. */
  def gramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = gram4(Tables.documents(spark, dir))
    val first = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
    grams.join(first, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 4))
      .orderBy("doc_id")
  }

  /** Distinct (doc_id, gram) word 4-grams, keyed by the 8-byte
    * `xxhash64` of the token TUPLE — the q_repeated_grams r10 reshape
    * applied to the whole gram4 family: no gram STRING is ever
    * materialized (the old form concatenated ~30-byte strings in two
    * chained zip_with lambdas and then shuffled them), the per-doc
    * distinct compares fixed-width longs, and every downstream shuffle /
    * join / bloom in contamination, overlapFraction and gramNovelty
    * carries longs. None of the three consumers outputs a gram value, so
    * the oracles (which group by the string/tuple form) agree modulo the
    * usual 64-bit-sketch collision risk (~m²/2⁶⁵ — ~10⁻⁹ even at 10⁹
    * distinct grams), the bound the MinHash/fingerprint family already
    * accepts. `t` is bound to a column attribute before the lambda (the
    * TextOps.shingleCodes recomputed-outer-reference trap); docs with
    * < 4 tokens are filtered (sequence(1, n) DESCENDS for n < 1 — the
    * winnow lesson), matching the old empty-slice drop. */
  private def gram4(docs: DataFrame): DataFrame = {
    val withToks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 4)
    withToks.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("t")) - 3),
        j => xxhash64((0 to 3).map(k => element_at(col("t"), j + k)): _*))))
        .as("gram"))
  }

  /** Intra-document repetition screen (the Gopher-style repeated-n-gram
    * quality gate): per-source micro-averaged duplicate-bigram mass and
    * the count of docs over the 10% repetition threshold. Ratios divide
    * exact BIGINT sums (never averaged doubles), so both engines produce
    * bit-identical results. One narrow projection + one agg.
    *
    * The per-doc distinct runs over 8-byte `xxhash64(tok_i, tok_{i+1})`
    * codes, not concatenated bigram STRINGS (the q_repeated_grams
    * reshape, r10): `array_distinct` compares fixed-width longs instead
    * of variable-length text, and no gram string is ever materialized.
    * Collisions are the usual 64-bit-sketch risk (~m²/2⁶⁵ for an
    * m-token doc — ~10⁻¹⁵ at m=200), the bound the MinHash/fingerprint
    * family already accepts. */
  def repetitionScreen(spark: SparkSession, dir: String): DataFrame = {
    val withToks = Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), " ").as("t"))
    val g2 = withToks.select(col("source"),
      zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => xxhash64(a, b)).as("g2"))
    g2.select(col("source"),
        size(col("g2")).cast("long").as("n_grams"),
        size(array_distinct(col("g2"))).cast("long").as("n_distinct"))
      .filter(col("n_grams") > 0)
      .withColumn("rep", lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(lit(1.0) - sum("n_distinct").cast("double") / sum("n_grams"), 4)
          .as("avg_rep"),
        sum(when(col("rep") > 0.1, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy("source")
  }

  /** Privacy-release audit (q_kanon): k-anonymity + l-diversity across a
    * three-step generalization ladder, the report a data-release review
    * reads before publishing a table keyed on quasi-identifiers. QI =
    * (c_nationkey, acctbal band); the band widens per level (500 → 2000 →
    * dropped entirely), trading utility for anonymity; sensitive
    * attribute = c_mktsegment. Per level: group count, min k, groups with
    * k < 5, re-identification risk mass (rows living in k<5 groups,
    * exact BIGINT ratio rounded once), min l (distinct sensitive values
    * in a group) and the homogeneous-group count (l = 1 ⇒ the sensitive
    * value leaks even when k is large — Machanavajjhala et al. 2007).
    *
    * Scale shape: each level is scan → narrow project → hash-agg on the
    * QI key (partial-aggregable; group cardinality ≪ rows) → a
    * group-count-sized second agg. The three levels union AFTER full
    * aggregation, so the tall input is read once per level with no join,
    * window, or driver data; at 100 TB each pass is a plain shuffled
    * count. Reference analog: the user table released to views.py:41
    * (login_detail exposes name/phone rows verbatim — the engine adds
    * the audit the reference never runs). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    def level(name: String, qi: Seq[(String, Column)]): DataFrame =
      cust.select(col("c_mktsegment").as("sens") +: qi.map { case (n, c) => c.as(n) }: _*)
        .groupBy(qi.map { case (n, _) => col(n) }: _*)
        .agg(count(lit(1)).as("k"), countDistinct(col("sens")).as("l"))
        .agg(
          count(lit(1)).as("n_groups"),
          min("k").as("min_k"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("n_risky_groups"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).as("risk_rows"),
          round(sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("double")
            / sum("k"), 4).as("risk_rate"),
          min("l").as("min_l"),
          sum(when(col("l") === 1, 1L).otherwise(0L)).as("n_homog_groups"))
        .select(lit(name).as("level"), col("n_groups"), col("min_k"),
          col("n_risky_groups"), col("risk_rows"), col("risk_rate"),
          col("min_l"), col("n_homog_groups"))
    val nation = col("c_nationkey").cast("long")
    level("L0_band500", Seq("nation" -> nation,
        "band" -> floor(col("c_acctbal") / 500)))
      .unionAll(level("L1_band2000", Seq("nation" -> nation,
        "band" -> floor(col("c_acctbal") / 2000))))
      .unionAll(level("L2_nation", Seq("nation" -> nation)))
      .orderBy("level")
  }

  /** q_stratified: deterministic stratified sample — exactly ⌈n/10⌉
    * documents per source, chosen by md5(doc_id) rank so the draw is
    * reproducible across engines, reruns, and partitionings (no RNG
    * state, no seed plumbing). The keep test is the integer form
    * 10·rn ≤ n+9 ⇔ rn ≤ ⌈n/10⌉ — no double fraction is ever compared.
    * This is the per-stratum-exact companion to Curation.splitAssign's
    * stateless hash split: split gives expected rates, this gives exact
    * counts (what an eval-set builder needs).
    *
    * Scale shape: one window per stratum (partitioned on source), a
    * stratum-sized sort on the 32-hex md5 key. At 100 TB strata a
    * two-pass variant replaces the rank: broadcast per-stratum counts,
    * then keep rows whose hash falls below the per-stratum threshold
    * quantile of the hash space — O(1) per row, approximately exact,
    * same deterministic draw. The rank form here IS the spec for it. */
  def stratifiedExact(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("source")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(wAll))
      .filter(col("rn") * 10 <= col("n_stratum") + 9)
      .select(col("source"), col("rn"), col("doc_id"), col("n_stratum"))
      .orderBy("source", "rn")
  }

  /** q_domain_cap: absolute per-domain document cap — the RefinedWeb /
    * C4-style composition rule (Penedo et al. 2023): no source may
    * contribute more than K documents, the kept K drawn UNIFORMLY by a
    * deterministic hash (not "first K seen", which at corpus scale means
    * "whatever crawl shard arrived first"). Complements
    * [[stratifiedExact]]: that keeps a PROPORTIONAL 10% per stratum;
    * this clamps an ABSOLUTE ceiling, the anti-head-domain rule (a 10%
    * sample of a 10⁹-doc domain is still 10⁸ docs).
    *
    * Scale shape — and why this is NOT the window form: row_number over
    * (partition by source) sorts every hot domain's full document list
    * on one reducer. The cap here runs as [[graft.functions
    * .TopKAggregator]] (score = −hash, so top-k desc ≡ k smallest
    * hashes): each map partition keeps at most K rows per source before
    * the shuffle, so the exchange carries O(|sources|·K) rows no matter
    * how hot the domain — the q_topk_agg sketch-not-fact discipline.
    * Survivors (a |sources|·K-row frame) broadcast back onto the fact
    * scan to hydrate payload columns.
    *
    * Determinism: the selection key is the q_wsample integer hash
    * ((fold(doc_id)·Knuth) mod 1000003 — exact in long on both engines);
    * hash ties break by doc_id ascending, mirroring the aggregator's
    * (score desc, id asc) order. The hash value round-trips through the
    * Scored.score double losslessly (< 2²⁰ ≪ 2⁵³). */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val sess = spark
    import sess.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val K = 10
    val docs = Tables.documents(spark, dir)
    val topk = TopKAggregator(K)
    // null cap keys fail LOUDLY with a named error (the GreedyNmsPlan
    // null-geometry discipline): the typed tuple encoder would reject a
    // null doc_id anyway, but with a generic NOT_NULL_ASSERT_VIOLATION
    // that names neither the operator nor the remedy. Coalesce is lazy,
    // so raise_error evaluates only on an actually-null key.
    def keyed(c: Column, what: String, tpe: String): Column = coalesce(c,
      raise_error(lit(s"domainCap: null $what — cap keys must be non-null " +
        "(filter or impute upstream)")).cast(tpe))
    val kept = docs
      .select(keyed(col("source"), "source", "string").as("source"),
        keyed(col("doc_id"), "doc_id", "bigint").as("doc_id"))
      .select(col("source"), col("doc_id"),
        pmod(knuthFold(col("doc_id")) * SplitMult, lit(1000003L)).as("h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => Scored(-r._3.toDouble, r._2))
      .agg(topk.toColumn)
      .flatMap { case (src, top) =>
        top.zipWithIndex.map { case (s, i) =>
          (src, (i + 1).toLong, s.id, (-s.score).toLong)
        }
      }
      .toDF("source", "rank", "doc_id", "hkey")
    docs.select(col("doc_id"), col("n_chars"))
      .join(broadcast(kept), Seq("doc_id"))
      .select(col("source"), col("rank"), col("doc_id"), col("hkey"), col("n_chars"))
      .orderBy("source", "rank")
  }

  /** q_dsir: data-selection importance weights (the DSIR recipe, Xie et
    * al. 2023, with unigram features): every document is scored by the
    * average per-token log-likelihood ratio between a TARGET corpus
    * (here the English split — the "domain we want more of") and the
    * full raw corpus, both as add-1-smoothed unigram models over the
    * shared corpus vocabulary. High avg_llr ⇒ the doc looks like the
    * target; a curation pipeline resamples raw data ∝ exp(score). This
    * composes q_lm_score's per-token scoring with q_mix's
    * domain-balance goal into the selection verb between them.
    *
    * Determinism (the q_entropy/q_lm_score fold discipline): each ln
    * input is an exact integer ratio ((ct+1)/(Nt+V), (c+1)/(N+V)); the
    * per-doc sum folds over the token-SORTED list so addition order is
    * a total order on both engines; one division by n_tokens and one
    * round(4) close it.
    *
    * Scale shape: both model frames are vocabulary-sized aggregates
    * (partial-aggregable); the per-doc join is tf⋈vocab on the token
    * key (hash-distributed); the three corpus scalars ride in via a
    * broadcast one-row cross join. Nothing fact-sized is sorted or
    * collected — the same shape q_lm_score already benches. */
  def dsirScore(spark: SparkSession, dir: String): DataFrame =
    dsirScoreUnsorted(spark, dir).orderBy("doc_id")

  private def dsirScoreUnsorted(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
    val corpus = tf.groupBy("tok").agg(sum("tf").as("c"))
    val target = tf.filter(col("lang") === "en")
      .groupBy("tok").agg(sum("tf").as("ct"))
    val vocab = corpus.join(target, Seq("tok"), "left")
      .select(col("tok"), col("c"), coalesce(col("ct"), lit(0L)).as("ct"))
    val scalars = vocab.agg(sum("c").as("n"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    // per-token LLR term computed HERE, in a codegen'd projection (two
    // lns per (doc, tok) row), not inside the array fold — the lmScore
    // r11 lesson: HOF lambdas evaluate interpreted, so leaving the
    // ln/divide/multiply in the fold charges the whole importance-model
    // math to the interpreter. The order-pinned ADD is the compiled
    // SortedTermSum kernel (token-sorted, same struct natural order the
    // r11 array_sort used — per-group-unique tok makes the sort total),
    // so avg_llr stays bit-identical to the oracle.
    tf.join(vocab, "tok")
      .crossJoin(broadcast(scalars))
      .withColumn("term",
        col("tf") *
          (log((col("ct") + 1) / (col("nt") + col("v")).cast("double"))
            - log((col("c") + 1) / (col("n") + col("v")).cast("double"))))
      .groupBy("doc_id", "lang")
      .agg(collect_list(struct(col("tok"), col("term"))).as("l"),
        sum("tf").as("n_tokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(
          SortedFolds.sortedTermSum(col("l"))
            / col("n_tokens"), 4).as("avg_llr"))
  }

  /** q_ess: effective sample size of length-weighted document sampling,
    * per source and overall — Kish's (Σw)²/Σw² with w = token count:
    * "if we sample ∝ length (the packSequences/weightedSample regime),
    * how many EFFECTIVE documents does each source contribute". A
    * source of one giant doc and 999 stubs has ESS ≈ 1 — the
    * mix-design warning q_mix's raw doc counts hide. Both sums are
    * exact integers (squares decimal-widened), one division each.
    *
    * Scale shape: one narrow projection, one partial-aggregable
    * grouped agg plus its grand-total twin — nothing else. */
  def effectiveSampleSize(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("w"))
    // sums decimal-widened END TO END (not just the squares): a plain
    // long sum(w) silently wraps past 2^63 while the claim is "exact
    // integers"; decimal(38,0) keeps sw and sw·sw exact at any SF
    val per = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("w").cast("decimal(38,0)")).as("sw"),
        sum(col("w").cast("decimal(38,0)") * col("w")).as("sw2"))
    // the grand total is a GLOBAL agg, not groupBy(lit("ALL")): a grouped
    // agg over an empty frame emits 0 rows where the oracle's ungrouped
    // SELECT always emits 1 — the two must agree on empty input
    val overall = base
      .agg(count(lit(1)).as("n_docs"), sum(col("w").cast("decimal(38,0)")).as("sw"),
        sum(col("w").cast("decimal(38,0)") * col("w")).as("sw2"))
      .select(lit("ALL").as("source"), col("n_docs"), col("sw"), col("sw2"))
    per.unionByName(overall)
      .select(col("source"), col("n_docs"),
        round((col("sw") * col("sw")).cast("double")
          / col("sw2").cast("double"), 4).as("ess"),
        round((col("sw") * col("sw")).cast("double")
          / col("sw2").cast("double") / col("n_docs"), 4).as("ess_ratio"))
      .orderBy("source")
  }

  /** q_dpnoise: Laplace-SHAPED noisy count release — per-type event
    * counts plus Laplace(1/ε)-distributed offsets, ε = 1, drawn
    * DETERMINISTICALLY by inverse-CDF over a hash-uniform:
    * k = (code·2654435761) mod 999983, u = (k + 0.5)/999983,
    * noise = −sgn(u−½)·ln(1 − 2|u−½|). The ln input is the exact
    * integer ratio (P − |2k+1−P|)/P, so the release is reproducible
    * across engines and reruns.
    *
    * NOT A PRIVACY MECHANISM — engine-parity fixture only. The noise is
    * a deterministic function of the group NAME, so anyone who knows the
    * mechanism subtracts it exactly, and a hash-uniform over ~25k code
    * values is not statistically uniform: the release carries ZERO
    * differential privacy. Real DP requires a fresh cryptographic random
    * draw per release (and composition accounting); what this query
    * exercises is the ENGINE side of such a pipeline — the per-group
    * scalar noise expression, exact inverse-CDF arithmetic, and
    * cross-engine reproducibility of the released frame. code is the
    * position-weighted codepoint sum (TokenCode), engine-neutral.
    *
    * Scale shape: one partial-aggregable count per type; the noise is
    * a per-group scalar expression. */
  def dpNoisedCounts(spark: SparkSession, dir: String): DataFrame = {
    val P = 999983L
    val counts = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
    // codegen'd TokenCode, not the zip_with(split, sequence) HOF: the
    // HOF pairing silently depends on Spark >= 3.4 empty-pattern split
    // semantics (SPARK-40194) — one trailing empty element on older
    // builds null-pads the whole release
    val code = graft.functions.TokenCode.tokenCode(col("event_type"))
    // fold the code to [0, P) BEFORE the Knuth multiply (r11 oracle
    // audit): mod distributes, so the k is unchanged — but the unfolded
    // code·K aborts under ANSI past code ≈ 3.47e9 (a ~7.4k-char garbage
    // event_type — routine in dirty corpora) while the oracle's HUGEINT
    // arithmetic sails on; folded, the product caps at ~2.7e15. This was
    // the one Knuth site not routed through a fold.
    val k = pmod(pmod(code, lit(P)) * lit(2654435761L), lit(P))
    val num = lit(P) - abs(lit(2L) * k + 1 - lit(P))
    // u < ½ ⇔ 2k+1 < P: there the draw is the NEGATIVE tail ln(2u),
    // i.e. −sgn(u−½)·ln(…) — the multiplier flips against the −ln
    val noise = when(lit(2L) * k + 1 < lit(P), lit(-1.0)).otherwise(lit(1.0)) *
      -log(num / lit(P.toDouble))
    counts
      .select(col("event_type"), col("n_true"),
        round(noise, 4).as("noise"),
        round(col("n_true") + noise, 4).as("n_released"))
      .orderBy("event_type")
  }

  /** q_auc: ROC AUC of the [[dsirScore]] ranking against the en/non-en
    * label — "does the importance weight actually separate the target
    * domain", the one-number check before resampling by it. Computed as
    * the tie-corrected rank-sum (Mann–Whitney) on the VALUE-GROUPED
    * frame: group docs by (rounded) score, one cumulative window over
    * the distinct-score frame, and
    * AUC = Σ(2·negBefore·pos + pos·neg) / (2·P·N) — ties contribute the
    * half-credit term exactly, and every sum is integer (decimal-widened
    * against 1e9²-scale products) with ONE double division at the end.
    *
    * Scale shape (r8 verdict task #4): `avg_llr` is a per-doc double,
    * so the distinct-score frame is ~|docs| — an unpartitioned window
    * over it is a single-task sort of the corpus at 100 TB. Reshaped to
    * the q_wmedian two-level prefix sum: (1) coarse score buckets
    * (1/64-wide on the LLR axis) aggregate per-bucket negative counts;
    * the bucket-offset window runs over the BUCKET frame, whose
    * cardinality is bounded by the score RANGE (log-likelihood ratios,
    * a few hundred buckets), not by |docs|; (2) the exact
    * cumulative-before count is bucket offset + a within-bucket window
    * PARTITIONED by bucket — distributed, never a global sort. The AUC
    * is bit-identical to the one-window form. */
  def dsirAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // perVal feeds the bucket offsets, the P/N totals and the main
    // chain; deliberately NOT persisted — an A/B at sf0.1 measured the
    // cached form at 2.70 vs 2.17 s median (matched context): AQE
    // exchange reuse already shares the aggregated DSIR subtree across
    // the three consumers, so the persist only adds materialization
    // (the q_wau/lm_score crossover). With reuse disabled or multi-job
    // consumers, persist this distinct-score-sized frame instead.
    val perVal = dsirScoreUnsorted(spark, dir)
      .select(col("avg_llr").as("s"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("s")
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("ng"))
      .withColumn("b", floor(col("s") * 64).cast("long"))
    val wBucket = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = perVal.groupBy("b").agg(sum("ng").as("bng"))
      .withColumn("off", coalesce(sum(col("bng")).over(wBucket), lit(0L)))
      .select("b", "off")
    val wIn = Window.partitionBy("b").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val tot = perVal.agg(sum("p").as("np"), sum("ng").as("nn"))
    perVal
      .withColumn("nb", coalesce(sum(col("ng")).over(wIn), lit(0L)))
      .join(broadcast(offsets), "b")
      .withColumn("nb", col("nb") + col("off"))
      .crossJoin(broadcast(tot))
      .groupBy("np", "nn")
      .agg(sum(col("nb").cast("decimal(38,0)") * col("p") * 2
        + col("p").cast("decimal(38,0)") * col("ng")).as("num2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        when(col("np") === 0 || col("nn") === 0, lit(0.0))
          .otherwise(round(col("num2").cast("double")
            / (lit(2.0) * col("np") * col("nn")), 6)).as("auc"))
  }
}
