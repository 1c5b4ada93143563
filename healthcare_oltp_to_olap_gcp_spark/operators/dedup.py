"""Document deduplication family: exact, n-gram Jaccard (quadratic
baseline), MinHash+LSH (the scale path), SimHash.

Design (SURVEY §4):

- exact: one hash-groupBy on md5(text) — one shuffle, no skew (hashes).
- ngram_jaccard_pairs: exact quadratic baseline used to validate LSH on
  small data and as the verified-correctness oracle. O(n²) — never run
  this at 100 TB; it exists so the LSH path has ground truth.
- minhash_lsh_dup_pairs: explode shingles → one shuffle for the 32-perm
  signature, one for band buckets; only bucket-colliding candidates pay
  the exact-Jaccard verification. With r=2 rows/band, b=16 bands a true
  pair at j≥0.8 is caught with p = 1-(1-j²)^16 ≈ 1-8e-8, so verified
  output equals the exact baseline on any realistic data while scaling
  ~linearly (asserted deterministically by tests at both test SFs). At 100 TB: run `exact` first so byte-identical copies don't
  blow up LSH buckets.
- simhash_dup_pairs: 64-bit SimHash from token hashes (all JVM-side bit
  arithmetic), pigeonhole-blocked on 16-bit chunks: pairs within
  hamming distance d≤3 must agree on ≥1 of 4 chunks.

MinHash permutations come from one base ``xxhash64(shingle)`` composed
with md5-derived affine transforms mod 2^31-1 — fully deterministic,
JVM-side, no Python RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from ..session import scoped_persist

NUM_HASHES = 32
ROWS_PER_BAND = 2
N_BANDS = NUM_HASHES // ROWS_PER_BAND
SHINGLE_WORDS = 3


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Exact dedup groups: content hash, group size, survivor doc_id."""
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keep_doc_id"))
    )


def doc_shingles(docs: DataFrame, n: int = SHINGLE_WORDS) -> DataFrame:
    """(doc_id, shingles): distinct n-word shingles; docs shorter than n
    tokens drop out (no shingles → not near-dup candidates)."""
    # repartition: the test tables arrive as one parquet file -> one
    # input partition; spread the (expensive) shingle work across all
    # cores. At cluster scale the source is already multi-split.
    #
    # The short-doc filter must use the cheap token-count predicate, not
    # size(shingles): a predicate over the shingle column gets pushed
    # below the repartition by Catalyst, dragging the whole shingle
    # computation into the single-task scan stage.
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = tokens("text")
    # r9: hash by doc_id instead of round-robin — same spreading
    # (doc_id unique), no sort-before-repartition (guide §2.5 note)
    return (
        docs.filter(F.size(toks) >= n)
        .repartition(par, "doc_id")
        .select("doc_id", word_shingles(toks, n).alias("shingles"))
    )


def _jaccard(a: F.Column, b: F.Column) -> F.Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, 6)


def doc_shingle_hashes(docs: DataFrame, n: int = SHINGLE_WORDS) -> DataFrame:
    """(doc_id, hs): the 64-bit xxhash64 of each distinct shingle.

    The LSH pipeline's cacheable representation: a long array persists
    ~10× cheaper than the shingle strings (fixed 8 bytes vs ~25-char
    strings through the columnar cache's compression — caching the
    string form measured 8.8s of a 12s cold run at sf0.1). Signature
    permutations derive from these via pmod, and verification Jaccard
    over the hash sets equals string Jaccard unless two distinct
    shingles collide in 64 bits (p ≈ pairs·|union|²/2^65 — negligible,
    and the quadratic string-space baseline stays available as
    ``ngram_jaccard_pairs``)."""
    return doc_shingles(docs, n).select(
        "doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT word-shingle Jaccard pairs via an inverted-index self-join.

    Identical output to the all-pairs form (the DuckDB oracle is the
    quadratic formulation): shingles are distinct per document
    (``word_shingles`` applies array_distinct), so the per-pair posting
    count IS |A∩B|, and |A∪B| = |A| + |B| − |A∩B| — the same integers
    the array_intersect/array_union baseline divides, hence the same
    rounded double. Any pair sharing zero shingles has Jaccard 0 and
    can never reach a positive ``threshold``, so skipping non-colliding
    pairs loses nothing (requires ``threshold`` > 0).

    Scale shape: work ∝ Σ df² per shingle (df = posting-list length),
    not docs² — near-linear on natural text where most 3-grams are
    rare. The skew caveat of ``ngram_containment_pairs`` applies: at
    web scale, cap document frequency per shingle first (boilerplate
    posting lists explode the join); with heavy boilerplate prefer the
    MinHash+LSH twin (``minhash_lsh_dup_pairs``), whose candidate
    volume is bounded by the band structure instead of df².

    ``shingles`` injects a caller-persisted ``doc_shingles`` frame (the
    ANN family's ``shared`` pattern) so a multi-method sweep like
    ``neardup_recall_report`` builds the shingle table once."""
    sh = shingles if shingles is not None else scoped_persist(doc_shingles(docs))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


MERSENNE_31 = (1 << 31) - 1


def _affine_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod p — derived from md5, no RNG state."""
    import hashlib

    coeffs = []
    for i in range(num_hashes):
        da = hashlib.md5(f"minhash:a:{i}".encode()).digest()
        db = hashlib.md5(f"minhash:b:{i}".encode()).digest()
        a = int.from_bytes(da[:4], "big") % (MERSENNE_31 - 1) + 1
        b = int.from_bytes(db[:4], "big") % MERSENNE_31
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(
    docs: DataFrame, num_hashes: int = NUM_HASHES, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_id, h0..h{H-1}): min over shingles of the i-th universal
    hash applied to ONE base xxhash64 per shingle — hashing the string
    once and permuting with cheap affine transforms mod 2^31-1
    (products stay < 2^62, so the arithmetic is overflow-safe under
    ANSI mode).

    Computed per-row with higher-order functions (transform once for
    the base hashes, then one array_min per permutation): the signature
    never leaves its document row, so this stage has ZERO shuffle — the
    earlier explode + 32-way groupBy formulation shuffled every shingle
    hash and measured ~50× slower at sf0.1. At 100 TB the signature
    build is then a pure map stage pipelined with the scan."""
    sh = shingles if shingles is not None else doc_shingles(docs)
    if "hs" in sh.columns:
        # Pre-hashed shingles (doc_shingle_hashes): same base values,
        # the xxhash64 is already done.
        base = F.transform(F.col("hs"), lambda h: F.pmod(h, F.lit(MERSENNE_31)))
    else:
        base = F.transform(
            F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_31))
        )
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("_hs"),
                lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_31)),
            )
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_affine_coeffs(num_hashes))
    ]
    return sh.withColumn("_hs", base).select("doc_id", *sig_cols)


def _band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per band."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.xxhash64(
                    *[F.col(f"h{j * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                ).alias("band_hash"),
            )
            for j in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )


def minhash_lsh_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    shingle_hashes: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard so the
    output is (with the collision probability above) identical to
    ``ngram_jaccard_pairs`` — but without the O(n²) pair join.

    The shingle-hash table feeds three consumers (signatures + both
    sides of the verification join) — persist it so the scan/shingle
    work runs once; the hash form (``doc_shingle_hashes``) keeps the
    cache small and cheap to build. The cache is scoped: the next
    scoped persist anywhere in the package releases it, so registry
    sweeps don't accumulate cached blocks. ``shingle_hashes`` injects
    a caller-persisted frame (the shared-sweep pattern; see
    ``neardup_recall_report``)."""
    sh = (
        shingle_hashes
        if shingle_hashes is not None
        else scoped_persist(doc_shingle_hashes(docs))
    )
    return _verified_lsh_pairs(sh, threshold)


def _verified_lsh_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification over a
    prepared (doc_id, hs) shingle-hash frame. Callers own ``sh``'s
    cache lifecycle (see ``dedup_components``, which unpersists it once
    the edge list is materialized)."""
    buckets = _band_buckets(minhash_signatures(sh, shingles=sh))
    # Candidate pairs via groupBy + in-bucket combinations rather than a
    # bucket self-join: the join formulation instantiates the signature
    # subtree TWICE (once per side — measured ~2.8s of a 5.2s LSH phase
    # at sf0.1), while the aggregate computes signatures once and
    # shuffles only the tiny (band, hash, ids) rows. Work per bucket is
    # the same |bucket|²/2 either way.
    ids = F.sort_array(F.col("ids"))
    combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    candidates = (
        buckets.groupBy("band_idx", "band_hash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(combos).alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b"))
    # Broadcast the (id, id) candidate set: the wide shingle-array table
    # then joins map-side, so the arrays cross the wire once (the doc_b
    # join) instead of twice. Candidate pairs are bounded by dup density
    # × band count — KBs per million docs, always broadcastable.
    return (
        a.join(F.broadcast(candidates), "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_components(
    docs: DataFrame,
    threshold: float = 0.8,
    max_iters: int = 20,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Connected components of the near-duplicate graph: every document
    labeled with the smallest doc_id reachable through verified
    near-dup pairs (the canonical survivor of its duplicate cluster).

    Iterative min-label propagation with pointer jumping: each round
    every node takes the minimum label among itself and its neighbors,
    then additionally adopts its label's label — doubling the
    propagation distance, so convergence is O(log diameter) rounds
    instead of O(diameter). Each round is two joins + one groupBy (all
    shuffling on doc_id); the driver only checks a scalar convergence
    sum — no data ever collects to the driver.

    The edge list is eagerly ``localCheckpoint``-ed so the (deep)
    MinHash lineage is planned exactly once — each round replans only
    the shallow join/agg subtree; the shingle cache is released as soon
    as the edges are materialized. Pass ``pairs`` (e.g. the output of
    ``minhash_lsh_dup_pairs``) to skip the MinHash derivation entirely
    when the pair table already exists.
    """
    import warnings

    sh = None
    if pairs is None:
        sh = doc_shingle_hashes(docs).persist()
        pairs = _verified_lsh_pairs(sh, threshold)
    pairs = pairs.select("doc_a", "doc_b")
    # localCheckpoint is eager: the whole LSH pipeline runs here, once.
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    if sh is not None:
        sh.unpersist()
    nodes = (
        edges.select(F.col("doc_a").alias("doc_id")).distinct()
    )
    labels = nodes.withColumn("label", F.col("doc_id"))
    # Min-propagation only ever lowers labels, so the label sum strictly
    # decreases until the fixpoint — one scalar aggregate per round
    # detects convergence (no per-row diff join needed).
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_iters):
        # r9 note: unlike part_pagerank's lazy loop, each round here is
        # EXECUTED eagerly (localCheckpoint + the convergence collect),
        # so the planner's broadcast choice for the label side is a
        # per-round win, not a nested-build pile-up — A/B measured
        # broadcast 5.4s vs pinned-SMJ 8.2s at sf0.1. Left adaptive.
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"), F.col("label").alias("nl")
                ),
                "doc_b",
            )
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("nl").alias("neighbor_label"))
        )
        # Checkpoint the propagated labels (eager), then pointer-jump
        # off the materialized frame — the self-join reads the stored
        # blocks instead of recomputing the neighbor join.
        propagated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("neighbor_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        jump = propagated.select(
            F.col("doc_id").alias("label"), F.col("label").alias("_ll")
        )
        # labels only ever decrease, so label-of-label ≤ label: the jump
        # preserves the monotone-sum convergence invariant.
        labels = (
            propagated.join(jump, "label", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                ).alias("label"),
            )
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        warnings.warn(
            f"dedup_components: label propagation did not converge within "
            f"{max_iters} rounds; labels may split one true component",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("doc_id", F.col("label").alias("component"))


CONTAM_BENCH_MOD = 25  # doc_id % 25 == 0 → deterministic "benchmark" set
CONTAINMENT_THRESHOLD = 0.5


def docs_contamination(docs: DataFrame) -> DataFrame:
    """Benchmark-contamination check (the decontamination step of an
    LLM training pipeline): for every training doc, the fraction of its
    word shingles that also appear in a held-out benchmark set (here
    the deterministic doc_id % 25 slice standing in for an eval suite).

    Scale shape: the benchmark shingle set is DISTINCT'd and broadcast
    (eval suites are tiny vs the corpus), the corpus side explodes its
    shingles once and semi-joins — an inverted-index probe, never a
    doc×doc comparison. Docs with contamination 0 keep a row: the
    downstream filter needs an explicit per-doc verdict.

    The shingle table feeds three subtrees (benchmark set, per-doc
    sizes, hit counting) — scope-persisted so the shingle build runs
    once per action, also when this whole query is a subtree of
    ``curated_documents`` (measured 4× there without it)."""
    sh = scoped_persist(doc_shingles(docs))
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = (
        sh.filter(is_bench)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    base = sh.filter(~is_bench).select(
        "doc_id", F.size("shingles").alias("n_shingles")
    )
    hits = (
        sh.filter(~is_bench)
        .select("doc_id", F.explode("shingles").alias("s"))
        .join(F.broadcast(bench), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("contamination_ratio"),
        )
    )


CONTAM_BLOOM_BITS = 1 << 20


def docs_contamination_bloom(docs: DataFrame) -> DataFrame:
    """The 100 TB twin of ``docs_contamination``: a broadcast BLOOM
    FILTER over the benchmark shingles prefilters the corpus side, and
    the exact verify runs as a SHUFFLE join — so the eval-suite shingle
    set never has to fit on one executor, which the exact operator's
    broadcast semi-join requires.

    Shape: benchmark shingles are hashed into a 1-hash Bloom bucket set
    (2^20 buckets ≈ 128 KiB broadcast regardless of eval-suite size —
    the same construction as plans/analytics.bloom_prejoin_revenue);
    corpus shingles that miss a bucket are dropped BEFORE any shuffle
    (no false negatives ⇒ no lost hits), survivors are verified against
    the exact benchmark set via a shuffle-hash semi-join (hinted, so
    the scale shape holds even where AQE would broadcast at test SF),
    and false positives die there. The result is therefore provably
    identical to ``docs_contamination`` — the two operators SHARE one
    oracle, which is the strongest statement of the equivalence.

    At 100 TB the win is twofold: the prefilter cuts the exploded
    corpus-shingle stream to near-hits before the verify shuffle (the
    dominant cost — most shingles of most docs are clean), and the
    bench set distributes instead of broadcasting. Spark's AQE runtime
    bloom (spark.sql.optimizer.runtime.bloomFilter.enabled) automates
    the same idea for equi-joins; this is the explicit form with a
    hand-set bucket count, kept exact so the oracle is the plain
    computation."""
    sh = scoped_persist(doc_shingles(docs))
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = (
        sh.filter(is_bench)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    bloom = bench.select(
        F.pmod(F.xxhash64("s"), F.lit(CONTAM_BLOOM_BITS)).alias("_bucket")
    ).distinct()
    base = sh.filter(~is_bench).select(
        "doc_id", F.size("shingles").alias("n_shingles")
    )
    hits = (
        sh.filter(~is_bench)
        .select("doc_id", F.explode("shingles").alias("s"))
        .withColumn("_bucket", F.pmod(F.xxhash64("s"), F.lit(CONTAM_BLOOM_BITS)))
        .join(F.broadcast(bloom), "_bucket", "left_semi")
        .join(bench.hint("shuffle_hash"), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("contamination_ratio"),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = CONTAINMENT_THRESHOLD,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT (|A∩B| / min(|A|,|B|)) via
    an inverted-index self-join — the exact-but-scalable counterpoint
    to the quadratic ``ngram_jaccard_pairs`` baseline: work is
    proportional to shingles-per-posting-list, not docs².

    Containment catches subset duplication (a doc embedded in a longer
    one) that symmetric Jaccard dilutes. Skew note: at web scale the
    posting lists of boilerplate shingles explode the join — production
    runs drop shingles above a document-frequency cap first (the
    CCNet/Gopher trick); kept exact here so the DuckDB oracle is the
    same computation.

    Plan note: the explode projection carries ONLY the generator —
    any sibling expression over ``shingles`` (e.g. ``size``) gets
    collapsed into the generated-row projection and re-derives the
    whole shingle array once per POSTING instead of once per doc
    (measured 7× on the bench corpus). Per-doc sizes are joined onto
    the aggregated pair result instead, which is smaller than the
    posting list by the dedup factor. ``shingles`` injects a
    caller-persisted frame (shared-sweep pattern)."""
    sh = shingles if shingles is not None else scoped_persist(doc_shingles(docs))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), "s")
    b = ex.select(F.col("doc_id").alias("doc_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.least("n_a", "n_b"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", F.col("n_shared").cast("long").alias("n_shared"), "containment")
    )


def clean_documents(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """The dedup pipeline's end product: the corpus with near-duplicate
    clusters collapsed to one survivor each (the smallest doc_id of the
    connected component). Non-clustered documents pass through
    untouched; cluster members that aren't the canonical survivor are
    anti-joined away."""
    comps = dedup_components(docs, threshold)
    drops = comps.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", F.char_length("text").cast("long").alias("n_chars")
    )


def sample_documents(docs: DataFrame, n: int = 100) -> DataFrame:
    """Deterministic uniform-ish sample: rank by md5(doc_id) and take
    the first n — reproducible across runs/engines/partitionings,
    unlike rand()-based sampling, which is what a training-data
    pipeline needs for auditable subset selection."""
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(n)
        .select("doc_id", "h")
    )


CURATED_MAX_CONTAM = 0.2


def curated_documents(docs: DataFrame, contamination: DataFrame | None = None) -> DataFrame:
    """The end-to-end training-corpus curation step, composed from the
    engine's own operators: keep a doc iff it is (1) the exact-dedup
    survivor of its content hash, (2) passes the quality gate
    (``textquality.quality_filter``), and (3) is not benchmark-
    contaminated above ``CURATED_MAX_CONTAM`` — benchmark docs
    themselves are excluded (that IS decontamination). Three semi-
    joins on doc_id over per-doc verdict tables; each verdict is its
    own registered query, so every stage of this composition is
    independently oracle-checked."""
    from .textquality import quality_filter

    survivors = exact_dedup_stats(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    quality_ok = quality_filter(docs).filter(F.col("keep")).select("doc_id")
    contam_tbl = docs_contamination(docs) if contamination is None else contamination
    clean = contam_tbl.filter(
        F.col("contamination_ratio") <= CURATED_MAX_CONTAM
    ).select("doc_id")
    return (
        docs.join(survivors, "doc_id", "left_semi")
        .join(quality_ok, "doc_id", "left_semi")
        .join(clean, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )


WEIGHTED_SAMPLE_N = 100


def weighted_sample_documents(docs: DataFrame, n: int = WEIGHTED_SAMPLE_N) -> DataFrame:
    """Deterministic weight-proportional sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc draws an exponential key
    −ln(u)/w with rate w = n_chars, from a uniform u derived from
    md5(doc_id) — shared bit-for-bit with the DuckDB oracle, so even
    the sampling operator is value-hash checked. The n smallest keys
    win; ``orderBy().limit(n)`` compiles to TakeOrdered (per-partition
    partial top-n, no global sort), so the pattern holds at any corpus
    size. Length-weighting is the standard token-budget-proportional
    selection for training-data mixing."""
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    keyed = (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            (-F.log(u) / F.col("n_chars")).alias("_key"),
        )
        .orderBy("_key", "doc_id")
        .limit(n)
    )
    from pyspark.sql import Window as W

    rank_w = W.orderBy("_key", "doc_id")
    return keyed.select(
        "doc_id",
        "n_chars",
        F.round("_key", 8).alias("sample_key"),
        F.row_number().over(rank_w).cast("long").alias("rank"),
    )


def stratified_sample_by_lang(docs: DataFrame, per_stratum: int = 20) -> DataFrame:
    """Deterministic stratified sample: the hash-first ``per_stratum``
    documents of every language — the data-mixing primitive (equal
    quotas per source/language when assembling a training blend)."""
    from pyspark.sql import Window

    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(F.col("h"), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", h.alias("h"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= per_stratum)
        .select("doc_id", "lang", "rank")
    )


N_CHUNKS = 4
CHUNK_BITS = 16


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash as 4x16-bit chunks (c0..c3), all JVM bit math.

    Each token votes ±1 per bit position with weight 1; bit b of the
    signature is 1 iff the vote sum is positive.

    The 64 token-hash bits come from the first 16 hex chars of
    md5(token), split into two 32-bit halves (``conv`` of 16 hex chars
    at once would overflow signed long). md5 — not xxhash64 — so the
    DuckDB oracle can derive the identical bits from the same hex
    string; any uniform hash works for SimHash quality, and the hash is
    one-per-token, not per-bit, so the cost difference is noise."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    # r9: hash by doc_id — the per-doc bit-vote aggregation then
    # needs no exchange (guide §2.4)
    tok = docs.repartition(par, "doc_id").select("doc_id", F.explode(tokens("text")).alias("tok"))
    hx = F.md5("tok")
    tok = tok.withColumn(
        "hi", F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    ).withColumn("lo", F.conv(F.substring(hx, 9, 8), 16, 10).cast("long"))

    def _bit(b: int) -> F.Column:
        src, off = ("lo", b) if b < 32 else ("hi", b - 32)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    bit_votes = [F.sum(_bit(b) * 2 - 1).alias(f"s{b}") for b in range(64)]
    votes = tok.groupBy("doc_id").agg(*bit_votes)
    chunks = {
        f"c{j}": sum(
            (
                F.when(F.col(f"s{j * CHUNK_BITS + i}") > 0, F.lit(1 << i)).otherwise(
                    F.lit(0)
                )
                for i in range(CHUNK_BITS)
            ),
            F.lit(0),
        ).cast("long")
        for j in range(N_CHUNKS)
    }
    return votes.withColumns(chunks).select("doc_id", *chunks.keys())


def simhash_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, chain: bool = False
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming,
    blocked by the pigeonhole principle on 16-bit chunks (d ≤ 3 < 4
    chunks ⇒ at least one chunk matches exactly).

    The signature table is scope-persisted (5 longs per doc — tiny) so
    the 64-aggregate vote stage runs ONCE; both sides of the chunk
    self-join then read the cache (the un-persisted form instantiated
    the vote aggregate per side). The join formulation — rather than a
    groupBy + collect_list of bucket members — keeps hot chunk values
    spread across tasks (a 16-bit chunk domain WILL have hot buckets at
    corpus scale, and AQE skew-split only helps a join).

    ``chain=True`` joins the caller's persist scope instead of opening
    a new one — REQUIRED when a sweep caller (neardup_recall_report)
    holds its own chained frames: a non-chained persist here would
    release the caller's whole chain at plan-build time and every
    shared frame would silently recompute (measured 3x on the
    report)."""
    sig = scoped_persist(simhash_signatures(docs), chain=chain)
    chunk_arr = F.array(
        *[
            F.struct(F.lit(j).alias("chunk_idx"), F.col(f"c{j}").alias("chunk_val"))
            for j in range(N_CHUNKS)
        ]
    )
    blocked = sig.select("doc_id", "c0", "c1", "c2", "c3", F.explode(chunk_arr).alias("b")).select(
        "doc_id", "c0", "c1", "c2", "c3",
        F.col("b.chunk_idx").alias("chunk_idx"), F.col("b.chunk_val").alias("chunk_val"),
    )
    left = blocked.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"c{j}").alias(f"a{j}") for j in range(N_CHUNKS)],
        "chunk_idx", "chunk_val",
    )
    right = blocked.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"c{j}").alias(f"b{j}") for j in range(N_CHUNKS)],
        "chunk_idx", "chunk_val",
    )
    hamming = sum(
        (F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}"))) for j in range(N_CHUNKS)),
        F.lit(0),
    ).cast("long")
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


VAL_PCT = 5
TEST_PCT = 5
_SPLIT_SCALE = 1 << 32


def split_assignments(
    docs: DataFrame, val_pct: int = VAL_PCT, test_pct: int = TEST_PCT
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(doc_id) maps each
    doc to a point in [0, 2^32) and integer thresholds carve the
    splits — reproducible across runs, engines, and partitionings
    (never rand()), content-stable as the corpus grows, and pure
    column math (zero shuffle). The thresholds are exact integers, so
    the DuckDB oracle is bit-identical."""
    return docs.select(
        "doc_id", _split_expr(F.col("doc_id"), val_pct, test_pct)
    )


def _split_expr(key: F.Column, val_pct: int, test_pct: int) -> F.Column:
    """md5(key) → [0, 2^32) → exact-integer split thresholds — shared
    by the per-doc and the group-aware split so both carve the same
    boundaries (and the DuckDB oracles mirror one formula)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    t_test = _SPLIT_SCALE * test_pct // 100
    t_val = _SPLIT_SCALE * (test_pct + val_pct) // 100
    return (
        F.when(h < t_test, F.lit("test"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split")
    )


def split_assignments_grouped(
    docs: DataFrame,
    val_pct: int = VAL_PCT,
    test_pct: int = TEST_PCT,
    threshold: float = 0.8,
) -> DataFrame:
    """Group-aware train/val/test split (r8) — the leakage FIX for what
    ``split_leakage_report`` measures: hashing per doc_id puts the two
    ends of a near-duplicate pair in different splits with probability
    2·p·(1−p), silently inflating eval; the standard pipeline fix
    (GPT/C4-era decontamination practice) is to split by DUPLICATE
    CLUSTER so a whole near-dup component lands on one side. Every doc
    is keyed by its ``dedup_components`` label (the smallest doc_id
    reachable through verified near-dup pairs; docs outside the dup
    graph key by themselves), and the split hash runs on that GROUP
    key through the same exact-integer thresholds as
    ``split_assignments`` — so singleton docs get the identical
    assignment the per-doc split gives them, and zero cross-split
    near-dup pairs exist BY CONSTRUCTION (asserted through the leakage
    report in tests).

    Scale shape: components is the bounded min-label/pointer-jumping
    propagation (edges from banded LSH, never doc×doc); everything
    after is one left join + pure column math. Oracle: the recursive-
    CTE components oracle composed with the split formula — fully
    value-hash-checked."""
    comp = dedup_components(docs, threshold)
    key = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            key.cast("long").alias("group_key"),
            _split_expr(key, val_pct, test_pct),
        )
    )


PACK_CAPACITY = 2048
PACK_BUCKET = 100


def pack_documents(
    docs: DataFrame, capacity: int = PACK_CAPACITY, bucket_size: int = PACK_BUCKET
) -> DataFrame:
    """Greedy sequence packing: documents (by token count, in doc_id
    order) packed first-fit into training shards of ≤ ``capacity``
    tokens. The running-capacity reset makes this inherently
    sequential, so it runs as an Arrow-batched ``applyInPandas`` per
    doc_id bucket — bounded state per group, every bucket independent
    and parallel (the standard scale shape for order-dependent scans);
    the DuckDB oracle replays the same scan as a recursive CTE.
    Oversized docs (> capacity) get a shard of their own."""
    import pandas as pd

    from ..functions.text import token_count

    base = docs.select(
        "doc_id",
        (F.col("doc_id") / bucket_size).cast("long").alias("pack_bucket"),
        token_count("text").alias("n_tokens"),
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        shard, acc, out = 0, 0, []
        for n in pdf["n_tokens"]:
            if acc > 0 and acc + n > capacity:
                shard, acc = shard + 1, 0
            acc += n
            out.append(shard)
        pdf["shard_idx"] = out
        return pdf

    return base.groupBy("pack_bucket").applyInPandas(
        _pack, "doc_id long, pack_bucket long, n_tokens long, shard_idx long"
    )


DUP_SPAN_K = 8


def dup_span_stats(docs: DataFrame, k: int = DUP_SPAN_K) -> DataFrame:
    """Exact duplicated-span coverage (the RefinedWeb / "exact
    substring dedup" signal, positionally approximated with k-token
    grams): for every document, how many of its token positions are
    covered by some k-gram that also appears in ANOTHER document.
    High coverage flags boilerplate and templated mirror pages that
    document-level MinHash misses when the rest of the page differs.

    Scale shape: positional k-grams are md5-hashed to a fixed 32-char
    key before the shuffle (bounded key width regardless of k), the
    gram stream is scope-persisted because both the cross-doc dup
    detection and the coverage join consume it, duplicated grams only
    (a small fraction of the corpus) pay the k-fold coverage explode,
    and coverage is de-duplicated on (doc_id, position) before the
    final per-doc count. Work ∝ token volume + k·|dup grams|; no
    windows, no driver collect."""
    toks = docs.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    sh = scoped_persist(
        toks.filter(F.size("t") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ", *[F.element_at("t", i + j) for j in range(k)]
                        )
                    ),
                )
            ).alias("pos", "gh"),
        )
    )
    dup = (
        sh.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    cov = (
        sh.join(dup, "gh")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("p"),
        )
        .distinct()
    )
    cnt = cov.groupBy("doc_id").agg(F.count("*").alias("n_dup"))
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return base.join(cnt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.round(
            F.coalesce(F.col("n_dup"), F.lit(0)) / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_ratio"),
    )


def remove_dup_spans(docs: DataFrame, k: int = DUP_SPAN_K) -> DataFrame:
    """Exact-substring dedup REMOVAL (the RefinedWeb rewrite step that
    ``dup_span_stats`` only measures): every token position covered by
    a k-gram that also occurs in another document is excised — except
    in the gram's KEEPER (min doc_id among its holders), so each
    duplicated span survives exactly once in the corpus instead of
    being destroyed everywhere. Returns the rewritten corpus:
    (doc_id, n_tokens, n_removed, cleaned_text).

    Scale shape is dup_span_stats' plus the rebuild: positional grams
    md5-hashed pre-shuffle (fixed key width), the gram stream
    scope-persisted (dup detection + coverage both read it), only
    duplicated grams pay the k-fold coverage explode, and the rewrite
    is one anti-join on (doc, pos) followed by a per-doc ordered
    re-assembly (sort_array over collect_list structs — grouped, never
    a window over the token stream). Work ∝ token volume +
    k·|dup grams|; no driver collect.

    Cross-engine determinism: positions are integers, the keeper rule
    is a MIN, and re-assembly is a position-ordered concat — fully
    value-hash-oracled (oracles.py mirrors it with string_agg ORDER BY
    in DuckDB)."""
    toks = docs.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    sh = scoped_persist(
        toks.filter(F.size("t") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (k - 1)),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ", *[F.element_at("t", i + j) for j in range(k)]
                        )
                    ),
                )
            ).alias("pos", "gh"),
        )
    )
    dup = (
        sh.groupBy("gh")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("nd") >= 2)
        .select("gh", "keeper")
    )
    cov = (
        sh.join(dup, "gh")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("p"),
        )
        .distinct()
    )
    tok_rows = toks.select("doc_id", F.posexplode("t").alias("p", "tok"))
    kept = tok_rows.join(cov, ["doc_id", "p"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count("*").alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("p", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("cleaned_text"),
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return base.join(cleaned, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )


TEMP_ALPHA = 0.5


def temperature_sample_documents(
    docs: DataFrame, alpha: float = TEMP_ALPHA
) -> DataFrame:
    """Temperature-based mixture rebalancing (the n^α source-sampling
    rule from multilingual/domain training blends — α=1 keeps natural
    proportions, α→0 approaches uniform): accept each doc with rate
    r_s = (n_min / n_s)^(1−α), so expected per-source counts are
    ∝ n_s^α scaled to keep the smallest source intact. Generalizes
    ``mixture_sample_documents`` (its equal-share rule is the α=0
    point). Same scale shape: one count aggregate, a broadcast
    |sources|-row rate table, one rate-filter scan — no windows, no
    per-source sorts, and the identical hash-threshold form runs as a
    streaming filter.

    Cross-engine exactness: the acceptance uniform is the shared
    md5-derived value and the rate is sqrt(n_min/n_s) at α=0.5 —
    correctly-rounded IEEE ops both engines agree on bit-for-bit, so
    even this sampler is value-hash-oracled."""
    c = docs.groupBy("source").agg(F.count("*").alias("n"))
    mn = c.agg(F.min("n").alias("mn"))
    ratio = F.col("mn") / F.col("n").cast("double")
    # sqrt is correctly-rounded IEEE in both engines; generic pow is
    # only ~1-ulp and could flip a boundary acceptance, so the default
    # α=0.5 takes the exact path.
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = c.crossJoin(F.broadcast(mn)).select("source", rate.alias("rate"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    return (
        docs.select("doc_id", "source", u.alias("u"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("u") <= F.col("rate"))
        .select("doc_id", "source", F.round("rate", 6).alias("accept_rate"))
    )


def mixture_sample_documents(docs: DataFrame) -> DataFrame:
    """Deterministic mixture rebalancing: downsample every source to
    the size of the smallest one (equal target shares — the uniform
    special case of training-blend reweighting), by accepting a doc
    iff its md5-derived uniform falls under the source's computed
    acceptance rate. Unlike ``stratified_sample_by_lang`` (fixed
    per-stratum quota via a rank) this is RATE-based: no per-source
    sort or window anywhere, so a source of any size costs one scan,
    and the same hash-threshold form runs identically as a streaming
    filter. The per-source rate table is a broadcast of |sources|
    rows; both engines compare the identical IEEE-exact uniform
    against the identical correctly-rounded division, so even the
    sampler is value-hash checked."""
    c = docs.groupBy("source").agg(F.count("*").alias("n"))
    mn = c.agg(F.min("n").alias("mn"))
    rates = (
        c.crossJoin(F.broadcast(mn))
        .select("source", (F.col("mn") / F.col("n").cast("double")).alias("rate"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    return (
        docs.select("doc_id", "source", u.alias("u"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("u") <= F.col("rate"))
        .select("doc_id", "source", F.round("rate", 6).alias("accept_rate"))
    )


def neardup_recall_report(docs: DataFrame) -> DataFrame:
    """Near-dup index-quality dashboard — the dedup-family analog of
    ``ann_recall_report``: precision/recall of every SCALABLE pair
    detector (MinHash-LSH bands, SimHash pigeonhole blocking, n-gram
    containment) against the exact Jaccard pair set
    (``ngram_dup_pairs``), as one small metrics frame. This is the
    number a dedup deploy watches when trading band/bit width against
    missed duplicates: LSH banding trades recall, SimHash and
    containment apply different predicates entirely, and the report
    makes all three drifts measurable instead of assumed.

    The truth set is persisted once; each method contributes ONE row
    (pair count, hits = inner join on the (doc_a, doc_b) key, exact
    precision/recall divisions rounded 6 dp) — so the output is
    method-count-sized however large the corpus, and everything is
    exact integers + one rounded division per column: value-hash
    oracle-checked end to end, like every constituent (all four pair
    operators are independently oracled, which is what makes this
    dashboard itself oracle-able).

    The shingle tables (string form for jaccard/containment, hash form
    for minhash) and the truth set are persisted ONCE in one chained
    scope and injected into every method — the shared-frame lesson of
    ann_recall_report applied here from the start (each method would
    otherwise re-tokenize and re-shingle the corpus)."""
    # The string-shingle cache is expensive to WRITE (~25-char strings
    # through columnar compression) but it feeds FOUR instantiations —
    # both sides of the truth self-join and both sides of containment's
    # — so caching still wins (uncached: 60s, cached: 11s at sf0.1).
    sh_str = scoped_persist(doc_shingles(docs))
    sh_hash = scoped_persist(doc_shingle_hashes(docs), chain=True)
    truth = scoped_persist(
        ngram_jaccard_pairs(docs, shingles=sh_str).select("doc_a", "doc_b"),
        chain=True,
    )
    total = truth.agg(F.count("*").alias("n_true"))
    methods = (
        ("minhash_lsh", lambda d: minhash_lsh_dup_pairs(d, shingle_hashes=sh_hash)),
        ("simhash", lambda d: simhash_dup_pairs(d, chain=True)),
        ("containment", lambda d: ngram_containment_pairs(d, shingles=sh_str)),
    )
    # r10 (VERDICT r9 item 6, guide §2.3/§5): each method's pair
    # stream previously materialized TWICE per execution — once for
    # the n_pairs count and once for the truth hit-join (the two
    # branches referenced the same unpersisted subtree). The tagged
    # union LEFT-joins the (unique-keyed) truth set once, so one pass
    # per method yields n_pairs = count(*) and n_hit = count(matched)
    # in a single aggregation; a method-literal frame keeps zero-pair
    # rows. Identical integers + the same rounded divisions ⇒ the
    # value-hash oracle carries (row ORDER changes — the gate sorts).
    tagged = None
    for name, fn in methods:
        t = fn(docs).select(F.lit(name).alias("method"), "doc_a", "doc_b")
        tagged = t if tagged is None else tagged.unionByName(t)
    stats = (
        tagged.join(
            truth.withColumn("_t", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .groupBy("method")
        .agg(F.count("*").alias("n_pairs"), F.count("_t").alias("n_hit"))
    )
    mframe = docs.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(n) for n, _ in methods])).alias("method")
    )
    return (
        mframe.join(stats, "method", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "method",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.col("n_true").cast("long").alias("n_true"),
            F.when(
                F.col("n_pairs") > 0,
                F.round(F.col("n_hit") / F.col("n_pairs").cast("double"), 6),
            ).alias("precision"),
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("n_hit") / F.col("n_true").cast("double"), 6),
            ).alias("recall"),
        )
    )


UNIMAX_NUM = 3
UNIMAX_DEN = 5  # default budget = 3/5 of the corpus (exact rational)


def unimax_sample_documents(
    docs: DataFrame, budget_num: int = UNIMAX_NUM, budget_den: int = UNIMAX_DEN
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): spread a fixed
    token/doc budget as UNIFORMLY as possible across languages without
    oversampling any of them — the water-filling allocation. Small
    languages keep everything (rate 1); large languages are capped at
    the equal share left after the small ones are fully served. This
    completes the sampler family: uniform → stratified → weighted →
    equal-share mixture → temperature n^α → DSIR → UniMax.

    The budget is the exact rational ``budget_num/budget_den`` of the
    corpus (integer arithmetic — no float boundary can flip a doc).
    Allocation: languages sorted ascending by (n_l, lang); language i
    saturates iff  n_i·(L−i+1) ≤ N − Σ_{j<i} n_j  (all integers; the
    saturated set is a prefix by the water-filling property), the
    remaining budget splits equally as cap = (N − Σ_sat n)/(L − t),
    and every rate is min(1, cap/n_l) — saturated languages hit the
    min at 1 exactly.

    Scale shape: one count aggregate to an L-row frame, the
    water-filling window runs over those L rows only, and the corpus
    is touched by ONE rate-filter scan against a broadcast L-row rate
    table — no per-language sort or window over data rows, and the
    hash-threshold acceptance (the shared md5-uniform) runs
    identically as a streaming filter. Value-hash-oracled like every
    sampler in the family: the only floats are one division both
    engines round identically and the IEEE-exact uniform."""
    from pyspark.sql import Window

    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tot = c.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_langs")
    )
    w = Window.orderBy("n", "lang")
    ranked = (
        c.crossJoin(F.broadcast(tot))
        .withColumn(
            "budget",
            F.expr(f"(total * {int(budget_num)}) div {int(budget_den)}"),
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn("cum", F.sum("n").over(w))
    )
    saturated = (
        F.col("n") * (F.col("n_langs") - F.col("i") + 1)
        <= F.col("budget") - (F.col("cum") - F.col("n"))
    )
    sat = ranked.agg(
        F.coalesce(F.sum(F.when(saturated, F.col("n"))), F.lit(0)).alias("sat_n"),
        F.coalesce(F.sum(F.when(saturated, F.lit(1))), F.lit(0)).alias("t"),
        F.max("budget").alias("budget"),
        F.max("n_langs").alias("n_langs"),
    )
    cap = (F.col("budget") - F.col("sat_n")) / (
        F.col("n_langs") - F.col("t")
    ).cast("double")
    rates = (
        c.crossJoin(F.broadcast(sat))
        .select(
            "lang",
            F.when(F.col("t") >= F.col("n_langs"), F.lit(1.0))
            .otherwise(F.least(F.lit(1.0), cap / F.col("n")))
            .alias("rate"),
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    return (
        docs.select("doc_id", "lang", u.alias("u"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("u") <= F.col("rate"))
        .select("doc_id", "lang", F.round("rate", 6).alias("accept_rate"))
    )


PS_OVERLAP_K = 12


def prefix_suffix_overlap_pairs(docs: DataFrame, k: int = PS_OVERLAP_K) -> DataFrame:
    """Crawl-artifact chaining: directed pairs where document A's last
    ``k`` tokens equal document B's first ``k`` tokens — the signature
    of paginated mirrors, split articles, and scraper overlap windows
    (content that document-level MinHash scores as distinct because
    only the seam is shared).

    Scale shape: one narrow projection per side (each doc contributes
    ONE md5-hashed prefix and ONE suffix, fixed key width), a single
    equi-join on the hash. Fan-out concentrates on shared-boilerplate
    seams (work ∝ Σ pre_df·suf_df per hash) — the same df-cap caveat
    as the containment inverted index applies if a boilerplate seam
    dominates a crawl."""
    t = docs.select("doc_id", tokens("text").alias("t")).filter(F.size("t") >= k)
    pre = t.select(
        F.col("doc_id").alias("doc_b"),
        F.md5(F.concat_ws(" ", F.slice("t", 1, k))).alias("gram_hash"),
    )
    suf = t.select(
        F.col("doc_id").alias("doc_a"),
        F.md5(
            F.concat_ws(" ", F.expr(f"slice(t, size(t) - {k} + 1, {k})"))
        ).alias("gram_hash"),
    )
    return (
        suf.join(pre, "gram_hash")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "gram_hash")
    )


def clean_documents_keep_best(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Near-dup collapse keeping the BEST cluster member instead of the
    smallest doc_id: within each connected component the survivor is
    the doc with the highest model quality logit (ties → smaller
    doc_id) — what a production curation pipeline actually wants from
    dedup (drop the mirror with the broken markup, keep the clean
    original). Composes two independently oracle-checked stages
    (``dedup_components`` × ``textquality.quality_model_scores``);
    ranking uses the ROUNDED logit both engines emit, so survivor
    choice is engine-portable. The per-component window runs on
    cluster members only (near-dup clusters are small by
    construction); the corpus itself is touched by two anti-join
    scans."""
    from pyspark.sql import Window as W

    from .textquality import quality_model_scores

    comps = dedup_components(docs, threshold)
    q = quality_model_scores(docs).select("doc_id", "quality_logit")
    m = comps.join(q, "doc_id")
    w = W.partitionBy("component").orderBy(
        F.col("quality_logit").desc_nulls_last(), "doc_id"
    )
    drops = (
        m.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") != 1)
        .select("doc_id")
    )
    return docs.join(drops, "doc_id", "left_anti").select(
        "doc_id",
        "lang",
        "source",
        F.char_length("text").cast("long").alias("n_chars"),
    )


def docs_dedup_report(docs: DataFrame) -> DataFrame:
    """One-row dedup-pipeline observability report — the numbers a
    curation run logs after every stage: corpus size, exact-dup group
    count and redundant-copy count, near-dup cluster membership, the
    contaminated-doc count, and the final curated survivor count.
    Every constituent (exact groups, components, contamination,
    curated set) is its own oracle-checked registry query; this frame
    is their one-row aggregate join (four broadcast one-row crosses —
    output is ONE row whatever the corpus size)."""
    from .textquality import quality_filter  # noqa: F401  (doc pointer)

    base = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("long").alias("n_exact_groups"),
    ).select(
        "n_docs",
        "n_exact_groups",
        (F.col("n_docs") - F.col("n_exact_groups")).alias("n_exact_dup_docs"),
    )
    comp = dedup_components(docs).agg(
        F.count("*").cast("long").alias("n_neardup_docs"),
        F.countDistinct("component").cast("long").alias("n_neardup_clusters"),
    )
    # r10 (VERDICT r9 item 6): the contamination verdict table is
    # persisted ONCE and shared with curated_documents. The r8
    # measurement that pinned the double build ("shared form 4x
    # slower") predates the doc_id-partitioned shingle layout; the
    # refreshed A/B (min-of-3, same session) measured the shared form
    # FASTER (8.29s vs 8.64s at sf0.1) — and it is the right shape at
    # scale: one contamination scan instead of two.
    contam_tbl = scoped_persist(docs_contamination(docs), chain=True)
    contam = (
        contam_tbl
        .filter(F.col("contamination_ratio") > CURATED_MAX_CONTAM)
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    curated = curated_documents(docs, contamination=contam_tbl).agg(
        F.count("*").cast("long").alias("n_curated")
    )
    return (
        base.crossJoin(F.broadcast(comp))
        .crossJoin(F.broadcast(contam))
        .crossJoin(F.broadcast(curated))
    )


SEG_WORDS = 10


def dedup_segments(docs: DataFrame, k: int = SEG_WORDS) -> DataFrame:
    """C4-style segment-level dedup (Raffel et al. 2020 deduplicate
    "any three-sentence span"; here the unit is a consecutive
    ``k``-token segment): split every document into non-overlapping
    k-token segments, keep only the globally FIRST occurrence of each
    distinct segment — min (doc_id, seg_idx), which also removes
    within-document repeats — excise every later occurrence, and
    reassemble the survivors in position order. Returns
    (doc_id, n_segments, n_removed, cleaned_text).

    Scale shape: segments are non-overlapping, so the segment stream is
    ≈ |tokens|/k rows — cheaper than the k-gram machinery of
    ``remove_dup_spans``. The shuffle key is a fixed-width md5 of the
    segment (never the text); first-occurrence is a groupBy MIN(struct)
    — map-side-combined, so a hyper-duplicated segment (the C4
    boilerplate pathology) collapses to one row per map partition
    instead of skewing a window sort. Reassembly slices the KEPT
    seg_idx list back out of the doc's own token array — segment text
    never travels through the shuffle at all. Two shuffles total
    (dedup groupBy + per-doc regroup); work ∝ token volume.

    Cross-engine determinism: integer positions, a MIN keeper rule,
    and position-ordered concat — fully value-hash-oracled (DuckDB
    mirror groups by the same md5 and orders string_agg by seg_idx)."""
    toks = scoped_persist(
        docs.select("doc_id", tokens("text").alias("t")).filter(F.size("t") > 0)
    )
    n_seg = F.ceil(F.size("t") / F.lit(k)).cast("int")
    segs = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.md5(F.array_join(F.slice("t", i * k + 1, k), " ")),
            )
        ).alias("seg_idx", "gh"),
    )
    first = segs.groupBy("gh").agg(F.min(F.struct("doc_id", "seg_idx")).alias("f"))
    kept = (
        segs.join(first, "gh")
        .filter(
            (F.col("doc_id") == F.col("f.doc_id"))
            & (F.col("seg_idx") == F.col("f.seg_idx"))
        )
        .select("doc_id", "seg_idx")
    )
    cleaned = kept.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("seg_idx")).alias("_idxs")
    )
    return toks.join(cleaned, "doc_id", "left").select(
        "doc_id",
        n_seg.cast("long").alias("n_segments"),
        (n_seg - F.coalesce(F.size("_idxs"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(
            F.array_join(
                F.flatten(
                    F.transform(F.col("_idxs"), lambda i: F.slice("t", i * k + 1, k))
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


INCR_MOD = 3  # doc_id % INCR_MOD == 0 → incoming batch; else established corpus


def dedup_incremental(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Incremental (cross-corpus) near-dup dedup: screen an INCOMING
    batch against an ESTABLISHED corpus — the shape every production
    crawl refresh runs (new snapshot vs. the already-curated index),
    where re-running full-corpus self-dedup per batch would be quadratic
    in snapshots. Batch = ``doc_id % INCR_MOD == 0``, corpus = the
    rest (deterministic slices of the same table, per the package's
    ANN/contamination convention).

    Every incoming doc gets a verdict row: ``is_dup`` (any established
    doc with verified Jaccard ≥ threshold), ``n_matches``, and the
    deterministic best match (max Jaccard, ties → smallest doc_id).

    Scale shape: the established side's band-bucket index is exactly
    the artifact a production pipeline MATERIALIZES once and serves to
    every batch (the incremental-maintenance pattern of
    ``fact_events_incremental`` applied to LSH) — per-batch cost is
    then signature-build over the batch + one bucket equi-join against
    the stored index + exact verification of colliding candidates;
    nothing rescans the established corpus text. Here both sides
    derive from one scoped-persisted shingle-hash table because the
    registry query owns no storage. Candidate (new, old) id pairs are
    bounded by dup density × band count — KBs per million docs — so
    they broadcast and the wide shingle arrays cross the wire once.
    Output equals the exact cross-batch Jaccard join by the same
    1-(1-j²)^16 LSH-recall argument as ``minhash_lsh_dup_pairs``
    (miss p ≈ 8e-8 at j = 0.8; deterministic, parity-asserted)."""
    is_new = F.col("doc_id") % INCR_MOD == 0
    sh = scoped_persist(doc_shingle_hashes(docs))
    buckets = _band_buckets(minhash_signatures(sh, shingles=sh))
    cand = (
        buckets.filter(is_new)
        .withColumnRenamed("doc_id", "new_id")
        .join(
            buckets.filter(~is_new).withColumnRenamed("doc_id", "old_id"),
            ["band_idx", "band_hash"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    a = sh.filter(is_new).select(
        F.col("doc_id").alias("new_id"), F.col("hs").alias("sh_a")
    )
    b = sh.filter(~is_new).select(
        F.col("doc_id").alias("old_id"), F.col("hs").alias("sh_b")
    )
    hits = (
        a.join(F.broadcast(cand), "new_id")
        .join(b, "old_id")
        .withColumn("j", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("j") >= threshold)
        .select("new_id", "old_id", "j")
    )
    # One groupBy (no per-new-doc window): best = lexicographic max of
    # (jaccard, -old_id) — max Jaccard, ties to the smallest old id.
    per = (
        hits.groupBy("new_id")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.max(
                F.struct(F.col("j"), (-F.col("old_id")).alias("neg"))
            ).alias("m"),
        )
        .select(
            F.col("new_id").alias("doc_id"),
            "n_matches",
            (-F.col("m.neg")).cast("long").alias("best_match"),
            F.col("m.j").alias("best_jaccard"),
        )
    )
    return (
        docs.filter(is_new)
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_matches") > 0, F.lit(False)).alias("is_dup"),
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "best_match",
            "best_jaccard",
        )
    )


def dup_source_matrix(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Near-dup provenance crosstab: for every verified near-dup pair,
    which SOURCES are duplicating each other — the report that tells a
    curation run whether redundancy is intra-crawl (same source twice)
    or mirror sites (cross-source), i.e. which upstream feed to
    de-prioritize. One row per unordered source pair with the pair
    count and the exact mean Jaccard.

    Built on ``minhash_lsh_dup_pairs``'s verified output (≡ exact
    Jaccard at the threshold); two broadcast-sized joins against the
    (doc_id, source) projection — the pair list is dup-density-bounded
    and the source labels are a narrow column, so nothing wide
    shuffles. The mean is computed as an exact DECIMAL sum of the
    ROUNDED per-pair Jaccards (both engines sum the same 6-decimal
    rationals in any order — no float-order drift), then one final
    rounded divide."""
    pairs = minhash_lsh_dup_pairs(docs, threshold)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("_sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("_sb")),
            "doc_b",
        )
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            F.col("jaccard").cast("decimal(18,8)").alias("_jd"),
        )
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.sum("_jd").cast("double") / F.count("*"), 6
        ).alias("avg_jaccard"),
    )


def split_leakage_report(
    docs: DataFrame, threshold: float = 0.8, split: DataFrame | None = None
) -> DataFrame:
    """Train/val/test contamination audit: verified near-dup pairs
    crosstabbed by the SPLIT of each endpoint — the leakage check every
    training pipeline must run after splitting (a val/test doc with a
    train-side near-duplicate inflates eval; C4/GPT-style dedup papers
    report exactly this cross-split dup mass). One row per unordered
    split pair with the pair count, exact mean Jaccard, and a
    ``leaky`` flag (endpoints in different splits).

    Composes two independently-oracled stages —
    ``minhash_lsh_dup_pairs`` (≡ exact Jaccard at the threshold) ×
    ``split_assignments`` (pure column math, zero shuffle) — so the
    whole report keeps a value-hash oracle. The split table is a
    narrow (doc_id, split) projection; both joins ride the
    dup-density-bounded pair list. The production fix for a leaky
    report is upstream (content-hash splitting or cross-split dedup —
    ``dedup_incremental``'s shape with the train side as the index);
    this op is the measurement. ``split`` injects an alternative
    (doc_id, split) assignment — the group-aware
    ``split_assignments_grouped`` audits to zero leaky rows through
    this parameter (r8)."""
    pairs = minhash_lsh_dup_pairs(docs, threshold)
    sp = split_assignments(docs) if split is None else split
    labeled = (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("_pa")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("_pb")),
            "doc_b",
        )
        .select(
            F.least("_pa", "_pb").alias("split_a"),
            F.greatest("_pa", "_pb").alias("split_b"),
            F.col("jaccard").cast("decimal(18,8)").alias("_jd"),
        )
    )
    return (
        labeled.groupBy("split_a", "split_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("_jd").cast("double") / F.count("*"), 6).alias(
                "avg_jaccard"
            ),
        )
        .withColumn("leaky", F.col("split_a") != F.col("split_b"))
    )


def docs_ngram_novelty(docs: DataFrame) -> DataFrame:
    """Crawl-saturation metric: per document, the fraction of its
    distinct word shingles appearing for the FIRST time in doc_id
    order (first occurrence = smallest doc_id) — the novelty curve a
    crawl pipeline watches to decide when another snapshot stops
    adding information (novelty → 0 as the frontier saturates; C4-era
    crawl reports plot exactly this). Docs shorter than the shingle
    width drop out (no shingles ⇒ no novelty denominator), matching
    every shingle-family operator.

    Shape: the denominator is per-row (size of the shingle-hash set —
    zero shuffle) and the numerator NEVER joins back to the gram
    stream: the first-occurrence map (gram-hash → min doc_id) is
    immediately re-aggregated BY its winning doc_id, so the two
    shuffles carry (8-byte hash, id) pairs map-side combined and the
    final join is per-doc count rows only. A first formulation that
    joined the first-occurrence map back onto the exploded string
    grams measured 29s at sf0.1 vs 1-2s for this one. At production
    scale the first-occurrence map is the artifact you materialize
    once and maintain incrementally, exactly like
    ``dedup_incremental``'s band index. Gram identity uses the
    package's 64-bit shingle hashes (collision odds as documented on
    ``doc_shingle_hashes``)."""
    # r9 (guide §5 caching rule): ``sh`` feeds BOTH the per-doc
    # denominator and the exploded gram stream; unpersisted, the
    # tokenize+shingle+hash pass ran twice per execution. The hash-array
    # form is the documented cheap-to-cache representation
    # (doc_shingle_hashes docstring).
    sh = scoped_persist(doc_shingle_hashes(docs))
    base = sh.select("doc_id", F.size("hs").cast("long").alias("n_grams"))
    ex = sh.select("doc_id", F.explode("hs").alias("g"))
    first = ex.groupBy("g").agg(F.min("doc_id").alias("doc_id"))
    nov = first.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_novel")
    )
    return base.join(nov, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce("n_novel", F.lit(0)) / F.col("n_grams").cast("double"),
            6,
        ).alias("novelty"),
    )
