"""Document deduplication operators for training-data pipelines.

All operators are pure DataFrame compositions (explode/groupBy/join)
so Catalyst plans them and whole-stage codegen runs them — no Python
in the hot path. Hashing uses md5 (JVM intrinsic, identical hex output
in DuckDB) so every operator here is oracle-checkable cross-engine.

Scale notes: the LSH family exists precisely because exact pairwise
similarity is O(n²) — at 100 TB only the banded candidate-pair path
survives. The shingle-join operators bound the blowup with a document-
frequency cap on join keys (a standard "drop ubiquitous shingles"
guard; at web scale this is what keeps the self-join sub-quadratic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Default ubiquitous-shingle cap for the Jaccard verify join: a shingle
# shared by more than this many documents contributes sum(df²) pairs to
# the self-join — one boilerplate shingle in 10⁶ docs is 10¹² candidate
# rows at web scale. 10⁴ keeps every shingle's pair contribution ≤ 10⁸
# (one shuffle partition's worth) while being far above any honest
# content shingle's document frequency. Pass ``max_doc_freq=None``
# explicitly to disable (exact ground-truth runs at bounded scale).
DEFAULT_MAX_DOC_FREQ = 10_000

# sentinel distinguishing "caller didn't say" (→ default cap) from an
# explicit None (→ uncapped)
_UNSET = object()


def tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def doc_shingle_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, shingles): each document's DISTINCT k-shingle set as ONE
    array row — the no-shuffle form of :func:`doc_shingles` (exploding
    this is exactly that operator's output). Shingle sets are per-doc,
    so ``array_distinct`` inside the row replaces a corpus-wide
    ``.distinct()`` exchange; keeping the set as an array also lets
    signature computation (:func:`minhash_band_signatures`) and size
    lookups run as pure column expressions with no groupBy.

    The token array is materialized behind a PROJECTION BOUNDARY
    before the shingle lambda touches it: inlining ``split()`` into
    the higher-order function re-evaluates the split per produced
    shingle — O(tokens²) work per document (measured 6× slower at
    sf0.1). ``array_join(slice(t, i, k))`` keeps the lambda to one
    O(k) array reference per shingle."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("t")
    )
    sh = F.when(
        F.size("t") >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: F.array_join(F.slice(F.col("t"), i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("id", sh.alias("shingles"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document. (id, shingle) can
    only repeat WITHIN a document, so a per-row ``array_distinct``
    yields the same row set as a global ``.distinct()`` — without its
    corpus-wide exchange. The shingle expression is inlined into the
    explode (NOT layered over :func:`doc_shingle_arrays`): an extra
    projection boundary lets InferFiltersFromGenerate push a
    ``size(...) > 0`` filter clone of the whole shingle subtree down
    to the scan, re-evaluating split+transform per row (the plan test
    counts ``split(`` occurrences to pin this)."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("t")
    )
    sh = F.when(
        F.size("t") >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: F.array_join(F.slice(F.col("t"), i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("id", F.explode(sh).alias("shingle"))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one surviving id per distinct text
    (keep lowest id), with the duplicate count. One shuffle."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    sh: DataFrame, n_bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """MinHash band signatures: per (id, band), the concatenation of
    ``rows_per_band`` min-hashes. min(md5(salt || shingle)) is a valid
    min-hash family because md5 output order is uniform on strings.

    All n_bands*rows_per_band mins are computed as aggregates of ONE
    groupBy over the shingle set (map-side partial aggregation, no
    row-multiplying explode) — at n rows this is n, not n*bands*rows.
    """
    mins = sh.groupBy("id").agg(
        *[
            F.min(
                F.md5(F.concat_ws("_", F.lit(b), F.lit(r), F.col("shingle")))
            ).alias(f"mh_{b}_{r}")
            for b in range(n_bands)
            for r in range(rows_per_band)
        ]
    )
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.concat_ws(":", F.lit(str(r)), F.col(f"mh_{b}_{r}"))
                for r in range(rows_per_band)
            ]).alias("sig"),
        )
        for b in range(n_bands)
    ])
    return mins.select("id", F.explode(bands).alias("x")).select(
        "id", "x.band", "x.sig"
    )


def minhash_band_array(
    shingles_col: str | F.Column = "shingles",
    n_bands: int = 4,
    rows_per_band: int = 2,
) -> F.Column:
    """Column expression: the banded min-hash signature of a shingle
    ARRAY as ``array<struct<band:int, sig:string>>`` — min-hash =
    ``array_min`` of the per-shingle salted md5s, a pure projection
    with no aggregation. Same hash family and band/sig encoding as
    :func:`minhash_signatures` (min over the same shingle set)."""
    c = F.col(shingles_col) if isinstance(shingles_col, str) else shingles_col

    def band_sig(b: int) -> F.Column:
        return F.concat_ws("|", *[
            F.concat_ws(
                ":", F.lit(str(r)),
                F.array_min(F.transform(
                    c, lambda s: F.md5(F.concat_ws("_", F.lit(b), F.lit(r), s))
                )),
            )
            for r in range(rows_per_band)
        ])

    return F.array(*[
        F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
        for b in range(n_bands)
    ])


def minhash_band_signatures(
    sh_arrays: DataFrame, n_bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, sig) — :func:`minhash_signatures` computed from
    per-doc shingle ARRAYS (:func:`doc_shingle_arrays`) instead of
    exploded rows: the whole signature stage is a projection
    (:func:`minhash_band_array`), so it needs NO exchange where the
    aggregate path pays a groupBy shuffle over every shingle row.
    Docs with empty shingle sets emit no signature rows (same as the
    aggregate path, where they have no rows to aggregate)."""
    bands = minhash_band_array("shingles", n_bands, rows_per_band)
    return (
        sh_arrays.filter(F.size("shingles") > 0)
        .select("id", F.explode(bands).alias("x"))
        .select("id", "x.band", "x.sig")
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Docs sharing any band signature → candidate pairs (a < b).

    One shuffle on (band, sig) feeds BOTH join sides (self-join of the
    same plan — Spark reuses the exchange), then per-bucket pairing;
    the distinct collapses multi-band collisions."""
    a = signatures.alias("a")
    b = signatures.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    max_doc_freq: "int | None | object" = _UNSET,
    pairs: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle (optionally
    restricted to given candidate ``pairs``). ``max_doc_freq`` drops
    ubiquitous shingles from the JOIN KEY set (the sum(df²) self-join
    scale guard) — it defaults ON (:data:`DEFAULT_MAX_DOC_FREQ`); pass
    ``None`` explicitly for an uncapped exact run. Jaccard denominators
    always use the FULL per-doc shingle counts; the cap only excludes
    ubiquitous shingles from intersection counting, so at any df ≤ cap
    the result is exact and above it a vanishing underestimate (a df >
    10⁴ shingle contributes ~0 discriminative signal).

    .. versionchanged:: round 5
       The default flipped from uncapped to capped at
       :data:`DEFAULT_MAX_DOC_FREQ` (10_000). Callers with legitimate
       shingle document frequencies above 10⁴ who need exact
       intersections there must now pass ``max_doc_freq=None`` (or a
       larger cap) explicitly.

    ``sizes``: optional precomputed (id, sz) per-doc shingle counts —
    :func:`doc_shingle_arrays` callers get them as ``size(shingles)``
    for free, skipping this function's groupBy over every shingle row.
    Must cover every id that can appear in a returned pair."""
    if max_doc_freq is _UNSET:
        max_doc_freq = DEFAULT_MAX_DOC_FREQ
    if sizes is None:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    join_sh = sh
    if max_doc_freq is not None:
        # the cap keeps shingles with df <= max_doc_freq ≡ DROPS the
        # (tiny, usually empty) ubiquitous set with df > cap. An
        # anti-join against that small set broadcasts and never
        # exchanges the full shingle table the way an inner join with
        # the large "rare" complement does.
        ubiq = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        join_sh = sh.join(ubiq, "shingle", "left_anti")
    if pairs is not None:
        # verify-only-candidates: semi-join each side down to docs that
        # appear in a candidate pair BEFORE the shingle self-join — the
        # self-join blowup is sum(df²) over all shingles otherwise,
        # O(candidate docs) after. Then keep only candidate pairs
        # before aggregating.
        a_side = join_sh.join(pairs.select(F.col("id_a").alias("id")).distinct(), "id", "left_semi")
        b_side = join_sh.join(pairs.select(F.col("id_b").alias("id")).distinct(), "id", "left_semi")
        a, b = a_side.alias("a"), b_side.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .join(pairs, ["id_a", "id_b"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a, b = join_sh.alias("a"), join_sh.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")), 4
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint from the doc's distinct tokens: bit j is the
    sign of the sum over tokens of ±1 drawn from nibble j of
    md5(token). Integer arithmetic end-to-end → exactly reproducible
    in any engine with md5."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).distinct()
    j = F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("j")
    nib = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("tok")), F.col("j"), 1),
    ) - 1
    contrib = F.when(nib >= 8, 1).otherwise(-1)
    per_bit = (
        toks.select("id", "tok", j)
        .withColumn("c", contrib)
        .groupBy("id", "j")
        .agg(F.sum("c").alias("s"))
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.pow(F.lit(2.0), F.col("j") - 1).cast("long")).otherwise(0)
        ).alias("simhash")
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    min(Γ(u) ∪ {u}). Doubles the reach of small labels each round."""
    nbrs = _sym(e)
    mins = nbrs.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least("mb", "a").alias("m")
    )
    return (
        nbrs.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u (edges oriented larger→smaller): connect every
    smaller neighbor, and u itself, to u's minimum neighbor —
    flattens local chains into stars."""
    e = e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
    mins = e.groupBy("a").agg(F.min("b").alias("m"))
    return (
        e.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(mins.select("a", F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: (node, cluster_id) where
    cluster_id = the minimum id reachable in the undirected pair graph
    — the step every real dedup pipeline needs between "pairs found"
    and "keep one document per group".

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — a public MapReduce
    algorithm): each round halves-or-better the distance of every node
    to its component minimum, so convergence is O(log n) ROUNDS even
    for pathological long-chain components where plain min-label
    propagation needs O(diameter) sequential jobs (the round-2 scale
    seam this replaces). Each half-round is one groupBy + one join —
    all Catalyst; ``localCheckpoint`` truncates lineage so round N
    doesn't replan rounds 1..N-1. Convergence is detected by an
    order-insensitive edge-set signature (count + sum of pair hashes
    — one tiny agg job per round over materialized partitions).
    Pass ``stats={}`` to receive {"rounds": k} back (tests assert the
    log-round bound)."""
    spark = pairs.sparkSession
    # materialize the (tiny) pair list ONCE: edges and nodes both
    # derive from it, and without this the entire upstream pair
    # pipeline (e.g. the MinHash-LSH candidate + verify dataflow)
    # executes twice — once per localCheckpoint below
    raw = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).localCheckpoint()
    edges = raw.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    # every node that appears in any pair — taken from the RAW pairs so a
    # node present only in self-pairs (a == b) still emits a singleton
    # (id, id) row instead of vanishing from the output
    nodes = _sym(raw).select(F.col("a").alias("id")).distinct().localCheckpoint()

    def signature(e: DataFrame):
        # order-insensitive edge-set signature. The hash sum is widened to
        # decimal(38,0) BEFORE aggregating: summing uniformly-distributed
        # 64-bit xxhash64 values overflows a long almost surely, which is
        # silent wraparound ANSI-off but ARITHMETIC_OVERFLOW under Spark 4's
        # ANSI-on default — operators must be correct under the caller's
        # session config, not just this package's pinned one.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = signature(edges)
    rounds = 0
    for _ in range(max_iters):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        rounds += 1
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    # converged edge set is a union of stars (child > root); roots and
    # isolated-pair survivors label themselves
    child_labels = edges.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
    root_labels = nodes.join(
        edges.select(F.col("a").alias("id")), "id", "left_anti"
    ).select("id", F.col("id").alias("cluster_id"))
    return child_labels.unionByName(root_labels)


def keep_cluster_representatives(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop near-duplicates: keep each cluster's representative (the
    min-id member) plus every unclustered document. One left join."""
    return (
        docs.join(clusters, docs[id_col] == clusters["id"], "left")
        .filter(F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id")))
        .drop("id", "cluster_id")
    )
