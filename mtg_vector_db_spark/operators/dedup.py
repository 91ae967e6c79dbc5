"""Deduplication operators for large-scale corpus pipelines.

The reference dedups on a unique business key with a per-row existence probe
(/root/reference/db/ingest_cards.py:240-258, UNIQUE backstop init.sql:18).
At 100 TB that generalizes to four families, all implemented here as pure
DataFrame ops:

* exact dedup           — content-hash groupBy (one shuffle on the hash key);
* MinHash + LSH banding — shingle → signature → band bucket join; finds
  near-duplicate *pairs* without the O(n²) comparison: only rows sharing a
  band key meet in the (band_key) shuffle, then candidates are verified with
  exact Jaccard. Bands/rows trade recall vs candidate volume;
* SimHash               — 64-bit sign-of-weighted-votes fingerprint +
  banded Hamming candidate generation;
* embedding near-dup    — cosine threshold over vector pairs (exact within
  an id-bounded block here; the ANN path in operators/ann.py is the
  corpus-scale candidate generator);
* paragraph dedup       — CCNet-style sub-document grain: cross-document
  first-occurrence fingerprint dedup of paragraph windows with per-doc
  reassembly (batch here; incremental face in streaming/pipelines.py).

Everything is hash-deterministic (md5-based) so results are reproducible
across engines — which is what lets the DuckDB oracle replay the exact same
LSH, not just an idealized version of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.text import tokens
from mtg_vector_db_spark.session import widen  # noqa: F401  (re-export; used by callers)
from mtg_vector_db_spark.functions.textstats import fingerprint


def word_shingles(c: Column, n: int = 3) -> Column:
    """Dedup'd lowercase word n-gram shingles of a text column.

    Built with ``zip_with`` over shifted slices — O(tokens) per row with a
    constant number of array ops, vs the O(tokens·n) element-indexing
    formulation (measured ~5× faster at equal output).

    The token array appears ~7× in this expression TREE, but binding it
    once through a singleton-array lambda (the l2_normalize discipline)
    was MEASURED A LOSS here (round 9: d07 +36%, c18 +72%, d16/d18/t22
    +20–30%): within one projection Spark's subexpression elimination
    already evaluates the duplicated token subtree once, and the lambda
    wrapper defeats both CSE and codegen of the outer slices. The
    discipline pays only where references cross operator boundaries
    (the simhash banded explode below) or sit inside per-element lambdas
    (l2_normalize's O(d²) case) — not for plain multi-reference inside
    one Project. Left textual."""
    toks = tokens(F.lower(c))
    sz = F.size(toks)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(sz - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        sz >= n,
        F.array_distinct(F.slice(grams, 1, F.greatest(sz - (n - 1), F.lit(0)))),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (dedup'd) array columns."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate summary by normalized-content fingerprint."""
    groups = df.groupBy(fingerprint(F.col(text_col)).alias("fp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.max("n").alias("max_group_size"),
    )


MINHASH_P = 2147483647  # Mersenne prime 2^31-1: products stay under 2^62


def minhash_coeffs(num_hashes: int = 16) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_k, b_k) mod MINHASH_P.

    a_k is never 0 (odd multiples of a golden-ratio constant mod a prime
    larger than both factors), so each h ↦ (a·h + b) mod p is a proper
    permutation-ish universal hash. Shared verbatim by the DuckDB oracle
    and the hashlib property model."""
    return [
        (
            (2654435761 * (2 * k + 1)) % MINHASH_P,
            (40503 * (k + 1) + 2654435769) % MINHASH_P,
        )
        for k in range(num_hashes)
    ]


def minhash_hash_values(shingle_col: Column, hash_fn: str = "md5") -> Column:
    """Per-shingle 31-bit base hash. Computed ONCE per shingle — the
    num_hashes seed variants are cheap integer mixes of this value (see
    :func:`minhash_signature`), which is what keeps MinHash at one hash
    per shingle instead of num_hashes of them (measured ~10× on the
    signature stage).

    ``hash_fn``:
    * ``"md5"`` (default) — fold the first 15 hex chars of md5(shingle)
      into a 60-bit int (``conv``), reduce mod MINHASH_P. Engine-portable:
      the DuckDB oracles replay it digit-for-digit.
    * ``"xxhash64"`` — Spark's native 64-bit xxHash, pmod MINHASH_P. The
      production fast path: no hex round-trip, codegen'd JVM hashing
      (measured speedup on the signature stage in SCALE.md). NOT
      oracle-replayable — use when throughput matters more than
      cross-engine replay; candidate quality is equivalent (any uniform
      hash family works for MinHash) and the exact-Jaccard verify step
      is identical, so output pairs are true pairs either way.
    """
    if hash_fn == "xxhash64":
        return F.transform(
            shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_P))
        )
    return F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P,
    )


def minhash_signature(hash_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as ONE array column over pre-computed base
    hashes (:func:`minhash_hash_values`): element k is
    min over shingles of (a_k·h + b_k) mod p — the standard universal-hash
    MinHash family, exactly replayable in SQL (pure 64-bit int arithmetic,
    no engine-specific hashing).

    Deliberately a single nested expression (transform over the literal
    coefficient array), NOT num_hashes sibling projection columns: emitting
    many lambda-bearing expressions in one projection silently corrupts
    their results in this Spark version (observed: 16 array_min(transform)
    columns evaluate to garbage; the identical computation as one nested
    transform is correct — pinned by tests/test_properties.py against a
    hashlib model)."""
    coeffs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in minhash_coeffs(num_hashes)
        ]
    )
    return F.transform(
        coeffs,
        lambda c: F.array_min(
            F.transform(hash_col, lambda h: (c["a"] * h + c["b"]) % MINHASH_P)
        ),
    )


def bucket_pairs(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None = None,
    payload_col: str | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Candidate pairs from LSH buckets: groupBy the bucket key, collect
    the (sorted) member list, emit each 2-combination once, distinct across
    buckets. ONE shuffle keyed on the bucket, no self-join — both cheaper
    and immune to the wrong-result flake we hit with a band self-join +
    distinct under AQE (a 3-band match was dropped in specific session
    states; the groupBy formulation is deterministic by construction).

    ``max_bucket_size`` is the skew guard: a hot bucket of n rows costs
    n²/2 pairs; oversized buckets (degenerate shingles / exact-dup blobs —
    handle those with exact_dup_stats' O(n) hash groupBy first) are dropped
    whole, confining the recall loss. ``None`` keeps exact LSH semantics,
    which is what the SQL oracles replay.

    ``payload_col``: optional extra column carried with each id (e.g. the
    simhash blocks) — output columns become (id_a, id_b[, p_a, p_b])."""
    id_col = [c for c in banded.columns if c not in key_cols and c != payload_col][0]
    member = (
        F.struct(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))
        if payload_col
        else F.struct(F.col(id_col).alias("id"))
    )
    grouped = banded.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(member)).alias("ms")
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ms") <= max_bucket_size)
    combos = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ms"), i + 2, F.greatest(F.size("ms") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        grouped.filter(F.size("ms") > 1)
        .select(F.explode(combos).alias("pr"))
        .select(
            F.col("pr.a.id").alias("id_a"),
            F.col("pr.b.id").alias("id_b"),
            *(
                [F.col("pr.a.p").alias("p_a"), F.col("pr.b.p").alias("p_b")]
                if payload_col
                else []
            ),
        )
    )
    # ``distinct=False`` lets a caller verify FIRST and dedup the (much
    # smaller) verified set on scalar columns — e.g. simhash's Hamming
    # filter drops most candidates and its payload columns are arrays,
    # which are expensive distinct keys (round 8). The caller owns the
    # cross-band dedup in that case; per-pair payloads are functions of
    # the ids, so dedup-after-verify emits the identical pair set.
    return pairs.distinct() if distinct else pairs


def banded_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """Shared LSH front end: ``(shingled, banded)`` where ``shingled`` is
    ``(id, shingles)`` and ``banded`` is ``(id, band, band_key)``.

    No persist: shingling is a cheap narrow projection (zip_with, one
    pass) and recomputing it for the verify join is the scale-correct
    trade — caching the shingled corpus at 100 TB is not an option, and
    a lazily-shared cache under a self-join proved flaky (lost candidate
    pairs when cache fill raced the join's two sides). Base hashes get
    their own projection so the md5 fold runs once per shingle; the
    ``bands`` band keys are emitted by a single ``inline`` explode, so
    the signature columns are never recomputed per band.
    """
    rows_per_band = num_hashes // bands
    sh = widen(docs).select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    )
    hv = sh.select(
        id_col, minhash_hash_values(F.col("shingles"), hash_fn).alias("hv")
    )
    sig = hv.select(
        id_col, minhash_signature(F.col("hv"), num_hashes).alias("sig")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.get(F.col("sig"), b * rows_per_band + r).cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(F.col(id_col), F.inline(band_structs))
    return sh, banded


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
    round_digits: int = 6,
    max_bucket_size: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard verify.

    Plan shape (scale-critical): signatures are ONE narrow projection over
    the corpus (the ``bands`` band keys are emitted by a single ``inline``
    explode, so the 16 md5-min signature columns are never recomputed per
    band); each band contributes a shuffle keyed on its band key only;
    candidate pairs (tiny vs n²) are then verified by re-joining the shingle
    sets. No full cross join anywhere. ``max_bucket_size`` is the skew
    guard (see :func:`bucket_pairs`).
    """
    sh, banded = banded_signatures(
        docs, id_col, text_col, num_hashes, bands, hash_fn
    )
    cand = bucket_pairs(banded, ["band", "band_key"], max_bucket_size)

    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(j, round_digits).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )


def exact_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact all-pairs Jaccard at a positive threshold (the exact
    baseline LSH recall is measured against).

    Round-8 physical rewrite (results identical): the quadratic
    BroadcastNestedLoopJoin pair scan — every (a, b) pays an O(|sh_a| +
    |sh_b|) array_intersect — is replaced by a shingle posting-list
    equi-join: explode each doc's (deduped) shingle set, join on the
    shingle, and count matches per pair, so ONLY pairs sharing ≥1
    shingle are ever materialized. ``|∩|`` = the match count (shingle
    sets are distinct per doc — word_shingles array_distincts), ``|∪|``
    = n_a + n_b − |∩|, and the division produces the same integers →
    the same float64 → the same rounded value as
    ``size(intersect)/size(array_distinct(concat))``. Any pair with NO
    common shingle has jaccard 0 < threshold under the old form and is
    absent here — identical output for every threshold > 0 (guarded).
    Measured: 60.1 s → 0.58 s on the 1000-doc c18 verify at sf0.1,
    local[4], zero pair/value mismatches. At 100 TB this is also the
    only viable shape — the shuffle keys on shingle hash, never on a
    pair cross product (per-shingle posting hot spots are the classic
    stop-word risk; shingle width 3 keeps posting lists short, and the
    bounded callers cap the input by construction).
    """
    if threshold <= 0:
        raise ValueError(
            "exact_jaccard_pairs requires threshold > 0: the posting-join "
            "form never materializes zero-overlap pairs"
        )
    sh = widen(docs).select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    )
    ex = sh.select(
        F.col(id_col),
        F.size("shingles").alias("_nsh"),
        F.explode("shingles").alias("_s"),
    )
    ea = ex.select(
        F.col(id_col).alias("id_a"), F.col("_nsh").alias("_na"), "_s"
    )
    eb = ex.select(
        F.col(id_col).alias("id_b"), F.col("_nsh").alias("_nb"), "_s"
    )
    j = F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c"))
    return (
        ea.join(eb, "_s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("id_a", "id_b", F.round(j, round_digits).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _nibble_vote_map() -> Column:
    """Literal map hex-char -> 4-long array of ±1 bit votes (LSB-first:
    vote[k] for bitpos = nibble_index*4 + k, matching the oracle's
    ``(floor(v / 2^k) % 2) * 2 - 1``). A byte-pair table (256 entries)
    evaluates slightly faster warm but its 512-literal map costs more to
    compile than it ever saves — queries run cold once per plan."""
    entries: list[Column] = []
    for v, ch in enumerate("0123456789abcdef"):
        votes = F.array(*[F.lit(((v >> k) & 1) * 2 - 1) for k in range(4)])
        entries.extend([F.lit(ch), votes])
    return F.create_map(*entries)


def simhash_expr(text: Column) -> Column:
    """64-bit SimHash of a text column as a 64-char '0'/'1' string — a pure
    column expression: NO explode, NO shuffle, no per-bit rows.

    Token hash = first 16 hex chars of md5 (4 bits per char, LSB-first per
    nibble); each token votes ±1 per bit position; fingerprint bit = sign of
    the vote sum. The per-token 64-vote vector is built by flattening 16
    nibble lookups into a literal vote table, and the per-document sum is a
    single ``aggregate``/``zip_with`` fold over the token array — the whole
    fingerprint is computed in one map stage, which is what makes it free to
    band/self-join afterwards (and embarrassingly parallel at 100 TB).
    Bit-exactly reproducible in SQL (same md5/nibble/vote semantics).
    """
    nibmap = _nibble_vote_map()
    toks = tokens(F.lower(text))
    hashes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 16))
    votes = lambda h: F.flatten(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.element_at(nibmap, h.substr(i, F.lit(1))),
        )
    )
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    return F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(acc, votes(h), lambda x, y: x + y.cast("long")),
        lambda acc: F.array_join(
            F.transform(
                acc, lambda sm: F.when(sm >= 0, F.lit("1")).otherwise(F.lit("0"))
            ),
            "",
        ),
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (see :func:`simhash_expr`).

    Token-less docs (empty/whitespace text) are excluded: with no votes
    every bit ties and sign(0) would emit a degenerate all-ones
    fingerprint that Hamming-matches every other empty doc — empty docs
    belong to exact dedup, not a similarity sketch (fuzz-parity
    finding; the SQL oracles' token explode drops them the same way).
    """
    return widen(docs).select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_tk"),
        simhash_expr(F.col(text_col)).alias("simhash"),
    ).filter(F.size("_tk") > 0).drop("_tk")


def simhash_neardup_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 10,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by banded SimHash: candidates share at least one of
    ``bands`` 16-bit blocks (exact-match join per block — the classic
    Hamming-LSH trick), verified by full Hamming distance ≤ ``max_hamming``.

    The '0'/'1' fingerprint string is converted ONCE per row into integer
    blocks (``conv`` base-2), so the band join keys are ints and the verify
    is ``Σ bit_count(a XOR b)`` — whole-stage-codegen arithmetic, no
    per-character interpreted comparison over candidate pairs.
    """
    width = 64 // bands
    blk = lambda b: F.conv(  # noqa: E731
        F.substring(F.col(fp_col), 1 + b * width, width), 2, 10
    ).cast("int")
    with_blocks = fps.select(
        F.col(id_col), F.array(*[blk(b) for b in range(bands)]).alias("blocks")
    )
    # Explode a LITERAL band sequence and index into ``blocks``, instead
    # of ``posexplode(blocks)`` (round 9): with the generator referencing
    # the computed array while the array is also a pass-through column,
    # the optimizer re-inlines the array's defining expression into the
    # generator — and ``blocks`` derives from the full SimHash fold, so
    # every row paid the per-token vote fold FOUR extra times (executed
    # plan showed the fold ×5 / the conv chain ×8; measured 2.46 s →
    # 0.37 s for this step at sf0.1). Identical rows: band = 0..bands-1,
    # block = blocks[band].
    banded = with_blocks.select(
        F.col(id_col),
        F.col("blocks"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn("block", F.get(F.col("blocks"), F.col("band")))
    # Verify BEFORE the cross-band dedup (round 8): a pair surfaces once
    # per shared band (≤ ``bands``×) and the old distinct keyed on the
    # int-array payloads; computing the (deterministic) Hamming distance
    # per occurrence is ~12 codegen ops, after which the ≤ max_hamming
    # filter drops most candidates and the dedup runs over three scalar
    # columns on the survivors only. Same pair set, same distances.
    cand = bucket_pairs(
        banded,
        ["band", "block"],
        max_bucket_size,
        payload_col="blocks",
        distinct=False,
    ).withColumnsRenamed({"p_a": "blk_a", "p_b": "blk_b"})
    ham = sum(
        F.bit_count(F.get(F.col("blk_a"), b).bitwiseXOR(F.get(F.col("blk_b"), b)))
        for b in range(bands)
    )
    return (
        cand.select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def positional_ngrams(text: Column, n: int) -> Column:
    """Word n-grams WITH start positions: array of ``(pos, gram)`` structs,
    pos 0-based over the token stream. Unlike :func:`word_shingles` this
    keeps duplicates and positions — the carrier for span-level dedup.

    Same zip-with-shifted-slices construction (O(tokens) array ops per
    row); ``posexplode`` downstream yields the position for free, so the
    column is just the gram array sliced to the valid window count.
    Token-array references stay textual — see word_shingles for why the
    bind-once lambda was measured a loss here.
    """
    toks = tokens(F.lower(text))
    sz = F.size(toks)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(sz - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        sz >= n, F.slice(grams, 1, F.greatest(sz - (n - 1), F.lit(0)))
    ).otherwise(F.array().cast("array<string>"))


def repeated_ngram_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated n-gram span detection — the batch analogue
    of suffix-array exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): find every word
    ``n``-gram occurring in ≥ ``min_docs`` distinct documents and report,
    per document, how much of its token stream those repeated spans cover.

    Scale shape: positional grams explode to one row per window; each
    gram is folded to a 60-bit md5 int so the duplicate-detection shuffle
    moves fixed-width keys, not strings. The dup-hash set and the join
    back both key on that hash — Catalyst reuses one Exchange for the
    aggregate and the join probe. Coverage then reduces per document:
    overlapping spans are merged by exploding each dup window to its
    ``n`` token positions and counting distinct positions (bounded ×n
    blow-up on *duplicated* windows only).

    Returns docs with any repeated span: ``(doc_id, n_tokens, n_grams,
    n_dup_grams, covered_tokens, covered_ratio)``.
    """
    g = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tokens"),
        F.posexplode(positional_ngrams(F.col(text_col), n)).alias("pos", "gram"),
    ).select(
        "doc_id",
        "n_tokens",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    dup = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    # ONE reduction computes both per-doc metrics: window starts (pos) are
    # unique within a doc, so countDistinct(pos) is the dup-window count,
    # and countDistinct(p) over the exploded n positions is the merged
    # coverage; n_grams derives from n_tokens — no second gram projection,
    # no extra join-back against the corpus.
    exploded = g.join(dup, "h").select(
        "doc_id",
        "n_tokens",
        "pos",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("p"),
    )
    return (
        exploded.groupBy("doc_id", "n_tokens")
        .agg(
            F.count_distinct("pos").alias("n_dup_grams"),
            F.count_distinct("p").alias("covered_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).alias("n_grams"),
            "n_dup_grams",
            "covered_tokens",
            F.round(F.col("covered_tokens") / F.col("n_tokens"), 6).alias(
                "covered_ratio"
            ),
        )
    )


def boilerplate_stats(
    docs: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    df_ratio: float = 0.5,
) -> DataFrame:
    """Per-group boilerplate profile (the CCNet/Gopher repeated-content
    rule, shingle-granular because this corpus has no line structure):
    a shingle is boilerplate within its ``by`` group when it appears in
    ≥ ``df_ratio`` of the group's documents; report per group how much of
    each document's shingle set is boilerplate.

    Scale shape: one explode + one (group, shingle) aggregate; group
    document totals are a tiny aggregate broadcast back; the per-document
    reduction rides the same (group, shingle) partitioning. No step is
    ever keyed on anything wider than a shingle.

    Returns ``(group, n_docs, n_boiler_shingles, avg_boiler_ratio)``.
    """
    sh = widen(docs).select(
        F.col(by).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    grp_docs = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count_distinct(id_col).alias("n_docs")
    )
    sh_df = sh.groupBy("grp", "sh").agg(F.count_distinct("doc_id").alias("df"))
    boiler = (
        sh_df.join(F.broadcast(grp_docs), "grp")
        .filter(F.col("df") >= F.col("n_docs") * df_ratio)
        .select("grp", "sh")
    )
    doc_ratio = (
        sh.join(boiler.withColumn("is_b", F.lit(1)), ["grp", "sh"], "left")
        .groupBy("grp", "doc_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("is_b"), F.lit(0)))
                / F.count(F.lit(1)),
                9,
            ).alias("ratio")
        )
    )
    return (
        doc_ratio.groupBy("grp")
        .agg(F.round(F.avg("ratio"), 6).alias("avg_boiler_ratio"))
        .join(F.broadcast(grp_docs), "grp")
        .join(
            F.broadcast(
                boiler.groupBy("grp").agg(
                    F.count(F.lit(1)).alias("n_boiler_shingles")
                )
            ),
            "grp",
            "left",
        )
        .select(
            F.col("grp").alias(by),
            "n_docs",
            F.coalesce("n_boiler_shingles", F.lit(0)).alias("n_boiler_shingles"),
            "avg_boiler_ratio",
        )
    )


def incremental_neardup(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Incremental near-dup: which NEW documents near-duplicate something
    already in the corpus — the weekly-ingest shape, where re-running
    all-pairs LSH over corpus+batch would redo work proportional to the
    full corpus every time.

    Scale shape: the existing side's ``(id, band, band_key)`` index is a
    narrow projection computed once (in production: stored and reused —
    the band keys are deterministic md5 arithmetic, so an index written
    at ingest time never needs recomputation); the new batch, typically
    orders of magnitude smaller, builds its band keys and joins. The only
    data-sized shuffle keys on the band key; the exact-Jaccard verify
    touches only candidate pairs. Returns ``(id_new, id_existing,
    jaccard)`` for verified pairs.
    """
    sh_new, banded_new = banded_signatures(
        new_docs, id_col, text_col, num_hashes, bands
    )
    sh_old, banded_old = banded_signatures(
        existing, id_col, text_col, num_hashes, bands
    )
    cand = (
        banded_new.withColumnRenamed(id_col, "id_new")
        .join(
            banded_old.withColumnRenamed(id_col, "id_existing"),
            ["band", "band_key"],
        )
        .select("id_new", "id_existing")
        .distinct()
    )
    sa = sh_new.select(F.col(id_col).alias("id_new"), F.col("shingles").alias("sh_a"))
    sb = sh_old.select(
        F.col(id_col).alias("id_existing"), F.col("shingles").alias("sh_b")
    )
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        cand.join(sa, "id_new")
        .join(sb, "id_existing")
        .select(
            "id_new", "id_existing", F.round(j, round_digits).alias("jaccard")
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """The APPLY step of span-level dedup (Lee et al. remove the
    duplicated substrings, not the documents): reconstruct each document
    from the token positions NOT covered by any cross-document repeated
    ``n``-gram. Documents with no repeated spans pass through unchanged.

    Scale shape: shares :func:`repeated_ngram_spans`' hash-keyed stages;
    the reconstruction is a per-document sort of kept positions inside
    an aggregation (collect_list → array_sort → re-join) — grouped by
    the id the rows already carry, one shuffle. Returns ``(doc_id,
    n_tokens, kept_tokens, cleaned_text)``.
    """
    g = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tokens"),
        F.posexplode(positional_ngrams(F.col(text_col), n)).alias("pos", "gram"),
    ).select(
        "doc_id",
        "n_tokens",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    dup = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    covered = (
        g.join(dup, "h")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("p"),
        )
        .distinct()
    )
    toks = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("p", "tok"),
    )
    kept = toks.join(covered, ["doc_id", "p"], "left_anti")
    per_doc_tokens = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tokens"),
    )
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("p"), F.col("tok")))
            ).alias("ps")
        )
        .select(
            "doc_id",
            F.size("ps").alias("kept_tokens"),
            F.array_join(F.transform("ps", lambda s: s["tok"]), " ").alias(
                "cleaned_text"
            ),
        )
    )
    return (
        per_doc_tokens.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 8,
) -> DataFrame:
    """CCNet-style cross-document paragraph deduplication (Wenzek et al.
    2020 run SHA1-per-paragraph dedup before any model-based filtering;
    the reference has no sub-document grain at all — its unit is the
    whole card, db/ingest_cards.py:240-258).

    Paragraph = a non-overlapping ``para_tokens``-token window (the test
    corpus is an unpunctuated token stream; real corpora would split on
    newlines/sentences — same pipeline from the fingerprint on). An
    instance is kept iff it is the corpus-wide FIRST occurrence of its
    normalized fingerprint (lowest ``(doc_id, para_id)``); later repeats
    are dropped and each doc's surviving text is reassembled in order.

    Returns ``(doc_id, n_paras, n_kept, text_kept)`` — one row per doc
    with ≥1 token; ``text_kept = ''`` when every paragraph was a repeat.

    Scale shape: one map-side chunk+fingerprint pass, ONE shuffle keyed
    on the 32-char fingerprint (the first-occurrence window), one
    doc-grain reassembly reduce. Nothing ever shuffles raw text as a
    key, and the paragraph stream is linear in corpus tokens.
    """
    paras = doc_paragraphs(docs, id_col, text_col, para_tokens)

    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint(F.col("ptext"))).orderBy(
        "doc_id", "para_id"
    )
    flagged = paras.withColumn(
        "kept", F.row_number().over(w) == 1
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct("para_id", "ptext"),
                            )
                        )
                    ),
                    lambda s: s["ptext"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )


def doc_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 8,
) -> DataFrame:
    """Explode documents into ``(doc_id, para_id, ptext)`` paragraph rows
    (non-overlapping ``para_tokens``-token windows; see
    :func:`paragraph_dedup`). Pure map stage — the shared front end of
    the batch and streaming paragraph-dedup faces."""
    d = widen(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
    ).filter(F.size("toks") > 0)
    n_paras = F.ceil(F.size("toks") / F.lit(float(para_tokens))).cast("long")
    return d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("long"), n_paras - 1),
                lambda k: F.struct(
                    k.cast("long").alias("para_id"),
                    F.array_join(
                        F.slice(
                            "toks",
                            (k * para_tokens + 1).cast("int"),
                            para_tokens,
                        ),
                        " ",
                    ).alias("ptext"),
                ),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p.para_id").alias("para_id"),
        F.col("p.ptext").alias("ptext"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    local fingerprinting algorithm): hash every word ``k``-gram, slide a
    window of ``w`` consecutive hashes, keep each window's MINIMUM —
    a ~2/(w+1)-density sample of the gram stream with the guarantee
    that any shared run of ≥ ``w+k-1`` tokens between two documents
    yields at least one shared fingerprint. The contamination /
    plagiarism screen that exact-gram methods (d07) pay ~w× more
    shuffle for.

    Scale shape: the entire select-the-minima step happens in the ARRAY
    domain on the scan side — gram hashes via one transform, window
    minima via ``array_min`` over sliced views, dedup via
    ``array_distinct`` — so NOTHING shuffles until the winnowed
    fingerprint relation itself, already k·w× smaller than the gram
    stream and carrying fixed-width 60-bit keys.

    Returns the distinct ``(doc_id, fp)`` fingerprint relation.
    """
    grams = positional_ngrams(F.col(text_col), k)
    hs0 = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
            "bigint"
        ),
    )

    # Bind the hash array ONCE per row through a singleton-array lambda
    # variable (the l2_normalize pattern): higher-order functions are
    # interpreted with NO common-subexpression elimination, so
    # referencing `hs0` inside the per-window lambda would re-run the
    # whole md5 transform for EVERY window start — O(len²·md5) per doc
    # (measured 18× end-to-end at sf1 before the binding: 120 s → 6.6 s).
    def _select_minima(hs):
        nwin = F.size(hs) - (w - 1)
        return F.when(
            F.size(hs) >= w,
            F.array_distinct(
                F.transform(
                    # guard: F.sequence(0, nwin-1) DESCENDS for nwin<1
                    F.sequence(F.lit(0), nwin - 1),
                    lambda s: F.array_min(F.slice(hs, s + 1, w)),
                )
            ),
        ).otherwise(
            F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(
                F.array().cast("array<bigint>")
            )
        )

    fps = F.get(F.transform(F.array(hs0), _select_minima), 0)
    return (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), F.explode(fps).alias("fp"))
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    min_shingles: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """ASYMMETRIC shingle containment |A∩B| / |A| — the quote / subset
    detector Jaccard structurally misses: a paragraph fully embedded in
    a much longer document has containment 1.0 but Jaccard ≈ |A|/|B|.
    Returns directed pairs ``(id_a, id_b, containment)`` where at least
    ``threshold`` of a's shingles appear in b (a ≠ b, a has ≥
    ``min_shingles`` shingles so trivially-short docs can't flood).

    Shape at scale: NO pair cross join — shingles fold to 60-bit md5
    ints and the candidate pairs come from a posting-list self-join
    keyed on that fixed-width hash (work ∝ Σ posting_size², i.e. only
    co-occurring shingles), then one (a, b) count-aggregate joined back
    against the per-doc shingle counts (the PAIR side is the small
    relation — never broadcast the corpus-sized size table). Same skew story
    as the LSH bucket join: a boilerplate shingle with a huge posting
    list is the hot key — cap or pre-drop via d08's boilerplate profile
    in production.
    """
    sh = widen(docs).select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col)).alias("shingles"),
    )
    sizes = sh.select(
        "doc_id", F.size("shingles").alias("n_sh")
    ).filter(F.col("n_sh") >= min_shingles)
    posts = sh.select(
        "doc_id",
        F.explode("shingles").alias("s"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    pa = posts.select(F.col("doc_id").alias("id_a"), "h")
    pb = posts.select(F.col("doc_id").alias("id_b"), "h")
    inter = (
        pa.join(pb, "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), "n_sh"), "id_a"
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / F.col("n_sh").cast("double"),
                round_digits,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def edit_distance_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.62,
    max_hamming_prefilter: int = 16,
    bands: int = 4,
    max_chars: int = 2048,
    max_bucket_size: int | None = None,
    round_digits: int = 6,
    ascii_fold: bool = False,
) -> DataFrame:
    """Near-dup pairs verified by EXACT normalized edit distance —
    ``edit_sim = 1 - levenshtein(a, b) / max(len(a), len(b))`` — over
    SimHash-banded candidates. The character-level verify catches
    reorder-light mutations (word swaps, small insertions) that set
    sketches score identically but humans call "the same doc", and its
    O(L·D) DP cost is why it only ever runs on the banded candidate set,
    never all pairs (the reference's pg_trgm path plays the analogous
    verify role behind its GIN index, db/init.sql:159-176).

    Scale posture: candidates come from the same banded Hamming-LSH as
    :func:`simhash_neardup_pairs` (one bucket-keyed shuffle, skew-cappable
    via ``max_bucket_size``), loosened to ``max_hamming_prefilter`` so
    the edit verify does real work beyond the sketch. Texts join onto the
    id-pair table by id key — the wide text column never rides a shuffle
    key — and are capped at ``max_chars`` so the DP verify is bounded per
    pair regardless of document size (``levenshtein`` is JVM-side
    whole-stage codegen; no Python in the loop).

    ``ascii_fold=True`` replaces every non-ASCII char with a single
    sentinel (U+007F) before the DP. This is the ENGINE-PARITY form the
    registered query uses: Spark's ``levenshtein`` counts characters but
    DuckDB's counts BYTES, so a multi-byte char costs 3 edits in the
    oracle and 1 here (measured on the fuzz corpus: '中文' flipped one
    pair across the 0.62 gate). The 1:1 fold keeps per-char granularity
    while making byte==char in both engines. The default (False) keeps
    full char identity — the semantically better choice for multilingual
    corpora, where the fold would treat any two equal-length non-ASCII
    spans as identical; char-exactness is pinned against a Python DP in
    tests.
    """
    fps = simhash_fingerprints(docs, id_col, text_col)
    cand = simhash_neardup_pairs(
        fps,
        max_hamming=max_hamming_prefilter,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )
    t = F.substring(F.col(text_col), 1, max_chars)
    if ascii_fold:
        t = F.regexp_replace(t, "[^\\x00-\\x7F]", "\x7f")
    capped = widen(docs).select(F.col(id_col), t.alias("_t"))
    sim = F.round(
        F.lit(1.0)
        - F.levenshtein("_ta", "_tb")
        / F.greatest(F.length("_ta"), F.length("_tb")),
        round_digits,
    )
    return (
        cand.join(
            capped.select(F.col(id_col).alias("id_a"), F.col("_t").alias("_ta")),
            "id_a",
        )
        .join(
            capped.select(F.col(id_col).alias("id_b"), F.col("_t").alias("_tb")),
            "id_b",
        )
        .select("id_a", "id_b", "hamming", sim.alias("edit_sim"))
        .filter(F.col("edit_sim") >= min_sim)
    )
