"""In-engine BPE tokenizer training (Sennrich et al. 2016).

The reference repo budgets tokens with a client-side tokenizer; a
training-data pipeline at corpus scale wants the TRAINING side in the
engine too — learn the merge table from the corpus, then encode the
corpus under its own vocab (plans/text_queries.py t36/t37 register both
as oracle-checked queries; streaming/pipelines.py keeps the trainer's
input fresh with an incremental word-type store).

Everything past tokenization runs on the word-TYPE table — the classic
BPE-trainer optimization: pair counting and merging are vocabulary-
bounded, not corpus-bounded, so 10× the corpus is ~0 extra training
cost (measured flat at the sf1 step, SCALE.md). Each training round is
one map-side-combinable pair count plus a 1-row-broadcast ``replace()``
rewrite; rounds are pinned (session.py:pin) so round r+1 reads
materialized blocks — the iterative-family discipline.

Symbol-sequence encoding: a word's symbols ride ONE string — symbols
joined by a DOUBLE 0x1f sentinel with single-0x1f padding at both ends.
Merging pair (x, y) is then exactly ``replace(w, ␟x␟␟y␟ → ␟xy␟)``: the
leading/trailing single sentinels anchor complete symbols (a pair whose
x is the suffix of a longer symbol can never false-match), interior
separators stay well-formed after substitution, and ``replace()``'s
left-to-right non-overlapping scan IS greedy BPE merge order
("aaaa" + (a,a) → [aa, aa]) — in Spark and DuckDB alike, which is what
makes the t36/t37 oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SEP = "\x1f"
DEFAULT_ROUNDS = 6


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lower-cased whitespace word-TYPE table ``(tok, freq)`` — the
    trainer's sufficient statistics. Tokens containing the 0x1f sentinel
    are excluded (they cannot ride the symbol-string encoding); real
    corpora don't contain unit separators inside words.

    This is the ONE corpus-scale stage of training: a single exploded
    count with map-side combine. The streaming face
    (streaming_vocab_maintenance) maintains exactly this table
    incrementally so training never rescans history.
    """
    from mtg_vector_db_spark.functions import text as T

    return (
        docs.select(F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok"))
        .filter(~F.col("tok").contains(SEP))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def encode_words(word_freq: DataFrame) -> DataFrame:
    """Sentinel-encode a word-type table: ``(tok, freq)`` →
    ``(tok, w, freq)`` with ``w`` the character-level symbol string."""
    s1 = F.lit(SEP)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.substr(F.col("tok"), i, F.lit(1)),
    )
    return word_freq.select(
        "tok",
        F.concat(s1, F.array_join(chars, SEP * 2), s1).alias("w"),
        "freq",
    )


def _adjacent_pairs(w: Column) -> Column:
    syms = F.split(w.substr(F.lit(2), F.length(w) - F.lit(2)), SEP * 2)
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("x"),
                F.element_at(syms, i + F.lit(1)).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))


def bpe_train(
    word_freq: DataFrame, rounds: int = DEFAULT_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Train ``rounds`` BPE merges from a ``(tok, freq)`` word-type
    table. Returns ``(merges, words)``: ``merges`` is the merge table
    ``(round, x, y, cnt)`` in training order; ``words`` is the word-type
    table after all merges ``(tok, w, freq)`` — the learned encoding of
    every word, ready for the apply side (t37: token budgets under the
    learned vocab are a length computation per TYPE).

    Fixed rounds keep the train oracle-replayable (the SQL nests exactly
    ``rounds`` argmax/replace CTEs — plans/text_queries._bpe_chain_ctes);
    ties break on (count DESC, x ASC, y ASC) so the argmax cannot flip
    between engines. Each round's winner is a 1-row broadcast
    crossJoined into the rewrite — no driver-side loop state.

    Degenerate corpora (round-4 ADVICE): if a round finds NO mergeable
    pair (every word fully merged to one symbol before ``rounds``
    complete), training STOPS there — ``merges`` holds the rounds that
    did learn a pair and ``words`` keeps the last successful rewrite —
    instead of the empty crossJoin silently emptying the words table.
    The emptiness check is a 1-row count over the already-pinned round
    winner, not a new job. The registered oracles (t36/t37) replay the
    full fixed-round chain, which is identical whenever the corpus
    supports ``rounds`` merges — their precondition, held by fixture.
    """
    from mtg_vector_db_spark.session import pin

    s1, s2 = F.lit(SEP), F.lit(SEP * 2)
    words = pin(encode_words(word_freq))
    merges = None
    for rnd in range(1, rounds + 1):
        top1 = pin(
            words.select("freq", F.explode(_adjacent_pairs(F.col("w"))).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(1)
            .withColumn("round", F.lit(rnd))
        )
        if top1.isEmpty():
            if merges is None:
                merges = top1  # zero learned merges, correct (empty) schema
            break
        merges = top1 if merges is None else merges.unionByName(top1)
        words = pin(
            words.crossJoin(F.broadcast(top1.select("x", "y")))
            .select(
                "tok",
                F.replace(
                    F.col("w"),
                    F.concat(s1, F.col("x"), s2, F.col("y"), s1),
                    F.concat(s1, F.col("x"), F.col("y"), s1),
                ).alias("w"),
                "freq",
            )
        )
    return merges, words


def bpe_train_batched(
    word_freq: DataFrame,
    n_merges: int = 64,
    batch_m: int = 16,
    max_rounds: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Multi-merge-per-round BPE training — the scale path past
    :func:`bpe_train`'s one-merge-per-round bound (round-4 VERDICT #3):
    a production tokenizer is ~32k merges, and 32k sequential Spark
    rounds is a scheduler problem, not a data problem. Per round this
    takes the top ``batch_m`` NON-INTERACTING pairs (no symbol shared
    between any two selected pairs, and no pair consuming another
    selection's product) and applies them in ONE rewrite pass — turning
    32k merges into ~32k/batch_m rounds.

    Non-interaction keeps the selected COUNTS exact: a merge (a,b) only
    changes adjacencies that involve ``a`` or ``b`` (neighbors of the
    fused ``ab``), so pairs over disjoint symbols neither create nor
    destroy each other's occurrences — each selected pair's count, and
    its rewrite, is identical to what sequential training would have
    seen when its turn came. Where candidates DO interact (share a
    symbol), the conflicting pair is deferred to a later round and
    re-counted — never applied against a stale count. Equivalence to
    sequential greedy is narrower than count-exactness, though: an
    applied merge's fused product can form NEW pairs (e.g. ``(ab, c)``)
    whose recounted frequency outranks a later pick in the same batch,
    and sequential training would have taken that new pair first. So
    batched ≡ sequential holds only when the selected pairs are
    symbol-disjoint AND no pair newly created by an earlier pick in the
    batch outranks a remaining pick; in general this is a valid
    batched-greedy VARIANT (the standard one — counts always fresh,
    picks rank-ordered within a round), not a sequential-replay
    guarantee. Only the first pick of each round is a true global
    argmax of its recount; later picks are argmax among non-interacting
    survivors. The t39 oracle replays the batched algorithm itself, so
    cross-engine parity is unaffected by this distinction.

    The per-round candidate fetch is a driver-side collect of at most
    ``4*batch_m`` rows — vocabulary-bounded (pair-type counts), never
    corpus-bounded, the same class as the k-row centroid fetches
    (tests/test_plans.py allowlist). The round's rewrite is one
    projection with ``<=batch_m`` nested ``replace()`` calls in rank
    order — order-independent across the batch by the disjointness
    invariant, and each round is pinned like :func:`bpe_train`'s.

    Returns ``(merges, words)`` with ``merges`` carrying the GLOBAL rank
    as ``round`` (1..n_merges, one row each) plus the batch round it was
    learned in (``batch_round``) — :func:`bpe_encode` applies it
    unchanged via ``rounds=n_merges``.

    ``max_rounds`` caps the number of batch rounds (conflicts can defer
    picks, stretching n_merges over extra rounds) — the fixed-structure
    form the t39 oracle replays; ``None`` (production) runs until
    ``n_merges`` are learned or the corpus is exhausted.
    """
    from mtg_vector_db_spark.session import pin

    spark = word_freq.sparkSession
    words = pin(encode_words(word_freq))
    learned: list[tuple[int, int, str, str, int]] = []  # rank, batch_round, x, y, cnt
    batch_round = 0
    while len(learned) < n_merges and (
        max_rounds is None or batch_round < max_rounds
    ):
        batch_round += 1
        want = min(batch_m, n_merges - len(learned))
        # collect: bounded to 4*batch_m pair-type rows (the greedy
        # selection needs slack for conflict-skipped candidates) —
        # vocabulary-bounded, never corpus rows.
        cands = (
            words.select("freq", F.explode(_adjacent_pairs(F.col("w"))).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("x"), F.asc("y"))
            .limit(4 * batch_m)
            .collect()
        )
        if not cands:
            break
        used: set[str] = set()
        batch: list[tuple[str, str, int]] = []
        for r in cands:
            if len(batch) >= want:
                break
            x, y, fused = r["x"], r["y"], r["x"] + r["y"]
            # Interaction guards: components disjoint from every earlier
            # selection's components AND products; our product must not
            # be a component another selection already consumed.
            if x in used or y in used or fused in used:
                continue
            used.update((x, y, fused))
            batch.append((x, y, int(r["cnt"])))
        for x, y, cnt in batch:
            learned.append((len(learned) + 1, batch_round, x, y, cnt))
        w = F.col("w")
        for x, y, _ in batch:
            w = F.replace(
                w,
                F.lit(SEP + x + SEP * 2 + y + SEP),
                F.lit(SEP + x + y + SEP),
            )
        words = pin(words.select("tok", w.alias("w"), "freq"))
    merges = spark.createDataFrame(
        learned, "round int, batch_round int, x string, y string, cnt bigint"
    )
    return merges, words


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    rounds: int = DEFAULT_ROUNDS,
    text_col: str = "tok",
) -> DataFrame:
    """BPE INFERENCE: encode arbitrary (incl. unseen) single-token
    strings under a trained merge table — adds ``n_syms``/``n_chars``.

    Applies each merge ONCE in training-rank order (one 1-row broadcast
    ``replace()`` per rank — the same rewrite the trainer used). For a
    merge table produced by :func:`bpe_train` this equals true
    apply-by-priority-until-fixed-point BPE inference: a rank-r merge's
    parts were themselves created by lower ranks, so no earlier-rank pair
    can become applicable after a later rank fires (rank order is
    topologically consistent by construction of training).

    Out-of-vocabulary is the point: training compresses word TYPES; this
    encodes strings never seen in training (the production tokenizer
    path). Tokens containing the sentinel get NULL counts (excluded from
    training for the same reason). ``rounds`` must match the trainer's
    (fully declarative — no action to discover it); a rank MISSING from
    the merge table (the trainer stopped early on a degenerate corpus —
    round-4 ADVICE) is a declarative no-op: each rank's broadcast side is
    padded with a never-matching null row and the rewrite is guarded by
    ``x IS NULL``, so the crossJoin stays exactly-one-row and the symbol
    string passes through unchanged. For well-formed merge tables the
    padded row loses the ``ORDER BY x NULLS LAST LIMIT 1`` and the plan
    applies the identical replace as before (t38's oracle values are
    unchanged).
    """
    s1, s2 = F.lit(SEP), F.lit(SEP * 2)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(text_col)),
        lambda i: F.substr(F.col(text_col), i, F.lit(1)),
    )
    out = df.withColumn(
        "_w",
        F.when(
            F.col(text_col).contains(SEP) | (F.length(text_col) == 0),
            F.lit(None).cast("string"),
        ).otherwise(F.concat(s1, F.array_join(chars, SEP * 2), s1)),
    )
    pad = df.sparkSession.range(1).select(
        F.lit(None).cast("string").alias("x"),
        F.lit(None).cast("string").alias("y"),
    )
    for rnd in range(1, rounds + 1):
        m = F.broadcast(
            merges.filter(F.col("round") == rnd)
            .select("x", "y")
            .unionByName(pad)
            .orderBy(F.col("x").asc_nulls_last())
            .limit(1)
        )
        out = out.crossJoin(m).withColumn(
            "_w",
            F.when(F.col("x").isNull(), F.col("_w")).otherwise(
                F.replace(
                    F.col("_w"),
                    F.concat(s1, F.col("x"), s2, F.col("y"), s1),
                    F.concat(s1, F.col("x"), F.col("y"), s1),
                )
            ),
        ).drop("x", "y")
    nosep = F.replace(F.col("_w"), s1, F.lit(""))
    return out.withColumn(
        "n_syms",
        ((F.length("_w") - F.length(nosep)) / F.lit(2)).cast("long"),
    ).withColumn("n_chars", F.length(nosep).cast("long")).drop("_w")
