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
  corpus-scale candidate generator).

Everything is hash-deterministic (md5-based) so results are reproducible
across engines — which is what lets the DuckDB oracle replay the exact same
LSH, not just an idealized version of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mtg_vector_db_spark.functions.text import tokens
from mtg_vector_db_spark.functions.textstats import fingerprint


def word_shingles(c: Column, n: int = 3) -> Column:
    """Dedup'd lowercase word n-gram shingles of a text column."""
    toks = tokens(F.lower(c))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))
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


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature: per seed i, the lexicographic min of
    md5(shingle || '#i') across the shingle set. Hex-string min avoids any
    engine-specific integer hashing while preserving the MinHash property
    (a uniform "random" permutation per seed)."""
    return [
        F.array_min(
            F.transform(shingle_col, lambda s, i=i: F.md5(F.concat(s, F.lit(f"#{i}"))))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard verify.

    Plan shape (scale-critical): signatures are one narrow projection over
    the corpus; each band contributes a shuffle keyed on its band key only;
    candidate pairs (tiny vs n²) are then verified by re-joining the shingle
    sets. No full cross join anywhere.
    """
    rows_per_band = num_hashes // bands
    sh = docs.select(
        F.col(id_col), word_shingles(F.col(text_col)).alias("shingles")
    ).persist()
    sig = sh.select(id_col, "shingles", *minhash_signature(F.col("shingles"), num_hashes))

    band_frames = []
    for b in range(bands):
        key = F.concat_ws(
            "|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        band_frames.append(
            sig.select(
                F.col(id_col), F.lit(b).alias("band"), key.alias("band_key")
            )
        )
    banded = band_frames[0]
    for bf in band_frames[1:]:
        banded = banded.unionByName(bf)

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )

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
    """Brute-force all-pairs Jaccard (the exact baseline LSH recall is
    measured against; O(n²) — bound the input, don't run corpus-wide)."""
    sh = docs.select(F.col(id_col), word_shingles(F.col(text_col)).alias("shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(j, round_digits).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document, returned as a 64-char '0'/'1' string.

    Token hash = first 16 hex chars of md5 (4 bits per char); each token
    votes ±1 per bit position; fingerprint bit = sign of the vote sum.
    Computed via explode → groupBy (shuffle on (id, bitpos) — fully
    distributed, no wide rows), bit-exactly reproducible in SQL.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    hx = toks.select(id_col, F.substring(F.md5("tok"), 1, 16).alias("h"))
    nib = hx.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.conv(F.col("h").substr(i, F.lit(1)), 16, 10).cast("int"),
            )
        ).alias("p", "v"),
    )
    bits = nib.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        F.col("p"),
        F.col("v"),
    ).select(
        id_col,
        (F.col("p") * 4 + F.col("k")).alias("bitpos"),
        (
            (F.floor(F.col("v") / F.pow(F.lit(2.0), F.col("k"))).cast("int") % 2) * 2
            - 1
        ).alias("s"),
    )
    votes = bits.groupBy(id_col, "bitpos").agg(F.sum("s").alias("sm"))
    bitchar = F.when(F.col("sm") >= 0, F.lit("1")).otherwise(F.lit("0"))
    return votes.select(id_col, "bitpos", bitchar.alias("b")).groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bitpos", "b"))),
                lambda x: x["b"],
            ),
            "",
        ).alias("simhash")
    )


def simhash_neardup_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 10,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by banded SimHash: candidates share at least one of
    ``bands`` 16-bit blocks (exact-match join per block — the classic
    Hamming-LSH trick), verified by full Hamming distance ≤ ``max_hamming``."""
    width = 64 // bands
    frames = []
    for b in range(bands):
        frames.append(
            fps.select(
                F.col(id_col),
                F.col(fp_col),
                F.lit(b).alias("band"),
                F.substring(F.col(fp_col), 1 + b * width, width).alias("block"),
            )
        )
    banded = frames[0]
    for fr in frames[1:]:
        banded = banded.unionByName(fr)
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.block") == F.col("r.block"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{fp_col}").alias("fp_a"),
            F.col(f"r.{fp_col}").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.col("fp_a").substr(i, F.lit(1))
            != F.col("fp_b").substr(i, F.lit(1)),
        )
    )
    return (
        cand.select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
