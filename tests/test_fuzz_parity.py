"""Randomized-corpus oracle-parity fuzz.

Round 3's t27 fix came from a divergence the committed fixtures MASKED:
DuckDB's double→int cast rounds while Spark's truncates, and the fixture
vocabulary saturated before any x.5 quotient appeared. This suite
re-runs the ENTIRE registry's Spark-vs-DuckDB comparison on a seeded
randomized corpus engineered to hit the edges the driver fixtures don't:
empty/whitespace/one-token docs, case-variant and exact duplicates,
shared-shingle near-dups, unicode/emoji/punctuation runs, boundary token
counts around the paragraph/chunk window sizes, and a doc count chosen
so integer-division quotients land on .5 fractions.

Any query that diverges here harbors an engine-parity bug that a future
driver fixture could expose — fix the query, don't loosen the test.
"""

from __future__ import annotations

import random
import shutil

import pytest

from mtg_vector_db_spark.plans import registry
from tests.oracle_utils import assert_matches_oracle

registry.load_all()

SRC = "/root/testdata/sf0.001"


def _build_fuzz_corpus(spark, root, seed: int = 20260814) -> str:
    import numpy as np
    import pandas as pd

    rng = random.Random(seed)
    vocab = (
        "key agg row scan slow fast table value part hash merge batch spark "
        "the a line sort window alpha beta gamma delta Unicode Ünïcode 中文 "
        "emoji 😀 dash-term x1y2 UPPER Mixed"
    ).split()
    langs = ["en", "de", "es", "fr", "zh"]
    boiler = "subscribe to our newsletter for updates every day"  # 8 toks

    texts: list[str] = []
    # Edge shapes first (fixed), then random bulk.
    texts += ["", " ", "solo", "two tokens", boiler, boiler.upper()]
    texts += ["!!! ??? ... ;;; :::", "12345 67890 11111 22222"]
    texts += [("repeat me " * 20).strip()]  # in-doc loops
    for n in (7, 8, 9, 15, 16, 17):  # window-boundary token counts
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    while len(texts) < 330:
        n = rng.randint(0, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.15 and n >= 8:
            words[:8] = boiler.split()  # planted boilerplate paragraph
        if rng.random() < 0.10:
            words.append(f"fresh{len(texts)}tok")  # growing vocabulary
        texts.append(" ".join(words))
    # Planted exact + case-variant duplicates of random earlier docs.
    for _ in range(20):
        t = texts[rng.randrange(len(texts))]
        texts.append(t)
        texts.append(t.upper())
    rows = [
        (
            i,
            t,
            rng.choice(langs),
            f"src{rng.randrange(6)}",
            len(t),
        )
        for i, t in enumerate(texts)
    ]
    # 370 docs → count//10 = 37: doc_id/37 hits x.5 quotients (t27 class).
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{root}/documents.parquet", index=False)

    nprng = np.random.RandomState(7)
    n_vec, dim = 150, 64
    emb = nprng.standard_normal((n_vec, dim)).astype(np.float32)
    emb[40] = emb[17]  # exact twin (sim = 1.0 threshold edges)
    emb[41] = emb[17] + 1e-4 * nprng.standard_normal(dim).astype(np.float32)
    # Schema must mirror the driver fixture exactly (vec_id, embedding
    # float32 list, label int32) — an extra column broke p02's join with
    # an ambiguous reference, which is a fixture bug, not an engine one.
    pd.DataFrame(
        {
            "vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": [emb[i].tolist() for i in range(n_vec)],
            "label": (np.arange(n_vec) % 10).astype(np.int32),
        }
    ).to_parquet(f"{root}/embeddings.parquet", index=False)

    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{root}/{t}.parquet")
    return str(root)


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz")
    return _build_fuzz_corpus(spark, root)


# Families whose inputs the fuzz corpus actually perturbs (documents /
# embeddings). The relational r-family reads the untouched sf0.001
# copies — already swept every round — so skipping it halves runtime
# without losing fuzz coverage.
FUZZED = sorted(
    n for n in registry.QUERIES if n[0] in "dctvp" and n in registry.ORACLES
)


@pytest.mark.parametrize("name", FUZZED)
def test_oracle_parity_on_fuzz_corpus(spark, fuzz_dir, name):
    df = registry.QUERIES[name](spark, fuzz_dir)
    assert_matches_oracle(df, registry.ORACLES[name], fuzz_dir)


def _build_relational_fuzz(root, seed: int = 424242) -> str:
    """Perturb the REAL sf0.001 relational tables toward the known
    engine-tie edges: exact-second and session-gap-boundary timestamps,
    same-timestamp event ties, power-of-two quantities with odd-cent
    prices (the Q2 DECIMAL-division .5-tie class), and duplicated
    lineitem business keys. FK domains are preserved (values only move
    within existing key sets), so every join still lands."""
    import numpy as np
    import pandas as pd

    rng = random.Random(seed)

    ev = pd.read_parquet(f"{SRC}/events.parquet")
    # Half the timestamps truncated to exact seconds (seconds-vs-micros
    # divergences fire only when both sides of a comparison can tie).
    mask = ev.index % 2 == 0
    ev.loc[mask, "ts"] = ev.loc[mask, "ts"].dt.floor("s")
    # Session-gap boundary clones: +30:00.000000 exactly after an
    # existing event of the same user (gap >= vs > discriminator).
    clones = ev.sample(n=20, random_state=7).copy()
    clones["ts"] = clones["ts"] + pd.Timedelta(minutes=30)
    clones["event_id"] = clones["event_id"] + 1_000_000
    # Same-timestamp ties: distinct event_ids, identical (user, ts).
    ties = ev.sample(n=20, random_state=11).copy()
    ties["event_id"] = ties["event_id"] + 2_000_000
    ties["value"] = ties["value"] + 0.5
    ev = pd.concat([ev, clones, ties], ignore_index=True)
    ev.to_parquet(f"{root}/events.parquet", index=False)

    li = pd.read_parquet(f"{SRC}/lineitem.parquet")
    # Power-of-two quantities + odd-cent prices: unit-cost divisions can
    # land exactly on .5 at the rounded digit (the Q2 tie class).
    idx = li.sample(n=60, random_state=13).index
    li.loc[idx, "l_quantity"] = [
        float(rng.choice([2, 4, 8, 16, 32])) for _ in idx
    ]
    # Money columns stay in the documented 2-dp domain (r01's scale
    # proof depends on it: price*(1-d) then has ≤4 true decimals, so the
    # DECIMAL casts never round — 3-dp discounts would manufacture
    # rounding ties no generator of this schema produces).
    li.loc[idx, "l_extendedprice"] = [
        round(q * 100 + 0.25 * rng.choice([1, 2, 3]), 2)
        for q in li.loc[idx, "l_quantity"]
    ]
    li.loc[idx, "l_discount"] = [
        rng.choice([0.0, 0.05, 0.02, 0.1]) for _ in idx
    ]
    # Duplicate business keys (d01 counts them; aggregates must agree).
    dup = li.sample(n=15, random_state=17)
    li = pd.concat([li, dup], ignore_index=True)
    li.to_parquet(f"{root}/lineitem.parquet", index=False)

    od = pd.read_parquet(f"{SRC}/orders.parquet")
    idx = od.sample(n=40, random_state=19).index
    od.loc[idx, "o_totalprice"] = [
        round(v, 2) + 0.01 for v in od.loc[idx, "o_totalprice"]
    ]
    od.to_parquet(f"{root}/orders.parquet", index=False)

    for t in (
        "region nation customer supplier part documents embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", f"{root}/{t}.parquet")
    return str(root)


@pytest.fixture(scope="module")
def rel_fuzz_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("relfuzz")
    return _build_relational_fuzz(root)


REL_FUZZED = sorted(
    n for n in registry.QUERIES if n[0] == "r" and n in registry.ORACLES
)


@pytest.mark.parametrize("name", REL_FUZZED)
def test_relational_parity_on_fuzz_corpus(spark, rel_fuzz_dir, name):
    df = registry.QUERIES[name](spark, rel_fuzz_dir)
    assert_matches_oracle(df, registry.ORACLES[name], rel_fuzz_dir)


# ---------------------------------------------------------------------------
# Regression pins for bugs only a specific fuzz seed exposed. Seed 2007
# caught the Spark decimal-multiply scale reduction: decimal(28,12) ×
# bigint ideally needs precision 49, and Spark resolves the overflow by
# dropping the result scale to 6 — silently rounding every logp×e term —
# while DuckDB's same multiply widens to DECIMAL(38,12) and stays exact.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def seed2007_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz2007")
    return _build_fuzz_corpus(spark, root, seed=2007)


@pytest.mark.parametrize(
    "name", ["t19_charlm_crossentropy", "t28_ccnet_buckets"]
)
def test_decimal_multiply_scale_regression(spark, seed2007_dir, name):
    df = registry.QUERIES[name](spark, seed2007_dir)
    assert_matches_oracle(df, registry.ORACLES[name], seed2007_dir)


def test_decimal_multiply_keeps_scale(spark):
    """The product type used by t19/t28 must keep all 12 fractional
    digits — decimal(20,12) × decimal(14,0) → decimal(35,12) fits in
    precision 38 with no scale adjustment."""
    df = spark.sql(
        "SELECT CAST(-2.906890595609 AS DECIMAL(20,12))"
        " * CAST(3 AS DECIMAL(14,0)) AS p"
    )
    t = df.schema["p"].dataType
    assert (t.precision, t.scale) == (35, 12), t
    assert str(df.collect()[0].p) == "-8.720671786827"


# ---------------------------------------------------------------------------
# Seed 70707 caught the double-round representation tie in the
# avg_quality aggregations (round-5 close sweep): a 2-doc group whose
# exact decimal-6 quality sum divides to a true x.xxxxxx5 mean — Spark
# rounds the double's shortest decimal repr up while DuckDB rounds the
# binary value down (SCALE.md's fourth float-parity instance, previously
# fixed for money in r05/r72). All three avg_quality sites now sum
# integer MICRO-units and round the mean with pure integer div/mod
# (pipeline_queries._avg_quality_exact — round-6 ADVICE hardened the
# round-5 fix, whose long→double cast was lossy past 2^53), so ties
# are half-away-from-zero exact at any corpus size in both engines.
# ---------------------------------------------------------------------------
def test_float_parity_lint_rounded_double_ratio_allowlist():
    """Mechanical float-parity lint (round-6 — the round-close
    discipline's review rule, now a gate): ``round(CAST(sum(...decimal)
    AS DOUBLE) / count, d)`` is the double-round representation-tie
    class that produced the r72 money bug and the seed-70707
    avg_quality bug — when the TRUE quotient of an exact fixed-scale
    sum lands on an exact tie at the kept digit, Spark rounds the
    shortest decimal repr while DuckDB rounds the binary value. Every
    oracle carrying the pattern is inventoried here; the allowlisted
    sites are same-formula-on-both-sides with tie exposure accepted
    and continuously fuzz-swept (two strikes of this class were found
    by fuzz and converted to the exact integer-ratio form —
    pipeline_queries._avg_quality_exact). A NEW query matching the
    pattern fails this lint until it is either converted to the
    integer-ratio form (preferred) or consciously allowlisted with
    the same justification."""
    import re

    pat = re.compile(
        r"round\s*\([^()]*CAST\s*\(\s*sum\s*\([^;]{0,200}?AS\s+DOUBLE"
        r"\s*\)\s*/\s*(?:count\(\*\)|[a-z_.]*n_\w+|[a-z_.]+\.n\w*)",
        re.I | re.S,
    )
    allowed = {
        "c28_leakage_free_split",
        "c29_cc_convergence_audit",
        "d19_minhash_k_sweep",
        "r01_pricing_summary",
        "r60_json_struct_parse",
        "r72_unpivot_metrics",
        "t07_token_stats",
        "t28_ccnet_buckets",
        "t35_readability",
    }
    hits = {n for n, sql in registry.ORACLES.items() if pat.search(sql)}
    new = hits - allowed
    assert not new, (
        f"new rounded-double-ratio sites {sorted(new)}: use the exact "
        "integer div/mod mean (pipeline_queries._avg_quality_exact) or "
        "allowlist with a tie-exposure justification"
    )
    gone = allowed - hits
    assert not gone, (
        f"allowlist is stale, remove: {sorted(gone)}"
    )


@pytest.fixture(scope="module")
def seed70707_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fuzz70707")
    return _build_fuzz_corpus(spark, root, seed=70707)


@pytest.mark.parametrize(
    "name",
    [
        "p19_corpus_build_e2e",
        "p24_decontaminated_corpus_build",
        "p30_dataset_report",
    ],
)
def test_avg_quality_tie_regression(spark, seed70707_dir, name):
    df = registry.QUERIES[name](spark, seed70707_dir)
    assert_matches_oracle(df, registry.ORACLES[name], seed70707_dir)
