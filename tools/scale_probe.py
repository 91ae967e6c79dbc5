#!/usr/bin/env python
"""10× scale-step probe: synthesize a perturbed-replica sf1 fixture and
time flagship pipelines at sf0.01 / sf0.1 / sf1 (SCALE.md "sf1 step").

Replication WITHOUT perturbation fabricates workload the real 10× corpus
doesn't have — 10× exact-dup groups and quadratic cross-copy near-dup
pairs — so replicas are token-perturbed: every other token gets a
per-copy suffix (kills cross-copy shingle/simhash similarity) and
embeddings are rotated per copy (kills cross-copy cosine, preserves
norms and within-copy geometry).

Usage:
    python tools/scale_probe.py [--out /tmp/sf1] [--queries p19,p24,...]

Prints per-(query, sf) medians and the measured scaling exponents, and
re-runs the DuckDB oracle comparison at sf1 for every oracle-able probed
query (scale timings without a correctness anchor are not evidence).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "p19_corpus_build_e2e",
    "p24_decontaminated_corpus_build",
    "d05_simhash_neardup",
    "d14_paragraph_dedup",
]


def build_sf1(src: str, out: str, copies: int = 10) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(f"{src}/documents.parquet").to_pandas()
    frames = []
    for c in range(copies):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * 10_000_000
        if c > 0:
            suf = f"x{c}"
            d["text"] = d["text"].map(
                lambda t: " ".join(
                    tok + suf if i % 2 else tok
                    for i, tok in enumerate(str(t).split())
                )
                if isinstance(t, str)
                else t
            )
        frames.append(d)
    pd.concat(frames, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False
    )

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    frames = []
    for c in range(copies):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * 10_000_000
        if c > 0:
            e["embedding"] = e["embedding"].map(
                lambda v, c=c: np.roll(np.array(v), c).tolist()
            )
        frames.append(e)
    pd.concat(frames, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    names = [q for q in args.queries.split(",") if q]
    if not os.path.exists(f"{args.out}/documents.parquet"):
        build_sf1(args.src, args.out)
        print(f"built sf1 fixture at {args.out}")

    from mtg_vector_db_spark.plans import registry
    from mtg_vector_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        "scale-probe",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # 8g, not 24g: oversized heaps measured ERRATIC warm-run
            # times on this VM (GC/page-fault stalls — see session.py);
            # 8g holds the sf1 pipelines without the jitter.
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    scales = [("/root/testdata/sf0.01", 0.01), (args.src, 0.1), (args.out, 1.0)]
    med: dict[tuple[str, float], float] = {}
    for sf_dir, sf in scales:
        for name in names:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            med[(name, sf)] = sorted(runs)[len(runs) // 2]
            print(f"{name} sf{sf}: {[round(r, 2) for r in runs]}")
    print()
    for name in names:
        t001, t01, t1 = (med[(name, s)] for s in (0.01, 0.1, 1.0))
        print(
            f"{name}: {t001:.2f}s / {t01:.2f}s / {t1:.2f}s  "
            f"exp(0.01->0.1)={math.log(t01 / t001) / math.log(10):.2f} "
            f"exp(0.1->1)={math.log(t1 / t01) / math.log(10):.2f}"
        )

    if not args.skip_oracle:
        from tests.oracle_utils import assert_matches_oracle

        print()
        for name in names:
            if name not in registry.ORACLES:
                print(f"{name}: rows-only, no oracle")
                continue
            assert_matches_oracle(
                registry.QUERIES[name](spark, args.out),
                registry.ORACLES[name],
                args.out,
            )
            print(f"{name}: oracle MATCH at sf1")
    spark.stop()


if __name__ == "__main__":
    main()
