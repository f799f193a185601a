"""Domain stats / blocklist filter vs pandas brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from code_indexer_ray.pipelines.domain import blocked_sources, domain_stats
from code_indexer_ray.text.analysis import tokenize_query


def test_domain_stats_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    srcs = [f"dom{i}" for i in range(6)]
    rows = []
    for d in range(200):
        s = srcs[rng.randint(len(srcs))]
        text = " ".join(rng.choice(["a", "bb", "ccc", "dddd"], size=rng.randint(0, 12)))
        rows.append((d, text, ["en", "fr", "de"][rng.randint(3)], s, len(text)))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)  # multi-batch partials
    got = domain_stats(ds).to_pandas()

    df["nt"] = df["text"].map(lambda t: len(tokenize_query(t)))
    exp = (
        df.groupby("source")
        .agg(
            n_docs=("doc_id", "size"),
            total_chars=("n_chars", "sum"),
            total_tokens=("nt", "sum"),
            n_langs=("lang", "nunique"),
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: np.int64 for c in got.columns if c != "source"}), exp.astype(
            {c: np.int64 for c in exp.columns if c != "source"}
        )
    )


def test_blocklist_deterministic():
    srcs = [f"src{i}" for i in range(40)]
    a = blocked_sources(srcs)
    b = blocked_sources(list(reversed(srcs)))
    assert sorted(a) == sorted(b)
    assert 0 < len(a) < len(srcs)
