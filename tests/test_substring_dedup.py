"""Substring (duplicated-span) dedup vs a brute-force serial reference.

The brute reference recomputes everything with plain Python dicts over the
same tokenization — no Horner hashing, actual token-tuple keys — so a hash
bug cannot cancel out.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
import ray

from code_indexer_ray.dedup.substring import (
    clean_documents,
    duplicate_positions,
    removal_spans,
    window_hash_rows,
)

TOK = re.compile(r"[^\w]+", re.UNICODE)


def brute_tokens(text: str) -> list[str]:
    return [t.lower() for t in TOK.split(text) if 0 < len(t.encode()) < 40]


def brute_flagged(docs: dict[int, str], w: int) -> set[tuple[int, int]]:
    """(doc_id, 1-based pos) of every all-but-first window occurrence."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        toks = brute_tokens(docs[did])
        for i in range(len(toks) - w + 1):
            occ.setdefault(tuple(toks[i : i + w]), []).append((did, i + 1))
    out = set()
    for places in occ.values():
        if len(places) > 1:
            out.update(sorted(places)[1:])
    return out


def brute_spans(docs: dict[int, str], w: int) -> set[tuple[int, int, int]]:
    flagged = brute_flagged(docs, w)
    by_doc: dict[int, list[int]] = {}
    for did, pos in flagged:
        by_doc.setdefault(did, []).append(pos)
    spans = set()
    for did, poss in by_doc.items():
        poss.sort()
        start = prev = poss[0]
        for p in poss[1:]:
            if p - prev > w:
                spans.add((did, start, prev + w))
                start = p
            prev = p
        spans.add((did, start, prev + w))
    return spans


def brute_clean(docs: dict[int, str], w: int) -> dict[int, tuple[int, str]]:
    spans = brute_spans(docs, w)
    out = {}
    for did in docs:
        toks = brute_tokens(docs[did])
        mask = [True] * len(toks)
        for sd, s, e in spans:
            if sd == did:
                for i in range(s - 1, min(e - 1, len(toks))):
                    mask[i] = False
        out[did] = (mask.count(False), " ".join(t for t, k in zip(toks, mask) if k))
    return out


@pytest.fixture(scope="module")
def corpus():
    """Synthetic docs with planted shared boilerplate + self-repetition."""
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(120)]
    boiler = "all rights reserved click here to subscribe to our newsletter today"
    docs = {}
    for did in range(40):
        body = " ".join(rng.choice(vocab, size=rng.integers(10, 60)))
        if did % 3 == 0:
            body = body + " " + boiler
        if did % 7 == 0:
            body = boiler + " " + body  # second occurrence position variant
        if did == 11:
            body = body + " " + body  # within-doc self repetition
        docs[did] = body
    docs[40] = "tiny doc"  # below any window size
    docs[41] = ""  # empty
    return docs


def _ds(docs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), type=pa.int64()),
                "text": pa.array([docs[k] for k in sorted(docs)], type=pa.string()),
            }
        )
    )


@pytest.mark.parametrize("w", [3, 5, 8])
def test_duplicate_positions_match_brute(ray_session, corpus, w):
    got = duplicate_positions(_ds(corpus), w=w, num_partitions=8).take_all()
    got_set = {(r["doc_id"], r["pos"]) for r in got}
    assert got_set == brute_flagged(corpus, w)
    assert got_set  # the planted boilerplate must actually collide


def test_removal_spans_match_brute(ray_session, corpus):
    w = 5
    got = removal_spans(_ds(corpus), w=w, num_partitions=8).take_all()
    got_set = {(r["doc_id"], r["span_start"], r["span_end"]) for r in got}
    assert got_set == brute_spans(corpus, w)


def test_clean_documents_match_brute(ray_session, corpus):
    w = 5
    got = {r["doc_id"]: (r["n_removed"], r["clean_text"]) for r in clean_documents(_ds(corpus), w=w, num_partitions=8).take_all()}
    expect = brute_clean(corpus, w)
    # empty doc produces no tokens: present with empty clean text
    assert got == expect
    # at least one doc actually lost tokens
    assert any(n for n, _ in got.values())


def test_no_duplicates_empty_result(ray_session):
    docs = {0: "alpha beta gamma delta epsilon", 1: "zeta eta theta iota kappa"}
    spans = removal_spans(_ds(docs), w=3, num_partitions=4).take_all()
    assert spans == []
    clean = {r["doc_id"]: r["clean_text"] for r in clean_documents(_ds(docs), w=3, num_partitions=4).take_all()}
    assert clean == {0: "alpha beta gamma delta epsilon", 1: "zeta eta theta iota kappa"}


def test_window_hash_rows_positions_and_boundaries(ray_session):
    batch = pa.table(
        {
            "doc_id": pa.array([10, 11], type=pa.int64()),
            "text": pa.array(["a b c d", "c d a b"], type=pa.string()),
        }
    )
    t = window_hash_rows(batch, w=3)
    assert t.num_rows == 4  # two windows per doc, none crossing the boundary
    assert t["pos"].to_pylist() == [1, 2, 1, 2]
    # same token run in different docs -> same hash
    t2 = window_hash_rows(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["x y z", "x y z"], type=pa.string()),
            }
        ),
        w=3,
    )
    assert len(set(t2["whash"].to_pylist())) == 1


def test_winnow_recall_on_long_duplicates(ray_session):
    """Winnowed anchors must still catch every long planted duplicate."""
    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(500)]
    shared = " ".join(rng.choice(vocab, size=40))  # 40-token duplicated run
    docs = {}
    for did in range(30):
        body = " ".join(rng.choice(vocab, size=80))
        docs[did] = body + (" " + shared if did % 2 == 0 else "")
    w, k = 5, 4  # guarantee: runs >= w + k - 1 = 8 tokens anchor
    got = removal_spans(_ds(docs), w=w, winnow_k=k, num_partitions=8).take_all()
    flagged_docs = {r["doc_id"] for r in got}
    # every non-canonical holder of the shared run is caught
    holders = {d for d in docs if d % 2 == 0}
    assert holders - {min(holders)} <= flagged_docs
    # and each caught span covers most of the 40-token run
    for r in got:
        assert r["span_end"] - r["span_start"] >= 30
