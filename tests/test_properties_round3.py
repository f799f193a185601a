"""Property-based tests (hypothesis) for the round-3 pure kernels: island
merging, the 2-bit quantizer, and the visibility-log fold — invariants that
example tests can't sweep."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from code_indexer_ray.ann.quantpath import hash_projection_matrix, quantize_batch
from code_indexer_ray.query.ragctx import merge_islands

spans = st.lists(
    st.tuples(
        st.integers(1, 60), st.integers(0, 20), st.integers(0, 100)
    ).map(lambda t: (t[0], t[0] + t[1], t[2])),
    max_size=25,
)


@given(spans)
@settings(max_examples=200, deadline=None)
def test_merge_islands_invariants(sp):
    out = merge_islands(sp)
    # sorted, pairwise disjoint with a gap (never mergeable further)
    for (s1, e1, _), (s2, e2, _) in zip(out, out[1:]):
        assert s1 <= s2 and e1 + 1 < s2
    # coverage: every input line is covered by exactly the islands union
    want = set()
    for s, e, _ in sp:
        want.update(range(s, e + 1))
    got = set()
    for s, e, _ in out:
        got.update(range(s, e + 1))
    assert got == want
    # score: each island's score is the max of the inputs it covers
    for s, e, sc in out:
        member_scores = [c for a, b, c in sp if a >= s and b <= e]
        assert sc == max(member_scores)


@given(st.integers(0, 2**32 - 1), st.integers(1, 8))
@settings(max_examples=50, deadline=None)
def test_quantizer_locality_and_determinism(seed, scale_denom):
    rng = np.random.default_rng(seed)
    proj = hash_projection_matrix(16, 64)
    v = rng.normal(size=(1, 16))
    h1 = quantize_batch(v, proj)
    h2 = quantize_batch(v.copy(), proj)
    assert h1 == h2 and len(h1[0]) == 32
    assert all(c in "0123456789abcdef" for c in h1[0])
    # locality: a tiny perturbation changes few quantized levels
    eps = rng.normal(size=(1, 16)) / (1000 * scale_denom)
    h3 = quantize_batch(v + eps, proj)[0]
    diff_nibbles = sum(a != b for a, b in zip(h1[0], h3))
    assert diff_nibbles <= 6  # fixed thresholds: only near-boundary dims move


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["hide", "unhide"]),
            st.sampled_from(["a", "b"]),
            st.lists(st.integers(0, 12), max_size=5),
        ),
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_visibility_fold_matches_model(tmp_path_factory, ops):
    from code_indexer_ray.index.visibility import (
        compact_log,
        hidden_ids,
        hide_docs,
        unhide_docs,
    )

    idx = str(tmp_path_factory.mktemp("visprop"))
    model: dict[str, set[int]] = {"a": set(), "b": set()}
    for op, branch, ids in ops:
        (hide_docs if op == "hide" else unhide_docs)(idx, branch, ids)
        (model[branch].update if op == "hide" else model[branch].difference_update)(ids)
    for b in ("a", "b"):
        assert hidden_ids(idx, b).tolist() == sorted(model[b])
    # compaction preserves the folded state exactly
    compact_log(idx)
    for b in ("a", "b"):
        assert hidden_ids(idx, b).tolist() == sorted(model[b])
