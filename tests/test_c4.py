"""C4 line-rule filter + RefinedWeb line dedup vs per-row brute recomputation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from code_indexer_ray.text.c4 import (
    LINE_TOKENS,
    MIN_LINES,
    MIN_WORDS,
    c4_stats_batch,
    synthesize_lines_batch,
)


def _brute_lines(doc_id: int, text: str) -> list[str]:
    toks = text.split(" ")
    out = []
    for li in range(0, (len(toks) + LINE_TOKENS - 1) // LINE_TOKENS):
        body = " ".join(toks[li * LINE_TOKENS : (li + 1) * LINE_TOKENS])
        out.append(body + "." if (doc_id + li) % 3 != 0 else body)
    return out


def _batch(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )


class TestSynthesis:
    def test_matches_brute_loop(self):
        rng = np.random.default_rng(3)
        rows = []
        for i in range(40):
            n = int(rng.integers(1, 35))
            rows.append((i, " ".join(f"w{int(x)}" for x in rng.integers(0, 9, n))))
        got = synthesize_lines_batch(_batch(rows))["text"].to_pylist()
        for (d, t), g in zip(rows, got):
            assert g == "\n".join(_brute_lines(d, t)), f"doc {d}"

    def test_exact_multiple_of_line_tokens(self):
        rows = [(0, " ".join(["a"] * LINE_TOKENS)), (1, " ".join(["b"] * (2 * LINE_TOKENS)))]
        got = synthesize_lines_batch(_batch(rows))["text"].to_pylist()
        assert got[0].count("\n") == 0  # one full line, no trailing newline
        assert got[1].count("\n") == 1


class TestC4Stats:
    def test_rules_match_brute(self):
        rng = np.random.default_rng(5)
        rows = []
        for i in range(60):
            n = int(rng.integers(1, 60))
            rows.append((i, " ".join(f"w{int(x)}" for x in rng.integers(0, 9, n))))
        lined = synthesize_lines_batch(_batch(rows))
        got = c4_stats_batch(lined)
        for j, (d, t) in enumerate(rows):
            lines = _brute_lines(d, t)
            kept = [
                ln for ln in lines if len(ln.split(" ")) >= MIN_WORDS and ln.endswith(".")
            ]
            assert got["n_lines"][j].as_py() == len(lines)
            assert got["n_kept"][j].as_py() == len(kept)
            assert got["kept"][j].as_py() == int(len(kept) >= MIN_LINES)


class TestLineDedup:
    def test_cross_doc_duplicates_counted(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.text.c4 import line_dedup_stats

        shared = " ".join(["dup"] * LINE_TOKENS)
        uniq = lambda i: " ".join(f"u{i}x{j}" for j in range(LINE_TOKENS))  # noqa: E731
        # doc 0 and doc 3: same first line AND same punct parity (0 % 3 == 3 % 3)
        rows = [
            (0, shared + " " + uniq(0)),
            (3, shared + " " + uniq(3)),
            (2, uniq(2) + " " + uniq(22)),
        ]
        ds = rd.from_arrow(_batch(rows)).map_batches(
            synthesize_lines_batch, batch_format="pyarrow"
        )
        out = line_dedup_stats(ds).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "n_dup"] == 1 and out.loc[3, "n_dup"] == 1
        assert out.loc[2, "n_dup"] == 0
        assert (out["n_lines"] == 2).all()
