"""Char-n-gram language ID: packing/boundary correctness, deterministic
profile tiebreaks, and real discrimination on a multi-script corpus (the
driver-gate twin only proves mechanics — the synthetic documents table shares
one vocabulary across labels, so separability needs its own fixture)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.text.langid import (
    LangProfiles,
    classify_batch,
    key_to_trigram,
    profile_counts_batch,
    trigram_keys,
)


def _brute_trigrams(texts):
    out = []
    for i, t in enumerate(texts):
        for j in range(max(0, len(t) - 2)):
            out.append((i, t[j : j + 3]))
    return out


class TestTrigramKeys:
    def test_matches_brute_force(self):
        texts = ["abcd", "αβγδε", "ab", "", "xy z", "漢字テスト"]
        keys, rows = trigram_keys(texts)
        got = [(int(r), key_to_trigram(k)) for r, k in zip(rows, keys)]
        assert got == _brute_trigrams(texts)

    def test_no_cross_text_windows(self):
        keys, rows = trigram_keys(["ab", "cd", "ef"])
        assert len(keys) == 0

    def test_key_order_is_codepoint_order(self):
        tris = ["aaa", "aab", "azz", "z aa", "ααα", "羽aa"]
        texts = [t[:3] for t in tris]
        keys, _ = trigram_keys(texts)
        by_key = [key_to_trigram(k) for k in sorted(keys.tolist())]
        assert by_key == sorted(texts)

    def test_empty_input(self):
        keys, rows = trigram_keys([])
        assert len(keys) == 0 and len(rows) == 0


# three scripts → genuinely separable languages
_WORDS = {
    "grc": ["αλφα", "βητα", "γαμμα", "δελτα", "λογος", "κοσμος"],
    "lat": ["aqua", "terra", "ignis", "ventus", "lumen", "umbra"],
    "rus": ["вода", "земля", "огонь", "ветер", "свет", "тень"],
}


def _doc(lang: str, seed: int) -> str:
    rng = np.random.RandomState(seed)
    return " ".join(rng.choice(_WORDS[lang], size=30))


def _corpus():
    rows = []
    i = 0
    for lang in sorted(_WORDS):
        for s in range(20):
            rows.append({"doc_id": i, "lang": lang, "text": _doc(lang, 1000 * s + i)})
            i += 1
    return rows


class TestClassifier:
    def test_multiscript_accuracy(self):
        rows = _corpus()
        train = [r for r in rows if r["doc_id"] % 3 == 0]
        per_lang: dict[str, dict[int, int]] = {}
        for r in train:
            keys, _ = trigram_keys([r["text"]])
            d = per_lang.setdefault(r["lang"], {})
            for k in keys.tolist():
                d[k] = d.get(k, 0) + 1
        prof = LangProfiles.from_counts(per_lang, profile_size=200)
        batch = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
            }
        )
        out = classify_batch(batch, prof)
        pred = out["pred_lang"].to_pylist()
        want = [r["lang"] for r in rows]
        assert pred == want  # scripts don't overlap → exact recovery
        assert all(s > 0 for s in out["score"].to_pylist())

    def test_trigramless_doc_falls_back_to_first_lang(self):
        prof = LangProfiles.from_counts({"bb": {1: 5}, "aa": {2: 3}}, 10)
        batch = pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["xy"])})
        out = classify_batch(batch, prof)
        assert out["pred_lang"][0].as_py() == "aa"  # lang-asc fallback
        assert out["score"][0].as_py() == 0

    def test_profile_topk_tiebreak_is_key_asc(self):
        # equal counts → smaller key (i.e. lexicographically smaller trigram) wins
        ka, _ = trigram_keys(["aaa"])
        kb, _ = trigram_keys(["bbb"])
        prof = LangProfiles.from_counts({"x": {int(ka[0]): 2, int(kb[0]): 2}}, profile_size=1)
        assert prof.keys.tolist() == [int(ka[0])]

    def test_profile_counts_batch_matches_brute(self):
        batch = pa.table(
            {
                "lang": pa.array(["l1", "l2", "l1"]),
                "text": pa.array(["abcabc", "abc", "xyz"]),
            }
        )
        t = profile_counts_batch(batch)
        got = {
            (la, key_to_trigram(k)): c
            for la, k, c in zip(t["lang"].to_pylist(), t["key"].to_pylist(), t["cnt"].to_pylist())
        }
        assert got == {
            ("l1", "abc"): 1 + 1,  # once in doc0... plus see below
            ("l1", "bca"): 1,
            ("l1", "cab"): 1,
            ("l1", "xyz"): 1,
            ("l2", "abc"): 1,
        }


def test_profile_counts_double_occurrence():
    t = profile_counts_batch(pa.table({"lang": pa.array(["l"]), "text": pa.array(["ababa"])}))
    got = {key_to_trigram(k): c for k, c in zip(t["key"].to_pylist(), t["cnt"].to_pylist())}
    assert got == {"aba": 2, "bab": 1}
