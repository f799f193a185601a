"""PII redaction kernel + stratified sampling unit tests (brute-force Python
`re` references; the DuckDB twin is exercised in test_entry_oracle)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from code_indexer_ray.text.pii import PII_PATTERNS, redact_batch


def _redact_py(text: str) -> tuple[str, dict[str, int]]:
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = len(re.findall(pat, text))
        text = re.sub(pat, repl, text)
    return text, counts


class TestRedactBatch:
    def test_matches_python_re(self):
        texts = [
            "write to alice.smith+x@mail-host.org today",
            "server at 10.0.254.3 and 192.168.1.1, call +555 123-4567",
            "no pii here at all",
            "a@b.co a@b.co twice, partial 999.999 not an ip",
            "",
            "phone 123 456-7890 and email under_score%x@sub.domain.io",
        ]
        batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        out = redact_batch(batch, "text")
        for i, t in enumerate(texts):
            want_text, want_counts = _redact_py(t)
            assert out["redacted"][i].as_py() == want_text, t
            for k, v in want_counts.items():
                assert out[k][i].as_py() == v, (t, k)
            assert out["n_pii"][i].as_py() == sum(want_counts.values())

    def test_email_redacted_before_digits_counted(self):
        # the email's digits vanish before the phone pattern runs: fixed order
        batch = pa.table({"text": ["x123 456-7890@host.com y"]})
        out = redact_batch(batch, "text")
        assert out["n_email"][0].as_py() == 1
        assert out["n_phone"][0].as_py() == 0  # digits consumed by the email
        assert out["redacted"][0].as_py() == "x123 <EMAIL> y"

    def test_counts_are_int64(self):
        out = redact_batch(pa.table({"text": ["a@b.cc"]}), "text")
        for c in ("n_email", "n_ipv4", "n_phone", "n_pii"):
            assert out.schema.field(c).type == pa.int64()


class TestStratifiedSample:
    def test_rates_and_determinism(self, ray_session):
        import ray
        import ray.data as rd

        from code_indexer_ray.dedup.minhash import md5_lower64
        from code_indexer_ray.pipelines.ops import stratified_sample

        n = 4000
        rng = np.random.default_rng(3)
        tbl = pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "de", "xx"], n),
            }
        )
        rates = {"en": 500, "de": 100}

        def run():
            ds = rd.from_arrow(tbl).repartition(5)
            out = stratified_sample(ds, "doc_id", "lang", rates, default_permille=0)
            parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
            return pa.concat_tables(parts).to_pandas().sort_values("doc_id")

        a, b = run(), run()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()  # deterministic
        assert set(a["lang"]) <= {"en", "de"}  # unknown stratum dropped (rate 0)
        # exact membership: brute-force the same threshold rule
        df = tbl.to_pandas()
        keep = [
            int(i)
            for i, s in zip(df["doc_id"], df["lang"])
            if md5_lower64(str(i)) % 1000 < rates.get(s, 0)
        ]
        assert a["doc_id"].tolist() == sorted(keep)


class TestUrlCanonicalize:
    CASES = [
        ("HTTPS://WWW.Example.COM/Path/To/Page/", "example.com/Path/To/Page"),
        ("http://example.com/a?utm_source=x&q=1", "example.com/a?q=1"),
        ("http://example.com/a?q=1&utm_campaign=z#frag", "example.com/a?q=1"),
        ("https://sub.Example.org/a/b/?utm_a=1&utm_b=2", "sub.example.org/a/b"),
        ("example.com/bare", "example.com/bare"),
        ("http://HOST.com", "host.com"),
        ("http://host.com/?utm_x=1", "host.com"),
        ("", ""),
        ("https://www.h.com///", "h.com"),
        ("ftp://not-http.com/x", "ftp://not-http.com/x"),  # non-http scheme: untouched host part
    ]

    def test_rule_chain(self):
        from code_indexer_ray.text.urlnorm import canonicalize_batch

        got = canonicalize_batch(pa.array([u for u, _ in self.CASES])).to_pylist()
        for (u, want), g in zip(self.CASES, got):
            assert g == want, u

    def test_sql_twin_identical(self):
        import duckdb

        from code_indexer_ray.text.urlnorm import canonicalize_batch, sql_canonical_expr

        urls = [u for u, _ in self.CASES]
        got = canonicalize_batch(pa.array(urls)).to_pylist()
        con = duckdb.connect()
        vals = ",".join("('" + u.replace("'", "''") + "')" for u in urls)
        con.sql(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(u)")
        want = [r[0] for r in con.sql(f"SELECT {sql_canonical_expr('u')} FROM t").fetchall()]
        assert got == want

    def test_idempotent(self):
        from code_indexer_ray.text.urlnorm import canonicalize_batch

        once = canonicalize_batch(pa.array([u for u, _ in self.CASES]))
        twice = canonicalize_batch(once)
        assert once.to_pylist() == twice.to_pylist()
