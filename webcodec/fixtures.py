"""Deterministic synthetic tables (FIXTURES.md §1–§2). Seed 42, no external data.

Primary ``webpages`` table matches BASELINE.json input_hint exactly:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOCAB = (
    "the quick brown fox jumps over lazy dog web page content data "
    "model spark encode column value stream batch"
).split()

_LANGS = ["en", "de", "fr", "es", "zh", "ru"]
_LANG_P = [0.60, 0.10, 0.10, 0.08, 0.07, 0.05]


def _domains(rng: np.random.Generator, n_domains: int = 200) -> np.ndarray:
    tlds = np.array(["com", "org", "net", "io", "de", "fr"])
    names = [f"site{i:03d}.{tlds[i % len(tlds)]}" for i in range(n_domains)]
    return np.array(names)


def webpages(n: int = 20_000, seed: int = 42, null_frac: float = 0.0) -> pa.Table:
    """Common-Crawl-style webpages table (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    domains = _domains(rng)
    # Zipf(1.3) skew over 200 domains (heavy hitters)
    ranks = np.arange(1, len(domains) + 1, dtype=np.float64)
    probs = ranks ** -1.3
    probs /= probs.sum()
    dom_idx = rng.choice(len(domains), size=n, p=probs)
    i_arr = np.arange(n)
    url = [
        f"https://{domains[d]}/path/{i % 97}/page{i}.html" for d, i in zip(dom_idx, i_arr)
    ]
    warc_ts = 1_700_000_000_000_000 + np.sort(
        rng.integers(0, 1_000_000_000_000, size=n, dtype=np.int64)
    )
    n_words = rng.integers(20, 201, size=n)
    vocab = np.array(_VOCAB)
    text = [" ".join(vocab[rng.integers(0, len(vocab), size=k)]) for k in n_words]
    html = [b"<html><body>" + t.encode() + b"</body></html>" for t in text]
    lang = rng.choice(_LANGS, size=n, p=_LANG_P)

    def maybe_null(values, frac):
        if frac <= 0:
            return values
        mask = rng.random(n) < frac
        return [None if m else v for v, m in zip(values, mask)]

    return pa.table(
        {
            "url": pa.array(maybe_null(url, null_frac), type=pa.string()),
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": pa.array(maybe_null(html, null_frac), type=pa.binary()),
            "text": pa.array(maybe_null(text, null_frac), type=pa.string()),
            "lang": pa.array(maybe_null(list(lang), null_frac), type=pa.string()),
        }
    )


def webpages_variant(kind: str, n: int = 2_000, seed: int = 42) -> pa.Table:
    """Codec-stress variants (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    if kind == "nulls":  # before the base build: don't generate twice
        return webpages(n, seed, null_frac=0.1)
    t = webpages(n, seed)
    if kind == "const":
        return t.set_column(
            4, "lang", pa.array(["en"] * n, type=pa.string())
        ).set_column(0, "url", pa.array([f"https://one.com/p{i}.html" for i in range(n)]))
    if kind == "unique":
        hexes = [rng.bytes(16).hex() for _ in range(n)]
        return t.set_column(0, "url", pa.array(hexes)).set_column(
            3, "text", pa.array([h[::-1] for h in hexes])
        )
    if kind == "sorted":
        import pyarrow.compute as pc

        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    if kind == "binary":
        return t.set_column(2, "html", pa.array([rng.bytes(256) for _ in range(n)], pa.binary()))
    if kind == "empty":
        return t.slice(0, 0)
    if kind == "one":
        return t.slice(0, 1)
    if kind == "widechars":
        texts = [s for i in range(n // 4 + 1) for s in ("中文内容" * (i % 5), "русский текст", "", "x")]
        return t.set_column(3, "text", pa.array(texts[:n], type=pa.string()))
    raise ValueError(kind)
