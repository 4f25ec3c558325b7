"""Deterministic synthetic `pages` corpus with planted duplicate classes
(FIXTURES.md §1) — the engine's own test/bench input.  Pure function of
(n_pages, seed); every value derives from ``numpy.random.default_rng``
seeded per base doc, so regeneration is bit-identical (needed for the
byte-identical-text-per-url invariant test).

Class mix per 100 base docs (FIXTURES.md §1.1):
  55 unique | 15 exact-dup groups | 15 near-dup balls | 8 template
  families | 5 long-verbatim-overlap pairs | 2 frequency-skew clusters
plus fixed edge rows at page rows 490-499 of every tier (§4).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

VOCAB = [f"w{i:04d}" for i in range(2000)]
_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
LANGS = ["en", "de", "fr", "zh"]

# fixed edge-row payloads (FIXTURES.md §4), planted at rows 490-499
_EDGE_TEXTS = [
    "",
    "   \t\n  ",
    "solo",
    " ".join(f"t{i % 97}" for i in range(10_500)),
    "中文网页内容没有空格分词测试",
    "ONE two THREE",
    "a b",
    "x " * 2 + "y",
    "日本語のテキストです",
    "mixed 中文 and english tokens",
]


def _base_text(rng: np.random.Generator) -> list[str]:
    n = int(rng.integers(40, 401))
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), n)]


def _mutate(tokens: list[str], rng: np.random.Generator, max_edits: int = 3) -> list[str]:
    out = list(tokens)
    n_edits = int(rng.integers(1, max_edits + 1))
    for _ in range(n_edits):
        pos = int(rng.integers(0, len(out)))
        if rng.random() < 0.5 and len(out) > 4:
            out.pop(pos)
        else:
            out[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
    return out


def generate_pages(n_pages: int, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages, truth_pairs).

    pages: url, warc_ts, html, text, lang — exactly n_pages rows.
    truth_pairs: src_url, dst_url, kind (src < dst) over planted groups.
    """
    rows: list[tuple[str, str]] = []  # (text, kind-group marker)
    groups: list[tuple[list[int], str]] = []  # (row indices, kind)
    base_id = 0
    while len(rows) < n_pages + 16:  # overshoot, trim later
        rng = np.random.default_rng(seed + base_id * 1000)
        cls = base_id % 100
        start = len(rows)
        if cls < 55:  # unique
            rows.append((" ".join(_base_text(rng)), "unique"))
        elif cls < 70:  # exact-dup group
            g = int(rng.integers(2, 9))
            text = " ".join(_base_text(rng))
            rows.extend((text, "exact") for _ in range(g))
            groups.append((list(range(start, start + g)), "exact"))
        elif cls < 85:  # near-dup ball
            base = _base_text(rng)
            m = int(rng.integers(1, 5))
            rows.append((" ".join(base), "near"))
            rows.extend((" ".join(_mutate(base, rng)), "near") for _ in range(m))
            groups.append((list(range(start, start + m + 1)), "near"))
        elif cls < 93:  # template family
            f = int(rng.integers(5, 41))
            frame = _base_text(rng)
            cut = max(1, int(len(frame) * 0.8))
            fam = []
            for _ in range(f):
                mid = [VOCAB[i] for i in rng.integers(0, len(VOCAB), max(1, len(frame) - cut))]
                fam.append(" ".join(frame[: cut // 2] + mid + frame[cut // 2 : cut]))
            rows.extend((t, "template") for t in fam)
            groups.append((list(range(start, start + f)), "template"))
        elif cls < 98:  # long-verbatim-overlap pair
            block = [VOCAB[i] for i in rng.integers(0, len(VOCAB), 512)]
            a = [VOCAB[i] for i in rng.integers(0, len(VOCAB), 200)] + block + [
                VOCAB[i] for i in rng.integers(0, len(VOCAB), 200)
            ]
            b = [VOCAB[i] for i in rng.integers(0, len(VOCAB), 250)] + block + [
                VOCAB[i] for i in rng.integers(0, len(VOCAB), 150)
            ]
            rows.append((" ".join(a), "overlap"))
            rows.append((" ".join(b), "overlap"))
            groups.append(([start, start + 1], "overlap"))
        else:  # frequency-skew cluster
            hub = " ".join(_base_text(rng))
            copies = int(rng.integers(10, 51))
            rows.extend((hub, "skew") for _ in range(copies))
            sat = int(rng.integers(3, 9))
            hub_tokens = hub.split(" ")
            for _ in range(sat):
                rows.append((" ".join(_mutate(hub_tokens, rng)), "skew"))
            groups.append((list(range(start, start + copies + sat)), "skew"))
        base_id += 1

    # plant fixed edge rows at 490-499 (when the tier is big enough)
    if n_pages >= 500:
        for j, t in enumerate(_EDGE_TEXTS):
            rows[490 + j] = (t, "edge")
    rows = rows[:n_pages]

    urls = [f"https://site{(i * 7919) % 97}.example/p{i:07d}" for i in range(n_pages)]
    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [_EPOCH + timedelta(seconds=17 * i) for i in range(n_pages)],
            "html": [f"<html><body>{t}</body></html>".encode() for t, _ in rows],
            "text": [t for t, _ in rows],
            "lang": [LANGS[i % 4] for i in range(n_pages)],
        }
    )

    pair_rows = []
    for idxs, kind in groups:
        idxs = [i for i in idxs if i < n_pages and not (500 <= n_pages and 490 <= i < 500)]
        for i, a in enumerate(idxs):
            for b in idxs[i + 1 :]:
                u, v = sorted((urls[a], urls[b]))
                pair_rows.append((u, v, kind))
    truth_pairs = pd.DataFrame(pair_rows, columns=["src_url", "dst_url", "kind"])
    return pages, truth_pairs


def pages_spark_df(spark, n_pages: int, seed: int = 42):
    """Pages fixture as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql import types as T

    pdf, _ = generate_pages(n_pages, seed)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)
