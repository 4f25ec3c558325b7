"""The engine's ONLY two pandas UDFs (Arrow-vectorized), per the
input_hint "no per-row Python":

1. ``simhash64_udf``      — text -> 64-bit SimHash (LongType)
2. ``minhash_bands_udf``  — text -> banded MinHash bucket keys
                            (ArrayType(LongType), one value per band)

plus ``minhash_signature_udf`` (full signature, used only by the
signature-similarity verifier on *candidate pairs*, a tiny fraction of
rows).  Everything else in the pipeline is Catalyst column expressions.

Reference analog: ``to_bitset`` string->fingerprint encoding
(``/root/reference/src/utils/mod.rs:63-83``) — a pure function of the
text, as required by the per-row invariant in BASELINE.json input_hint.

Scale note: each UDF call processes one Arrow batch (10k rows); the
per-batch work is C-vectorized (see fingerprint_core), so throughput is
bounded by Arrow transfer + numpy, not the Python interpreter.  At 100 TB
these run embarrassingly parallel across executors with no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from umi_collapse_rs_spark.functions import fingerprint_core as core


def make_combined_fingerprint_udf(
    shingle_k: int,
    perms: int,
    bands: int,
    seed: int,
    window_tokens: int = 0,
    window_stride: int = 32,
):
    """ONE pandas UDF computing all fingerprints in a single pass:
    text_norm -> struct(simhash, mh_bands, mh_sig[, win_hashes]).

    Tokenization + shingling is the expensive part; computing all
    outputs from one shingle-hash set per batch does it once.  With
    ``window_tokens > 0`` the content-defined window fingerprints for
    the substring-overlap pass are included (empty array for docs
    shorter than the window).
    """
    fields = [
        T.StructField("simhash", T.LongType()),
        T.StructField("mh_bands", T.ArrayType(T.LongType())),
        T.StructField("mh_sig", T.ArrayType(T.LongType())),
    ]
    if window_tokens:
        fields.append(T.StructField("win_hashes", T.ArrayType(T.LongType())))
    out_type = T.StructType(fields)

    def _rect_list_series(mat) -> pd.Series:
        """(n, w) int64 matrix -> Arrow list<int64> Series, zero object
        churn (a plain Series of ndarrays costs seconds per batch in
        Arrow conversion; this is microseconds)."""
        import numpy as np
        import pyarrow as pa

        n, w = mat.shape
        offs = pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32))
        arr = pa.ListArray.from_arrays(offs, pa.array(mat.ravel()))
        return pd.Series(pd.arrays.ArrowExtensionArray(arr))

    def _ragged_list_series(arrays) -> pd.Series:
        import numpy as np
        import pyarrow as pa

        lens = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
        offs = np.zeros(len(arrays) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        flat = np.concatenate(arrays) if offs[-1] else np.empty(0, dtype=np.int64)
        arr = pa.ListArray.from_arrays(pa.array(offs), pa.array(flat.view(np.int64)))
        return pd.Series(pd.arrays.ArrowExtensionArray(arr))

    @F.pandas_udf(out_type)
    def fingerprint(text: pd.Series) -> pd.DataFrame:
        texts = text.fillna("").tolist()
        hashes = core.batch_shingle_hashes(texts, shingle_k, seed)
        sim = core.batch_simhash(hashes)
        sig = core.batch_minhash_signature(hashes, perms, seed)
        bands_v = core.bands_from_signature(sig, bands)
        out = {
            "simhash": pd.Series(sim),
            "mh_bands": _rect_list_series(bands_v),
            "mh_sig": _rect_list_series(sig),
        }
        if window_tokens:
            out["win_hashes"] = _ragged_list_series(
                core.batch_window_hashes(texts, window_tokens, window_stride, seed)
            )
        return pd.DataFrame(out)

    return fingerprint


def make_fingerprint_udfs(shingle_k: int, perms: int, bands: int, seed: int):
    """Build the fingerprint UDFs for a fixed shingle/signature config.

    Returned as (simhash_udf, bands_udf, signature_udf); each takes the
    *normalized* text column.
    """

    @F.pandas_udf(T.LongType())
    def simhash64(text: pd.Series) -> pd.Series:
        hashes = core.batch_shingle_hashes(text.fillna("").tolist(), shingle_k, seed)
        return pd.Series(core.batch_simhash(hashes))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_bands(text: pd.Series) -> pd.Series:
        hashes = core.batch_shingle_hashes(text.fillna("").tolist(), shingle_k, seed)
        vals = core.batch_minhash_bands(hashes, perms, bands, seed)
        return pd.Series(list(vals))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_signature(text: pd.Series) -> pd.Series:
        hashes = core.batch_shingle_hashes(text.fillna("").tolist(), shingle_k, seed)
        sig = core.batch_minhash_signature(hashes, perms, seed)
        return pd.Series(list(sig))

    return simhash64, minhash_bands, minhash_signature


# Default-config instances for ad-hoc use (DedupConfig defaults).
simhash64_udf, minhash_bands_udf, minhash_signature_udf = make_fingerprint_udfs(
    shingle_k=3, perms=128, bands=32, seed=42
)
