"""Partitioned Bloom-filter membership prefilter — the sketch that makes
incremental dedup cheap when the seen-store dwarfs the ingest batch.

``train_dedup_incremental`` (queries/training.py) anti-joins each batch
against the historical fingerprint store: one shuffle of the batch AND one
of the store's fingerprint column per ingest.  At 100 TB the store side is
the cost — 10^11 fingerprints re-shuffled for every (much smaller) batch.
The standard fix is a membership sketch: a Bloom filter has NO false
negatives, so any batch row the filter rejects is *provably* absent from
the store and needs no join at all; only the (FPR-sized + true-dup) sliver
of "maybe" rows is verified exactly.

Scale shape — the part that matters:

* The sketch is **bucket-partitioned, never centralized**: store keys hash
  into ``n_buckets`` buckets, each bucket builds its own bloom (one
  ``applyInPandas`` group), and the probe is a **cogrouped**
  ``applyInPandas`` on the same bucket key — each executor task sees one
  bucket's batch rows plus that one bucket's bits.  A 10-bits/key sketch
  over 10^11 store keys is ~125 GB of bits; co-grouping streams it past
  the batch without ever collecting it to the driver or broadcasting it.
* The store itself crosses the wire once, as (h1, h2) — 16 bytes/key, the
  fingerprint column pruned at the scan — to build the blooms.  The later
  exact verification never shuffles the store: see ``training5.py``.
* Both build and probe set bits with the same double-hashing scheme
  (g_i = h1 + i*h2 mod m, Kirsch–Mitzenmacher), both from the same two
  JVM-computed ``xxhash64`` columns, so no-false-negatives holds by
  construction (pytest-gated in tests/test_bloom.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# double-hashing probe count; with bits_per_key=10 the textbook FPR is
# (1 - e^{-k/10})^k ~= 1% — every false positive is caught by the exact
# verification join, so FPR only moves cost, never correctness
DEFAULT_K = 5
DEFAULT_BITS_PER_KEY = 10

_BLOOM_SCHEMA = "bucket int, m long, bits binary"


def _hash_cols(key_col: str):
    """The two independent 64-bit hash columns both sides must share."""
    h1 = F.xxhash64(F.col(key_col))
    h2 = F.xxhash64(F.col(key_col), F.lit(0x9E3779B9))
    return h1, h2


def _bucket_col(key_col: str, n_buckets: int):
    """Bucket assignment hash — deliberately a THIRD hash, independent of
    the probe pair: bucketing on h1 fixes h1's low bits per bucket, which
    (measured) correlates the probe positions and multiplies the FPR ~8x."""
    return (F.pmod(F.xxhash64(F.col(key_col), F.lit(0x5BD1E995)),
                   F.lit(n_buckets)).cast("int"))


def _positions(h1, h2, k: int, m: int):
    """Vectorized Kirsch–Mitzenmacher probe positions, shape (n, k).
    ``h2`` is forced odd (same transform on build and probe, so
    no-false-negatives is untouched): an even step over an even residue
    lattice would revisit the same position classes across i."""
    import numpy as np

    h1 = h1.astype(np.uint64).reshape(-1, 1)
    h2 = h2.astype(np.uint64).reshape(-1, 1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64).reshape(1, -1)
    return (h1 + i * h2) % np.uint64(m)


def build_blooms(store: DataFrame, key_col: str, n_buckets: int,
                 bits_per_key: int = DEFAULT_BITS_PER_KEY,
                 k: int = DEFAULT_K) -> DataFrame:
    """One bloom row per bucket: (bucket, m, bits).  ``m`` is sized from the
    bucket's own key count, so skewed buckets get proportionally more bits
    and the FPR stays flat across buckets."""
    h1, h2 = _hash_cols(key_col)
    keyed = store.select(h1.alias("h1"), h2.alias("h2"),
                         _bucket_col(key_col, n_buckets).alias("bucket"))

    def build(pdf):
        import numpy as np
        import pandas as pd

        # m odd: coprime to the byte layout, so probe positions spread
        # across all bit offsets regardless of hash low-bit structure
        m = max(67, (bits_per_key * len(pdf)) | 1)
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        pos = _positions(pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), k, m)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).ravel(),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).ravel().astype(np.uint8)))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])],
                             "m": [m], "bits": [bits.tobytes()]})

    return keyed.groupBy("bucket").applyInPandas(build, schema=_BLOOM_SCHEMA)


def bloom_flag(batch: DataFrame, store: DataFrame, key_col: str,
               n_buckets: int = 32, bits_per_key: int = DEFAULT_BITS_PER_KEY,
               k: int = DEFAULT_K, flag_col: str = "bloom_maybe") -> DataFrame:
    """Return ``batch`` plus a boolean ``flag_col``: False means the key is
    PROVABLY absent from ``store`` (no false negatives); True means "maybe
    present" — verify those rows exactly.  Neither side is collected or
    broadcast: build is one narrow shuffle of the store's hashes, probe is
    a cogrouped applyInPandas on the bucket key."""
    blooms = build_blooms(store, key_col, n_buckets, bits_per_key, k)

    h1, h2 = _hash_cols(key_col)
    keyed = (batch.withColumn("__h1", h1).withColumn("__h2", h2)
                  .withColumn("__bucket", _bucket_col(key_col, n_buckets)))

    out_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in batch.schema.fields)
    schema = f"{out_fields}, {flag_col} boolean"

    def probe(left, right):
        import numpy as np

        h1v = left.pop("__h1").to_numpy()
        h2v = left.pop("__h2").to_numpy()
        left = left.drop(columns=["__bucket"])
        if len(right) == 0:
            # store has no keys in this bucket -> every probe is a true miss
            left[flag_col] = False
            return left
        m = int(right["m"].iloc[0])
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        pos = _positions(h1v, h2v, k, m)
        probed = (bits[(pos >> np.uint64(3)).astype(np.int64)]
                  >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        left[flag_col] = probed.all(axis=1)
        return left

    return (keyed.groupBy("__bucket")
                 .cogroup(blooms.groupBy("bucket"))
                 .applyInPandas(probe, schema=schema))
