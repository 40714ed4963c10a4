"""Partitioned Bloom URL-seen prefilter (north-star D1).

The reference's ``duplication_handler`` is a linear-scan Python list
(duplication_handler.py:3-19). At 10^10 frontier scale the rebuild needs a
cheap membership prefilter in front of the exact left_anti join (SURVEY.md
§2.3 D1): candidate URLs that definitely aren't in the seen set skip the
shuffle; possible-positives fall through to the join, which remains the
source of truth — so Bloom false-positive rate only costs bandwidth, never
correctness.

Sharding: ``shard = pmod(xxhash64(key), n_shards)`` — each shard is an
independent bitmap built by per-partition Arrow aggregation, OR-merged on
the driver, then broadcast. Membership tests use double hashing
``g_i = h1 + i*h2`` over Spark-compatible xxhash64 seeds, vectorized with
numpy inside Arrow batches (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genesis_spark import conf

_SEED_H1 = 42          # Spark's xxhash64 default seed
_SEED_H2 = 0xB10053


def _hash_pair(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    from genesis_spark.functions.hashing import xxh64
    h1 = np.fromiter((xxh64(v, _SEED_H1) for v in values), dtype=np.int64,
                     count=len(values)).astype(np.uint64)
    h2 = np.fromiter((xxh64(v, _SEED_H2) for v in values), dtype=np.int64,
                     count=len(values)).astype(np.uint64)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, n_bits: int,
               k: int) -> np.ndarray:
    # (len, k) bit positions via double hashing
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)


class ShardedBloom:
    """Immutable sharded bitmap; built distributed, broadcast for filtering."""

    def __init__(self, shards: dict[int, np.ndarray], n_bits: int, k: int,
                 n_shards: int):
        self.shards = shards
        self.n_bits = n_bits
        self.k = k
        self.n_shards = n_shards

    def might_contain(self, values: pd.Series) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash_pair(values)
        shard_ids = h1 % np.uint64(self.n_shards)
        pos = _positions(h1, h2, self.n_bits, self.k)
        out = np.zeros(len(values), dtype=bool)
        for sid in np.unique(shard_ids):
            bitmap = self.shards.get(int(sid))
            if bitmap is None:
                continue
            mask = shard_ids == sid
            p = pos[mask]
            bits = bitmap[p >> 3] & (1 << (p & 7)).astype(np.uint8)
            out[mask] = (bits != 0).all(axis=1)
        return out


def build_bloom(df: DataFrame, key_col: str,
                n_shards: int = conf.BLOOM_SHARDS,
                n_bits: int = conf.BLOOM_BITS_PER_SHARD,
                k: int = conf.BLOOM_NUM_HASHES) -> ShardedBloom:
    """Distributed build: per-partition partial bitmaps via mapInPandas,
    OR-merge on the driver (shard bitmaps are small — n_bits/8 bytes each)."""
    n_bytes = n_bits // 8

    def partial(batches):
        local: dict[int, np.ndarray] = {}
        for pdf in batches:
            vals = pdf[key_col].dropna()
            if len(vals) == 0:
                continue
            h1, h2 = _hash_pair(vals)
            shard_ids = h1 % np.uint64(n_shards)
            pos = _positions(h1, h2, n_bits, k)
            for sid in np.unique(shard_ids):
                bm = local.setdefault(int(sid), np.zeros(n_bytes, dtype=np.uint8))
                p = pos[shard_ids == sid].ravel()
                np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({
            "shard": list(local.keys()),
            "bitmap": [bm.tobytes() for bm in local.values()],
        })

    parts = df.select(key_col).mapInPandas(
        partial, "shard int, bitmap binary").collect()
    shards: dict[int, np.ndarray] = {}
    for row in parts:
        bm = np.frombuffer(row.bitmap, dtype=np.uint8)
        if row.shard in shards:
            shards[row.shard] = shards[row.shard] | bm
        else:
            shards[row.shard] = bm.copy()
    return ShardedBloom(shards, n_bits, k, n_shards)


def filter_not_seen(df: DataFrame, key_col: str, bloom: ShardedBloom,
                    flag_col: str = "_maybe_seen") -> DataFrame:
    """Append a boolean 'might be in the seen set' column. Rows with
    ``False`` are *definitely* new and may skip the exact anti-join."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)

    from pyspark.sql import types as T
    # copy, never .add() in place (pyspark 4 caches df.schema objects)
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(flag_col, T.BooleanType(), False)])

    def apply(batches):
        b = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf[flag_col] = b.might_contain(pdf[key_col])
            yield pdf

    return df.mapInPandas(apply, schema)
