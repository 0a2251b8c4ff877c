"""Vectorized, seeded 64-bit hashing for sketch keys.

All sketches that hash (HLL, count-min, Bloom, minhash, exact-dedup)
share this module so a value hashes identically everywhere. Integers go
through vectorized splitmix64 (public-domain finalizer from Steele et
al., "Fast splittable pseudorandom number generators"); strings/binary
go through pandas' vectorized 64-bit siphash (``pd.util.hash_array``)
and are then seed-mixed with splitmix64. Independent hash functions are
derived by double hashing h_i = h1 + i*h2 (Kirsch–Mitzenmacher).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))


def _seed_mix(h: np.ndarray, seed: int) -> np.ndarray:
    if seed == 0:
        return h
    with np.errstate(over="ignore"):
        return splitmix64(h ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def hash_int64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash an int64/uint64/float64 array to uint64."""
    arr = np.asarray(values)
    if arr.dtype == np.float64 or arr.dtype == np.float32:
        arr = arr.astype(np.float64).view(np.uint64)
    else:
        arr = arr.astype(np.int64).view(np.uint64)
    return _seed_mix(splitmix64(arr), seed)


def _polars_hash(arr) -> np.ndarray:
    """Vectorized Rust (xxhash) string hashing via polars — no Python
    object materialization, ~25× faster than the pandas path on long
    strings. POLARS_MAX_THREADS is pinned to 1 so 32 Ray workers don't
    each spin a full thread pool (classic oversubscription)."""
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)


# Bump when the hash function family changes (e.g. the pandas-siphash →
# polars-xxhash switch): checkpoint configs embed this so persisted sketch
# states from a different hash generation are invalidated instead of being
# silently merged with incompatible hashes.
HASH_VERSION = 2


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Hash a string (or arbitrary object) array to uint64.

    Accepts pyarrow string arrays/ChunkedArrays (fast Rust path — keep
    data in Arrow upstream!), numpy object arrays, pandas Series, and
    python lists. Non-string object arrays route by Arrow's INFERRED
    type: numeric → splitmix64 (identical to native int/float columns),
    strings → polars, anything else (incl. mixed batches) → pandas
    siphash. A column whose batches mix strings with non-strings has no
    batch-local stable family — don't feed such columns to sketches.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pd.Series):
            values = values.to_numpy()
        arr = np.asarray(values, dtype=object)
        try:
            inferred = pa.array(arr)
        except (pa.ArrowTypeError, pa.ArrowInvalid):
            h = pd.util.hash_array(arr, categorize=True)
            return _seed_mix(h.astype(np.uint64), seed)
        if pa.types.is_integer(inferred.type) or pa.types.is_floating(inferred.type):
            return hash_int64(inferred.to_numpy(zero_copy_only=False), seed)
        if not pa.types.is_string(inferred.type) and not pa.types.is_large_string(
            inferred.type
        ):
            h = pd.util.hash_array(arr, categorize=True)
            return _seed_mix(h.astype(np.uint64), seed)
        values = inferred
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    h = _polars_hash(values)
    return _seed_mix(h, seed)


def hash_any(values, seed: int = 0) -> np.ndarray:
    """Dispatch on dtype: numeric → splitmix64, everything else → siphash."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(values.type) or pa.types.is_floating(values.type):
            return hash_int64(values.to_numpy(zero_copy_only=False), seed)
        return hash_strings(values, seed)
    arr = np.asarray(values)
    if arr.dtype.kind in "iuf":
        return hash_int64(arr, seed)
    return hash_strings(arr, seed)


def double_hash(h: np.ndarray, i: int, modulus: int) -> np.ndarray:
    """i-th derived hash via h1 + i*h2 mod modulus (h2 forced odd)."""
    h1 = h
    h2 = splitmix64(h) | np.uint64(1)
    with np.errstate(over="ignore"):
        return ((h1 + np.uint64(i) * h2) % np.uint64(modulus)).astype(np.int64)
