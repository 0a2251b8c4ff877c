"""approximate_quantiles_ray — a Ray-Data-native distributed sketch library.

Two clean layers:

- :mod:`approximate_quantiles_ray.sketches` — pure NumPy mergeable sketch
  kernels (t-digest, KLL, HLL, count-min, Bloom, exact oracle). No Ray
  imports; every sketch is a commutative monoid with
  ``update / merge / to_bytes / from_bytes`` plus its queries.
- :mod:`approximate_quantiles_ray.engine` — Ray Data drivers: per-block
  partial sketches via ``map_batches`` over zero-copy Arrow, merged via
  tree reduction or ``groupby().aggregate``; checkpoint/resume in
  :mod:`approximate_quantiles_ray.state`.

The algorithmic semantics follow the reference repo
``Scratchcat1/approximate-quantiles`` (see SURVEY.md for the file:line
mapping); the execution architecture is Ray Data, not a port.
"""

from approximate_quantiles_ray.sketches.tdigest import TDigest
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.kll_fixed import KLLFixed
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.countmin import CountMinSketch
from approximate_quantiles_ray.sketches.bloom import BloomFilter
from approximate_quantiles_ray.sketches.exact import ExactDigest

__all__ = [
    "TDigest",
    "KLL",
    "KLLFixed",
    "HLL",
    "CountMinSketch",
    "BloomFilter",
    "ExactDigest",
]

__version__ = "0.1.0"
