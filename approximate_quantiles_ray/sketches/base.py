"""Sketch protocol + registry.

The reference's extension surface is the ``Digest<F>`` trait
(/root/reference/src/traits.rs:3-34) plus a never-implemented
``MergableDigest`` (traits.rs:43-52). Here merge IS the law: every sketch
is a commutative monoid — ``merge(a, b)`` must be associative and (within
the algorithm's published error bound) order-insensitive, which is what
makes the Ray Data partial-per-block + tree-reduce plan correct.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Protocol, runtime_checkable

_FORMAT_VERSION = 1


@runtime_checkable
class Sketch(Protocol):
    """Minimal protocol every sketch implements."""

    name: str

    def merge(self, other: "Sketch") -> "Sketch":  # in-place, returns self
        ...

    def to_bytes(self) -> bytes: ...

    @property
    def count(self) -> int: ...

    @property
    def nbytes(self) -> int: ...


_REGISTRY: dict[str, type] = {}


def register_sketch(cls: type) -> type:
    """Class decorator: register a sketch type under ``cls.name``."""
    _REGISTRY[cls.name] = cls
    return cls


def sketch_type(name: str) -> type:
    return _REGISTRY[name]


def pack_state(name: str, state: dict[str, Any]) -> bytes:
    """Serialize a sketch state dict with a (name, version) tag."""
    return pickle.dumps((_FORMAT_VERSION, name, state), protocol=pickle.HIGHEST_PROTOCOL)


def unpack_state(data: bytes) -> tuple[str, dict[str, Any]]:
    version, name, state = pickle.loads(data)
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported sketch format version {version}")
    return name, state


def sketch_from_bytes(data: bytes):
    """Reconstruct any registered sketch from its serialized form."""
    name, _ = unpack_state(data)
    return _REGISTRY[name].from_bytes(data)


SketchFactory = Callable[[], Any]
