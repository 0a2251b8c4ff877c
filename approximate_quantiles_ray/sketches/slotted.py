"""Pickle state protocol for ``__slots__`` sketch classes.

Why this exists: the driver contract registers the whole package with
``ray.cloudpickle.register_pickle_by_value`` (workers may import the
entry module by file path, so classes must travel inside task specs).
Cloudpickle reconstructs a by-value class as a *skeleton* type created
without ``__slots__`` — its instances carry a plain ``__dict__``, and
their default pickle state is a dict. Round-tripping such an instance
back into a process that holds the REAL slotted class then fails with
``'X' object has no attribute '__dict__'``. An explicit
``__getstate__``/``__setstate__`` pair keyed on the class's declared
slots makes instance state symmetric regardless of which incarnation of
the class serializes which side.
"""

from __future__ import annotations


class SlotState:
    """Mixin: explicit slot-dict pickle state (contributes no slots and
    no instance ``__dict__`` of its own)."""

    __slots__ = ()

    def __getstate__(self):
        return {s: getattr(self, s) for s in type(self).__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            object.__setattr__(self, k, v)
