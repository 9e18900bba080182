"""Pytree registration helpers.

All framework objects (projections, linear operators, solver state, results)
are frozen dataclasses registered as JAX pytrees so they can flow through
``jit`` / ``vmap`` / ``shard_map`` transparently.  Array-valued fields are
pytree *data*; structural fields (ints, floats used as compile-time constants,
nested static tuples) are pytree *metadata* and therefore jit-static.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax


def register_pytree_dataclass(cls=None, *, meta_fields: Sequence[str] = ()):
    """Class decorator: freeze the dataclass and register it as a pytree.

    Parameters
    ----------
    meta_fields:
        Names of fields that are static metadata (must be hashable).  All
        remaining fields are treated as pytree children (arrays / sub-pytrees).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        meta = tuple(meta_fields)
        for m in meta:
            if m not in names:
                raise ValueError(f"meta field {m!r} not a field of {c.__name__}")
        data = tuple(n for n in names if n not in meta)
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)
        return c

    if cls is None:
        return wrap
    return wrap(cls)
