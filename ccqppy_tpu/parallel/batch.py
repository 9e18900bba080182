"""Scenario parallelism: batched QP solves via vmap + mesh sharding.

This is the TPU-native replacement for the reference benchmark's serial
4-deep Python loop over [solver x family x size x trial]
(``/root/reference/benchmarks/benchmark_random_ccqp.py:76-102``):

* ``solve_batched`` — ``jax.vmap`` over the problem axis.  JAX's while-loop
  batching rule gives *exact* per-lane convergence masking for free: the
  fused loop runs until every lane is done, carries of finished lanes are
  select-frozen, so results (including per-lane matvec counts) are identical
  to solving each problem alone.
* ``solve_batched_sharded`` — the same, spread over the devices of a 1-D
  mesh axis with ``shard_map`` (data-parallel over scenarios: the
  BASELINE.json "16k independent n=1k box QPs" configuration).  Collective-
  free: every device solves its own shard of the batch; linear scaling is
  the expectation, limited only by lane-convergence skew inside each shard.

Projection parameters may be shared (unbatched) or per-problem (stacked with
a leading batch axis) — pass ``proj_batched=True`` for the latter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ccqppy_tpu.models import SOLVERS


def _get_solver(solver):
    if isinstance(solver, str):
        return SOLVERS[solver][0]
    return solver


def solve_batched(solver, A, b, x0=None, proj=None, config=None, keys=None,
                  proj_batched=False):
    """Solve a batch of QPs: A (B,n,n) or operator pytree with leading batch
    axis on its leaves; b (B,n).  Returns a SolveResult with leading batch
    axis on every field."""
    fn = _get_solver(solver)
    in_proj_axis = 0 if proj_batched else None

    def one(A_i, b_i, x0_i, proj_i, key_i):
        kwargs = {}
        if key_i is not None:
            kwargs["key"] = key_i
        return fn(A_i, b_i, x0=x0_i, proj=proj_i, config=config, **kwargs)

    return jax.vmap(one, in_axes=(0, 0, 0 if x0 is not None else None,
                                  in_proj_axis, 0 if keys is not None else None)
                    )(A, b, x0, proj, keys)


def solve_batched_sharded(solver, A, b, mesh, axis="batch", x0=None,
                          proj=None, config=None, keys=None,
                          proj_batched=False):
    """Shard the batch across ``mesh[axis]`` and vmap-solve each shard.

    The batch size must divide the axis size.  Inputs may live anywhere;
    outputs come back sharded over ``axis`` (leading dim).
    """
    fn = _get_solver(solver)

    def local_solve(A_l, b_l, x0_l, proj_l, keys_l):
        return solve_batched(fn, A_l, b_l, x0=x0_l, proj=proj_l,
                             config=config, keys=keys_l,
                             proj_batched=proj_batched)

    sharded = PSpec(axis)
    repl = PSpec()

    in_specs = (sharded, sharded,
                sharded if x0 is not None else repl,
                sharded if proj_batched else repl,
                sharded if keys is not None else repl)
    out_specs = sharded

    shmapped = jax.shard_map(
        local_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    return shmapped(A, b, x0, proj, keys)


def make_batch_mesh(n_devices=None, axis="batch"):
    """1-D device mesh over all (or the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))
