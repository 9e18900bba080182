"""Random convex-QP ensemble generation, on device.

Replaces the reference's host-side generator
(``/root/reference/benchmarks/benchmark_random_ccqp.py:36-63``): Hessian from
the Wishart distribution ``W(df=n, scale=I)`` and unconstrained optimum
``x ~ U(-1, 1)^n`` with ``b = -A x`` — but batched with ``jax.random`` so a
16k-problem ensemble materializes in one fused kernel on the chip instead of
a Python loop.  (A Wishart(n, I) draw is ``G G^T`` with ``G`` an n x n
standard normal.)  Unlike the reference — whose uniform draw ignores the
seed, making trials only partially reproducible — every draw here derives
from the caller's key.

``diag_boost`` adds ``c * n * I``: with 0 the raw Wishart is almost surely
full-rank but often ill-conditioned; benchmark configs that want
well-conditioned ensembles pass e.g. 1.0.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp


def random_qp(key, n, dtype=jnp.float32, diag_boost=0.0):
    """One random QP: (A, b, x_uncon) with A ~ Wishart(n, I), b = -A x."""
    kg, kx = jax.random.split(key)
    G = jax.random.normal(kg, (n, n), dtype)
    A = jnp.dot(G, G.T, preferred_element_type=dtype)
    if diag_boost:
        A = A + diag_boost * n * jnp.eye(n, dtype=dtype)
    x = jax.random.uniform(kx, (n,), dtype, minval=-1.0, maxval=1.0)
    b = -jnp.dot(A, x, preferred_element_type=dtype)
    return A, b, x


# Jitted generators/concats cached per static signature: a fresh ``jax.jit``
# per call re-traces and re-compiles every time — measured 19 s per
# 2048-problem call through the remote-compile path vs 0.31 s cached.
@lru_cache(maxsize=32)
def _gen_fn(n, dtype, diag_boost):
    return jax.jit(jax.vmap(lambda k: random_qp(k, n, dtype, diag_boost)))


@lru_cache(maxsize=32)
def _concat_fn(num_parts):
    # Donating the parts lets XLA free each source chunk as it is copied
    # into the output, keeping the peak near 1x the final footprint — the
    # HBM cap that is chunked generation's whole purpose.
    return jax.jit(lambda *ps: tuple(
        jnp.concatenate([p[i] for p in ps]) for i in range(3)),
        donate_argnums=tuple(range(num_parts)))


def random_qp_batch(key, batch, n, dtype=jnp.float32, diag_boost=0.0,
                    chunk=None):
    """Batch of independent random QPs: A (B,n,n), b (B,n), x_uncon (B,n).

    ``chunk`` generates the batch in pieces of that size to cap peak HBM
    (the Wishart factor G transiently doubles the footprint of A).  Defaults
    to the whole batch below 256, else 256.
    """
    keys = jax.random.split(key, batch)
    gen = _gen_fn(int(n), jnp.dtype(dtype).name, float(diag_boost))
    if chunk is None:
        chunk = batch if batch <= 256 else 256
    if chunk >= batch:
        return gen(keys)
    parts = [gen(keys[i:i + chunk]) for i in range(0, batch, chunk)]
    return _concat_fn(len(parts))(*parts)
