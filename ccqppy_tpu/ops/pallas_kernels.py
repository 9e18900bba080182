"""Pallas TPU kernels for the solver hot path.

The framework's hot op is the batched dense GEMV ``y[b] = A[b] @ x[b]``
(one per solver iteration per problem).  XLA's stock lowering with
``Precision.HIGHEST`` already runs at ~742 GB/s on a v5e (≈91% of HBM
peak, measured via chained in-jit iterations), so the Pallas path exists
for three reasons:

* a guaranteed-good lowering independent of XLA heuristics (the naive
  ``einsum('bij,bj->bi')`` spelling measured 15-30x slower than the
  batched-matmul spelling on the same chip);
* a fusion point for the projected-gradient step epilogue (projection +
  dot products in the same pass over HBM);
* bf16-storage variants that halve matvec HBM traffic where tolerances
  allow.

Block-shape notes (Mosaic constraints): the last two block dims must be
(divisible by 8, divisible by 128) or equal to the array dims — vectors are
therefore carried as ``(B, 1, n)`` so their blocks are exact-dim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_gemv(A, x, interpret=False):
    """y[b] = A[b] @ x[b] for A (B, n, n), x (B, n) -> (B, n).

    One grid step per problem; the full A_b block streams through VMEM
    (double-buffered by the Pallas pipeline).  n must be a multiple of 128
    and A_b at most ~8 MB for comfortable VMEM double buffering — callers
    with odd sizes should pad (see ``padded_batched_gemv``).
    """
    B, n, n2 = A.shape
    assert n == n2 and x.shape == (B, n)

    def kernel(A_ref, x_ref, o_ref):
        # precision=HIGHEST: the in-kernel MXU dot also defaults to bf16
        # multiplication for f32 operands (measured ~1% error).
        o_ref[0, 0, :] = jnp.dot(
            A_ref[0], x_ref[0, 0, :][:, None],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[:, 0]

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * n,
            bytes_accessed=A.size * A.dtype.itemsize + 2 * B * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, x[:, None, :].astype(jnp.float32))
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def padded_batched_gemv(A, x, interpret=False):
    """batched_gemv for arbitrary n (pads to a multiple of 128)."""
    B, n, _ = A.shape
    npad = _round_up(n, 128)
    if npad != n:
        A = jnp.pad(A, ((0, 0), (0, npad - n), (0, npad - n)))
        x = jnp.pad(x, ((0, 0), (0, npad - n)))
    y = batched_gemv(A, x, interpret=interpret)
    return y[:, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_gradient_step(A, b, x, alpha, g, lb, ub, interpret=False):
    """One fused projected-gradient step + gradient refresh:

        x1 = clip(x - alpha * g, lb, ub)
        g1 = A @ x1 + b
        partial dots: dx.dx, dx.dg  (for the BB step size)

    All in a single pass over A per problem — the elementwise prologue and
    the dot-product epilogue ride along with the matvec's HBM traffic.
    Returns (x1, g1, dxdx, dxdg).

    Shapes: A (B, n, n); b, x, g, lb, ub (B, n); alpha (B,).
    """
    B, n, _ = A.shape

    def kernel(A_ref, b_ref, x_ref, a_ref, g_ref, lb_ref, ub_ref,
               x1_ref, g1_ref, dots_ref):
        x = x_ref[0, 0, :]
        g = g_ref[0, 0, :]
        alpha = a_ref[0, 0, 0]
        x1 = jnp.clip(x - alpha * g, lb_ref[0, 0, :], ub_ref[0, 0, :])
        x1_ref[0, 0, :] = x1
        g1 = jnp.dot(A_ref[0], x1[:, None],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)[:, 0] + b_ref[0, 0, :]
        g1_ref[0, 0, :] = g1
        dx = x1 - x
        dg = g1 - g
        dots_ref[0, 0, 0] = jnp.sum(dx * dx)
        dots_ref[0, 0, 1] = jnp.sum(dx * dg)

    vec = lambda v: v[:, None, :].astype(jnp.float32)
    x1, g1, dots = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.float32),
        ],
        interpret=interpret,
    )(A, vec(b), vec(x), alpha[:, None, None].astype(jnp.float32), vec(g),
      vec(lb), vec(ub))
    return x1[:, 0, :], g1[:, 0, :], dots[:, 0, 0], dots[:, 0, 1]
