"""Pallas TPU kernels for the solver hot path.

The framework's hot op is the batched dense GEMV ``y[b] = A[b] @ x[b]``
(one per solver iteration per problem).  Honest v5e numbers, measured with
in-jit chained sweeps closed by host scalar materialization (B=1536,
n=1024, f32; naive timing through the remote-execution tunnel is polluted
by dispatch caching):

* XLA batched-matmul lowering of ``vmap(jnp.dot)``: ~527 GB/s
* this kernel, row-tiled TR=512:                     ~513 GB/s
* whole-A-in-VMEM per grid step (previous version):  ~357 GB/s
* VPU multiply-reduce formulation:                   ~181 GB/s

i.e. XLA's stock lowering is already at the practical ceiling for this
access pattern (~65% of the 819 GB/s paper peak) and the Pallas path is a
near-parity fallback that guarantees the good lowering independent of XLA
heuristics, plus a fusion point for step epilogues (``fused_gradient_step``).

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


def _row_tile(n):
    """Largest of (512, 256, 128) dividing n: ~0.25-2 MB DMA granularity per
    grid step pipelines well (the whole-A 4 MB granularity measured 30%
    slower — see module docstring)."""
    for tr in (512, 256, 128):
        if n % tr == 0:
            return tr
    return n


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_gemv(A, x, interpret=False):
    """y[b] = A[b] @ x[b] for A (B, n, n), x (B, n) -> (B, n).

    Grid (B, n/TR): each step streams a (TR, n) row tile of one problem's A
    through VMEM (double-buffered by the Pallas pipeline) and emits TR
    outputs via an MXU dot.  n must be a multiple of 128 — callers with odd
    sizes should pad (see ``padded_batched_gemv``).
    """
    B, n, n2 = A.shape
    assert n == n2 and x.shape == (B, n)
    tr = _row_tile(n)

    def kernel(A_ref, x_ref, o_ref):
        # precision=HIGHEST: the in-kernel MXU dot also defaults to bf16
        # multiplication for f32 operands (measured ~1% error).
        o_ref[0, 0, :] = jnp.dot(
            A_ref[0], x_ref[0, 0, :][:, None],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)[:, 0]

    out = pl.pallas_call(
        kernel,
        grid=(B, n // tr),
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tr), lambda b, r: (b, 0, r),
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
