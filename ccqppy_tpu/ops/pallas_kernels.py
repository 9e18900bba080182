"""Pallas TPU kernels for the solver hot path.

The framework's hot op is the batched dense GEMV ``y[b] = A[b] @ x[b]``
(one per solver iteration per problem).  Honest v5e numbers, measured with
in-jit chained sweeps closed by host scalar materialization (B=1536-2048,
n=1024, re-measured 2026-08-19; naive timing through the remote-execution
tunnel is polluted by dispatch caching):

* XLA einsum lowering, f32 HIGHEST:        9.15 ms/sweep (~705 GB/s, 86% peak)
* XLA einsum, bf16-resident A:             5.02 ms/sweep (1.8x — half bytes)
* this kernel (batched_gemv) f32 TR=512:  15.6  ms/sweep (~414 GB/s)
* this kernel bf16 TR=1024:                5.12 ms/sweep (~631 GB/s eff)
* batched_symv (upper-triangle stream):   10.1  ms/sweep at HALF the bytes
  (~300 GB/s streamed) — SLOWER than XLA reading the full matrix

Conclusion (reversed from round 1, where XLA measured ~527 GB/s and this
kernel ~513): XLA's stock lowering now clearly wins the GEMV; the Pallas
per-grid-step overhead (~3.3 us/step regardless of tile size) caps these
kernels at ~40-60% of XLA's streaming bandwidth.  The kernels stay as (a)
the capacity-saving packed-symmetric path (``pack_symmetric`` stores ~56-75%
of n^2 — more problems per chip at a measured ~1.5x sweep-time cost), and
(b) a lowering-independent fallback.  The production batched path
(parallel/, bench.py) uses the XLA lowering.

Block-shape notes (Mosaic constraints): the last two block dims must be
(divisible by 8, divisible by 128) or equal to the array dims — vectors are
therefore carried as ``(B, 1, n)`` so their blocks are exact-dim; bf16
minor-dim insertion must happen on the f32 operand (32-bit-only op).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _auto_interpret(interpret):
    """Pallas TPU kernels run interpreted on non-TPU backends (CPU tests);
    the decision is trace-time static."""
    return bool(interpret) or jax.default_backend() != "tpu"


def _row_tile(n, itemsize=4, tile_bytes=None):
    """Largest row tile dividing n with ~0.25-2 MB DMA granularity per grid
    step — pipelines well (the whole-A 4 MB granularity measured 30% slower,
    see module docstring).  For narrower dtypes a larger tile keeps the same
    byte granularity."""
    if tile_bytes is None:
        tile_bytes = 512 * 1024 * itemsize  # f32: TR=512 at n=1024 = 2 MB
    cands = [512 * 4 // itemsize, 512, 256, 128]
    for tr in cands:
        if n % tr == 0 and tr * n * itemsize <= 2 * tile_bytes:
            return tr
    return n


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def batched_gemv(A, x, interpret=False, row_tile=None):
    """y[b] = A[b] @ x[b] for A (B, n, n) f32 OR bf16, x (B, n) -> (B, n) f32.

    Grid (B, n/TR): each step streams a (TR, n) row tile of one problem's A
    through VMEM (double-buffered by the Pallas pipeline) and emits TR
    outputs via an MXU dot.  n must be a multiple of 128 — callers with odd
    sizes should pad (see ``padded_batched_gemv``).

    bfloat16 A is the mixed-precision ladder's cheap rung: half the HBM
    bytes per sweep.  x is cast to bf16 at the MXU input (inside VMEM —
    free), accumulation is f32 (``preferred_element_type``); the combined
    operator+operand quantization error is ~2^-8 relative, the documented
    bf16 floor (docs/precision.md section 4).
    """
    B, n, n2 = A.shape
    assert n == n2 and x.shape == (B, n)
    lowp = A.dtype == jnp.bfloat16
    tr = row_tile or _row_tile(n, A.dtype.itemsize)

    def kernel(A_ref, x_ref, o_ref):
        xv = x_ref[0, 0, :]
        if lowp:
            # Native single-pass bf16 x bf16 -> f32 MXU op.  The minor-dim
            # insertion happens on the f32 vector (Mosaic only supports it
            # for 32-bit types), the cast after.
            y = jnp.dot(A_ref[0], xv[:, None].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        else:
            # precision=HIGHEST: the in-kernel MXU dot also defaults to bf16
            # multiplication for f32 operands (measured ~1% error).
            y = jnp.dot(A_ref[0], xv[:, None],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        o_ref[0, 0, :] = y[:, 0]

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


def _upper_tile_tables(nt):
    """Static (i, j) tile coordinates of the upper triangle, row-major:
    (0,0), (0,1), ..., (0,nt-1), (1,1), ..., (nt-1,nt-1)."""
    import numpy as np
    coords = [(i, j) for i in range(nt) for j in range(i, nt)]
    ii = np.asarray([c[0] for c in coords], np.int32)
    jj = np.asarray([c[1] for c in coords], np.int32)
    return ii, jj


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def batched_symv(Au, x, tile=512, interpret=False):
    """y[b] = A[b] @ x[b] for SYMMETRIC A, streaming only the UPPER-triangle
    tiles: y = sum over tiles (i<=j) of  T_ij x_j  (+  T_ij^T x_i  for i<j).

    The QP Hessian is symmetric, so half of a dense GEMV's HBM traffic is
    redundant — and the batched solve is purely HBM-bound (measured: XLA f32
    GEMV runs at ~700 GB/s, 86% of v5e peak).  This kernel is the exact-
    arithmetic bandwidth lever: ~half the bytes per sweep at FULL f32
    precision (compare the bf16 ladder, which halves bytes at a 2^-8
    operator-error cost).

    Layout: ``Au`` is the (B, n, n) stacked Hessian with the strictly-lower
    triangle unused (content ignored; only upper tiles are ever DMA'd — the
    Pallas pipeline fetches exactly the blocks the index map visits).  For
    the HBM-capacity win too (n^2/2 storage) use ``pack_symmetric`` +
    ``batched_symv_packed``.

    Grid: (B, T) with T = nt(nt+1)/2 upper tiles, visited row-major via
    static lookup tables in the index map; the output block (1, 1, n) is
    revisited for all T steps of a problem and accumulated in VMEM (the
    standard reduction pattern), flushing once per problem.

    n must be a multiple of ``tile``; x is (B, n) f32.  The diagonal tiles'
    strictly-lower entries MUST mirror the upper ones (pack_symmetric
    guarantees this; they sit in the same tile so there is no byte saving in
    skipping them).
    """
    B, n, n2 = Au.shape
    assert n == n2 and x.shape == (B, n)
    assert n % tile == 0, (n, tile)
    nt = n // tile
    ii, jj = _upper_tile_tables(nt)
    T = len(ii)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # ii, jj tables feed the index maps
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, tile, tile),
                         lambda b, t, ii, jj: (b, ii[t], jj[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, t, ii, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b, t, ii, jj: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    dtype = Au.dtype
    out = pl.pallas_call(
        _symv_kernel_factory(tile, lambda A_ref: A_ref[0], dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, n), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * n,
            bytes_accessed=B * (n * (n + tile) // 2) * 4 + 2 * B * n * 4,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(jnp.asarray(ii), jnp.asarray(jj), Au,
      x[:, None, :].astype(dtype))
    return out[:, 0, :]


def _symv_kernel_factory(tile, load_tile, dtype=jnp.float32):
    """Shared symv kernel body; ``load_tile`` maps the A ref to the (tile,
    tile) block (layouts differ between the full and packed forms)."""

    def kernel(i_ref, j_ref, A_ref, x_ref, o_ref):
        t = pl.program_id(1)
        i = i_ref[t]
        j = j_ref[t]

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        Tb = load_tile(A_ref)
        xj = x_ref[0, 0, pl.ds(j * tile, tile)]
        yi = jnp.dot(Tb, xj[:, None],
                     preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)[:, 0]
        o_ref[0, 0, pl.ds(i * tile, tile)] += yi

        @pl.when(i != j)
        def _():
            # T^T xi as the vector-matrix product xi @ T — no transpose op.
            xi = x_ref[0, 0, pl.ds(i * tile, tile)]
            yj = jnp.dot(xi[None, :], Tb,
                         preferred_element_type=dtype,
                         precision=jax.lax.Precision.HIGHEST)[0]
            o_ref[0, 0, pl.ds(j * tile, tile)] += yj

    return kernel


@functools.partial(jax.jit, static_argnames=("tile",))
def pack_symmetric(A, tile=512):
    """Pack a symmetric stack (B, n, n) into upper-tile form
    (B, T, tile, tile), T = nt(nt+1)/2 — HALF the HBM capacity (plus
    diagonal-tile slack) and contiguous per-tile DMA for
    ``batched_symv_packed``.  Tile order matches ``_upper_tile_tables``."""
    B, n, _ = A.shape
    assert n % tile == 0
    nt = n // tile
    ii, jj = _upper_tile_tables(nt)
    tiles = [
        jax.lax.slice(A, (0, int(i) * tile, int(j) * tile),
                      (B, (int(i) + 1) * tile, (int(j) + 1) * tile))
        for i, j in zip(ii, jj)
    ]
    return jnp.stack(tiles, axis=1)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def batched_symv_packed(Ap, x, n=None, interpret=False):
    """``batched_symv`` on the packed upper-tile layout (B, T, tile, tile)
    from ``pack_symmetric``: same math, half the HBM *capacity* as well, and
    every grid step DMAs one fully contiguous tile."""
    B, T, tile, tile2 = Ap.shape
    assert tile == tile2
    if n is None:
        n = x.shape[-1]
    assert x.shape == (B, n) and n % tile == 0
    nt = n // tile
    ii, jj = _upper_tile_tables(nt)
    assert len(ii) == T, (len(ii), T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, tile, tile),
                         lambda b, t, ii, jj: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, t, ii, jj: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda b, t, ii, jj: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    dtype = Ap.dtype
    out = pl.pallas_call(
        _symv_kernel_factory(tile, lambda A_ref: A_ref[0, 0], dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, n), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * n,
            bytes_accessed=Ap.size * Ap.dtype.itemsize + 2 * B * n * 4,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(jnp.asarray(ii), jnp.asarray(jj), Ap,
      x[:, None, :].astype(dtype))
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def symv_packed(Ap, x, n=None, interpret=False):
    """Single-problem symv on the packed layout: Ap (T, tile, tile), x (n,)
    -> (n,).  Composes with ``jax.vmap`` (Pallas's batching rule prepends
    the batch grid dimension, recovering ``batched_symv_packed``'s
    schedule) — this is the form solver operators use under
    ``parallel.solve_batched``."""
    T, tile, tile2 = Ap.shape
    assert tile == tile2
    if n is None:
        n = x.shape[-1]
    assert x.shape == (n,) and n % tile == 0
    nt = n // tile
    ii, jj = _upper_tile_tables(nt)
    assert len(ii) == T, (len(ii), T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, tile, tile), lambda t, ii, jj: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t, ii, jj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n), lambda t, ii, jj: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(i_ref, j_ref, A_ref, x_ref, o_ref):
        t = pl.program_id(0)
        i = i_ref[t]
        j = j_ref[t]

        @pl.when(t == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        Tb = A_ref[0]
        xj = x_ref[0, pl.ds(j * tile, tile)]
        yi = jnp.dot(Tb, xj[:, None],
                     preferred_element_type=A_ref.dtype,
                     precision=jax.lax.Precision.HIGHEST)[:, 0]
        o_ref[0, pl.ds(i * tile, tile)] += yi

        @pl.when(i != j)
        def _():
            xi = x_ref[0, pl.ds(i * tile, tile)]
            yj = jnp.dot(xi[None, :], Tb,
                         preferred_element_type=A_ref.dtype,
                         precision=jax.lax.Precision.HIGHEST)[0]
            o_ref[0, pl.ds(j * tile, tile)] += yj

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n), Ap.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n,
            bytes_accessed=Ap.size * 4 + 2 * n * 4,
            transcendentals=0,
        ),
        interpret=_auto_interpret(interpret),
    )(jnp.asarray(ii), jnp.asarray(jj), Ap, x[None, :].astype(Ap.dtype))
    return out[0]


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


