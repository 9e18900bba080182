"""Mixed-precision batched ensemble pipeline: bf16 descent + f32 PCG polish.

The headline batched workload (B independent dense n-dim QPs) is HBM-
bandwidth-bound on TPU: every solver iteration re-reads the whole stacked
Hessian, so solves/s ~ bandwidth / (bytes-per-sweep * sweeps).  This module
attacks both factors:

* **bytes/sweep** — phase A iterates against a bfloat16-resident copy of A
  (``ops.linop.CastDense``): half the bytes, single-pass bf16 MXU matvecs.
  The bf16 operator error floors the TRUE residual around 1e-2 normalized
  (measured; the self-reported residual keeps falling, so phase A's stop
  tolerance must stay above the floor).  Phase B then polishes with the f32
  operator: warm-started projected CG (``models.pcg``) that typically needs
  ~8 sweeps to cross 3 more orders of magnitude.
* **sweeps** — a batched ``lax.while_loop`` runs to the SLOWEST lane.  The
  optional fixup phase re-checks convergence host-side, gathers the few
  unconverged lanes into a small power-of-two bucket, and finishes them with
  a full-precision fallback solve — so stragglers and curved-set lanes the
  PCG mask froze cost a tiny compacted solve instead of full-batch sweeps.

* **layout** — XLA's default layout assignment for a stacked (B, n, n)
  operand of a while-loop GEMV inserts a full relayout copy of A *inside*
  the jit (measured: +7.8 GB HBM and +16 GB of traffic per call at
  B=2048, n=1000).  ``prepare_dense_batch`` pins the batch-major layout at
  device_put time so the copy never exists.

End-to-end on the headline ensemble (B=2048 n=1000 box QPs, tol 2e-5, one
v5e chip): plain f32 BBPGDf 4.9k solves/s -> layout fix 6.0k -> this ladder
5.9-6.8k, tying (not beating) plain f32 PCG because the bf16 batched GEMV
lowers at only ~425 GB/s effective vs f32's ~530 (docs/precision.md has the
full accounting).  Mixed precision PAYS on ill-conditioned families with
deep sweep counts: residual-replacement rr-PCG (models/pcg.py
``refresh_every`` + ``MixedPrecDense``) beats plain f32 by 1.5-1.7x at
equal true residuals on cond ~ 40-200 Wishart ensembles — measured,
benchmarks/results/illcond.json.  The ladder's other durable win is HBM
capacity — a bf16 ensemble stores 2x the problems per chip.  Per-lane
convergence semantics are exact: every reported residual is a true f32
residual.

The reference has no counterpart (serial f64 numpy); this is TPU-native
design headroom, not a port.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ccqppy_tpu.models import SOLVERS, PCGConfig
from ccqppy_tpu.parallel.batch import _row_gather, host_compact_finish
from ccqppy_tpu.ops.linop import CastDense


def prepare_dense_batch(As, low_dtype=None, donate=True):
    """Place a stacked dense Hessian batch (B, n, n) on device in the
    batch-major layout the batched solvers want, avoiding XLA's in-jit
    relayout copy (see module docstring).  Returns ``As`` (and, when
    ``low_dtype`` is given, a same-layout low-precision copy for phase A).

    ``donate=True`` (default) DELETES the input buffer once the relayouted
    copy is ready — the caller must rebind, as in
    ``As, As16 = prepare_dense_batch(As, jnp.bfloat16)``.  At headline scale
    the stacked Hessians are half of HBM; holding source + relayout + bf16
    copies simultaneously (2.5x) OOMs a 16 GB chip, so the source must die
    before the cast runs.

    Single-device ensembles only — sharded paths place their own operands.
    On non-TPU backends (or if the layout API is unavailable) this is a
    plain ``device_put``.
    """
    As = jnp.asarray(As)

    def _fmt():
        if jax.default_backend() != "tpu" or As.ndim != 3:
            return None
        try:
            from jax._src.layout import Layout as _Layout
            from jax.experimental.layout import Format
            from jax.sharding import SingleDeviceSharding
            return Format(_Layout(major_to_minor=(0, 1, 2)),
                          SingleDeviceSharding(jax.devices()[0]))
        except Exception:  # pragma: no cover - layout API drift
            return None

    fmt = _fmt()
    src = As
    if fmt is not None:
        # Jitted identity with pinned out_shardings = a DEVICE-side relayout
        # copy.  ``jax.device_put(on_device_array, fmt)`` routes through the
        # host on the remote-execution backend — 8 GB over the tunnel,
        # measured ~19 s per headline chunk vs ~0.5 s here.
        As = _relayout_fn(str(fmt.layout), As.shape, str(As.dtype), donate,
                          None)(As)
    else:
        As = jax.device_put(As)
    if donate and isinstance(src, jax.Array) and src is not As:
        As.block_until_ready()
        try:
            src.delete()
        except Exception:  # already deleted / not deletable
            pass
    if low_dtype is None:
        return As
    # Cast with the output layout pinned: astype alone materializes a
    # default-layout intermediate that a relayout device_put would then
    # duplicate — a ~4 GB transient that can tip a 16 GB chip into OOM.
    if fmt is not None:
        As.block_until_ready()
        As_low = _relayout_fn(str(fmt.layout), As.shape, str(As.dtype),
                              False, jnp.dtype(low_dtype).name)(As)
    else:
        As_low = jax.device_put(As.astype(low_dtype))
    return As, As_low


# Relayout/cast executables cached per (layout, shape, dtype, donate, cast):
# a fresh jax.jit closure per call would retrace and re-compile on every
# chunk of a streamed ensemble (same pathology as _GATHER_CACHE below).
@functools.lru_cache(maxsize=64)
def _relayout_fn(layout_str, shape, dtype, donate, cast_to):
    def _fmt_now():
        from jax._src.layout import Layout as _Layout
        from jax.experimental.layout import Format
        from jax.sharding import SingleDeviceSharding
        ndim = len(shape)
        return Format(_Layout(major_to_minor=tuple(range(ndim))),
                      SingleDeviceSharding(jax.devices()[0]))

    fmt = _fmt_now()
    body = (lambda a: a) if cast_to is None else (lambda a: a.astype(cast_to))
    return jax.jit(body, out_shardings=fmt,
                   donate_argnums=(0,) if donate else ())


# Jitted row-gathers keyed by (layout, shape, dtype) so repeat fixups reuse
# the compiled executable — a fresh ``jax.jit`` per call would recompile
# every time (~0.4 s through the remote-compile path, measured).  The gather
# body is the shared layout-preserving per-row DMA (parallel/batch.py).
_GATHER_CACHE = {}


def _gather_rows(arr, idx):
    """Row-gather that preserves the array's (possibly custom) layout.

    XLA's gather lowering relayouts the whole stacked Hessian regardless of
    pinned input formats (7.8 GB copy + 2 GB bucket temps — OOM on a 16 GB
    chip, measured).  A ``lax.map`` of row ``dynamic_slice``s compiles to
    plain per-row DMA: zero HLO temp.
    """
    try:
        fmt = arr.format
        key = (str(fmt.layout), arr.shape, str(arr.dtype))
    except Exception:  # non-committed inputs / layout API drift
        fmt, key = None, (None, arr.shape, str(arr.dtype))
    fn = _GATHER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(_row_gather) if fmt is None else \
            jax.jit(_row_gather, in_shardings=(fmt, None), out_shardings=fmt)
        _GATHER_CACHE[key] = fn
    return fn(arr, idx)


@functools.lru_cache(maxsize=64)
def _fixup_fn(solver, cfg):
    """Cached jitted warm-started batched fixup solve."""
    fn = SOLVERS[solver][0]

    def run(A2, b2, x02, proj):
        return jax.vmap(lambda A, b, x0: fn(A, b, x0=x0, proj=proj,
                                            config=cfg))(A2, b2, x02)

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _ladder_fn(phase_a_solver, cfg_a, cfg_b, has_x0):
    """Build (and cache) the jitted two-phase ladder for a config triple."""
    fn_a = SOLVERS[phase_a_solver][0]
    fn_b = SOLVERS["pcg"][0]

    def run(As_low, As, bs, x0, proj):
        def one(A_lo, A, b, x0_i, proj_i):
            ra = fn_a(CastDense(A_lo), b, x0=x0_i, proj=proj_i, config=cfg_a)
            rb = fn_b(A, b, x0=ra.x, proj=proj_i, config=cfg_b)
            return dataclasses.replace(
                rb, matvecs=ra.matvecs + rb.matvecs,
                iterations=ra.iterations + rb.iterations)
        return jax.vmap(one, in_axes=(0, 0, 0, 0 if has_x0 else None, None)
                        )(As_low, As, bs, x0, proj)

    return jax.jit(run)


def solve_batched_mixed(As, bs, proj=None, config=None, *, As_low=None,
                        x0=None, phase_a_tol=5e-3, phase_a_budget=48,
                        phase_a_solver="bbpgd_f", polish_config=None,
                        fixup=True, fixup_solver="mprgp_bb",
                        fixup_bucket_min=16):
    """Solve a batch of dense QPs via the bf16 -> f32 precision ladder.

    As:            (B, n, n) float32 stacked Hessians — ideally from
                   ``prepare_dense_batch``.
    As_low:        optional pre-built bfloat16 copy (built on the fly, and
                   paid per call, if omitted).
    config:        full-precision SolverConfig: ``tol`` / ``max_matvecs`` are
                   the solve's true tolerance and (approximate) total budget.
    phase_a_tol:   bf16 self-reported stop tolerance.  Must sit at or above
                   the bf16 operator-error floor of the problem family
                   (default 5e-3; the TRUE residual handed to phase B is
                   floor-bound regardless of how much lower this is set).
    fixup:         host-side straggler compaction: lanes unconverged after
                   the polish are gathered into a power-of-two bucket and
                   finished with ``fixup_solver`` at full precision.  The
                   default is MPRGP-BB — robust on curved sets where the
                   BB-projection family limit-cycles (its 3x masked-branch
                   traffic is irrelevant at bucket scale).  DOCUMENTED
                   OVERSPEND: a lane entering fixup already exhausted
                   ``config.max_matvecs``; the fixup is a rescue pass with a
                   fresh budget of the same size (curved-set lanes frozen by
                   PCG's conservative mask burned their budget without
                   progress).  Reported ``matvecs`` honestly include the
                   overspend; pass ``fixup=False`` for a strict budget
                   contract.

    Returns a SolveResult; ``matvecs`` counts BOTH phases' operator
    applications (phase-A applications move half the bytes).  Residuals and
    convergence flags are always from full-precision operators.
    """
    if config is None:
        raise ValueError("config (full-precision SolverConfig) is required")
    As = jnp.asarray(As)
    bs = jnp.asarray(bs)
    if As_low is None:
        As_low = As.astype(jnp.bfloat16)

    cfg_a = SOLVERS[phase_a_solver][1](tol=float(phase_a_tol),
                                       max_matvecs=int(phase_a_budget),
                                       gd=config.gd)
    if polish_config is None:
        budget_b = int(config.max_matvecs) - int(phase_a_budget)
        if budget_b < 4:
            raise ValueError(
                f"phase_a_budget={phase_a_budget} leaves {budget_b} < 4 "
                f"matvecs for the polish phase of a "
                f"max_matvecs={config.max_matvecs} budget")
        polish_config = PCGConfig(tol=config.tol, max_matvecs=budget_b,
                                  gd=config.gd, trace_len=config.trace_len)

    # Both phases fused in one cached jit: a single dispatch, no host
    # round-trip between phases, no per-call vmap retracing.
    run = _ladder_fn(phase_a_solver, cfg_a, polish_config, x0 is not None)
    result = run(As_low, As, bs, x0, proj)

    if not fixup:
        return result

    # --- fixup: compact the stragglers, finish at full precision -----------
    cfg_f = SOLVERS[fixup_solver][1](tol=config.tol,
                                     max_matvecs=int(config.max_matvecs),
                                     gd=config.gd)

    def run2(A2, b2, x02, proj2, keys2):
        return _fixup_fn(fixup_solver, cfg_f)(A2, b2, x02, proj2)

    return host_compact_finish(run2, As, bs, result, proj,
                               bucket_min=fixup_bucket_min,
                               gather_A=_gather_rows)
