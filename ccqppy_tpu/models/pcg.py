"""PCG — projected conjugate gradients with active-set restarts.

A solver the reference does not have, designed for the batched-TPU execution
model.  Motivation: MPRGP (models/mprgp.py) is the matvec-optimal polisher,
but under ``vmap`` its three-way ``lax.cond`` lowers to *both* branches
executing masked — ~3 matvecs of HBM traffic per iteration, which triples the
wall-clock of a batched ensemble even when the matvec COUNT is low (measured
0.53 s vs 0.28 s on the headline B=2048, n=1000 ensemble).  PCG is the
branch-free reformulation: every iteration costs exactly ONE matvec of
bandwidth, in or out of ``vmap``.

Algorithm (per iteration, state ``x`` feasible, ``g = A x + b`` exact):

1. ``Ap = A p``                                   (the only matvec)
2. ``alpha = min(alpha_cg, alpha_feasible)`` with ``alpha_cg = r.r / p.(m*Ap)``
   and the exact closed-form max feasible step of the projection algebra
   (``Projection.max_feasible_step`` — the reference bisects instead,
   ``/root/reference/src/ccqppy/solvers.py:1112-1118``).
3. ``x += alpha p``; ``g += alpha Ap``            (gradient stays EXACT)
4. Refresh the binding mask ``m = proj.binding_mask(x, g)`` — free since no
   matvec is needed; bounds release the moment their gradient sign flips
   (MPRGP needs a proportioning matvec for the same effect).
5. ``r = -m * g``; restart CG (``beta = 0``) whenever the active set changed
   or the step hit a bound, else standard Fletcher-Reeves update.

Because the gradient carry is exact, the Eq. 25 convergence check is honest
at every iteration; there is no silent mask-staleness failure mode (a frozen
active set would falsely report convergence on ~9%% of Wishart box lanes —
measured).  Restricted to sets with a meaningful per-coordinate binding mask
(identity / bounds / box and blockwise/product compositions); on curved sets
(ball, cone) the conservative default mask freezes boundary lanes, which then
exit at the matvec budget and should be finished by a fallback solver — the
``parallel.mixed`` pipeline does exactly that.

Uses: (a) standalone first-order solver — on box ensembles it reaches tol in
fewer matvecs than BBPGD; (b) warm-started polish phase of the
mixed-precision ladder (``parallel/mixed.py``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ccqppy_tpu.models.base import (SolverConfig, default_x0, eps_of,
                                    init_trace, make_result, pg_residual,
                                    record_trace)
from ccqppy_tpu.ops.linop import as_operator
from ccqppy_tpu.ops.projections import identity


@dataclasses.dataclass(frozen=True)
class PCGConfig(SolverConfig):
    pass


class _State(NamedTuple):
    x: jax.Array
    g: jax.Array
    m: jax.Array        # binding mask (1 = coordinate free to move)
    r: jax.Array        # face-restricted steepest descent -m*g
    p: jax.Array        # conjugate direction (supported on the free set)
    rr: jax.Array
    res: jax.Array
    mv: jax.Array
    it: jax.Array
    done: jax.Array
    trace: jax.Array


def _solve(A, b, x0, proj, config):
    op = as_operator(A)
    b = jnp.asarray(b)
    proj = proj if proj is not None else identity()
    if not proj.polyhedral:
        # Curved sets break the two PCG invariants (exact feasible steps and
        # a meaningful per-coordinate binding mask): from a cone apex every
        # descent direction can have max_feasible_step 0, stalling the loop
        # at the initial iterate for the whole budget (measured on the n=10k
        # cone benchmark).  ``proj``'s structure is trace-static, so this
        # delegates at compile time to MPRGP-BB — the robust curved-set
        # solver (100% convergence on the Wishart cone ensembles where the
        # BB-projection family limit-cycles: projection onto a curved set
        # breaks the BB secant pair, stalling BBPGD/BBPGDf on 47-89% of
        # lanes at tol 1e-5; benchmarks/results/disjoint_constraints.json).
        from ccqppy_tpu.models import mprgp
        cfg = mprgp.MPRGPBBConfig(tol=config.tol,
                                  max_matvecs=config.max_matvecs,
                                  gd=config.gd, trace_len=config.trace_len)
        return mprgp._solve(op, b, x0, proj, cfg, bb_variant=True)
    x0 = default_x0(b, x0, proj)
    tiny = eps_of(b)

    g0 = op.matvec(x0) + b
    m0 = proj.binding_mask(x0, g0)
    r0 = -m0 * g0
    rr0 = op.dot(r0, r0)
    res0 = pg_residual(proj, x0, g0, config.gd, op)
    s0 = _State(x=x0, g=g0, m=m0, r=r0, p=r0, rr=rr0, res=res0,
                mv=jnp.int32(1), it=jnp.int32(0),
                done=(res0 < config.tol) | (1 >= config.max_matvecs),
                trace=init_trace(config, b.dtype))

    def cond(s):
        return ~s.done

    def body(s):
        Ap = op.matvec(s.p)
        mv = s.mv + 1
        mAp = s.m * Ap
        pAp = op.dot(s.p, mAp)
        alpha_cg = s.rr / (pAp + tiny)
        # max_feasible_step is defined for steps x - a*q; we move along +p.
        alpha_f = op.reduce_min(proj.max_feasible_step(s.x, -s.p))
        alpha = jnp.minimum(alpha_cg, jnp.maximum(alpha_f, 0.0))
        # project() only clears fp dust: the step is feasible by construction.
        x = proj.project(s.x + alpha * s.p)
        g = s.g + alpha * Ap
        m = proj.binding_mask(x, g)
        changed = jnp.any(m != s.m)
        r = -m * g
        rr = op.dot(r, r)
        restart = changed | (alpha_f < alpha_cg)
        beta = jnp.where(restart, 0.0, rr / (s.rr + tiny))
        p = r + beta * s.p
        res = pg_residual(proj, x, g, config.gd, op)
        # rr == 0 (exactly: r = -m*g is a masked copy, so a fully-frozen mask
        # zeroes it bit-exactly) with res >= tol: no direction is left to
        # move in — stalled.  The test must be exact, not a tiny-threshold:
        # rr is a SQUARED norm, so near-convergence gradients legitimately
        # pass below any absolute epsilon (a 10*eps threshold falsely
        # stalled f64 solves one iteration short of a 1e-10 tol).
        done = (res < config.tol) | (mv >= config.max_matvecs) | (rr == 0)
        return _State(x, g, m, r, p, rr, res, mv, s.it + 1, done,
                      record_trace(s.trace, s.it, res))

    s = lax.while_loop(cond, body, s0)
    result = make_result(s.x, s.res, s.mv, s.it, config.max_matvecs, s.trace)
    # make_result's budget semantics (converged := mv < max) would mislabel
    # the stagnation exit above as converged.  Report the honest criterion —
    # equivalent on the tol/budget exits, False on stagnation — so downstream
    # fixup passes (parallel/mixed.py selects stragglers by ~converged)
    # re-solve stalled lanes instead of trusting them.
    return dataclasses.replace(result, converged=s.res < config.tol)


@partial(jax.jit, static_argnames=("config",))
def solve(A, b, x0=None, proj=None, config: PCGConfig = PCGConfig()):
    """Projected CG with active-set restarts (TPU-native; no reference
    counterpart — see module docstring)."""
    return _solve(A, b, x0, proj, config)
