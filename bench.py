"""Headline benchmark: batched 1k-dim box-QP throughput on one TPU chip.

Workload (matched on both sides):
  B independent QPs, n=1000, A = G G^T + n I (well-conditioned Wishart,
  G ~ N(0,1)^{n x n}), b = -A x_uncon with x_uncon ~ U(-1,1)^n, box [-1,1]^n,
  tol 2e-5, 500-matvec budget.  Solved with the batched PCG face solver
  (models/pcg.py — branch-free projected CG, exactly one matvec of HBM
  traffic per iteration) on layout-pinned operands (parallel/mixed.py
  prepare_dense_batch).  Measured alternatives on the same ensemble: BBPGDf
  f32 6.0k, bf16+f32 ladder 5.9-6.8k, fused straggler compaction ~= plain
  (tunnel dispatch overhead); plain PCG 6.4-6.9k solves/s.

Baseline: the reference CCQPpy ``CCQPSolverBBPGDf`` (numpy f64, serial) on the
IDENTICAL ensemble definition, measured in this container on 2026-08-17:
157.7 solves/s (100% converged, 19.1 matvecs avg).  See BASELINE.md for the
raw-Wishart numbers (reference: 2.13 solves/s at tol 1e-5 f64; f32 TPU
iterates floor at residual ~2e-5 on that near-singular ensemble, hence the
conditioned workload + tol here — applied to BOTH sides).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_SOLVES_PER_S = 157.7   # measured: see module docstring

N = 1000
BATCH = 2048
TOL = 2e-5
BUDGET = 500
SEED = 0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ccqppy_tpu as cq
    from ccqppy_tpu.models import PCGConfig
    from ccqppy_tpu.parallel import prepare_dense_batch, solve_batched
    from ccqppy_tpu.utils.random_qp import random_qp_batch

    As, bs, _ = random_qp_batch(jax.random.PRNGKey(SEED), BATCH, N,
                                jnp.float32, diag_boost=1.0, chunk=256)
    As.block_until_ready()
    # Pin batch-major layout: without it XLA inserts a full relayout copy of
    # the stacked Hessians INSIDE the jit (+7.8 GB HBM, +16 GB traffic/call).
    As = prepare_dense_batch(As)

    proj = cq.box(-jnp.ones(N), jnp.ones(N))
    cfg = PCGConfig(tol=TOL, max_matvecs=BUDGET)

    def run(As, bs):
        return solve_batched("pcg", As, bs, proj=proj, config=cfg)

    # Warm-up: compile + first full solve (also absorbs any tunnel grant wait).
    r = run(As, bs)
    conv = float(np.mean(np.asarray(r.converged)))

    # Timed runs.  The axon remote-execution layer caches identical
    # dispatches, so each timed repetition perturbs b (the solve trajectory
    # changes; cost does not).  Timing is closed by materializing a scalar.
    times = []
    for rep in range(3):
        bs_rep = bs + (1e-4 * (rep + 1))
        t0 = time.perf_counter()
        r = run(As, bs_rep)
        _ = float(jnp.sum(r.x)) + float(jnp.max(r.matvecs))
        times.append(time.perf_counter() - t0)
    el = min(times)
    value = BATCH / el

    result = {
        "metric": f"batched {N}-dim box-QP solves/s (PCG, "
                  f"tol {TOL:g}, B={BATCH}, 1 TPU chip)",
        "value": round(value, 1),
        "unit": "solves/s",
        "vs_baseline": round(value / REFERENCE_SOLVES_PER_S, 2),
        "convergence_rate": conv,
        "wall_s": round(el, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
