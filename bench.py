"""Headline benchmark: batched 1k-dim box-QP throughput on one TPU chip.

Workload (matched on both sides):
  B independent QPs, n=1000, A = G G^T + n I (well-conditioned Wishart,
  G ~ N(0,1)^{n x n}), b = -A x_uncon with x_uncon ~ U(-1,1)^n, box [-1,1]^n,
  tol 2e-5, 500-matvec budget.

Round-3 configuration (each step measured on chip — docs/benchmarks.md):
  * flagship PCG face solver (models/pcg.py): exactly one HBM sweep of A per
    iteration; a 10-sweep GEMV chain runs at 10.6 ms/sweep at B=2048
    (775 GB/s, ~95% of v5e paper HBM peak), the full solver body at ~11.7;
  * Jacobi warm start x0 = clip(-b / diag A, bounds), computed per call from
    the incoming b (one cheap fused elementwise kernel);
  * single-dispatch straggler compaction (solve_batched_fused_compact,
    phase1=16 sweeps, bucket=256): the batched while-loop otherwise runs
    every lane to the SLOWEST lane's 22+ sweeps; the sweep distribution is
    p50=15 / p95=17 / max=22, so a 256-lane bucket covers the ~110
    stragglers past 16 sweeps with 2x headroom;
  * PIPELINED dispatch timing: the axon remote-execution tunnel costs
    ~160 ms of host-side overhead per large dispatch (measured: identical
    solve 415 ms single vs 257 ms/call queued back-to-back).  Real serving
    streams batches, so the headline is steady-state: K=5 perturbed batches
    dispatched back-to-back, one sync, wall/K.  The single-dispatch number
    is reported alongside (round 3: ~9.4k vs ~10.3k solves/s).
  Measured ladder on the same ensemble: plain batched PCG (no compaction)
  7.9k; round-2 config (bucket=512, single-dispatch) 7.9k; this
  configuration 10.3k.  The bf16 rr-PCG ladder OOMs at B=2048 (f32 + bf16
  copies = 12.3 GB resident); see benchmarks/results/illcond.json for the
  ensemble family where it wins at smaller B.

Baseline: the reference CCQPpy ``CCQPSolverBBPGDf`` (numpy f64, serial) on
the IDENTICAL ensemble definition, measured in this container on 2026-08-17:
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
PHASE1 = 17        # p50 sweep count + the verification sweep (round 4:
                   # PCG verifies every convergence claim with a fresh
                   # gradient — see models/pcg.py; at 16 the verified
                   # distribution overflows the bucket: 570 lanes past 16)
BUCKET = 256       # ~2x the expected straggler count at PHASE1
PIPELINE = 5       # back-to-back dispatches per timed measurement


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ccqppy_tpu as cq
    from ccqppy_tpu.models import PCGConfig
    from ccqppy_tpu.parallel import (prepare_dense_batch,
                                     solve_batched_fused_compact)
    from ccqppy_tpu.utils.random_qp import random_qp_batch

    As, bs, _ = random_qp_batch(jax.random.PRNGKey(SEED), BATCH, N,
                                jnp.float32, diag_boost=1.0, chunk=256)
    As.block_until_ready()
    # Pin batch-major layout: without it XLA inserts a full relayout copy of
    # the stacked Hessians INSIDE the jit (+7.8 GB HBM, +16 GB traffic/call).
    As = prepare_dense_batch(As)

    proj = cq.box(-jnp.ones(N), jnp.ones(N))
    cfg = PCGConfig(tol=TOL, max_matvecs=BUDGET)
    # Jacobi warm start: the diagonal guess, projected onto the box.  The
    # diagonal is a property of the (fixed) ensemble; the per-call x0 is
    # recomputed from each incoming b inside the timed region.
    diag = jnp.diagonal(As, axis1=-2, axis2=-1)
    diag.block_until_ready()
    jacobi_x0 = jax.jit(lambda b: jnp.clip(-b / diag, -1.0, 1.0))

    def run(b):
        # host_fallback=False: the bucket is sized so phase 2 never
        # overflows on this ensemble (warm-up asserts conv == 1.0 below);
        # the host-side fallback's converged-flag round trip costs a ~30 ms
        # tunnel RTT per call, and flags stay honest either way.
        return solve_batched_fused_compact(
            "pcg", As, b, PHASE1, x0=jacobi_x0(b), proj=proj, config=cfg,
            bucket=BUCKET, host_fallback=False)

    # Warm-up: compile + first full solve (also absorbs any tunnel grant
    # wait), asserting every lane converged within the budget.
    r = run(bs)
    conv = float(np.mean(np.asarray(r.converged)))
    assert conv == 1.0, f"warm-up convergence {conv} != 1.0"

    # Single-dispatch wall through the shared roofline-guarded harness
    # (utils/benchmark.py timed_run): full-output materialization fence,
    # walls implying > 2x the 819 GB/s HBM peak rejected, and EVERY timed
    # rep's convergence asserted (not just the warm-up's).  Perturbations
    # are random noise — a uniform scalar shift of 1e-4 falls below the
    # f32 ulp of |b| ~ 1e3 and leaves most entries bitwise unchanged.
    from ccqppy_tpu.utils.benchmark import (dense_sweep_bytes, materialize,
                                            timed_run)

    def perturbed(tag, rep):
        k = jax.random.fold_in(jax.random.PRNGKey(tag), rep + 1)
        return bs + 1e-3 * jax.random.normal(k, bs.shape, bs.dtype)

    def check(r_):
        c = float(np.mean(np.asarray(r_.converged)))
        assert c == 1.0, f"timed rep convergence {c} != 1.0"

    # Conservative traffic floor: 10 full-batch f32 sweeps (p50 is ~16).
    # In-clock fence: a dependent-program checksum of the solutions (the
    # full outputs are materialized and convergence-checked outside the
    # clock) — billing the tunnel's ~0.27 s transfer of the 8 MB solution
    # array as compute would mismeasure the device (see timed_run docs).
    checksum = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    implied = dense_sweep_bytes(BATCH, N, 10)
    out = timed_run(run, reps=3, implied_bytes=implied,
                    make_args=lambda rep: (perturbed(11, rep),),
                    warmup=False, check=check,
                    fence=lambda r_: checksum(r_.x))
    single = out.wall_s

    # Steady-state (headline): PIPELINE perturbed batches dispatched
    # back-to-back, one sync.  Overlaps the ~160 ms/dispatch tunnel overhead
    # with device execution — the serving-throughput number.
    # Same checksum fence as the single-dispatch measurement; the
    # roofline guard + the POST-clock full materialization & convergence
    # check of every batch keep the number honest.
    walls = []
    outs = []
    for trial in range(2):
        bs_l = [perturbed(100 + trial, i) for i in range(PIPELINE)]
        for b_ in bs_l:
            b_.block_until_ready()
        t0 = time.perf_counter()
        outs = [run(b_) for b_ in bs_l]
        cs = float(checksum(outs[-1].x))
        wall = (time.perf_counter() - t0) / PIPELINE
        assert cs > 0.0
        assert wall > implied / (2 * 819e9), "pipelined wall under roofline"
        walls.append(wall)
    el = min(walls)
    for r_ in outs:      # every timed batch of the reported trial converged
        materialize(r_)
        check(r_)
    value = BATCH / el

    result = {
        "metric": f"batched {N}-dim box-QP solves/s (PCG + jacobi x0 + "
                  f"fused straggler compaction, tol {TOL:g}, B={BATCH}, "
                  f"1 TPU chip, steady-state pipelined dispatch)",
        "value": round(value, 1),
        "unit": "solves/s",
        "vs_baseline": round(value / REFERENCE_SOLVES_PER_S, 2),
        "convergence_rate": conv,
        "wall_s": round(el, 4),
        "single_dispatch_wall_s": round(single, 4),
        "single_dispatch_solves_per_s": round(BATCH / single, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
