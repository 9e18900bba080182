"""Warm-started QP sequences — the time-stepping workload.

The reference's only resume mechanism is the ``x0`` argument
(``solvers.py:19,94``); this is also how real contact-mechanics pipelines
use CCQP solvers: at each time step the Hessian is fixed (or slowly
varying) and the rhs moves a little, so the previous step's solution is an
excellent start.  This script quantifies the warm-start payoff at batch
scale: B independent box QPs whose rhs drifts by a random walk over T
steps, solved cold (x0 = 0 every step) vs warm (x0 = previous solution).

Run:  python benchmarks/benchmark_warmstart_sequence.py [B] [n] [steps]
Writes benchmarks/results/warmstart_sequence.json.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import ccqppy_tpu as cq
from ccqppy_tpu.models import PCGConfig
from ccqppy_tpu.parallel import prepare_dense_batch, solve_batched
from ccqppy_tpu.utils.random_qp import random_qp_batch

OUT = pathlib.Path(__file__).resolve().parent / "results"

TOL = 2e-5
BUDGET = 500
DRIFT = 0.02        # rhs random-walk scale per step (relative)


def main(B=512, n=1000, steps=20, seed=0):
    B, n, steps = int(B), int(n), int(steps)
    As, bs, _ = random_qp_batch(jax.random.PRNGKey(int(seed)), B, n,
                                jnp.float32, diag_boost=1.0)
    As = prepare_dense_batch(As)
    proj = cq.box(-jnp.ones(n), jnp.ones(n))
    cfg = PCGConfig(tol=TOL, max_matvecs=BUDGET)
    bscale = float(jnp.mean(jnp.abs(bs)))

    def run(warm):
        key = jax.random.PRNGKey(int(seed) + 1)
        b = bs
        x0 = None
        mv_total = 0
        t_total = 0.0
        conv_all = True
        # Warm-up compile once outside the timed sequence — for BOTH jit
        # signatures the warm run uses (x0=None on step 1, x0=array after).
        r = solve_batched("pcg", As, b, x0=None, proj=proj, config=cfg)
        _ = float(jnp.sum(r.x))
        if warm:
            r = solve_batched("pcg", As, b, x0=jnp.zeros_like(b), proj=proj,
                              config=cfg)
            _ = float(jnp.sum(r.x))
        for t in range(steps):
            key, sub = jax.random.split(key)
            b = b + DRIFT * bscale * jax.random.normal(sub, b.shape, b.dtype)
            t0 = time.perf_counter()
            r = solve_batched("pcg", As, b, x0=x0, proj=proj, config=cfg)
            _ = float(jnp.sum(r.x))
            t_total += time.perf_counter() - t0
            mv_total += int(jnp.sum(r.matvecs))
            conv_all &= bool(jnp.all(r.converged))
            if warm:
                x0 = r.x
        return mv_total, t_total, conv_all

    mv_cold, t_cold, ok_cold = run(warm=False)
    mv_warm, t_warm, ok_warm = run(warm=True)

    row = {
        "B": B, "n": n, "steps": steps, "drift": DRIFT, "tol": TOL,
        "cold": {"matvecs_total": mv_cold, "wall_s": round(t_cold, 3),
                 "all_converged": ok_cold},
        "warm": {"matvecs_total": mv_warm, "wall_s": round(t_warm, 3),
                 "all_converged": ok_warm},
        "matvec_ratio_cold_over_warm": round(mv_cold / max(mv_warm, 1), 2),
        "speedup": round(t_cold / max(t_warm, 1e-9), 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(row))
    OUT.mkdir(exist_ok=True)
    (OUT / "warmstart_sequence.json").write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:])
