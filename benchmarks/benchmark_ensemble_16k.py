"""BASELINE.json config #4: 16k independent random n=1k box QPs.

16,384 stacked f32 Hessians are 64 GB — four chips' worth of HBM — so the
configuration is natively a ``solve_batched_sharded`` job over a pod slice
(each device solves its shard; zero collectives).  On ONE chip this script
streams the ensemble in chunks of 2048 (the largest resident batch with the
layout-pinned operand, half of HBM): generate chunk, solve chunk, next —
JAX's async dispatch overlaps the host-side bookkeeping with device compute.
Reported throughput counts the SOLVE phase (generation is reported
separately; the reference baseline in BASELINE.md is likewise solve-only).

Reference equivalent: 16,384 serial f64 numpy solves — ~104 s of solving at
its measured 157.7 solves/s, vs ~2.6 s here.

Run:  python benchmarks/benchmark_ensemble_16k.py [total] [chunk]
Writes benchmarks/results/ensemble_16k.json.
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

N = 1000
TOL = 2e-5
BUDGET = 500


def main(total=16384, chunk=2048, seed=0):
    total, chunk = int(total), int(chunk)
    proj = cq.box(-jnp.ones(N), jnp.ones(N))
    cfg = PCGConfig(tol=TOL, max_matvecs=BUDGET)
    keys = jax.random.split(jax.random.PRNGKey(int(seed)), total // chunk)

    # Warm-up: compile generation + solve once at the chunk shape.
    As, bs, _ = random_qp_batch(keys[0], chunk, N, jnp.float32,
                                diag_boost=1.0, chunk=256)
    As = prepare_dense_batch(As)
    r = solve_batched("pcg", As, bs, proj=proj, config=cfg)
    _ = float(jnp.sum(r.x))
    del As, bs, r

    gen_s = solve_s = 0.0
    solved = 0
    conv = []
    mv = []
    for k in keys:
        t0 = time.perf_counter()
        As, bs, _ = random_qp_batch(k, chunk, N, jnp.float32,
                                    diag_boost=1.0, chunk=256)
        As = prepare_dense_batch(As)          # blocks; old buffer donated
        t1 = time.perf_counter()
        r = solve_batched("pcg", As, bs, proj=proj, config=cfg)
        _ = float(jnp.sum(r.x))               # close the timing on host
        t2 = time.perf_counter()
        gen_s += t1 - t0
        solve_s += t2 - t1
        solved += chunk
        conv.append(np.asarray(r.converged))
        mv.append(np.asarray(r.matvecs))
        del As, bs, r                         # free HBM before next chunk

    conv = np.concatenate(conv)
    mv = np.concatenate(mv)
    row = {
        "total_problems": solved, "n": N, "chunk": chunk, "tol": TOL,
        "solve_s": round(solve_s, 3), "gen_s": round(gen_s, 3),
        "solves_per_s": round(solved / solve_s, 1),
        "end_to_end_per_s": round(solved / (solve_s + gen_s), 1),
        "convergence_rate": float(conv.mean()),
        "matvecs_median": int(np.median(mv)),
        "backend": jax.default_backend(),
    }
    print(json.dumps(row))
    OUT.mkdir(exist_ok=True)
    (OUT / "ensemble_16k.json").write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:])
