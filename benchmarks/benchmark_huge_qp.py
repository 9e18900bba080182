"""BASELINE.json config #5: a single huge block-sparse QP (n up to 1M).

Dense storage at n=1M is 4 TB — impossible anywhere.  The block-sparse ELL
operator (``ops.linop.BlockSparseOperator``: block-tridiagonal SPD, 4x4
blocks, 3 blocks per block-row) holds the same problem in ~200 MB, and the
matvec is a static gather + batched small GEMM on the MXU.  On one chip this
script times the full PCG/BBPGDf solve; on a multi-device mesh the identical
problem row-shards via ``parallel.solve_sharded_blocksparse`` (one tiled
all-gather of x per iteration — exercised at small scale by
``__graft_entry__.dryrun_multichip`` and tests/test_parallel.py).

The reference has no sparse or large-n path at all (dense numpy only; its
benchmarks cap at n=36, ``benchmark_random_ccqp.py:188``).

Run:  python benchmarks/benchmark_huge_qp.py [n] [solver]
Writes benchmarks/results/huge_qp.json.
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
from ccqppy_tpu.models import SOLVERS
from ccqppy_tpu.ops.linop import BlockSparseOperator

OUT = pathlib.Path(__file__).resolve().parent / "results"

# Eq.25 normalizes by 3n, so a fixed tol weakens with dimension; 1e-9 at
# n=1M corresponds to a projected-gradient norm of 3e-3 (what 1e-5 means at
# n=3k).  The reference criterion is kept; only the target moves.
TOL = 1e-9
BUDGET = 10_000
BS = 4          # block size
K = 3           # blocks per block-row (tridiagonal)


def build_block_tridiag(n, seed=0, dtype=jnp.float32):
    """SPD block-tridiagonal ELL operator + consistent rhs, built directly in
    ELL layout (never materializes a dense matrix)."""
    nbr = n // BS
    rng = np.random.default_rng(seed)
    # Random symmetric structure: off-diagonal block B_i couples rows i,i+1.
    off = (0.35 * rng.standard_normal((nbr - 1, BS, BS))).astype(np.float32)
    diag = 0.35 * rng.standard_normal((nbr, BS, BS)).astype(np.float32)
    # Row-sum dominance keeps A SPD while leaving a nontrivial spectrum
    # (condition ~1e2; tens of CG iterations).
    diag = 0.5 * (diag + diag.transpose(0, 2, 1)) + 3.0 * np.eye(BS, dtype=np.float32)

    blocks = np.zeros((nbr, K, BS, BS), np.float32)
    cols = np.zeros((nbr, K), np.int32)
    # slot 0: left neighbor (transpose of its off block), slot 1: diagonal,
    # slot 2: right neighbor.  Edge rows pad with zero blocks pointing at 0.
    blocks[1:, 0] = off.transpose(0, 2, 1)
    cols[1:, 0] = np.arange(nbr - 1)
    blocks[:, 1] = diag
    cols[:, 1] = np.arange(nbr)
    blocks[:-1, 2] = off
    cols[:-1, 2] = np.arange(1, nbr)

    op = BlockSparseOperator(jnp.asarray(blocks, dtype), jnp.asarray(cols),
                             int(n))
    x_exact = jnp.asarray(rng.uniform(-0.5, 0.5, n), dtype)
    b = -op.matvec(x_exact)
    return op, b, x_exact


def main(n=1_000_000, solver="pcg", seed=0):
    n = int(n) // BS * BS
    op, b, x_exact = build_block_tridiag(n, int(seed))
    jax.block_until_ready(op.blocks)
    proj = cq.box(-jnp.ones(n), jnp.ones(n))
    fn, cfg_cls = SOLVERS[solver][0], SOLVERS[solver][1]
    cfg = cfg_cls(tol=TOL, max_matvecs=BUDGET)

    # Roofline-guarded shared harness (utils/benchmark.py); reps perturb b
    # with random noise well above the f32 ulp.  Conservative traffic
    # floor: 20 sweeps of the ELL blocks (PCG needs ~48).
    from ccqppy_tpu.utils.benchmark import timed_run
    ell_bytes = op.blocks.size * op.blocks.dtype.itemsize

    def mk(rep):
        k = jax.random.fold_in(jax.random.PRNGKey(9), rep + 1)
        return (b + 1e-4 * jax.random.normal(k, b.shape, b.dtype),)

    out = timed_run(lambda b_: fn(op, b_, proj=proj, config=cfg),
                    reps=3, make_args=mk, implied_bytes=20.0 * ell_bytes)
    el, r = out.wall_s, out.result
    err = float(jnp.linalg.norm(r.x - x_exact) / jnp.linalg.norm(x_exact))

    row = {
        "n": n, "solver": solver, "converged": bool(r.converged),
        "matvecs": int(r.matvecs), "iterations": int(r.iterations),
        "residual": float(r.residual), "rel_err_vs_exact": err,
        "wall_s": round(el, 4),
        "iters_per_s": round(int(r.iterations) / el, 1),
        "backend": jax.default_backend(),
        "operator_mb": round(op.blocks.size * op.blocks.dtype.itemsize / 1e6, 1),
    }
    print(json.dumps(row))
    OUT.mkdir(exist_ok=True)
    (OUT / "huge_qp.json").write_text(json.dumps(row, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:])
