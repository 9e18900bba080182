"""Batched 1k-dim CONE-constrained QP throughput — the cone half of the
north-star workload ("batched 1k-dim box/cone QPs", BASELINE.json).

Workload: B independent QPs, n=999 (333 Lorentz-cone blocks of dim 3,
mu=1), conditioned Wishart A = G G^T + n I, b = -A x_uncon, tol 1e-5,
matching the disjoint-family structure of the reference's cone study
(``/root/reference/benchmarks/benchmark_random_ccqp.py:201-211``) at
headline scale instead of n<=12.

Solver: MPRGP-BB — the robust curved-set solver (PCG statically delegates
to it on cones; the BB-projection family stalls on 48-89% of cone lanes,
benchmarks/results/disjoint_constraints.json).  Under vmap its three-way
branch executes masked on every lane, so a cone sweep moves ~3 matvecs of
HBM traffic — the cone ensemble's structural cost over the box ensemble.

Reference counterpart measured in this container (BASELINE.md method,
CCQPSolverMPRGP f64 serial on the identical ensemble definition): the
reference has no working cone projection at all (its ConeProjOp is flagged
bugged in its own source), so the honest baseline is the box-family
reference throughput 157.7 solves/s.

Writes benchmarks/results/cone_ensemble.json.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).resolve().parent / "results"

N = 999            # 333 cone blocks
BATCH = 1024
TOL = 1e-5
BUDGET = 2000
REPS = 3


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ccqppy_tpu.models import SOLVERS
    from ccqppy_tpu.models.base import pg_residual
    from ccqppy_tpu.ops import projections as P
    from ccqppy_tpu.ops.linop import DenseOperator
    from ccqppy_tpu.parallel import prepare_dense_batch, solve_batched
    from ccqppy_tpu.utils.random_qp import random_qp_batch

    As, bs, _ = random_qp_batch(jax.random.PRNGKey(0), BATCH, N,
                                jnp.float32, diag_boost=1.0, chunk=256)
    As.block_until_ready()
    As = prepare_dense_batch(As)
    proj = P.blockwise(P.lorentz_cone(1.0), 3)

    res_audit = jax.jit(jax.vmap(
        lambda A, b, x: pg_residual(proj, x,
                                    DenseOperator(A).matvec(x) + b,
                                    1e-6, DenseOperator(A))))

    rows = []
    for name in ("mprgp_bb", "spg"):
        fn, cfg_cls = SOLVERS[name]
        kwargs = {"tol": TOL, "max_matvecs": BUDGET}
        if name == "spg":
            kwargs["criterion"] = "eq25"   # honest stop on curved sets
        cfg = cfg_cls(**kwargs)

        def run(b, _fn=fn, _cfg=cfg, _name=name):
            kw = {}
            if _name == "spg":
                kw["keys"] = jax.random.split(jax.random.PRNGKey(1), BATCH)
            return solve_batched(_name, As, b, proj=proj, config=_cfg, **kw)

        # Timing closed by HOST SCALAR MATERIALIZATION (float(sum)) — on the
        # remote-execution backend block_until_ready can return before the
        # computation actually finishes (measured: 3 ms "walls" for a
        # 0.65 s solve), so only a host transfer is a reliable fence.
        # Perturbations are random noise at ~1e-3 |b| scale: uniform scalar
        # shifts below the f32 ulp of |b| ~ 1e3 leave most entries bitwise
        # unchanged.
        r = run(bs)
        _ = float(jnp.sum(r.x))
        walls, last, key = [], r, jax.random.PRNGKey(2)
        b2 = bs
        for rep in range(REPS):
            key, sub = jax.random.split(key)
            b2 = bs + 1e-3 * jax.random.normal(sub, bs.shape, bs.dtype)
            b2.block_until_ready()
            t0 = time.perf_counter()
            last = run(b2)
            _ = float(jnp.sum(last.x))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        tres = np.asarray(res_audit(As, b2, last.x))
        row = {
            "solver": name, "n": N, "B": BATCH, "tol": TOL,
            "wall_s": round(wall, 4),
            "solves_per_s": round(BATCH / wall, 1),
            "converged": float(np.mean(np.asarray(last.converged))),
            "matvecs_p50": float(np.median(np.asarray(last.matvecs))),
            "matvecs_max": int(np.max(np.asarray(last.matvecs))),
            "true_residual_max": float(tres.max()),
        }
        rows.append(row)
        print(f"{name:<9} {row['solves_per_s']:8.1f} solves/s "
              f"(conv {row['converged']:.3f}, p50 {row['matvecs_p50']:.0f} mv, "
              f"true res max {row['true_residual_max']:.2e})")

    OUT.mkdir(exist_ok=True)
    meta = {"backend": jax.default_backend(),
            "workload": f"B={BATCH} n={N} Lorentz-cone (333 x dim-3, mu=1) "
                        f"QPs, conditioned Wishart, tol {TOL:g}",
            "rows": rows}
    (OUT / "cone_ensemble.json").write_text(json.dumps(meta, indent=1))
    print("wrote benchmarks/results/cone_ensemble.json")


if __name__ == "__main__":
    main()
