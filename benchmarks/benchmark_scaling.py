"""Weak-scaling study: scenario-parallel solver throughput at 1..N devices.

North-star target (BASELINE.json): >= 85% iterations/s scaling from 1 chip
to 2 hosts.  The reference has nothing to port — its ensemble is a serial
Python loop (``/root/reference/benchmarks/benchmark_random_ccqp.py:76-102``).

Runs on whatever backend is live:

* this container: the single TPU chip exposes one device — run with
  ``--cpu`` for the 8-device virtual CPU mesh (same code path as a pod,
  minus the ICI);
* a real pod slice: run unchanged on every host after
  ``parallel.init_distributed()`` (argument-free on TPU pods); the scenario
  batch shards over the DCN axis of ``parallel.make_hybrid_mesh()`` so no
  iteration-critical collective crosses hosts.

Writes benchmarks/results/scaling.json and prints the table.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU backend")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("-n", type=int, default=256)
    ap.add_argument("--solver", default="pcg")
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call init_distributed() first")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    import jax

    from ccqppy_tpu.parallel.distributed import init_distributed, scaling_probe

    if args.distributed:
        init_distributed()

    rows = scaling_probe(batch_per_device=args.batch_per_device, n=args.n,
                         solver=args.solver, tol=args.tol)
    print(f"{'devs':>5} {'batch':>6} {'iters/s':>12} {'solves/s':>10} "
          f"{'eff':>6} {'conv':>6}")
    for r in rows:
        print(f"{r['devices']:>5} {r['batch']:>6} "
              f"{r['iterations_per_s']:>12.0f} {r['solves_per_s']:>10.1f} "
              f"{r['efficiency_vs_first']:>6.2f} {r['converged']:>6.2f}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out, exist_ok=True)
    meta = {"backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "n": args.n, "solver": args.solver, "tol": args.tol,
            "rows": rows}
    with open(os.path.join(out, "scaling.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote benchmarks/results/scaling.json")


if __name__ == "__main__":
    main()
