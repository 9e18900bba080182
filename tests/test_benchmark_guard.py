"""Timing-integrity guard (utils.benchmark.timed_run).

Round-3 post-mortem: a committed benchmark artifact recorded a wall 320x
too fast because its hand-rolled scalar fence leaked on the remote-execution
backend (VERDICT r3 weak #1).  These tests pin the guard that now fronts
every committed measurement: a synthetic wall implying ~100x the HBM
roofline must be rejected outright, a physically plausible one accepted.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ccqppy_tpu.utils.benchmark import (TimedRun, dense_sweep_bytes,
                                        materialize, timed_run)


def test_materialize_covers_every_leaf():
    tree = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 2)), jnp.int32(3)),
            "c": jnp.array([True, False])}
    # 0+1+2+3 floats + 4 ones + int 3 + bool sum 1
    assert materialize(tree) == pytest.approx(6.0 + 4.0 + 3 + 1)


def test_guard_rejects_physically_impossible_wall():
    # An instant function claiming to have moved 1 PB: implied bandwidth
    # ~1e6 GB/s >> 2x819 GB/s -> every rep rejected -> refuse to report.
    fn = lambda x: x + 1
    with pytest.raises(RuntimeError, match="roofline"):
        timed_run(fn, jnp.zeros(8), reps=3, implied_bytes=1e15)


def test_guard_rejects_100x_inflation_of_a_real_workload():
    # The round-3 failure shape: B=1024 n=999 at ~41 sweeps -> ~168 GB.
    # A 1.9 ms wall (the false committed number) implies ~88 TB/s.
    bytes_ = dense_sweep_bytes(1024, 999, 41)
    assert bytes_ / 0.0019 > 2 * 819e9          # the false wall IS absurd
    fn = lambda x: x * 2.0
    with pytest.raises(RuntimeError):
        timed_run(fn, jnp.zeros(16), reps=2, implied_bytes=bytes_)


def test_plausible_measurement_accepted():
    x = jnp.arange(1000.0)
    out = timed_run(lambda v: jnp.cumsum(v), x, reps=2, implied_bytes=8000)
    assert isinstance(out, TimedRun)
    assert out.wall_s > 0 and len(out.walls) == 2 and not out.rejected
    assert np.asarray(out.result).shape == (1000,)
    assert out.implied_gbps is not None


def test_make_args_threads_fresh_inputs():
    seen = []

    def make(rep):
        seen.append(rep)
        return (jnp.full(4, float(rep)),)

    out = timed_run(lambda v: v + 1, reps=2, make_args=make)
    assert seen == [-1, 0, 1]                   # warmup + 2 reps
    np.testing.assert_allclose(np.asarray(out.result), 2.0)


def test_fence_callable_defers_full_materialization():
    calls = {"fence": 0}

    def fence(out):
        calls["fence"] += 1
        return jnp.sum(out)

    res = timed_run(lambda v: v * 3.0, jnp.arange(8.0), reps=2, fence=fence)
    assert calls["fence"] == 2              # per timed rep (warmup is full)
    # the returned result is still the real full output, host-verified
    np.testing.assert_allclose(np.asarray(res.result), np.arange(8.0) * 3)
