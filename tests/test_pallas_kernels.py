"""Pallas kernel correctness (interpret mode on CPU; the real lowering is
exercised on TPU by bench.py and the verify drive)."""
import numpy as np

import jax
import jax.numpy as jnp

from ccqppy_tpu.ops.pallas_kernels import (batched_gemv, fused_gradient_step,
                                           padded_batched_gemv)


def test_batched_gemv_interpret():
    rng = np.random.default_rng(0)
    B, n = 4, 256
    A = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    y = batched_gemv(A, x, interpret=True)
    ref = jnp.einsum("bij,bj->bi", A, x,
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-4)


def test_padded_batched_gemv_interpret():
    rng = np.random.default_rng(1)
    B, n = 3, 200   # not a multiple of 128
    A = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    y = padded_batched_gemv(A, x, interpret=True)
    ref = jnp.einsum("bij,bj->bi", A, x,
                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-4)


def test_fused_gradient_step_interpret():
    rng = np.random.default_rng(2)
    B, n = 2, 128
    G = rng.standard_normal((B, n, n))
    A = jnp.asarray(G @ np.transpose(G, (0, 2, 1)) + n * np.eye(n),
                    jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (B, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    g = jnp.einsum("bij,bj->bi", A, x) + b
    alpha = jnp.asarray(rng.uniform(1e-4, 1e-3, B), jnp.float32)
    lb = -jnp.ones((B, n), jnp.float32)
    ub = jnp.ones((B, n), jnp.float32)

    x1, g1, dxdx, dxdg = fused_gradient_step(A, b, x, alpha, g, lb, ub,
                                             interpret=True)

    x1_ref = jnp.clip(x - alpha[:, None] * g, lb, ub)
    g1_ref = jnp.einsum("bij,bj->bi", A, x1_ref,
                        precision=jax.lax.Precision.HIGHEST) + b
    dx = x1_ref - x
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1_ref), rtol=3e-5,
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(dxdx),
                               np.asarray(jnp.sum(dx * dx, axis=-1)),
                               rtol=1e-4, atol=1e-6)
