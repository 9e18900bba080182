"""Pallas kernel correctness (interpret mode on CPU; the real lowering is
exercised on TPU by bench.py and the verify drive)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccqppy_tpu.ops.pallas_kernels import batched_gemv, padded_batched_gemv


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


def _sym_batch(B=3, n=512, seed=4):
    rng = np.random.default_rng(seed)
    G = rng.standard_normal((B, n, n))
    A = jnp.asarray(G + np.transpose(G, (0, 2, 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    ref = np.einsum("bij,bj->bi", np.asarray(A, np.float64),
                    np.asarray(x, np.float64))
    return A, x, ref


def test_batched_gemv_bf16_interpret():
    """bf16-resident A: f32 accumulation, ~2^-8 relative operator error."""
    from ccqppy_tpu.ops.pallas_kernels import batched_gemv
    A, x, ref = _sym_batch()
    y = batched_gemv(A.astype(jnp.bfloat16), x, interpret=True)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(y) - ref).max() / scale < 2e-2


@pytest.mark.parametrize("tile", [128, 256])
def test_batched_symv_matches_gemv(tile):
    """Upper-triangle-streaming symv == full GEMV (exact math, half bytes)."""
    from ccqppy_tpu.ops.pallas_kernels import batched_symv
    A, x, ref = _sym_batch()
    y = batched_symv(A, x, tile=tile, interpret=True)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(y) - ref).max() / scale < 1e-5


@pytest.mark.parametrize("tile", [128, 256])
def test_symv_packed_matches_gemv(tile):
    from ccqppy_tpu.ops.pallas_kernels import (batched_symv_packed,
                                               pack_symmetric, symv_packed)
    A, x, ref = _sym_batch()
    Ap = pack_symmetric(A, tile=tile)
    nt = A.shape[-1] // tile
    assert Ap.shape[1] == nt * (nt + 1) // 2
    scale = np.abs(ref).max()
    y = batched_symv_packed(Ap, x, interpret=True)
    assert np.abs(np.asarray(y) - ref).max() / scale < 1e-5
    # single-problem form composes with vmap
    yv = jax.vmap(lambda a, xx: symv_packed(a, xx, interpret=True))(Ap, x)
    assert np.abs(np.asarray(yv) - ref).max() / scale < 1e-5
