"""segment_dense_sum (scatter-free TPU segment sum) vs .at[].add oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.ops.scatter import segment_dense_sum


def _check(M, T, F, seed, dtype=jnp.float32):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    idx = jax.random.randint(k1, (M,), 0, T, dtype=jnp.int32)
    upd = jax.random.normal(k2, (M, F), dtype)
    ref = jnp.zeros((T, F), dtype).at[idx].add(upd)
    got = segment_dense_sum(idx, upd, T, method="sort")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
    got = segment_dense_sum(idx, upd, T, method="scatter")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_basic():
    _check(1024, 128, 2, 0)


def test_more_rows_than_updates():
    _check(64, 1024, 2, 1)


def test_single_feature_and_many():
    _check(512, 64, 1, 2)
    _check(512, 64, 5, 3)


def test_all_same_index():
    idx = jnp.full((256,), 7, jnp.int32)
    upd = jnp.ones((256, 2))
    got = segment_dense_sum(idx, upd, 16, method="sort")
    assert float(got[7, 0]) == 256.0
    assert float(jnp.abs(got).sum()) == 512.0


def test_empty_rows_and_extremes():
    idx = jnp.array([0, 0, 15, 15, 15], jnp.int32)
    upd = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    got = segment_dense_sum(idx, upd, 16, method="sort")
    np.testing.assert_allclose(np.asarray(got[0]), [0 + 2, 1 + 3])
    np.testing.assert_allclose(np.asarray(got[15]), [4 + 6 + 8, 5 + 7 + 9])
    assert float(jnp.abs(got[1:15]).sum()) == 0.0


def test_jit_and_grad_free():
    # It's used inside a custom VJP backward: must jit cleanly.
    f = jax.jit(lambda i, u: segment_dense_sum(i, u, 64, method="sort").sum())
    idx = jax.random.randint(jax.random.PRNGKey(0), (128,), 0, 64)
    upd = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    assert np.isfinite(float(f(idx, upd)))
