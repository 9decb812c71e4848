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


# ---------------------------------------------------------------------------
# sorttile: sort + Pallas tile reduce (ops/segment_tile.py)
# ---------------------------------------------------------------------------


def _sorttile_check(M, T, F, seed, row_block=256, pack=True):
    from neus2_tpu.ops.segment_tile import segment_sum_sorttile

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    idx = jax.random.randint(k1, (M,), 0, T, dtype=jnp.int32)
    upd = jax.random.normal(k2, (M, F), jnp.float32)
    ref = jnp.zeros((T, F)).at[idx].add(upd)
    got = segment_sum_sorttile(
        idx, upd, T, row_block=row_block, pack=pack, interpret=True
    )
    tol = 0.05 if pack else 1e-5  # bf16 payload ~ reference fp16 atomics
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=tol)


def test_sorttile_uniform():
    _sorttile_check(1 << 13, 1 << 11, 2, 0)


def test_sorttile_fp32_exact():
    _sorttile_check(1 << 12, 1 << 11, 2, 1, pack=False)


def test_sorttile_f4():
    _sorttile_check(1 << 12, 1 << 11, 4, 2)


def test_sorttile_edge_rows():
    """First/last rows, empty tiles, and duplicate-heavy rows."""
    from neus2_tpu.ops.segment_tile import segment_sum_sorttile

    idx = jnp.array([0] * 50 + [511] * 30 + [512] * 20 + [2047] * 28, jnp.int32)
    upd = jnp.ones((128, 2), jnp.float32)
    got = segment_sum_sorttile(
        idx, upd, 2048, row_block=512, pack=False, interpret=True
    )
    assert float(got[0, 0]) == 50.0
    assert float(got[511, 0]) == 30.0
    assert float(got[512, 0]) == 20.0
    assert float(got[2047, 0]) == 28.0
    assert float(jnp.abs(got).sum()) == 2 * 128.0


def test_sorttile_overflow_check():
    from neus2_tpu.ops.segment_tile import debug_overflow_check

    # Concentrated load (dense-coarse-level pattern) must be detectable.
    idx = jnp.zeros((4096,), jnp.int32)
    assert int(debug_overflow_check(idx, 2048, 512)) == 4096


def test_auto_routes_by_hint():
    """uniform_hint routes to sorttile on TPU only; CPU keeps scatter."""
    idx = jax.random.randint(jax.random.PRNGKey(0), (512,), 0, 4096)
    upd = jax.random.normal(jax.random.PRNGKey(1), (512, 2))
    ref = jnp.zeros((4096, 2)).at[idx].add(upd)
    got = segment_dense_sum(idx, upd, 4096, method="auto", uniform_hint=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_large_m_accuracy():
    """ADVICE round 1: quantify cumsum-differencing cancellation at scale.

    The "sort" path recovers row sums from differences of a global fp32
    cumsum over M=2^20 updates; verify against an fp64 oracle that the
    worst-case absolute error stays below bf16-payload quantization (the
    precision the reference's fp16 atomics already accept)."""
    rng = np.random.default_rng(0)
    M, T = 1 << 20, 1 << 13
    idx = jnp.asarray(rng.integers(0, T, size=M), jnp.int32)
    upd_np = rng.standard_normal((M, 2), dtype=np.float32)
    ref64 = np.zeros((T, 2), np.float64)
    np.add.at(ref64, np.asarray(idx), upd_np.astype(np.float64))
    got = segment_dense_sum(jnp.asarray(idx), jnp.asarray(upd_np), T, method="sort")
    err = np.abs(np.asarray(got, np.float64) - ref64).max()
    # Mean row load = 128 -> row sums O(10); fp32 prefix magnitudes O(1e3).
    # Documented bound: absolute error < 0.05 (bf16 payload rounding of the
    # sorttile path is the same order).
    assert err < 0.05, err


def test_segment_dense_sum_multi_matches_scatter():
    """All-levels dispatcher == per-level scatter (CPU exact path), and the
    packed Pallas path (interpret mode) matches to bf16 payload precision."""
    import numpy as np

    from neus2_tpu.ops.scatter import segment_dense_sum_multi
    from neus2_tpu.ops.segment_tile import segment_sum_all_levels

    rng = np.random.default_rng(3)
    sizes = [512, 1728, 4096]
    M, F = 4096, 2
    idx_list = [
        jnp.asarray(rng.integers(0, s, M), jnp.int32) for s in sizes
    ]
    upd_list = [
        jnp.asarray(rng.normal(size=(M, F)).astype(np.float32))
        for _ in sizes
    ]
    outs = segment_dense_sum_multi(idx_list, upd_list, sizes)  # auto: scatter
    for l, s in enumerate(sizes):
        ref = np.zeros((s, F), np.float32)
        np.add.at(ref, np.asarray(idx_list[l]), np.asarray(upd_list[l]))
        np.testing.assert_allclose(np.asarray(outs[l]), ref, atol=1e-4)

    packed = segment_sum_all_levels(
        idx_list, upd_list, sizes, row_block=256, chunk=256, interpret=True
    )
    for l, s in enumerate(sizes):
        ref = np.zeros((s, F), np.float32)
        u = np.asarray(
            jnp.asarray(upd_list[l]).astype(jnp.bfloat16).astype(jnp.float32)
        )
        np.add.at(ref, np.asarray(idx_list[l]), u)
        a = np.asarray(packed[l])
        assert np.abs(a - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5


def test_sorttile_f8():
    """F=8 payload (4 packed-bf16 int32 operands) — the wider-row L4F8
    candidate config's backward path."""
    _sorttile_check(1 << 12, 1 << 11, 8, 4)
