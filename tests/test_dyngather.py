"""Semantics + TPU-lowering checks for ops/dyngather.py.

Interpret mode verifies tpu.dynamic_gather semantics on CPU; the lowering
test catches the Mosaic _gather_lowering_rule shape contract (indices shape
== table shape) drifting under a jax upgrade — hardware timing lives in
tools_probe_dyngather.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.ops.dyngather import (
    dyngather_plan,
    dyngather_rows,
    dyngather_supported,
)
from neus2_tpu.ops import dyngather as dyngather_mod


@pytest.mark.parametrize("T,F,M", [
    (256, 2, 1024),    # k=4 exact multiple (the production shape ratio)
    (256, 4, 100),     # M < T (pad to one call)
    (512, 8, 1000),    # pad to 2 calls, wide rows
])
def test_dyngather_matches_take(T, F, M):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T, jnp.int32)
    out = dyngather_rows(table, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_dyngather_bf16():
    table = jax.random.normal(jax.random.PRNGKey(0), (128, 2)).astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (512,), 0, 128, jnp.int32)
    out = dyngather_rows(table, idx, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(table, np.float32)[np.asarray(idx)]
    )


def test_supported_predicate():
    # flagship hashed level: fits only as a bf16 table (reference parity —
    # my_tcnn stores the grid in half precision)
    assert dyngather_supported(1 << 19, 2, jnp.bfloat16)
    assert not dyngather_supported(1 << 19, 2, jnp.float32)
    assert not dyngather_supported(1 << 19, 8)        # fp32 F=8 blows VMEM
    assert not dyngather_supported(1 << 19 | 4, 2)    # non-8-aligned rows
    # wider-row configs fall back to feature slices
    assert dyngather_plan(1 << 19, 2, jnp.bfloat16) == 2
    assert dyngather_plan(1 << 19, 4, jnp.bfloat16) == 2   # tpu_opt: halves
    assert dyngather_plan(1 << 19, 8, jnp.bfloat16) == 2   # l4f8: quarters
    assert dyngather_plan(1 << 19 | 4, 2, jnp.bfloat16) is None


def test_split_slices_match_take(monkeypatch):
    """Force the feature-slice path at a small shape by shrinking the VMEM
    budget; the sliced gather must equal the monolithic one."""
    T, F, M = 512, 8, 700
    table = jax.random.normal(jax.random.PRNGKey(0), (T, F), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T, jnp.int32)
    # budget that admits (T,2) slices but not (T,8): table+2*(idx+out) bytes
    monkeypatch.setattr(
        dyngather_mod, "_VMEM_BUDGET", 512 * (2 * 4 + 2 * (4 + 2 * 4))
    )
    assert dyngather_plan(T, F) == 2
    out = dyngather_rows(table, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])


@pytest.mark.parametrize("F,dtype", [(2, jnp.float32), (4, jnp.float32),
                                     (8, jnp.bfloat16)])
def test_lowering_contract_holds(F, dtype):
    """Cross-platform lowering on CPU exercises the Mosaic gather rule
    without hardware; a jax upgrade that breaks the indices-shape contract
    fails here instead of at the first TPU run."""
    T = 1 << 13
    table = jnp.zeros((T, F), dtype)
    idx = jnp.zeros((4 * T,), jnp.int32)
    jax.jit(
        lambda t, i: dyngather_rows(t, i)
    ).trace(table, idx).lower(lowering_platforms=("tpu",))
