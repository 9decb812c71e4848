"""Fast hash-grid encoding with analytic Jacobian and a hand-built VJP.

This is the TPU performance path for the multiresolution hash grid.  Design
rationale (measured on v5e, see git history):

  * XLA:TPU serializes random gathers at ~2-6 ns/row and scatters at
    ~17-60 ns/update; the naive autodiff path (ops/hashgrid.py) issues
    multiple gather/scatter passes (primal + tangents + transpose) and lands
    at ~1.9 s/step at the 2^18-sample batch.  This module issues exactly ONE
    gather pass and ONE scatter pass per training step.
  * The encoding returns both features and the analytic spatial Jacobian
    d(features)/dx — the same trick as the reference's in-forward ``dy_dx``
    cache (reference: my_tcnn grid.h:175-369 kernel_grid with dy_dx output).
    The NeuS normal is then *first order* in the Jacobian output, so the
    eikonal loss needs no grad-of-grad through the gathers; the hand-built
    VJP below covers precisely the contractions the reference implements as
    its three second-order kernels (grid.h:881 d(dL/dx)->dGrid, 1010
    d(dL/dx)->dx, 1183 d(dL/dx)->d(dL/dy)).
  * Tables are kept as a per-level pytree (tuple of (T_l, F) arrays): small
    tables gather ~3x faster than one concatenated 10.9M-row table.

Numerics match ops/hashgrid.py (the jit-friendly oracle) exactly; see
tests/test_hashgrid_fast.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from neus2_tpu.ops.hashgrid import HashGridConfig, _corner_indices
from neus2_tpu.ops.scatter import segment_dense_sum_multi

# NOTE: a Mosaic tpu.dynamic_gather forward path (VMEM-resident bf16 table)
# was prototyped and deleted: the v5e Mosaic compiler crashes
# (tpu_compile_helper exit 1) on EVERY take_along_axis kernel shape, down to
# 512x128, while other Pallas kernels compile fine — measured on-chip
# 2026-08-19; full record in PERF.md "Mosaic dynamic_gather: dead end".

# Corner offsets (8, 3): corner >> d & 1 per dimension.
_CORNERS = [[(c >> d) & 1 for d in range(3)] for c in range(8)]


def init_hashgrid_tables(key: jax.Array, config: HashGridConfig) -> tuple:
    """Per-level tables ~ U(-1e-4, 1e-4) (tcnn grid.h initialize_params)."""
    _, _, _, sizes, _ = config.level_tables()
    keys = jax.random.split(key, config.n_levels)
    return tuple(
        jax.random.uniform(
            keys[l],
            (sizes[l], config.n_features_per_level),
            jnp.float32,
            minval=-1e-4,
            maxval=1e-4,
        )
        for l in range(config.n_levels)
    )


def _level_geometry(positions, scale):
    """(pos_grid int32 (N,3), frac (N,3)) for one level."""
    pos = positions * scale + 0.5
    pos_floor = jnp.floor(pos)
    return pos_floor.astype(jnp.int32), pos - pos_floor


def _weights_and_grads(frac, scale):
    """Trilinear weights w (N,8), dw/dx (N,8,3), and the cross second
    derivatives d2w/dx_j dx_k (N,8,3,3) are implied by returned terms.

    Returns (w, dw, terms, signs) where terms (N,8,3) are the per-axis
    factors and signs (8,3) their derivative signs; d2w uses them in bwd.
    """
    corners = jnp.asarray(_CORNERS, jnp.float32)  # (8,3) in {0,1}
    # terms[n,c,d] = frac if corner bit set else 1-frac
    terms = jnp.where(
        corners[None, :, :] == 1.0, frac[:, None, :], 1.0 - frac[:, None, :]
    )  # (N,8,3)
    signs = jnp.where(corners == 1.0, 1.0, -1.0)  # (8,3)
    w = terms.prod(-1)  # (N,8)
    # dw[n,c,j] = sign[c,j] * prod_{d != j} terms[n,c,d] * scale
    prod_excl = jnp.stack(
        [
            terms[..., 1] * terms[..., 2],
            terms[..., 0] * terms[..., 2],
            terms[..., 0] * terms[..., 1],
        ],
        axis=-1,
    )  # (N,8,3)
    dw = signs[None] * prod_excl * scale
    return w, dw, terms, signs


def _level_indices(pos_grid, config: HashGridConfig, lvl, resolutions, sizes, use_hash):
    idx = []
    for c in range(8):
        co = jnp.asarray(_CORNERS[c], jnp.int32)
        idx.append(
            _corner_indices(pos_grid + co, resolutions[lvl], sizes[lvl], use_hash[lvl])
        )
    return jnp.stack(idx, axis=-1)  # (N, 8)


def make_encode_jac(config: HashGridConfig, compute_dtype=None):
    """Returns encode_jac(tables, positions, valid_level, max_level) ->
    (feat, jac).

    ``compute_dtype=jnp.bfloat16`` runs the BACKWARD contraction einsums in
    bf16 with fp32 accumulation — the reference caches and contracts its
    dy_dx tensor in fp16 (grid.h:372-1250), so this loses no parity
    precision; forward features/Jacobian stay fp32.

    feat (N, L*F); jac (N, 3, L*F) = d feat / d positions.
    ``valid_level``: traced scalar; level l outputs zeros when l > valid_level
    (grid.h:198 progressive unlock).  ``max_level``: optional per-sample (N,)
    fraction in [0,1]; level l is zeroed for samples with
    l >= max_level * n_levels (the reference's m_max_level_rand_training
    per-sample masking, grid.h:217-240).  The function has a custom VJP: one
    gather per level in fwd, one scatter-add per level in bwd.
    """
    L = config.n_levels
    F = config.n_features_per_level
    resolutions, scales, _, sizes, use_hash = config.level_tables()
    # Dense levels: corner c of the cell at idx0 lives at (idx0 + off_c) %
    # size with a STATIC per-level offset (x-major layout in
    # ops/hashgrid._corner_indices), so 8 narrow gathers collapse into 8
    # contiguous table rolls (bandwidth-cheap) + ONE wide (8F)-row gather —
    # 8x fewer serialized gather rows (PERF.md: per-row cost is constant in
    # row width).  Hashed levels have no such linearity (XOR-prime hash).
    corner_offsets = [
        [
            co[0] + co[1] * resolutions[l] + co[2] * resolutions[l] ** 2
            for co in _CORNERS
        ]
        for l in range(L)
    ]

    def _level_gate(l, valid_level, max_level, dtype, n):
        gate = jnp.broadcast_to(
            (l <= valid_level).astype(dtype), (n, 1)
        )
        if max_level is not None:
            per_sample = (l < max_level * L + 1e-3).astype(dtype)
            gate = gate * per_sample[:, None]
        return gate  # (N, 1)

    def _fwd_compute(tables, positions, valid_level, max_level):
        feats, jacs, residuals = [], [], []
        n = positions.shape[0]
        for l in range(L):
            pos_grid, frac = _level_geometry(positions, scales[l])
            if use_hash[l]:
                idx = _level_indices(
                    pos_grid, config, l, resolutions, sizes, use_hash
                )
                vals = jnp.take(tables[l], idx, axis=0)  # (N,8,F)
            else:
                idx = _corner_indices(pos_grid, resolutions[l], sizes[l], False)
                rolled = jnp.stack(
                    [
                        jnp.roll(tables[l], -o, axis=0)
                        for o in corner_offsets[l]
                    ],
                    axis=1,
                )  # (T, 8, F)
                vals = jnp.take(rolled, idx, axis=0)  # (N,8,F)
            w, dw, _, _ = _weights_and_grads(frac, scales[l])
            gate = _level_gate(l, valid_level, max_level, positions.dtype, n)
            # Broadcast-multiply-reduce, NOT einsum: XLA lowers the (N,8,F)
            # batched contraction to per-sample dot_generals that run ~1.7x
            # slower on v5e (measured 2.29 vs 1.38 ms/level at flagship
            # scale, tools_probe_micro.py) — ~13 ms/step across 14 levels.
            feat = (w[..., None] * vals).sum(1) * gate
            jac = (dw[..., None] * vals[:, :, None, :]).sum(1) * gate[:, None, :]
            feats.append(feat)
            jacs.append(jac)
            residuals.append((idx, vals, frac, gate))
        return (
            jnp.concatenate(feats, -1),
            jnp.concatenate(jacs, -1),
            residuals,
        )

    def encode_jac(tables, positions, valid_level=jnp.asarray(10**9), max_level=None):
        feat, jac, _ = _fwd_compute(tables, positions, valid_level, max_level)
        return feat, jac

    @jax.custom_vjp
    def _encode(tables, positions, valid_level, max_level):
        feat, jac, _ = _fwd_compute(tables, positions, valid_level, max_level)
        return feat, jac

    def _encode_fwd(tables, positions, valid_level, max_level):
        feat, jac, residuals = _fwd_compute(tables, positions, valid_level, max_level)
        return (feat, jac), (residuals, [t.shape[0] for t in tables], max_level)

    bw_dt = compute_dtype or jnp.float32
    ein = partial(jnp.einsum, preferred_element_type=jnp.float32)

    def _encode_bwd(res, cts):
        residuals, table_rows, max_level = res
        ct_feat, ct_jac = cts  # (N, L*F), (N, 3, L*F)
        # Hashed levels scatter (N*8, F) per-corner updates; dense levels
        # scatter (N, 8F) corner-fused rows (8x fewer sort elements) that
        # are folded back onto the true table by inverse rolls below.
        idx_hash, upd_hash, lvl_hash = [], [], []
        idx_dense, upd_dense, lvl_dense = [], [], []
        d_x = 0.0
        for l in range(L):
            idx, vals, frac, gate = residuals[l]  # gate (N,1)
            w, dw, terms, signs = _weights_and_grads(frac, scales[l])
            ctf = ct_feat[:, l * F : (l + 1) * F] * gate  # (N,F)
            ctj = ct_jac[:, :, l * F : (l + 1) * F] * gate[:, None, :]  # (N,3,F)
            # bf16 contraction operands under compute_dtype (fp32 accumulate;
            # reference parity: the dy_dx cache is fp16, grid.h:372-1250).
            vals_c = vals.astype(bw_dt)
            dw_c = dw.astype(bw_dt)
            ctf_c = ctf.astype(bw_dt)
            ctj_c = ctj.astype(bw_dt)

            # --- d table: from both feat and jac outputs (grid.h:372, 881) ---
            # Under bf16 compute the update is EMITTED in bf16 (term1 in
            # bf16, the einsum's f32 accumulation rounded in its epilogue):
            # the segment-sum pipeline quantizes to bf16 anyway for the sort
            # payload (segment_tile.pack_bf16_pairs), so this only moves
            # that convert into the producing fusion instead of a
            # standalone pre-sort convert pass (round-3 profile: 9.8 ms of
            # convert_element_type around the 9 per-level sorts).
            upd = (
                w.astype(bw_dt)[..., None] * ctf_c[:, None, :]
                + ein("ncj,njf->ncf", dw_c, ctj_c).astype(bw_dt)
            )  # (N,8,F) in bw_dt
            if use_hash[l]:
                idx_hash.append(idx.reshape(-1))
                upd_hash.append(upd.reshape(-1, F))
                lvl_hash.append(l)
            elif 8 * F <= 32:
                idx_dense.append(idx)  # (N,)
                upd_dense.append(upd.reshape(-1, 8 * F))
                lvl_dense.append(l)
            else:
                # Corner-fused rows wider than 32 (8F=64 at F=8) hit a v5e
                # compile pathology in the packed sort+tile-reduce pipeline:
                # the single (N,64)->4104 dense segment sum alone compiles
                # >260 s (tools_probe_l4f8_compile.py bisect; the whole
                # l4f8 step was killed at 25 min).  Emit per-corner (N*8, F)
                # updates instead — the shape class the hashed levels use,
                # which compiles fine — with the roll-equivalent per-corner
                # indices ((idx0 + off_c) % size; matches the forward's
                # jnp.roll corner gather exactly).
                offs = jnp.asarray(corner_offsets[l], jnp.int32)
                idx_c = (idx[:, None] + offs[None, :]) % sizes[l]
                idx_hash.append(idx_c.reshape(-1))
                upd_hash.append(upd.reshape(-1, F))
                lvl_hash.append(l)

            # --- d positions (grid.h:804 first order + 1010 second order) ---
            # dL/dx_j += sum_cf dw[n,c,j] * vals * ctf   (through feat)
            vc = ein("ncf,nf->nc", vals_c, ctf_c)  # (N,8)
            d_x = d_x + ein("nc,ncj->nj", vc.astype(bw_dt), dw_c)
            # through jac: d/dx_k of dw[n,c,j]:
            # d2w[n,c,j,k] = sign_j sign_k * term_excl(j,k) * scale^2, 0 if j==k
            vj = ein("ncf,njf->ncj", vals_c, ctj_c)  # (N,8,3)
            s2 = scales[l] * scales[l]
            t0, t1, t2 = terms[..., 0], terms[..., 1], terms[..., 2]
            s0, s1, s2_ = signs[:, 0], signs[:, 1], signs[:, 2]
            # pairwise contributions (j,k) and (k,j) share term_excl
            e01 = s0[None] * s1[None] * t2 * s2  # (N,8) d2w/dx0 dx1
            e02 = s0[None] * s2_[None] * t1 * s2
            e12 = s1[None] * s2_[None] * t0 * s2
            dx0 = vj[..., 1] * e01 + vj[..., 2] * e02
            dx1 = vj[..., 0] * e01 + vj[..., 2] * e12
            dx2 = vj[..., 0] * e02 + vj[..., 1] * e12
            d_x = d_x + jnp.stack(
                [dx0.sum(1), dx1.sum(1), dx2.sum(1)], axis=-1
            )
        # Scatter-free segment sum: XLA:TPU scatter_add serializes per
        # update (~80 ms/level at batch scale); on TPU each group is
        # per-level 2-operand sorts + ONE Pallas dynamic-length tile-reduce
        # launch (ops/segment_tile.py), on CPU native scatter.
        d_tables = [None] * L
        if idx_hash:
            outs = segment_dense_sum_multi(
                idx_hash, upd_hash, [table_rows[l] for l in lvl_hash]
            )
            for l, o in zip(lvl_hash, outs):
                d_tables[l] = o
        if idx_dense:
            outs = segment_dense_sum_multi(
                idx_dense, upd_dense, [table_rows[l] for l in lvl_dense]
            )
            for l, o8 in zip(lvl_dense, outs):
                o8 = o8.reshape(table_rows[l], 8, F)
                d_tables[l] = sum(
                    jnp.roll(o8[:, c, :], corner_offsets[l][c], axis=0)
                    for c in range(8)
                )
        return (
            tuple(d_tables),
            d_x,
            None,
            jax.tree_util.tree_map(jnp.zeros_like, max_level),
        )

    _encode.defvjp(_encode_fwd, _encode_bwd)

    def fast(tables, positions, valid_level=None, max_level=None):
        vl = jnp.asarray(10**9 if valid_level is None else valid_level)
        return _encode(tuple(tables), positions, vl, max_level)

    return fast


@partial(jax.jit, static_argnames=("config",))
def encode_jac_reference(tables, positions, config: HashGridConfig, valid_level=None):
    """Oracle: features via ops.hashgrid + jacobian via jax.jacfwd (slow)."""
    from neus2_tpu.ops.hashgrid import hashgrid_encode

    table_cat = jnp.concatenate(tables, axis=0)

    def f(x):
        return hashgrid_encode(table_cat, x, config, valid_level=valid_level)

    feat = f(positions)
    jac = jax.vmap(jax.jacfwd(lambda x: f(x[None])[0]))(positions)  # (N, LF, 3)
    return feat, jnp.swapaxes(jac, 1, 2)
