"""Multi-chip data-parallel training: shard_map over a device mesh.

The reference has no distributed computing of any kind (SURVEY.md §2.4) — this
module is the TPU framework's first-class parallelism layer, per the BASELINE
north star: shard *rays* across chips, replicate hashgrid+MLP params, psum
gradients over ICI inside shard_map so XLA can overlap the all-reduce with the
backward pass.

Design:
  * mesh axis "data" over all chips (1D; DCN x ICI layout comes free from
    jax.make_mesh device ordering);
  * every device draws its own ray minibatch (fold_in on the axis index) —
    the global batch is n_rays_total = config.n_rays * n_devices;
  * gradients and scalar metrics are pmean'd; the optimizer step runs
    replicated (identical math on every chip — no weight gather needed);
  * per-chip table updates are dense-accumulated then pmean'd — this also
    divides the per-chip scatter cost (PERF.md) by the device count;
  * per-ray extras (error-map deposits) come back ray-sharded and are
    deposited once, replicated, outside the shard_map.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from neus2_tpu.engine import error_map as emap
from neus2_tpu.engine.train import (
    TrainConfig,
    TrainState,
    _forward_loss,
    make_cam_optimizer,
    make_delta_optimizer,
    wants_cam_training,
)
from neus2_tpu.utils.optim import ema_update, make_optimizer


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def _is_table_path(path) -> bool:
    return any(getattr(k, "key", None) == "hashgrid" for k in path)


def _shardable(x, n_dev: int) -> bool:
    shape = getattr(x, "shape", ())
    return len(shape) >= 1 and shape[0] >= n_dev and shape[0] % n_dev == 0


def table_spec_tree(tree, n_dev: int, axis_name: str = "data"):
    """PartitionSpec tree: hashgrid-table leaves row-sharded, rest replicated.

    Used by the ZeRO-1 path: the optimizer state (mu/nu/steps) for the
    10.9M-row hash tables is row-sharded over the mesh — each chip stores
    and updates only T/N rows (optimizer-state sharding; the gradient
    arrives via psum_scatter, the updated rows leave via all_gather — the
    same total bytes as the plain all-reduce they replace, since an
    all-reduce IS reduce_scatter + all_gather)."""

    def leaf_spec(path, x):
        if _is_table_path(path) and _shardable(x, n_dev):
            return P(axis_name)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, tree)


@partial(
    jax.jit,
    static_argnames=(
        "config",
        "mesh",
        "train_canonical",
        "train_delta",
        "use_delta",
        "zero1",
    ),
    donate_argnames=("state",),
)
def parallel_train_step(
    state: TrainState,
    images: jnp.ndarray,
    cameras,
    config: TrainConfig,
    mesh: Mesh,
    train_canonical: bool = True,
    train_delta: bool = False,
    use_delta: bool = False,
    depths: jnp.ndarray | None = None,
    zero1: bool = False,
):
    """One data-parallel step; state replicated, rays sharded by device.

    ``config.n_rays`` is the *per-device* ray count.

    ``zero1``: shard the hash-table gradient reduction and optimizer over
    the mesh (see ``parallel_train_step_zero1``).  The table leaves of
    ``state.opt_state`` must already be row-sharded (``shard_state_zero1``).
    """
    if zero1 and train_canonical:
        return _train_step_zero1(
            state, images, cameras, config, mesh,
            train_delta=train_delta, use_delta=use_delta, depths=depths,
        )
    key, k_step = jax.random.split(state.key)

    # Error-map importance sampling is disabled during pure pose refinement:
    # concentrating rays on few high-error cells ill-conditions the delta
    # gradient (verified empirically; uniform sampling recovers the GT pose).
    if config.use_error_map and train_delta and not train_canonical:
        config = dataclasses.replace(config, use_error_map=False)

    train_cam = train_canonical and wants_cam_training(config)

    def device_grads(diff, state_, images_, cameras_, key_, depths_):
        key_ = jax.random.fold_in(key_, jax.lax.axis_index("data"))
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (_, (aux, extras)), grads = grad_fn(
            diff,
            state_,
            images_,
            cameras_,
            key_,
            config,
            use_delta or train_delta,
            depths_,
        )
        # Gradient all-reduce over ICI; XLA overlaps this with backward.
        grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, "data"), grads)
        aux = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, "data"), aux)
        # Sharpness grid (include_sharpness_in_error): per-shard grids are
        # elementwise-MAX combined (the scatter-max semantics across all
        # rays) and returned replicated — it must not ride the P("data")
        # extras spec, which would concatenate shards.
        sharp_grid = extras.sharpness_grid
        if sharp_grid is not None:
            sharp_grid = jax.lax.pmax(sharp_grid, "data")
        extras = extras._replace(sharpness_grid=None)
        return grads, aux, extras, sharp_grid

    diff = {}
    if train_canonical:
        diff["params"] = state.params
    if train_delta:
        diff["delta"] = state.delta
    if train_cam:
        diff["cam"] = state.cam
    if not diff:
        diff["params"] = state.params

    sharded = jax.shard_map(
        device_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P("data"), P()),
        check_vma=False,
    )
    grads, aux, extras, sharp_grid = sharded(
        diff, state, images, cameras, k_step, depths
    )

    new_params, new_opt = state.params, state.opt_state
    if train_canonical:
        tx = make_optimizer(config.optim)
        updates, new_opt = tx.update(grads["params"], state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
    new_delta, new_delta_opt = state.delta, state.delta_opt_state
    if train_delta:
        dtx = make_delta_optimizer(config)
        d_up, new_delta_opt = dtx.update(grads["delta"], state.delta_opt_state, state.delta)
        new_delta = optax.apply_updates(state.delta, d_up)
    new_cam, new_cam_opt = state.cam, state.cam_opt_state
    if train_cam:
        ctx = make_cam_optimizer(config)
        c_up, new_cam_opt = ctx.update(grads["cam"], state.cam_opt_state, state.cam)
        new_cam = optax.apply_updates(state.cam, c_up)

    new_emap = state.error_map
    if config.use_error_map:
        new_emap = emap.deposit(
            state.error_map, extras.img_idx, extras.uv, extras.ray_loss
        )
        if sharp_grid is not None:
            new_emap = new_emap._replace(sharpness_grid=sharp_grid)

    new_ema = ema_update(state.ema_params, new_params, config.ema_decay)
    return (
        state._replace(
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt,
            delta=new_delta,
            delta_opt_state=new_delta_opt,
            cam=new_cam,
            cam_opt_state=new_cam_opt,
            error_map=new_emap,
            step=state.step + 1,
            frame_step=state.frame_step + 1,
            key=key,
        ),
        aux,
    )


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every leaf of the train state replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), state
    )


def _zero1_state_specs(state: TrainState, n_dev: int, axis: str):
    """TrainState-shaped spec tree: opt-state table leaves P(axis), rest P()."""
    specs = jax.tree_util.tree_map(lambda _: P(), state)
    return specs._replace(
        opt_state=table_spec_tree(state.opt_state, n_dev, axis)
    )


def shard_state_zero1(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state for the ZeRO-1 path: optimizer-state table
    leaves row-sharded over the mesh, everything else replicated."""
    axis = mesh.axis_names[0]
    specs = _zero1_state_specs(state, mesh.devices.size, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _train_step_zero1(
    state: TrainState,
    images,
    cameras,
    config: TrainConfig,
    mesh: Mesh,
    train_delta: bool,
    use_delta: bool,
    depths,
):
    """Data-parallel step with ZeRO-1 table sharding (the 'sharded table
    gradient' north star, SURVEY §2.4 / PERF roadmap):

      * table gradients are ``psum_scatter``-reduced — each chip receives
        only its T/N-row shard of the summed gradient (half an all-reduce);
      * the table optimizer (mu/nu/steps — 3x 87 MB at full scale) stores
        and updates ONLY that shard per chip;
      * updated table rows return via ``all_gather`` (the other half).

    Same total ICI bytes as the plain all-reduce it replaces (all-reduce IS
    reduce_scatter + all_gather) but optimizer memory and compute drop by
    the device count.  A true all_to_all update-stream exchange was
    considered and rejected: dense coarse levels concentrate updates on few
    rows, so per-destination capacities degenerate to the full stream.

    Canonical training only (pose-refinement phases use tiny batches and the
    replicated path).  MLP/variance/cam/delta leaves stay replicated-pmean.
    """
    key, k_step = jax.random.split(state.key)
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    train_cam = wants_cam_training(config)

    diff = {"params": state.params}
    if train_delta:
        diff["delta"] = state.delta
    if train_cam:
        diff["cam"] = state.cam

    def body(diff_, state_, images_, cameras_, key_, depths_):
        key_ = jax.random.fold_in(key_, jax.lax.axis_index(axis))
        grad_fn = jax.value_and_grad(_forward_loss, has_aux=True)
        (_, (aux, extras)), grads = grad_fn(
            diff_, state_, images_, cameras_, key_, config,
            use_delta or train_delta, depths_,
        )

        def reduce_leaf(path, g):
            if _is_table_path(path) and _shardable(g, n_dev):
                return (
                    jax.lax.psum_scatter(
                        g, axis, scatter_dimension=0, tiled=True
                    )
                    / n_dev
                )
            return jax.lax.pmean(g, axis)

        grads = jax.tree_util.tree_map_with_path(reduce_leaf, grads)
        aux = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, axis), aux)

        # Canonical optimizer on row-sharded tables (opt_state_ leaves for
        # tables are already local shards via in_specs).
        idx = jax.lax.axis_index(axis)

        def shard_leaf(path, p):
            if _is_table_path(path) and _shardable(p, n_dev):
                rows = p.shape[0] // n_dev
                return jax.lax.dynamic_slice_in_dim(p, idx * rows, rows, 0)
            return p

        params_sh = jax.tree_util.tree_map_with_path(
            shard_leaf, state_.params
        )
        tx = make_optimizer(config.optim)
        updates, new_opt = tx.update(
            grads["params"], state_.opt_state, params_sh
        )
        new_params_sh = optax.apply_updates(params_sh, updates)

        def gather_leaf(path, p_new, p_old):
            if _is_table_path(path) and _shardable(p_old, n_dev):
                return jax.lax.all_gather(p_new, axis, axis=0, tiled=True)
            return p_new

        new_params = jax.tree_util.tree_map_with_path(
            gather_leaf, new_params_sh, state_.params
        )
        side_grads = {k: grads[k] for k in ("delta", "cam") if k in grads}
        sharp_grid = extras.sharpness_grid
        if sharp_grid is not None:
            sharp_grid = jax.lax.pmax(sharp_grid, axis)
        extras = extras._replace(sharpness_grid=None)
        return new_params, new_opt, side_grads, aux, extras, sharp_grid

    state_specs = _zero1_state_specs(state, n_dev, axis)
    opt_specs = table_spec_tree(state.opt_state, n_dev, axis)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), state_specs, P(), P(), P(), P()),
        out_specs=(P(), opt_specs, P(), P(), P(axis), P()),
        check_vma=False,
    )
    new_params, new_opt, side_grads, aux, extras, sharp_grid = sharded(
        diff, state, images, cameras, k_step, depths
    )

    new_delta, new_delta_opt = state.delta, state.delta_opt_state
    if train_delta:
        dtx = make_delta_optimizer(config)
        d_up, new_delta_opt = dtx.update(
            side_grads["delta"], state.delta_opt_state, state.delta
        )
        new_delta = optax.apply_updates(state.delta, d_up)
    new_cam, new_cam_opt = state.cam, state.cam_opt_state
    if train_cam:
        ctx = make_cam_optimizer(config)
        c_up, new_cam_opt = ctx.update(
            side_grads["cam"], state.cam_opt_state, state.cam
        )
        new_cam = optax.apply_updates(state.cam, c_up)

    new_emap = state.error_map
    if config.use_error_map:
        new_emap = emap.deposit(
            state.error_map, extras.img_idx, extras.uv, extras.ray_loss
        )
        if sharp_grid is not None:
            new_emap = new_emap._replace(sharpness_grid=sharp_grid)

    new_ema = ema_update(state.ema_params, new_params, config.ema_decay)
    return (
        state._replace(
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt,
            delta=new_delta,
            delta_opt_state=new_delta_opt,
            cam=new_cam,
            cam_opt_state=new_cam_opt,
            error_map=new_emap,
            step=state.step + 1,
            frame_step=state.frame_step + 1,
            key=key,
        ),
        aux,
    )
