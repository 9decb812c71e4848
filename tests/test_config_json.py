"""config_from_json: reference-format network-config parsing
(load_network_config + parent merge, src/testbed.cu:139-162)."""

import json
from pathlib import Path

from neus2_tpu.api.testbed import config_from_json

BASE = Path(__file__).resolve().parent.parent / "configs" / "base.json"


def test_parse_reference_base_json():
    cfg, hyper = config_from_json(BASE)
    g = cfg.field.grid
    assert g.n_levels == 14
    assert g.n_features_per_level == 2
    assert g.log2_hashmap_size == 19
    assert g.base_resolution == 16
    # per_level_scale derived from top_resolution=2048 (testbed.cu:2183-2189)
    assert abs(g.per_level_scale - (2048 / 16) ** (1 / 13)) < 1e-6
    assert g.valid_level_scale == 0.02
    assert g.base_valid_level_scale == 0.2
    assert g.base_training_step == 100
    assert cfg.field.sdf_hidden_dim == 64 and cfg.field.sdf_n_hidden == 1
    assert cfg.field.rgb_hidden_dim == 64 and cfg.field.rgb_n_hidden == 2
    assert cfg.rgb_loss_type == "Huber"
    # Optimizer chain: Ema(decay) > ExponentialDecay(start/interval/base) >
    # Adam(lr/betas/eps/l2) — every level's keys must land (optimizer.cu).
    o = cfg.optim
    assert o.learning_rate == 1e-3 and o.after_learning_rate == 1e-3
    assert o.beta1 == 0.9 and o.beta2 == 0.99 and o.epsilon == 1e-15
    assert o.l2_reg == 1e-6
    assert o.ema_decay == 0.95 and cfg.ema_decay == 0.95
    assert o.decay_start == 20000 and o.decay_interval == 10000
    assert o.decay_base == 0.33
    # optimize_params_components (adam.h:119-180)
    assert dict(o.components).get("rgb_network") is True
    # globalmove optimizer lr -> delta optimizer (transform_network.h path)
    assert cfg.delta_lr == 1e-4
    assert cfg.distortion_res == (32, 32)
    # hyperparams (base.json:121-134)
    assert hyper.first_frame_max_training_step == 2000
    assert hyper.next_frame_max_training_step == 2000
    assert hyper.predict_global_movement is True
    assert hyper.predict_global_movement_training_step == 50
    assert hyper.finetune_global_movement is True
    assert hyper.ek_loss_weight == 0.01
    assert hyper.mask_loss_weight == 0.0
    assert hyper.anneal_end == 0


def test_parent_merge_and_comments(tmp_path):
    """A child config with // comments and a "parent" chain overrides only
    the keys it names (merge_parent_network_config, testbed.cu:154)."""
    child = tmp_path / "child.json"
    parent_copy = tmp_path / "base.json"
    parent_copy.write_text(BASE.read_text())
    child.write_text(
        """{
  // child overrides the loss and one encoding field
  "parent": "base.json",
  "loss": {"otype": "L2"},
  "encoding": {"otype": "HashGrid", "n_levels": 8, "top_resolution": 512}
}"""
    )
    cfg, hyper = config_from_json(child)
    assert cfg.rgb_loss_type == "L2"
    assert cfg.field.grid.n_levels == 8
    # Sections the child did not name keep the parent's values.
    assert cfg.optim.ema_decay == 0.95
    assert hyper.first_frame_max_training_step == 2000


def test_optimizer_overrides_parsed(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "optimizer": {
            "otype": "Ema", "decay": 0.9,
            "nested": {
                "otype": "ExponentialDecay",
                "decay_start": 100, "decay_interval": 50, "decay_base": 0.5,
                "nested": {"otype": "Adam", "learning_rate": 5e-4,
                           "after_learning_rate": 2e-4},
            },
        },
        "globalmove": {"optimizer": {"otype": "Adam", "learning_rate": 3e-3}},
    }))
    cfg, _ = config_from_json(p)
    assert cfg.optim.ema_decay == 0.9
    assert cfg.optim.decay_start == 100
    assert cfg.optim.decay_interval == 50
    assert cfg.optim.decay_base == 0.5
    assert cfg.optim.learning_rate == 5e-4
    assert cfg.optim.after_learning_rate == 2e-4
    assert cfg.delta_lr == 3e-3
