import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.models import MultiRobotPerceptionNet


def _init_and_apply(cfg_name, num_scenes=2):
    cfg = get_config(cfg_name)
    H, W = cfg.model.image_size
    n = cfg.data.num_robots
    gb = batch_fully_connected(num_scenes, n)
    V = gb.max_nodes
    model = MultiRobotPerceptionNet(cfg.model)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(V, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images, gb)
    out = model.apply(params, images, gb)
    return cfg, gb, out, params, model, images


@pytest.mark.parametrize("name", [
    "single_robot_depth", "two_robot_mean",
    pytest.param("five_robot_attention", marks=pytest.mark.slow),
    pytest.param("multitask_batched", marks=pytest.mark.slow)])
def test_forward_shapes_all_presets(name):
    cfg, gb, out, *_ = _init_and_apply(name)
    H, W = cfg.model.image_size
    V = gb.max_nodes
    assert out["depth"].shape == (V, H, W)
    assert bool(jnp.isfinite(out["depth"]).all())
    assert float(out["depth"].min()) >= cfg.model.min_depth
    assert float(out["depth"].max()) <= cfg.model.max_depth
    if cfg.model.num_seg_classes:
        assert out["seg_logits"].shape == (V, H, W, cfg.model.num_seg_classes)
    else:
        assert "seg_logits" not in out


def test_no_fusion_means_views_independent():
    """Config 1 has no GNN: zeroing other views must not change a view's output."""
    cfg, gb, out, params, model, images = _init_and_apply("single_robot_depth")
    images2 = images.at[1:].set(0.0)
    out2 = model.apply(params, images2, gb)
    np.testing.assert_allclose(np.asarray(out["depth"][0]),
                               np.asarray(out2["depth"][0]), rtol=1e-5, atol=1e-5)


def test_fusion_propagates_cross_robot_information():
    """With attention fusion, perturbing robot j changes robot i's output."""
    cfg, gb, out, params, model, images = _init_and_apply("five_robot_attention",
                                                          num_scenes=1)
    images2 = images.at[1].set(0.0)
    out2 = model.apply(params, images2, gb)
    diff = np.abs(np.asarray(out["depth"][0]) - np.asarray(out2["depth"][0])).max()
    assert diff > 1e-6, "fusion should mix information across robots"


def test_fusion_respects_scene_boundaries():
    """Perturbing a robot in scene 2 must not change scene 1's outputs."""
    cfg, gb, out, params, model, images = _init_and_apply("five_robot_attention",
                                                          num_scenes=2)
    images2 = images.at[7].set(0.0)  # node 7 lives in scene 2
    out2 = model.apply(params, images2, gb)
    np.testing.assert_allclose(np.asarray(out["depth"][:5]),
                               np.asarray(out2["depth"][:5]),
                               rtol=1e-5, atol=1e-5)


def test_heterogeneous_team_sizes_forward():
    # Mixed 2/4/3-robot scenes share one padded batch (edge-list path; no
    # block metadata) — outputs finite, padded node slots exactly zero.
    import dataclasses as dc
    from mrp_gnn_tpu.graph import build_graph_batch, fully_connected_edges
    cfg = dc.replace(get_config("five_robot_attention").model,
                     image_size=(16, 16), encoder_channels=(8, 16))
    sizes = [2, 4, 3]
    gb = build_graph_batch([fully_connected_edges(n) for n in sizes], sizes,
                           max_nodes=12, max_edges=24)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(12, 16, 16, 3)).astype(np.float32))
    model = MultiRobotPerceptionNet(cfg)
    params = model.init(jax.random.PRNGKey(0), images, gb)
    out = model.apply(params, images, gb)
    assert np.isfinite(np.asarray(out["depth"])).all()
    fused = np.asarray(out["fused"])
    assert np.abs(fused[9:]).max() == 0  # 3 padded node slots zeroed


@pytest.mark.slow
def test_multihead_attention_forward_and_train():
    import dataclasses as dc
    cfg = get_config("five_robot_attention")
    mcfg = dc.replace(cfg.model, image_size=(16, 16),
                      encoder_channels=(8, 16), attention_heads=4)
    gb = batch_fully_connected(2, 5)
    V = gb.max_nodes
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(V, 16, 16, 3)).astype(np.float32))
    model = MultiRobotPerceptionNet(mcfg)
    params = model.init(jax.random.PRNGKey(0), images, gb)
    out = model.apply(params, images, gb)
    assert np.isfinite(np.asarray(out["depth"])).all()
    # query projection carries heads * attention_dim features
    qk = params["params"]["fusion0"]["query"]["kernel"]
    assert qk.shape[-1] == 4 * mcfg.attention_dim
    # gradients flow
    g = jax.grad(lambda p: model.apply(p, images, gb)["depth"].sum())(params)
    gn = np.asarray(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, jnp.zeros(())))
    assert np.isfinite(gn) and gn > 0


def test_multihead_heads_must_divide_channels():
    import dataclasses as dc
    cfg = get_config("five_robot_attention")
    mcfg = dc.replace(cfg.model, image_size=(16, 16),
                      encoder_channels=(8, 24), attention_heads=5)
    gb = batch_fully_connected(1, 5)
    images = jnp.zeros((5, 16, 16, 3), jnp.float32)
    model = MultiRobotPerceptionNet(mcfg)
    with pytest.raises(ValueError, match="not divisible"):
        model.init(jax.random.PRNGKey(0), images, gb)


def test_padded_nodes_do_not_affect_valid_outputs():
    cfg = get_config("five_robot_attention")
    H, W = cfg.model.image_size
    gb_tight = batch_fully_connected(1, 5)
    gb_pad = batch_fully_connected(1, 5, max_nodes=9, max_edges=32)
    rng = np.random.default_rng(1)
    img5 = rng.uniform(size=(5, H, W, 3)).astype(np.float32)
    img9 = np.concatenate([img5, rng.uniform(size=(4, H, W, 3)).astype(np.float32)])
    model = MultiRobotPerceptionNet(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img5), gb_tight)
    a = model.apply(params, jnp.asarray(img5), gb_tight)
    b = model.apply(params, jnp.asarray(img9), gb_pad)
    np.testing.assert_allclose(np.asarray(a["depth"]), np.asarray(b["depth"])[:5],
                               rtol=2e-4, atol=2e-4)
