"""Per-layer activation parity vs the torch-CPU twin (BASELINE.json:5).

The reference implementation is a torch codebase; with the reference mount
empty (SURVEY.md section 0) the twin in parity_torch.py is the stand-in
oracle: identical math, weights transplanted from the flax model, per-layer
activations compared allclose for configs 1-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.graph import batch_fully_connected
from mrp_gnn_tpu.models import MultiRobotPerceptionNet

from tests.parity_torch import TorchTwin

CONFIGS = ["single_robot_depth", "two_robot_mean", "five_robot_attention",
           "multitask_batched"]

TOL = dict(rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", CONFIGS)
def test_per_layer_activation_parity(name):
    cfg = get_config(name)
    H, W = cfg.model.image_size
    n = cfg.data.num_robots
    num_scenes = 2
    gb = batch_fully_connected(num_scenes, n)
    V = gb.max_nodes

    rng = np.random.default_rng(123)
    images = rng.uniform(size=(V, H, W, 3)).astype(np.float32)

    model = MultiRobotPerceptionNet(cfg.model)
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(images), gb)
    jax_out = jax.device_get(model.apply(params, jnp.asarray(images), gb))

    twin = TorchTwin(cfg.model, jax.device_get(params))
    torch_out = twin.forward(images, gb)

    # Compare layer by layer, deepest-first error attribution.
    for key in ("bottleneck", "fused", "decoder", "depth", "seg_logits"):
        if key not in jax_out:
            continue
        a, b = np.asarray(jax_out[key]), torch_out[key]
        a = a.reshape(b.shape)
        np.testing.assert_allclose(a, b, err_msg=f"layer {key!r}", **TOL)
