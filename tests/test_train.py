"""Integration: tiny end-to-end training runs (SURVEY.md section 4.2)."""

import dataclasses

import numpy as np
import pytest

from mrp_gnn_tpu.config import DataConfig, TrainConfig, get_config
from mrp_gnn_tpu.train import train


def _tiny(cfg_name, steps, **data_kw):
    cfg = get_config(cfg_name)
    data = dataclasses.replace(cfg.data, image_size=(16, 16),
                               num_train_scenes=8, num_eval_scenes=4,
                               scenes_per_batch=2, **data_kw)
    model = dataclasses.replace(cfg.model, image_size=(16, 16),
                                encoder_channels=(8, 16))
    tr = dataclasses.replace(cfg.train, steps=steps, learning_rate=3e-3,
                             warmup_steps=5, log_every=steps // 4 or 1)
    return cfg.replace(data=data, model=model, train=tr)


def test_single_robot_depth_loss_decreases():
    cfg = _tiny("single_robot_depth", steps=40)
    _, records = train(cfg)
    losses = [r["total"] for r in records]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, f"loss did not decrease: {losses}"


def test_two_robot_mean_trains():
    cfg = _tiny("two_robot_mean", steps=30)
    _, records = train(cfg)
    assert records[-1]["total"] < records[0]["total"]


def test_multitask_losses_both_present_and_decrease():
    cfg = _tiny("multitask_batched", steps=30, num_robots=3)
    _, records = train(cfg)
    assert "depth_l1" in records[0] and "seg_ce" in records[0]
    assert records[-1]["total"] < records[0]["total"]
    assert np.isfinite([r["grad_norm"] for r in records]).all()


def test_checkpoint_save_and_resume(tmp_path):
    cfg = _tiny("single_robot_depth", steps=10)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=5))
    state, _ = train(cfg)
    assert int(state.step) == 10

    # Resume: same config, more steps — should start from step 10, with the
    # full reproducibility state (PRNG key, best tracking) carried through.
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, steps=14))
    state2, records2 = train(cfg2)
    assert int(state2.step) == 14
    assert records2[-1]["step"] == 14
    np.testing.assert_array_equal(np.asarray(state2.rng).shape,
                                  np.asarray(state.rng).shape)
    assert not np.array_equal(np.asarray(state2.rng), np.asarray(state.rng))


@pytest.mark.slow
def test_resume_preserves_best_eval_state(tmp_path):
    cfg = _tiny("single_robot_depth", steps=6)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=3,
        eval_every=3))
    state, _ = train(cfg)
    best0 = float(state.best_rmse)
    assert np.isfinite(best0) and int(state.best_step) > 0
    # resume for more steps: restored best must seed the tracking
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, steps=9))
    state2, _ = train(cfg2)
    assert float(state2.best_rmse) <= best0


def test_eval_metrics_finite():
    from mrp_gnn_tpu.evaluate import evaluate
    cfg = _tiny("multitask_batched", steps=5, num_robots=2)
    state, _ = train(cfg)
    res = evaluate(cfg, state.params)
    for k in ("rmse", "abs_rel", "delta1", "miou"):
        assert k in res and np.isfinite(res[k]), res
    assert 0 <= res["delta1"] <= 1
    assert 0 <= res["miou"] <= 1
