"""Trainer features: gradient accumulation, remat, non-finite watchdog."""

import dataclasses

import numpy as np
import pytest

from mrp_gnn_tpu.config import get_config
from mrp_gnn_tpu.train import train


def _cfg(cfg_name="single_robot_depth", steps=6, scenes_per_batch=4, **train_kw):
    cfg = get_config(cfg_name)
    data = dataclasses.replace(cfg.data, image_size=(16, 16),
                               num_train_scenes=8, num_eval_scenes=2,
                               scenes_per_batch=scenes_per_batch)
    model = dataclasses.replace(cfg.model, image_size=(16, 16),
                                encoder_channels=(8, 16))
    train_kw.setdefault("learning_rate", 1e-3)
    tr = dataclasses.replace(cfg.train, steps=steps, warmup_steps=2,
                             log_every=1, **train_kw)
    return cfg.replace(data=data, model=model, train=tr)


def _losses(cfg):
    _, records = train(cfg)
    return np.array([r["total"] for r in records])


def test_grad_accum_matches_large_batch():
    # accum=2 over 2-scene microbatches consumes the same 4 scenes per
    # optimizer step as scenes_per_batch=4, and the accumulated mean grad
    # equals the large-batch grad -> identical training trajectories.
    big = _losses(_cfg(scenes_per_batch=4))
    accum = _losses(_cfg(scenes_per_batch=2, grad_accum_steps=2))
    np.testing.assert_allclose(accum, big, rtol=1e-4, atol=1e-6)


def test_remat_matches_plain_backward():
    plain = _losses(_cfg(steps=4))
    remat = _losses(_cfg(steps=4, remat=True))
    np.testing.assert_allclose(remat, plain, rtol=1e-5, atol=1e-7)


def test_remat_with_accum_and_fusion():
    cfg = _cfg("two_robot_mean", steps=4, scenes_per_batch=2,
               grad_accum_steps=2, remat=True)
    losses = _losses(cfg)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_nonfinite_watchdog_halts():
    cfg = _cfg(steps=30, learning_rate=1e18, grad_clip_norm=1e18)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train(cfg)


def test_periodic_eval_and_best_tracking():
    cfg = _cfg(steps=6, eval_every=3)
    _, records = train(cfg)
    evals = [r for r in records if "eval_rmse" in r]
    assert len(evals) == 2 and all(np.isfinite(e["eval_rmse"]) for e in evals)
    best = [r for r in records if "best_eval_rmse" in r]
    assert len(best) == 1
    assert best[0]["best_eval_rmse"] == min(e["eval_rmse"] for e in evals)
    assert best[0]["best_eval_step"] in (3, 6)


def test_eval_partial_batch_invariance():
    # 6 eval scenes with batch 4 -> one full + one padded partial batch;
    # metrics must equal the cleanly-divisible batching of the same scenes.
    from mrp_gnn_tpu.evaluate import evaluate
    cfg = _cfg(steps=2)
    state, _ = train(cfg)
    cfg_a = cfg.replace(data=dataclasses.replace(cfg.data, num_eval_scenes=6,
                                                 scenes_per_batch=4))
    cfg_b = cfg.replace(data=dataclasses.replace(cfg.data, num_eval_scenes=6,
                                                 scenes_per_batch=2))
    ra = evaluate(cfg_a, state.params)
    rb = evaluate(cfg_b, state.params)
    for k in ("rmse", "abs_rel", "delta1"):
        np.testing.assert_allclose(ra[k], rb[k], rtol=1e-5,
                                   err_msg=f"metric {k}")


@pytest.mark.slow
def test_mesh_clamps_to_available_devices():
    # swarm_partitioned asks for graph_axis_size=8; on a machine with fewer
    # devices the mesh must degrade instead of failing the preset.
    import dataclasses as dc
    cfg = _cfg("two_robot_mean", steps=1, scenes_per_batch=4)
    cfg = cfg.replace(parallel=dc.replace(cfg.parallel, data_axis_size=4,
                                          graph_axis_size=4,
                                          model_axis_size=2))  # needs 32
    from mrp_gnn_tpu.train import make_parallel
    pctx = make_parallel(cfg)  # 8 devices available
    assert pctx is not None
    total = np.prod(list(pctx.mesh.shape.values()))
    assert total <= 8
    losses = _losses(cfg)
    assert np.isfinite(losses).all()


def test_degraded_robots_deterministic_and_bounded():
    from mrp_gnn_tpu.data.pipeline import SceneDataset
    cfg = _cfg("five_robot_attention", steps=1).data
    cfg = dataclasses.replace(cfg, degraded_fraction=1.0)
    clean = SceneDataset(dataclasses.replace(cfg, degraded_fraction=0.0),
                         "train")[0]
    a = SceneDataset(cfg, "train")[0]
    b = SceneDataset(cfg, "train")[0]
    np.testing.assert_array_equal(a["images"], b["images"])  # deterministic
    np.testing.assert_array_equal(a["depth"], clean["depth"])  # GT untouched
    np.testing.assert_array_equal(a["seg"], clean["seg"])
    # fraction 1.0 still leaves at least one clean camera
    same = [(a["images"][i] == clean["images"][i]).all()
            for i in range(a["images"].shape[0])]
    assert any(same) and not all(same)


def test_cli_auto_restart_on_divergence(tmp_path, capsys):
    from mrp_gnn_tpu.train import main
    args = ["--config", "single_robot_depth", "--steps", "8",
            "--lr", "1e18", "--log_every", "1", "--train_scenes", "8",
            "--checkpoint_dir", str(tmp_path / "ck"), "--max_restarts", "1"]
    with pytest.raises(FloatingPointError):
        main(args)
    out = capsys.readouterr().out
    assert "restart 1/1" in out


def test_watchdog_can_be_disabled():
    cfg = _cfg(steps=5, learning_rate=1e18, grad_clip_norm=1e18,
               halt_on_nonfinite=False)
    _, records = train(cfg)  # completes despite divergence
    assert len(records) == 5


def test_stacker_state_aligns_with_groups():
    """_MicrobatchStacker prefetches a stacked group ahead; get_state() must
    reflect only the batches folded into groups already handed to the
    consumer, so checkpointed data state never overshoots (ADVICE r3)."""
    import time
    from mrp_gnn_tpu.train import _MicrobatchStacker

    class Counting:
        def __init__(self):
            self.i = 0
            self.graph = object()

        def __next__(self):
            self.i += 1
            return {"images": np.zeros((2, 4, 4, 3), np.float32),
                    "depth": np.zeros((2, 4, 4), np.float32),
                    "seg": np.zeros((2, 4, 4), np.int32),
                    "graph": self.graph}

        def get_state(self):
            return self.i

    inner = Counting()
    st = _MicrobatchStacker(inner, accum=3)
    assert st.get_state() is None  # nothing consumed yet
    next(st)
    time.sleep(0.1)  # let the producer build the NEXT group ahead
    assert inner.i >= 6  # it DID run ahead...
    assert st.get_state() == 3  # ...but state tracks delivered groups
    next(st)
    assert st.get_state() == 6
    st.close()
    assert not st._thread.is_alive()


def test_stacker_close_cascades_to_inner():
    from mrp_gnn_tpu.train import _MicrobatchStacker

    class Inner:
        def __init__(self):
            self.closed = False

        def __next__(self):
            return {"images": np.zeros((1, 2, 2, 3), np.float32),
                    "depth": np.zeros((1, 2, 2), np.float32),
                    "seg": np.zeros((1, 2, 2), np.int32),
                    "graph": None}

        def close(self):
            self.closed = True

    inner = Inner()
    st = _MicrobatchStacker(inner, accum=2)
    next(st)
    st.close()
    assert inner.closed
    assert not st._thread.is_alive()


def test_train_leaves_no_producer_threads():
    """Repeated in-process train() calls must not accumulate live pipeline
    threads: the finally-close in train() stops every producer."""
    import threading
    cfg = _cfg(steps=2)
    train(cfg)
    n_after_first = threading.active_count()
    train(cfg)
    train(cfg)
    assert threading.active_count() <= n_after_first


def test_grain_loader_refuses_multiprocess(monkeypatch):
    import jax
    from mrp_gnn_tpu.data.pipeline import make_train_iterator
    cfg = dataclasses.replace(_cfg().data, loader="grain")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process"):
        make_train_iterator(cfg)


def test_caller_owned_data_iter_not_closed():
    """train(data_iter=...) must not close a caller-owned iterator on exit
    (the finally-close cascades only into wrappers train() created)."""
    from mrp_gnn_tpu.data.pipeline import make_train_iterator
    cfg = _cfg(steps=2)

    def gen():
        it = make_train_iterator(cfg.data)
        while True:
            yield next(it)

    g = gen()
    train(cfg, num_steps=2, data_iter=g)
    nxt = next(g)  # still alive after train() returned
    assert "images" in nxt


def test_stacker_next_after_close_raises():
    """__next__ after close() must raise immediately, not block forever on
    the drained queue (same terminal-state guard as TransformIterator)."""
    from mrp_gnn_tpu.train import _MicrobatchStacker

    class Inner:
        def __next__(self):
            return {"images": np.zeros((1, 2, 2, 3), np.float32),
                    "depth": np.zeros((1, 2, 2), np.float32),
                    "seg": np.zeros((1, 2, 2), np.int32),
                    "graph": None}

    st = _MicrobatchStacker(Inner(), accum=2)
    next(st)
    st.close()
    for _ in range(2):
        with pytest.raises(StopIteration):
            next(st)
