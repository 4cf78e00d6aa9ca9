"""Fusion ablation: does cross-robot message passing beat independent views?

The upstream paper's headline result (SURVEY.md [P]) is that GNN fusion
improves dense depth vs a single-robot baseline. This runs the controlled
comparison on the synthetic parallax dataset: identical encoder/decoder/
optimizer/data, fusion = none | mean | attention, and reports eval metrics.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/fusion_ablation.py \
        [--steps 600] [--image 48] [--robots 5] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--image", type=int, default=48)
    p.add_argument("--robots", type=int, default=5)
    p.add_argument("--scenes", type=int, default=256)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--heads", type=int, default=1)
    p.add_argument("--degraded", type=float, default=0.0,
                   help="fraction of robots with corrupted cameras — "
                        "attention should beat mean here")
    p.add_argument("--seg", action="store_true",
                   help="add the segmentation head (6 classes) so the "
                        "ablation reports seg mIoU alongside depth — the "
                        "contract metric line names both (BASELINE.json:2)")
    args = p.parse_args()

    import jax
    from mrp_gnn_tpu.config import get_config
    from mrp_gnn_tpu.evaluate import evaluate
    from mrp_gnn_tpu.train import train

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    results = {}
    for fusion in ("none", "mean", "attention"):
        cfg = get_config("five_robot_attention")
        n_seg = 6 if args.seg else 0
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, image_size=(args.image, args.image),
                fusion=fusion, dtype=args.dtype, num_seg_classes=n_seg,
                attention_heads=args.heads if fusion == "attention" else 1),
            data=dataclasses.replace(
                cfg.data, image_size=(args.image, args.image),
                num_robots=args.robots, scenes_per_batch=4,
                num_train_scenes=args.scenes, num_eval_scenes=64,
                num_seg_classes=n_seg,
                degraded_fraction=args.degraded),
            train=dataclasses.replace(
                cfg.train, steps=args.steps,
                seg_loss_weight=0.5 if args.seg else 0.0,
                log_every=max(args.steps // 4, 1)),
        )
        t0 = time.time()
        state, recs = train(cfg)
        ev = evaluate(cfg, state.params)
        results[fusion] = ev
        miou = f" miou={ev['miou']:.4f}" if "miou" in ev else ""
        print(f"[{fusion}] train {time.time()-t0:.0f}s "
              f"final_loss={recs[-1]['total']:.4f} "
              f"rmse={ev['rmse']:.4f} abs_rel={ev['abs_rel']:.4f} "
              f"d1={ev['delta1']:.4f}{miou}", file=sys.stderr, flush=True)
    def _round(v):
        if isinstance(v, list):
            return [_round(x) for x in v]
        return round(v, 5) if isinstance(v, float) else v

    print(json.dumps({f: {k: _round(v) for k, v in ev.items()}
                      for f, ev in results.items()}))


if __name__ == "__main__":
    main()
