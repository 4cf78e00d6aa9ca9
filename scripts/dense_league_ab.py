"""Settle the dense (block-diagonal) league: XLA einsum vs Pallas block
kernel, interleaved over many rounds (VERDICT r3 #3).

History: the lead TRADES between driver runs (r02 pallas +1.6%, r03 xla
+12%, r04 pallas +6%) while both sit at/above the in-run block roofline.
This script runs ONLY the two block variants + the stream probe for many
interleaved rounds in one process, so the comparison shares every chip
condition, and prints per-round ratios + the spread.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import make_edge_block_bench, make_stream_probe

    import jax
    log(f"backend={jax.default_backend()}")
    V, E, D, dk, iters, rounds = 8192, 8192 * 7, 2048, 64, 50, 8
    benches = {
        "xla_block": make_edge_block_bench("xla", V, E, D, dk, iters,
                                           kind="block", bf16=True),
        "pallas_block": make_edge_block_bench("pallas", V, E, D, dk, iters,
                                              kind="block", bf16=True),
    }
    probe = make_stream_probe(V, D, iters)
    ratios, bws = [], []
    for r in range(rounds):
        bw = probe()
        tx = benches["xla_block"][0]()
        tp = benches["pallas_block"][0]()
        # second half-round in reversed order cancels drift inside a round
        tx2 = benches["xla_block"][0]()
        tp2 = benches["pallas_block"][0]()
        ratio = min(tx, tx2) / min(tp, tp2)  # >1 => pallas faster
        ratios.append(ratio)
        bws.append(bw)
        log(f"round {r}: stream={bw/1e9:,.1f} GB/s  xla={min(tx,tx2)*1e3:.0f}ms"
            f"  pallas={min(tp,tp2)*1e3:.0f}ms  pallas/xla_speed={ratio:.3f}")
    ratios = np.array(ratios)
    print(f"rounds={rounds} pallas/xla speed ratio "
          f"mean={ratios.mean():.3f} min={ratios.min():.3f} "
          f"max={ratios.max():.3f} std={ratios.std():.3f} "
          f"stream_spread={min(bws)/1e9:.0f}-{max(bws)/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
