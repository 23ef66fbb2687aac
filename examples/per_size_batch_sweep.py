"""Per-block-size batch sweep for the folded serving graph (MFU tuning).

Round-3 verdict: 8px MFU 23.1% and 32px 35.0% vs 41.2% at the 16px
headline — the per-size serving graphs leave MXU idle. The cheapest lever
is the serving batch (rows of the implicit GEMM each conv lowers to), so
this sweeps batch per block size on the real chip and prints a
markdown-ready table; bench.py's per-size batches are set from the result
(see docs/PARITY.md "per-size serving batch").

    python examples/per_size_batch_sweep.py [--sizes 8 32 64 16]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_BF16_PEAK_FLOPS = 197e12


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[8, 32, 64, 16])
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _build_models, _time_predict
    from av1tpu.eval import make_v6_pipeline_folded

    dtype = jnp.bfloat16
    models = _build_models(dtype)
    sweep = {
        8: (8192, 16384, 32768, 65536),
        16: (4096, 8192, 16384, 32768),
        32: (1024, 2048, 4096, 8192),
        64: (256, 512, 1024, 2048),
    }
    print("| px | batch | sb/s | MFU |")
    print("|---|---|---|---|")
    best = {}
    for px in args.sizes:
        for batch in sweep[px]:
            predict = make_v6_pipeline_folded(
                models, stage1_threshold=0.45, float_dtype=dtype
            )
            try:
                thr, fps, mfu = _time_predict(
                    predict, batch, px, iters=args.iters
                )
            except Exception as exc:  # e.g. HBM OOM at the top batch
                print(f"| {px} | {batch} | FAILED: {type(exc).__name__} | |",
                      flush=True)
                continue
            print(f"| {px} | {batch} | {thr:,.0f} | "
                  f"{mfu * 100 if mfu else 0:.1f}% |", flush=True)
            if px not in best or thr > best[px][1]:
                best[px] = (batch, thr, mfu)
    print("\nbest:", {
        px: {"batch": b, "sb_per_s": round(t, 1),
             "mfu": round(m, 4) if m else None}
        for px, (b, t, m) in best.items()
    })


if __name__ == "__main__":
    main()
