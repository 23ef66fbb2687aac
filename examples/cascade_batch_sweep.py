"""Superblocks-per-dispatch sweep for the composed 4-level tree cascade.

The cascade (bench.bench_tree_cascade) evaluates every 64->32->16->8 node
of ``n`` resident superblocks, so its per-level serving batches are
n/4n/16n/64n. The round-4 per-size sweep (docs/PARITY.md "per-size
serving batch") showed the small-block graphs keep gaining MFU well past
the n=512 level batches (8px peaked at 65536 rows = n=1024), so this
sweeps ``n`` on the real chip to find the cascade's own optimum.

    python examples/cascade_batch_sweep.py [--n 512 1024 2048]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, nargs="+", default=[512, 1024, 2048])
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax.numpy as jnp

    from bench import _build_models, bench_tree_cascade

    dtype = jnp.bfloat16
    models = _build_models(dtype)
    print("| n (superblocks/dispatch) | trees/s | MFU |")
    print("|---|---|---|")
    results = []
    for n in args.n:
        try:
            r = bench_tree_cascade(
                models, dtype, n_superblocks=n, iters=args.iters
            )
        except Exception as exc:  # e.g. HBM OOM at the top n
            print(f"| {n} | FAILED: {type(exc).__name__} | |", flush=True)
            continue
        results.append(r)
        mfu = r["mfu"]
        print(f"| {n} | {r['trees_per_sec']:,.0f} | "
              f"{mfu * 100 if mfu else 0:.1f}% |", flush=True)
    print("\nbest:", json.dumps(
        max(results, key=lambda r: r["trees_per_sec"]) if results else None
    ))


if __name__ == "__main__":
    main()
