"""Benchmark: fused hierarchical inference throughput (superblocks/sec/chip).

Measures the headline metric from BASELINE.json — stage-1..3 hierarchical
partition inference over 16x16 luma superblocks — on the available chip via
the fused dense-masked pipeline (av1tpu.eval.hierarchy), in bfloat16.

``vs_baseline`` compares against the reference pipeline's throughput: the
same four ResNet-18+SE+SA forwards with gather-based sub-batch routing in
eager PyTorch (the compute graph of
pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127, batch 256) run on
this host's CPU — measured live unless a cached measurement exists in
``bench_baseline.json``. The reference published no throughput numbers
(SURVEY.md §6), so the measured torch-CPU pipeline is the baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "superblocks/sec", "vs_baseline": N}
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

BATCH = 8192
WARMUP_ITERS = 5
# Enough iterations to amortize per-dispatch latency (the axon tunnel adds
# milliseconds per call; marginal device time is what we report).
TIMED_ITERS = 50
BASELINE_CACHE = Path(__file__).parent / "bench_baseline.json"


def bench_tpu() -> float:
    import jax

    # Persistent compile cache: repeat bench runs skip the ~minutes-long
    # cold XLA compile of the four ResNet graphs.
    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from av1tpu.eval import PipelineModels, make_v6_pipeline
    from av1tpu.models import (
        Stage1Model,
        Stage2Model,
        Stage3ABModel,
        Stage3RectModel,
    )

    dtype = jnp.bfloat16
    sample = jnp.zeros((2, 16, 16, 1), dtype=jnp.float32)

    def build(model_cls, seed):
        model = model_cls(dtype=dtype)
        from av1tpu.utils.initialization import init_on_cpu

        variables = init_on_cpu(model, jax.random.PRNGKey(seed), sample)
        return model, variables

    s1, s1v = build(Stage1Model, 1)
    s2, s2v = build(Stage2Model, 2)
    s3r, s3rv = build(Stage3RectModel, 3)
    s3a, s3av = build(Stage3ABModel, 4)
    predict = make_v6_pipeline(
        PipelineModels(s1, s1v, s2, s2v, s3r, s3rv, s3a, s3av),
        stage1_threshold=0.45,
        input_dtype=dtype,
    )

    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 1024, size=(BATCH, 16, 16, 1)),
        dtype=jnp.uint16,
    )
    for _ in range(WARMUP_ITERS):
        out = predict(images)
    jax.block_until_ready(out["final"])

    start = time.perf_counter()
    for _ in range(TIMED_ITERS):
        out = predict(images)
    jax.block_until_ready(out["final"])
    seconds = time.perf_counter() - start
    return BATCH * TIMED_ITERS / seconds


def bench_torch_cpu_reference(num_samples: int = 512, batch: int = 256) -> float:
    """Reference-equivalent pipeline throughput in eager torch on CPU."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from torch_reference import TorchImprovedBackbone

    class StageModel(nn.Module):
        def __init__(self, outputs):
            super().__init__()
            self.backbone = TorchImprovedBackbone()
            self.fc = nn.Linear(512, outputs)

        def forward(self, x):
            return self.fc(self.backbone(x))

    torch.manual_seed(0)
    with torch.no_grad():
        s1 = StageModel(1).eval()
        s2 = StageModel(3).eval()
        s3r = StageModel(2).eval()
        s3a = StageModel(4).eval()

        x = torch.rand(num_samples, 1, 16, 16)
        # warmup
        _ = s1(x[:batch])

        start = time.perf_counter()
        for i in range(0, num_samples, batch):
            xb = x[i : i + batch]
            probs = torch.sigmoid(s1(xb)).squeeze(1)
            final = torch.zeros(len(xb), dtype=torch.long)
            part_idx = (probs >= 0.45).nonzero(as_tuple=True)[0]
            if len(part_idx):
                s2_pred = s2(xb[part_idx]).argmax(dim=1)
                split_idx = part_idx[s2_pred == 0]
                final[split_idx] = 1
                rect_idx = part_idx[s2_pred == 1]
                if len(rect_idx):
                    final[rect_idx] = s3r(xb[rect_idx]).argmax(dim=1) + 2
                ab_idx = part_idx[s2_pred == 2]
                if len(ab_idx):
                    final[ab_idx] = s3a(xb[ab_idx]).argmax(dim=1) + 4
        seconds = time.perf_counter() - start
    return num_samples / seconds


def get_baseline() -> float:
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["torch_cpu_superblocks_per_sec"]
    value = bench_torch_cpu_reference()
    BASELINE_CACHE.write_text(
        json.dumps(
            {
                "torch_cpu_superblocks_per_sec": value,
                "note": "reference-equivalent 4x ResNet18+SE+SA gather-routed "
                "pipeline, eager torch CPU, batch 256 (measured on this host)",
            },
            indent=2,
        )
    )
    return value


def main() -> None:
    tpu_throughput = bench_tpu()
    baseline = get_baseline()
    print(
        json.dumps(
            {
                "metric": "superblocks/sec/chip stage1-3 hierarchical inference",
                "value": round(tpu_throughput, 1),
                "unit": "superblocks/sec",
                "vs_baseline": round(tpu_throughput / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
