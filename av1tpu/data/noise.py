"""Adversarial noise-injection datasets for stage-3 robustness training.

The reference's only "fault injection" capability (SURVEY.md §5): training
stage-3 specialists on a mix of clean samples and samples from *other*
partition classes carrying random specialist labels, simulating upstream
stage-2 misclassification (``005_train_stage3_rect.py:38-122`` and
``006_train_stage3_ab_fgvc.py:46-128``; results in
docs_v6/09_noise_injection_stage3.md — cascade error -93% -> -65%).

Array-level rebuild: instead of a Dataset wrapper resolving noise per
__getitem__, the mixed dataset is materialized once as index arrays +
relabeled labels — a static-shape bundle the fused trainer consumes like
any other.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from av1tpu.data.bundles import Bundle


def build_noisy_bundle(
    clean: Bundle,
    noise_sources: Sequence[Bundle],
    label_key: str,
    num_label_classes: int,
    noise_ratio: float = 0.25,
    seed: int = 42,
    label_distribution: "np.ndarray" = None,
) -> Bundle:
    """Mix ``1-noise_ratio`` clean samples with relabeled noise samples.

    Sizing matches the reference: total size == len(clean); clean subset is
    a sorted no-replacement draw; noise is split evenly across sources and
    each noise sample gets a random label in ``[0, num_label_classes)``
    (005:61-120 semantics) — uniform by default, or drawn from
    ``label_distribution`` for *confusion-based* noise injection: pass the
    real downstream-stage misclassification profile (e.g. from
    ``cli.analyze_confusion``) so injected labels mirror how the upstream
    stage actually errs (hypothesis H3.2, which the reference analyzed via
    scripts/009 but never wired into training).
    """
    if not 0.0 <= noise_ratio < 1.0:
        raise ValueError("noise_ratio must be in [0, 1)")
    total = len(clean)
    n_clean = int(total * (1.0 - noise_ratio))
    n_noise = total - n_clean

    rng = np.random.RandomState(seed)  # reference uses RandomState(seed)
    clean_indices = np.sort(rng.choice(total, n_clean, replace=False))
    parts = [clean.take(clean_indices)]

    if n_noise and noise_sources:
        per_source = n_noise // len(noise_sources)
        for src in noise_sources:
            if per_source == 0:
                continue
            idx = rng.choice(len(src), min(per_source, len(src)), replace=False)
            sub = src.take(idx)
            if label_distribution is not None:
                probs = np.asarray(label_distribution, dtype=np.float64)
                probs = probs / probs.sum()
                random_labels = rng.choice(
                    num_label_classes, size=len(sub), p=probs
                ).astype(np.int32)
            else:
                random_labels = rng.randint(
                    0, num_label_classes, size=len(sub)
                ).astype(np.int32)
            labels = {k: v.copy() for k, v in sub.labels.items()}
            labels[label_key] = random_labels
            parts.append(Bundle(samples=sub.samples, qps=sub.qps, labels=labels))

    samples = np.concatenate([p.samples for p in parts], axis=0)
    qps = np.concatenate([p.qps for p in parts], axis=0)
    keys = parts[0].labels.keys()
    labels = {
        k: np.concatenate([p.labels[k] for p in parts], axis=0) for k in keys
    }
    return Bundle(samples=samples, qps=qps, labels=labels)


__all__ = ["build_noisy_bundle"]
