"""Model ensembles: voting, uncertainty, weighting, stacking, diversity.

Rebuild of ``pesquisa_v6/v6_pipeline/ensemble.py`` on stacked logit arrays:
members' logits are computed dense (one batched forward per member, or one
vmapped forward when parameters are stacked) and combined with pure
array ops — no per-model Python loops at prediction time.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def soft_vote(member_logits: np.ndarray) -> np.ndarray:
    """Mean softmax probability -> argmax (parity: ensemble.py:51-56)."""
    probs = jax.nn.softmax(jnp.asarray(member_logits), axis=-1)
    return np.asarray(jnp.argmax(jnp.mean(probs, axis=0), axis=-1))


def hard_vote(member_logits: np.ndarray) -> np.ndarray:
    """Per-member argmax -> majority vote; ties resolve to the smallest
    class id, matching torch.mode semantics (parity: ensemble.py:58-79)."""
    preds = np.argmax(member_logits, axis=-1)  # (M, N)
    num_classes = member_logits.shape[-1]
    counts = np.apply_along_axis(
        lambda col: np.bincount(col, minlength=num_classes), 0, preds
    )  # (num_classes, N)
    return counts.argmax(axis=0)


def predict_with_uncertainty(member_logits: np.ndarray) -> Dict[str, np.ndarray]:
    """Mean/std of member probabilities + agreement fraction
    (parity: ensemble.py:83-117)."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(member_logits), axis=-1))
    mean_probs = probs.mean(axis=0)
    std_probs = probs.std(axis=0)
    preds = mean_probs.argmax(axis=-1)
    member_preds = probs.argmax(axis=-1)  # (M, N)
    agreement = (member_preds == preds[None, :]).mean(axis=0)
    return {
        "predictions": preds,
        "mean_probs": mean_probs,
        "std_probs": std_probs,
        "agreement": agreement,
    }


def weighted_vote(member_logits: np.ndarray, weights: Sequence[float]) -> np.ndarray:
    """Weighted soft voting (parity: WeightedEnsemble, ensemble.py:156-183)."""
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    probs = np.asarray(jax.nn.softmax(jnp.asarray(member_logits), axis=-1))
    return np.einsum("m,mnc->nc", w, probs).argmax(axis=-1)


def fit_stacking(
    member_logits: np.ndarray,
    labels: np.ndarray,
    l2: float = 1e-3,
    steps: int = 500,
    lr: float = 0.1,
    seed: int = 0,
) -> np.ndarray:
    """Fit the stacking meta-model: multinomial logistic regression over the
    concatenation of member probabilities (parity: StackingEnsemble,
    ensemble.py:186-226 — a Linear meta-model over concat probs).

    Returns the meta weight matrix ``(M*C + 1, C)`` (bias folded in).
    Trained with full-batch gradient descent in jax.
    """
    probs = np.asarray(jax.nn.softmax(jnp.asarray(member_logits), axis=-1))
    m, n, c = probs.shape
    feats = probs.transpose(1, 0, 2).reshape(n, m * c)
    feats = np.concatenate([feats, np.ones((n, 1))], axis=1)
    x = jnp.asarray(feats, dtype=jnp.float32)
    y = jnp.asarray(labels)

    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (m * c + 1, c), dtype=jnp.float32) * 0.01

    import optax

    def loss_fn(w):
        logits = x @ w
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return ce + l2 * jnp.sum(w * w)

    grad_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(steps):
        w = w - lr * grad_fn(w)
    return np.asarray(w)


def stacking_predict(member_logits: np.ndarray, meta_w: np.ndarray) -> np.ndarray:
    probs = np.asarray(jax.nn.softmax(jnp.asarray(member_logits), axis=-1))
    m, n, c = probs.shape
    feats = probs.transpose(1, 0, 2).reshape(n, m * c)
    feats = np.concatenate([feats, np.ones((n, 1))], axis=1)
    return (feats @ meta_w).argmax(axis=-1)


def ensemble_diversity(member_logits: np.ndarray) -> Dict[str, object]:
    """Pairwise disagreement rates (parity: evaluate_ensemble_diversity,
    ensemble.py:252-293)."""
    preds = np.argmax(member_logits, axis=-1)
    m = preds.shape[0]
    pair_disagreement = {}
    vals = []
    for i in range(m):
        for j in range(i + 1, m):
            d = float((preds[i] != preds[j]).mean())
            pair_disagreement[f"{i}-{j}"] = d
            vals.append(d)
    return {
        "pairwise_disagreement": pair_disagreement,
        "mean_disagreement": float(np.mean(vals)) if vals else 0.0,
    }


def stacked_member_logits(
    model, member_variables: List, images, batch_size: int = 4096
) -> np.ndarray:
    """Compute logits for every ensemble member by vmapping the SAME model
    over stacked parameter pytrees — one compiled executable evaluates all
    members per batch (the TPU-native replacement for the reference's
    Python loop over 3 models)."""
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *member_variables
    )

    @jax.jit
    def run(vars_stacked, x):
        return jax.vmap(lambda v: model.apply(v, x, train=False))(vars_stacked)

    n = images.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = jnp.asarray(images[start : start + batch_size])
        outs.append(np.asarray(run(stacked, chunk)))
    return np.concatenate(outs, axis=1)


def save_ensemble(directory, member_variables: List, meta: Optional[Dict] = None):
    """Persist ensemble members + metadata (parity: ABEnsemble.save_ensemble,
    ensemble.py:119-137). One flat-variables npz per member + ensemble.json."""
    import json
    from pathlib import Path

    from av1tpu.train.checkpoint import save_variables_npz

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, variables in enumerate(member_variables, start=1):
        paths.append(
            save_variables_npz(directory / f"member_{i}_variables.npz", variables)
        )
    payload = {"num_members": len(member_variables), **(meta or {})}
    (directory / "ensemble.json").write_text(json.dumps(payload, indent=2))
    return paths


def load_ensemble(directory):
    """Load all members saved by :func:`save_ensemble`; returns
    ``(member_variables, meta)``."""
    import json
    from pathlib import Path

    from av1tpu.train.checkpoint import load_variables_npz

    directory = Path(directory)
    meta = json.loads((directory / "ensemble.json").read_text())
    members = [
        load_variables_npz(directory / f"member_{i}_variables.npz")
        for i in range(1, meta["num_members"] + 1)
    ]
    return members, meta


def tta_logits(model, variables, images, batch_size: int = 4096) -> np.ndarray:
    """Test-time-augmentation logits: mean over the 4 TTA views
    (original/hflip/vflip/rot180 — parity with TestTimeAugmentation,
    augmentation.py:251-276), evaluated as one vmapped forward per batch."""
    from av1tpu.train.augment import tta_views

    @jax.jit
    def run(x):
        views = tta_views(x)  # (4, B, H, W, C)
        logits = jax.vmap(lambda v: model.apply(variables, v, train=False))(views)
        return jnp.mean(logits, axis=0)

    n = images.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        outs.append(np.asarray(run(jnp.asarray(images[start : start + batch_size]))))
    return np.concatenate(outs, axis=0)


__all__ = [
    "ensemble_diversity",
    "fit_stacking",
    "hard_vote",
    "load_ensemble",
    "predict_with_uncertainty",
    "save_ensemble",
    "soft_vote",
    "stacked_member_logits",
    "stacking_predict",
    "tta_logits",
    "weighted_vote",
]
