"""Orbax checkpointing with save->restore->re-verify round trips.

The reference checkpoints with raw ``torch.save`` and documents an
unresolved nondeterministic F1 drop after reload (Exp 10A/11A — quirk Q4 in
SURVEY.md: 48.52% in-training -> 25.90% after restore). This module makes
the round-trip check the reference only sketched
(docs_v6/11_exp11a_adapter_layers.md:268-270) a built-in:
``save_checkpoint(..., verify=True)`` restores what it just wrote and
asserts bitwise pytree equality, raising on any mismatch.

Checkpoint contract mirrors the reference payload
(``{epoch, model_state_dict, optimizer_state_dict, best_metric, ...}``,
003:292-313) as ``{state: TrainState, meta: dict}``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from av1tpu.train.trainer import TrainState


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _trees_equal(a, b) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    if len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def save_checkpoint(
    directory: Path,
    state: TrainState,
    meta: Optional[Dict[str, Any]] = None,
    verify: bool = True,
) -> Path:
    """Write one checkpoint directory; optionally verify by restoring."""
    directory = Path(directory).absolute()
    directory.parent.mkdir(parents=True, exist_ok=True)
    host_state = _to_host(state)

    ckptr = ocp.StandardCheckpointer()
    if directory.exists():
        import shutil

        shutil.rmtree(directory)
    ckptr.save(directory, host_state)
    ckptr.wait_until_finished()
    if meta is not None:
        (directory / "meta.json").write_text(json.dumps(meta, indent=2, default=str))

    if verify:
        restored = ckptr.restore(directory, host_state)
        if not _trees_equal(host_state, restored):
            raise RuntimeError(
                f"checkpoint round-trip mismatch at {directory} — "
                "saved and restored pytrees differ (quirk-Q4 guard)"
            )
    return directory


def restore_checkpoint(
    directory: Path, template: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a checkpoint into the structure of ``template``."""
    directory = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(directory, _to_host(template))
    meta_path = directory / "meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return restored, meta


def transplant_backbone(
    target_params: Dict, source_params: Dict, prefix: str = "backbone"
) -> Dict:
    """Copy a backbone subtree from one model's params into another's.

    The functional analogue of the reference's prefix-filtered
    ``load_state_dict(strict=False)`` transplants (013:53-64, 004:327-349,
    005:451-457): shapes must match exactly; head subtrees are untouched.
    """
    import flax

    target = flax.core.unfreeze(target_params)
    source = flax.core.unfreeze(source_params)
    if prefix not in source:
        raise KeyError(f"source has no '{prefix}' subtree")
    src = source[prefix]
    dst = target.get(prefix)
    if dst is not None:
        src_shapes = jax.tree_util.tree_map(lambda a: a.shape, src)
        dst_shapes = jax.tree_util.tree_map(lambda a: a.shape, dst)
        if src_shapes != dst_shapes:
            raise ValueError("backbone structure mismatch; cannot transplant")
    target[prefix] = src
    return target


def merge_v5_pipeline_variables(
    stage2_vars: Dict[str, Any],
    specialist_vars: Dict[str, Dict[str, Any]],
) -> Dict[str, Any]:
    """Assemble the merged v5 multi-head eval checkpoint.

    Mirrors the reference's pipeline model assembly
    (``013_run_pipeline_eval.py:66-94``): the stage-2 state supplies the
    backbone + stage-1/stage-2 heads, then each specialist head subtree is
    taken from its own stage-3 checkpoint. The result is the "merged
    multi-head model variables" ``run_pipeline_eval --v5-checkpoint``
    consumes.
    """
    import flax

    out: Dict[str, Any] = {}
    for col in ("params", "batch_stats"):
        if col not in stage2_vars and not any(
            col in v for v in specialist_vars.values()
        ):
            continue
        merged = flax.core.unfreeze(stage2_vars.get(col, {}))
        for head, vars_ in specialist_vars.items():
            key = f"specialist_{head}"
            src = vars_.get(col, {})
            if key in src:
                merged[key] = src[key]
        out[col] = merged
    return out


def save_variables_npz(path: Path, variables: Dict[str, Any]) -> Path:
    """Template-free flat save of model variables (params/batch_stats).

    Keys are slash-joined tree paths; loading reconstructs the nested dicts
    without needing a model template — the load path every inference CLI
    uses. (Orbax holds the full TrainState for training resume; this holds
    just the model.)
    """
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) or hasattr(node, "items"):
            for key, value in node.items():
                walk(prefix + (str(key),), value)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk((), variables)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_variables_npz(path: Path) -> Dict[str, Any]:
    with np.load(Path(path)) as z:
        tree: Dict[str, Any] = {}
        for key in z.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = z[key]
    return tree


__all__ = [
    "load_variables_npz",
    "restore_checkpoint",
    "save_checkpoint",
    "save_variables_npz",
    "transplant_backbone",
]
