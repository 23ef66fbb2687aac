"""Worker process for the REAL multi-process distributed test.

``tests/test_multiprocess.py`` launches two of these with
``XLA_FLAGS=--xla_force_host_platform_device_count=4``: together they form
one logical 8-device CPU "pod" with cross-process Gloo collectives — the
same code path (``jax.distributed.initialize`` + per-host batch assembly
through ``jax.make_array_from_process_local_data``) a real multi-host v5e
pod slice runs. This is the executable proof of the
``jax.process_count() > 1`` branches of ``parallel/mesh.py`` and
``train/trainer.run_train_epoch`` that single-process tests can only
simulate.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port> <out_prefix>
Writes <out_prefix>.json (per-epoch losses) and <out_prefix>.npz (final
params) for the launching test to compare against a single-process run.
"""
import json
import sys
from pathlib import Path

import jax

# The axon TPU sitecustomize force-sets jax_platforms in every process;
# config.update (not just env) is required to actually run on CPU.
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    out_prefix = Path(sys.argv[4])

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from av1tpu.parallel.mesh import distributed_init, make_mesh

    distributed_init(f"127.0.0.1:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, "not a real multi-process run"
    assert len(jax.local_devices()) * num_processes == len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    from av1tpu.train import (
        StepConfig,
        TrainState,
        adamw,
        binary_focal_loss,
        make_train_step,
        run_train_epoch,
    )
    from tests.test_train import TinyModel, make_synthetic

    mesh = make_mesh()  # data-parallel over all 8 GLOBAL devices
    data = make_synthetic(n=64, seed=7)  # every host holds the full arrays;
    # run_train_epoch host-shards the epoch index order per process

    model = TinyModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1), jnp.float32)
    )
    optimizer = adamw(1e-3)
    cfg = StepConfig(loss_fn=binary_focal_loss, label_key="stage1", binary=True)
    step = make_train_step(model, optimizer, cfg)
    state = TrainState.create(variables, optimizer)

    losses = []
    for epoch in range(2):
        state, result = run_train_epoch(
            step,
            state,
            data,
            batch_size=16,  # GLOBAL batch; each host feeds 8 rows/step
            rng_key=jax.random.PRNGKey(5),
            epoch_seed=100 + epoch,
            num_classes=2,
            mesh=mesh,
        )
        losses.append(result.loss)

    leaves = jax.tree_util.tree_leaves(state.params)
    np.savez(
        str(out_prefix) + ".npz",
        **{f"leaf{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    Path(str(out_prefix) + ".json").write_text(
        json.dumps({"losses": losses, "process_id": process_id})
    )
    print(f"[p{process_id}] done losses={losses}", flush=True)


if __name__ == "__main__":
    main()
