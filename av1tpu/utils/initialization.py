"""Fast model initialization.

Flax's ``Module.init`` executes its trace eagerly, op by op — on a
high-latency TPU attachment (e.g. a tunneled chip) that costs minutes per
ResNet. Initializing on the host CPU backend is ~5x faster and produces
identical pytrees; the arrays migrate to the accelerator on first jitted
use.
"""
from __future__ import annotations

import jax


def init_on_cpu(model, rngs, *args, **kwargs):
    """``model.init(...)`` executed on the host CPU backend."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return model.init(rngs, *args, **kwargs)
    with jax.default_device(cpu):
        return model.init(rngs, *args, **kwargs)


__all__ = ["init_on_cpu"]
