"""Run parameter initialization on the host CPU backend.

Eager op dispatch to a tunneled/remote TPU costs ~1s per op; a model
init is hundreds of tiny RNG ops, so initializing "on device" can take
minutes. Arrays created under jax.default_device(cpu) are uncommitted —
they transfer to the TPU automatically (once, in bulk) the first time a
jitted program consumes them.
"""

from __future__ import annotations

import jax


def init_on_host(init_fn, *args, **kwargs):
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return init_fn(*args, **kwargs)
