"""Multi-host initialization (DCN) for galleries beyond one host.

SURVEY.md §5: within a slice, collectives ride ICI; for multi-host
deployments the SAME mesh axes simply extend over DCN. JAX needs
process-level initialization before any device use — this wraps it with
the environment-variable conventions most launchers provide.

Single-host usage is unaffected (never call this). Multi-host:

    from facerecognizeonnx_tpu.parallel.distributed import init_distributed
    init_distributed()  # reads COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    mesh = make_mesh(("model",))          # now spans all hosts' devices
    sharded_topk_search(q, gallery, k, mesh=mesh)   # gallery rows over DCN+ICI
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID). Idempotent."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
