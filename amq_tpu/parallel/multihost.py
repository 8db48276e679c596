"""Multi-host initialization + mesh construction.

The reference's multi-process substrate is HF Accelerate/NCCL
(utils/func.py:68-98).  TPU-native: ``jax.distributed.initialize`` joins
the hosts of a pod slice; the global device mesh is laid out so the
'tensor' axis stays inside a host's ICI domain and 'data' spans hosts
(DCN) — collectives for row-parallel matmuls ride ICI, only data-parallel
reductions cross DCN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the jax distributed runtime (no-op if single-process)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(tensor_per_host: Optional[int] = None):
    """Mesh ('data', 'tensor') with the tensor axis inside each host.

    Built by grouping ``jax.devices()`` by ``process_index`` explicitly —
    NOT by reshaping the flat device list, whose ordering JAX does not
    guarantee to be host-major.  Every 'tensor' row is therefore
    single-process by construction (collectives over it ride ICI); the
    'data' axis enumerates the per-host rows (DCN).  A ``tensor_per_host``
    larger than a host's device count is rejected — a tensor axis over
    DCN defeats the layout's purpose; compose meshes manually if that is
    really wanted.
    """
    import jax
    from jax.sharding import Mesh

    by_proc = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in by_proc.values()}
    assert len(counts) == 1, f"uneven local device counts: {by_proc}"
    n_local = counts.pop()
    tensor = tensor_per_host or n_local
    assert n_local % tensor == 0, (
        f"tensor_per_host={tensor} must divide the {n_local} local "
        f"devices of each host")
    rows = []
    for pid in sorted(by_proc):
        host = sorted(by_proc[pid], key=lambda d: d.id)
        rows.extend(host[i:i + tensor] for i in range(0, n_local, tensor))
    return Mesh(np.array(rows), ("data", "tensor"))
