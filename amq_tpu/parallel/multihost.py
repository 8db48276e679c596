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
    """Mesh ('data', 'tensor') with the tensor axis inside each host."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n_local = len(jax.local_devices())
    tensor = tensor_per_host or n_local
    assert devs.size % tensor == 0
    return Mesh(devs.reshape(devs.size // tensor, tensor),
                ("data", "tensor"))
