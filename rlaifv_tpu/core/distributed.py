"""Multi-host runtime init + object collectives.

Replaces torch.distributed/NCCL init and object gathers (ref:
muffin/llava15_gen_data.py:233-238 `init_process_group('nccl')`,
:388-404 `all_gather_object`; hand-rolled pickle all_gather at
omnilmm/model/utils.py:503-543). Under JAX one `jax.distributed.initialize`
per host replaces the launcher env plumbing; in-program tensor collectives
are compiled by XLA over ICI/DCN; host-object gathers ride
multihost_utils.process_allgather.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent multi-host init. No-ops single-process (tests, 1 host)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    spec = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if spec is None:
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=spec,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary (pickle-able) object from every host."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj))


def barrier(name: str = "barrier") -> None:
    """Host barrier == tiny sync_global_devices (ref torch barrier calls)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
