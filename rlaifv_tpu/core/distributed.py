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
    """Idempotent multi-host init. No-ops single-process (tests, 1 host).

    NB: must not touch the XLA backend before jax.distributed.initialize —
    jax.process_count() would initialize it (bug caught by the REAL
    2-process run, tests/test_two_process.py)."""
    if jax.distributed.is_initialized():
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
    """Gather an arbitrary (pickle-able) object from every host.

    `multihost_utils.process_allgather` only accepts pytrees of uniformly
    shaped arrays — the ref-logp payload (ragged per-token logp lists,
    ref muffin/eval/muffin_inference_logp.py:331 `all_gather_object`) is
    not one. Serialize to bytes, gather lengths, pad to the max, gather
    the padded uint8 buffers, unpickle per process. Covered by a REAL
    2-process run in tests/test_two_process.py.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    lengths = multihost_utils.process_allgather(np.int64(blob.size))
    max_len = int(np.max(lengths))
    padded = np.zeros(max_len, np.uint8)
    padded[: blob.size] = blob
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(lengths[i])].tobytes())
        for i in range(jax.process_count())
    ]


def barrier(name: str = "barrier") -> None:
    """Host barrier == tiny sync_global_devices (ref torch barrier calls)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def assert_consistent(value: Any, name: str = "value") -> None:
    """Debug guard: every process must hold an identical `value`.

    The TPU-world analog of TORCH_DISTRIBUTED_DEBUG=DETAIL's collective
    checks (ref script/eval/eval_rlaifv_objhal.sh:3): divergent host state
    (config, RNG seed, dataset shard math) is the classic cause of silent
    multi-host corruption under SPMD — collectives themselves are compiled,
    so the only thing that can disagree is what the hosts feed them.
    Enable via RLAIFV_DISTRIBUTED_DEBUG=1; no-op single-process or when the
    flag is off (zero cost in production).
    """
    if jax.process_count() == 1:
        return
    if os.environ.get("RLAIFV_DISTRIBUTED_DEBUG", "0") != "1":
        return
    import json

    try:
        blob = json.dumps(value, sort_keys=True, default=repr)
    except TypeError:
        blob = repr(value)
    gathered = all_gather_objects(blob)
    if any(g != gathered[0] for g in gathered):
        detail = "\n".join(
            f"  process {i}: {g[:200]}" for i, g in enumerate(gathered)
        )
        raise AssertionError(
            f"[distributed-debug] '{name}' differs across processes:\n"
            f"{detail}"
        )
