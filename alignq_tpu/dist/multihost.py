"""Multi-host (multi-process) execution layer.

No reference equivalent — the reference is a single-GPU codebase with no
torch.distributed import anywhere (SURVEY.md section 2.1 comm-backend row);
this implements SURVEY.md section 7 build-plan item 7 ("multi-host init")
and the BASELINE.json 2-host north star the TPU-native way:

- `initialize()` bootstraps `jax.distributed` (coordinator rendezvous) from
  explicit args or ALIGNQ_* env vars. On a TPU pod slice with no args,
  jax's own cluster auto-detection applies. On the CPU backend the gloo
  cross-process collective implementation is selected, which makes the
  whole layer testable with N localhost processes
  (tests/test_multihost.py runs a REAL 2-process fit and checks the loss
  trajectory equals single-process).
- data: every host materializes the same deterministic global batch from
  its seeded loader; `local_batch_slice` keeps this process's contiguous
  rows and `global_batch_from_local` assembles the global jax.Array via
  `jax.make_array_from_process_local_data` — per-host input pipelines with
  zero cross-host data motion (the host never touches remote shards).
- observability: `is_primary()` gates logging/metric writers; orbax
  checkpointing stays a COLLECTIVE call (every process calls save/restore;
  orbax writes each process's addressable shards and process 0 the
  metadata) — see train/loop.py fit().

Call `initialize()` BEFORE the first JAX operation of the process: backend
setup is global, and an already-initialized single-process runtime cannot
join a multi-process rendezvous afterwards.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process rendezvous (idempotent).

    Argument defaults come from the environment: ALIGNQ_COORDINATOR,
    ALIGNQ_NUM_PROCESSES, ALIGNQ_PROCESS_ID. With everything None (e.g. on
    a TPU pod slice launched through a cluster scheduler),
    jax.distributed.initialize auto-detects the topology.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "ALIGNQ_COORDINATOR"
    )
    if num_processes is None and os.environ.get("ALIGNQ_NUM_PROCESSES"):
        num_processes = int(os.environ["ALIGNQ_NUM_PROCESSES"])
    if process_id is None and os.environ.get("ALIGNQ_PROCESS_ID"):
        process_id = int(os.environ["ALIGNQ_PROCESS_ID"])
    try:
        # CPU backend cross-process collectives (no-op for TPU, where the
        # ICI/DCN fabric is used); must be set before backend init
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # older/newer jax without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def active() -> bool:
    """True when this runtime spans more than one process."""
    return jax.process_count() > 1


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_slice(batch: Any, num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> Any:
    """This process's contiguous row shard of a host-identical global batch.

    The loaders are deterministic and seeded, so every host materializes
    the same global batch; each keeps rows [p*B/N, (p+1)*B/N). In a real
    deployment the per-host pipeline would read only its file shards — the
    slice point is the same either way, and this form lets one seeded
    loader serve any N.
    """
    n = num_processes if num_processes is not None else jax.process_count()
    p = process_id if process_id is not None else jax.process_index()

    def f(x):
        b = x.shape[0]
        if b % n:
            raise ValueError(f"global batch {b} not divisible by {n} processes")
        bl = b // n
        return x[p * bl:(p + 1) * bl]

    return jax.tree.map(f, batch)


def global_batch_from_local(local_batch: Any, mesh, data_axis: str = "data") -> Any:
    """Assemble the global batch jax.Array from per-process local rows.

    Requires the mesh's device order to place each process's devices
    contiguously along `data_axis` (true for make_mesh over jax.devices(),
    which sorts by process).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(data_axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), local_batch
    )


def place_batch_multihost(batch: Any, mesh, data_axis: str = "data") -> Any:
    """host-identical global batch -> sharded global jax.Array, moving only
    this process's rows to its devices."""
    return global_batch_from_local(local_batch_slice(batch), mesh, data_axis)
