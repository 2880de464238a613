"""Multi-host initialization and failure semantics.

The reference's multi-node story is a hand-rolled TCP protocol: a client
farms 32-px blocks to servers, admission control caps in-flight work, and
any failure is handled by infinite per-block retry with 1 s backoff
(``/root/reference/src/test.cpp:520-793``).  Under single-controller JAX
the transport, scheduling, and retry collapse into the runtime:

- ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator +
  process ranks — the moral successor of ``--server``/``--client addr``);
- the global mesh spans hosts × chips; ``shard_map`` renders need no
  explicit communication code at all — ICI/DCN collectives are emitted by
  XLA where the sharding demands them;
- host failure ⇒ job restart; forward progress is preserved by tile-grain
  checkpointing (ptx.parallel.checkpoint), the analogue of the reference's
  incremental pixel streaming — but idempotent and lossless (the reference
  drops pixels on reconnect, test.cpp:381-385, a bug we do not inherit).

For clusters without a JAX coordinator (plain CPU hosts over sockets),
ptx.runtime provides a native TCP tile farm with the same job semantics as
the reference, serving renders produced by this package.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX.  No-ops when single-process (local runs,
    tests).

    Configuration comes from the arguments or, for each one not given,
    from the environment: ``JAX_COORDINATOR`` (host:port),
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` (see README "Multi-host").
    Setting only *some* of the three is an error, not a silent no-op."""
    env = os.environ.get
    coordinator_address = coordinator_address or env("JAX_COORDINATOR")
    if num_processes is None and env("JAX_NUM_PROCESSES"):
        num_processes = int(env("JAX_NUM_PROCESSES"))
    if process_id is None and env("JAX_PROCESS_ID"):
        process_id = int(env("JAX_PROCESS_ID"))
    given = (coordinator_address is not None, num_processes is not None,
             process_id is not None)
    if not any(given):
        return                       # single-process run
    if num_processes == 1:
        return
    if not all(given):
        raise ValueError(
            "multi-process init needs all of coordinator_address, "
            "num_processes, process_id (args or JAX_COORDINATOR / "
            f"JAX_NUM_PROCESSES / JAX_PROCESS_ID); got {given}")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(tiles: int | None = None, samples: int = 1):
    """Mesh over every chip in the job (all hosts)."""
    from ptx.parallel.mesh import make_mesh
    return make_mesh(jax.devices(), tiles=tiles, samples=samples)
