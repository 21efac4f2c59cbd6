"""Multi-host initialization — the DCN leg of the scale-out plan.

The reference never goes beyond one process (SURVEY.md §2.3: no
torch.distributed, no process groups). The TPU plan: the SAME single-program
code runs on every host; ``jax.distributed.initialize`` wires hosts over
DCN, ``jax.devices()`` then spans all chips, and the existing ``data``-axis
mesh + shardings scale transparently (collectives ride ICI within a slice,
DCN across slices).

Call :func:`initialize_multihost` once at program start on every host (or
rely on auto-detection under TPU pod runtimes where no arguments are
needed).
"""

from __future__ import annotations

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed and return a topology summary.

    With no arguments, uses the TPU pod runtime's auto-bootstrap. Returns
    {'process_index', 'process_count', 'local_devices', 'global_devices'}.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def add_multihost_flags(parser) -> None:
    """Attach the shared multi-host bootstrap flags (run the SAME command on
    every host); used by every CLI entry point."""
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize before device use")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (omit under TPU pod runtimes)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def maybe_initialize_from_args(args) -> dict | None:
    """Bootstrap multi-host from parsed CLI flags; no-op unless --multihost."""
    if not getattr(args, "multihost", False):
        return None
    info = initialize_multihost(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(f"multihost: {info}")
    return info
