"""Multi-host entry wiring (parallel/distributed.py): flag parsing and the
``jax.distributed.initialize`` call contract. Execution on real multi-host
hardware is environment-blocked (docs/ACCEPTANCE.md); these tests pin the
CLI surface and the exact initialize() arguments."""

from types import SimpleNamespace
from unittest import mock

import pytest


def _args(**kw):
    base = dict(dist_coordinator="", dist_num_processes=None,
                dist_process_id=None)
    base.update(kw)
    return SimpleNamespace(**base)


def test_noop_without_flags(monkeypatch):
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    monkeypatch.delenv("SDPGS_COORDINATOR", raising=False)
    monkeypatch.delenv("SDPGS_NUM_PROCESSES", raising=False)
    with mock.patch("jax.distributed.initialize") as init:
        assert maybe_initialize_distributed(_args()) is False
    init.assert_not_called()


def test_explicit_flags_forwarded():
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    with mock.patch("jax.distributed.initialize") as init:
        ok = maybe_initialize_distributed(_args(
            dist_coordinator="10.0.0.1:8476", dist_num_processes=2,
            dist_process_id=1))
    assert ok
    init.assert_called_once_with(
        coordinator_address="10.0.0.1:8476", num_processes=2, process_id=1)


def test_auto_uses_zero_arg_form():
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    with mock.patch("jax.distributed.initialize") as init:
        assert maybe_initialize_distributed(_args(dist_coordinator="auto"))
    init.assert_called_once_with()


def test_env_fallback(monkeypatch):
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    monkeypatch.setenv("SDPGS_COORDINATOR", "host0:1234")
    monkeypatch.setenv("SDPGS_NUM_PROCESSES", "4")
    monkeypatch.setenv("SDPGS_PROCESS_ID", "3")
    with mock.patch("jax.distributed.initialize") as init:
        assert maybe_initialize_distributed(None)
    init.assert_called_once_with(
        coordinator_address="host0:1234", num_processes=4, process_id=3)


def test_partial_flags_rejected():
    from sdpgs_tpu.parallel.distributed import maybe_initialize_distributed

    with mock.patch("jax.distributed.initialize"):
        with pytest.raises(SystemExit):
            maybe_initialize_distributed(_args(
                dist_coordinator="10.0.0.1:8476"))


def test_train_cli_parses_dist_flags():
    from sdpgs_tpu.cli.train_cli import build_parser

    args = build_parser().parse_args([
        "-s", "/tmp/x", "--dist_coordinator", "h:1",
        "--dist_num_processes", "2", "--dist_process_id", "0",
        "--mesh", "data=2",
    ])
    assert args.dist_coordinator == "h:1"
    assert args.dist_num_processes == 2
    assert args.dist_process_id == 0
