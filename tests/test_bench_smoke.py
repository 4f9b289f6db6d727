"""bench.py must run end-to-end (both flavors) — validated tiny on CPU so
relay time is never burned on a broken bench script."""

import json

import pytest


@pytest.mark.slow
def test_bench_both_flavors_tiny(capsys):
    import bench
    from sdpgs_tpu.models.dpt import DPTArch

    old = (bench.WIDTH, bench.HEIGHT, bench.ALIVE, bench.CAPACITY, bench.DPT_ARCH)
    bench.WIDTH, bench.HEIGHT = 64, 48
    bench.ALIVE, bench.CAPACITY = 1024, 2048
    bench.DPT_ARCH = DPTArch.tiny_hybrid()
    try:
        bench.main(plain_timed_iters=1, pseudo_timed_iters=1)
    finally:
        (bench.WIDTH, bench.HEIGHT, bench.ALIVE, bench.CAPACITY,
         bench.DPT_ARCH) = old
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "train_iters_per_s_protocol"
    assert rec["value"] > 0
    assert rec["plain_iters_per_s"] > 0
    assert rec["pseudo_iters_per_s"] > 0
    assert "estimated" in rec["baseline_note"]
