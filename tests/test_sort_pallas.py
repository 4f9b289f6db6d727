"""Bitonic sort kernel (experimental, ops/sort_pallas.py) vs stable
lax.sort: bit-exact including duplicate keys and inf sentinels (the
composite (key, gid) comparator reproduces stability when gid=arange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpgs_tpu.ops.sort_pallas import sort_by_key_pallas, sort_supported


@pytest.mark.parametrize("seed,dead_frac", [(0, 0.3), (1, 0.0), (2, 0.95)])
def test_bitonic_matches_stable_lax_sort(seed, dead_frac):
    rng = np.random.default_rng(seed)
    N = 1 << 14
    assert sort_supported(N)
    depth = rng.uniform(1, 9, N).astype(np.float32)
    depth[rng.random(N) < dead_frac] = np.inf      # dead-slot sentinels
    depth[rng.random(N) < 0.05] = 2.5              # ties
    packed = rng.integers(0, 1 << 30, N).astype(np.int32)
    gid = np.arange(N, dtype=np.int32)
    ks, ps, gs = sort_by_key_pallas(
        jnp.asarray(depth), jnp.asarray(packed), jnp.asarray(gid)
    )
    rk, rp, rg = jax.lax.sort(
        (jnp.asarray(depth), jnp.asarray(packed), jnp.asarray(gid)),
        num_keys=1, is_stable=True,
    )
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(rg))


def test_sort_supported_gates():
    assert not sort_supported(1000)        # not a power of two
    assert not sort_supported(1 << 13)     # too small for transpose tiles
    assert not sort_supported(1 << 20)     # beyond the VMEM budget
    assert sort_supported(1 << 17)
