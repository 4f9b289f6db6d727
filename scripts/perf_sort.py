"""R4: Pallas bitonic sort vs lax.sort at binning shapes. Device-side loops.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sort.py"""
import time
import jax, jax.numpy as jnp, numpy as np
from sdpgs_tpu.ops.sort_pallas import sort_by_key_pallas

N_IT = 20

def timed(name, body):
    def loop(eps):
        def it(i, eps):
            return body(eps) * 0.0 + eps
        return jax.lax.fori_loop(0, N_IT, it, eps)
    fn = jax.jit(loop)
    out = fn(jnp.float32(0.0)); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = fn(out); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_IT
    print(f"{name:44s} {dt*1000:7.3f} ms", flush=True)

rng = np.random.default_rng(0)
for N in (1 << 17, 1 << 16):
    depth = rng.uniform(1, 9, N).astype(np.float32)
    depth[rng.random(N) < 0.4] = np.inf
    packed = rng.integers(0, 1 << 30, N).astype(np.int32)
    gid = np.arange(N, dtype=np.int32)
    d, p, g = jnp.asarray(depth), jnp.asarray(packed), jnp.asarray(gid)

    # correctness on chip first
    ks, ps, gs = jax.jit(sort_by_key_pallas)(d, p, g)
    rk, rp, rg = jax.jit(lambda d, p, g: jax.lax.sort((d, p, g), num_keys=1, is_stable=True))(d, p, g)
    ok = (np.array_equal(np.asarray(ks), np.asarray(rk))
          and np.array_equal(np.asarray(ps), np.asarray(rp))
          and np.array_equal(np.asarray(gs), np.asarray(rg)))
    print(f"N=2^{N.bit_length()-1} exact vs lax.sort: {ok}", flush=True)

    def b_bitonic(eps):
        ks, ps, gs = sort_by_key_pallas(d + eps, p, g)
        return jnp.sum(ks[:8]) + (ps[0] + gs[0]).astype(jnp.float32)

    def b_lax(eps):
        ks, ps, gs = jax.lax.sort((d + eps, p, g), num_keys=1, is_stable=True)
        return jnp.sum(ks[:8]) + (ps[0] + gs[0]).astype(jnp.float32)

    timed(f"bitonic Pallas N=2^{N.bit_length()-1}", b_bitonic)
    timed(f"lax.sort        N=2^{N.bit_length()-1}", b_lax)
