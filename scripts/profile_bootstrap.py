#!/usr/bin/env python
"""Per-stage bootstrap profiling with chained forced timing.

Times jitted subcircuits of one CMUX round (and the KS) on the current
device, each iterated with a data dependency and closed by a host fetch, so
async dispatch cannot lie.  Run SOLO on the chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import ntt as ntt_mod
from redsec_tpu.crypto.params import get_params
from redsec_tpu.formats.keys import ensure_keyset


def chain_time(fn, x0, iters=20, label=""):
    x = fn(x0)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]  # compile+force
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<28} {dt*1e3:9.3f} ms/iter")
    return dt


def main():
    B = int(os.environ.get("PROF_BATCH", "256"))
    params = get_params("small_v2")
    sk, dkey = ensure_keyset("small_v2", seed=0)
    plan = dkey.plan
    rows, N, n = params.decomp_rows, params.N, params.n
    p0 = plan.primes[0]

    key = jax.random.PRNGKey(0)
    acc0 = jax.random.randint(key, (B, 2, N), -(2**31), 2**31 - 1, dtype=jnp.int32)
    dig0 = jax.random.randint(key, (B, rows, N), 0, p0, dtype=jnp.int32)
    lweN = jax.random.randint(key, (B, N), -(2**31), 2**31 - 1, dtype=jnp.int32)

    impl = bs.make_bootstrap_impl(params, plan)

    # full round: build a single-round closure
    bk0 = tuple(b[0] for b in dkey.bk_ntt)

    # piecewise circuits (self-composing: output feeds next input)
    def fwd_only(x):
        return bs._fwd_ntt(x, plan, 0)

    def inv_only(x):
        return bs._inv_ntt(x, plan, 0)

    def decompose_like(x):
        u = x.astype(jnp.uint32)
        ds = [(u >> np.uint32(32 - (j + 1) * params.bg_bit)) & np.uint32(params.bg - 1)
              for j in range(params.l)]
        d = jnp.stack(ds, 2).astype(jnp.int32) - params.half_bg
        return jnp.concatenate([x[:, :1], d.reshape(x.shape[0], -1, N)[:, :1]], 1)

    def rotate_like(x):
        out = x
        for k in range(params.log2_2N):
            s = 1 << k
            rx = jnp.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1) if s < N else -out
            bit = ((x[:, 0, 0] >> k) & 1).astype(bool).reshape(-1, 1, 1)
            out = jnp.where(bit, rx, out)
        return out

    chain_time(jax.jit(fwd_only), dig0, label=f"fwd NTT [B,{rows},N] (1 prime)")
    inv_in = jax.random.randint(key, (B, 2, bs.BK_LIMBS, N), 0, p0, dtype=jnp.int32)
    chain_time(jax.jit(inv_only), inv_in, label="inv NTT [B,2,4,N] (1 prime)")
    chain_time(jax.jit(rotate_like), acc0, label="rotate [B,2,N]")
    chain_time(jax.jit(decompose_like), acc0, label="decompose-ish [B,2,N]")

    # pointwise (current implementation) via one full external_delta round
    jitted_round = None

    def one_round(acc):
        diff = acc  # stand-in
        # reuse internal path: full bootstrap impl is simpler to time at once
        return acc

    # KS timing
    def ks_only(a):
        out = impl(dkey.bk_ntt, dkey.ksk_limbs, jnp.concatenate(
            [jnp.zeros((B, n), jnp.int32), a[:, :1]], axis=1), jnp.zeros(N, jnp.int32))
        return jnp.concatenate([a[:, 1:], out[:, :1]], axis=1)

    # full bootstrap for reference
    ct0 = jax.random.randint(key, (B, n + 1), -(2**31), 2**31 - 1, dtype=jnp.int32)
    tv = jnp.zeros(N, jnp.int32)

    def full(x):
        return impl(dkey.bk_ntt, dkey.ksk_limbs, x, tv)

    dt = chain_time(jax.jit(full), ct0, iters=3, label=f"FULL bootstrap batch {B}")
    print(f"=> {B/dt:.1f} bootstraps/s; per round {dt/params.n*1e3:.3f} ms")


if __name__ == "__main__":
    main()
