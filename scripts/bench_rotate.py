#!/usr/bin/env python
"""Rotation-stage candidates: negacyclic X^t rotation with per-batch t.

This is ~40-65% of blind-rotation time in the XLA formulation (device
trace, PERFORMANCE.md). Variants:
  select11    current: 11 binary-decomposed stages of where(concat-shift)
  select-r4   radix-4: 6 stages of 4-way select
  ext-circ    doubled-poly circular shifts (no per-stage negation)
  pallas-grid pltpu.roll, grid over batch rows (scalar shift per program)
  pallas-tile pltpu.roll, batch tile with in-kernel row loop
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N = 1024
B = int(os.environ.get("RB_BATCH", "512"))
ITERS = int(os.environ.get("RB_ITERS", "50"))
LOG2_2N = 11


def rot_select11(x, t):
    out = x
    for k in range(LOG2_2N):
        s = 1 << k
        if s < N:
            rx = jnp.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1)
        else:
            rx = -out
        bit = ((t >> k) & 1).astype(bool).reshape(-1, 1, 1)
        out = jnp.where(bit, rx, out)
    return out


def rot_select_r4(x, t):
    out = x
    for k in range(0, LOG2_2N, 2):
        nbits = min(2, LOG2_2N - k)
        d = (t >> k) & ((1 << nbits) - 1)
        d = d.reshape(-1, 1, 1)
        cands = [out]
        cur = out
        for c in range(1, 1 << nbits):
            s = c << k
            if s < N:
                cur = jnp.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1)
            elif s < 2 * N:
                s2 = s - N
                cur = -out if s2 == 0 else jnp.concatenate(
                    [out[..., N - s2:], -out[..., : N - s2]], axis=-1)
            else:
                s2 = s - 2 * N
                cur = out if s2 == 0 else jnp.concatenate(
                    [-out[..., N - s2:], out[..., : N - s2]], axis=-1)
            cands.append(cur)
        r = cands[-1]
        for c in range(len(cands) - 2, -1, -1):
            r = jnp.where(d == c, cands[c], r)
        out = r
    return out


def rot_ext_circ(x, t):
    ext = jnp.concatenate([x, -x], axis=-1)  # [B, 2, 2N]
    for k in range(LOG2_2N):
        s = 1 << k
        rx = jnp.concatenate([ext[..., 2 * N - s:], ext[..., : 2 * N - s]], axis=-1)
        bit = ((t >> k) & 1).astype(bool).reshape(-1, 1, 1)
        ext = jnp.where(bit, rx, ext)
    return ext[..., :N]


def _mk_pallas_grid():
    def kernel(t_ref, x_ref, o_ref):
        x = x_ref[0]  # [2, N]
        ext = jnp.concatenate([x, -x], axis=-1)  # [2, 2N]
        r = pltpu.roll(ext, t_ref[0], axis=1)
        o_ref[0] = r[:, :N]

    def run(x, t):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        )(t, x)

    return run


def _mk_pallas_tile(tile=64):
    def kernel(t_ref, x_ref, o_ref):
        x = x_ref[:]  # [T, 2, N]
        ext = jnp.concatenate([x, -x], axis=-1)  # [T, 2, 2N]

        def body(r, _):
            row = ext[r]
            o_ref[r] = pltpu.roll(row, t_ref[r], axis=1)[:, :N]
            return _

        jax.lax.fori_loop(0, x.shape[0], body, 0)

    def run(x, t):
        grid = (x.shape[0] // tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 2, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        )(t, x)

    return run


def timed(name, fn, x, t):
    @jax.jit
    def run(x, t):
        def body(i, v):
            return fn(v, (t + i) % (2 * N))
        return jax.lax.fori_loop(0, ITERS, body, x)

    try:
        r = run(x, t)
        np.asarray(r).ravel()[:1]
        t0 = time.perf_counter()
        r = run(x, t)
        chk = np.asarray(r).ravel()[:1]
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:16s} {dt*1e3:8.3f} ms/rot  (chk {chk})")
        return dt
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(2**30), 2**30, size=(B, 2, N)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 2 * N, size=(B,)), jnp.int32)
    print(f"device={jax.devices()[0]}  B={B} iters={ITERS}")

    # correctness: all vs select11
    ref = np.asarray(jax.jit(rot_select11)(x, t))
    for name, fn in [("select-r4", rot_select_r4), ("ext-circ", rot_ext_circ),
                     ("pallas-grid", _mk_pallas_grid()),
                     ("pallas-tile64", _mk_pallas_tile(64))]:
        try:
            got = np.asarray(jax.jit(fn)(x, t))
            print(f"  {name} correct: {np.array_equal(ref, got)}")
        except Exception as e:
            print(f"  {name} check FAILED: {type(e).__name__}: {str(e)[:200]}")

    timed("select11", rot_select11, x, t)
    timed("select-r4", rot_select_r4, x, t)
    timed("ext-circ", rot_ext_circ, x, t)
    timed("pallas-grid", _mk_pallas_grid(), x, t)
    timed("pallas-tile64", _mk_pallas_tile(64), x, t)
    timed("pallas-tile256", _mk_pallas_tile(256), x, t)


if __name__ == "__main__":
    main()
