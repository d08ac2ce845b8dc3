#!/usr/bin/env python
"""Microbenchmarks for the MXU-schoolbook external product candidates.

The external product per blind-rotation round is
    delta[b, out, k] = sum_{row, j} digits[b, row, j] * b_ext[row, out, N+k-j]
(negacyclic schoolbook; out = 2 polys x 4 8-bit limbs). Exact in int32 or in
bf16xbf16->fp32 (bound: rows*N * 4 * 128 = 10.5M < 2^24).

Candidates measured here, chained + scalar-fetch timing (tunnel-RTT and
cache proof):
  mm-bf16 / mm-int8   raw matmul [B, rows*N] x [rows*N, 8N]
  gen                 Toeplitz expansion of the round BK via shear-reshape
  round-xla           gen + dot_general (the full per-round external product)
  conv                lax.conv_general_dilated formulation (no materialization)
  rot-select          current 11-stage select-chain rotation
  rot-gather          one take_along_axis over the doubled poly
  roll-pallas         strided pltpu.roll Toeplitz tile generation (support probe)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

N = 1024
ROWS = 20
OUTS = 8
B = int(os.environ.get("SB_BATCH", "1024"))
ITERS = int(os.environ.get("SB_ITERS", "20"))


def timed(name, fn, *args, iters=ITERS, work_macs=None):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = fn(*args)
    s = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    extra = ""
    if work_macs:
        extra = f"  {work_macs / dt / 1e12:.1f} TMAC/s"
    print(f"{name:24s} {dt*1e3:8.3f} ms/iter{extra}  (chk {s})")
    return dt


def chain(body, x0, iters=ITERS, **consts):
    """Chained fori_loop; big tensors passed as runtime args (closure
    constants >~200 MB exceed the remote-compile request limit)."""
    @functools.partial(jax.jit, static_argnames=())
    def run(x0, **consts):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x, i, **consts), x0)
    return functools.partial(run, **consts)


def main():
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}  B={B} iters={ITERS}")

    # ---------------- raw matmuls ----------------
    K, M = ROWS * N, OUTS * N
    lhs8 = jnp.asarray(rng.integers(-4, 5, size=(B, K)), jnp.int8)
    rhs8 = jnp.asarray(rng.integers(-128, 128, size=(K, M)), jnp.int8)

    def _refill(o, K):
        reps = -(-K // o.shape[1])
        return jnp.tile(o, (1, reps))[:, :K]

    def mm_int8(x, i):
        o = jax.lax.dot_general(x, rhs8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (_refill(o, K) & 7).astype(jnp.int8) - 4

    try:
        timed("mm-int8", chain(mm_int8, lhs8), lhs8, work_macs=ITERS * B * K * M)
    except Exception as e:
        print(f"mm-int8 FAILED: {type(e).__name__}: {str(e)[:200]}")

    lhsb = lhs8.astype(jnp.bfloat16)
    rhsb = rhs8.astype(jnp.bfloat16)

    def mm_bf16(x, i, rhsb):
        o = jax.lax.dot_general(x, rhsb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o.astype(jnp.int32)
        return ((_refill(o, K) & 7) - 4).astype(jnp.bfloat16)

    timed("mm-bf16", chain(mm_bf16, lhsb, rhsb=rhsb), lhsb, work_macs=ITERS * B * K * M)

    # ---------------- Toeplitz generation (shear-reshape) ----------------
    bext = jnp.asarray(rng.integers(-128, 128, size=(ROWS, OUTS, 2 * N)), jnp.int8)

    def gen_toeplitz(be):
        """[rows, outs, 2N] -> [rows, outs, N(jrev), N(k)]:
        window j' = be[1+j' : 1+j'+N] (row j' serves digit index N-1-j')."""
        r, o, twoN = be.shape
        zb = jnp.broadcast_to(be[:, :, None, :], (r, o, N + 1, twoN))
        flat = zb.reshape(r, o, (N + 1) * twoN)
        w = jax.lax.dynamic_slice_in_dim(flat, 1, N * (twoN + 1), axis=2)
        return w.reshape(r, o, N, twoN + 1)[:, :, :, :N]

    def gen_only(x, i):
        m = gen_toeplitz(bext + x[0, 0, 0].astype(jnp.int8))
        return x + m[0, 0, 0, 0]

    timed("gen-shear-int8", chain(gen_only, jnp.zeros((1, 1, 1), jnp.int8)),
          jnp.zeros((1, 1, 1), jnp.int8))

    # ---------------- full round: gen + contraction ----------------
    dig8 = jnp.asarray(rng.integers(-4, 5, size=(B, ROWS, N)), jnp.int8)

    def round_xla_int8(x, i):
        m = gen_toeplitz(bext)  # [rows, outs, j, k]
        o = jax.lax.dot_general(
            x, m, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.int32)  # [B, outs, k]
        o = jnp.tile(o, (1, -(-ROWS // OUTS), 1))[:, :ROWS, :]
        return (o & 7).astype(jnp.int8) - 4

    try:
        timed("round-xla-int8", chain(round_xla_int8, dig8), dig8,
              work_macs=ITERS * B * K * M)
    except Exception as e:
        print(f"round-xla-int8 FAILED: {type(e).__name__}: {str(e)[:200]}")

    digb = dig8.astype(jnp.bfloat16)
    bextb = bext.astype(jnp.bfloat16)

    def round_xla_bf16(x, i):
        m = gen_toeplitz(bextb)
        o = jax.lax.dot_general(
            x, m, (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        o = jnp.tile(o.astype(jnp.int32), (1, -(-ROWS // OUTS), 1))[:, :ROWS, :]
        return ((o & 7) - 4).astype(jnp.bfloat16)

    timed("round-xla-bf16", chain(round_xla_bf16, digb), digb,
          work_macs=ITERS * B * K * M)

    # ---------------- conv formulation ----------------
    # input [B, rows, 2N] = [-d, d]; kernel [outs, rows, N]; valid corr -> [B, outs, N]
    ker8 = jnp.asarray(rng.integers(-128, 128, size=(OUTS, ROWS, N)), jnp.int8)

    def conv_bf16(x, i):
        inp = jnp.concatenate([-x, x], axis=-1).astype(jnp.bfloat16)
        o = jax.lax.conv_general_dilated(
            inp, ker8.astype(jnp.bfloat16)[:, :, ::-1],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        o = jnp.tile(o[:, :, :N].astype(jnp.int32), (1, -(-ROWS // OUTS), 1))[:, :ROWS, :]
        return ((o & 7) - 4).astype(jnp.bfloat16)

    try:
        timed("conv-bf16", chain(conv_bf16, digb), digb,
              work_macs=ITERS * B * ROWS * OUTS * N * N)
    except Exception as e:
        print(f"conv-bf16 FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---------------- rotation candidates ----------------
    acc = jnp.asarray(rng.integers(-(2**30), 2**30, size=(B, 2, N)), jnp.int32)
    t = jnp.asarray(rng.integers(0, 2 * N, size=(B,)), jnp.int32)

    def rot_select(x, i):
        out = x
        tt = t + i
        for k in range(11):
            s = 1 << k
            if s < N:
                rx = jnp.concatenate([-out[..., N - s:], out[..., : N - s]], axis=-1)
            else:
                rx = -out
            bit = ((tt >> k) & 1).astype(bool).reshape(-1, 1, 1)
            out = jnp.where(bit, rx, out)
        return out

    timed("rot-select x1", chain(rot_select, acc), acc)

    def rot_gather(x, i):
        ext = jnp.concatenate([x, -x], axis=-1)  # [B, 2, 2N]
        tt = (t + i) % (2 * N)
        idx = (jnp.arange(N)[None, None, :] - tt[:, None, None]) % (2 * N)
        return jnp.take_along_axis(ext, jnp.broadcast_to(idx, (B, 2, N)), axis=-1)

    timed("rot-gather x1", chain(rot_gather, acc), acc)

    # one-hot two-stage: lane shift via gathered shift-matrix matmuls + sublane roll
    RQ = N // 128
    a_np = np.zeros((128, 128, 128), np.float32)
    b_np = np.zeros((128, 128, 128), np.float32)
    for r in range(128):
        for c in range(128):
            if c + r < 128:
                a_np[r, c, c + r] = 1.0
            else:
                b_np[r, c, c + r - 128] = 1.0
    A = jnp.asarray(a_np, jnp.bfloat16)
    Bm = jnp.asarray(b_np, jnp.bfloat16)

    def rot_onehot(x, i):
        tt = (t + i) % (2 * N)
        r, q = tt % 128, tt // 128
        ext = jnp.concatenate([x, -x], axis=-1).reshape(B, 2, 2 * RQ, 128)
        Ar = A[r]  # [B,128,128] gather over leading dim
        Br = Bm[r]
        xb = ext.reshape(B, 2 * 2 * RQ, 128).astype(jnp.bfloat16)
        lo = jax.lax.dot_general(xb, Ar, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        xprev = jnp.roll(ext, 1, axis=2).reshape(B, 2 * 2 * RQ, 128).astype(jnp.bfloat16)
        hi = jax.lax.dot_general(xprev, Br, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        s1 = (lo + hi).astype(jnp.int32).reshape(B, 2, 2 * RQ, 128)
        # stage 2: sublane roll by q via one-hot matmul over the 2R axis
        Q = (jnp.arange(2 * RQ)[None, :, None] - q[:, None, None]) % (2 * RQ)
        Qoh = jax.nn.one_hot(Q[:, :RQ, 0], 2 * RQ, dtype=jnp.bfloat16)  # [B, RQ, 2RQ]
        s1f = s1.transpose(0, 2, 1, 3).reshape(B, 2 * RQ, 2 * 128).astype(jnp.bfloat16)
        o = jax.lax.dot_general(Qoh, s1f, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return o.astype(jnp.int32).reshape(B, RQ, 2, 128).transpose(0, 2, 1, 3).reshape(B, 2, N)

    try:
        timed("rot-onehot x1", chain(rot_onehot, acc), acc)
    except Exception as e:
        print(f"rot-onehot FAILED: {type(e).__name__}: {str(e)[:200]}")

    # correctness cross-check of rotation variants
    r1 = np.asarray(jax.jit(rot_select)(acc, 0))
    r2 = np.asarray(jax.jit(rot_gather)(acc, 0))
    print("rot gather == select:", np.array_equal(r1, r2))
    try:
        r3 = np.asarray(jax.jit(rot_onehot)(acc, 0))
        print("rot onehot == select:", np.array_equal(r1, r3))
    except Exception as e:
        print(f"rot-onehot check FAILED: {str(e)[:120]}")

    # ---------------- strided pltpu.roll probe ----------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def toep_kernel(w_ref, o_ref):
        w = jnp.broadcast_to(w_ref[:], (128, 256))
        o_ref[:] = pltpu.roll(w, 129, axis=1, stride=1, stride_axis=0)[:, :128]

    def toep(w):
        return pl.pallas_call(
            toep_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(w)

    try:
        w = jnp.asarray(rng.integers(-100, 100, size=(1, 256)), jnp.int32)
        got = np.asarray(jax.jit(toep)(w))
        wnp = np.asarray(w)[0]
        want = np.empty((128, 128), np.int32)
        for j in range(128):
            for k in range(128):
                want[j, k] = wnp[(127 + k - j) % 256]
        print("roll-pallas toeplitz correct:", np.array_equal(got, want))
    except Exception as e:
        print(f"roll-pallas FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
