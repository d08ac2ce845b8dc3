"""Per-prime pointwise flavor selection (the round-5 n2048 / bundled fix).

The lazy pointwise reduction groups contraction rows by int32 headroom
(group = (2^31-1) // (prime-1)^2).  N=2048's forced prime 40961 degenerates
to group=1 — twenty materialize+reduce passes per round — which the round-5
TPU sweep measured as the n2048 anomaly (-45..-64% vs pass-floor model,
results/tpu_r5_n2048.log).  The fix: REDSEC_POINTWISE=auto (the default)
switches any prime needing > 6 lazy passes to the bf16 lo/hi-split GEMM;
short group chains fuse fine (small_v2_tpu bundled: 9 passes total across
its primes, measured +0.9% of model) and stay lazy.  The tpu2+bundled
anomaly is separate — its bundled plan genuinely needs a THIRD prime, a
model-ledger correction (scripts/fit_passmodel.py), not a code change.

Pins here: (a) the selection arithmetic per shipped config, (b) the GEMM
branch is bit-exact vs the lazy branch at the exact (prime, rows) geometry
that triggers it — checked through a full batched bootstrap at an n-reduced
clone of small_v2_n2048 (same N/l/primes/rows, n=16 for speed).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax.numpy as jnp

from redsec_tpu.crypto import bootstrap as bs
from redsec_tpu.crypto import keygen as kg
from redsec_tpu.crypto import lwe
from redsec_tpu.crypto.params import get_params


def test_lazy_pass_counts_per_shipped_config():
    # small_v2_tpu (rows 12): both primes stay lazy
    assert bs.lazy_pointwise_passes(12289, 12) == 1
    assert bs.lazy_pointwise_passes(18433, 12) == 2
    # small_v2_n2048 (rows 20, plan forced to (12289, 40961))
    assert bs.lazy_pointwise_passes(12289, 20) == 2
    assert bs.lazy_pointwise_passes(40961, 20) == 20
    # small_v2_tpu2 bundled (3 * rows 10 = 30 contraction rows)
    assert bs.lazy_pointwise_passes(12289, 30) == 3
    assert bs.lazy_pointwise_passes(18433, 30) == 5


def test_auto_selection_matches_anomaly_map():
    # headline set: unchanged (lazy), so the fitted pass-floor model holds
    assert not bs.pointwise_is_gemm("auto", 12289, 12)
    assert not bs.pointwise_is_gemm("auto", 18433, 12)
    # n2048: only the degenerate 20-pass 40961 branch moves to GEMM
    assert not bs.pointwise_is_gemm("auto", 12289, 20)
    assert bs.pointwise_is_gemm("auto", 40961, 20)
    # bundled N=1024 sets stay lazy (tpu bundled measured +0.9% of model
    # at 9 total passes — short group chains fuse; only the degenerate
    # regime moves)
    assert not bs.pointwise_is_gemm("auto", 12289, 30)
    assert not bs.pointwise_is_gemm("auto", 18433, 30)
    assert not bs.pointwise_is_gemm("auto", 12289, 36)
    assert not bs.pointwise_is_gemm("auto", 18433, 36)
    # explicit modes still force globally
    assert bs.pointwise_is_gemm("gemm", 12289, 12)
    assert not bs.pointwise_is_gemm("lazy", 40961, 20)


def test_gemm_accumulation_exact_for_every_shipped_row_count():
    # f32 integer-exactness envelope of the lo/hi-split GEMM: per-bmm
    # accumulation < contract_rows * 255^2 must stay < 2^24
    for contract_rows in (12, 20, 30):
        assert contract_rows * 255 * 255 < 2**24


def _pbs_out(mode: str, p) -> np.ndarray:
    os.environ["REDSEC_POINTWISE"] = mode
    try:
        sk, cloud = kg.keygen(p, seed=7)
        dkey = bs.prepare_cloud_key(cloud)
        pbs = bs.make_batched_bootstrap(dkey)
        rng = np.random.default_rng(3)
        bits = np.array([0, 1, 1, 0, 1, 0, 0, 1], np.int32)
        mu = np.where(bits, np.int32(1 << 29), np.int32(-(1 << 29)))
        ct = lwe.lwe_encrypt(sk.lwe_key, mu, p.alpha_enc, rng)
        tv = bs.const_test_vector(p, 1, 2)
        return np.asarray(pbs(jnp.asarray(ct), jnp.asarray(tv)))
    finally:
        del os.environ["REDSEC_POINTWISE"]


def test_gemm_branch_bit_exact_at_n2048_geometry():
    # n-reduced clone keeps N=2048 / l=10 / rows=20 / primes (12289, 40961)
    # — the exact geometry whose 40961 branch auto selects GEMM — while a
    # 16-round blind rotation keeps the CPU run in the fast tier.
    p = dataclasses.replace(get_params("small_v2_n2048"), name="n2048_n16",
                            n=16)
    plan = bs._bootstrap_plan(p)
    assert plan.primes == (12289, 40961)
    assert bs.pointwise_is_gemm("auto", 40961, p.decomp_rows)
    lazy = _pbs_out("lazy", p)
    auto = _pbs_out("auto", p)
    np.testing.assert_array_equal(lazy, auto)
