"""Analytic per-source noise budget (utils/noise_budget.py, VERDICT r4 #4).

The slow experimental counterpart (per-source isolation on the native
engine) is scripts/validate_noise_budget.py; these tests pin the analytic
machinery itself: the discretization cliff, the per-term scalings, the
agreement with the round-4 measured sigmas for the sets whose dominant
term the measurements already validated, and the repaired recipes' zero
budget.
"""

import dataclasses
import math

import pytest

from redsec_tpu.crypto.params import PARAM_SETS
from redsec_tpu.utils.noise_budget import (
    budget, rounded_gaussian_var_lsb)


def test_rounded_gaussian_discretization_cliff():
    # far above one lsb: variance ~ s^2 + 1/12 (continuous + rounding)
    a = 2.0**-25  # 128 lsb
    s = a * 2**32
    assert rounded_gaussian_var_lsb(a) == pytest.approx(s * s + 1 / 12)
    # far below half an lsb: every draw rounds to zero
    assert rounded_gaussian_var_lsb(2.0**-45) == 0.0
    assert rounded_gaussian_var_lsb(0.0) == 0.0
    # at the cliff (s ~ 0.3): strictly between the two regimes
    v = rounded_gaussian_var_lsb(0.3 * 2.0**-32)
    assert 0.0 < v < 0.3**2 + 1 / 12


def test_bk_term_matches_round4_measurements():
    """The small_v2 family's output noise is BK-amplification-dominated;
    round 4 measured 0.024 / 0.073 / 0.12 slots (tests/test_params_tpu.py,
    PERFORMANCE.md operating-points table).  The analytic term must land
    within the measurements' ~15% sampling error."""
    for name, meas in (("small_v2", 0.024), ("small_v2_tpu", 0.073),
                       ("small_v2_tpu2", 0.12)):
        b = budget(PARAM_SETS[name])
        pred = b.sigma_slots_of("bk_noise")
        assert abs(pred - meas) / meas < 0.20, (name, pred, meas)


def test_ks_truncation_scaling():
    """Dropping one KS level (3 fewer precision bits at basebit=3) grows
    the truncation sigma exactly 8x — the lever the per-source experiment
    sweeps."""
    p6 = dataclasses.replace(PARAM_SETS["small_v2"], ks_t=6)
    p7 = dataclasses.replace(PARAM_SETS["small_v2"], ks_t=7)
    r = budget(p6).sigma_slots_of("ks_trunc") / budget(p7).sigma_slots_of("ks_trunc")
    assert r == pytest.approx(8.0)


def test_reference_wide_recipes_are_marginal_by_arithmetic():
    """medium/large: the KS-truncation term alone exceeds a 2.5-sigma
    decode budget — the r4 measured failure (2.0 / 1.22 sigma total) is
    predicted, not just observed.  The alpha terms contribute NOTHING in
    the torus32 convention (sub-lsb alphas round to zero)."""
    for name in ("medium", "large"):
        b = budget(PARAM_SETS[name])
        assert b.bk_noise == 0.0 and b.ks_noise == 0.0
        assert b.sigma_slots_of("ks_trunc") > 0.2
        assert b.budget_sigma_multiple() < 2.5
        assert b.sigma_slots_of("ks_trunc") > b.sigma_slots_of("gadget")


def test_repaired_recipes_have_zero_discrete_budget():
    """medium_v2/large_v2: exact 32-bit KS and gadget decompositions plus
    sub-lsb alphas -> exactly zero predicted output noise in this engine,
    and ~1e-4 slots under the continuous-torus convention (>= 4 sigma by
    orders of magnitude)."""
    for name in ("medium_v2", "large_v2"):
        p = PARAM_SETS[name]
        assert p.ks_basebit * p.ks_t == 32
        assert p.l * p.bg_bit == 32
        b = budget(p)
        assert b.total_var == 0.0
        assert math.isinf(b.budget_sigma_multiple())
        bc = budget(p, engine="continuous")
        assert bc.sigma_slots() < 1e-3
        assert bc.budget_sigma_multiple() > 100
        # identical lattice security knobs to the originals
        o = PARAM_SETS[name[: -3]]
        assert (p.n, p.N, p.alpha_ks, p.alpha_bk) == \
            (o.n, o.N, o.alpha_ks, o.alpha_bk)


def test_full_totals_match_measured_sigmas():
    """End-to-end: the four-term model reproduces every measured total
    (r4 full-geometry runs + the r5 isolation sweep) within the runs'
    sampling error."""
    for name, meas, tol in (
        ("small_v2", 0.0386, 0.25),       # r5, n=96
        ("small_v2_tpu2", 0.1419, 0.25),  # r5, n=96
        ("medium", 0.248, 0.35),          # r4, n=32
        ("large", 0.410, 0.35),           # r4, n=32
    ):
        pred = budget(PARAM_SETS[name]).sigma_slots()
        assert abs(pred - meas) / meas < tol, (name, pred, meas)


def test_gadget_coherent_term_anchor():
    """The 21-bit gadget isolation point (n=350, all alphas 0, 32-bit KS):
    measured 4.098 slots; the squared-key-factor form predicts it within
    the 7% sampling error — the independent-coefficient textbook bound
    predicts 0.17 (x24 off), which is the term this model replaces."""
    p = dataclasses.replace(PARAM_SETS["small_v2"], alpha_bk=0.0,
                            alpha_ks=0.0, alpha_enc=0.0, bg_bit=3, l=7,
                            ks_basebit=4, ks_t=8)
    pred = budget(p).sigma_slots()
    assert abs(pred - 4.098) / 4.098 < 0.25, pred
