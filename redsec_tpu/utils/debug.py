"""Layer-by-layer cross-checking — the reference's ``_PRINT_LAYER_`` dumps and
``Cifar_test.ipynb`` comparison flow as a library API.

``layerwise_compare`` runs the encrypted pipeline one stage at a time,
decrypting after every stage and comparing against the plaintext oracle
applied to the decrypted stage input.  Leveled stages must agree exactly;
bootstrapped stages report agreement rate and the margin of every mismatch
(which should sit inside the mod-switch noise band).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..crypto import lwe
from ..crypto.bootstrap import DeviceCloudKey, make_chunked_bootstrap
from ..models.spec import Activation, ModelPlan
from ..ops import encrypted as eops
from ..runtime import ptxt as rp


@dataclasses.dataclass
class StageReport:
    layer: int
    stage: str
    exact: bool
    agreement: float
    max_mismatch_margin: int  # |pre-activation| of the worst disagreeing unit


def layerwise_compare(plan: ModelPlan, dkey: DeviceCloudKey, sk, images: np.ndarray,
                      rng=None) -> List[StageReport]:
    params = dkey.params
    pbs = make_chunked_bootstrap(dkey)
    rng = rng or np.random.default_rng(0)
    xc = jnp.asarray(lwe.encrypt_integers(sk.lwe_key, images, params, rng))
    reports: List[StageReport] = []

    def dec(ct):
        return lwe.decrypt_integers(sk.lwe_key, np.asarray(ct), params)

    def report_exact(li, stage, got, want):
        ok = np.array_equal(got, want)
        reports.append(StageReport(li, stage, ok, float((got == want).mean()), 0))

    def report_boots(li, stage, got, want, margin):
        bad = got != want
        worst = int(np.abs(margin[bad]).max(initial=0))
        reports.append(StageReport(li, stage, not bad.any(), float((~bad).mean()), worst))

    for li, layer in enumerate(plan.layers):
        x_in = dec(xc)
        if layer.conv is not None:
            xc = eops.conv_enc(layer.conv, xc, params.msg_space)
            want = np.asarray(rp.conv_ptxt(layer.conv, jnp.asarray(x_in)))
            report_exact(li, "conv", dec(xc), want)
        if layer.sumpool is not None:
            x_in = dec(xc)
            xc = eops.sumpool_enc(layer.sumpool, xc)
            want = np.asarray(rp.sumpool_ptxt(layer.sumpool, jnp.asarray(x_in)))
            report_exact(li, "sumpool", dec(xc), want)
        q = layer.quant
        x_in = dec(xc)
        if q.mode == Activation.SIGN:
            xc = eops.quant_sign_enc(q, xc, pbs, params)
            pre = x_in + q.bias
            report_boots(li, "sign", dec(xc), np.where(pre >= 0, 1, -1), pre)
        elif q.mode == Activation.NONE:
            xc = eops.quant_add_bias_enc(q, xc, params)
            report_exact(li, "add_bias", dec(xc), x_in + q.bias)
        else:
            xc = eops.quant_relu_enc(q, xc, pbs, params)
            want = np.asarray(rp.quant_relu_ptxt(q, jnp.asarray(x_in)))
            report_boots(li, "relu", dec(xc), want, x_in)
        if layer.maxpool is not None:
            x_in = dec(xc)
            xc = eops.maxpool_enc(layer.maxpool, xc, pbs, params)
            want = np.asarray(rp.maxpool_ptxt(layer.maxpool, jnp.asarray(x_in)))
            report_boots(li, "maxpool", dec(xc), want, np.ones_like(want))
    return reports


def format_reports(reports: List[StageReport]) -> str:
    lines = []
    for r in reports:
        flag = "exact" if r.exact else f"agree={r.agreement:.4f} worst_margin={r.max_mismatch_margin}"
        lines.append(f"L{r.layer:<2} {r.stage:<9} {flag}")
    return "\n".join(lines)
