"""Key/ciphertext file formats.

The reference serializes keys/ciphertexts with TFHE v1.1's stream format
(``secret.key`` / ``eval.key`` / ``image.ctxt`` / ``network_output.ctxt``,
client/gen_secure_keyset.cpp:107-115, client/encrypt_image.cpp:82-85).  Our
artifacts carry the same roles and pipeline positions with an npz container
(self-describing, versioned); the pixel/score payload semantics are identical
(one LWE sample per pixel, 2p-255 encoding in the 4096 message space).
"""

from __future__ import annotations

import os

import numpy as np

from ..crypto.keygen import CloudKey, SecretKey
from ..crypto.params import TfheParams, get_params

FORMAT_VERSION = 1


def save_secret_key(path: str, sk: SecretKey) -> None:
    np.savez_compressed(
        path, version=FORMAT_VERSION, params=sk.params.name,
        lwe_key=sk.lwe_key, rlwe_key=sk.rlwe_key,
    )


def load_secret_key(path: str) -> SecretKey:
    d = np.load(path, allow_pickle=False)
    params = get_params(str(d["params"]))
    return SecretKey(params, d["lwe_key"], d["rlwe_key"])


def save_cloud_key(path: str, ck: CloudKey) -> None:
    extra = {} if ck.bk_pair is None else {"bk_pair": ck.bk_pair}
    if ck.rerand is not None:
        extra["rerand"] = ck.rerand
    np.savez(path, version=FORMAT_VERSION, params=ck.params.name, bk=ck.bk,
             ksk=ck.ksk, **extra)


def load_cloud_key(path: str) -> CloudKey:
    d = np.load(path, allow_pickle=False)
    params = get_params(str(d["params"]))
    pair = d["bk_pair"] if "bk_pair" in d else None
    rerand = d["rerand"] if "rerand" in d else None  # pre-pool keys: None
    return CloudKey(params, d["bk"], d["ksk"], pair, rerand=rerand)


def save_ciphertexts(path: str, ct: np.ndarray, params: TfheParams, label=None,
                     out_gain: int = 1, out_center=None) -> None:
    """Ciphertext container (role of image.ctxt / network_output.ctxt).
    ``out_gain``: encoding gain carried by network outputs (runtime/ranges.py);
    the decryptor divides it back out.  ``out_center``: per-class decrypt-
    centering shift (or None); the decryptor subtracts it after decode."""
    np.savez(
        path, version=FORMAT_VERSION, params=params.name, ct=ct.astype(np.int32),
        label=-1 if label is None else int(label), out_gain=int(out_gain),
        out_center=(np.zeros(0, np.int64) if out_center is None
                    else np.asarray(out_center, np.int64)),
    )


def load_ciphertexts(path: str):
    d = np.load(path, allow_pickle=False)
    gain = int(d["out_gain"]) if "out_gain" in d else 1
    center = d["out_center"] if "out_center" in d else np.zeros(0, np.int64)
    center = None if center.size == 0 else center
    return d["ct"], get_params(str(d["params"])), int(d["label"]), gain, center


# --------------------------------------------------------------------------- #
# Prepared (device/NTT-domain) key cache                                      #
# --------------------------------------------------------------------------- #


def save_prepared_key(path: str, dkey) -> None:
    """Cache the NTT-domain bootstrapping key + flat KSK so benches and
    repeated runs skip the ~2 min host transform."""
    arrs = {f"bk_ntt_{i}": np.asarray(b) for i, b in enumerate(dkey.bk_ntt)}
    if dkey.rerand is not None:
        arrs["rerand"] = np.asarray(dkey.rerand)
    np.savez(
        path, version=FORMAT_VERSION, params=dkey.params.name,
        nprimes=len(dkey.bk_ntt), ksk_limbs=np.asarray(dkey.ksk_limbs),
        ntt_flavor=dkey.ntt_flavor, bundle=dkey.bundle, balanced_limbs=1, **arrs,
    )


def load_prepared_key(path: str):
    import jax.numpy as jnp

    from ..crypto import ntt as ntt_mod
    from ..crypto.bootstrap import DeviceCloudKey

    d = np.load(path, allow_pickle=False)
    params = get_params(str(d["params"]))
    from ..crypto.bootstrap import _bootstrap_plan

    bundle = int(d["bundle"]) if "bundle" in d else 1
    plan = _bootstrap_plan(params, bundled=bundle != 1)
    bk_ntt = tuple(jnp.asarray(d[f"bk_ntt_{i}"]) for i in range(int(d["nprimes"])))
    if plan is not None and len(bk_ntt) != len(plan.primes):
        raise ValueError(
            "stale prepared-key cache (CRT prime plan changed); regenerate")
    if "ksk_limbs" not in d:
        raise ValueError("stale prepared-key cache (pre-ksk_limbs format); regenerate")
    from ..crypto.bootstrap import BK_LIMBS
    if d["bk_ntt_0"].shape[3] != BK_LIMBS:
        raise ValueError("stale prepared-key cache (BK limb layout changed); regenerate")
    if "balanced_limbs" not in d:
        raise ValueError(
            "stale prepared-key cache (pre-balanced-limb format); regenerate")
    return DeviceCloudKey(
        params=params, plan=plan, bk_ntt=bk_ntt,
        ksk_limbs=jnp.asarray(d["ksk_limbs"]),
        ntt_flavor=str(d["ntt_flavor"]) if "ntt_flavor" in d else "radix2",
        bundle=bundle,
        rerand=jnp.asarray(d["rerand"]) if "rerand" in d else None,
    )


def keyset_dir(base: str | None = None) -> str:
    d = base or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".keys")
    os.makedirs(d, exist_ok=True)
    return d


def ensure_keyset(params_name: str = "small_v2", seed: int = 0,
                  base: str | None = None, bundle: int = 1):
    """Generate-or-load a cached keyset; returns (SecretKey, DeviceCloudKey).

    Only the RAW keys are cached on disk; the NTT-domain transform always
    runs on-device from the (4x smaller) coefficient-domain key — on tunneled
    devices, shipping the prepared key is strictly slower than re-deriving it.

    ``bundle=2``: keyset with pair entries for the 2-bit bundled blind
    rotation (cached under its own tag).
    """
    from ..crypto import bootstrap as bs
    from ..crypto import keygen as kg

    d = keyset_dir(base)
    tag = f"{params_name}_s{seed}" + ("" if bundle == 1 else f"_b{bundle}")
    sk_path = os.path.join(d, f"secret_{tag}.npz")
    ck_path = os.path.join(d, f"cloud_{tag}.npz")
    if os.path.exists(sk_path) and os.path.exists(ck_path):
        sk = load_secret_key(sk_path)
        cloud = load_cloud_key(ck_path)
        if cloud.rerand is None:
            # keyset cached before the re-randomization pool existed: the
            # pool is client-side material (needs the secret key, which the
            # cache holds) — draw it deterministically and upgrade in place
            from ..crypto.lwe import lwe_encrypt

            rng = np.random.default_rng(seed ^ 0x5EED)
            cloud.rerand = lwe_encrypt(
                sk.lwe_key, np.zeros(kg.RERAND_POOL, np.int32),
                cloud.params.alpha_enc, rng)
            save_cloud_key(ck_path, cloud)
    else:
        params = get_params(params_name)
        sk, cloud = kg.keygen(params, seed=seed, bundle=bundle)
        save_secret_key(sk_path, sk)
        save_cloud_key(ck_path, cloud)
    return sk, bs.prepare_cloud_key(cloud)
