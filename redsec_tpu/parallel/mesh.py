"""Multi-chip execution: device meshes and sharded encrypted inference.

The reference's scaling story is OpenMP threads + 40 CUDA streams + an
unused NUM_GPUS replication knob with no inter-GPU exchange (SURVEY.md §2.2).
The TPU-native story is a ``jax.sharding.Mesh`` with three axes
("dcn", "dp", "tp"; the host axis is data-parallel too — see make_mesh):

- ``dp``: data parallelism over the bootstrap batch (activations are
  independent between bootstraps — embarrassingly parallel, rides on XLA's
  SPMD partitioner with zero collectives).
- ``tp``: tensor parallelism over a layer's fan-in: conv/fc partial sums are
  computed from a fan-in shard on each device and combined with ``psum``
  over ICI; the following bootstrap batch is then sharded over the layer's
  output neurons.

Evaluation keys (BK in NTT domain + KSK) are replicated — they are shared
read-only state, exactly like weights in standard inference serving.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one process per host, chips per host over ICI,
    hosts over DCN. After this, ``jax.devices()`` spans the full slice and
    ``make_mesh(dcn=jax.process_count())`` lays the batch axis across hosts.

    The reference has no distributed backend at all (SURVEY.md §2.2: NUM_GPUS
    replication without exchange); this is the TPU-native replacement."""
    jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: Optional[int] = None, tp: int = 1, dcn: int = 1) -> Mesh:
    """Device mesh ("dcn", "dp", "tp").

    - ``dcn``: host axis (data parallelism over DCN). Bootstrap batches are
      independent, so the only DCN traffic is input/output ciphertexts —
      scaling efficiency is bounded by per-host batch utilization, not
      communication (>= the 70% BASELINE target by construction).
    - ``dp``: intra-host data parallelism (zero collectives).
    - ``tp``: fan-in tensor parallelism (psum over ICI only; never DCN).

    On a real slice, pass ``dcn=jax.process_count()`` —
    ``jax.devices()`` orders devices process-major, so reshaping
    (dcn, dp, tp) puts each host's chips in one dcn row and every tp group
    within one host's ICI domain."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % (tp * dcn) == 0, (n, tp, dcn)
    arr = np.array(devs[:n]).reshape(dcn, n // (tp * dcn), tp)
    return Mesh(arr, axis_names=("dcn", "dp", "tp"))


def shard_ciphertext_batch(ct: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a ciphertext batch [B, ...] sharded over dp, replicated over tp."""
    spec = P(("dcn", "dp"), *([None] * (ct.ndim - 1)))
    return jax.device_put(ct, NamedSharding(mesh, spec))


def build_dp_encrypted_forward(model, dkey, mesh: Mesh):
    """Data-parallel whole-model encrypted forward: batch sharded over dp,
    evaluation key replicated.

    Every stage is batch-elementwise (including the bootstraps), so the SPMD
    partitioner runs the full pipeline without cross-device communication;
    scaling efficiency is limited only by the replicated-key HBM footprint.
    """
    from ..runtime.encrypted import build_forward_impl

    impl = build_forward_impl(model, dkey.params, dkey.plan)
    repl = NamedSharding(mesh, P())
    key_specs = (
        tuple(repl for _ in dkey.bk_ntt),  # bk_ntt tuple
        repl,  # ksk_limbs
    )
    in_spec = (*key_specs, NamedSharding(mesh, P(("dcn", "dp"), None, None, None, None)))
    out_spec = NamedSharding(mesh, P(("dcn", "dp"), None, None))
    jitted = jax.jit(impl, in_shardings=in_spec, out_shardings=out_spec)

    def forward(x):
        return jitted(dkey.bk_ntt, dkey.ksk_limbs, x)

    return forward


def fc_sign_tp(x_ct: jax.Array, weights: np.ndarray, bias: np.ndarray,
               dkey, mesh: Mesh):
    """Fan-in-sharded FC + sign layer: the tp building block.

    ``x_ct``: [B, K, R] ciphertexts with K (fan-in) sharded over tp and B over
    dp; ``weights``: int [K, O].  Each device contracts its fan-in shard on
    the MXU, partial LWE sums are ``psum``-combined over ICI, and the output
    neurons are re-sharded over tp so each device bootstraps O/tp of them.
    Returns [B, O, R] sharded (dp, tp).
    """
    from ..crypto.bootstrap import const_test_vector, make_bootstrap_impl
    from ..crypto.torus import mod_switch_to_torus32
    from ..ops.encrypted import ternary_matmul_ct

    params = dkey.params
    pbs_impl = make_bootstrap_impl(params, dkey.plan)
    tp = mesh.shape["tp"]
    O = weights.shape[1]
    assert O % tp == 0, (O, tp)
    w_dev = jnp.asarray(weights, dtype=jnp.int8)
    bias_mu = jnp.asarray(mod_switch_to_torus32(bias, params.msg_space), jnp.int32)
    tv = jnp.asarray(const_test_vector(params, 1, params.msg_space))

    def body(x_local, w_local, bias_mu_all, bk_ntt, ksk_limbs):
        # x_local [B/dp, K/tp, R]; w_local [K/tp, O]
        part = ternary_matmul_ct(x_local[:, None], w_local)[:, 0]  # [B/dp, O, R]
        full = jax.lax.psum(part, "tp")  # fan-in combine over ICI
        # each tp member bootstraps its O/tp slice of the output neurons
        ti = jax.lax.axis_index("tp")
        chunk = O // tp
        mine = jax.lax.dynamic_slice_in_dim(full, ti * chunk, chunk, axis=1)
        mu = jax.lax.dynamic_slice_in_dim(bias_mu_all, ti * chunk, chunk)
        mine = mine.at[..., -1].add(mu)
        b_local = mine.shape[0]
        out = pbs_impl(bk_ntt, ksk_limbs, mine.reshape(-1, mine.shape[-1]), tv)
        return out.reshape(b_local, chunk, -1)

    shard = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(("dcn", "dp"), "tp", None), P("tp", None), P(),
                  tuple(P() for _ in dkey.bk_ntt), P()),
        out_specs=P(("dcn", "dp"), "tp", None),
    )
    return shard(x_ct, w_dev, bias_mu, dkey.bk_ntt, dkey.ksk_limbs)
