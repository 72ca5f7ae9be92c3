"""Fused Bahdanau attention-energy kernel (training hot path).

The teacher-forced decoder scan's single biggest memory consumer is the
additive-attention energy

    e[b, t] = sum_a v[a] * tanh(keys[b, t, a] + q[b, a])

which XLA materialises as a (B, T_in, A) tanh tensor in HBM every decoder
step — once forward, again in the remat recompute, and a third time as the
d-tanh intermediate in backward. The r5 device trace (artifacts/trace/,
BASELINE.md MFU row) attributes 28.6 ms of the 79.5 ms pod_dp train step to
decoder-scan loop fusions moving 40 GB/step at saturated bandwidth, with
this tensor family the largest contributor; the dot/conv work is only 1/3
of the step. This kernel computes the energy tile-by-tile in VMEM and never
writes the (B, T, A) tensor to HBM:

  forward:  read keys tile + q tile, tanh in registers, v-weighted lane
            reduce -> (B, T) f32 energies. HBM traffic: keys once, e once.
  backward: recompute tanh from the same inputs (cheaper than storing it),
            emit dkeys/dq/dv in one pass. The only (B, T, A)-sized HBM
            write left is dkeys itself, which the surrounding scan must
            accumulate regardless.

The reference realised this line inside tf.contrib.seq2seq.BahdanauAttention
(SURVEY.md §2.1 #9 [R]); the XLA formula in ops/attention.py remains the
parity/reference path and the interpret-mode test oracle
(tests/unit/test_attn_energy.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_energy_reference(keys, q, v):
    """The XLA path, verbatim from ops/attention.py / models/decoder.py:
    tanh in the compute dtype of ``keys``/``q``, reduce against ``v`` in f32.
    """
    f32 = jnp.float32
    return jnp.squeeze(
        jnp.tanh(keys + q[:, None, :]).astype(f32) @ v.astype(f32), -1)


def _pick_block(b: int, cap: int = 32) -> int:
    """Largest divisor of b that is <= cap (b is a batch size, cap the
    sublane budget per grid program)."""
    for cand in range(min(b, cap), 0, -1):
        if b % cand == 0:
            return cand
    return 1


# v arrives as (1, A) — lane-major — so its broadcast against the (bb, T, A)
# tile is register-cheap; the (A, 1) param layout would need a sublane->lane
# relayout inside the kernel.


def _fwd_kernel(keys_ref, q_ref, v_ref, e_ref):
    t = jnp.tanh(keys_ref[...] + q_ref[...][:, None, :])   # compute dtype
    vf = v_ref[...][None, :, :]                            # (1, 1, A) f32
    e_ref[...] = jnp.sum(t.astype(jnp.float32) * vf, axis=-1)


def _bwd_kernel(keys_ref, q_ref, v_ref, de_ref, dkeys_ref, dq_ref, dv_ref):
    t = jnp.tanh(keys_ref[...] + q_ref[...][:, None, :]).astype(jnp.float32)
    de = de_ref[...][:, :, None]                           # (bb, T, 1) f32
    vf = v_ref[...][None, :, :]                            # (1, 1, A) f32
    w = de * vf * (1.0 - t * t)                            # (bb, T, A) f32
    dkeys_ref[...] = w.astype(dkeys_ref.dtype)
    dq_ref[...] = jnp.sum(w, axis=1).astype(dq_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dv_ref[...] += jnp.sum(t * de, axis=(0, 1))[None, :]   # (1, A) f32


@lru_cache(maxsize=None)
def _make_fused(block_cap: int, interpret: bool):
    @jax.custom_vjp
    def energy(keys, q, v):
        return _fwd(keys, q, v)

    def _fwd(keys, q, v):
        b, t_in, a = keys.shape
        bb = _pick_block(b, block_cap)
        vf = v.astype(jnp.float32).reshape(1, a)
        return pl.pallas_call(
            _fwd_kernel,
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((bb, t_in, a), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, a), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, t_in), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t_in), jnp.float32),
            interpret=interpret,
        )(keys, q, vf)

    def energy_fwd(keys, q, v):
        return _fwd(keys, q, v), (keys, q, v)

    def energy_bwd(res, de):
        keys, q, v = res
        b, t_in, a = keys.shape
        bb = _pick_block(b, block_cap)
        vf = v.astype(jnp.float32).reshape(1, a)
        dkeys, dq, dv = pl.pallas_call(
            _bwd_kernel,
            grid=(b // bb,),
            in_specs=[
                pl.BlockSpec((bb, t_in, a), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, a), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, t_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, t_in, a), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, a), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(keys.shape, keys.dtype),
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((1, a), jnp.float32),
            ],
            # dv accumulates across grid steps -> the batch grid axis must
            # stay sequential, not be parallelised
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(keys, q, vf, de.astype(jnp.float32))
        return dkeys, dq, dv.reshape(v.shape).astype(v.dtype)

    energy.defvjp(energy_fwd, energy_bwd)
    return energy


def attention_energy(keys, q, v, *, backend: str = "auto",
                     block_cap: int = 32, interpret: bool = False):
    """Bahdanau energies ``v^T tanh(keys + q)`` -> (B, T_in) f32.

    keys: (B, T_in, A) processed memory, compute dtype; q: (B, A) projected
    query, same dtype; v: (A, 1) energy vector (any float dtype; reduced in
    f32 like the XLA path).

    backend: "pallas" forces the fused kernel, "xla" the reference formula,
    "auto" picks the kernel on TPU and the reference path elsewhere (so CPU
    tests and the multichip CPU dryrun keep working with
    ``model.attention_energy="fused"``).
    """
    if backend == "xla" or (backend == "auto"
                            and jax.default_backend() != "tpu"
                            and not interpret):
        return attention_energy_reference(keys, q, v)
    return _make_fused(block_cap, interpret)(keys, q, v)
