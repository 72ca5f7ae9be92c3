"""GRU cell and sequence scans.

TPU-native replacement for the reference's ``tf.nn.rnn_cell.GRUCell`` +
``bidirectional_dynamic_rnn`` / ``dynamic_rnn`` while_loops (SURVEY.md §2.2
[R]). Gate semantics match TF1's GRUCell exactly (the parity contract,
pinned in tests/unit/test_ops.py::TestGRU / ::TestStackedBiGRU):

    r, u = sigmoid(W_g [x, h] + b_g)        # b_g initialised to 1.0
    c    = tanh(W_c [x, r * h] + b_c)
    h'   = u * h + (1 - u) * c

Sequences run under ``jax.lax.scan`` with the two gate matmuls fused into one
``[x, h] @ W`` MXU dot per step. The input-to-hidden half of the gate matmul
for the *whole sequence* is hoisted out of the scan (one big (B*T, D) @ W dot
that XLA tiles onto the MXU) — only the recurrent half runs sequentially.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRUCell(nn.Module):
    """TF1-semantics GRU cell. One step: (h, x) -> (h', h')."""

    features: int
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None    # matmul dtype; gates/state stay f32

    @nn.compact
    def __call__(self, h, x):
        d = self.features
        dense_g = nn.Dense(
            2 * d,
            name="gates",
            bias_init=nn.initializers.ones,  # TF GRUCell gate bias init = 1.0
            param_dtype=self.param_dtype,
            dtype=self.dtype,
        )
        dense_c = nn.Dense(d, name="candidate", param_dtype=self.param_dtype,
                           dtype=self.dtype)
        f32 = jnp.float32
        h = h.astype(f32)
        ru = jax.nn.sigmoid(dense_g(jnp.concatenate([x, h], axis=-1)).astype(f32))
        r, u = jnp.split(ru, 2, axis=-1)
        c = jnp.tanh(dense_c(jnp.concatenate([x, r * h], axis=-1)).astype(f32))
        h_new = u * h + (1.0 - u) * c
        return h_new, h_new


class _ScanGRU(nn.Module):
    """Scan a GRUCell over time with the input-projection hoisted.

    Equivalent math to GRUCell per step, but the x-half of both matmuls is
    computed for all timesteps at once before the scan.
    """

    features: int
    reverse: bool = False
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None
    unroll: int = 1                   # lax.scan unroll factor

    @nn.compact
    def __call__(self, xs, h0=None, lengths=None):
        # xs: (B, T, D_in)
        b, t, _ = xs.shape
        d = self.features
        # Parameters laid out to match GRUCell's fused [x, h] @ W contract.
        wg_x = nn.Dense(2 * d, name="gates_x", bias_init=nn.initializers.ones,
                        param_dtype=self.param_dtype, dtype=self.dtype)
        wc_x = nn.Dense(d, name="cand_x", param_dtype=self.param_dtype,
                        dtype=self.dtype)
        # Recurrent weights as raw params: flax modules can't be applied
        # inside a raw lax.scan body, and the scan carries only h anyway.
        init = nn.initializers.lecun_normal()
        wg_h = self.param("gates_h", lambda k: {"kernel": init(k, (d, 2 * d), self.param_dtype)})["kernel"]
        wc_h = self.param("cand_h", lambda k: {"kernel": init(k, (d, d), self.param_dtype)})["kernel"]

        gx = wg_x(xs)   # (B, T, 2d) — hoisted: one big MXU matmul
        cx = wc_x(xs)   # (B, T, d)

        if h0 is None:
            h0 = jnp.zeros((b, d), xs.dtype)

        if self.reverse and lengths is not None:
            # Reverse only the valid prefix of each sequence so padding stays
            # at the tail (matches TF bidirectional_dynamic_rnn sequence_length
            # handling).
            idx = jnp.arange(t)
            rev = jnp.where(idx[None, :] < lengths[:, None],
                            lengths[:, None] - 1 - idx[None, :], idx[None, :])
            gx = jnp.take_along_axis(gx, rev[..., None], axis=1)
            cx = jnp.take_along_axis(cx, rev[..., None], axis=1)
        elif self.reverse:
            gx, cx = gx[:, ::-1], cx[:, ::-1]

        cd = self.dtype or self.param_dtype
        wg_h_c, wc_h_c = wg_h.astype(cd), wc_h.astype(cd)
        f32 = jnp.float32

        def step(h, inp):
            gx_t, cx_t = inp
            # f32 accumulation for the recurrent matmuls under bf16 compute,
            # matching the stacked-bigru step and the Pallas _gru_step
            rec_g = jnp.matmul(h.astype(cd), wg_h_c, preferred_element_type=f32)
            ru = jax.nn.sigmoid((gx_t + rec_g).astype(f32))
            r, u = jnp.split(ru, 2, axis=-1)
            rec_c = jnp.matmul((r * h).astype(cd), wc_h_c,
                               preferred_element_type=f32)
            c = jnp.tanh((cx_t + rec_c).astype(f32))
            h_new = u * h + (1.0 - u) * c
            return h_new, h_new

        h0 = h0.astype(f32)
        h_last, ys = jax.lax.scan(step, h0, (gx.swapaxes(0, 1), cx.swapaxes(0, 1)),
                                  unroll=self.unroll)
        ys = ys.swapaxes(0, 1)  # (B, T, d)

        if self.reverse and lengths is not None:
            idx = jnp.arange(t)
            rev = jnp.where(idx[None, :] < lengths[:, None],
                            lengths[:, None] - 1 - idx[None, :], idx[None, :])
            ys = jnp.take_along_axis(ys, rev[..., None], axis=1)
        elif self.reverse:
            ys = ys[:, ::-1]
        return ys, h_last


class _GRUDirParams(nn.Module):
    """One direction's params (same tree as _ScanGRU) + hoisted projections."""

    features: int
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, xs):
        d = self.features
        init = nn.initializers.lecun_normal()
        gx = nn.Dense(2 * d, name="gates_x", bias_init=nn.initializers.ones,
                      param_dtype=self.param_dtype, dtype=self.dtype)(xs)
        cx = nn.Dense(d, name="cand_x", param_dtype=self.param_dtype,
                      dtype=self.dtype)(xs)
        wg_h = self.param("gates_h",
                          lambda k: {"kernel": init(k, (d, 2 * d), self.param_dtype)})["kernel"]
        wc_h = self.param("cand_h",
                          lambda k: {"kernel": init(k, (d, d), self.param_dtype)})["kernel"]
        return gx, cx, wg_h, wc_h


class unidirectional_gru(nn.Module):
    features: int
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype | None = None
    unroll: int = 1

    @nn.compact
    def __call__(self, xs, h0=None):
        ys, h = _ScanGRU(self.features, reverse=False, param_dtype=self.param_dtype,
                         dtype=self.dtype, unroll=self.unroll, name="fwd")(xs, h0)
        return ys, h


class bidirectional_gru(nn.Module):
    """Concat of forward and backward GRU outputs: (B, T, 2*features).

    ``stacked=True`` (default) runs BOTH directions in ONE lax.scan: the
    backward stream's inputs are time-reversed and stacked on the batch axis,
    and the two directions' recurrent weights form a 2-group batched matmul.
    Sequential chain length halves (T steps instead of 2T) — the encoder and
    post-net biGRUs are among the longest serial chains in the training step.
    Param layout is identical to the two-scan form (fwd/bwd submodule trees).
    """

    features: int
    param_dtype: jnp.dtype = jnp.float32
    stacked: bool = True
    dtype: jnp.dtype | None = None
    unroll: int = 1                   # lax.scan unroll factor (both paths)

    @nn.compact
    def __call__(self, xs, lengths=None):
        if not self.stacked:
            fwd, _ = _ScanGRU(self.features, reverse=False,
                              param_dtype=self.param_dtype, dtype=self.dtype,
                              unroll=self.unroll, name="fwd")(xs)
            bwd, _ = _ScanGRU(self.features, reverse=True,
                              param_dtype=self.param_dtype, dtype=self.dtype,
                              unroll=self.unroll, name="bwd")(xs,
                                          lengths=lengths)
            return jnp.concatenate([fwd, bwd], axis=-1)

        b, t, _ = xs.shape
        d = self.features
        # param trees identical to _ScanGRU's fwd/ and bwd/ scopes
        fwd = _GRUDirParams(d, self.param_dtype, self.dtype, name="fwd")
        bwd = _GRUDirParams(d, self.param_dtype, self.dtype, name="bwd")

        # hoisted input projections for both directions
        gx_f, cx_f, fwd_gh, fwd_ch = fwd(xs)
        if lengths is not None:
            idx = jnp.arange(t)
            rev = jnp.where(idx[None, :] < lengths[:, None],
                            lengths[:, None] - 1 - idx[None, :], idx[None, :])
            xs_r = jnp.take_along_axis(xs, rev[..., None], axis=1)
        else:
            xs_r = xs[:, ::-1]
        gx_b, cx_b, bwd_gh, bwd_ch = bwd(xs_r)

        # stack directions on the batch axis: (T, 2B, ·)
        gx = jnp.concatenate([gx_f, gx_b], axis=0).swapaxes(0, 1)
        cx = jnp.concatenate([cx_f, cx_b], axis=0).swapaxes(0, 1)
        cd = self.dtype or self.param_dtype
        f32 = jnp.float32
        wgh = jnp.stack([fwd_gh, bwd_gh]).astype(cd)     # (2, d, 2d)
        wch = jnp.stack([fwd_ch, bwd_ch]).astype(cd)     # (2, d, d)

        def step(h, inp):
            gx_t, cx_t = inp                   # (2B, ·)
            hg = h.astype(cd).reshape(2, b, d)
            rec_g = jax.lax.dot_general(       # 2-group batched matmul
                hg, wgh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32).reshape(2 * b, 2 * d)
            ru = jax.nn.sigmoid((gx_t + rec_g).astype(f32))
            r, u = jnp.split(ru, 2, axis=-1)
            rh = (r * h).astype(cd).reshape(2, b, d)
            rec_c = jax.lax.dot_general(
                rh, wch, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32).reshape(2 * b, d)
            c = jnp.tanh((cx_t + rec_c).astype(f32))
            h_new = u * h + (1.0 - u) * c
            return h_new, h_new

        h0 = jnp.zeros((2 * b, d), xs.dtype)
        _, ys = jax.lax.scan(step, h0, (gx, cx), unroll=self.unroll)
        ys = ys.swapaxes(0, 1)                 # (2B, T, d)
        out_f, out_b = ys[:b], ys[b:]
        if lengths is not None:
            out_b = jnp.take_along_axis(out_b, rev[..., None], axis=1)
        else:
            out_b = out_b[:, ::-1]
        return jnp.concatenate([out_f, out_b], axis=-1)
