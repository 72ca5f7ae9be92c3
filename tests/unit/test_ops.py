"""Unit tests for model ops: shapes, numerics, gate-order pinning.

SURVEY.md §4.3: GRU is verified against a hand-rolled numpy reference with TF1
gate semantics pinned (r,u fused sigmoid with bias-1 init; candidate on r*h;
h' = u*h + (1-u)*c). Reference parity contract: models/ops.py [R].
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.ops import (
    BahdanauAttention,
    CBHG,
    ConvBank,
    GRUCell,
    HighwayStack,
    Prenet,
    bidirectional_gru,
    unidirectional_gru,
)


def np_gru_step(h, x, Wg, bg, Wc, bc):
    """TF1 GRUCell semantics in numpy."""
    ru = 1.0 / (1.0 + np.exp(-(np.concatenate([x, h], -1) @ Wg + bg)))
    r, u = np.split(ru, 2, -1)
    c = np.tanh(np.concatenate([x, r * h], -1) @ Wc + bc)
    return u * h + (1.0 - u) * c


class TestGRU:
    def test_cell_matches_numpy_reference(self):
        d_in, d = 6, 8
        cell = GRUCell(d)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (3, d_in))
        h = jax.random.normal(jax.random.PRNGKey(1), (3, d))
        params = cell.init(key, h, x)
        h_new, _ = cell.apply(params, h, x)

        p = params["params"]
        ref = np_gru_step(
            np.asarray(h), np.asarray(x),
            np.asarray(p["gates"]["kernel"]), np.asarray(p["gates"]["bias"]),
            np.asarray(p["candidate"]["kernel"]), np.asarray(p["candidate"]["bias"]),
        )
        np.testing.assert_allclose(np.asarray(h_new), ref, atol=1e-5)

    def test_gate_bias_init_is_one(self):
        cell = GRUCell(4)
        params = cell.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)), jnp.zeros((1, 3)))
        np.testing.assert_array_equal(
            np.asarray(params["params"]["gates"]["bias"]), np.ones(8)
        )

    def test_scan_gru_matches_stepwise_cell_math(self):
        """The hoisted-projection scan must equal sequential numpy GRU steps."""
        b, t, d_in, d = 2, 5, 3, 4
        m = unidirectional_gru(d)
        key = jax.random.PRNGKey(42)
        xs = jax.random.normal(key, (b, t, d_in))
        params = m.init(key, xs)
        ys, h_last = m.apply(params, xs)

        p = params["params"]["fwd"]
        # reconstruct fused TF1 weights from the split parameterization
        Wg = np.concatenate(
            [np.asarray(p["gates_x"]["kernel"]), np.asarray(p["gates_h"]["kernel"])], 0
        )
        bg = np.asarray(p["gates_x"]["bias"])
        Wc = np.concatenate(
            [np.asarray(p["cand_x"]["kernel"]), np.asarray(p["cand_h"]["kernel"])], 0
        )
        bc = np.asarray(p["cand_x"]["bias"])
        h = np.zeros((b, d))
        for i in range(t):
            h = np_gru_step(h, np.asarray(xs[:, i]), Wg, bg, Wc, bc)
            np.testing.assert_allclose(np.asarray(ys[:, i]), h, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_last), h, atol=1e-5)

    def test_bidirectional_shapes_and_length_masking(self):
        b, t, d = 2, 7, 4
        m = bidirectional_gru(d)
        xs = jax.random.normal(jax.random.PRNGKey(0), (b, t, 3))
        params = m.init(jax.random.PRNGKey(1), xs)
        lengths = jnp.array([7, 4])
        out = m.apply(params, xs, lengths=lengths)
        assert out.shape == (b, t, 2 * d)

        # For the shorter sequence, the backward pass over the valid prefix
        # must be independent of the padded tail.
        xs2 = xs.at[1, 4:].set(99.0)
        out2 = m.apply(params, xs2, lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(out[1, :4, d:]), np.asarray(out2[1, :4, d:]), atol=1e-5
        )


class TestPrenet:
    def test_dropout_active_even_when_deterministic_false(self):
        """Paper §3.2: prenet dropout stays on at inference."""
        m = Prenet((8, 4), dropout=0.5, deterministic=False)
        x = jnp.ones((16, 10))
        params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
        y1 = m.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
        y2 = m.apply(params, x, rngs={"dropout": jax.random.PRNGKey(3)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        assert y1.shape == (16, 4)

    def test_deterministic_mode(self):
        m = Prenet((8, 4), deterministic=True)
        x = jnp.ones((2, 10))
        params = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(params, x)
        y2 = m.apply(params, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestHighway:
    def test_identity_dominates_with_negative_gate(self):
        """With strongly negative gate bias, a highway layer ~= identity."""
        m = HighwayStack(layers=1, dim=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        params = m.init(jax.random.PRNGKey(1), x)
        # push the gate bias very negative -> T ~ 0 -> y ~ x
        params = jax.tree_util.tree_map(lambda a: a, params)
        p = params["params"]
        p["T0"]["bias"] = jnp.full_like(p["T0"]["bias"], -20.0)
        y = m.apply({"params": p}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_resize_when_dim_mismatch(self):
        m = HighwayStack(layers=2, dim=8)
        x = jnp.ones((2, 5, 12))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 5, 8)
        assert "resize" in params["params"]


class TestConvBank:
    def test_output_shape_and_train_stats(self):
        b, t = 2, 11
        m = ConvBank(k=4, channels=8, train=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, 8))
        vars_ = m.init(jax.random.PRNGKey(1), x)
        y, updated = m.apply(vars_, x, mutable=["batch_stats"])
        assert y.shape == (b, t, 4 * 8)
        assert "batch_stats" in updated

    def test_causal_content(self):
        """Width-1 branch of the bank must be position-independent (sanity on
        SAME padding alignment)."""
        m = ConvBank(k=1, channels=4, train=False)
        x = jnp.zeros((1, 8, 4)).at[0, 3].set(1.0)
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        # only position 3 should deviate from the all-zero-row response
        base = np.asarray(y[0, 0])
        np.testing.assert_allclose(np.asarray(y[0, 5]), base, atol=1e-6)
        assert not np.allclose(np.asarray(y[0, 3]), base)


class TestAttention:
    def test_alignment_normalised_and_masked(self):
        b, t_in, d_mem = 2, 9, 6
        m = BahdanauAttention(dim=8)
        mem = jax.random.normal(jax.random.PRNGKey(0), (b, t_in, d_mem))
        q = jax.random.normal(jax.random.PRNGKey(1), (b, 5))
        params = m.init(jax.random.PRNGKey(2), q, mem, method=m.full_step)
        keys = m.apply(params, mem, method=m.process_memory)
        mask = jnp.arange(t_in)[None, :] < jnp.array([[9], [4]])
        ctx, align = m.apply(params, q, keys, mem, mask)
        assert ctx.shape == (b, d_mem)
        np.testing.assert_allclose(np.asarray(align.sum(-1)), np.ones(b), atol=1e-5)
        assert float(align[1, 4:].sum()) < 1e-6  # masked positions get ~0 weight

    def test_context_is_convex_combination(self):
        b, t_in, d_mem = 1, 4, 3
        m = BahdanauAttention(dim=8)
        mem = jnp.eye(4, 3)[None]
        q = jnp.ones((b, 5))
        params = m.init(jax.random.PRNGKey(0), q, mem, method=m.full_step)
        keys = m.apply(params, mem, method=m.process_memory)
        ctx, align = m.apply(params, q, keys, mem)
        np.testing.assert_allclose(
            np.asarray(ctx[0]), np.asarray(align[0, :3]), atol=1e-5
        )


class TestCBHG:
    def test_encoder_shape(self):
        b, t = 2, 13
        m = CBHG(k=4, bank_channels=16, proj_dims=(16, 16), highway_layers=2,
                 highway_dim=16, gru_dim=8, train=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, 16))
        vars_ = m.init(jax.random.PRNGKey(1), x)
        y, _ = m.apply(vars_, x, mutable=["batch_stats"])
        assert y.shape == (b, t, 16)

    def test_postnet_style_with_resize(self):
        """Post-net CBHG: 80-d input, proj back to 80, highway resizes to 128."""
        b, t = 2, 10
        m = CBHG(k=3, bank_channels=16, proj_dims=(32, 80), highway_layers=2,
                 highway_dim=16, gru_dim=8, train=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, 80))
        vars_ = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(vars_, x)
        assert y.shape == (b, t, 16)

    def test_gradients_flow(self):
        m = CBHG(k=2, bank_channels=8, proj_dims=(8, 8), highway_layers=1,
                 highway_dim=8, gru_dim=4, train=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8))
        vars_ = m.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(m.apply({"params": p, "batch_stats": vars_["batch_stats"]}, x) ** 2)

        g = jax.grad(loss)(vars_["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestConvBankPacked:
    def test_packed_matches_unpacked(self):
        """Packed single-conv evaluation must equal the K separate convs."""
        b, t, c, k, ch = 2, 13, 8, 5, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
        m_ref = ConvBank(k=k, channels=ch, train=False, packed=False)
        vars_ref = m_ref.init(jax.random.PRNGKey(1), x)
        m_pk = ConvBank(k=k, channels=ch, train=False, packed=True)
        vars_pk = m_pk.init(jax.random.PRNGKey(2), x)
        # same param structure: run packed with the unpacked params
        assert jax.tree_util.tree_structure(vars_pk) == jax.tree_util.tree_structure(vars_ref)
        y_ref = m_ref.apply(vars_ref, x)
        y_pk = m_pk.apply(vars_ref, x)
        np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_packed_grads_match(self):
        b, t, c, k, ch = 1, 9, 4, 4, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
        m_ref = ConvBank(k=k, channels=ch, train=False, packed=False)
        vars_ = m_ref.init(jax.random.PRNGKey(1), x)
        m_pk = ConvBank(k=k, channels=ch, train=False, packed=True)

        def loss(m):
            def f(p):
                return jnp.sum(m.apply({"params": p, "batch_stats": vars_["batch_stats"]}, x) ** 2)
            return jax.grad(f)(vars_["params"])

        g_ref = loss(m_ref)
        g_pk = loss(m_pk)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("groups", [2, 3, 5])
    def test_grouped_matches_unpacked(self, groups):
        """Grouped packing (contiguous width ranges as separate convs) must
        equal the K separate convs with the same params, including a group
        count that does not divide K."""
        b, t, c, k, ch = 2, 13, 8, 5, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
        m_ref = ConvBank(k=k, channels=ch, train=False, packed=False)
        vars_ref = m_ref.init(jax.random.PRNGKey(1), x)
        y_ref = m_ref.apply(vars_ref, x)
        m_g = ConvBank(k=k, channels=ch, train=False, packed=True,
                       groups=groups)
        vars_g = m_g.init(jax.random.PRNGKey(2), x)
        assert (jax.tree_util.tree_structure(vars_g)
                == jax.tree_util.tree_structure(vars_ref))
        y_g = m_g.apply(vars_ref, x)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)


class TestStackedBiGRU:
    def test_stacked_matches_two_scan(self):
        """Single-scan (stacked directions) biGRU == two-scan reference,
        including tail masking via lengths."""
        b, t, d_in, d = 3, 9, 5, 6
        xs = jax.random.normal(jax.random.PRNGKey(0), (b, t, d_in))
        lengths = jnp.array([9, 6, 4])
        m_ref = bidirectional_gru(d, stacked=False)
        params = m_ref.init(jax.random.PRNGKey(1), xs, lengths=lengths)
        m_st = bidirectional_gru(d, stacked=True)
        params_st = m_st.init(jax.random.PRNGKey(2), xs, lengths=lengths)
        assert jax.tree_util.tree_structure(params_st) == jax.tree_util.tree_structure(params)
        y_ref = m_ref.apply(params, xs, lengths=lengths)
        y_st = m_st.apply(params, xs, lengths=lengths)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_stacked_no_lengths(self):
        b, t, d = 2, 7, 4
        xs = jax.random.normal(jax.random.PRNGKey(3), (b, t, 3))
        m_ref = bidirectional_gru(d, stacked=False)
        params = m_ref.init(jax.random.PRNGKey(4), xs)
        y_ref = m_ref.apply(params, xs)
        y_st = bidirectional_gru(d, stacked=True).apply(params, xs)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_stacked_matches_two_scan_bf16(self):
        """Under bf16 compute both layouts accumulate recurrent matmuls in
        f32, so they must agree to bf16 rounding, not drift apart."""
        b, t, d_in, d = 3, 9, 5, 6
        xs = jax.random.normal(jax.random.PRNGKey(0), (b, t, d_in))
        lengths = jnp.array([9, 6, 4])
        m_ref = bidirectional_gru(d, stacked=False, dtype=jnp.bfloat16)
        params = m_ref.init(jax.random.PRNGKey(1), xs, lengths=lengths)
        y_ref = m_ref.apply(params, xs, lengths=lengths)
        y_st = bidirectional_gru(d, stacked=True, dtype=jnp.bfloat16).apply(
            params, xs, lengths=lengths)
        assert jnp.isfinite(y_st.astype(jnp.float32)).all()
        np.testing.assert_allclose(
            np.asarray(y_st, np.float32), np.asarray(y_ref, np.float32),
            rtol=2e-2, atol=1e-2)

    @pytest.mark.parametrize("stacked", [True, False])
    def test_unroll_is_bit_identical(self, stacked):
        """lax.scan unroll is a schedule knob, not a math change: unroll=4
        must match unroll=1 bitwise on both biGRU layouts, including a T not
        divisible by the unroll factor and tail masking via lengths."""
        b, t, d_in, d = 3, 13, 5, 6
        xs = jax.random.normal(jax.random.PRNGKey(0), (b, t, d_in))
        lengths = jnp.array([13, 7, 4])
        m1 = bidirectional_gru(d, stacked=stacked, unroll=1)
        params = m1.init(jax.random.PRNGKey(1), xs, lengths=lengths)
        y1 = m1.apply(params, xs, lengths=lengths)
        y4 = bidirectional_gru(d, stacked=stacked, unroll=4).apply(
            params, xs, lengths=lengths)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y4))
