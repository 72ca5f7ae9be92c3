"""Model assembly tests: shapes, modes sharing params, grad flow.

Covers SURVEY.md §3.4 tensor-shape trace and §3.5 (one pytree serves both the
teacher-forced and feed-previous graphs — the TF1 variable-scope contract
collapses away).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron

CFG = get_config("tiny_cpu").model  # embed 64, K=4, r=5


def _batch(b=2, t_in=12, t_out=20):
    key = jax.random.PRNGKey(0)
    text = jax.random.randint(key, (b, t_in), 1, 30)
    lengths = jnp.array([t_in, t_in - 4])
    mel = jax.random.uniform(jax.random.PRNGKey(1), (b, t_out, CFG.n_mels))
    return text, lengths, mel


@pytest.fixture(scope="module")
def model_and_params():
    text, lengths, mel = _batch()
    model = Tacotron(CFG, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, lengths, gt_mel=mel,
    )
    return model, variables


class TestTeacherForced:
    def test_output_shapes(self, model_and_params):
        model, variables = model_and_params
        text, lengths, mel = _batch()
        out, _ = model.apply(
            variables, text, lengths, gt_mel=mel,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        b, t_out = mel.shape[0], mel.shape[1]
        assert out.mel.shape == (b, t_out, CFG.n_mels)
        assert out.linear.shape == (b, t_out, CFG.n_freq)
        assert out.alignments.shape == (b, t_out // CFG.r, text.shape[1])
        align_sums = np.asarray(out.alignments.sum(-1))
        np.testing.assert_allclose(align_sums, np.ones_like(align_sums), atol=1e-4)

    def test_t_out_not_multiple_of_r_asserts(self, model_and_params):
        model, variables = model_and_params
        text, lengths, _ = _batch()
        bad_mel = jnp.zeros((2, 21, CFG.n_mels))  # 21 % 5 != 0
        with pytest.raises(AssertionError):
            model.apply(
                variables, text, lengths, gt_mel=bad_mel,
                rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )

    def test_gradients_finite(self, model_and_params):
        model, variables = model_and_params
        text, lengths, mel = _batch()

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                text, lengths, gt_mel=mel,
                rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(out.mel - mel)) + jnp.mean(jnp.abs(out.linear))

        g = jax.grad(loss_fn)(variables["params"])
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            arr = np.asarray(leaf)
            assert np.all(np.isfinite(arr)), f"non-finite grad at {path}"


class TestAutoregressive:
    def test_same_params_drive_inference(self, model_and_params):
        """The teacher-forced pytree must run the feed-previous graph
        unchanged (SURVEY.md §3.5)."""
        model, variables = model_and_params
        text, lengths, _ = _batch()
        infer_model = Tacotron(CFG, train=False)
        out = infer_model.apply(
            variables, text, lengths, n_steps=6,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert out.mel.shape == (2, 6 * CFG.r, CFG.n_mels)
        assert out.linear.shape == (2, 6 * CFG.r, CFG.n_freq)
        assert np.all(np.isfinite(np.asarray(out.mel)))

    def test_decode_is_jittable(self, model_and_params):
        model, variables = model_and_params
        text, lengths, _ = _batch()
        infer_model = Tacotron(CFG, train=False)

        @jax.jit
        def synth(v, text, lengths, rng):
            return infer_model.apply(
                v, text, lengths, n_steps=4, rngs={"dropout": rng}
            ).mel

        mel1 = synth(variables, text, lengths, jax.random.PRNGKey(0))
        mel2 = synth(variables, text, lengths, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(mel1), np.asarray(mel2))

    def test_prenet_dropout_active_at_inference(self, model_and_params):
        """Paper §3.2: decoding twice with different dropout rngs differs."""
        model, variables = model_and_params
        text, lengths, _ = _batch()
        infer_model = Tacotron(CFG, train=False)
        m1 = infer_model.apply(variables, text, lengths, n_steps=4,
                               rngs={"dropout": jax.random.PRNGKey(10)}).mel
        m2 = infer_model.apply(variables, text, lengths, n_steps=4,
                               rngs={"dropout": jax.random.PRNGKey(11)}).mel
        assert not np.allclose(np.asarray(m1), np.asarray(m2))


class TestParamCount:
    def test_full_model_param_count_in_expected_range(self):
        """Full 256-d Tacotron is ~7M params (SURVEY.md §2.3). Shape-only init
        via eval_shape — counting params needs no weight materialisation (the
        real init took ~37 s of the suite's budget, VERDICT r1 weak #8)."""
        cfg = get_config("full_1chip").model
        model = Tacotron(cfg, train=True)
        text = jnp.ones((1, 8), jnp.int32)
        mel = jnp.zeros((1, cfg.r * 2, cfg.n_mels))
        variables = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                text, jnp.array([8]), gt_mel=mel,
            )
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables["params"]))
        assert 4e6 < n < 15e6, f"param count {n/1e6:.2f}M outside expected range"


class TestRemat:
    def test_remat_decoder_same_loss_and_grads(self):
        """remat changes memory, not math."""
        import dataclasses
        text, lengths, mel = _batch()
        cfgs = [dataclasses.replace(CFG, remat_decoder=f) for f in (False, True)]
        outs = []
        for c in cfgs:
            model = Tacotron(c, train=True)
            variables = model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                text, lengths, gt_mel=mel,
            )

            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    text, lengths, gt_mel=mel,
                    rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
                )
                return jnp.mean(jnp.abs(out.mel - mel))

            l, g = jax.value_and_grad(loss_fn)(variables["params"])
            outs.append((float(l), g))
        assert outs[0][0] == pytest.approx(outs[1][0], rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                        jax.tree_util.tree_leaves(outs[1][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_remat_policy_save_attn_same_loss_and_grads(self):
        """model.remat_policy="save_attn" saves the Bahdanau tanh tensor
        instead of recomputing it on backward (hoisted decoder) — a pure
        memory/traffic schedule change: loss AND grads must match the
        default recompute-everything policy exactly (the saved tensor is
        numerically the tensor the default policy recomputes)."""
        import dataclasses
        text, lengths, mel = _batch()
        base = dataclasses.replace(CFG, tf_decoder="hoisted",
                                   remat_decoder=True)
        outs = []
        for pol in ("all", "save_attn"):
            model = Tacotron(dataclasses.replace(base, remat_policy=pol),
                             train=True)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                text, lengths, gt_mel=mel,
            )

            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    text, lengths, gt_mel=mel,
                    rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"],
                )
                return jnp.mean(jnp.abs(out.mel - mel))

            l, g = jax.value_and_grad(loss_fn)(variables["params"])
            outs.append((float(l), g))
        assert outs[0][0] == outs[1][0]
        for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                        jax.tree_util.tree_leaves(outs[1][1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGRUScanUnroll:
    def test_gru_unroll_full_model_bit_identical(self):
        """model.gru_scan_unroll (encoder + postnet biGRU scans) is a
        schedule knob: the full teacher-forced forward must be bit-identical
        at unroll 1 vs 4, on the same params."""
        import dataclasses
        text, lengths, mel = _batch()
        m1 = Tacotron(dataclasses.replace(CFG, gru_scan_unroll=1), train=True)
        m4 = Tacotron(dataclasses.replace(CFG, gru_scan_unroll=4), train=True)
        variables = m1.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            text, lengths, gt_mel=mel,
        )
        kwargs = dict(rngs={"dropout": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])
        out1, _ = m1.apply(variables, text, lengths, gt_mel=mel, **kwargs)
        out4, _ = m4.apply(variables, text, lengths, gt_mel=mel, **kwargs)
        np.testing.assert_array_equal(np.asarray(out1.mel), np.asarray(out4.mel))
        np.testing.assert_array_equal(np.asarray(out1.linear),
                                      np.asarray(out4.linear))
