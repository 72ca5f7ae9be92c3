"""TF1-name -> pytree converter round trip (SURVEY.md §5.4; VERDICT r1 item 7).

No real TF1 checkpoint exists (the reference mount is empty — SURVEY.md §0),
so the test SYNTHESIZES a TF1-style variable dict covering every NAME_TABLE
pattern from a freshly-initialised tiny model's own leaves, converts it, and
asserts (a) zero unmatched on both sides, zero errors; (b) every leaf landed
at its home path bit-identically; (c) the converted params run a forward pass.
This pins each pattern so a real checkpoint drop-in only has to adjust scope
prefixes, not the machinery.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron
from tacotron_tpu.utils.tf1_converter import convert


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = get_config("tiny_cpu")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, vocab_size=32))
    model = Tacotron(cfg.model, train=True)
    b, t_in, t_out = 2, 12, 4 * cfg.model.r
    text = jnp.ones((b, t_in), jnp.int32)
    lens = jnp.full((b,), t_in, jnp.int32)
    mel = jnp.zeros((b, t_out, cfg.model.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, lens, gt_mel=mel,
    )
    return cfg, model, variables, (text, lens, mel)


def _tf1_names(params, batch_stats):
    """Invert the expected mapping: our leaves -> plausible TF1 names."""
    g = lambda t, p: np.asarray(_walk(t, p))
    tf = {}
    P = "model/inference"

    tf[f"{P}/embedding"] = g(params, "encoder/embed/embedding")
    for i in range(2):
        sfx = "" if i == 0 else f"_{i}"
        tf[f"{P}/prenet/dense{sfx}/kernel"] = g(params, f"encoder/prenet/fc{i}/kernel")
        tf[f"{P}/prenet/dense{sfx}/bias"] = g(params, f"encoder/prenet/fc{i}/bias")
        tf[f"{P}/decoder/prenet/dense{sfx}/kernel"] = g(params, f"decoder/cell/prenet/fc{i}/kernel")
        tf[f"{P}/decoder/prenet/dense{sfx}/bias"] = g(params, f"decoder/cell/prenet/fc{i}/bias")

    for scope, ours in (("encoder_cbhg", "encoder/cbhg"), ("post_cbhg", "postnet/cbhg")):
        bank = _walk(params, f"{ours}/bank")
        ks = sorted(int(k[4:]) for k in bank if k.startswith("conv"))
        for k in ks:
            tf[f"{P}/{scope}/conv1d_banks/num_{k}/conv1d/kernel"] = g(params, f"{ours}/bank/conv{k}/kernel")
            for field, (tree, leaf) in {
                "gamma": (params, "scale"), "beta": (params, "bias"),
                "moving_mean": (batch_stats, "mean"),
                "moving_variance": (batch_stats, "var"),
            }.items():
                tf[f"{P}/{scope}/conv1d_banks/num_{k}/batch_normalization/{field}"] = \
                    g(tree, f"{ours}/bank/bn{k}/bn/{leaf}")
        proj = _walk(params, f"{ours}/proj")
        n_proj = sum(1 for k in proj if k.startswith("proj"))
        for i in range(n_proj):
            tf[f"{P}/{scope}/conv1d_proj_{i}/conv1d/kernel"] = g(params, f"{ours}/proj/proj{i}/kernel")
            for field, (tree, leaf) in {
                "gamma": (params, "scale"), "beta": (params, "bias"),
                "moving_mean": (batch_stats, "mean"),
                "moving_variance": (batch_stats, "var"),
            }.items():
                tf[f"{P}/{scope}/conv1d_proj_{i}/batch_normalization/{field}"] = \
                    g(tree, f"{ours}/proj/bn{i}/bn/{leaf}")
        hw = _walk(params, f"{ours}/highway")
        n_hw = sum(1 for k in hw if k.startswith("H"))
        for i in range(n_hw):
            tf[f"{P}/{scope}/highwaynet_{i}/dense/kernel"] = g(params, f"{ours}/highway/H{i}/kernel")
            tf[f"{P}/{scope}/highwaynet_{i}/dense/bias"] = g(params, f"{ours}/highway/H{i}/bias")
            tf[f"{P}/{scope}/highwaynet_{i}/dense_1/kernel"] = g(params, f"{ours}/highway/T{i}/kernel")
            tf[f"{P}/{scope}/highwaynet_{i}/dense_1/bias"] = g(params, f"{ours}/highway/T{i}/bias")
        if "resize" in hw:
            tf[f"{P}/{scope}/highway_resize/kernel"] = g(params, f"{ours}/highway/resize/kernel")
            tf[f"{P}/{scope}/highway_resize/bias"] = g(params, f"{ours}/highway/resize/bias")
        # biGRU: fuse our hoisted split back into TF's [x, h] layout
        for d, tfd in (("fwd", "fw"), ("bwd", "bw")):
            gx = g(params, f"{ours}/bigru/{d}/gates_x/kernel")
            gh = g(params, f"{ours}/bigru/{d}/gates_h/kernel")
            tf[f"{P}/{scope}/bidirectional_rnn/{tfd}/gru_cell/gates/kernel"] = \
                np.concatenate([gx, gh], axis=0)
            tf[f"{P}/{scope}/bidirectional_rnn/{tfd}/gru_cell/gates/bias"] = \
                g(params, f"{ours}/bigru/{d}/gates_x/bias")
            cx = g(params, f"{ours}/bigru/{d}/cand_x/kernel")
            ch = g(params, f"{ours}/bigru/{d}/cand_h/kernel")
            tf[f"{P}/{scope}/bidirectional_rnn/{tfd}/gru_cell/candidate/kernel"] = \
                np.concatenate([cx, ch], axis=0)
            tf[f"{P}/{scope}/bidirectional_rnn/{tfd}/gru_cell/candidate/bias"] = \
                g(params, f"{ours}/bigru/{d}/cand_x/bias")

    tf[f"{P}/memory_layer/kernel"] = g(params, "memory_proj/kernel")
    tf[f"{P}/decoder/bahdanau_attention/query_layer/kernel"] = \
        g(params, "decoder/cell/attention/query/kernel")
    tf[f"{P}/decoder/bahdanau_attention/attention_v"] = \
        g(params, "decoder/cell/attention/v").reshape(-1)

    for tf_cell, ours_cell in (("attention_wrapper/gru_cell", "attention_gru"),
                               ("multi_rnn_cell/cell_0/gru_cell", "decoder_gru0"),
                               ("multi_rnn_cell/cell_1/gru_cell", "decoder_gru1")):
        for part in ("gates", "candidate"):
            for leaf in ("kernel", "bias"):
                tf[f"{P}/decoder/{tf_cell}/{part}/{leaf}"] = \
                    g(params, f"decoder/cell/{ours_cell}/{part}/{leaf}")

    tf[f"{P}/decoder/output_projection_wrapper/kernel"] = \
        g(params, "decoder/cell/decoder_input_proj/kernel")
    tf[f"{P}/decoder/output_projection_wrapper/bias"] = \
        g(params, "decoder/cell/decoder_input_proj/bias")
    # generic denses, resolved by shape: frame proj + postnet linear proj
    tf[f"{P}/decoder/dense/kernel"] = g(params, "decoder/cell/frame_proj/kernel")
    tf[f"{P}/decoder/dense/bias"] = g(params, "decoder/cell/frame_proj/bias")
    tf[f"{P}/dense_2/kernel"] = g(params, "postnet/linear_proj/kernel")
    tf[f"{P}/dense_2/bias"] = g(params, "postnet/linear_proj/bias")
    return tf


def _walk(tree, path):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def test_convert_full_coverage_and_forward(model_and_vars):
    cfg, model, variables, (text, lens, mel) = model_and_vars
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    batch_stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    # perturb the targets so the test detects leaves that were NOT overwritten
    tgt_params = jax.tree_util.tree_map(lambda a: a + 1.0, params)
    tgt_stats = jax.tree_util.tree_map(lambda a: a + 1.0, batch_stats)

    tf_vars = _tf1_names(params, batch_stats)
    out = convert(tf_vars, tgt_params, tgt_stats)

    assert out["errors"] == {}, out["errors"]
    assert out["unmatched_tf"] == [], out["unmatched_tf"]
    assert out["unmatched_ours"] == [], out["unmatched_ours"]

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(out["params"])[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(batch_stats)[0],
        jax.tree_util.tree_flatten_with_path(out["batch_stats"])[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))

    # converted params run a teacher-forced forward pass and agree with the
    # originals exactly
    o1, _ = model.apply(variables, text, lens, gt_mel=mel,
                        rngs={"dropout": jax.random.PRNGKey(7)},
                        mutable=["batch_stats"])
    o2, _ = model.apply({"params": out["params"],
                         "batch_stats": out["batch_stats"]},
                        text, lens, gt_mel=mel,
                        rngs={"dropout": jax.random.PRNGKey(7)},
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o1.mel), np.asarray(o2.mel), rtol=0, atol=0)


def test_shape_mismatch_is_error_not_misassign(model_and_vars):
    cfg, model, variables, _ = model_and_vars
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    bad = {"model/inference/embedding": np.zeros((7, 7), np.float32)}
    out = convert(bad, params)
    assert "model/inference/embedding" in out["errors"]
    # target leaf untouched
    np.testing.assert_array_equal(
        out["params"]["encoder"]["embed"]["embedding"],
        params["encoder"]["embed"]["embedding"])


def test_three_cell_multirnn_convention(model_and_vars):
    """barronalex-style MultiRNNCell([attn cell, res-GRU, res-GRU]) scopes the
    cells as cell_0..cell_2: cell_0 is the ATTENTION GRU and cell_1/cell_2 are
    the residual decoder GRUs (decided from the whole name set, not per-var)."""
    cfg, model, variables, _ = model_and_vars
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    g = lambda p: _walk(params, p)
    tf = {}
    for i, ours in enumerate(("attention_gru", "decoder_gru0", "decoder_gru1")):
        for part in ("gates", "candidate"):
            for leaf in ("kernel", "bias"):
                tf[f"model/decoder/multi_rnn_cell/cell_{i}/gru_cell/{part}/{leaf}"] = \
                    g(f"decoder/cell/{ours}/{part}/{leaf}")
    out = convert(tf, params)
    assert not out["errors"], out["errors"]
    assert not out["unmatched_tf"], out["unmatched_tf"]
    for i, ours in enumerate(("attention_gru", "decoder_gru0", "decoder_gru1")):
        np.testing.assert_array_equal(
            _walk(out["params"], f"decoder/cell/{ours}/gates/kernel"),
            g(f"decoder/cell/{ours}/gates/kernel"))
    # a cell index outside the known topologies is unmatched, never a crash
    out2 = convert({"model/decoder/multi_rnn_cell/cell_7/gru_cell/gates/kernel":
                    np.zeros((4, 4), np.float32)}, params)
    assert out2["unmatched_tf"] == \
        ["model/decoder/multi_rnn_cell/cell_7/gru_cell/gates/kernel"]


def test_multi_target_mismatch_commits_nothing(model_and_vars):
    """gru_split emits two assignments; if the second one's shape mismatches,
    the FIRST must not have been committed (no half-written fused kernel)."""
    cfg, model, variables, _ = model_and_vars
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    g = lambda p: _walk(params, p)
    gx = g("encoder/cbhg/bigru/fwd/gates_x/kernel")
    # right x-half width, wrong total rows -> h-half mismatches
    bad = np.zeros((gx.shape[0] + 3, gx.shape[1]), np.float32)
    name = ("model/inference/encoder_cbhg/bidirectional_rnn/fw/gru_cell/"
            "gates/kernel")
    out = convert({name: bad}, params)
    assert name in out["errors"]
    np.testing.assert_array_equal(
        _walk(out["params"], "encoder/cbhg/bigru/fwd/gates_x/kernel"), gx)
    assert "encoder/cbhg/bigru/fwd/gates_x/kernel" in \
        "\n".join(out["unmatched_ours"])
