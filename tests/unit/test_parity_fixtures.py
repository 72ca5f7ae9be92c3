"""Parity fixture harness (SURVEY.md §4.3; driver config 2 = cbhg_encoder).

Fixtures are loaded BY NAME from tests/fixtures/*.npz; today they are
self-golden (frozen from our spec-built modules), and reference-derived
goldens drop into the same files later without code changes. Each test
reconstructs the module, loads params from the fixture, and checks outputs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def _load(name):
    path = os.path.join(FIXDIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name}.npz not generated "
                    "(run tests/fixtures/generate.py)")
    data = dict(np.load(path))
    ins = {k[4:]: v for k, v in data.items() if k.startswith("in__")}
    outs = {k[5:]: v for k, v in data.items() if k.startswith("out__")}
    params = {k[7:]: v for k, v in data.items() if k.startswith("param__")}
    return ins, outs, params


def _params_tree(template, flat):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    rebuilt = []
    for path, leaf in leaves:
        key = "/".join(str(k.key) for k in path)
        assert key in flat, f"fixture missing param {key}"
        rebuilt.append(jnp.asarray(flat[key]))
    return jax.tree_util.tree_unflatten(treedef.treedef if hasattr(treedef, "treedef") else treedef,
                                        rebuilt)


def _rebuild(template, flat):
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    rebuilt = []
    for path, _ in flat_t:
        key = "/".join(str(k.key) for k in path)
        assert key in flat, f"fixture missing param {key}"
        a = jnp.asarray(flat[key])
        if a.dtype == jnp.float16:
            # f16-stored fixture params (storage halving): the generator
            # rounded its live params through f16 before computing outputs,
            # so this cast-up reproduces them exactly
            a = a.astype(jnp.float32)
        rebuilt.append(a)
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


def test_gru_fixture():
    from tacotron_tpu.ops import unidirectional_gru

    ins, outs, flat = _load("gru")
    m = unidirectional_gru(16)
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(ins["xs"]))
    params = _rebuild(template, flat)
    ys, h = m.apply(params, jnp.asarray(ins["xs"]))
    np.testing.assert_allclose(np.asarray(ys), outs["ys"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), outs["h"], atol=1e-5)


def test_prenet_fixture():
    from tacotron_tpu.ops import Prenet

    ins, outs, flat = _load("prenet")
    m = Prenet((32, 16), dropout=0.5, deterministic=True)
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(ins["x"]))
    params = _rebuild(template, flat)
    y = m.apply(params, jnp.asarray(ins["x"]))
    np.testing.assert_allclose(np.asarray(y), outs["y"], atol=1e-5)


def test_highway_fixture():
    from tacotron_tpu.ops import HighwayStack

    ins, outs, flat = _load("highway")
    m = HighwayStack(layers=4, dim=16)
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(ins["x"]))
    params = _rebuild(template, flat)
    y = m.apply(params, jnp.asarray(ins["x"]))
    np.testing.assert_allclose(np.asarray(y), outs["y"], atol=1e-5)


def test_attention_fixture():
    from tacotron_tpu.ops import BahdanauAttention

    ins, outs, flat = _load("attention")
    m = BahdanauAttention(dim=24)
    q, mem = jnp.asarray(ins["q"]), jnp.asarray(ins["mem"])
    template = m.init(jax.random.PRNGKey(0), q, mem, method=m.full_step)
    params = _rebuild(template, flat)
    ctx, align = m.apply(params, q, mem, method=m.full_step)
    np.testing.assert_allclose(np.asarray(ctx), outs["ctx"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(align), outs["align"], atol=1e-5)


def test_cbhg_encoder_fixture_fwd_bwd():
    """Driver config 2 (BASELINE.json:8): CBHG K=16 fwd/bwd parity.

    Geometry comes from the fixture (in__geom; width-64 self-golden today),
    so a full-width reference-derived golden drops into the same npz without
    code changes."""
    from tacotron_tpu.ops import CBHG

    ins, outs, flat = _load("cbhg_encoder")
    k, bc, p0, p1, hl, hd, gd = (ins["geom"].tolist() if "geom" in ins
                                 else [16, 128, 128, 128, 4, 128, 128])
    m = CBHG(k=k, bank_channels=bc, proj_dims=(p0, p1), highway_layers=hl,
             highway_dim=hd, gru_dim=gd, train=False)
    x = jnp.asarray(ins["x"])
    template = m.init(jax.random.PRNGKey(0), x)
    variables = _rebuild(template, flat)
    y = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), outs["y"], atol=2e-5)

    def loss(params, x):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]}, x)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

    g_x = jax.grad(loss, argnums=1)(variables["params"], x)
    np.testing.assert_allclose(np.asarray(g_x), outs["grad_x"],
                               rtol=1e-4, atol=1e-5)
    g_p = jax.grad(loss, argnums=0)(variables["params"], x)
    gnorm = float(jnp.sqrt(sum(jnp.sum(l * l)
                               for l in jax.tree_util.tree_leaves(g_p))))
    np.testing.assert_allclose(gnorm, float(outs["param_grad_norm"]), rtol=1e-4)


def test_tacotron_teacher_forced_fixture():
    import dataclasses

    from tacotron_tpu.config import get_config
    from tacotron_tpu.models import Tacotron

    ins, outs, flat = _load("tacotron_teacher_forced")
    cfg = dataclasses.replace(get_config("tiny_cpu").model, vocab_size=32,
                              prenet_dropout=0.0)
    m = Tacotron(cfg, train=False)
    text = jnp.asarray(ins["text"])
    lengths = jnp.asarray(ins["lengths"])
    mel_in = jnp.asarray(ins["mel_in"])
    template = m.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      text, lengths, gt_mel=mel_in)
    variables = _rebuild(template, flat)
    out = m.apply(variables, text, lengths, gt_mel=mel_in,
                  rngs={"dropout": jax.random.PRNGKey(25)})
    np.testing.assert_allclose(np.asarray(out.mel), outs["mel"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.linear), outs["linear"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alignments), outs["alignments"],
                               atol=1e-5)
