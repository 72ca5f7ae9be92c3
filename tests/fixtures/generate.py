"""(Re)generate parity fixtures (SURVEY.md §4.3).

Self-golden protocol: fixtures freeze each module's outputs (and grads where
graded) under FIXED rng keys and shapes. The harness in
tests/unit/test_parity_fixtures.py loads fixtures BY NAME, so reference-
derived goldens (from fixed TF1 checkpoints, via utils/tf1_converter) can be
dropped into this directory later without code changes — just overwrite the
npz with the same keys.

Covers driver config 2 (BASELINE.json:8): full CBHG encoder (K=16, highway
x4, biGRU 128) forward/backward.

Run: python tests/fixtures/generate.py   (CPU-forced; writes *.npz here)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

FIXDIR = os.path.dirname(os.path.abspath(__file__))


def _flat_params(params):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(k.key) for k in path)
        out["param__" + key] = np.asarray(leaf)
    return out


def _unflatten_into(template, arrays):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = "param__" + "/".join(str(k.key) for k in path)
        leaves.append(jnp.asarray(arrays[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_fixture(name, inputs: dict, params, outputs: dict,
                 param_dtype=None):
    """param_dtype=np.float16 halves storage; the GENERATOR must then have
    rounded the live params through f16 before computing outputs, so the
    stored params reproduce the stored outputs exactly (the harness casts
    f16 params back to f32 on load)."""
    data = {}
    for k, v in inputs.items():
        data["in__" + k] = np.asarray(v)
    for k, v in outputs.items():
        data["out__" + k] = np.asarray(v)
    flat = _flat_params(params)
    if param_dtype is not None:
        flat = {k: v.astype(param_dtype) if np.issubdtype(v.dtype, np.floating)
                else v for k, v in flat.items()}
    data.update(flat)
    np.savez(os.path.join(FIXDIR, f"{name}.npz"), **data)
    print(f"wrote {name}.npz ({len(data)} arrays)")


def gen_gru():
    from tacotron_tpu.ops import unidirectional_gru

    m = unidirectional_gru(16)
    xs = jax.random.normal(jax.random.PRNGKey(10), (2, 9, 8))
    params = m.init(jax.random.PRNGKey(11), xs)
    ys, h = m.apply(params, xs)
    save_fixture("gru", {"xs": xs}, params, {"ys": ys, "h": h})


def gen_prenet():
    from tacotron_tpu.ops import Prenet

    m = Prenet((32, 16), dropout=0.5, deterministic=True)
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 24))
    params = m.init(jax.random.PRNGKey(13), x)
    save_fixture("prenet", {"x": x}, params, {"y": m.apply(params, x)})


def gen_highway():
    from tacotron_tpu.ops import HighwayStack

    m = HighwayStack(layers=4, dim=16)
    x = jax.random.normal(jax.random.PRNGKey(14), (3, 7, 16))
    params = m.init(jax.random.PRNGKey(15), x)
    save_fixture("highway", {"x": x}, params, {"y": m.apply(params, x)})


def gen_attention():
    from tacotron_tpu.ops import BahdanauAttention

    m = BahdanauAttention(dim=24)
    mem = jax.random.normal(jax.random.PRNGKey(16), (2, 11, 20))
    q = jax.random.normal(jax.random.PRNGKey(17), (2, 12))
    params = m.init(jax.random.PRNGKey(18), q, mem, method=m.full_step)
    ctx, align = m.apply(params, q, mem, method=m.full_step)
    save_fixture("attention", {"q": q, "mem": mem}, params,
                 {"ctx": ctx, "align": align})


def gen_cbhg_encoder():
    """Driver config 2 structure: CBHG K=16, highway x4, biGRU — fwd AND bwd
    (input grad + total param-grad-norm frozen).

    Width 64 instead of the preset's 128 and f16-rounded params: identical
    structural coverage (all 16 bank widths, maxpool, projections, residual,
    highway, biGRU) at ~1/16 the bytes — the 13.8 MB full-width fixture was
    repo bloat (VERDICT r2 next #8). Params are rounded THROUGH f16 before
    computing outputs, so the f16-stored params reproduce the stored outputs
    bit-for-bit after the harness casts them back to f32. The geometry rides
    in the npz (in__geom), so full-width reference-derived goldens can still
    drop into this file without code changes."""
    from tacotron_tpu.ops import CBHG

    d = 64
    m = CBHG(k=16, bank_channels=d, proj_dims=(d, d), highway_layers=4,
             highway_dim=d, gru_dim=d, train=False)
    x = jax.random.normal(jax.random.PRNGKey(19), (2, 33, d))
    variables = m.init(jax.random.PRNGKey(20), x)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float16), jnp.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, variables)
    y = m.apply(variables, x)

    def loss(params, x):
        out = m.apply({"params": params,
                       "batch_stats": variables["batch_stats"]}, x)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

    g_x = jax.grad(loss, argnums=1)(variables["params"], x)
    g_p = jax.grad(loss, argnums=0)(variables["params"], x)
    gnorm = jnp.sqrt(sum(jnp.sum(l * l) for l in jax.tree_util.tree_leaves(g_p)))
    geom = np.array([16, d, d, d, 4, d, d], np.int32)  # k, bank, proj0/1,
    save_fixture("cbhg_encoder",                       # hwy layers/dim, gru
                 {"x": x, "geom": geom}, variables,
                 {"y": y, "grad_x": g_x, "param_grad_norm": gnorm},
                 param_dtype=np.float16)


def gen_tacotron_tf():
    """Tiny full-model teacher-forced fwd (deterministic: dropout 0)."""
    import dataclasses

    from tacotron_tpu.config import get_config
    from tacotron_tpu.models import Tacotron

    cfg = dataclasses.replace(get_config("tiny_cpu").model, vocab_size=32,
                              prenet_dropout=0.0)
    m = Tacotron(cfg, train=False)
    text = jax.random.randint(jax.random.PRNGKey(21), (2, 12), 1, 30)
    lengths = jnp.array([12, 8])
    mel = jax.random.uniform(jax.random.PRNGKey(22), (2, 10, cfg.n_mels))
    variables = m.init({"params": jax.random.PRNGKey(23),
                        "dropout": jax.random.PRNGKey(24)},
                       text, lengths, gt_mel=mel)
    # f16-rounded params (see gen_cbhg_encoder): half the npz bytes, outputs
    # computed from the rounded params so storage is recompute-exact
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float16), jnp.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, variables)
    out = m.apply(variables, text, lengths, gt_mel=mel,
                  rngs={"dropout": jax.random.PRNGKey(25)})
    save_fixture("tacotron_teacher_forced",
                 {"text": text, "lengths": lengths, "mel_in": mel}, variables,
                 {"mel": out.mel, "linear": out.linear,
                  "alignments": out.alignments},
                 param_dtype=np.float16)


if __name__ == "__main__":
    gen_gru()
    gen_prenet()
    gen_highway()
    gen_attention()
    gen_cbhg_encoder()
    gen_tacotron_tf()
