"""Fused Pallas decode loop vs the flax Decoder scan (interpret mode, CPU).

SURVEY.md §4.3: every Pallas kernel gets an interpret=True CPU test against
its XLA reference. Dropout is disabled for exact comparison (the kernel uses
the on-chip PRNG; the flax path uses jax.random — different streams).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.models import Tacotron
from tacotron_tpu.ops.pallas.decode_loop import decode_loop, pack_decoder_weights

import dataclasses

# Full architecture dims but tiny vocab; dropout off via rate replacement
CFG = dataclasses.replace(
    get_config("full_1chip").model, vocab_size=32, prenet_dropout=0.0
)


@pytest.fixture(scope="module")
def setup():
    b, t_in = 4, 16
    model = Tacotron(CFG, train=False)
    text = jax.random.randint(jax.random.PRNGKey(0), (b, t_in), 1, 30)
    lengths = jnp.array([16, 12, 9, 16])
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        text, lengths, gt_mel=jnp.zeros((b, 2 * CFG.r, CFG.n_mels)),
    )
    return model, variables, text, lengths


def _reference_decode(model, variables, text, lengths, n_steps):
    out = model.apply(
        variables, text, lengths, n_steps=n_steps,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    return out


def _encoder_outputs(model, variables, text, lengths):
    """memory, keys, mask exactly as the top module computes them."""
    from tacotron_tpu.models.encoder import Encoder
    import flax.linen as nn

    enc = Encoder(CFG, train=False)
    memory = enc.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        text, lengths,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )
    keys = memory @ variables["params"]["memory_proj"]["kernel"]
    mask = jnp.arange(text.shape[1])[None, :] < lengths[:, None]
    return memory, keys, mask


def test_fused_decode_matches_flax_scan(setup):
    model, variables, text, lengths = setup
    n_steps = 7
    ref = _reference_decode(model, variables, text, lengths, n_steps)

    memory, keys, mask = _encoder_outputs(model, variables, text, lengths)
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])
    frames, aligns = decode_loop(
        memory, keys, mask, w, n_steps=n_steps, dropout=False, interpret=True,
        lowp=False,
    )
    mel = frames.reshape(frames.shape[0], n_steps * CFG.r, CFG.n_mels)

    assert mel.shape == ref.mel.shape
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref.mel),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(aligns), np.asarray(ref.alignments),
                               rtol=1e-3, atol=2e-4)

    # bf16 fast path: looser tolerance, no alignments output
    frames16, none_aligns = decode_loop(
        memory, keys, mask, w, n_steps=n_steps, dropout=False, interpret=True,
        lowp=True, collect_alignments=False,
    )
    assert none_aligns is None
    mel16 = frames16.reshape(frames16.shape[0], n_steps * CFG.r, CFG.n_mels)
    np.testing.assert_allclose(np.asarray(mel16), np.asarray(ref.mel),
                               rtol=0.1, atol=0.05)


def test_fused_decode_respects_mask(setup):
    model, variables, text, lengths = setup
    memory, keys, mask = _encoder_outputs(model, variables, text, lengths)
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])
    _, aligns = decode_loop(memory, keys, mask, w, n_steps=3, dropout=False,
                            interpret=True, lowp=False)
    a = np.asarray(aligns)
    # masked encoder positions must carry ~zero attention weight
    assert a[1, :, 12:].max() < 1e-6
    assert a[2, :, 9:].max() < 1e-6
    np.testing.assert_allclose(a.sum(-1), np.ones(a.shape[:2]), atol=1e-4)


def test_dropout_rate_zero_is_true_noop(setup):
    """dropout=True with rate 0 must emit NO PRNG masking at all — it compiles
    without the TPU PRNG (so it even runs in interpret mode) and matches the
    dropout=False path bit-for-bit."""
    model, variables, text, lengths = setup
    memory, keys, mask = _encoder_outputs(model, variables, text, lengths)
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])
    f_off, _ = decode_loop(memory, keys, mask, w, n_steps=3, dropout=False,
                           interpret=True)
    f_r0, _ = decode_loop(memory, keys, mask, w, n_steps=3, seed=7,
                          dropout=True, dropout_rate=0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_off), np.asarray(f_r0))


@pytest.mark.skip(reason="pltpu.prng_seed has no CPU interpret lowering; "
                         "covered by the TPU smoke script (scripts/tpu_smoke.py)")
def test_dropout_changes_output_with_seed(setup):
    model, variables, text, lengths = setup
    memory, keys, mask = _encoder_outputs(model, variables, text, lengths)
    # dropout needs a nonzero rate: repack under a model with dropout
    w = pack_decoder_weights(variables["params"]["decoder"]["cell"])
    f1, _ = decode_loop(memory, keys, mask, w, n_steps=3, seed=1, dropout=True,
                        interpret=True)
    f2, _ = decode_loop(memory, keys, mask, w, n_steps=3, seed=2, dropout=True,
                        interpret=True)
    f1b, _ = decode_loop(memory, keys, mask, w, n_steps=3, seed=1, dropout=True,
                         interpret=True)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f1b))
