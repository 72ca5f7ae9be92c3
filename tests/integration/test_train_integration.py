"""Integration: driver config 1 — tiny Tacotron teacher-forced training on 8
synthetic utterances, CPU; loss must decrease (BASELINE.json:7, SURVEY.md §4.2).

Also: fault-injection resume (SURVEY.md §5.3) — training state checkpointed at
step N restores bit-identically and continues deterministically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron_tpu.config import get_config
from tacotron_tpu.data import ljspeech
from tacotron_tpu.data.loader import DataLoader, Dataset
from tacotron_tpu.parallel import make_mesh, shard_batch
from tacotron_tpu.train import checkpoint
from tacotron_tpu.train.step import TrainState, create_train_state, make_train_step
from tacotron_tpu.config import AudioConfig

ACFG = AudioConfig(n_fft=512, win_length=400, hop_length=128, n_mels=80)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("corpus")
    data = tmp_path_factory.mktemp("data")
    ljspeech.generate_synthetic_corpus(str(corpus), n=8, min_sec=0.3, max_sec=0.6)
    ljspeech.preprocess(str(corpus), str(data), ACFG, chunk=8)
    return str(data)


@pytest.fixture(scope="module")
def cfg(data_dir):
    c = get_config("tiny_cpu")
    ds = Dataset(data_dir)
    import dataclasses
    return dataclasses.replace(
        c,
        audio=ACFG,
        model=dataclasses.replace(
            c.model, vocab_size=max(32, len(ds.vocab)), n_freq=ACFG.n_freq
        ),
    )


def test_config1_loss_decreases(cfg, data_dir):
    ds = Dataset(data_dir)
    dl = DataLoader(ds, batch_size=cfg.train.batch_size, num_buckets=1, r=cfg.model.r)
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    step_fn = make_train_step(cfg)

    losses = []
    it = iter(dl)
    for i in range(50):
        b = next(it)
        state, metrics, _ = step_fn(
            state, jnp.asarray(b.text), jnp.asarray(b.text_len),
            jnp.asarray(b.mel), jnp.asarray(b.linear), jnp.asarray(b.frame_len),
        )
        losses.append(float(metrics["total_loss"]))

    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.all(np.isfinite(losses))
    assert last < first * 0.8, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_alignments_are_distributions(cfg, data_dir):
    ds = Dataset(data_dir)
    dl = DataLoader(ds, batch_size=4, num_buckets=1, r=cfg.model.r)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg)
    b = next(iter(dl))
    _, _, alignments = step_fn(
        state, jnp.asarray(b.text), jnp.asarray(b.text_len),
        jnp.asarray(b.mel), jnp.asarray(b.linear), jnp.asarray(b.frame_len),
    )
    a = np.asarray(alignments)
    assert a.ndim == 3  # (B, steps, T_in)
    np.testing.assert_allclose(a.sum(-1), np.ones(a.shape[:2]), atol=1e-4)


def test_checkpoint_resume_bit_identical(cfg, data_dir, tmp_path):
    """Kill-at-step-N fault injection: resumed run equals uninterrupted run."""
    ds = Dataset(data_dir)

    def fresh_batches(n):
        dl = DataLoader(ds, batch_size=4, num_buckets=1, r=cfg.model.r, seed=123)
        it = iter(dl)
        return [next(it) for _ in range(n)]

    batches = fresh_batches(6)
    step_fn = make_train_step(cfg)

    def run(state, bs):
        for b in bs:
            state, _, _ = step_fn(
                state, jnp.asarray(b.text), jnp.asarray(b.text_len),
                jnp.asarray(b.mel), jnp.asarray(b.linear), jnp.asarray(b.frame_len),
            )
        return state

    # Uninterrupted run: 6 steps
    s_full = run(create_train_state(cfg, jax.random.PRNGKey(1)), batches)

    # Interrupted: 3 steps, checkpoint, "crash", restore, 3 more
    s_half = run(create_train_state(cfg, jax.random.PRNGKey(1)), batches[:3])
    ckpt_dir = str(tmp_path / "ckpt")
    checkpoint.save(ckpt_dir, int(s_half.step), s_half)
    del s_half
    template = create_train_state(cfg, jax.random.PRNGKey(99))  # different rng: must be overwritten
    restored, step = checkpoint.restore(ckpt_dir, template)
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    assert step == 3
    s_resumed = run(TrainState(*restored), batches[3:])

    for pf, pr in zip(jax.tree_util.tree_leaves(s_full.params),
                      jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(pr))


def test_train_step_on_8_device_mesh(cfg, data_dir):
    """The identical step under a data-parallel mesh (SURVEY.md §4.3)."""
    ds = Dataset(data_dir)
    dl = DataLoader(ds, batch_size=8, num_buckets=1, r=cfg.model.r)
    mesh = make_mesh(cfg.mesh)
    assert mesh.devices.size == 8
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, mesh)

    b = next(iter(dl))
    batch_arrays = (jnp.asarray(b.text), jnp.asarray(b.text_len),
                    jnp.asarray(b.mel), jnp.asarray(b.linear),
                    jnp.asarray(b.frame_len))
    with mesh:
        state, metrics, _ = step_fn(state, *batch_arrays)
        state, metrics, _ = step_fn(state, *batch_arrays)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 2


def test_overfit_one_batch_alignment_concentrates(cfg, tmp_path):
    """SURVEY.md §4.3: overfit-one-batch sanity on a corpus where audio IS
    the text (per-character tones), so a ground-truth monotonic alignment
    exists. Gates on overfit + attention health; entropy *descent* is tracked
    by scripts/alignment_probe.py (alignment emerges over ~1e3+ steps)."""
    import dataclasses

    corpus = str(tmp_path / "corpus")
    data = str(tmp_path / "data")
    ljspeech.generate_char_tone_corpus(corpus, n=4, text_len=10)
    ljspeech.preprocess(corpus, data, ACFG, chunk=4)
    ds = Dataset(data)
    c = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       vocab_size=max(32, len(ds.vocab))))
    dl = DataLoader(ds, batch_size=4, num_buckets=1, r=c.model.r, seed=5)
    b = next(iter(dl))
    arrays = (jnp.asarray(b.text), jnp.asarray(b.text_len),
              jnp.asarray(b.mel), jnp.asarray(b.linear),
              jnp.asarray(b.frame_len))
    state = create_train_state(c, jax.random.PRNGKey(3))
    step_fn = make_train_step(c)

    def mean_entropy(alignments):
        a = np.clip(np.asarray(alignments), 1e-8, 1.0)
        return float(-(a * np.log(a)).sum(-1).mean())

    state, m0, align0 = step_fn(state, *arrays)  # state is donated: keep it
    e0 = mean_entropy(align0)
    l0 = float(m0["total_loss"])
    for _ in range(150):
        state, metrics, aligns = step_fn(state, *arrays)
    e1 = mean_entropy(aligns)
    l1 = float(metrics["total_loss"])
    # Overfitting must work and attention must stay healthy (not diverge to
    # higher entropy). Full alignment emergence takes thousands of steps even
    # on toy data — tracked by scripts/alignment_probe.py, not gated here.
    assert np.isfinite(l1)
    assert l1 < l0 * 0.5, f"failed to overfit one batch: {l0:.4f} -> {l1:.4f}"
    assert e1 <= e0 + 0.05, f"attention entropy increased: {e0:.3f} -> {e1:.3f}"
