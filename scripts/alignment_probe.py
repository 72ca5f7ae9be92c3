"""Alignment-health probe (SURVEY.md §4.1): overfit a char-tone toy corpus
and watch attention entropy — the scalar version of the reference's
attention-diagonal TensorBoard check. Diagnostic, not a CI gate: alignment
emerges over thousands of steps even on toy data (the decoder can memorise a
tiny corpus without needing attention first).

Run: python scripts/alignment_probe.py
"""

import os, sys, dataclasses
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
sys.path.insert(0,"/root/repo")
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp, numpy as np
from tacotron_tpu.config import get_config, AudioConfig
from tacotron_tpu.data import ljspeech
from tacotron_tpu.data.loader import DataLoader, Dataset
from tacotron_tpu.train.step import create_train_state, make_train_step
ACFG = AudioConfig(n_fft=512, win_length=400, hop_length=128, n_mels=80)
os.makedirs("/tmp/ct", exist_ok=True)
ljspeech.generate_char_tone_corpus("/tmp/ct/corpus", n=4, text_len=10)
ljspeech.preprocess("/tmp/ct/corpus", "/tmp/ct/data", ACFG, chunk=4)
ds = Dataset("/tmp/ct/data")
c = get_config("tiny_cpu")
c = dataclasses.replace(c, audio=ACFG, model=dataclasses.replace(c.model, vocab_size=max(32,len(ds.vocab)), n_freq=ACFG.n_freq))
dl = DataLoader(ds, batch_size=4, num_buckets=1, r=c.model.r, seed=5)
b = next(iter(dl))
arrays = (jnp.asarray(b.text), jnp.asarray(b.text_len), jnp.asarray(b.mel), jnp.asarray(b.linear), jnp.asarray(b.frame_len))
state = create_train_state(c, jax.random.PRNGKey(3))
step = make_train_step(c)
def ent(a):
    a = np.clip(np.asarray(a), 1e-8, 1.0); return float(-(a*np.log(a)).sum(-1).mean())
for i in range(1, 1201):
    state, m, al = step(state, *arrays)
    if i % 100 == 0:
        print(i, f"loss {float(m['total_loss']):.4f} entropy {ent(al):.3f}", flush=True)
