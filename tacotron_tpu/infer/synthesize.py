"""Synthesis: text -> autoregressive decode -> Griffin-Lim -> waveform.

Rebuild of the reference's ``synthesize.py`` (SURVEY.md §2.1 #15, §3.3 [R]).
The reference restored a feed-previous TF1 graph, decoded to a fixed step
count, then ran ~1000 Griffin-Lim iterations per utterance on the host CPU —
the dominant cost. Here the whole path (encode, scan decode, batched GL over
the jnp iSTFT/STFT) is jitted on device; utterances are batched and the wav
is the only host transfer.

Throughput is graded as audio-seconds synthesized per second (BASELINE.json:2),
so the API is batch-first.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tacotron_tpu.config import Config
from tacotron_tpu.data.vocab import Vocab
from tacotron_tpu.dsp import inv_spectrogram
from tacotron_tpu.infer.early_exit import decode_while, end_frames_device
from tacotron_tpu.models import Tacotron


class Synthesizer:
    """``fused=True`` decodes through the Pallas fused decode-loop kernel
    (ops/pallas/decode_loop; VMEM-resident state/weights) instead of the XLA
    scan; both paths share the same params and produce equivalent output.

    ``cfg.infer`` (InferConfig) controls the no-stop-token mitigations
    (SURVEY.md §7.3 item 1, all off by default for reference parity):
    ``early_exit`` decodes under a silence-heuristic ``lax.while_loop``;
    ``trim_before_gl`` slices the linear spectrogram to the batch's max
    detected end frame (quantized) before Griffin-Lim, which skips GL — the
    dominant cost — on pure padding. Either flag splits synthesis into a
    model jit and a GL jit (one extra dispatch, negligible vs GL itself).
    Per-utterance trimming metadata is ALWAYS returned (end_frames,
    wav_lengths, trimmed audio seconds) regardless of flags."""

    def __init__(self, cfg: Config, params, batch_stats, vocab: Vocab,
                 fused: bool = False, mesh=None):
        self.cfg = cfg
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.vocab = vocab
        self.model = Tacotron(cfg.model, train=False)
        self.fused = fused
        self.mesh = mesh
        icfg = cfg.infer
        if fused and (icfg.early_exit or icfg.trim_before_gl):
            # refusing beats silently decoding the full fixed length (the
            # compute saving the flags promise would never happen)
            raise ValueError("fused decode cannot combine with "
                             "early_exit/trim_before_gl (host-driven paths); "
                             "turn one off")
        self.split_gl = icfg.early_exit or icfg.trim_before_gl

        if mesh is not None:
            # Multi-chip DP synthesis (BASELINE "inference 1 chip / 1 host /
            # N hosts" row): the utterance batch shards over the mesh's
            # ``data`` axis. The model pass partitions via GSPMD (inputs
            # arrive sharded, params replicate); Griffin-Lim is shard_mapped
            # explicitly because pallas_call does not auto-partition under
            # GSPMD — inside shard_map each chip runs the kernel on its local
            # shard, which is exactly the batched-GL design.
            if fused:
                raise ValueError("mesh synthesis uses the scan decode "
                                 "(GSPMD); drop fused=True")
            if icfg.early_exit or icfg.trim_before_gl:
                raise ValueError("mesh synthesis: early-exit/trim are "
                                 "host-driven; turn them off for DP")
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_ax = mesh.axis_names[0]
            self._data_ax = data_ax
            self._batch2d = NamedSharding(mesh, P(data_ax, None))
            self._batch1d = NamedSharding(mesh, P(data_ax))
            self.split_gl = True

            from jax import shard_map

            @functools.partial(jax.jit, static_argnames=("gl_iters",))
            def _gl(linear, gl_iters):
                # check_vma=False: pallas_call does not declare varying-mesh
                # annotations, so the default vma check rejects the (correct)
                # per-shard kernel (tests/distributed/test_mesh_synthesis.py)
                f = shard_map(
                    lambda lin: inv_spectrogram(lin, cfg.audio,
                                                n_iter=gl_iters),
                    mesh=mesh, in_specs=P(data_ax, None, None),
                    out_specs=P(data_ax, None), check_vma=False)
                return f(linear)

            self._model_fn, self._gl_fn = self._plain_model_fn(), _gl
            self._synth = None
            return

        if self.split_gl:
            if icfg.early_exit:
                # while_loop stop unit is a decoder step = r frames
                min_steps = max(1, -(-icfg.min_silence_frames // cfg.model.r))

                @functools.partial(jax.jit, static_argnames=("n_steps",))
                def _model(variables, text, text_len, rng, n_steps):
                    v, bs = variables["params"], variables["batch_stats"]
                    memory, keys, mask, w = self._encode_and_pack(
                        v, bs, text, text_len, rng)
                    mel, aligns, _ = decode_while(
                        memory, keys, mask, w, rng, n_steps=n_steps,
                        r=cfg.model.r, n_mels=cfg.model.n_mels,
                        dropout_rate=cfg.model.prenet_dropout,
                        silence_threshold=icfg.silence_threshold,
                        min_silence_steps=min_steps,
                    )
                    linear = self._postnet_apply(v, bs, mel)
                    return mel, linear, aligns
            else:
                _model = self._plain_model_fn()

            @functools.partial(jax.jit, static_argnames=("gl_iters",))
            def _gl(linear, gl_iters):
                return inv_spectrogram(linear, cfg.audio, n_iter=gl_iters)

            self._model_fn, self._gl_fn = _model, _gl
            self._synth = None
            return

        if not fused:
            @functools.partial(jax.jit, static_argnames=("n_steps", "gl_iters"))
            def _synth(variables, text, text_len, rng, n_steps, gl_iters):
                out = self.model.apply(
                    variables, text, text_len, n_steps=n_steps,
                    rngs={"dropout": rng},
                )
                wav = inv_spectrogram(out.linear, cfg.audio, n_iter=gl_iters)
                return out.mel, out.linear, out.alignments, wav
        else:
            from tacotron_tpu.ops.pallas.decode_loop import decode_loop

            # CPU: run the kernel interpreted; its PRNG has no CPU lowering,
            # so prenet dropout is disabled there (TPU keeps paper behavior).
            interpret = jax.default_backend() == "cpu"
            use_dropout = cfg.model.prenet_dropout > 0 and not interpret

            @functools.partial(jax.jit, static_argnames=("n_steps", "gl_iters"))
            def _synth(variables, text, text_len, rng, n_steps, gl_iters):
                v, bs = variables["params"], variables["batch_stats"]
                memory, keys, mask, w = self._encode_and_pack(
                    v, bs, text, text_len, rng)
                seed = jax.random.randint(rng, (), 0, 2**31 - 1)
                frames, aligns = decode_loop(
                    memory, keys, mask, w, n_steps=n_steps, seed=seed,
                    dropout=use_dropout,
                    dropout_rate=cfg.model.prenet_dropout,
                    interpret=interpret,
                )
                mel = frames.reshape(text.shape[0], n_steps * cfg.model.r,
                                     cfg.model.n_mels)
                linear = self._postnet_apply(v, bs, mel)
                wav = inv_spectrogram(linear, cfg.audio, n_iter=gl_iters)
                return mel, linear, aligns, wav

        self._synth = _synth

    def _plain_model_fn(self):
        """Jitted full-scan model pass (mel, linear, alignments) — shared by
        the split_gl and mesh paths (GSPMD partitions it when inputs arrive
        sharded)."""
        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def _model(variables, text, text_len, rng, n_steps):
            out = self.model.apply(variables, text, text_len, n_steps=n_steps,
                                   rngs={"dropout": rng})
            return out.mel, out.linear, out.alignments
        return _model

    def _postnet_apply(self, v, bs, mel):
        from tacotron_tpu.models.postnet import PostNet
        if not hasattr(self, "_postnet"):
            self._postnet = PostNet(self.cfg.model, train=False)
        return self._postnet.apply(
            {"params": v["postnet"], "batch_stats": bs["postnet"]}, mel)

    def _encode_and_pack(self, v, bs, text, text_len, rng):
        """Encoder pass + attention keys + packed decoder weights + mask —
        the shared preamble of the fused and early-exit decode paths. The
        keys matmul mirrors the model path's Dense(dtype=cfg.cdtype)
        semantics so bf16 configs compute identical keys on every path."""
        from tacotron_tpu.models.encoder import Encoder
        from tacotron_tpu.ops.pallas.decode_loop import pack_decoder_weights

        if not hasattr(self, "_encoder"):
            self._encoder = Encoder(self.cfg.model, train=False)
        memory = self._encoder.apply(
            {"params": v["encoder"], "batch_stats": bs["encoder"]},
            text, text_len, rngs={"dropout": rng},
        )
        cd = self.cfg.model.cdtype
        kern = v["memory_proj"]["kernel"]
        keys = (memory.astype(cd) @ kern.astype(cd) if cd is not None
                else memory @ kern)
        mask = jnp.arange(text.shape[1])[None, :] < text_len[:, None]
        return memory, keys, mask, pack_decoder_weights(v["decoder"]["cell"])

    def encode_texts(self, texts: list[str], pad_to: int | None = None):
        if not texts:
            raise ValueError("no prompts: texts is empty")
        ids = [self.vocab.encode(t) for t in texts]
        max_len = max(len(i) for i in ids)
        if pad_to is not None:
            max_len = max(max_len, pad_to)
        text = np.zeros((len(ids), max_len), np.int32)
        lengths = np.zeros((len(ids),), np.int32)
        for j, a in enumerate(ids):
            text[j, : len(a)] = a
            lengths[j] = len(a)
        return jnp.asarray(text), jnp.asarray(lengths)

    def __call__(self, texts: list[str], n_steps: int | None = None,
                 gl_iters: int | None = None, seed: int = 0,
                 peak_normalize: bool = True):
        """Synthesize a batch. Returns dict with mel, linear, alignments, wavs
        (B, T_samples) plus per-utterance trimming metadata: end_frames (first
        detected-silence frame), wav_lengths (samples), audio_seconds (padded
        total — the parity metric) and trimmed_audio_seconds (real audio).
        """
        cfg = self.cfg
        icfg = cfg.infer
        # `is None`, not `or`: 0 is a legitimate request (gl_iters=0 = raw
        # zero-phase iSTFT) and must not fall back to the config default
        n_steps = cfg.model.max_decode_steps if n_steps is None else n_steps
        gl_iters = (cfg.audio.griffin_lim_iters if gl_iters is None
                    else gl_iters)
        text, lengths = self.encode_texts(texts)
        rng = jax.random.PRNGKey(seed)

        n_real = text.shape[0]
        if self.mesh is not None:
            # pad the batch to a multiple of the data axis and shard it; pad
            # rows use length 1 (a real mask — all-padding rows are sliced
            # off before returning)
            nd = self.mesh.shape[self._data_ax]
            pad = -n_real % nd
            if pad:
                text = jnp.concatenate(
                    [text, jnp.zeros((pad, text.shape[1]), text.dtype)])
                lengths = jnp.concatenate(
                    [lengths, jnp.ones((pad,), lengths.dtype)])
            if jax.process_count() > 1:
                # every host holds the same full prompt list; each contributes
                # its process-order slice of the global batch (the same
                # contract as parallel.mesh.shard_batch)
                ph = text.shape[0] // jax.process_count()
                lo = jax.process_index() * ph
                text = jax.make_array_from_process_local_data(
                    self._batch2d, np.asarray(text[lo:lo + ph]))
                lengths = jax.make_array_from_process_local_data(
                    self._batch1d, np.asarray(lengths[lo:lo + ph]))
            else:
                text = jax.device_put(text, self._batch2d)
                lengths = jax.device_put(lengths, self._batch1d)

        def to_host(x):
            # multi-host: batch-sharded outputs are not fully addressable on
            # any single process — allgather so every host returns the full
            # batch (mirrors checkpoint.save's shard gather)
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                from jax.experimental import multihost_utils
                return multihost_utils.process_allgather(x, tiled=True)
            return x

        if self.split_gl:
            mel, linear, align = self._model_fn(
                self.variables, text, lengths, rng, n_steps)
            # trimming metadata on DEVICE: only the (B,) ends vector crosses
            # the link before GL — pulling the whole (B, T, n_mels) mel here
            # stalled the pipeline between the model pass and GL on the
            # host-link rate (VERDICT r3 weak #7)
            ends = np.asarray(to_host(end_frames_device(
                mel, threshold=icfg.silence_threshold,
                min_run=icfg.min_silence_frames)))
            if icfg.trim_before_gl:
                q = icfg.gl_length_quantum
                t_gl = min(int(-(-max(int(ends.max()), q) // q) * q),
                           linear.shape[1])
                wav = self._gl_fn(linear[:, :t_gl], gl_iters)
            else:
                wav = self._gl_fn(linear, gl_iters)
            mel, align = to_host(mel), to_host(align)
            linear, wav = to_host(linear), to_host(wav)
        else:
            mel, linear, align, wav = self._synth(
                self.variables, text, lengths, rng, n_steps, gl_iters)
            ends = np.asarray(end_frames_device(
                mel, threshold=icfg.silence_threshold,
                min_run=icfg.min_silence_frames))

        if self.mesh is not None and wav.shape[0] != n_real:
            mel, linear, align, wav, ends = (
                x[:n_real] for x in (mel, linear, align, wav, ends))
        wav = np.asarray(wav)
        if peak_normalize:
            peak = np.abs(wav).max(axis=-1, keepdims=True)
            wav = wav / np.maximum(peak, 1e-3)
        wav_lengths = np.minimum(ends * cfg.audio.hop_length, wav.shape[1])
        return {
            "mel": np.asarray(mel),
            "linear": np.asarray(linear),
            "alignments": np.asarray(align),
            "wavs": wav,
            "end_frames": ends,
            "wav_lengths": wav_lengths,
            "audio_seconds": wav.shape[0] * wav.shape[1] / cfg.audio.sample_rate,
            "trimmed_audio_seconds": float(wav_lengths.sum()) / cfg.audio.sample_rate,
        }
