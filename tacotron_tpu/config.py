"""Frozen configuration dataclasses and named presets.

The reference (barronalex/Tacotron) spreads hyperparameters across module-level
constants in ``audio.py`` and the model files (SURVEY.md §5.6 [R]); the rebuild
centralises everything in one frozen dataclass tree that is serialised into every
checkpoint and run dir. Presets mirror the five driver configs (BASELINE.json:6-12).

All values trace to the Tacotron paper (arXiv 1703.10135, Table 1 / §3) unless
noted; LJSpeech audio parameters follow the common 22.05 kHz convention.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class AudioConfig:
    """DSP parameters (reference: audio.py module constants [R])."""

    sample_rate: int = 22050          # LJSpeech native rate
    n_fft: int = 2048                 # paper Table 1: 2048-point Fourier transform
    # 50 ms frame / 12.5 ms hop (paper Table 1), rounded to samples at 22.05 kHz
    win_length: int = 1102
    hop_length: int = 275
    n_mels: int = 80                  # paper Table 1: 80-band mel
    fmin: float = 0.0
    fmax: float | None = None         # None -> sr / 2
    preemphasis: float = 0.97         # paper Table 1
    ref_level_db: float = 20.0
    min_level_db: float = -100.0
    griffin_lim_iters: int = 1000     # reference runs ~1000 iterations (BASELINE.json:10)
    griffin_lim_power: float = 1.5    # magnitude raised to 1.5 before inversion (paper §3.3)
    # GL transform backend: "pallas" = fused VMEM-resident whole-loop kernel
    # (dsp/pallas_gl.py, fastest on TPU; falls back to "mm" on CPU),
    # "mm" = matmul-DFT on the MXU (bf16), "mm_f32" = matmul-DFT in f32,
    # "fft" = jnp.fft (XLA FFT; slow on TPU)
    gl_backend: str = "pallas"
    # Fast Griffin-Lim momentum (Perraudin 2013); 0.0 = vanilla GL (parity
    # mode, matches the reference's plain 1000-iter loop). ~0.99 reaches
    # vanilla@1000 quality in ~100 iterations.
    gl_momentum: float = 0.0
    # Pallas kernel: lane-trim the partially-windowed boundary chunks' matmuls
    # (exact; see dsp/pallas_gl.py chunk_spans). Off until measured on TPU.
    gl_trim_chunks: bool = False

    def __post_init__(self):
        if not (0 < self.hop_length <= self.win_length <= self.n_fft):
            raise ValueError(
                f"need 0 < hop_length <= win_length <= n_fft, got "
                f"hop={self.hop_length} win={self.win_length} "
                f"n_fft={self.n_fft} (override the trio together)")

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1    # 1025 linear bins


@dataclass(frozen=True)
class ModelConfig:
    """Tacotron architecture (paper Table 1; SURVEY.md §2.1 #4-#11)."""

    vocab_size: int = 256             # overwritten by dataset vocab at train time
    embed_dim: int = 256              # character embedding
    prenet_dims: tuple[int, ...] = (256, 128)
    prenet_dropout: float = 0.5       # active at train AND inference (paper §3.2)
    encoder_bank_k: int = 16          # conv bank widths 1..K
    encoder_bank_channels: int = 128
    encoder_proj_dims: tuple[int, int] = (128, 128)
    postnet_bank_k: int = 8
    postnet_bank_channels: int = 128
    postnet_proj_dims: tuple[int, int] = (256, 80)
    highway_layers: int = 4
    highway_dim: int = 128
    gru_dim: int = 128                # per-direction CBHG biGRU width
    attention_dim: int = 256          # Bahdanau attention depth
    attention_gru_dim: int = 256      # attention RNN
    decoder_gru_dim: int = 256        # each of the 2 residual decoder GRUs
    decoder_depth: int = 2            # residual decoder GRU layers
    n_mels: int = 80
    n_freq: int = 1025
    r: int = 2                        # reduction factor: frames per decoder step
    max_decode_steps: int = 500       # inference: fixed step count, no stop token (paper §3.2)
    bank_groups: int = 1              # packed conv-bank split into this many
                                      # contiguous width groups (1 = one fully
                                      # packed conv; more groups cut the
                                      # structural-zero taps at the cost of
                                      # extra convs). Measured on v5e
                                      # (scripts/bench_bank_groups.py, r3,
                                      # B32xT128): fwd g1 0.49 ms / 71 TFLOP/s
                                      # beats g2/g4/unpacked by 1.26-1.47x —
                                      # the one wide conv tiles the MXU better
                                      # than its 47% structural zeros cost;
                                      # fwd+bwd g4 wins by 1.10x (0.805 vs
                                      # 0.886 ms) but the bank is ~6% of a
                                      # train step so that is <0.6% end-to-end.
                                      # g1 stays the default: best inference,
                                      # one compiled conv, near-tied training.
    scan_unroll: int = 8              # lax.scan unroll factor for the hoisted
                                      # teacher-forced decoder scan: >1 trades
                                      # compile time + code size for fewer
                                      # loop-bookkeeping/fusion boundaries per
                                      # decoder step. MEASURED r4 (bench.py,
                                      # pod_dp recipe B256+remat hoisted bf16,
                                      # v5e, two cells each): unroll 8 =
                                      # 1.242/1.254M frames/s/chip vs 1 =
                                      # 1.170/1.218M (+4.5% on means; 2 and 4
                                      # = 1.180M, worse than either) — 8 is
                                      # the default; the serial GRU/attention
                                      # chain itself is irreducible
    gru_scan_unroll: int = 4          # lax.scan unroll for the CBHG biGRU
                                      # scans (encoder T_in steps, postnet
                                      # T_out steps). MEASURED r5 (bench.py
                                      # --metric train, pod_dp recipe
                                      # B256+remat hoisted bf16, v5e,
                                      # interleaved cells same day, 0.03%
                                      # same-arm spread): unroll 4 = 1.3267M
                                      # frames/s/chip (+3.5%) > 8 =
                                      # 1.2926/1.2928M (+0.83%) > 1 =
                                      # 1.2822/1.2818M > 16 (measured only in
                                      # the rejected-pooling tree: 1.1857M,
                                      # below that tree's unroll-1 1.2029M).
                                      # Unlike the decoder scan (where 8 won
                                      # and 4 lost), the 400-step biGRU scans
                                      # peak at unroll 4; ordering 4 > 1 re-
                                      # confirmed under that tree as
                                      # 1.2420/1.2413M vs 1.2029M (+3.2%).
                                      # BASELINE.md r5 bullet.
    remat_decoder: bool = False       # jax.checkpoint on the decoder scan body
                                      # (SURVEY.md §7.3 item 5: trades decoder
                                      # recompute for teacher-forced HBM)
    # Batch-norm moments are ALWAYS global-batch under jit+GSPMD (the sharded
    # batch mean is a global mean), i.e. cross-replica — SURVEY.md §7.3 item 4.
    param_dtype: str = "float32"
    # Computation dtype for matmuls/convs (params, state, BN stats, softmax,
    # loss stay f32). "bfloat16" feeds the MXU its native dtype — the standard
    # TPU mixed-precision recipe; "float32" is the reference-parity default.
    compute_dtype: str = "float32"
    # Teacher-forced decoder implementation. "scan" = the scanned DecoderCell
    # (reference-shaped parity path); "hoisted" = same math and the SAME param
    # pytree, but everything that does not depend on recurrent state — prenet,
    # the input halves of the attention-GRU matmuls, the r-frame output
    # projection — is lifted out of the sequential scan into big parallel-
    # over-time MXU matmuls, shortening the 200-step critical path
    # (BASELINE.md round-2 candidate; SURVEY.md §7.3 item 2).
    tf_decoder: str = "scan"
    # Bahdanau energy computation in the TRAINING decoder. "xla" = the
    # reference formula (materialises the (B, T_in, attention_dim) tanh
    # tensor each decoder step); "fused" = the Pallas attn_energy kernel
    # (ops/pallas/attn_energy.py) that keeps that tensor in VMEM — on
    # non-TPU backends "fused" falls back to the XLA formula so CPU tests
    # and the multichip CPU dryrun are unaffected. Motivated by the r5
    # device trace (BASELINE.md MFU row): decoder-scan loop fusions move
    # 40 GB/step at saturated bandwidth.
    attention_energy: str = "xla"
    # Remat policy for the decoder scan body when remat_decoder=True.
    # "all" = jax.checkpoint default (recompute everything on backward);
    # "save_attn" = save the (B, T_in, attention_dim) Bahdanau tanh tensor
    # (jax.ad_checkpoint.checkpoint_name + save_only_these_names) so the
    # backward pass reads it instead of recomputing it — the r5 device
    # trace attributes most of the decoder scan's 40 GB/step loop-fusion
    # traffic to exactly this tensor's recompute + dkeys accumulation.
    # Costs S * B * T_in * attention_dim * 2 bytes of HBM (bf16: ~3.4 GB
    # at the pod_dp recipe). A/B result in BASELINE.md (r5).
    remat_policy: str = "all"

    @property
    def memory_dim(self) -> int:
        return 2 * self.gru_dim       # bidirectional GRU concat

    @property
    def cdtype(self):
        """Computation dtype for flax ``dtype=`` args; None = full precision
        (flax then promotes by input dtype, i.e. f32 everywhere)."""
        import jax.numpy as jnp
        return None if self.compute_dtype == "float32" else jnp.dtype(self.compute_dtype)


@dataclass(frozen=True)
class TrainConfig:
    """Optimisation (paper §3.3; SURVEY.md §2.1 #13)."""

    batch_size: int = 32              # global batch (paper §3.3)
    # >0: the train CLI derives the global batch as per_chip_batch_size *
    # n_devices once the mesh is known (batch_size then only serves non-CLI
    # callers) — presets stay host-topology-agnostic instead of baking in an
    # 8-chip-host assumption
    per_chip_batch_size: int = 0
    # base rate; overriding scales the whole lr_values schedule
    # proportionally (train/schedule.py)
    learning_rate: float = 1e-3
    # lr 1e-3 -> 5e-4 @500k -> 3e-4 @1M -> 1e-4 @2M (paper §3.3)
    lr_boundaries: tuple[int, ...] = (500_000, 1_000_000, 2_000_000)
    lr_values: tuple[float, ...] = (1e-3, 5e-4, 3e-4, 1e-4)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip_norm: float | None = 1.0  # present in TF1-era Tacotrons (SURVEY.md #13, must-verify)
    mask_padding: bool = False        # paper §3.3 trains on zero-padded frames unmasked
    loss_linear_weight: float = 1.0   # equal weights (paper §3.3)
    checkpoint_every: int = 1000
    summary_every: int = 100
    max_steps: int = 2_000_000
    seed: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh (SURVEY.md §2.3/§2.4): DP is the primary strategy; a `model`
    axis is kept in the API (default size 1) so wide projections *can* shard."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "ljspeech"
    data_dir: str = "data/ljspeech"
    num_buckets: int = 8              # SURVEY.md §7.3 item 3: keep compile count small
    max_text_len: int = 256
    max_frames: int = 1024            # padded T_out ceiling (LJSpeech max ~10 s)
    prefetch: int = 2


@dataclass(frozen=True)
class InferConfig:
    """Synthesis-time behavior (SURVEY.md §7.3 item 1).

    The reference decodes a FIXED number of steps (no stop token, paper §3.2)
    and returns untrimmed audio; early exit is therefore OFF by default for
    parity. When on, the decode is a ``lax.while_loop`` that stops once every
    utterance in the batch has emitted ``min_silence_frames`` consecutive
    frames whose normalized-mel peak is below ``silence_threshold``
    (infer/early_exit.py). Trimming uses the same heuristic per utterance.
    """

    early_exit: bool = False
    silence_threshold: float = 0.05   # normalized mel in [0, 1]; 0 = min_level_db
    min_silence_frames: int = 12      # ~150 ms at the paper's 12.5 ms hop
    trim_before_gl: bool = False      # slice linear to the batch max end frame
                                      # (quantized) before Griffin-Lim — GL is
                                      # the dominant cost, so decode-then-trim
                                      # skips GL work on padding
    gl_length_quantum: int = 64       # frame quantum for the pre-GL slice
                                      # (bounds the number of compiled GL shapes)


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    infer: InferConfig = field(default_factory=InferConfig)
    name: str = "default"

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Config":
        """Parse a serialized config, STRICTLY.

        A key present in the JSON but absent from the dataclass (e.g. a field
        renamed between versions) raises instead of silently falling back to
        the default — the config written into every run dir is the
        compatibility contract (SURVEY.md §5.6), and a silent default at
        synthesize-restore time would change numerics without a trace. The
        checkpoint loader is strict about shapes/treedef; this matches it.
        """
        raw = json.loads(s)
        # derived, not hardcoded (ADVICE r4): a section added to Config later
        # is automatically known, so freshly-written run-dir configs can't
        # fail the strict parse with a misleading "renamed?" error
        known_sections = {f.name for f in dataclasses.fields(Config)}
        alien_sections = set(raw) - known_sections
        if alien_sections:
            raise ValueError(
                f"unknown config section(s) {sorted(alien_sections)} in "
                f"serialized config — field renamed between versions? "
                f"(known: {sorted(known_sections)})")

        def _mk(cls, d, section):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            unknown = set(d) - set(fields)
            if unknown:
                raise ValueError(
                    f"unknown key(s) {sorted(f'{section}.{k}' for k in unknown)} "
                    f"in serialized config — field renamed between versions? "
                    f"(known {section} fields: {sorted(fields)})")
            kw = {}
            for k, v in d.items():
                if isinstance(v, list):
                    v = tuple(v)
                kw[k] = v
            return cls(**kw)

        # generic over Config's fields: a new section participates in both
        # the strict check above and the construction here with no edit
        import typing

        hints = typing.get_type_hints(Config)  # resolves the PEP-563 strings
        kw = {}
        for f in dataclasses.fields(Config):
            t = hints[f.name]
            section_cls = t if dataclasses.is_dataclass(t) else None
            if section_cls is not None:
                kw[f.name] = _mk(section_cls, raw.get(f.name, {}), f.name)
            elif f.name in raw:
                kw[f.name] = raw[f.name]
        return Config(**kw)


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply ``section.key=value`` strings to a Config (CLI ``--set``).

    Values parse as JSON first (numbers, booleans, lists->tuples), falling
    back to the raw string — so ``--set model.tf_decoder=hoisted`` and
    ``--set train.batch_size=64`` both work.
    """
    # collect per-section so interdependent fields (e.g. the audio
    # n_fft/win_length/hop_length trio, cross-validated in __post_init__)
    # are replaced in ONE dataclasses.replace call — one at a time, a valid
    # override set could trip validation on the intermediate state
    per_section: dict[str, dict[str, object]] = {}
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if not _ or "." not in key:
            raise ValueError(f"override must be section.key=value, got {ov!r}")
        section, field_name = key.split(".", 1)
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            # Python-style booleans: json only accepts lowercase, and a bool
            # field silently set to the truthy string "False" inverts the
            # user's intent ('if cfg.x:' sees a non-empty string)
            low = raw.strip().lower()
            val = {"true": True, "false": False}.get(low, raw)
        if isinstance(val, list):
            val = tuple(val)
        sub = getattr(cfg, section)
        if not any(f.name == field_name for f in dataclasses.fields(sub)):
            raise ValueError(f"unknown config field {key!r}")
        cur = getattr(sub, field_name)
        if isinstance(cur, bool) and not isinstance(val, bool):
            raise ValueError(
                f"{key!r} is a boolean flag; got {raw!r} (use true/false)")
        per_section.setdefault(section, {})[field_name] = val
    for section, fields_ in per_section.items():
        cfg = dataclasses.replace(
            cfg, **{section: dataclasses.replace(getattr(cfg, section),
                                                 **fields_)})
    return cfg


def _tiny_model() -> ModelConfig:
    # Driver config 1 (BASELINE.json:7): embed 64, CBHG K=4, decoder GRU 128, r=5
    return ModelConfig(
        embed_dim=64,
        prenet_dims=(64, 32),
        encoder_bank_k=4,
        encoder_bank_channels=32,
        encoder_proj_dims=(32, 32),
        postnet_bank_k=4,
        postnet_bank_channels=32,
        postnet_proj_dims=(64, 80),
        highway_layers=2,
        highway_dim=32,
        gru_dim=32,
        attention_dim=64,
        attention_gru_dim=128,
        decoder_gru_dim=128,
        r=5,
        max_decode_steps=40,
    )


PRESETS: dict[str, Config] = {
    # BASELINE.json:7 — tiny teacher-forced step, 8 utterances, CPU
    "tiny_cpu": Config(
        name="tiny_cpu",
        model=_tiny_model(),
        train=TrainConfig(batch_size=8, checkpoint_every=50, summary_every=10),
        data=DataConfig(num_buckets=1, max_text_len=64, max_frames=200),
    ),
    # BASELINE.json:8 — full CBHG encoder fwd/bwd parity
    "cbhg_parity": Config(name="cbhg_parity"),
    # BASELINE.json:9 — full Tacotron (256-d, r=2), bucketed, single chip
    "full_1chip": Config(name="full_1chip"),
    # BASELINE.json:10 — autoregressive inference + 1000-iter Griffin-Lim
    "synth_gl1000": Config(name="synth_gl1000"),
    # BASELINE.json:11 — multi-host DP training: per-chip batch 32 is the
    # v5e sweet spot at T_out~400 with remat (BASELINE.md sweep); the CLI
    # derives the global batch as 32 * n_devices from the live mesh (any
    # chips-per-host topology), and GSPMD shards it over the mesh. The
    # batch_size fallback (= one 8-chip host) serves non-CLI callers only
    "pod_dp": Config(
        name="pod_dp",
        # production-training recipe, measured on v5e (BASELINE.md): hoisted
        # teacher-forced decoder + bf16 compute = 1.42x over the scan/f32
        # parity path at B256+remat (1.204M vs 851k frames/s/chip)
        model=ModelConfig(remat_decoder=True, tf_decoder="hoisted",
                          compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=256, per_chip_batch_size=32,
                          summary_every=50),
    ),
    # Production serving recipe (NOT a parity mode): Fast Griffin-Lim
    # (momentum 0.99 x 100 iters reaches vanilla@1000 quality — BASELINE.md,
    # tests/unit/test_dft.py) + early-exit decode + per-utterance trimming.
    # Measured r2: 614.9 audio-sec/s e2e at B32 vs 74.5 for synth_gl1000.
    "synth_fast": Config(
        name="synth_fast",
        # gl_trim_chunks: lane-trim of the partially-windowed boundary chunks,
        # measured 1.08x on the GL iteration (1.42 vs 1.54 ms/iter, B32x5s
        # v5e) at identical residual magnitude error (scripts/bench_pallas_gl)
        audio=AudioConfig(griffin_lim_iters=100, gl_momentum=0.99,
                          gl_trim_chunks=True),
        infer=InferConfig(early_exit=True, trim_before_gl=True),
    ),
}


def get_config(name: str) -> Config:
    return PRESETS[name]
