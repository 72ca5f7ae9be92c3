"""Speed-of-light accounting (SURVEY.md §5.1; BASELINE.json:5).

Computes achieved vs peak FLOPs/bandwidth per kernel and the roofline ratio.
Peaks default to TPU v5e (this project's bench chip): 197 TFLOP/s bf16 MXU
(f32 matmuls run as single-pass bf16 under JAX's DEFAULT precision), 819 GB/s
HBM. Override for other chips.
"""

from __future__ import annotations

from dataclasses import dataclass


V5E = {"flops_peak": 197e12, "hbm_gbps": 819e9, "name": "TPU v5e"}


@dataclass
class KernelRoofline:
    name: str
    flops: float            # algorithmic FLOPs per invocation
    bytes_accessed: float   # HBM bytes per invocation
    seconds: float          # measured wall time per invocation
    chip: dict = None

    def report(self) -> dict:
        chip = self.chip or V5E
        achieved_flops = self.flops / self.seconds
        achieved_bw = self.bytes_accessed / self.seconds
        # ridge: below this intensity the kernel is bandwidth-bound
        intensity = self.flops / max(self.bytes_accessed, 1.0)
        ridge = chip["flops_peak"] / chip["hbm_gbps"]
        bound = "compute" if intensity >= ridge else "memory"
        sol_time = max(self.flops / chip["flops_peak"],
                       self.bytes_accessed / chip["hbm_gbps"])
        return {
            "kernel": self.name,
            "chip": chip["name"],
            "time_ms": round(self.seconds * 1e3, 3),
            "achieved_tflops": round(achieved_flops / 1e12, 2),
            "achieved_gbps": round(achieved_bw / 1e9, 1),
            "arith_intensity": round(intensity, 1),
            "bound": bound,
            "speed_of_light_ms": round(sol_time * 1e3, 3),
            "sol_fraction": round(sol_time / self.seconds, 3),
        }


def gl_iteration_flops(batch: int, frames: int, n_fft: int,
                       win_length: int | None = None) -> float:
    """One Griffin-Lim iteration via matmul-DFT: forward + inverse transforms.

    The mm transforms contract only the (128-aligned) live window span
    (dsp/dft._live_span), so FLOPs scale with that span, not n_fft."""
    if win_length is None:
        k = n_fft
    else:
        from tacotron_tpu.dsp.dft import _live_span

        lo, hi = _live_span(n_fft, win_length)
        k = hi - lo
    n_bins = n_fft // 2 + 1
    per_frame = 2 * k * (2 * n_bins)   # fwd matmul (re+im columns)
    per_frame += 2 * (2 * n_bins) * k  # inverse matmul
    return batch * frames * per_frame


def conv_bank_flops(batch: int, t: int, c_in: int, k: int, channels: int,
                    packed: bool = True, groups: int = 1) -> float:
    if not packed:
        taps = k * (k + 1) // 2
    else:
        # each packed group (lo, hi] is a width-hi conv with (hi-lo)*channels
        # outputs -> hi*(hi-lo) taps (ops/modules.ConvBank); groups=1 -> k*k
        from tacotron_tpu.ops.modules import conv_bank_group_bounds

        taps = sum(hi * (hi - lo)
                   for lo, hi in conv_bank_group_bounds(k, groups))
    return 2.0 * batch * t * c_in * channels * taps


def decode_step_flops(batch: int, t_in: int, n_mels: int = 80, r: int = 2,
                      prenet=(256, 128), att_gru: int = 256, att_dim: int = 256,
                      mem_dim: int = 256, dec_dim: int = 256) -> float:
    """One fused decode step (per scan iteration) matmul FLOPs."""
    f = 0.0
    f += 2 * n_mels * prenet[0] + 2 * prenet[0] * prenet[1]      # prenet
    gi = prenet[1] + mem_dim
    f += 2 * (gi * 3 * att_gru + att_gru * 3 * att_gru)          # attention GRU
    f += 2 * att_gru * att_dim + 2 * t_in * att_dim              # query + energy dot
    f += 2 * t_in * mem_dim                                       # context
    f += 2 * (att_gru + mem_dim) * dec_dim                        # input proj
    f += 2 * 2 * (dec_dim * 3 * dec_dim + dec_dim * 3 * dec_dim)  # 2 res GRUs
    f += 2 * dec_dim * r * n_mels                                 # frame proj
    return batch * f
