"""Per-stage fwd+bwd timing of the training step at production shapes.

Times (jitted, grad-included) each stage of the B256/T_in128/T_out400 step in
isolation — encoder+keys, hoisted teacher-forced decoder, postnet, loss — to
show where the 1.2M-frames/s step spends its time and which kernel to fuse
next (BASELINE.md round-2/3 candidates).

Run on TPU:  python scripts/train_stage_profile.py [--batch 256]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t-in", type=int, default=128)
    p.add_argument("--t-out", type=int, default=400)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--platform", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tacotron_tpu.config import apply_overrides, get_config
    from tacotron_tpu.models import Tacotron
    from tacotron_tpu.models.decoder import Decoder
    from tacotron_tpu.models.encoder import Encoder
    from tacotron_tpu.models.postnet import PostNet
    from tacotron_tpu.utils.profiling import enable_compilation_cache, time_fn

    enable_compilation_cache()

    cfg = get_config("pod_dp")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vocab_size=64))
    cfg = apply_overrides(cfg, args.overrides)
    m = cfg.model
    b, t_in, t_out = args.batch, args.t_in, args.t_out

    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (b, t_in), 1, 60)
    lens = jnp.full((b,), t_in, jnp.int32)
    mel_gt = jax.random.uniform(rng, (b, t_out, m.n_mels))
    lin_gt = jax.random.uniform(rng, (b, t_out, m.n_freq))
    memory = jax.random.uniform(rng, (b, t_in, m.memory_dim))
    keys = jax.random.uniform(rng, (b, t_in, m.attention_dim))
    mask = jnp.ones((b, t_in), bool)

    model = Tacotron(m, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        text[:1], lens[:1], gt_mel=mel_gt[:1, : 2 * m.r])
    params, bstats = variables["params"], variables["batch_stats"]
    drng = jax.random.PRNGKey(3)

    def timed(name, fn, *xs):
        t = time_fn(jax.jit(fn), *xs, iters=args.iters, warmup=2)
        print(f"{name:36s} {t*1e3:9.2f} ms", flush=True)
        return t

    # ---- full step (fwd+bwd) ----
    def full_loss(p):
        out, _ = model.apply({"params": p, "batch_stats": bstats},
                             text, lens, gt_mel=mel_gt,
                             rngs={"dropout": drng}, mutable=["batch_stats"])
        return (jnp.abs(out.mel - mel_gt).mean()
                + jnp.abs(out.linear - lin_gt).mean())

    t_full = timed("full step fwd+bwd", lambda p: jax.grad(full_loss)(p), params)

    # ---- encoder (+ keys proj) fwd+bwd ----
    def enc_loss(p):
        mem = Encoder(m, True).apply(
            {"params": p["encoder"], "batch_stats": bstats["encoder"]},
            text, lens, rngs={"dropout": drng}, mutable=["batch_stats"])[0]
        return jnp.abs(mem @ p["memory_proj"]["kernel"]).mean()

    t_enc = timed("encoder+keys fwd+bwd", lambda p: jax.grad(enc_loss)(p), params)

    # ---- decoder fwd+bwd (memory/keys as constants) ----
    def dec_loss(p):
        mel, _ = Decoder(m, name="decoder").apply(
            {"params": p["decoder"]}, memory, keys, mask, gt_frames=mel_gt,
            rngs={"dropout": drng})
        return jnp.abs(mel - mel_gt).mean()

    t_dec = timed("decoder fwd+bwd", lambda p: jax.grad(dec_loss)(p), params)

    # ---- decoder at HALF the steps: separates the serial per-step cost of
    # the scan chain from fixed (hoisted prenet/projection) cost ----
    half = t_out // 2 // (2 * m.r) * (2 * m.r)

    def dec_loss_half(p):
        mel, _ = Decoder(m, name="decoder").apply(
            {"params": p["decoder"]}, memory, keys, mask,
            gt_frames=mel_gt[:, :half], rngs={"dropout": drng})
        return jnp.abs(mel - mel_gt[:, :half]).mean()

    t_dec_h = timed("decoder fwd+bwd (T_out/2)",
                    lambda p: jax.grad(dec_loss_half)(p), params)
    n_steps = t_out // m.r
    per_step = (t_dec - t_dec_h) / (n_steps - half // m.r)
    print(f"{'  -> decoder us/scan-step (fwd+bwd)':36s} {per_step*1e6:9.2f} us"
          f"  fixed {max(t_dec - per_step*n_steps, 0)*1e3:.2f} ms")

    # ---- postnet fwd+bwd ----
    def post_loss(p):
        lin, _ = PostNet(m, True).apply(
            {"params": p["postnet"], "batch_stats": bstats["postnet"]},
            mel_gt, mutable=["batch_stats"])
        return jnp.abs(lin - lin_gt).mean()

    t_post = timed("postnet fwd+bwd", lambda p: jax.grad(post_loss)(p), params)

    # ---- postnet at half T_out: its biGRU is the LONGEST serial chain in the
    # step (T_out=400 scan steps vs the decoder's 200) ----
    def post_loss_half(p):
        lin, _ = PostNet(m, True).apply(
            {"params": p["postnet"], "batch_stats": bstats["postnet"]},
            mel_gt[:, :half], mutable=["batch_stats"])
        return jnp.abs(lin - lin_gt[:, :half]).mean()

    t_post_h = timed("postnet fwd+bwd (T_out/2)",
                     lambda p: jax.grad(post_loss_half)(p), params)
    per_t = (t_post - t_post_h) / (t_out - half)
    print(f"{'  -> postnet us/frame (fwd+bwd)':36s} {per_t*1e6:9.2f} us"
          f"  fixed {max(t_post - per_t*t_out, 0)*1e3:.2f} ms")

    other = t_full - t_enc - t_dec - t_post
    print(f"{'unattributed (loss/adam-free residue)':36s} {other*1e3:9.2f} ms")
    fps = b * t_out / t_full
    print(f"fwd+bwd-only frames/s: {fps:,.0f}  (cfg: tf_decoder={m.tf_decoder},"
          f" compute={m.compute_dtype}, remat={m.remat_decoder})")


if __name__ == "__main__":
    main()
