"""A/B the packed conv-bank group count on the real chip (VERDICT r2 next #7).

The packed K=16 bank trades ~47% structural-zero MACs for one well-tiled MXU
contraction; ``groups`` splits it into contiguous width ranges (zeros fall to
~22% at groups=4) at the cost of more, narrower convs. config.py:87 promises
a measured winner — this script times fwd and fwd+bwd (training is the
consumer) for groups in {1, 2, 4} plus the unpacked K-conv form and prints a
JSON line each.

Run: python scripts/bench_bank_groups.py   (axon TPU; slow first compiles)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tacotron_tpu.ops.modules import ConvBank
from tacotron_tpu.utils.roofline import KernelRoofline, conv_bank_flops


def force(x):
    return float(jnp.sum(jnp.abs(x)))


def timed(fn, n=3):
    force(fn())
    t0 = time.time()
    for _ in range(n):
        r = fn()
    force(r)
    return (time.time() - t0) / n


def main():
    B, T, C, K = 32, 128, 128, 16
    N_IN = 30   # loop inside jit so per-call overhead amortises
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.standard_normal((B, T, C)).astype(np.float32))

    variants = [("packed_g1", True, 1), ("packed_g2", True, 2),
                ("packed_g4", True, 4), ("unpacked", False, 1)]
    for name, packed, groups in variants:
        bank = ConvBank(k=K, channels=C, train=False, packed=packed,
                        groups=groups)
        variables = bank.init(jax.random.PRNGKey(1), x)

        @jax.jit
        def fwd_loop(v, x, bank=bank):
            def body(acc, _):
                y = bank.apply(v, x + acc * 1e-9)
                return jnp.sum(y) * 1e-9, None
            return jax.lax.scan(body, 0.0, None, length=N_IN)[0]

        @jax.jit
        def fwdbwd_loop(v, x, bank=bank):
            def loss(xi):
                return jnp.sum(bank.apply(v, xi) ** 2)
            def body(acc, _):
                g = jax.grad(loss)(x + acc * 1e-9)
                return jnp.sum(g) * 1e-9, None
            return jax.lax.scan(body, 0.0, None, length=N_IN)[0]

        t_f = timed(lambda: fwd_loop(variables, x)) / N_IN
        t_fb = timed(lambda: fwdbwd_loop(variables, x)) / N_IN
        fl = conv_bank_flops(B, T, C, K, C, packed=packed, groups=groups)
        rep = KernelRoofline(f"conv_bank_{name}", fl, 0, t_f).report()
        print(json.dumps({
            "variant": name,
            "fwd_ms": round(t_f * 1e3, 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3),
            "fwd_tflops": rep["achieved_tflops"],
        }), flush=True)


if __name__ == "__main__":
    main()
