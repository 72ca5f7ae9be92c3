"""Probe Mosaic/TPU capabilities needed by the Griffin-Lim kernel design:
(a) VMEM capacity, (b) dot_general NT form, (c) value .at[].add in-kernel,
(d) unaligned lane slicing, (e) fori_loop inside kernel.
"""
import sys
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def probe_vmem(mb):
    n = mb * 1024 * 1024 // 4 // 512  # rows of (., 512) f32

    def kernel(x_ref, o_ref, scratch):
        scratch[0:8, :] = x_ref[:] * 2.0
        o_ref[:] = scratch[0:8, :]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, 512), jnp.float32)],
    )
    x = jnp.ones((8, 512), jnp.float32)
    force(f(x))
    return True


def probe_ops():
    F, S, H = 64, 256, 275

    def kernel(spec_ref, d_ref, p_ref, o_ref, y_scr):
        spec = spec_ref[:]
        d = d_ref[:]
        # NT matmul: contract dim 1 of both
        out = jax.lax.dot_general(
            spec, d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (F, H)
        # scratch-ref accumulate with static overlapping slices
        y_scr[:] = jnp.zeros((F + 8, H), jnp.float32)
        y_scr[3:3 + F] += out
        y_scr[5:5 + F] += out * 0.5
        # unaligned row slice + tiny matmul
        row = y_scr[5:6, :]                           # (1, H)
        rev = jnp.dot(row, p_ref[:], preferred_element_type=jnp.float32)
        y_scr[7:8] = rev
        # loop inside kernel (static body, carried value)
        def body(i, acc):
            return acc + jnp.sum(y_scr[0:8, :]) * 1e-9
        s = jax.lax.fori_loop(0, 4, body, jnp.float32(0))
        o_ref[:] = y_scr[:] + s

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F + 8, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F + 8, H), jnp.float32)],
    )
    spec = jnp.ones((F, S), jnp.float32)
    d = jnp.ones((H, S), jnp.float32)
    import numpy as np
    p = jnp.asarray(np.eye(H, dtype=np.float32)[::-1].copy())
    force(f(spec, d, p))
    return True


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "ops":
        print("ops:", probe_ops())
    else:
        print(f"vmem {mode}MB:", probe_vmem(int(mode)))
