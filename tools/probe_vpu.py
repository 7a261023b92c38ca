"""VPU throughput microbench: practical f32/bf16 elementwise ceilings.

Measures achieved FLOP/s of Pallas kernels running pure fma chains, chains
with interleaved transcendentals (rsqrt/sqrt — the DEM/SPH pair-force mix),
and bf16 variants, at DEM-kernel-like shapes.  Establishes the
speed-of-light target for the pair sweeps.  Run on the real chip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NL = 3328
ROWS = 512
K = 64          # fma chain length per element pass
PASSES = 8      # independent chains (ILP)


def make_kernel(dtype, trans_every=0):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        c1 = jnp.asarray(1.000001, dtype)
        for p in range(PASSES):
            y = x + jnp.asarray(p, dtype)
            for k in range(K):
                y = y * c1 + c1
                if trans_every and (k % trans_every == trans_every - 1):
                    y = jax.lax.rsqrt(jnp.abs(y) + jnp.asarray(1e-6, dtype))
            acc = acc + y
        o_ref[...] = acc

    return kernel


def run(dtype, trans_every=0, n=30):
    x = jnp.ones((ROWS, 8, NL), dtype)
    kern = make_kernel(dtype, trans_every)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ROWS, 8, NL), dtype),
        grid=(ROWS // 8,),
        in_specs=[pl.BlockSpec((8, 8, NL), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((8, 8, NL), lambda b: (b, 0, 0)),
    )
    f = jax.jit(f)
    r = f(x)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(x)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    n_el = ROWS * 8 * NL
    flops = n_el * PASSES * (K * 2 + 1)
    n_trans = n_el * PASSES * (K // trans_every if trans_every else 0)
    return dt * 1e3, flops / dt / 1e12, n_trans / dt / 1e9


def main():
    print(f"devices: {jax.devices()}")
    for dt_, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ms, tf, _ = run(dt_)
        print(f"{label} fma chain:            {ms:7.3f} ms  {tf:6.2f} TFLOP/s")
    for te in (16, 4):
        ms, tf, tr = run(jnp.float32, trans_every=te)
        print(f"f32 fma + rsqrt/{te:2d}:       {ms:7.3f} ms  {tf:6.2f} TFLOP/s"
              f"  ({tr:.1f} Grsqrt/s)")


if __name__ == "__main__":
    main()
