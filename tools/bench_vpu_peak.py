"""Measure effective VPU f32 throughput with a dependency-light FMA kernel.

Gives the roofline against which the overlap kernel's op budget is judged.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS, NITER = 256, 512, 512


def kernel(a_ref, o_ref):
    x = a_ref[:]
    y = x * 1.0000001 + 0.5
    z = x * 0.9999999 - 0.25
    for _ in range(NITER // 2):
        y = y * np.float32(1.0000001) + x
        z = z * np.float32(0.9999999) + x
    o_ref[:] = y + z


@jax.jit
def run(a):
    return pl.pallas_call(
        kernel,
        grid=(a.shape[0] // ROWS,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    )(a)


def main():
    nrows = 8192 * 71 // 8  # 1/8 of the overlap problem: fast but sizeable
    a = jax.device_put(jnp.ones((nrows, COLS), dtype=jnp.float32))
    out = run(a)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(a)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 3
    flops = nrows * COLS * NITER * 2  # FMA = 2 flops
    print(f"effective VPU f32: {flops/dt/1e12:.2f} Tflop/s  ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
