"""Probe: does Mosaic on this v5e toolchain support int4 KV pages?

Tries to compile + run a minimal Pallas kernel that DMAs an int4 page
HBM->VMEM, dequantizes to f32, and dots it with a query — the core ops an
int4 paged-KV decode kernel would need. Prints SUPPORTED / UNSUPPORTED
with the failing stage.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/int4_probe.py
"""

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def kernel(x_hbm, o_ref, buf, sem):
    c = pltpu.make_async_copy(x_hbm.at[0], buf, sem)
    c.start()
    c.wait()
    xf = buf[...].astype(jnp.float32) * 0.25
    o_ref[...] = lax.dot_general(
        xf, xf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def main():
    P, D = 32, 512
    stages = []
    try:
        x = jnp.asarray(
            np.random.randint(-8, 8, (4, P, D)), jnp.int4
        )
        stages.append("int4 array materialized")
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((P, P), lambda: (0, 0)),
                grid=(),
                scratch_shapes=[
                    pltpu.VMEM((P, D), jnp.int4),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((P, P), jnp.float32),
        )(x)
        np.asarray(out)
        stages.append("pallas int4 DMA + dequant dot ran")
        print("SUPPORTED:", "; ".join(stages))
    except Exception as e:
        print("UNSUPPORTED after", stages)
        traceback.print_exception(type(e), e, None, limit=3)


if __name__ == "__main__":
    main()
