import sys, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1]
BC, S = 256, 128

def dotx(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

def kernel(oh_ref, x_ref, o_ref):
    x = x_ref[...]            # [256, S] value
    if mode == "valslice":
        outs = []
        for g0 in (0, 128):
            ohg = oh_ref[g0:g0+128, 0:128]
            outs.append(dotx(ohg, x[g0:g0+128]))
        o_ref[...] = jnp.concatenate(outs, axis=0)
    elif mode == "refslice":
        outs = []
        for g0 in (0, 128):
            ohg = oh_ref[g0:g0+128, 0:128]
            xg = x_ref[g0:g0+128, :]
            outs.append(dotx(ohg, xg))
        o_ref[...] = jnp.concatenate(outs, axis=0)
    elif mode == "refslice_store":
        for g0 in (0, 128):
            ohg = oh_ref[g0:g0+128, 0:128]
            xg = x_ref[g0:g0+128, :]
            o_ref[g0:g0+128, :] = dotx(ohg, xg)
    elif mode == "valslice_store":
        x = x_ref[...]
        for g0 in (0, 128):
            ohg = oh_ref[g0:g0+128, 0:128]
            o_ref[g0:g0+128, :] = dotx(ohg, x[g0:g0+128])
    elif mode == "fulldot":
        o_ref[...] = dotx(oh_ref[...][:, :128], x)

@jax.jit
def run(oh, x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BC, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(oh, x)

oh = jnp.zeros((BC, 128), jnp.float32)
x = jnp.ones((BC, S), jnp.float32)
r = run(oh, x)
r.block_until_ready()
print("OK", mode)
