"""Empty-body grid overhead ablation. MODE env var:
  all      — inputs y1,y2,plan + 3 outputs + scratch (baseline ~100us/step)
  noy      — drop the two big y inputs
  noprov   — prov output block (8,128) constant index instead of (256,128)/32
  noouts   — single tiny output only
  noscr    — no big scratch
  anyy     — y inputs in ANY (HBM) instead of VMEM
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = os.environ.get("MODE", "all")
B, CP, S0, S1 = 8, 32, 1920, 768
BC = B * CP
N = 2048
L1, L2, Lp = 62336, 75904, 2048

big_y = MODE != "noy"
yspace = pltpu.ANY if MODE == "anyy" else pltpu.VMEM
prov_big = MODE not in ("noprov", "noouts")
multi_out = MODE != "noouts"
scr = MODE != "noscr"

if MODE in ("any1", "any3"):
    nout = 1 if MODE == "any1" else 3

    def kernel(*refs):
        i = pl.program_id(0)

    @jax.jit
    def run(y1, y2, plan):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * nout,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(N,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * nout,
                scratch_shapes=[
                    pltpu.VMEM((BC, S0), jnp.float32), pltpu.VMEM((BC, S0), jnp.float32),
                    pltpu.VMEM((BC, S1), jnp.float32), pltpu.VMEM((BC, S1), jnp.float32),
                    pltpu.VMEM((BC, max(S0, S1)), jnp.float32),
                ]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(y1, y2, plan)

    ins = [jnp.zeros((64, L1), jnp.float32), jnp.zeros((64, L2), jnp.float32),
           jnp.zeros((64, Lp), jnp.int32)]
    t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
    print(f"# warm {time.time()-t0:.1f}s", file=sys.stderr)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
        best = min(best, time.time() - t0)
    print(f"MODE={MODE} total={best:.4f}s per_step={best/N*1e6:.2f}us")
    sys.exit(0)

if MODE == "anyouts":
    # 3 HBM outputs + per-32-step DMA flush from scratch — the form the
    # real kernel uses after the output rework
    def kernel(y1, y2, plan, prov, sco, val, st0, ps0, st1, ps1, tmp,
               pv_s, sem):
        i = pl.program_id(0)
        pv_s[:, :] = jnp.full((32 * 8, 128), i, jnp.int32)

        @pl.when(i % 32 == 31)
        def _():
            cp = pltpu.make_async_copy(
                pv_s, prov.at[pl.ds((i // 32) * 256, 256), :], sem.at[0])
            cp.start()
            cp.wait()

    @jax.jit
    def run(y1, y2, plan):
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((((N + 31) // 32) * 32 * 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(N,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
                + [pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
                scratch_shapes=[
                    pltpu.VMEM((BC, S0), jnp.float32), pltpu.VMEM((BC, S0), jnp.float32),
                    pltpu.VMEM((BC, S1), jnp.float32), pltpu.VMEM((BC, S1), jnp.float32),
                    pltpu.VMEM((BC, max(S0, S1)), jnp.float32),
                    pltpu.VMEM((32 * 8, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                ]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(y1, y2, plan)

    ins = [jnp.zeros((64, L1), jnp.float32), jnp.zeros((64, L2), jnp.float32),
           jnp.zeros((64, Lp), jnp.int32)]
    t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
    print(f"# warm {time.time()-t0:.1f}s", file=sys.stderr)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
        best = min(best, time.time() - t0)
    print(f"MODE={MODE} total={best:.4f}s per_step={best/N*1e6:.2f}us")
    sys.exit(0)

def kernel(*refs):
    i = pl.program_id(0)
    sco = refs[3 if big_y else 1] if multi_out else refs[1 if not big_y else 3]
    @pl.when(i == 0)
    def _():
        sco[:, :] = jnp.zeros(sco.shape, sco.dtype)

out_shape = []
out_specs = []
if multi_out:
    if prov_big:
        out_shape.append(jax.ShapeDtypeStruct((((N + 31) // 32) * 32 * 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((32 * 8, 128), lambda o: (o // 32, 0)))
    else:
        out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((8, 128), lambda o: (0, 0)))
    out_shape += [jax.ShapeDtypeStruct((8, 128), jnp.float32),
                  jax.ShapeDtypeStruct((8, 128), jnp.int32)]
    out_specs += [pl.BlockSpec((8, 128), lambda i: (0, 0)),
                  pl.BlockSpec((8, 128), lambda i: (0, 0))]
else:
    out_shape = [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0))]

in_specs = []
ins = []
if big_y:
    in_specs += [pl.BlockSpec(memory_space=yspace)] * 2
    ins += [jnp.zeros((64, L1), jnp.float32), jnp.zeros((64, L2), jnp.float32)]
in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
ins.append(jnp.zeros((64, Lp), jnp.int32))

scratch = []
if scr:
    scratch = [pltpu.VMEM((BC, S0), jnp.float32), pltpu.VMEM((BC, S0), jnp.float32),
               pltpu.VMEM((BC, S1), jnp.float32), pltpu.VMEM((BC, S1), jnp.float32),
               pltpu.VMEM((BC, max(S0, S1)), jnp.float32)]

@jax.jit
def run(*ins):
    return pl.pallas_call(
        kernel, out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(N,), in_specs=in_specs,
            out_specs=out_specs, scratch_shapes=scratch),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
print(f"# warm {time.time()-t0:.1f}s", file=sys.stderr)
best = 1e9
for _ in range(3):
    t0 = time.time(); r = [np.asarray(o) for o in run(*ins)]
    best = min(best, time.time() - t0)
print(f"MODE={MODE} total={best:.4f}s per_step={best/N*1e6:.2f}us")
