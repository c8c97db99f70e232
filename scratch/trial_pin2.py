import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
import poreover_tpu.ops.pallas_pair_beam_batch as M

mode = sys.argv[7]
G = 128
if mode == "f32dot":
    # group slicing + concat, but HIGHEST f32 dot on re-summed payload
    def _gather(oh_ref, terms, BC):
        hi, mid, lo = terms
        x = hi.astype(jnp.float32) + mid.astype(jnp.float32) + lo.astype(jnp.float32)
        outs = []
        for g0 in range(0, BC, G):
            g1 = min(g0 + G, BC)
            outs.append(M._dotx(oh_ref[g0:g1, 0:g1 - g0], x[g0:g1]))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    M._gather = _gather
elif mode == "bf16nosplit":
    # bf16 dot but payload bf16-cast once (lossy, compile-only probe), same slicing
    def _gather(oh_ref, terms, BC):
        hi, mid, lo = terms
        outs = []
        for g0 in range(0, BC, G):
            g1 = min(g0 + G, BC)
            ohg = oh_ref[g0:g1, 0:g1 - g0].astype(jnp.bfloat16)
            outs.append(M._dotb(ohg, hi[g0:g1]))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    M._gather = _gather

B, Wst0, Wst1, N, T1, T2 = (int(x) for x in sys.argv[1:7])
CH = 128
L1 = ((T1 + CH + 8 + 127) // 128) * 128
L2 = ((T2 + CH + 8 + 127) // 128) * 128
Lp = ((N + 127) // 128) * 128
y1p = np.concatenate([M._pack_plane(np.zeros((T1, 5), np.float32), L1)] * B)
y2p = np.concatenate([M._pack_plane(np.zeros((T2, 5), np.float32), L2)] * B)
plan_mat = np.zeros((8 * B, Lp), np.int32)[:, :N]
lowered = M._run_kernel.lower(jnp.asarray(y1p), jnp.asarray(y2p),
                            jnp.asarray(plan_mat), B, 5, 4, Wst0, Wst1,
                            CH, L1, L2, 1)
lowered.compile()
print("COMPILE_OK mode=", mode)
