import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
from poreover_tpu.ops.pallas_pair_beam_batch import _run_kernel, _pack_plane

B, Wst0, Wst1, N, T1, T2 = (int(x) for x in sys.argv[1:7])
CH = 128
L1 = ((T1 + CH + 8 + 127) // 128) * 128
L2 = ((T2 + CH + 8 + 127) // 128) * 128
Lp = ((N + 127) // 128) * 128
y1p = np.concatenate([_pack_plane(np.zeros((T1, 5), np.float32), L1)] * B)
y2p = np.concatenate([_pack_plane(np.zeros((T2, 5), np.float32), L2)] * B)
plan_mat = np.zeros((8 * B, Lp), np.int32)[:, :N]
lowered = _run_kernel.lower(jnp.asarray(y1p), jnp.asarray(y2p),
                            jnp.asarray(plan_mat), B, 5, 4, Wst0, Wst1,
                            CH, L1, L2, 1)
lowered.compile()
print("COMPILE_OK", *sys.argv[1:7])
