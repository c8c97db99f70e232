import sys, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np, jax, jax.numpy as jnp
from poreover_tpu.ops.pallas_pair_beam import _run_kernel, _pack_plane

Wst0, Wst1, N, T1, T2 = (int(x) for x in sys.argv[1:6])
y1p = jnp.asarray(_pack_plane(np.zeros((T1, 5), np.float32)))
y2p = jnp.asarray(_pack_plane(np.zeros((T2, 5), np.float32)))
z = jnp.zeros((N,), jnp.int32)
lowered = _run_kernel.lower(y1p, y2p, z, z, z, z, z, 5, 4, Wst0, Wst1, 128, False)
lowered.compile()
print("COMPILE_OK", *sys.argv[1:6])
