import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np
from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

z = np.load('/root/repo/scratch/five_pairs.npz', allow_pickle=True)
base = [(z[f'y1_{i}'], z[f'y2_{i}'], z[f'env_{i}']) for i in range(5)]

K = int(sys.argv[2]) if len(sys.argv) > 2 else 1
for B in [int(x) for x in sys.argv[1].split(',')]:
    reps = (B + 4) // 5
    pairs = (base * reps)[:B]
    t0 = time.perf_counter()
    out = pair_beam_pallas_batch(pairs, beam_width=5, steps_per_grid=K)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = pair_beam_pallas_batch(pairs, beam_width=5, steps_per_grid=K)
    dt = time.perf_counter() - t0
    # correctness: replicated pairs must reproduce the base outputs AND
    # match the f64 windowed-memo oracle modulo known f32 tie flips
    ok = all(out[i] == out[i % 5] for i in range(B))
    from poreover_tpu import native
    om = sum(native.pair_beam_row_col_cpu_emul(*base[i], beam_width=5)
             == out[i] for i in range(min(B, 5)))
    print(f"B={B} K={K} warm={warm:.1f}s run={dt:.3f}s "
          f"pairs_per_s={B/dt:.2f} us_per_step={dt/68608*1e6:.1f} ok={ok} "
          f"oracle={om}/{min(B,5)}",
          flush=True)
