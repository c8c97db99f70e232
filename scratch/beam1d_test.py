"""Validate the Pallas 1D beam kernel against the XLA engine."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

from poreover_tpu.ops.beam import beam_search_batch  # noqa: E402
from poreover_tpu.ops.pallas_beam1d import beam1d_pallas_batch  # noqa: E402

rng = np.random.default_rng(5)


def softmax_log(T, S=5):
    x = rng.normal(size=(T, S)) * 2
    return (x - np.log(np.exp(x).sum(1, keepdims=True))).astype(np.float32)


mode = sys.argv[1] if len(sys.argv) > 1 else "small"

if mode == "small":
    ys = [softmax_log(T) for T in (300, 257, 512, 100, 421, 380, 256, 64)]
    t0 = time.perf_counter()
    got = beam1d_pallas_batch(ys, beam_width=25)
    print(f"pallas warm: {time.perf_counter()-t0:.1f}s", flush=True)
    want = beam_search_batch(ys, beam_width=25)
    ok = sum(a == b for a, b in zip(got, want))
    print(f"small: {ok}/{len(ys)} match", flush=True)
    for a, b in zip(got, want):
        if a != b:
            print("  got ", a[:60], len(a))
            print("  want", b[:60], len(b))
else:
    from poreover_tpu.io.trace import model_from_trace

    DATA = "/root/reference/data"
    ys0 = []
    for name in ("read1.npy", "read2.npy"):
        m = model_from_trace(f"{DATA}/reads/{name}", "poreover")
        ys0.append(m.log_prob.astype(np.float32))
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ys = (ys0 * ((B + 1) // 2))[:B]
    t0 = time.perf_counter()
    got = beam1d_pallas_batch(ys, beam_width=25)
    print(f"pallas warm: {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        got = beam1d_pallas_batch(ys, beam_width=25)
        best = min(best, time.perf_counter() - t0)
    print(f"pallas B={B}: best={best:.2f}s ({B/best:.1f} reads/s)",
          flush=True)
    want2 = beam_search_batch(ys0, beam_width=25)
    ok = sum(got[i] == want2[i % 2] for i in range(B))
    print(f"real: {ok}/{B} match XLA engine", flush=True)
