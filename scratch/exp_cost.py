"""Cost-split experiment: run the real workload through hacked variants
of the batch kernel (timing only; results are wrong for hacked ones)."""
import sys, os, time, importlib.util
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np

variant = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1

src = open("/root/repo/poreover_tpu/ops/pallas_pair_beam_batch.py").read()
if variant == "layers1":
    src = src.replace("LAYERS = W + 1", "LAYERS = 1")
elif variant == "layers3":
    src = src.replace("LAYERS = W + 1", "LAYERS = 3")
elif variant == "nosweep":
    src = src.replace("        sweep_axis(st0, ps0, y1_ref, alo, ahi, WF0, S0, L1, 0)\n", "")
    src = src.replace("        sweep_axis(st1, ps1, y2_ref, blo, bhi, WF1, S1, L2, B)\n", "")
elif variant == "base":
    pass
else:
    raise SystemExit("unknown variant")

spec = importlib.util.spec_from_loader("hacked_batch", loader=None)
M = importlib.util.module_from_spec(spec)
M.__dict__["__name__"] = "hacked_batch"
sys.modules["hacked_batch"] = M
# make relative imports inside the source work
src = src.replace("from .beam2d_planned import", "from poreover_tpu.ops.beam2d_planned import")
exec(compile(src, "hacked_batch.py", "exec"), M.__dict__)

from bench import build_workload
y1, y2, env = build_workload()
pairs = [(y1, y2, env)] * B
t0 = time.time()
outs = M.pair_beam_pallas_batch(pairs, beam_width=5, steps_per_grid=K)
print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)
best = float("inf")
for _ in range(2):
    t0 = time.time()
    outs = M.pair_beam_pallas_batch(pairs, beam_width=5, steps_per_grid=K)
    best = min(best, time.time() - t0)
print(f"VARIANT={variant} B={B} K={K} total={best:.2f}s per_pair={best/B:.3f}s per_step_us={best/52509*1e6:.1f}")
