"""Root-cause pair_f64.oracle_exact == 0/1: compare on pair1
(a) the C++ f64 windowed-memo oracle (pair_beam_row_col_cpu_emul)
(b) the XLA planned engine in f64 on host CPU (the --f64 path)
(c) the XLA planned engine in f32 on host CPU (the default semantics)
and report where they differ.

Run scratch/build_workloads.py first (writes scratch/pair_workloads/).
Measured r5: f64 == f32 engines (6499 bases) != f64 oracle (6500),
one 'A' deleted at position 3257 — see docs/EXACTNESS.md r5.
"""
import json
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

d = np.load("/root/repo/scratch/pair_workloads/pair1.npz")
y1, y2, env = d["y1"], d["y2"], d["env"]

from poreover_tpu import native  # noqa: E402

t0 = time.perf_counter()
oracle = native.pair_beam_row_col_cpu_emul(y1, y2, env, beam_width=5)
print(f"oracle: {len(oracle)} bases in {time.perf_counter()-t0:.1f}s",
      flush=True)

code = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
if MODE == "f64":
    jax.config.update("jax_enable_x64", True)
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned
d = np.load("/root/repo/scratch/pair_workloads/pair1.npz")
t0 = time.perf_counter()
s = beam_search_2d_planned(d["y1"], d["y2"], d["env"], beam_width=5)
print(json.dumps(dict(seq=s, s=round(time.perf_counter()-t0, 1))))
"""

for mode in ("f64", "f32"):
    r = subprocess.run(
        [sys.executable, "-c", f"MODE={mode!r}\n" + code],
        capture_output=True, text=True, timeout=3600)
    if r.returncode:
        print(mode, "FAILED:", r.stderr[-2000:])
        continue
    info = json.loads(r.stdout.strip().splitlines()[-1])
    s = info["seq"]
    match = s == oracle
    print(f"{mode}: {len(s)} bases, {info['s']}s, oracle_match={match}",
          flush=True)
    if not match:
        # locate first/last divergence
        import difflib
        sm = difflib.SequenceMatcher(None, oracle, s, autojunk=False)
        ops = [op for op in sm.get_opcodes() if op[0] != "equal"]
        print(f"  {len(ops)} diff ops:")
        for tag, i1, i2, j1, j2 in ops[:10]:
            print(f"   {tag} oracle[{i1}:{i2}]={oracle[i1:i2]!r} "
                  f"eng[{j1}:{j2}]={s[j1:j2]!r}")
