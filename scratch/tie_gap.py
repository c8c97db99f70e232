"""Quantify the pair1 objective gap: score the f64 oracle's 6500-base
consensus vs the engines' 6499-base consensus (same sequence minus the
'A' at 3257) under the TRUE pair objective log P1(s) + log P2(s), in
float64 on the host CPU. A vanishing gap proves the indel is a numeric
near-tie, not a search bug.

Run scratch/build_workloads.py first (writes scratch/pair_workloads/).
Measured r5: oracle_6500 total -4933.84, engine_6499 total -4939.94 —
the oracle's pick is 6.10 nats better; see docs/EXACTNESS.md r5."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from poreover_tpu import native  # noqa: E402
from poreover_tpu.ops.forward import forward  # noqa: E402

d = np.load("/root/repo/scratch/pair_workloads/pair1.npz")
y1, y2 = np.asarray(d["y1"], np.float64), np.asarray(d["y2"], np.float64)

oracle = native.pair_beam_row_col_cpu_emul(y1, y2, d["env"], beam_width=5)
assert len(oracle) == 6500, len(oracle)
eng = oracle[:3257] + oracle[3258:]

for name, s in (("oracle_6500", oracle), ("engine_6499", eng)):
    lp1 = forward(y1, s)
    lp2 = forward(y2, s)
    tot = lp1 + lp2
    print(f"{name}: logP1={lp1:.10f} logP2={lp2:.10f} total={tot:.10f}",
          flush=True)
