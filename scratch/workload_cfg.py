import numpy as np, sys
sys.path.insert(0, "/root/repo")
from bench import build_workload
from poreover_tpu.ops.beam2d_planned import C0RUN as PC0, C1RUN as PC1, plan_walk
from poreover_tpu.ops.beam2d_rowcol import transpose_envelope

y1, y2, env = build_workload()
U, V = len(y1), len(y2)
env = np.asarray(env, dtype=np.int64)[:U]
env_t = transpose_envelope(env, U, V)
plan = plan_walk(env, env_t, U, V)
w0 = np.where(plan["type"] != PC1, plan["a_hi"] - plan["a_lo"], 0)
w1 = np.where(plan["type"] != PC0, plan["b_hi"] - plan["b_lo"], 0)
def bucket(x, buckets=(384, 768, 1536, 3072)):
    for b in buckets:
        if x <= b:
            return b
    return ((x + 1023) // 1024) * 1024
Wst0 = bucket(int(max(w0.max(), 1)) + 2)
Wst1 = bucket(int(max(w1.max(), 1)) + 2)
N = len(plan["type"])
N_pad = ((N + 511) // 512) * 512
print(f"U={U} V={V} Wst0={Wst0} Wst1={Wst1} N={N} N_pad={N_pad} w0max={w0.max()} w1max={w1.max()}")
