import sys, numpy as np
sys.path.insert(0, "/root/repo")
from bench import build_workload
from poreover_tpu.ops.beam2d_planned import MAIN, C0RUN, C1RUN, plan_walk, transpose_envelope

y1, y2, env = build_workload()
U, V = len(y1), len(y2)
env = np.asarray(env, dtype=np.int64)[:U]
env_t = transpose_envelope(env, U, V)
p = plan_walk(env, env_t, U, V)
t = p["type"]
w0 = p["a_hi"] - p["a_lo"]
w1 = p["b_hi"] - p["b_lo"]
N = len(t)
for k, name in [(MAIN, "MAIN"), (C0RUN, "C0RUN"), (C1RUN, "C1RUN")]:
    m = t == k
    print(f"{name}: n={m.sum()} ({100*m.sum()/N:.1f}%)")
m = t == MAIN
print("MAIN w0: mean", w0[m].mean(), "p50", np.percentile(w0[m],50), "p90", np.percentile(w0[m],90), "max", w0[m].max())
print("MAIN w1: mean", w1[m].mean(), "p50", np.percentile(w1[m],50), "p90", np.percentile(w1[m],90), "max", w1[m].max())
c0 = t == C0RUN
print("C0RUN w0: mean", w0[c0].mean(), "max", w0[c0].max())
c1 = t == C1RUN
print("C1RUN w1: mean", w1[c1].mean(), "max", w1[c1].max())
# chunks per step at CH=128
ch0 = np.where(t != C1RUN, (p["a_hi"] - (p["a_lo"]//128)*128 + 127)//128, 0)
ch1 = np.where(t != C0RUN, (p["b_hi"] - (p["b_lo"]//128)*128 + 127)//128, 0)
print("chunks0: mean", ch0.mean(), "chunks1:", ch1.mean(), "total mean", (ch0+ch1).mean())
print("N:", N)
