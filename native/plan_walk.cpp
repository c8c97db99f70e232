// Host-side plan builder for the plan-driven row_col pair beam search.
//
// Replicates poreover_tpu/ops/beam2d_planned.py:plan_walk (the host
// simulation of the reference walk, BeamSearch.h:262-397) exactly, but in
// C++: the Python loop costs ~0.7 s per real read pair (~140k iterations),
// which dominated the host side of batched pair decoding. Differential-
// tested against the Python implementation in tests/test_beam2d.py.

#include <cstdint>
#include <vector>

namespace {

enum StepType { MAIN = 0, C0RUN = 1, C1RUN = 2 };

}  // namespace

extern "C" {

// env: [U,2] int64 row ranges. Emits steps into out[cap][5] rows
// (type, a_lo, a_hi, b_lo, b_hi). Returns the step count, or -1 if cap is
// too small (caller should pass cap >= U + V + 2).
int plan_walk_native(const int64_t* env, int U, int V, int32_t* out,
                     int cap) {
  // envelope transpose: col ranges [first u covering v, first_u + count)
  // (BeamSearch.h:269-284; matches beam2d_rowcol.transpose_envelope)
  std::vector<int64_t> col_lo(V, -1), col_hi(V, -1);
  for (int u = 0; u < U; ++u) {
    int64_t s = env[2 * u] < 0 ? 0 : env[2 * u];
    int64_t e = env[2 * u + 1] > V ? V : env[2 * u + 1];
    for (int64_t x = s; x < e; ++x) {
      if (col_lo[x] < 0) {
        col_lo[x] = u;
        col_hi[x] = u + 1;
      } else {
        ++col_hi[x];
      }
    }
  }

  int n = 0;
  auto emit = [&](int32_t t, int64_t a_lo, int64_t a_hi, int64_t b_lo,
                  int64_t b_hi) -> bool {
    if (n >= cap) return false;
    out[5 * n + 0] = t;
    out[5 * n + 1] = (int32_t)a_lo;
    out[5 * n + 2] = (int32_t)a_hi;
    out[5 * n + 3] = (int32_t)b_lo;
    out[5 * n + 4] = (int32_t)b_hi;
    ++n;
    return true;
  };

  int64_t u = 0, v = 0;
  int64_t prs = 0, pre = 0, pcs = 0, pce = 0;
  int run_type = -1;  // -1 none, C0RUN, C1RUN
  int64_t run_start = 0, run_len = 0;
  bool ok = true;

  auto flush_run = [&]() {
    if (run_type == C0RUN)
      ok = ok && emit(C0RUN, run_start, run_start + run_len, 0, 0);
    else if (run_type == C1RUN)
      ok = ok && emit(C1RUN, 0, 0, run_start, run_start + run_len);
    run_type = -1;
    run_len = 0;
  };

  while (u <= U - 1 && v <= V - 1) {
    int64_t rs = env[2 * u], re = env[2 * u + 1];
    int64_t cs = col_lo[v], ce = col_hi[v];
    bool in_row = rs <= v && v < re;
    if (v < rs) {
      if (run_type != C1RUN) {
        flush_run();
        run_type = C1RUN;
        run_start = v;
      }
      ++run_len;
      ++v;
      continue;
    }
    int64_t rs_e = in_row ? v : prs;
    int64_t re_e = in_row ? re : pre;
    bool in_col = cs >= 0 && cs <= u && u < ce;
    if (cs >= 0 && u < cs) {
      if (run_type != C0RUN) {
        flush_run();
        run_type = C0RUN;
        run_start = u;
      }
      prs = rs_e;
      pre = re_e;
      ++run_len;
      ++u;
      continue;
    }
    flush_run();
    int64_t cs_e = in_col ? u : pcs;
    int64_t ce_e = in_col ? ce : pce;
    ok = ok && emit(MAIN, cs_e, ce_e, rs_e, re_e);
    prs = rs_e;
    pre = re_e;
    pcs = cs_e;
    pce = ce_e;
    ++u;
    ++v;
  }
  flush_run();
  return ok ? n : -1;
}

}  // extern "C"
