// Single-core CPU implementation of the row_col 2D pair beam search
// (plain-CTC model), used as the measured stand-in for the reference's
// C++ decoder when computing bench.py's vs_baseline: same algorithmic
// design class as the reference (node trie + per-(read,t) memo tables,
// scalar loops), independently written.
//
// Semantics follow poreover's beam_search_2d_by_row_col
// (reference BeamSearch.h:262-397) including the de-facto stale reuse of
// envelope bounds, matching the TPU kernel and the python replica.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -std::numeric_limits<double>::infinity();

inline double lse(double a, double b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  double m = a > b ? a : b;
  return m + std::log1p(std::exp(-(std::fabs(a - b))));
}

struct PairNode {
  int last;
  PairNode* parent;
  int depth;
  std::vector<PairNode*> children;
  // per-read forward memo keyed by time index
  std::unordered_map<int, double> prob[2];
  // eviction snapshot (emulation mode only): values frozen when the node
  // last left the candidate table, read by children's emit terms
  std::unordered_map<int, double> frozen[2];
  bool in_table = true;
  bool tracked = false;
  int absent = 0;
  double max_prob[2] = {kNegInf, kNegInf};

  PairNode(int c, PairNode* p)
      : last(c), parent(p), depth(p ? p->depth + 1 : 0) {}
  ~PairNode() {
    for (auto* ch : children) delete ch;
  }

  double at(int i, int t) const {
    auto it = prob[i].find(t);
    return it == prob[i].end() ? kNegInf : it->second;
  }
  // parent-emit read with eviction-snapshot fallback (emulation mode)
  double at_emit(int i, int t) const {
    if (in_table) return at(i, t);
    auto it = frozen[i].find(t);
    return it == frozen[i].end() ? kNegInf : it->second;
  }
  void set(int i, int t, double v) {
    prob[i][t] = v;
    if (v > max_prob[i]) max_prob[i] = v;
  }
  void reset_max() { max_prob[0] = kNegInf; max_prob[1] = kNegInf; }
};

struct PairSearch {
  const double* y[2];
  int tmax[2];
  int A;
  PairNode* root;

  PairSearch(const double* y1, int U, const double* y2, int V, int alpha)
      : A(alpha) {
    y[0] = y1;
    y[1] = y2;
    tmax[0] = U;
    tmax[1] = V;
    root = new PairNode(A, nullptr);
    // plain-CTC root: cumulative blank mass per read, 0 at t=-1
    for (int i = 0; i < 2; ++i) {
      double s = 0.0;
      root->prob[i][-1] = 0.0;
      for (int t = 0; t < tmax[i]; ++t) {
        s += y[i][t * (A + 1) + A];
        root->prob[i][t] = s;
      }
    }
  }
  ~PairSearch() { delete root; }

  std::vector<PairNode*>& expand(PairNode* n) {
    if (n->children.empty()) {
      for (int c = 0; c < A; ++c) n->children.push_back(new PairNode(c, n));
    }
    return n->children;
  }

  bool emulate = false;  // emulation mode: windowed/evicting memo semantics

  void update(PairNode* n, int i, int t) {
    const double* row = y[i] + static_cast<size_t>(t) * (A + 1);
    double pval = emulate ? n->parent->at_emit(i, t - 1)
                          : n->parent->at(i, t - 1);
    double emit = pval + row[n->last];
    double stay = n->at(i, t - 1) + row[A];
    n->set(i, t, lse(emit, stay));
  }

  std::string label(PairNode* n) const {
    std::string out;
    static const char* bases = "ACGT";
    while (n && n->parent) {
      out += bases[n->last % 4];
      n = n->parent;
    }
    std::reverse(out.begin(), out.end());
    return out;
  }
};

}  // namespace

extern "C" {

// y1/y2: row-major [U, A+1]/[V, A+1] log-probs (blank last);
// envelope: [U, 2] int64 rows [start, end). Returns consensus length;
// writes sequence into out (caller allocates U+V+1).
int pair_beam_row_col_cpu_impl(const double* y1, int U, const double* y2,
                               int V, const int64_t* envelope, int beam_width,
                               char* out, bool emulate, int grace = 1,
                               int64_t* stats = nullptr,
                               double* trace = nullptr,
                               int64_t* trace_meta = nullptr) {
  const int A = 4;
  PairSearch search(y1, U, y2, V, A);
  search.emulate = emulate;
  // nodes currently in the candidate table (emulation mode)
  std::vector<PairNode*> table_nodes;

  // envelope transpose (column ranges)
  std::vector<int64_t> col_lo(V, -1), col_hi(V, -1);
  for (int u = 0; u < U; ++u) {
    int64_t s = std::max<int64_t>(envelope[2 * u], 0);
    int64_t e = std::min<int64_t>(envelope[2 * u + 1], V);
    for (int64_t x = s; x < e; ++x) {
      if (col_lo[x] < 0) {
        col_lo[x] = u;
        col_hi[x] = u + 1;
      } else {
        col_hi[x]++;
      }
    }
  }

  std::vector<PairNode*> beam;
  for (auto* n : search.expand(search.root)) {
    search.update(n, 0, 0);
    search.update(n, 1, 0);
    beam.push_back(n);
    table_nodes.push_back(n);
  }

  int64_t u = 0, v = 0;
  int64_t row_start = 0, row_end = 0, col_start = 0, col_end = 0;
  while (u <= U - 1 && v <= V - 1) {
    int64_t rs = envelope[2 * u], re = envelope[2 * u + 1];
    int64_t cs = col_lo[v], ce = col_hi[v];

    if (v >= rs && v < re) {
      row_start = v;
      row_end = re;
    } else if (v < rs) {
      for (size_t b = 0; b < beam.size() && b < (size_t)beam_width; ++b)
        search.update(beam[b], 1, (int)v);
      ++v;
      continue;
    }  // else: stale bounds persist
    if (cs >= 0 && u >= cs && u < ce) {
      col_start = u;
      col_end = ce;
    } else if (cs >= 0 && u < cs) {
      for (size_t b = 0; b < beam.size() && b < (size_t)beam_width; ++b)
        search.update(beam[b], 0, (int)u);
      ++u;
      continue;
    }  // else: stale bounds persist

    size_t beam_size = beam.size();
    for (size_t b = 0; b < beam_size; ++b) {
      PairNode* n = beam[b];
      search.update(n, 0, (int)col_start);
      search.update(n, 1, (int)row_start);
      n->reset_max();
      for (auto* ch : search.expand(n)) {
        ch->reset_max();
        search.update(ch, 0, (int)col_start);
        search.update(ch, 1, (int)row_start);
        beam.push_back(ch);
      }
    }
    for (int64_t uu = col_start; uu < col_end; ++uu)
      for (auto* n : beam) search.update(n, 0, (int)uu);
    for (int64_t vv = row_start; vv < row_end; ++vv)
      for (auto* n : beam) search.update(n, 1, (int)vv);

    std::sort(beam.begin(), beam.end());
    beam.erase(std::unique(beam.begin(), beam.end()), beam.end());
    if (emulate) {
      // windowed-table emulation: a node absent from the candidate table
      // for `grace` consecutive prunes loses its live memo (its children
      // keep reading an eviction snapshot) — mirrors the TPU engines'
      // fixed-shape candidate storage (+ optional graveyard of depth
      // grace-1)
      std::unordered_map<PairNode*, bool> keep;
      for (auto* n : beam) keep[n] = true;
      // rejoin statistics (exactness-gap sizing): how absent was a node
      // when it re-entered the table, and how large the graveyard gets
      if (stats) {
        for (auto* n : beam) {
          if (n->absent > 0) {
            int a = n->absent < 31 ? n->absent : 31;
            ++stats[a];  // stats[1..31]: rejoin absence histogram
          }
          if (!n->in_table) ++stats[32];  // rejoined AFTER full eviction
        }
      }
      std::vector<PairNode*> still;
      for (auto* n : table_nodes) {
        if (keep.count(n)) continue;  // re-added below
        ++n->absent;
        if (n->absent >= grace) {
          for (int i = 0; i < 2; ++i) {
            n->frozen[i] = std::move(n->prob[i]);
            n->prob[i].clear();
          }
          n->in_table = false;
          n->tracked = false;
        } else {
          still.push_back(n);
        }
      }
      table_nodes.clear();
      for (auto* n : beam) {
        n->absent = 0;
        n->in_table = true;
        n->tracked = true;
        table_nodes.push_back(n);
      }
      for (auto* n : still) table_nodes.push_back(n);
      if (stats && (int64_t)still.size() > stats[0])
        stats[0] = (int64_t)still.size();  // stats[0]: max graveyard size
    }
    std::sort(beam.begin(), beam.end(), [](PairNode* a, PairNode* b) {
      return a->max_prob[0] + a->max_prob[1] > b->max_prob[0] + b->max_prob[1];
    });
    if (stats && (int)beam.size() > beam_width) {
      // exactness diagnostic: a bit-equal f64 score tie ACROSS the prune
      // cut means beam membership (and thus the output) is tie-break
      // dependent — the C++ std::sort order here is itself arbitrary
      // (input order is the pointer-sorted dedup pass above)
      double keep_s = beam[beam_width - 1]->max_prob[0] +
                      beam[beam_width - 1]->max_prob[1];
      double drop_s =
          beam[beam_width]->max_prob[0] + beam[beam_width]->max_prob[1];
      if (keep_s == drop_s && keep_s != kNegInf) ++stats[33];
    }
    if ((int)beam.size() > beam_width) beam.resize(beam_width);
    if (trace && trace_meta) {
      // per-prune diagnostic trace: post-prune beam scores + step (u, v)
      int64_t j = trace_meta[0];
      for (int w = 0; w < beam_width; ++w)
        trace[j * beam_width + w] =
            w < (int)beam.size()
                ? beam[w]->max_prob[0] + beam[w]->max_prob[1]
                : kNegInf;
      trace_meta[1 + 2 * j] = u;
      trace_meta[2 + 2 * j] = v;
      ++trace_meta[0];
    }
    ++u;
    ++v;
  }

  if (stats && beam.size() > 1) {
    // [34]: the reported top-1 itself is tied with the runner-up
    double s0 = beam[0]->max_prob[0] + beam[0]->max_prob[1];
    double s1 = beam[1]->max_prob[0] + beam[1]->max_prob[1];
    if (s0 == s1) ++stats[34];
  }
  std::string seq = search.label(beam.front());
  std::memcpy(out, seq.data(), seq.size());
  out[seq.size()] = '\0';
  return (int)seq.size();
}

int pair_beam_row_col_cpu(const double* y1, int U, const double* y2, int V,
                          const int64_t* envelope, int beam_width,
                          char* out) {
  return pair_beam_row_col_cpu_impl(y1, U, y2, V, envelope, beam_width, out,
                                    false);
}

// debug/diagnostic: windowed-table memo semantics (see emulate above)
int pair_beam_row_col_cpu_emul(const double* y1, int U, const double* y2,
                               int V, const int64_t* envelope, int beam_width,
                               char* out) {
  return pair_beam_row_col_cpu_impl(y1, U, y2, V, envelope, beam_width, out,
                                    true, 1);
}

// diagnostic: emulation mode with a per-prune score/step trace.
// trace: caller-allocated [U+V, beam_width] doubles; trace_meta:
// caller-allocated int64[1 + 2*(U+V)], zero-initialized — meta[0] returns
// the prune-step count, meta[1+2j], meta[2+2j] the step's (u, v).
int pair_beam_row_col_cpu_emul_trace(const double* y1, int U,
                                     const double* y2, int V,
                                     const int64_t* envelope, int beam_width,
                                     int grace, char* out, double* trace,
                                     int64_t* trace_meta) {
  return pair_beam_row_col_cpu_impl(y1, U, y2, V, envelope, beam_width, out,
                                    true, grace, nullptr, trace, trace_meta);
}

// same, with an eviction grace period (graveyard depth = grace - 1)
int pair_beam_row_col_cpu_emul_grace(const double* y1, int U,
                                     const double* y2, int V,
                                     const int64_t* envelope, int beam_width,
                                     int grace, char* out) {
  return pair_beam_row_col_cpu_impl(y1, U, y2, V, envelope, beam_width, out,
                                    true, grace);
}

// same, also filling stats[33]: [0] max graveyard size, [1..31] rejoin
// absence histogram, [32] rejoins after full eviction (lost memo)
int pair_beam_row_col_cpu_emul_stats(const double* y1, int U,
                                     const double* y2, int V,
                                     const int64_t* envelope, int beam_width,
                                     int grace, char* out, int64_t* stats) {
  for (int i = 0; i < 33; ++i) stats[i] = 0;
  return pair_beam_row_col_cpu_impl(y1, U, y2, V, envelope, beam_width, out,
                                    true, grace, stats);
}

}  // extern "C"
