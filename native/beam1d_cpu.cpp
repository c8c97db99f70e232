// Single-core CPU 1D CTC beam search — the measured baseline stand-in for
// the reference's C++ decoder (BeamSearch.h:18-58 over PoreOverNode,
// PrefixTree.h:461-489: trie of prefixes, per-node per-time forward memo,
// beam prune by last-step probability). Freshly written; used only by
// bench.py to anchor the TPU 1D beam number to the reference's algorithm
// class on this machine.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kNegInf = -1e30;

inline double lse(double a, double b) {
  if (a <= kNegInf) return b;
  if (b <= kNegInf) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct Node1D {
  int last;
  Node1D* parent;
  std::vector<Node1D*> children;
  std::unordered_map<int, double> prob;
  double last_prob = kNegInf;

  Node1D(int c, Node1D* p) : last(c), parent(p) {}
  ~Node1D() {
    for (auto* ch : children) delete ch;
  }
  double at(int t) const {
    auto it = prob.find(t);
    return it == prob.end() ? kNegInf : it->second;
  }
};

}  // namespace

extern "C" {

// y: row-major [T, A+1] log-probs (blank last). Returns sequence length;
// writes the label into out (caller allocates T+1).
int beam_search_1d_cpu(const double* y, int T, int beam_width, char* out) {
  const int A = 4;
  static const char* bases = "ACGT";
  Node1D root(A, nullptr);
  // plain-CTC root: cumulative blank mass, 0 at t=-1
  root.prob[-1] = 0.0;
  double s = 0.0;
  for (int t = 0; t < T; ++t) {
    s += y[t * (A + 1) + A];
    root.prob[t] = s;
  }

  auto update = [&](Node1D* n, int t) {
    const double* row = y + static_cast<size_t>(t) * (A + 1);
    double emit = n->parent->at(t - 1) + row[n->last];
    double stay = n->at(t - 1) + row[A];
    double v = lse(emit, stay);
    n->prob[t] = v;
    n->last_prob = v;
  };
  auto expand = [&](Node1D* n) -> std::vector<Node1D*>& {
    if (n->children.empty())
      for (int c = 0; c < A; ++c) n->children.push_back(new Node1D(c, n));
    return n->children;
  };

  std::vector<Node1D*> beam;
  for (auto* ch : expand(&root)) {
    update(ch, 0);
    beam.push_back(ch);
  }

  for (int t = 1; t < T; ++t) {
    size_t n0 = beam.size();
    for (size_t b = 0; b < n0; ++b) {
      Node1D* n = beam[b];
      update(n, t);
      for (auto* ch : expand(n)) {
        update(ch, t);
        beam.push_back(ch);
      }
    }
    std::sort(beam.begin(), beam.end());
    beam.erase(std::unique(beam.begin(), beam.end()), beam.end());
    std::sort(beam.begin(), beam.end(), [](Node1D* a, Node1D* b) {
      return a->last_prob > b->last_prob;
    });
    if ((int)beam.size() > beam_width) beam.resize(beam_width);
  }

  Node1D* best = beam.front();
  std::string seq;
  for (Node1D* n = best; n && n->parent; n = n->parent)
    seq += bases[n->last % 4];
  std::reverse(seq.begin(), seq.end());
  std::memcpy(out, seq.data(), seq.size());
  out[seq.size()] = '\0';
  return (int)seq.size();
}

}  // extern "C"
