// Host-side native runtime for PoreOver-TPU.
//
// The TPU owns every DP lattice (Viterbi/beam/gamma/2D consensus); this
// library owns the cheap-but-branchy per-read host work the reference kept
// in Cython/C++ — chiefly global sequence alignment used to build the
// pair-decode envelope (reference: poreover/align/align.pyx:29-178).
//
// Faithfulness: the reference aligner has several load-bearing quirks that
// shape its alignments (and therefore the alignment envelope and the final
// consensus FASTA). We reproduce them deliberately:
//  * banded variant stores the DP in a row-banded matrix whose *default*
//    value for out-of-band reads is 0 (std::numeric_limits<int>::infinity()
//    is 0; see reference SparseMatrix.h:70), and its pre-loop boundary
//    writes are silently dropped because no rows exist yet
//    (align.pyx:112-116 + SparseMatrix.h:104-108);
//  * the traceback `for index,val in enumerate(...)` loop has no break, so
//    on ties SEVERAL branches fire in one iteration using stale scores
//    (align.pyx:70-84);
//  * Python-style negative indexing wraps around (seq[-1] is the last
//    character).
//
// Exposed via a C ABI for ctypes. No Python.h dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

inline int py_index(int i, int n) {
  // Python wraparound semantics for possibly-negative indices.
  int m = i % n;
  return m < 0 ? m + n : m;
}

inline int score_fn(char a, char b, int match, int mismatch) {
  return a == b ? match : mismatch;
}

// Row-banded int matrix reproducing the reference SparseMatrix<int>
// semantics: default value 0, inclusive [start,end] storage, silent
// out-of-range set, rows appended in push order.
struct BandedIntMatrix {
  std::vector<int> start, end, offset;
  std::vector<int> values;  // rows concatenated

  void push_row(int s, int e) {
    start.push_back(s);
    end.push_back(e);
    offset.push_back(static_cast<int>(values.size()));
    // allocate e-s+1 cells; reference leaves them uninitialized — we use 0
    // (== the default read value) as the sane stand-in.
    values.insert(values.end(), static_cast<size_t>(e - s + 1), 0);
  }
  int rows() const { return static_cast<int>(start.size()); }
  void set(int i, int j, int v) {
    if (i < 0 || i >= rows()) return;
    if (j < start[i] || j > end[i]) return;
    values[offset[i] + (j - start[i])] = v;
  }
  int get(int i, int j) const {
    if (i < 0 || i >= rows()) return 0;
    if (j < start[i] || j > end[i]) return 0;
    return values[offset[i] + (j - start[i])];
  }
};

// Shared traceback for both aligners. `get` abstracts the DP matrix.
template <typename GetFn>
void traceback(const char* seq1, int l1, const char* seq2, int l2,
               GetFn get, int match, int mismatch, int gap_cost,
               std::string& a1, std::string& a2) {
  int i = l1;
  int j = l2;
  while (i > 0 && j > 0) {
    int n0 = get(i - 1, j - 1) +
             score_fn(seq1[py_index(i - 1, l1)], seq2[py_index(j - 1, l2)],
                      match, mismatch);
    int n1 = get(i - 1, j) + gap_cost;
    int n2 = get(i, j - 1) + gap_cost;
    int m = std::max(n0, std::max(n1, n2));
    // NO break on match: ties fire multiple branches with stale scores,
    // mutating i/j between branches — exact reference behavior.
    if (n0 == m) {
      i -= 1;
      j -= 1;
      a1 += seq1[py_index(i, l1)];
      a2 += seq2[py_index(j, l2)];
    }
    if (n1 == m) {
      i -= 1;
      a1 += seq1[py_index(i, l1)];
      a2 += '-';
    }
    if (n2 == m) {
      j -= 1;
      a1 += '-';
      a2 += seq2[py_index(j, l2)];
    }
  }
  while (i > 0 || j > 0) {
    if (i > 0) {
      i -= 1;
      a1 += seq1[py_index(i, l1)];
      a2 += '-';
    } else {
      j -= 1;
      a1 += '-';
      a2 += seq2[py_index(j, l2)];
    }
  }
  std::reverse(a1.begin(), a1.end());
  std::reverse(a2.begin(), a2.end());
}

}  // namespace

extern "C" {

// Dense Needleman-Wunsch (reference align.pyx:29-98). Writes the two
// gapped strings into out1/out2 (caller allocates l1+l2+1 bytes each);
// returns the alignment length.
int nw_global_pair(const char* seq1, int l1, const char* seq2, int l2,
                   int match, int mismatch, int gap_cost,
                   char* out1, char* out2) {
  std::vector<int> dp(static_cast<size_t>(l1 + 1) * (l2 + 1), 0);
  auto at = [&](int i, int j) -> int& {
    return dp[static_cast<size_t>(i) * (l2 + 1) + j];
  };
  for (int i = 0; i <= l1; ++i) at(i, 0) = gap_cost * i;
  for (int j = 0; j <= l2; ++j) at(0, j) = gap_cost * j;
  for (int i = 1; i <= l1; ++i) {
    for (int j = 1; j <= l2; ++j) {
      int d = at(i - 1, j - 1) + score_fn(seq1[i - 1], seq2[j - 1], match, mismatch);
      int u = at(i - 1, j) + gap_cost;
      int l = at(i, j - 1) + gap_cost;
      at(i, j) = std::max(d, std::max(u, l));
    }
  }
  std::string a1, a2;
  traceback(seq1, l1, seq2, l2,
            [&](int i, int j) { return at(i, j); },
            match, mismatch, gap_cost, a1, a2);
  std::memcpy(out1, a1.data(), a1.size());
  out1[a1.size()] = '\0';
  std::memcpy(out2, a2.data(), a2.size());
  out2[a2.size()] = '\0';
  return static_cast<int>(a1.size());
}

// Banded Needleman-Wunsch (reference align.pyx:100-178). Same quirk set as
// documented in the file header. band_width default in the reference: 500.
int nw_global_pair_banded(const char* seq1, int l1, const char* seq2, int l2,
                          int band_width, int match, int mismatch,
                          int gap_cost, char* out1, char* out2) {
  BandedIntMatrix dp;
  // reference boundary writes happen before any push_row and are dropped
  for (int i = 0; i < l1; ++i) {
    // np.round is round-half-to-even; nearbyint under default FE_TONEAREST
    // matches that.
    int center = static_cast<int>(
        std::nearbyint(static_cast<double>(l2) / l1 * i));
    int start = std::max(center - band_width, 0);
    int end = std::min(center + band_width, l2 - 1);
    dp.push_row(start, end);
    for (int j = start; j < end; ++j) {
      int d = dp.get(i - 1, j - 1) +
              score_fn(seq1[py_index(i - 1, l1)], seq2[py_index(j - 1, l2)],
                       match, mismatch);
      int u = dp.get(i - 1, j) + gap_cost;
      int l = dp.get(i, j - 1) + gap_cost;
      dp.set(i, j, std::max(d, std::max(u, l)));
    }
  }
  std::string a1, a2;
  traceback(seq1, l1, seq2, l2,
            [&](int i, int j) { return dp.get(i, j); },
            match, mismatch, gap_cost, a1, a2);
  std::memcpy(out1, a1.data(), a1.size());
  out1[a1.size()] = '\0';
  std::memcpy(out2, a2.data(), a2.size());
  out2[a2.size()] = '\0';
  return static_cast<int>(a1.size());
}

}  // extern "C"

extern "C" {

// Fitting ("glocal") alignment: the whole query aligns inside the reference
// window; leading/trailing reference overhang is free. Used by the accuracy
// benchmark's built-in aligner (the reference delegates to minimap2, which
// is local — this is the analogous tool, written with clean semantics:
// single-branch traceback, no band).
int nw_fit_align(const char* query, int lq, const char* ref, int lr,
                 int match, int mismatch, int gap_cost,
                 char* out_q, char* out_r) {
  std::vector<int> dp(static_cast<size_t>(lq + 1) * (lr + 1), 0);
  std::vector<signed char> ptr(static_cast<size_t>(lq + 1) * (lr + 1), 0);
  auto at = [&](int i, int j) -> int& {
    return dp[static_cast<size_t>(i) * (lr + 1) + j];
  };
  auto pt = [&](int i, int j) -> signed char& {
    return ptr[static_cast<size_t>(i) * (lr + 1) + j];
  };
  for (int i = 0; i <= lq; ++i) { at(i, 0) = gap_cost * i; pt(i, 0) = 1; }
  for (int j = 0; j <= lr; ++j) { at(0, j) = 0; pt(0, j) = 2; }  // free ref start
  for (int i = 1; i <= lq; ++i) {
    for (int j = 1; j <= lr; ++j) {
      int d = at(i - 1, j - 1) + score_fn(query[i - 1], ref[j - 1], match, mismatch);
      int u = at(i - 1, j) + gap_cost;
      int l = at(i, j - 1) + gap_cost;
      int best = d; signed char p = 0;
      if (u > best) { best = u; p = 1; }
      if (l > best) { best = l; p = 2; }
      at(i, j) = best;
      pt(i, j) = p;
    }
  }
  // free ref end: start traceback from the best cell in the last query row
  int j_best = 0;
  for (int j = 1; j <= lr; ++j)
    if (at(lq, j) > at(lq, j_best)) j_best = j;

  std::string a_q, a_r;
  int i = lq, j = j_best;
  while (i > 0 || j > 0) {
    if (i == 0) break;  // remaining ref prefix is free overhang
    signed char p = pt(i, j);
    if (p == 0 && j > 0) {
      --i; --j;
      a_q += query[i];
      a_r += ref[j];
    } else if (p == 1 || j == 0) {
      --i;
      a_q += query[i];
      a_r += '-';
    } else {
      --j;
      a_q += '-';
      a_r += ref[j];
    }
  }
  std::reverse(a_q.begin(), a_q.end());
  std::reverse(a_r.begin(), a_r.end());
  std::memcpy(out_q, a_q.data(), a_q.size());
  out_q[a_q.size()] = '\0';
  std::memcpy(out_r, a_r.data(), a_r.size());
  out_r[a_r.size()] = '\0';
  return static_cast<int>(a_q.size());
}

}  // extern "C"
