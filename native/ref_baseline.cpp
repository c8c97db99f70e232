// Benchmark driver for the REFERENCE implementation's own C++ decoding core
// (jordisr/poreover BeamSearch.h, included read-only from /root/reference).
// This measures the true single-core CPU baseline the BASELINE.md protocol
// names ("single-core CPU PoreOver") — the Cython layer it normally sits
// under only marshals numpy pointers (decoding_cpp.pyx:33-45), so timing
// the header entry point is timing the reference.
//
// Usage: ref_bench <npz-extracted-dir with y1.f64/y2.f64/env.i64 + dims>
// Reads raw binary dumps written by scratch/ref_bench.py.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "decoding/BeamSearch.h"

static double* read_f64(const char* path, size_t n) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  double* buf = new double[n];
  if (fread(buf, sizeof(double), n, f) != n) { perror("fread"); exit(1); }
  fclose(f);
  return buf;
}

static long long* read_i64(const char* path, size_t n) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  long long* buf = new long long[n];
  if (fread(buf, sizeof(long long), n, f) != n) { perror("fread"); exit(1); }
  fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s dir [n_pairs]\n", argv[0]); return 1; }
  std::string dir = argv[1];
  int n_pairs = argc > 2 ? atoi(argv[2]) : 5;
  const int A = 5;
  double total_s = 0.0;
  for (int p = 0; p < n_pairs; ++p) {
    char path[512];
    snprintf(path, sizeof path, "%s/dims_%d.i64", dir.c_str(), p);
    long long* dims = read_i64(path, 2);
    int U = (int)dims[0], V = (int)dims[1];
    snprintf(path, sizeof path, "%s/y1_%d.f64", dir.c_str(), p);
    double* y1f = read_f64(path, (size_t)U * A);
    snprintf(path, sizeof path, "%s/y2_%d.f64", dir.c_str(), p);
    double* y2f = read_f64(path, (size_t)V * A);
    snprintf(path, sizeof path, "%s/env_%d.i64", dir.c_str(), p);
    long long* envf = read_i64(path, (size_t)U * 2);

    // double** row-pointer marshalling, exactly as decoding_cpp.pyx:33-45
    std::vector<double*> y1(U), y2(V);
    for (int i = 0; i < U; ++i) y1[i] = y1f + (size_t)i * A;
    for (int i = 0; i < V; ++i) y2[i] = y2f + (size_t)i * A;
    std::vector<int> envbuf(2 * (size_t)U);
    std::vector<int*> env(U);
    for (int i = 0; i < U; ++i) {
      envbuf[2 * i] = (int)envf[2 * i];
      envbuf[2 * i + 1] = (int)envf[2 * i + 1];
      env[i] = &envbuf[2 * i];
    }

    auto t0 = std::chrono::steady_clock::now();
    std::string seq = beam_search(y1.data(), y2.data(), U, V, "ACGT",
                                  env.data(), 5, "ctc", "row_col");
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    total_s += dt;
    printf("pair%d: U=%d V=%d len=%zu %.2fs\n", p, U, V, seq.size(), dt);
    // first 60 chars for cross-checking against our engines
    printf("  seq[:60]=%.60s\n", seq.c_str());
    delete[] dims; delete[] y1f; delete[] y2f; delete[] envf;
  }
  printf("TOTAL %.2fs for %d pairs (%.3f pairs/s single-core)\n", total_s,
         n_pairs, n_pairs / total_s);
  return 0;
}
