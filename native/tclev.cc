// Native WER matchers: Levenshtein + time-constrained Levenshtein.
//
// TPU-native replacement for the compiled matchers the reference obtains
// through the meeteval dependency (/root/reference/src/utils/wer.py:30-106).
// The time-constrained variant implements tcpWER's core: a word match or
// substitution is only permitted when the hypothesis word's time interval,
// extended by +-collar, overlaps the reference word's interval.
//
// Exposed as extern "C" for ctypes. All arrays are dense int32/float64.

#include <algorithm>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr int64_t kInf = std::numeric_limits<int64_t>::max() / 4;

struct Cell {
  int64_t cost;
  int32_t ins, del, sub;
};

inline bool better(const Cell& a, const Cell& b) { return a.cost < b.cost; }

}  // namespace

extern "C" {

// Plain word-level Levenshtein with error counts.
// Returns total errors; fills counts[3] = {insertions, deletions, substitutions}.
int64_t levenshtein(const int32_t* a, int64_t n, const int32_t* b, int64_t m,
                    int32_t* counts) {
  // DP over two rows of Cells; a = reference, b = hypothesis.
  std::vector<Cell> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = {j, (int32_t)j, 0, 0};
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = {i, 0, (int32_t)i, 0};
    for (int64_t j = 1; j <= m; ++j) {
      Cell best = {prev[j].cost + 1, prev[j].ins, prev[j].del + 1, prev[j].sub};
      Cell ins = {cur[j - 1].cost + 1, cur[j - 1].ins + 1, cur[j - 1].del,
                  cur[j - 1].sub};
      if (better(ins, best)) best = ins;
      const bool match = a[i - 1] == b[j - 1];
      Cell diag = {prev[j - 1].cost + (match ? 0 : 1), prev[j - 1].ins,
                   prev[j - 1].del, prev[j - 1].sub + (match ? 0 : 1)};
      if (diag.cost < best.cost ||
          (diag.cost == best.cost && match))  // prefer match on ties
        best = diag;
      cur[j] = best;
    }
    std::swap(prev, cur);
  }
  counts[0] = prev[m].ins;
  counts[1] = prev[m].del;
  counts[2] = prev[m].sub;
  return prev[m].cost;
}

// Time-constrained Levenshtein.
//  a: reference words with intervals [a_begin, a_end]
//  b: hypothesis words with intervals [b_begin, b_end] (points: begin==end)
//  collar extends the HYPOTHESIS interval on both sides.
// Match/substitution allowed iff extended-hyp and ref intervals overlap.
int64_t time_constrained_levenshtein(
    const int32_t* a, const double* a_begin, const double* a_end, int64_t n,
    const int32_t* b, const double* b_begin, const double* b_end, int64_t m,
    double collar, int32_t* counts) {
  std::vector<Cell> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = {j, (int32_t)j, 0, 0};
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = {i, 0, (int32_t)i, 0};
    const double rb = a_begin[i - 1], re = a_end[i - 1];
    for (int64_t j = 1; j <= m; ++j) {
      Cell best = {prev[j].cost + 1, prev[j].ins, prev[j].del + 1, prev[j].sub};
      Cell ins = {cur[j - 1].cost + 1, cur[j - 1].ins + 1, cur[j - 1].del,
                  cur[j - 1].sub};
      if (better(ins, best)) best = ins;
      const double hb = b_begin[j - 1] - collar, he = b_end[j - 1] + collar;
      const bool allowed = (hb <= re) && (he >= rb);
      if (allowed) {
        const bool match = a[i - 1] == b[j - 1];
        Cell diag = {prev[j - 1].cost + (match ? 0 : 1), prev[j - 1].ins,
                     prev[j - 1].del, prev[j - 1].sub + (match ? 0 : 1)};
        if (diag.cost < best.cost || (diag.cost == best.cost && match))
          best = diag;
      }
      cur[j] = best;
    }
    std::swap(prev, cur);
  }
  counts[0] = prev[m].ins;
  counts[1] = prev[m].del;
  counts[2] = prev[m].sub;
  return prev[m].cost;
}

// Batched pairwise distance matrix for assignment problems:
// for each (ref stream r, hyp stream h) compute the (time-constrained)
// Levenshtein distance. Streams are concatenated into flat arrays with
// offsets (CSR-style). out is (n_ref x n_hyp) int64.
void pairwise_tclev(const int32_t* ref_words, const double* ref_begin,
                    const double* ref_end, const int64_t* ref_offsets,
                    int64_t n_ref, const int32_t* hyp_words,
                    const double* hyp_begin, const double* hyp_end,
                    const int64_t* hyp_offsets, int64_t n_hyp, double collar,
                    int64_t* out) {
  int32_t counts[3];
#pragma omp parallel for collapse(2) private(counts) schedule(dynamic)
  for (int64_t r = 0; r < n_ref; ++r) {
    for (int64_t h = 0; h < n_hyp; ++h) {
      const int64_t rs = ref_offsets[r], rn = ref_offsets[r + 1] - rs;
      const int64_t hs = hyp_offsets[h], hn = hyp_offsets[h + 1] - hs;
      out[r * n_hyp + h] = time_constrained_levenshtein(
          ref_words + rs, ref_begin + rs, ref_end + rs, rn, hyp_words + hs,
          hyp_begin + hs, hyp_end + hs, hn, collar, counts);
    }
  }
}

}  // extern "C"
