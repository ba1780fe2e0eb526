// CTC prefix beam search + Needleman-Wunsch alignment score.
//
// Native replacements for the reference's pure-Python hot loops
// (/root/reference/cpc/criterion/seq_alignment.py:11-61 and :89-113), which
// dominate PER evaluation time.  Semantics match the reference exactly
// (including blank handling and the repeated-label merge rule); validated by
// tests against the python golden implementation.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Probs {
  double pb = 0.0;   // prob ending in blank
  double pnb = 0.0;  // prob ending in non-blank
};

using PrefixMap = std::unordered_map<std::string, Probs>;

inline std::string extend(const std::string& b, int c) {
  std::string out = b;
  out.append((const char*)&c, sizeof(int));
  return out;
}

inline int last_label(const std::string& b) {
  int c;
  memcpy(&c, b.data() + b.size() - sizeof(int), sizeof(int));
  return c;
}

}  // namespace

extern "C" {

// preds: (T, P) posteriors.  Outputs up to n_keep beams:
//   out_labels (n_keep, T) int32, out_sizes (n_keep,), out_scores (n_keep,).
// Returns the number of beams written, best first.
int cpc_beam_search(const float* preds, int T, int P, int n_keep,
                    int blank_label, int32_t* out_labels, int32_t* out_sizes,
                    double* out_scores) {
  std::vector<std::string> beams = {std::string()};
  PrefixMap prev;
  prev[std::string()] = {1.0, 0.0};

  std::vector<std::pair<double, std::string>> all_preds = {{1.0, {}}};

  for (int t = 0; t < T; t++) {
    const float* row = preds + (int64_t)t * P;
    PrefixMap cur;
    cur.reserve(beams.size() * (P + 1));
    for (const auto& b : beams) {
      const Probs& pp = prev[b];
      Probs& pc = cur[b];
      if (!b.empty()) pc.pnb += pp.pnb * row[last_label(b)];
      pc.pb = (pp.pnb + pp.pb) * row[blank_label];
      for (int c = 0; c < P; c++) {
        if (c == blank_label) continue;
        Probs& pe = cur[extend(b, c)];
        if (!b.empty() && last_label(b) == c)
          pe.pnb += pp.pb * row[c];
        else
          pe.pnb += (pp.pb + pp.pnb) * row[c];
      }
    }
    all_preds.clear();
    all_preds.reserve(cur.size());
    for (const auto& kv : cur)
      all_preds.emplace_back(kv.second.pb + kv.second.pnb, kv.first);
    int keep = std::min((size_t)n_keep, all_preds.size());
    std::partial_sort(all_preds.begin(), all_preds.begin() + keep,
                      all_preds.end(),
                      [](const auto& a, const auto& b) {
                        if (a.first != b.first) return a.first > b.first;
                        return a.second > b.second;
                      });
    all_preds.resize(keep);
    beams.clear();
    for (const auto& sp : all_preds) beams.push_back(sp.second);
    prev.clear();
    for (const auto& b : beams) prev[b] = cur[b];
  }

  int n = (int)all_preds.size();
  for (int i = 0; i < n; i++) {
    const std::string& b = all_preds[i].second;
    int len = (int)(b.size() / sizeof(int));
    out_scores[i] = all_preds[i].first;
    out_sizes[i] = len;
    memcpy(out_labels + (int64_t)i * T, b.data(), b.size());
  }
  return n;
}

// Normalized NW score, d=m=-1, r=0 (seq_alignment.py:89-118).
double cpc_needleman_wunsch(const int32_t* seq1, int n1, const int32_t* seq2,
                            int n2) {
  const double d = -1.0, m = -1.0, r = 0.0;
  std::vector<double> prev(n2 + 1), cur(n2 + 1);
  for (int j = 0; j <= n2; j++) prev[j] = j * d;
  for (int i = 0; i < n1; i++) {
    cur[0] = (i + 1) * d;
    for (int j = 0; j < n2; j++) {
      double match = seq1[i] == seq2[j] ? r : m;
      double v = prev[j] + match;
      if (prev[j + 1] + d > v) v = prev[j + 1] + d;
      if (cur[j] + d > v) v = cur[j] + d;
      cur[j + 1] = v;
    }
    std::swap(prev, cur);
  }
  return -prev[n2] / (double)n1;
}

}  // extern "C"
