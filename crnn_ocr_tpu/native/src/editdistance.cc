// Levenshtein distance, C ABI (reference C9/C20: the reference depends on
// the C++ `editdistance` pybind package for CER/WER eval; this is our
// framework's native equivalent, loaded via ctypes).
//
// Two-row DP, O(min(na,nb)) memory.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

int64_t levenshtein_i32(const int32_t* a, int64_t na, const int32_t* b,
                        int64_t nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    const int32_t ca = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

}  // extern "C"
