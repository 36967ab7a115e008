// Host-side setup accelerators (C++17, built via tpufem.native at import).
//
// The reference delegates its heavy host-side setup (mesh topology
// derivation, matrix sparsity construction, graph partitioning) to native
// C/C++ libraries (DOLFINx, PT-SCOTCH, PETSc).  tpufem's equivalents are
// sort/unique passes over 64-bit entity keys; this module provides those
// primitives natively because the deployment host exposes a single vCPU
// and numpy's comparison sorts dominate unstructured-path setup.
//
// Exposed (extern "C", ctypes-friendly):
//   radix_argsort_u64(keys, n, perm_out)     -- LSD radix argsort
//   unique_inverse_u64(keys, n, uniq_out, inv_out) -> n_unique
//       (uniq_out sized n, inv_out sized n; keys need not be sorted)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

void radix_argsort_u64(const uint64_t* keys, int64_t n, int64_t* perm) {
  std::vector<int64_t> tmp(static_cast<size_t>(n));
  int64_t* src = perm;
  int64_t* dst = tmp.data();
  for (int64_t i = 0; i < n; ++i) src[i] = i;

  // find highest nonzero byte to skip empty passes
  uint64_t all = 0;
  for (int64_t i = 0; i < n; ++i) all |= keys[i];
  int max_byte = 0;
  while ((all >> (8 * max_byte)) > 0xFFu && max_byte < 7) ++max_byte;

  size_t count[256];
  for (int b = 0; b <= max_byte; ++b) {
    std::memset(count, 0, sizeof(count));
    const int shift = 8 * b;
    for (int64_t i = 0; i < n; ++i)
      ++count[(keys[src[i]] >> shift) & 0xFFu];
    size_t pos = 0;
    size_t start[256];
    for (int v = 0; v < 256; ++v) { start[v] = pos; pos += count[v]; }
    for (int64_t i = 0; i < n; ++i)
      dst[start[(keys[src[i]] >> shift) & 0xFFu]++] = src[i];
    std::swap(src, dst);
  }
  if (src != perm) std::memcpy(perm, src, sizeof(int64_t) * n);
}

int64_t unique_inverse_u64(const uint64_t* keys, int64_t n,
                           uint64_t* uniq, int64_t* inv) {
  if (n == 0) return 0;
  std::vector<int64_t> perm(static_cast<size_t>(n));
  radix_argsort_u64(keys, n, perm.data());
  int64_t nu = 0;
  uint64_t prev = keys[perm[0]];
  uniq[0] = prev;
  inv[perm[0]] = 0;
  for (int64_t i = 1; i < n; ++i) {
    const uint64_t k = keys[perm[i]];
    if (k != prev) {
      prev = k;
      uniq[++nu] = k;
    }
    inv[perm[i]] = nu;
  }
  return nu + 1;
}

}  // extern "C"
