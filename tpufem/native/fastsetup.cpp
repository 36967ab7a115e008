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
//   aggregate_vmb(indptr, indices, vals, n, order, agg_out) -> n_agg
//       greedy Vanek-Mandel-Brezina aggregation over a CSR strength
//       graph (the serial equivalent of PyAMG standard_aggregation /
//       PETSc GAMG's MIS aggregation; reference solver: GAMG,
//       /root/reference/README.md:63-82)

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

// COO triplets -> deduplicated CSR in one native pass: radix argsort by
// key = row * n + col, then a single sweep summing duplicates, dropping
// exact zeros (scipy sum_duplicates + eliminate_zeros semantics) and
// filling indptr.  Returns the number of stored entries.  out_cols /
// out_vals must be sized nnz; indptr sized n + 1.
int64_t coo_to_csr_dedup(const int64_t* rows, const int64_t* cols,
                         const double* vals, int64_t nnz, int64_t n,
                         int64_t* indptr, int32_t* out_cols,
                         double* out_vals) {
  std::vector<uint64_t> key(static_cast<size_t>(nnz));
  const uint64_t un = static_cast<uint64_t>(n);
  for (int64_t i = 0; i < nnz; ++i)
    key[i] = static_cast<uint64_t>(rows[i]) * un +
             static_cast<uint64_t>(cols[i]);
  std::vector<int64_t> perm(static_cast<size_t>(nnz));
  radix_argsort_u64(key.data(), nnz, perm.data());

  for (int64_t r = 0; r <= n; ++r) indptr[r] = 0;
  int64_t out = 0;
  int64_t i = 0;
  while (i < nnz) {
    const uint64_t k = key[perm[i]];
    double acc = vals[perm[i]];
    ++i;
    while (i < nnz && key[perm[i]] == k) acc += vals[perm[i++]];
    if (acc != 0.0) {
      out_cols[out] = static_cast<int32_t>(k % un);
      out_vals[out] = acc;
      ++indptr[(k / un) + 1];
      ++out;
    }
  }
  for (int64_t r = 0; r < n; ++r) indptr[r + 1] += indptr[r];
  return out;
}

// Greedy VMB aggregation over the CSR strength graph (no self loops).
//
// Phase 1 (roots): visiting nodes in `order`, a node whose strong
// neighborhood is entirely unaggregated becomes a root and absorbs it.
// Phase 2 (attach): each leftover joins the phase-1 aggregate of its
// strongest aggregated neighbor (decisions read the phase-1 state only,
// so attachment does not cascade).  Phase 3 (sweep): remaining nodes
// root new aggregates from whatever unaggregated neighbors are left.
// `vals` may be null (first aggregated neighbor wins in phase 2).
// Returns the number of aggregates; agg[i] in [0, n_agg).
int64_t aggregate_vmb(const int64_t* indptr, const int64_t* indices,
                      const double* vals, int64_t n,
                      const int64_t* order, int64_t* agg) {
  for (int64_t i = 0; i < n; ++i) agg[i] = -1;
  int64_t nagg = 0;

  // phase 1
  for (int64_t k = 0; k < n; ++k) {
    const int64_t i = order ? order[k] : k;
    if (agg[i] != -1) continue;
    bool free_nb = true;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e)
      if (agg[indices[e]] != -1) { free_nb = false; break; }
    if (!free_nb) continue;
    agg[i] = nagg;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e)
      agg[indices[e]] = nagg;
    ++nagg;
  }

  // phase 2: against the phase-1 state (mark joiners with ~a so later
  // rows see them as still-unaggregated)
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    int64_t best = -1;
    double best_v = -1.0;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e) {
      const int64_t a = agg[indices[e]];
      if (a < 0) continue;  // unaggregated or phase-2 joiner
      const double v = vals ? vals[e] : 1.0;
      if (v > best_v) { best_v = v; best = a; }
    }
    // ~(best+1) <= -2: invisible this phase, distinct from the -1
    // unaggregated marker even for best == 0
    if (best != -1) agg[i] = ~(best + 1);
  }
  for (int64_t i = 0; i < n; ++i)
    if (agg[i] < -1) agg[i] = ~agg[i] - 1;

  // phase 3
  for (int64_t k = 0; k < n; ++k) {
    const int64_t i = order ? order[k] : k;
    if (agg[i] != -1) continue;
    agg[i] = nagg;
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e)
      if (agg[indices[e]] == -1) agg[indices[e]] = nagg;
    ++nagg;
  }
  return nagg;
}

}  // extern "C"
