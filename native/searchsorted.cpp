// Batched row-wise binary search — C++ reference oracle.
//
// Capability parity with the reference's native searchsorted extension
// (DS_NeRF/torchsearchsorted/src/cpu/searchsorted_cpu_wrapper.cpp:1-126 and the
// CUDA kernel at src/cuda/searchsorted_cuda_kernel.cu:1-143): for each query
// v[row, j], find the insertion index into the sorted row a[row, :]:
//   side=left :  count of a[row, k] <  v
//   side=right:  count of a[row, k] <= v
// Row broadcasting matches the reference: if one operand has a single row it is
// shared across the other's rows.
//
// On TPU this capability is served by the fused Pallas sampler
// (mvip_tpu/ops/pallas_sampling.py); this oracle pins its semantics in tests,
// mirroring the reference's numpy-oracle test pattern
// (torchsearchsorted/test/test_searchsorted.py:34-44).

#include <cstdint>

extern "C" {

// a: [ba, n_a] sorted rows; v: [bv, n_v] queries; out: [max(ba,bv), n_v] int64.
void searchsorted_f32(const float* a, const float* v, int64_t* out,
                      int64_t ba, int64_t n_a, int64_t bv, int64_t n_v,
                      int32_t right) {
  const int64_t rows = ba > bv ? ba : bv;
  for (int64_t r = 0; r < rows; ++r) {
    const float* arow = a + (ba == 1 ? 0 : r) * n_a;
    const float* vrow = v + (bv == 1 ? 0 : r) * n_v;
    int64_t* orow = out + r * n_v;
    for (int64_t j = 0; j < n_v; ++j) {
      const float q = vrow[j];
      int64_t lo = 0, hi = n_a;  // insertion point in [0, n_a]
      while (lo < hi) {
        const int64_t mid = lo + ((hi - lo) >> 1);
        const bool go_right = right ? (arow[mid] <= q) : (arow[mid] < q);
        if (go_right) {
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      orow[j] = lo;
    }
  }
}

void searchsorted_f64(const double* a, const double* v, int64_t* out,
                      int64_t ba, int64_t n_a, int64_t bv, int64_t n_v,
                      int32_t right) {
  const int64_t rows = ba > bv ? ba : bv;
  for (int64_t r = 0; r < rows; ++r) {
    const double* arow = a + (ba == 1 ? 0 : r) * n_a;
    const double* vrow = v + (bv == 1 ? 0 : r) * n_v;
    int64_t* orow = out + r * n_v;
    for (int64_t j = 0; j < n_v; ++j) {
      const double q = vrow[j];
      int64_t lo = 0, hi = n_a;
      while (lo < hi) {
        const int64_t mid = lo + ((hi - lo) >> 1);
        const bool go_right = right ? (arow[mid] <= q) : (arow[mid] < q);
        if (go_right) {
          lo = mid + 1;
        } else {
          hi = mid;
        }
      }
      orow[j] = lo;
    }
  }
}

}  // extern "C"
