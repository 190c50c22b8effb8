// Native exact-attention oracle (C++, OpenMP).
//
// Native counterpart of the reference's CPU oracle
// (ref: src/util/naive_attention.h:7-161 and
// src/00_naive_attention/main.cpp:8-38): exact softmax attention forward
// emitting the per-row log-sum-exp L[i] = m + log(sum) (ref:
// naive_attention.h:41-42) and the full-materialisation backward
// (dV = P^T dO, dP = dO V^T, dS = P (dP - rowsum(P*dP)), dQ = dS K s,
// dK = dS^T Q s — ref: naive_attention.h:113-155).
//
// Differences from the reference, on purpose:
//  * row-streaming instead of materialising the full N^2 score matrix —
//    O(Nk) scratch per thread, so 1M-token rows fit in cache-friendly
//    passes (the reference mallocs N*N floats);
//  * OpenMP over query rows (the reference is single-threaded);
//  * optional causal masking with a kv_offset for sequence-sharded
//    callers (the reference has no masking, SURVEY.md §2.3);
//  * batch*heads leading dimension (the reference is single-head [N,d]).
//
// Exposed with a plain C ABI; loaded via ctypes by
// cuda_flashattention_tpu/runtime/native.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// q,k,v: [bh, n, d] row-major fp32. o: [bh, nq, d]. lse: [bh, nq].
void cfa_naive_forward(const float* q, const float* k, const float* v,
                       float* o, float* lse, int64_t bh, int64_t nq,
                       int64_t nk, int64_t d, float scale, int causal,
                       int64_t kv_offset) {
#pragma omp parallel
  {
    std::vector<float> p(nk);
#pragma omp for collapse(2) schedule(static)
    for (int64_t b = 0; b < bh; ++b) {
      for (int64_t i = 0; i < nq; ++i) {
        const float* qi = q + (b * nq + i) * d;
        const float* kb = k + b * nk * d;
        const float* vb = v + b * nk * d;
        const int64_t lim =
            causal ? (i + kv_offset + 1 < nk ? i + kv_offset + 1 : nk) : nk;
        // pass 1: scores + running max (ref computes max in the same
        // sweep, naive_attention.h:20-33)
        float m = -INFINITY;
        for (int64_t j = 0; j < lim; ++j) {
          const float* kj = kb + j * d;
          float s = 0.f;
          for (int64_t t = 0; t < d; ++t) s += qi[t] * kj[t];
          s *= scale;
          p[j] = s;
          if (s > m) m = s;
        }
        float* oi = o + (b * nq + i) * d;
        if (lim <= 0 || !std::isfinite(m)) {  // fully-masked row
          std::memset(oi, 0, sizeof(float) * d);
          lse[b * nq + i] = -INFINITY;
          continue;
        }
        // pass 2: exp + sum (ref: naive_attention.h:35-39)
        float l = 0.f;
        for (int64_t j = 0; j < lim; ++j) {
          p[j] = std::exp(p[j] - m);
          l += p[j];
        }
        // pass 3: O = P V / l (ref: naive_attention.h:45-58)
        std::memset(oi, 0, sizeof(float) * d);
        for (int64_t j = 0; j < lim; ++j) {
          const float w = p[j] / l;
          const float* vj = vb + j * d;
          for (int64_t t = 0; t < d; ++t) oi[t] += w * vj[t];
        }
        lse[b * nq + i] = m + std::log(l);  // ref: naive_attention.h:41-42
      }
    }
  }
}

// Gradients; all buffers fp32, layouts as in cfa_naive_forward.
// dq: [bh,nq,d], dk/dv: [bh,nk,d] (zeroed here).
void cfa_naive_backward(const float* q, const float* k, const float* v,
                        const float* dout, float* dq, float* dk, float* dv,
                        int64_t bh, int64_t nq, int64_t nk, int64_t d,
                        float scale, int causal, int64_t kv_offset) {
  std::memset(dk, 0, sizeof(float) * bh * nk * d);
  std::memset(dv, 0, sizeof(float) * bh * nk * d);
#pragma omp parallel
  {
    std::vector<float> p(nk), dp(nk);
    // batch-level parallelism only: dK/dV accumulate across query rows of
    // the same (batch,head), so rows of one b must stay on one thread
#pragma omp for schedule(static)
    for (int64_t b = 0; b < bh; ++b) {
      const float* kb = k + b * nk * d;
      const float* vb = v + b * nk * d;
      float* dkb = dk + b * nk * d;
      float* dvb = dv + b * nk * d;
      for (int64_t i = 0; i < nq; ++i) {
        const float* qi = q + (b * nq + i) * d;
        const float* doi = dout + (b * nq + i) * d;
        const int64_t lim =
            causal ? (i + kv_offset + 1 < nk ? i + kv_offset + 1 : nk) : nk;
        if (lim <= 0) {
          std::memset(dq + (b * nq + i) * d, 0, sizeof(float) * d);
          continue;
        }
        // softmax row (recomputed, as the flash backward does from LSE;
        // the reference materialises P instead, naive_attention.h:96-110)
        float m = -INFINITY;
        for (int64_t j = 0; j < lim; ++j) {
          const float* kj = kb + j * d;
          float s = 0.f;
          for (int64_t t = 0; t < d; ++t) s += qi[t] * kj[t];
          p[j] = s * scale;
          if (p[j] > m) m = p[j];
        }
        float l = 0.f;
        for (int64_t j = 0; j < lim; ++j) {
          p[j] = std::exp(p[j] - m);
          l += p[j];
        }
        for (int64_t j = 0; j < lim; ++j) p[j] /= l;
        // dP = dO V^T (ref: :121-127); delta = rowsum(P*dP) (:130-140)
        float delta = 0.f;
        for (int64_t j = 0; j < lim; ++j) {
          const float* vj = vb + j * d;
          float acc = 0.f;
          for (int64_t t = 0; t < d; ++t) acc += doi[t] * vj[t];
          dp[j] = acc;
          delta += p[j] * acc;
        }
        // dV += P^T dO (:113-119); dS = P(dP-delta)s; dQ = dS K (:142-147);
        // dK += dS^T Q (:149-155)
        float* dqi = dq + (b * nq + i) * d;
        std::memset(dqi, 0, sizeof(float) * d);
        for (int64_t j = 0; j < lim; ++j) {
          const float ds = p[j] * (dp[j] - delta) * scale;
          const float* kj = kb + j * d;
          float* dkj = dkb + j * d;
          float* dvj = dvb + j * d;
          for (int64_t t = 0; t < d; ++t) {
            dqi[t] += ds * kj[t];
            dkj[t] += ds * qi[t];
            dvj[t] += p[j] * doi[t];
          }
        }
      }
    }
  }
}

int cfa_num_threads(void) {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
