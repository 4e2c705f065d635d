// Native host runtime for acc_genomics_tpu.
//
// The reference implements its host runtime in C++ (packers, schedulers,
// OpenCL glue); the TPU framework keeps the device path in XLA/Pallas and
// implements the host hot loops here:
//
//   * sais_build       — SA-IS suffix array construction (linear time),
//                        replacing the O(n log^2 n) NumPy prefix doubling
//                        for genome-scale FM-index builds
//                        (role of the reference's external libbwa index load,
//                        smem/main.cpp bwa_idx_load)
//   * cigar_walk_batch — batch backtrack walk over device-produced btrack
//                        matrices -> CIGAR runs (role of
//                        calculateCigarOneBatch, htc-sw/host/FalconSW_AVX.cpp)
//   * pairhmm_pack     — fill the dense time-major transition/emission
//                        coefficient batch from raw reads
//                        (role of pack_fpga_input,
//                        pairhmm/interface/PairHMMFpgaInterface.cpp)
//
// Exposed with a plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#if defined(__x86_64__) || defined(__i386__)
#include <immintrin.h>
#endif
#include <cstdlib>
#include <cstring>
#include <climits>
#include <vector>

// ---------------------------------------------------------------------------
// SA-IS suffix array construction (alphabet size K, text values in [0, K)).
// sa must hold n entries. Internal sentinel handling: we append a virtual
// smallest symbol by treating index n as "$" (rank -1).
// ---------------------------------------------------------------------------

namespace {

// generic SA-IS over int sequence s of length n with alphabet [0, K)
// writes suffix order (of the n real suffixes) into sa.
// Index type I is int32_t when the text fits (halves memory traffic —
// SA construction is bandwidth-bound), int64_t otherwise.
template <typename I>
void sais_core(const I* s, I n, I K, I* sa) {
  if (n == 0) return;
  if (n == 1) { sa[0] = 0; return; }

  std::vector<bool> is_s(n + 1);
  is_s[n] = true;              // sentinel is S-type
  is_s[n - 1] = false;         // last real char is L-type (> sentinel)
  for (int64_t i = n - 2; i >= 0; --i)
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);

  auto is_lms = [&](int64_t i) {
    return i > 0 && is_s[i] && !is_s[i - 1];
  };

  std::vector<I> bkt(K + 1);
  auto bucket_ends = [&](bool ends) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (I i = 0; i < n; ++i) bkt[s[i] + 1]++;
    for (I i = 1; i <= K; ++i) bkt[i] += bkt[i - 1];
    // bkt[c] = start of bucket c; for ends we need end positions
    if (ends) {
      // shift: end of bucket c = bkt[c+1] ... recompute cumulative ends
      std::vector<I> cnt(K, 0);
      for (I i = 0; i < n; ++i) cnt[s[i]]++;
      I acc = 0;
      for (I c = 0; c < K; ++c) { acc += cnt[c]; bkt[c] = acc; }
    }
  };

  const I EMPTY = -1;
  std::vector<I> SA(n + 1, EMPTY);

  auto induce = [&](const std::vector<I>& lms) {
    std::fill(SA.begin(), SA.end(), EMPTY);
    SA[0] = n;  // sentinel first
    bucket_ends(true);
    for (int64_t i = (int64_t)lms.size() - 1; i >= 0; --i) {
      I p = lms[i];
      if (p < n) SA[--bkt[s[p]] + 1] = p;  // +1 offset: SA[0] is sentinel
    }
    // induce L from left
    bucket_ends(false);
    std::vector<I> heads(bkt.begin(), bkt.end());
    for (I i = 0; i <= n; ++i) {
      I j = SA[i];
      if (j == EMPTY || j <= 0) continue;
      I p = j - 1;
      if (!is_s[p]) SA[heads[s[p]]++ + 1] = p;
    }
    // induce S from right
    bucket_ends(true);
    for (I i = n; i >= 0; --i) {
      I j = SA[i];
      if (j == EMPTY || j <= 0) continue;
      I p = j - 1;
      if (is_s[p]) SA[--bkt[s[p]] + 1] = p;
    }
  };

  // collect LMS positions in text order
  std::vector<I> lms;
  for (I i = 1; i <= n; ++i)
    if (is_lms(i)) lms.push_back(i);

  induce(lms);

  // name LMS substrings in SA order
  std::vector<I> name(n + 1, EMPTY);
  I n_names = 0;
  I prev = EMPTY;
  for (I i = 0; i <= n; ++i) {
    I p = SA[i];
    if (p == EMPTY || !(p == n || is_lms(p))) continue;
    if (prev == EMPTY) {
      name[p] = n_names++;
    } else {
      // compare LMS substrings at prev and p
      bool same = true;
      for (I d = 0;; ++d) {
        I a = prev + d, b = p + d;
        bool ea = a == n, eb = b == n;
        if (ea || eb) { same = ea && eb; break; }
        if (s[a] != s[b] || is_s[a] != is_s[b]) { same = false; break; }
        if (d > 0 && (is_lms(a) || is_lms(b))) { same = is_lms(a) && is_lms(b); break; }
      }
      if (!same) n_names++;
      name[p] = n_names - 1;
    }
    prev = p;
  }

  // build reduced problem in text order of LMS positions
  std::vector<I> reduced;
  reduced.reserve(lms.size());
  for (I p : lms) reduced.push_back(name[p]);

  std::vector<I> lms_order(lms.size());
  if (n_names < (I)lms.size()) {
    std::vector<I> rsa(reduced.size());
    sais_core<I>(reduced.data(), (I)reduced.size(), n_names, rsa.data());
    for (size_t i = 0; i < rsa.size(); ++i) lms_order[i] = lms[rsa[i]];
  } else {
    for (size_t i = 0; i < lms.size(); ++i) lms_order[reduced[i]] = lms[i];
  }

  induce(lms_order);

  // SA[0] is the sentinel; copy the real suffix order
  for (I i = 0; i < n; ++i) sa[i] = SA[i + 1];
}

}  // namespace

extern "C" {

void sais_build(const uint8_t* text, int64_t n, int64_t* sa) {
  if (n < INT32_MAX - 2) {
    std::vector<int32_t> s(n);
    for (int64_t i = 0; i < n; ++i) s[i] = text[i];
    std::vector<int32_t> sa32(n);
    sais_core<int32_t>(s.data(), (int32_t)n, 256, sa32.data());
    for (int64_t i = 0; i < n; ++i) sa[i] = sa32[i];
  } else {
    std::vector<int64_t> s(n);
    for (int64_t i = 0; i < n; ++i) s[i] = text[i];
    sais_core<int64_t>(s.data(), n, 256, sa);
  }
}

// ---------------------------------------------------------------------------
// Batch CIGAR walk (HTC-SW backtrack).  States: 0=M 1=I 2=D 4=S.
// btrack: (B, R, C) int16 (rows 1..R, cols 1..C of the DP matrix)
// sw_lastrow: (B, C+1) int32; sw_altcol: (B, R) int32
// out_elems: (B, max_elems, 2) int32 (length, state); out_n: (B,)
// out_offset: (B,)
// ---------------------------------------------------------------------------

void cigar_walk_batch(
    const int16_t* btrack, const int32_t* sw_lastrow, const int32_t* sw_altcol,
    const int32_t* reflen, const int32_t* altlen, int32_t batch,
    int32_t rows, int32_t cols, int32_t strategy, int32_t max_elems,
    int32_t* out_elems, int32_t* out_n, int32_t* out_offset) {
  const int STRAT_SOFTCLIP = 0, STRAT_INDEL = 1, STRAT_LEADING = 2, STRAT_IGNORE = 3;
  const int SM = 0, SI = 1, SD = 2, SC = 4;
  for (int32_t b = 0; b < batch; ++b) {
    const int16_t* bt = btrack + (int64_t)b * rows * cols;
    const int32_t* lastrow = sw_lastrow + (int64_t)b * (cols + 1);
    const int32_t* altcol = sw_altcol + (int64_t)b * rows;
    int rl = reflen[b], al = altlen[b];
    if (rl <= 0 || al <= 0) {  // batch-padding lane: nothing to walk
      out_n[b] = 0;
      out_offset[b] = 0;
      continue;
    }
    int p1 = 0, p2 = al;
    long seg = 0;
    int n_el = 0;
    int32_t* el = out_elems + (int64_t)b * max_elems * 2;
    auto push = [&](long len, int state) {
      if (n_el < max_elems) { el[2 * n_el] = (int32_t)len; el[2 * n_el + 1] = state; }
      n_el++;
    };
    if (strategy == STRAT_INDEL) {
      p1 = rl; p2 = al;
    } else {
      long maxscore = INT64_MIN;
      for (int i = 1; i <= rl; ++i)
        if (altcol[i - 1] >= maxscore) { p1 = i; maxscore = altcol[i - 1]; }
      if (strategy != STRAT_LEADING) {
        for (int j = 1; j <= al; ++j) {
          long cur = lastrow[j];
          if (cur > maxscore ||
              (cur == maxscore && std::abs(rl - j) < std::abs(p1 - p2))) {
            p1 = rl; p2 = j; maxscore = cur; seg = al - j;
          }
        }
      }
    }
    if (seg > 0 && strategy == STRAT_SOFTCLIP) { push(seg, SC); seg = 0; }
    int state = SM;
    while (true) {
      int btr = bt[(int64_t)(p1 - 1) * cols + (p2 - 1)];
      int new_state, step;
      if (btr > 0) { new_state = SD; step = btr; }
      else if (btr < 0) { new_state = SI; step = -btr; }
      else { new_state = SM; step = 1; }
      if (new_state == SM) { p1--; p2--; }
      else if (new_state == SI) { p2 -= step; }
      else { p1 -= step; }
      if (new_state == state) seg += step;
      else { push(seg, state); seg = step; state = new_state; }
      if (!(p1 > 0 && p2 > 0)) break;
    }
    int offset;
    if (strategy == STRAT_SOFTCLIP) {
      push(seg, state);
      if (p2 > 0) push(p2, SC);
      offset = p1;
    } else if (strategy == STRAT_IGNORE) {
      push(seg + p2, state);
      offset = p1 - p2;
    } else {
      push(seg, state);
      if (p1 > 0) push(p1, SD);
      else if (p2 > 0) push(p2, SI);
      offset = 0;
    }
    // reverse in place
    int lim = n_el < max_elems ? n_el : max_elems;
    for (int i = 0, j = lim - 1; i < j; ++i, --j) {
      std::swap(el[2 * i], el[2 * j]);
      std::swap(el[2 * i + 1], el[2 * j + 1]);
    }
    out_n[b] = n_el;
    out_offset[b] = offset;
  }
}

// ---------------------------------------------------------------------------
// PairHMM dense batch packing (time-major (R, B) float32 outputs).
// Inputs per pair k: rs/q/i/d/c bytes at offs[k]..offs[k]+len[k), hap codes
// at hoffs[k]..; tables: ph2pr (128 floats), m2m triangular (32640 floats
// over 7-bit quals: idx = (hi*(hi+1))/2 + lo).
// Absorbing rows and HAP_PAD handled exactly like ops/pairhmm/pack.py.
// ---------------------------------------------------------------------------

void pairhmm_pack(
    const uint8_t* rs, const uint8_t* q, const uint8_t* iq, const uint8_t* dq,
    const uint8_t* cq, const int64_t* offs, const int32_t* lens,
    const uint8_t* hap, const int64_t* hoffs, const int32_t* hlens,
    int32_t batch, int32_t rows, int32_t cols,
    const float* ph2pr, const float* m2m, float initial_constant,
    float* p_mm, float* p_gapm, float* p_mx, float* p_xx, float* p_my,
    float* p_yy, float* em_match, float* em_mis, int32_t* rs_out,
    int32_t* hap_ext, float* y0) {
  const int32_t HAP_PAD = 5;
  int64_t stride = batch;
  // defaults: absorbing rows
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t b = 0; b < batch; ++b) {
      int64_t at = r * stride + b;
      p_mm[at] = 0.f; p_gapm[at] = 0.f;
      p_mx[at] = 1.f; p_xx[at] = 1.f;
      p_my[at] = 0.f; p_yy[at] = 0.f;
      em_match[at] = 0.f; em_mis[at] = 0.f;
      rs_out[at] = 0;
    }
  }
  int64_t ndiag = (int64_t)rows + cols;
#pragma omp parallel for schedule(static)
  for (int64_t d = 0; d < ndiag; ++d)
    for (int64_t b = 0; b < batch; ++b) hap_ext[d * stride + b] = HAP_PAD;

#pragma omp parallel for schedule(dynamic, 64)
  for (int32_t b = 0; b < batch; ++b) {
    int32_t len = lens[b];
    const uint8_t* prs = rs + offs[b];
    const uint8_t* pq = q + offs[b];
    const uint8_t* pi = iq + offs[b];
    const uint8_t* pd = dq + offs[b];
    const uint8_t* pc = cq + offs[b];
    for (int32_t r = 0; r < len; ++r) {
      int64_t at = (int64_t)r * stride + b;
      int qi = pi[r] & 127, qd = pd[r] & 127, qc = pc[r] & 127, qq = pq[r] & 127;
      int lo = qi < qd ? qi : qd;
      int hi = qi < qd ? qd : qi;
      p_mm[at] = m2m[(hi * (hi + 1)) / 2 + lo];
      p_gapm[at] = 1.0f - ph2pr[qc];
      p_mx[at] = ph2pr[qi];
      p_xx[at] = ph2pr[qc];
      p_my[at] = ph2pr[qd];
      p_yy[at] = ph2pr[qc];
      em_match[at] = 1.0f - ph2pr[qq];
      em_mis[at] = ph2pr[qq] / 3.0f;
      rs_out[at] = prs[r];
    }
    int32_t hl = hlens[b];
    const uint8_t* ph = hap + hoffs[b];
    for (int32_t hcol = 0; hcol < hl; ++hcol)
      hap_ext[(int64_t)hcol * stride + b] = ph[hcol];
    y0[b] = hl > 0 ? initial_constant / (float)hl : 0.f;
  }
}

}  // extern "C" (reopened below for the PairHMM forward exports)

// ---------------------------------------------------------------------------
// PairHMM forward: the native CPU compute engine — the role of the
// reference's AVX path (pairhmm/xlnx/host/avx-pairhmm-template.h via
// compute_fp_avxs/avxd) for host dispatch and fp64 underflow recompute.
// Row-major M/X/Y recurrence (GATK 3.7 semantics, baseline_impl.cpp):
// M and X rows auto-vectorize; Y is the sequential first-order IIR.
// Tables (ph2pr, triangular matchToMatch) come from the Python context
// so the numeric contract is shared with the device path.
// ---------------------------------------------------------------------------

template <typename T>
static void phmm_forward_one(
    const uint8_t* rs, const uint8_t* q, const uint8_t* iq,
    const uint8_t* dq, const uint8_t* cq, int32_t rlen,
    const uint8_t* hap, int32_t hlen,
    const T* ph2pr, const T* m2m, T initial_constant, T* out) {
  if (hlen <= 0 || rlen <= 0) {
    *out = (T)0;
    return;
  }
  std::vector<T> m_prev(hlen + 1, (T)0), x_prev(hlen + 1, (T)0);
  std::vector<T> y_prev(hlen + 1, initial_constant / (T)hlen);
  std::vector<T> m_cur(hlen + 1), x_cur(hlen + 1), y_cur(hlen + 1);
  for (int32_t r = 0; r < rlen; ++r) {
    int32_t qi = iq[r] & 127, qd = dq[r] & 127, qc = cq[r] & 127,
            qq = q[r] & 127;
    int32_t lo = qi < qd ? qi : qd, hi = qi < qd ? qd : qi;
    T pmm = m2m[((int64_t)hi * (hi + 1) >> 1) + lo];
    T pgapm = (T)1 - ph2pr[qc];
    T pmx = ph2pr[qi], pxx = ph2pr[qc], pmy = ph2pr[qd], pyy = ph2pr[qc];
    T em = (T)1 - ph2pr[qq], ex = ph2pr[qq] / (T)3;
    uint8_t rb = rs[r];
    m_cur[0] = (T)0;
    for (int32_t j = 1; j <= hlen; ++j) {
      uint8_t hb = hap[j - 1];
      T distm = (rb == hb || rb == 4 || hb == 4) ? em : ex;
      m_cur[j] =
          distm * (m_prev[j - 1] * pmm + (x_prev[j - 1] + y_prev[j - 1]) * pgapm);
    }
    for (int32_t j = 0; j <= hlen; ++j)
      x_cur[j] = m_prev[j] * pmx + x_prev[j] * pxx;
    y_cur[0] = (T)0;
    for (int32_t j = 1; j <= hlen; ++j)
      y_cur[j] = m_cur[j - 1] * pmy + y_cur[j - 1] * pyy;
    m_prev.swap(m_cur);
    x_prev.swap(x_cur);
    y_prev.swap(y_cur);
  }
  T acc = (T)0;
  for (int32_t j = 0; j <= hlen; ++j) acc += m_prev[j] + x_prev[j];
  *out = acc;
}

template <typename T>
static void phmm_forward_batch(
    const uint8_t* rs, const uint8_t* q, const uint8_t* iq,
    const uint8_t* dq, const uint8_t* cq, const int64_t* roffs,
    const int32_t* rlens, const uint8_t* hap, const int64_t* hoffs,
    const int32_t* hlens, int64_t n, const T* ph2pr, const T* m2m,
    T initial_constant, T* out) {
#pragma omp parallel
  {
#if defined(__x86_64__) || defined(__i386__)
    // FTZ + DAZ: the fp32 recurrence spends most of its range in
    // denormals otherwise (the reference sets _MM_SET_FLUSH_ZERO_MODE,
    // pairhmm/host/main.cpp:248).  Saved and restored per thread so the
    // caller's float environment is untouched.
    unsigned int saved_csr = _mm_getcsr();
    _mm_setcsr(saved_csr | 0x8040);
#endif
#pragma omp for schedule(dynamic, 8)
  for (int64_t b = 0; b < n; ++b) {
    phmm_forward_one<T>(
        rs + roffs[b], q + roffs[b], iq + roffs[b], dq + roffs[b],
        cq + roffs[b], rlens[b], hap + hoffs[b], hlens[b],
        ph2pr, m2m, initial_constant, out + b);
  }
#if defined(__x86_64__) || defined(__i386__)
    _mm_setcsr(saved_csr);
#endif
  }
}

extern "C" {

void pairhmm_forward_batch_f32(
    const uint8_t* rs, const uint8_t* q, const uint8_t* iq,
    const uint8_t* dq, const uint8_t* cq, const int64_t* roffs,
    const int32_t* rlens, const uint8_t* hap, const int64_t* hoffs,
    const int32_t* hlens, int64_t n, const float* ph2pr, const float* m2m,
    float initial_constant, float* out) {
  phmm_forward_batch<float>(rs, q, iq, dq, cq, roffs, rlens, hap, hoffs,
                            hlens, n, ph2pr, m2m, initial_constant, out);
}

void pairhmm_forward_batch_f64(
    const uint8_t* rs, const uint8_t* q, const uint8_t* iq,
    const uint8_t* dq, const uint8_t* cq, const int64_t* roffs,
    const int32_t* rlens, const uint8_t* hap, const int64_t* hoffs,
    const int32_t* hlens, int64_t n, const double* ph2pr, const double* m2m,
    double initial_constant, double* out) {
  phmm_forward_batch<double>(rs, q, iq, dq, cq, roffs, rlens, hap, hoffs,
                             hlens, n, ph2pr, m2m, initial_constant, out);
}

}  // extern "C"
