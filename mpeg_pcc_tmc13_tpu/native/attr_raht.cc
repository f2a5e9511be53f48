// Native predicted-RAHT attribute engine.
//
// Bit-exact C++ mirror of the Python spec (ops/raht.py
// forward_predicted/inverse_predicted + models/attr_raht.py quant/
// RDOQ): same IEEE-double operations in the same order, so the
// emitted zrow stream is byte-identical to the numpy path and either
// side can decode the other.  Covers the common configuration
// (prediction on, no layer QP offsets, no LCP/inter, float transform);
// the Python path remains the executable spec and the fallback for
// the feature-rich configurations.
//
// Counterpart of the reference uraht_process (RAHT.cpp:977) with the
// sweep/pair redesign documented in ops/raht.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef RAHT_PROF
#include <chrono>
static double g_ph[8];
struct ProfT {
  int k;
  std::chrono::steady_clock::time_point t0;
  ProfT(int k) : k(k), t0(std::chrono::steady_clock::now()) {}
  ~ProfT() {
    g_ph[k] += std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
  }
};
#define PROF(k) ProfT _p(k)
extern "C" double* raht_prof() { return g_ph; }
#else
#define PROF(k)
#endif

// opaque coder handles + the zrow batch entry points (entropy.cc)
struct RcEncoder;
struct RcDecoder;
extern "C" void rce_zrow(RcEncoder* e, uint16_t* ctx,
                         const int32_t* vals, int64_t n, int32_t ncomp);
extern "C" void rcd_zrow(RcDecoder* d, uint16_t* ctx, int32_t* vals,
                         int64_t n, int32_t ncomp);

namespace {

constexpr int kMaxComp = 3;

// ---- sweep structure (ops/raht.py merge_structure) ----------------

struct Sweep {
  std::vector<int64_t> codes;      // input codes (m rows)
  std::vector<int64_t> w;          // subtree weights
  std::vector<int32_t> pair_first; // indices i pairing with i+1
  std::vector<double> a, b;        // butterfly coefficients per pair
};

static void build_sweeps(const int64_t* leaf_codes, int64_t n,
                         int depth, std::vector<Sweep>& sweeps) {
  std::vector<int64_t> codes(leaf_codes, leaf_codes + n);
  std::vector<int64_t> w(n, 1);
  sweeps.resize(3 * depth);
  for (int s = 0; s < 3 * depth; ++s) {
    Sweep& sw = sweeps[s];
    sw.codes = codes;
    sw.w = w;
    int64_t m = (int64_t)codes.size();
    for (int64_t i = 0; i + 1 < m; ++i) {
      if ((codes[i] >> 1) == (codes[i + 1] >> 1)) {
        sw.pair_first.push_back((int32_t)i);
        double w1 = (double)w[i];
        double w2 = (double)w[i + 1];
        double rs = std::sqrt(w1 + w2);
        sw.a.push_back(std::sqrt(w1) / rs);
        sw.b.push_back(std::sqrt(w2) / rs);
        ++i;  // pairs never overlap (strictly increasing codes)
      }
    }
    // next level: merge pairs
    std::vector<int64_t> nc, nw;
    nc.reserve(m);
    nw.reserve(m);
    for (int64_t i = 0; i < m; ++i) {
      if (i + 1 < m && (codes[i] >> 1) == (codes[i + 1] >> 1)) {
        nc.push_back(codes[i] >> 1);
        nw.push_back(w[i] + w[i + 1]);
        ++i;
      } else {
        nc.push_back(codes[i] >> 1);
        nw.push_back(w[i]);
      }
    }
    codes.swap(nc);
    w.swap(nw);
  }
}

// forward one sweep: vals (m x C) -> acs (npairs x C); vals becomes
// the kept rows (m' x C)
static void sweep_forward(const Sweep& sw, std::vector<double>& vals,
                          int C, std::vector<double>& acs) {
  int64_t m = (int64_t)sw.codes.size();
  int64_t np = (int64_t)sw.pair_first.size();
  acs.resize(np * C);
  std::vector<double> out;
  out.reserve((m - np) * C);
  int64_t p = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (p < np && sw.pair_first[p] == (int32_t)i) {
      double a = sw.a[p], b = sw.b[p];
      for (int c = 0; c < C; ++c) {
        double v1 = vals[i * C + c], v2 = vals[(i + 1) * C + c];
        out.push_back(a * v1 + b * v2);
        acs[p * C + c] = -b * v1 + a * v2;
      }
      ++i;
      ++p;
    } else {
      for (int c = 0; c < C; ++c) out.push_back(vals[i * C + c]);
    }
  }
  vals.swap(out);
}

// inverse one sweep: vals (m' x C) + acs -> fine rows (m x C)
static void sweep_inverse(const Sweep& sw, std::vector<double>& vals,
                          int C, const std::vector<double>& acs) {
  int64_t m = (int64_t)sw.codes.size();
  int64_t np = (int64_t)sw.pair_first.size();
  std::vector<double> out(m * C);
  int64_t p = 0, src = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (p < np && sw.pair_first[p] == (int32_t)i) {
      double a = sw.a[p], b = sw.b[p];
      for (int c = 0; c < C; ++c) {
        double dc = vals[src * C + c];
        double ac = acs[p * C + c];
        out[i * C + c] = a * dc - b * ac;
        out[(i + 1) * C + c] = b * dc + a * ac;
      }
      ++i;
      ++src;
      ++p;
    } else {
      for (int c = 0; c < C; ++c) out[i * C + c] = vals[src * C + c];
      ++src;
    }
  }
  vals.swap(out);
}

// ---- quantisation (models/attr_raht.py) ----------------------------

static inline int32_t quant1(double v, double step_q16) {
  double s = v * 65536.0 / step_q16;
  double q = std::floor(std::abs(s) + (1.0 / 3.0));
  if (s < 0) q = -q;
  else if (s == 0.0) q = 0.0;   // sign(0) = 0
  return (int32_t)q;
}

static inline double dequant1(int32_t q, double step_q16) {
  return (double)q * step_q16 / 65536.0;
}

// ---- RDOQ (models/attr_raht.py _rdoq_zero_rows) ---------------------

static const int64_t kLutLog[16] = {0,   256, 406, 512, 594, 662,
                                    719, 768, 812, 850, 886, 918,
                                    947, 975, 1000, 1024};
static const int64_t kLutBins[11] = {1, 2, 3, 5, 5, 7, 7, 9, 9, 11, 11};

static inline int bit_length(int64_t t) {
  int a = 0;
  while (t) {
    ++a;
    t >>= 1;
  }
  return a;
}

// rows (m x C) doubles; returns flags + updated train
static void rdoq_rows(const std::vector<double>& rows, int64_t m, int C,
                      const double* steps_q16, int64_t& train_io,
                      std::vector<uint8_t>& flag) {
  flag.assign(m, 0);
  if (m == 0) return;
  std::vector<int64_t> sumc(m), ratec(m);
  std::vector<double> dist2(m);
  for (int64_t i = 0; i < m; ++i) {
    int64_t sc = 0, rc = 0;
    double d2 = 0.0;
    for (int c = 0; c < C; ++c) {
      double v = rows[i * C + c];
      double s = std::abs(v) * 65536.0 / steps_q16[c];
      int64_t aq = (int64_t)std::floor(s + (1.0 / 3.0));
      sc += aq;
      rc += kLutLog[aq < 15 ? aq : 15];
      d2 += v * v;
    }
    sumc[i] = sc;
    ratec[i] = rc;
    dist2[i] = d2;
  }
  double step_luma = steps_q16[0] / 65536.0;
  double mult = C == 1 ? 25.0 : 35.0;
  double lam = step_luma * step_luma * mult;
  // iterate the cascade to its monotone fixpoint (max 4 rounds).
  // Jacobi like the numpy spec: each round's flags are computed from
  // the PREVIOUS round's flags only (in-place updates would see
  // this-round flags for earlier rows and converge differently).
  std::vector<uint8_t> nf(m);
  for (int it = 0; it < 4; ++it) {
    bool changed = false;
    int64_t last_nz = -1;  // last non-zero row among 0..i-1 (old flags)
    for (int64_t i = 0; i < m; ++i) {
      int64_t train = (last_nz < 0) ? i + train_io + 1
                                    : (i - 1 - last_nz);
      int64_t rate = kLutBins[train < 10 ? train : 10];
      if (train > 10) {
        int a = bit_length(train - 10);
        rate += 2 * a - 1 + 2;
      }
      rate += (ratec[i] + 128) >> 8;
      bool f = sumc[i] > 0 && sumc[i] < 3
               && dist2[i] * 1024.0 < lam * (double)rate;
      nf[i] = f ? 1 : 0;
      if (nf[i] != flag[i]) changed = true;
      if (!(sumc[i] == 0 || flag[i])) last_nz = i;
    }
    if (!changed) break;
    flag = nf;
  }
  // train_out = trailing zero run
  int64_t last_nz = -1;
  for (int64_t i = 0; i < m; ++i)
    if (!(sumc[i] == 0 || flag[i])) last_nz = i;
  train_io = (last_nz < 0) ? train_io + m : (m - 1 - last_nz);
}

// ---- 19-neighbour prediction (ops/raht.py predict_children) --------

static const int64_t kMZ = 0x1249249249249249LL;
static const int64_t kMY = kMZ << 1;
static const int64_t kMX = kMZ << 2;
static const int64_t kAxisMask[3] = {kMX, kMY, kMZ};
static const int64_t kAxisUnit[3] = {4, 2, 1};

static inline int64_t morton_inc(int64_t c, int64_t mask, int64_t unit) {
  return (((c | ~mask) + unit) & mask) | (c & ~mask);
}
static inline int64_t morton_dec(int64_t c, int64_t mask, int64_t unit) {
  return (((c & mask) - unit) & mask) | (c & ~mask);
}

static const int kNbrOff[18][3] = {
    {+1, 0, 0}, {-1, 0, 0}, {0, +1, 0}, {0, -1, 0}, {0, 0, +1},
    {0, 0, -1}, {+1, +1, 0}, {+1, -1, 0}, {-1, +1, 0}, {-1, -1, 0},
    {+1, 0, +1}, {+1, 0, -1}, {-1, 0, +1}, {-1, 0, -1}, {0, +1, +1},
    {0, +1, -1}, {0, -1, +1}, {0, -1, -1}};

// touch[o][j]: octant o uses neighbour offset j
static bool touch_tab(int o, int j) {
  int cb[3] = {(o >> 2) & 1, (o >> 1) & 1, o & 1};
  for (int a = 0; a < 3; ++a) {
    int d = kNbrOff[j][a];
    if (d > 0 && cb[a] != 1) return false;
    if (d < 0 && cb[a] != 0) return false;
  }
  return true;
}

struct PredParams {
  int64_t t0, t1;
  double w_self, w_face, w_edge;
};

// open-addressing code->index table (power-of-2, linear probing);
// replaces per-offset binary searches: 18 O(1) probes per parent
// instead of 18 log2(mp)-probe searches.
struct CodeMap {
  // packed (key, idx) entries: one cache-line touch per probe
  struct Entry {
    int64_t key;
    int64_t val;
  };
  std::vector<Entry> tab;
  uint64_t mask;
  void build(const std::vector<int64_t>& codes) {
    uint64_t cap = 16;
    while (cap < codes.size() * 2) cap <<= 1;
    mask = cap - 1;
    tab.assign(cap, Entry{-1, 0});
    for (int64_t i = 0; i < (int64_t)codes.size(); ++i) {
      uint64_t h = hash(codes[i]);
      while (tab[h].key >= 0) h = (h + 1) & mask;
      tab[h].key = codes[i];
      tab[h].val = i;
    }
  }
  inline uint64_t hash(int64_t c) const {
    uint64_t x = (uint64_t)c * 0x9E3779B97F4A7C15ULL;
    return (x ^ (x >> 29)) & mask;
  }
  // -1 if absent
  inline int32_t find(int64_t c) const {
    uint64_t h = hash(c);
    while (tab[h].key >= 0) {
      if (tab[h].key == c) return (int32_t)tab[h].val;
      h = (h + 1) & mask;
    }
    return -1;
  }
};

// octants touched by each neighbour offset, precomputed from touch_tab
struct TouchList {
  int8_t oct[18][4];
  int8_t cnt[18];
  TouchList() {
    for (int j = 0; j < 18; ++j) {
      cnt[j] = 0;
      for (int o = 0; o < 8; ++o)
        if (touch_tab(o, j)) oct[j][cnt[j]++] = (int8_t)o;
    }
  }
};
static const TouchList kTouch;

// parents: codes (mp), recon DC values (mp x C), weights; children:
// codes (mc), weights.  grand (mp) or null.  Outputs pred (mc x C)
// and child_counts (mc).
static void predict_children(const std::vector<int64_t>& pcodes,
                             const std::vector<double>& recon,
                             const std::vector<int64_t>& pw,
                             const std::vector<int64_t>& ccodes,
                             const std::vector<int64_t>& cw,
                             int level_dims, int C,
                             const std::vector<int64_t>* grand,
                             const PredParams& pp,
                             std::vector<double>& pred,
                             std::vector<int64_t>& child_counts) {
  int64_t mp = (int64_t)pcodes.size();
  int64_t mc = (int64_t)ccodes.size();
  pred.assign(mc * C, 0.0);
  child_counts.assign(mc, 0);
  if (mc == 0) return;

  // parent means pf = recon / sqrt(w) (explicit division: the numpy
  // spec divides, and a reciprocal multiply differs in the last ulp)
  std::vector<double> pf(mp * C);
  for (int64_t i = 0; i < mp; ++i) {
    double sw = std::sqrt((double)pw[i]);
    for (int c = 0; c < C; ++c) pf[i * C + c] = recon[i * C + c] / sw;
  }

  int bits = 3 * std::max(level_dims, 0);
  if (bits > 62) bits = 62;
  int64_t lvl_mask = (bits >= 62) ? ((1LL << 62) - 1)
                                  : ((1LL << bits) - 1);

  CodeMap cmap;
  cmap.build(pcodes);

  // parent-major fused pass: neighbour lookup, ratio test, and octant
  // accumulation.  For a given (parent, octant) cell contributions
  // are added in ascending offset order j — the same FP summation
  // order as the numpy spec's offset-by-offset accumulation.
  std::vector<double> s_oct(mp * 8 * C, 0.0);
  std::vector<double> w_oct(mp * 8, 0.0);
  std::vector<int64_t> parent_counts(mp, 1);
  std::vector<uint8_t> enable(mp);
  for (int64_t i = 0; i < mp; ++i) {
    double pv = pf[i * C + 0];
    double* so_base = &s_oct[(i * 8) * C];
    double* wo_base = &w_oct[i * 8];
    int64_t cnt = 1;
    for (int j = 0; j < 18; ++j) {
      int64_t cde = pcodes[i];
      bool ok = true;
      for (int a = 0; a < 3 && ok; ++a) {
        int d = kNbrOff[j][a];
        if (d == 0) continue;
        int64_t mask = kAxisMask[a], unit = kAxisUnit[a];
        if (d > 0) {
          cde = morton_inc(cde, mask, unit);
          ok = (cde & ~lvl_mask) == 0;
        } else {
          ok = (cde & mask) != 0;
          if (ok) cde = morton_dec(cde, mask, unit);
        }
      }
      if (!ok) continue;
      int32_t idx = cmap.find(cde);
      if (idx < 0) continue;
      ++cnt;
      const double* v = &pf[(int64_t)idx * C];
      double nv = v[0];
      if (!(10 * nv > 2 * pv && 10 * nv < 25 * pv)) continue;
      double wj = j < 6 ? pp.w_face : pp.w_edge;
      for (int t = 0; t < kTouch.cnt[j]; ++t) {
        int o = kTouch.oct[j][t];
        double* so = so_base + o * C;
        for (int c = 0; c < C; ++c) so[c] += v[c] * wj;
        wo_base[o] += wj;
      }
    }
    parent_counts[i] = cnt;
    bool en = cnt >= pp.t1;
    if (grand) en = en && (*grand)[i] >= pp.t0;
    enable[i] = en ? 1 : 0;
  }

  // per child: run-counter parent index
  int64_t pi = 0;
  for (int64_t i = 0; i < mc; ++i) {
    if (i > 0 && (ccodes[i] >> 3) != (ccodes[i - 1] >> 3)) ++pi;
    int o = (int)(ccodes[i] & 7);
    child_counts[i] = parent_counts[pi];
    if (!enable[pi]) continue;
    double wsum = pp.w_self + w_oct[pi * 8 + o];
    double sw = std::sqrt((double)cw[i]);
    for (int c = 0; c < C; ++c) {
      double acc = pf[pi * C + c] * pp.w_self
                   + s_oct[(pi * 8 + o) * C + c];
      pred[i * C + c] = (acc / wsum) * sw;
    }
  }
}

// quant + rdoq + zrow encode one batch; returns dequantised rows
static void quant_encode_batch(RcEncoder* enc, uint16_t* zrow_ctx,
                               std::vector<double>& rows, int64_t m,
                               int C, const double* steps,
                               bool do_rdoq, int64_t& train,
                               std::vector<double>& deq) {
  if (do_rdoq) {
    std::vector<uint8_t> flag;
    rdoq_rows(rows, m, C, steps, train, flag);
    for (int64_t i = 0; i < m; ++i)
      if (flag[i])
        for (int c = 0; c < C; ++c) rows[i * C + c] = 0.0;
  }
  std::vector<int32_t> q(m * C);
  deq.resize(m * C);
  for (int64_t i = 0; i < m; ++i)
    for (int c = 0; c < C; ++c) {
      int32_t qq = quant1(rows[i * C + c], steps[c]);
      q[i * C + c] = qq;
      deq[i * C + c] = dequant1(qq, steps[c]);
    }
  rce_zrow(enc, zrow_ctx, q.data(), m, C);
}

}  // namespace

// ---------------------------------------------------------------------------
// entry points
// ---------------------------------------------------------------------------

extern "C" int raht_encode_predicted(
    RcEncoder* enc, uint16_t* zrow_ctx,
    const int64_t* leaf_codes, int64_t n, int depth,
    const int64_t* values, int ncomp,
    const int32_t* steps_q16,       // per component
    int64_t t0, int64_t t1,
    int32_t w_self, int32_t w_face, int32_t w_edge) {
  if (ncomp < 1 || ncomp > kMaxComp || n <= 0 || depth < 1) return -1;
  const int C = ncomp;
  double steps[kMaxComp];
  for (int c = 0; c < C; ++c) steps[c] = (double)steps_q16[c];
  PredParams pp{t0, t1, (double)w_self, (double)w_face, (double)w_edge};

  std::vector<Sweep> sweeps;
  build_sweeps(leaf_codes, n, depth, sweeps);
  int n_sweeps = 3 * depth;

  // bottom-up: true ACs per sweep
  std::vector<double> vals(values, values + n * C);
  std::vector<std::vector<double>> acs_true(n_sweeps);
  for (int s = 0; s < n_sweeps; ++s)
    sweep_forward(sweeps[s], vals, C, acs_true[s]);

  // root
  int64_t train = 0;
  std::vector<double> recon;
  {
    int64_t m = (int64_t)vals.size() / C;
    std::vector<double> root = vals;
    quant_encode_batch(enc, zrow_ctx, root, m, C, steps,
                       /*rdoq=*/false, train, recon);
  }

  std::vector<int64_t> grand;
  bool have_grand = false;
  for (int g = 0; g < depth; ++g) {
    int g_hi = n_sweeps - 3 * g;
    int g_lo = g_hi - 3;
    const std::vector<int64_t>& ccodes = sweeps[g_lo].codes;
    const std::vector<int64_t>& cw = sweeps[g_lo].w;
    std::vector<int64_t> root_codes(1, 0), root_w(1, n);
    const std::vector<int64_t>& pcodes =
        g_hi < n_sweeps ? sweeps[g_hi].codes : root_codes;
    const std::vector<int64_t>& pw =
        g_hi < n_sweeps ? sweeps[g_hi].w : root_w;

    std::vector<double> pred;
    std::vector<int64_t> counts;
    predict_children(pcodes, recon, pw, ccodes, cw, g, C,
                     have_grand ? &grand : nullptr, pp, pred, counts);
    grand.swap(counts);
    have_grand = true;

    // transform the prediction through the group's 3 sweeps
    std::vector<std::vector<double>> acs_pred(3);
    {
      std::vector<double> pv = pred;
      for (int s = 0; s < 3; ++s)
        sweep_forward(sweeps[g_lo + s], pv, C, acs_pred[s]);
    }
    // residuals: quantise + code + reconstruct ACs
    std::vector<std::vector<double>> acs_rec(3);
    for (int s = 0; s < 3; ++s) {
      int64_t m = (int64_t)acs_pred[s].size() / C;
      std::vector<double> res(m * C);
      for (int64_t i = 0; i < m * C; ++i)
        res[i] = acs_true[g_lo + s][i] - acs_pred[s][i];
      std::vector<double> deq;
      quant_encode_batch(enc, zrow_ctx, res, m, C, steps,
                         /*rdoq=*/true, train, deq);
      acs_rec[s].resize(m * C);
      for (int64_t i = 0; i < m * C; ++i)
        acs_rec[s][i] = acs_pred[s][i] + deq[i];
    }
    // group inverse: recon (coarse) + acs_rec -> child recon
    for (int s = 2; s >= 0; --s)
      sweep_inverse(sweeps[g_lo + s], recon, C, acs_rec[s]);
  }
  return 0;
}

extern "C" int raht_decode_predicted(
    RcDecoder* dec, uint16_t* zrow_ctx,
    const int64_t* leaf_codes, int64_t n, int depth,
    int64_t* out_values, int ncomp,
    const int32_t* steps_q16,
    int64_t t0, int64_t t1,
    int32_t w_self, int32_t w_face, int32_t w_edge) {
  if (ncomp < 1 || ncomp > kMaxComp || n <= 0 || depth < 1) return -1;
  const int C = ncomp;
  double steps[kMaxComp];
  for (int c = 0; c < C; ++c) steps[c] = (double)steps_q16[c];
  PredParams pp{t0, t1, (double)w_self, (double)w_face, (double)w_edge};

  std::vector<Sweep> sweeps;
  build_sweeps(leaf_codes, n, depth, sweeps);
  int n_sweeps = 3 * depth;

  // root
  int64_t n_roots =
      (int64_t)sweeps[n_sweeps - 1].codes.size()
      - (int64_t)sweeps[n_sweeps - 1].pair_first.size();
  std::vector<double> recon(n_roots * C);
  {
    std::vector<int32_t> q(n_roots * C);
    rcd_zrow(dec, zrow_ctx, q.data(), n_roots, C);
    for (int64_t i = 0; i < n_roots * C; ++i)
      recon[i] = dequant1(q[i], steps[i % C]);
  }

  std::vector<int64_t> grand;
  bool have_grand = false;
  for (int g = 0; g < depth; ++g) {
    int g_hi = n_sweeps - 3 * g;
    int g_lo = g_hi - 3;
    const std::vector<int64_t>& ccodes = sweeps[g_lo].codes;
    const std::vector<int64_t>& cw = sweeps[g_lo].w;
    std::vector<int64_t> root_codes(1, 0), root_w(1, n);
    const std::vector<int64_t>& pcodes =
        g_hi < n_sweeps ? sweeps[g_hi].codes : root_codes;
    const std::vector<int64_t>& pw =
        g_hi < n_sweeps ? sweeps[g_hi].w : root_w;

    std::vector<double> pred;
    std::vector<int64_t> counts;
    predict_children(pcodes, recon, pw, ccodes, cw, g, C,
                     have_grand ? &grand : nullptr, pp, pred, counts);
    grand.swap(counts);
    have_grand = true;

    std::vector<std::vector<double>> acs_pred(3);
    {
      std::vector<double> pv = pred;
      for (int s = 0; s < 3; ++s)
        sweep_forward(sweeps[g_lo + s], pv, C, acs_pred[s]);
    }
    std::vector<std::vector<double>> acs_rec(3);
    for (int s = 0; s < 3; ++s) {
      int64_t m = (int64_t)acs_pred[s].size() / C;
      std::vector<int32_t> q(m * C);
      rcd_zrow(dec, zrow_ctx, q.data(), m, C);
      acs_rec[s].resize(m * C);
      for (int64_t i = 0; i < m; ++i)
        for (int c = 0; c < C; ++c)
          acs_rec[s][i * C + c] =
              acs_pred[s][i * C + c] + dequant1(q[i * C + c], steps[c]);
    }
    for (int s = 2; s >= 0; --s)
      sweep_inverse(sweeps[g_lo + s], recon, C, acs_rec[s]);
  }
  // round-half-even like np.round
  for (int64_t i = 0; i < n * C; ++i)
    out_values[i] = (int64_t)std::nearbyint(recon[i]);
  return 0;
}
