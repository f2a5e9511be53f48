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
//
// Performance structure (round 4): the 18-neighbour search that
// dominated earlier rounds (open-addressing hash probes, ~80% of
// encode time) is replaced by *neighbour inheritance*: the neighbours
// of a node at level d+1 are always children of {its parent} union
// {its parent's 18 neighbours} at level d, and children of a node are
// a contiguous run in the Morton-sorted level array.  Maintaining an
// explicit per-level neighbour-index table turns every lookup into a
// bounded scan of a tiny sorted run (usually 1-4 entries, same cache
// line) instead of a random hash probe.  The leaf level never serves
// as a parent, so no table is ever built for the largest level.

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
//
// Pairing structure is stored for every sweep; full code/weight
// vectors are only kept at group boundaries (every 3rd sweep), which
// is all the prediction stage reads.

struct SweepPairs {
  int64_t m = 0;                   // rows before merging
  std::vector<int32_t> pair_first; // indices i pairing with i+1
  std::vector<double> a, b;        // butterfly coefficients per pair
};

struct LevelCodes {
  std::vector<int64_t> codes;      // Morton codes at this tree level
  std::vector<int64_t> w;          // subtree weights
};

// levels[k]: codes after 3*k sweeps (levels[0] = input leaves,
// levels[depth] = root).
static void build_sweeps(const int64_t* leaf_codes, int64_t n,
                         int depth, std::vector<SweepPairs>& sweeps,
                         std::vector<LevelCodes>& levels) {
  PROF(0);
  sweeps.resize(3 * depth);
  levels.resize(depth + 1);
  levels[0].codes.assign(leaf_codes, leaf_codes + n);
  levels[0].w.assign(n, 1);
  std::vector<int64_t> codes = levels[0].codes;
  std::vector<int64_t> w = levels[0].w;
  std::vector<int64_t> nc, nw;
  for (int s = 0; s < 3 * depth; ++s) {
    SweepPairs& sw = sweeps[s];
    int64_t m = (int64_t)codes.size();
    sw.m = m;
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
    nc.clear();
    nw.clear();
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
    if ((s + 1) % 3 == 0) {
      LevelCodes& lv = levels[(s + 1) / 3];
      lv.codes = codes;
      lv.w = w;
    }
  }
}

// forward one sweep: vals (m x C) -> acs (npairs x C); vals becomes
// the kept rows (m' x C).  `scratch` is reused across calls.
static void sweep_forward(const SweepPairs& sw, std::vector<double>& vals,
                          int C, std::vector<double>& acs,
                          std::vector<double>& scratch) {
  PROF(1);
  int64_t m = sw.m;
  int64_t np = (int64_t)sw.pair_first.size();
  acs.resize(np * C);
  scratch.resize((m - np) * C);
  double* out = scratch.data();
  const double* in = vals.data();
  int64_t p = 0, o = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (p < np && sw.pair_first[p] == (int32_t)i) {
      double a = sw.a[p], b = sw.b[p];
      for (int c = 0; c < C; ++c) {
        double v1 = in[i * C + c], v2 = in[(i + 1) * C + c];
        out[o + c] = a * v1 + b * v2;
        acs[p * C + c] = -b * v1 + a * v2;
      }
      ++i;
      ++p;
      o += C;
    } else {
      for (int c = 0; c < C; ++c) out[o + c] = in[i * C + c];
      o += C;
    }
  }
  vals.swap(scratch);
  vals.resize(o);
}

// inverse one sweep: vals (m' x C) + acs -> fine rows (m x C)
static void sweep_inverse(const SweepPairs& sw, std::vector<double>& vals,
                          int C, const std::vector<double>& acs,
                          std::vector<double>& scratch) {
  PROF(2);
  int64_t m = sw.m;
  int64_t np = (int64_t)sw.pair_first.size();
  scratch.resize(m * C);
  double* out = scratch.data();
  const double* in = vals.data();
  int64_t p = 0, src = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (p < np && sw.pair_first[p] == (int32_t)i) {
      double a = sw.a[p], b = sw.b[p];
      for (int c = 0; c < C; ++c) {
        double dc = in[src * C + c];
        double ac = acs[p * C + c];
        out[i * C + c] = a * dc - b * ac;
        out[(i + 1) * C + c] = b * dc + a * ac;
      }
      ++i;
      ++src;
      ++p;
    } else {
      for (int c = 0; c < C; ++c) out[i * C + c] = in[src * C + c];
      ++src;
    }
  }
  vals.swap(scratch);
  vals.resize(m * C);
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

// reusable scratch for rdoq_rows
struct RdoqScratch {
  std::vector<int64_t> sumc, ratec;
  std::vector<double> dist2;
  std::vector<uint8_t> nf;
};

// rows (m x C) doubles; returns flags + updated train
static void rdoq_rows(const std::vector<double>& rows, int64_t m, int C,
                      const double* steps_q16, int64_t& train_io,
                      std::vector<uint8_t>& flag, RdoqScratch& ws) {
  flag.assign(m, 0);
  if (m == 0) return;
  ws.sumc.resize(m);
  ws.ratec.resize(m);
  ws.dist2.resize(m);
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
    ws.sumc[i] = sc;
    ws.ratec[i] = rc;
    ws.dist2[i] = d2;
  }
  double step_luma = steps_q16[0] / 65536.0;
  double mult = C == 1 ? 25.0 : 35.0;
  double lam = step_luma * step_luma * mult;
  // iterate the cascade to its monotone fixpoint (max 4 rounds).
  // Jacobi like the numpy spec: each round's flags are computed from
  // the PREVIOUS round's flags only (in-place updates would see
  // this-round flags for earlier rows and converge differently).
  ws.nf.resize(m);
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
      rate += (ws.ratec[i] + 128) >> 8;
      bool f = ws.sumc[i] > 0 && ws.sumc[i] < 3
               && ws.dist2[i] * 1024.0 < lam * (double)rate;
      ws.nf[i] = f ? 1 : 0;
      if (ws.nf[i] != flag[i]) changed = true;
      if (!(ws.sumc[i] == 0 || flag[i])) last_nz = i;
    }
    if (!changed) break;
    flag.assign(ws.nf.begin(), ws.nf.end());
  }
  // train_out = trailing zero run
  int64_t last_nz = -1;
  for (int64_t i = 0; i < m; ++i)
    if (!(ws.sumc[i] == 0 || flag[i])) last_nz = i;
  train_io = (last_nz < 0) ? train_io + m : (m - 1 - last_nz);
}

// ---- 19-neighbour prediction (ops/raht.py predict_children) --------

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

// kParentDir[o][j]: for a child in octant o taking neighbour offset j,
// the offset index (0..17) of the *parent-level* cell holding that
// neighbour, or 18 when it is a sibling (same parent).
// kChildOct[o][j]: the octant of that neighbour within its parent
// ((o_a + d_a) mod 2 per axis).
struct ParentDirTab {
  int8_t dir[8][18];
  int8_t oct[8][18];
  ParentDirTab() {
    for (int o = 0; o < 8; ++o) {
      int cb[3] = {(o >> 2) & 1, (o >> 1) & 1, o & 1};
      for (int j = 0; j < 18; ++j) {
        int pd[3], co = 0;
        for (int a = 0; a < 3; ++a) {
          int s = cb[a] + kNbrOff[j][a];
          pd[a] = s < 0 ? -1 : (s > 1 ? 1 : 0);
          co |= (s & 1) << (2 - a);
        }
        oct[o][j] = (int8_t)co;
        if (pd[0] == 0 && pd[1] == 0 && pd[2] == 0) {
          dir[o][j] = 18;
          continue;
        }
        int found = -1;
        for (int k = 0; k < 18; ++k)
          if (kNbrOff[k][0] == pd[0] && kNbrOff[k][1] == pd[1]
              && kNbrOff[k][2] == pd[2])
            found = k;
        dir[o][j] = (int8_t)found;  // always found: <=2 nonzero comps
      }
    }
  }
};
static const ParentDirTab kParentDir;

// Per-group prediction + neighbour-table inheritance.
//
// parents: codes (mp), recon DC values (mp x C), weights, 18-neighbour
// index table nbr_p (mp x 18, -1 = absent).  children: codes (mc),
// weights.  grand (mp) or null.  Outputs pred (mc x C), child_counts
// (mc), and (when build_child_tab) nbr_c (mc x 18) for the next group.
struct PredScratch {
  std::vector<double> pf;        // parent means
  std::vector<int64_t> cstart;   // child run start per parent
  std::vector<int32_t> idx8;     // mp x 8: child index per octant
};

static void predict_children(const std::vector<int64_t>& pcodes,
                             const std::vector<double>& recon,
                             const std::vector<int64_t>& pw,
                             const std::vector<int64_t>& ccodes,
                             const std::vector<int64_t>& cw,
                             int C,
                             const std::vector<int64_t>* grand,
                             const PredParams& pp,
                             const std::vector<int32_t>& nbr_p,
                             bool build_child_tab,
                             std::vector<double>& pred,
                             std::vector<int64_t>& child_counts,
                             std::vector<int32_t>& nbr_c,
                             PredScratch& ws) {
  PROF(3);
  int64_t mp = (int64_t)pcodes.size();
  int64_t mc = (int64_t)ccodes.size();
  pred.assign(mc * C, 0.0);
  child_counts.assign(mc, 0);
  if (mc == 0) return;

  // parent means pf = recon / sqrt(w) (explicit division: the numpy
  // spec divides, and a reciprocal multiply differs in the last ulp)
  ws.pf.resize(mp * C);
  double* pf = ws.pf.data();
  for (int64_t i = 0; i < mp; ++i) {
    double sw = std::sqrt((double)pw[i]);
    for (int c = 0; c < C; ++c) pf[i * C + c] = recon[i * C + c] / sw;
  }

  // pass A: child runs per parent (children of parent i are a
  // contiguous run in the sorted child array) + per-parent octant
  // index table
  bool need_idx8 = build_child_tab;
  if (need_idx8) ws.idx8.assign(mp * 8, -1);
  ws.cstart.resize(mp + 1);
  {
    int64_t pi = 0;
    ws.cstart[0] = 0;
    for (int64_t i = 0; i < mc; ++i) {
      if (i > 0 && (ccodes[i] >> 3) != (ccodes[i - 1] >> 3)) {
        ++pi;
        ws.cstart[pi] = i;
      }
      if (need_idx8)
        ws.idx8[pi * 8 + (int)(ccodes[i] & 7)] = (int32_t)i;
    }
    ws.cstart[mp] = mc;
  }
  if (build_child_tab) nbr_c.resize(mc * 18);

  // pass B (fused parent-major): neighbour read, ratio test, octant
  // accumulation into a register-resident 8xC block, then the
  // prediction output and the child-level neighbour-table inheritance
  // for this parent's children — no level-sized accumulator arrays.
  // For a given (parent, octant) cell contributions are added in
  // ascending offset order j — the same FP summation order as the
  // numpy spec's offset-by-offset accumulation.
  for (int64_t i = 0; i < mp; ++i) {
    double pv = pf[i * C + 0];
    const int32_t* nb = &nbr_p[i * 18];
    double s_oct[8 * kMaxComp] = {0.0};
    double w_oct[8] = {0.0};
    int64_t cnt = 1;
    for (int j = 0; j < 18; ++j) {
      int32_t idx = nb[j];
      if (idx < 0) continue;
      ++cnt;
      const double* v = &pf[(int64_t)idx * C];
      double nv = v[0];
      if (!(10 * nv > 2 * pv && 10 * nv < 25 * pv)) continue;
      double wj = j < 6 ? pp.w_face : pp.w_edge;
      for (int t = 0; t < kTouch.cnt[j]; ++t) {
        int o = kTouch.oct[j][t];
        double* so = &s_oct[o * C];
        for (int c = 0; c < C; ++c) so[c] += v[c] * wj;
        w_oct[o] += wj;
      }
    }
    bool en = cnt >= pp.t1;
    if (grand) en = en && (*grand)[i] >= pp.t0;

    int64_t clo = ws.cstart[i], chi = ws.cstart[i + 1];
    for (int64_t k = clo; k < chi; ++k) {
      int o = (int)(ccodes[k] & 7);
      child_counts[k] = cnt;
      if (en) {
        double wsum = pp.w_self + w_oct[o];
        double sw = std::sqrt((double)cw[k]);
        for (int c = 0; c < C; ++c) {
          double acc = pf[i * C + c] * pp.w_self + s_oct[o * C + c];
          pred[k * C + c] = (acc / wsum) * sw;
        }
      }
      if (!build_child_tab) continue;
      // inherit the child's neighbour table: the neighbour of a child
      // (octant o, offset j) is the child at octant kChildOct[o][j]
      // of the parent-level cell kParentDir[o][j] — two table loads,
      // no search, no Morton arithmetic.  Out-of-bounds targets are
      // exactly the ones whose parent-level cell is absent
      // (nbr_p == -1): a sibling lookup never leaves the parent cell,
      // and any other child offset crosses the same parent boundary
      // its parent offset does.
      int32_t* out = &nbr_c[k * 18];
      const int8_t* pdir = kParentDir.dir[o];
      const int8_t* poct = kParentDir.oct[o];
      for (int j = 0; j < 18; ++j) {
        int pd = pdir[j];
        int64_t gp = pd == 18 ? i : nb[pd];
        out[j] = gp < 0 ? -1 : ws.idx8[gp * 8 + poct[j]];
      }
    }
  }
}

// quant + rdoq + zrow encode one batch; returns dequantised rows
struct QuantScratch {
  std::vector<uint8_t> flag;
  std::vector<int32_t> q;
  RdoqScratch rdoq;
};

static void quant_encode_batch(RcEncoder* enc, uint16_t* zrow_ctx,
                               std::vector<double>& rows, int64_t m,
                               int C, const double* steps,
                               bool do_rdoq, int64_t& train,
                               std::vector<double>& deq,
                               QuantScratch& ws) {
  PROF(4);
  if (do_rdoq) {
    rdoq_rows(rows, m, C, steps, train, ws.flag, ws.rdoq);
    for (int64_t i = 0; i < m; ++i)
      if (ws.flag[i])
        for (int c = 0; c < C; ++c) rows[i * C + c] = 0.0;
  }
  ws.q.resize(m * C);
  deq.resize(m * C);
  for (int64_t i = 0; i < m; ++i)
    for (int c = 0; c < C; ++c) {
      int32_t qq = quant1(rows[i * C + c], steps[c]);
      ws.q[i * C + c] = qq;
      deq[i * C + c] = dequant1(qq, steps[c]);
    }
  rce_zrow(enc, zrow_ctx, ws.q.data(), m, C);
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

  std::vector<SweepPairs> sweeps;
  std::vector<LevelCodes> levels;
  build_sweeps(leaf_codes, n, depth, sweeps, levels);
  int n_sweeps = 3 * depth;

  // bottom-up: true ACs per sweep
  std::vector<double> vals(values, values + n * C);
  std::vector<double> scratch;
  std::vector<std::vector<double>> acs_true(n_sweeps);
  for (int s = 0; s < n_sweeps; ++s)
    sweep_forward(sweeps[s], vals, C, acs_true[s], scratch);

  // root
  int64_t train = 0;
  std::vector<double> recon;
  QuantScratch qws;
  {
    int64_t m = (int64_t)vals.size() / C;
    std::vector<double> root = vals;
    quant_encode_batch(enc, zrow_ctx, root, m, C, steps,
                       /*rdoq=*/false, train, recon, qws);
  }

  std::vector<int64_t> grand;
  bool have_grand = false;
  // neighbour table for the current parent level; the top level is a
  // single root cell with no neighbours
  std::vector<int32_t> nbr_p(levels[depth].codes.size() * 18, -1);
  std::vector<int32_t> nbr_c;
  PredScratch pws;
  std::vector<double> pred, pv;
  std::vector<int64_t> counts;
  std::vector<std::vector<double>> acs_pred(3), acs_rec(3);
  std::vector<double> res, deq;
  for (int g = 0; g < depth; ++g) {
    const LevelCodes& child_lv = levels[depth - 1 - g];
    const LevelCodes& parent_lv = levels[depth - g];
    int g_lo = 3 * (depth - 1 - g);

    predict_children(parent_lv.codes, recon, parent_lv.w,
                     child_lv.codes, child_lv.w, C,
                     have_grand ? &grand : nullptr, pp, nbr_p,
                     /*build_child_tab=*/g + 1 < depth, pred, counts,
                     nbr_c, pws);
    grand.swap(counts);
    have_grand = true;
    nbr_p.swap(nbr_c);

    // transform the prediction through the group's 3 sweeps
    pv = pred;
    for (int s = 0; s < 3; ++s)
      sweep_forward(sweeps[g_lo + s], pv, C, acs_pred[s], scratch);
    // residuals: quantise + code + reconstruct ACs
    for (int s = 0; s < 3; ++s) {
      int64_t m = (int64_t)acs_pred[s].size() / C;
      res.resize(m * C);
      for (int64_t i = 0; i < m * C; ++i)
        res[i] = acs_true[g_lo + s][i] - acs_pred[s][i];
      quant_encode_batch(enc, zrow_ctx, res, m, C, steps,
                         /*rdoq=*/true, train, deq, qws);
      acs_rec[s].resize(m * C);
      for (int64_t i = 0; i < m * C; ++i)
        acs_rec[s][i] = acs_pred[s][i] + deq[i];
    }
    // group inverse: recon (coarse) + acs_rec -> child recon
    for (int s = 2; s >= 0; --s)
      sweep_inverse(sweeps[g_lo + s], recon, C, acs_rec[s], scratch);
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

  std::vector<SweepPairs> sweeps;
  std::vector<LevelCodes> levels;
  build_sweeps(leaf_codes, n, depth, sweeps, levels);

  // root
  int64_t n_roots = (int64_t)levels[depth].codes.size();
  std::vector<double> recon(n_roots * C);
  {
    std::vector<int32_t> q(n_roots * C);
    rcd_zrow(dec, zrow_ctx, q.data(), n_roots, C);
    for (int64_t i = 0; i < n_roots * C; ++i)
      recon[i] = dequant1(q[i], steps[i % C]);
  }

  std::vector<int64_t> grand;
  bool have_grand = false;
  std::vector<int32_t> nbr_p(n_roots * 18, -1);
  std::vector<int32_t> nbr_c;
  PredScratch pws;
  std::vector<double> scratch, pred, pv;
  std::vector<int64_t> counts;
  std::vector<std::vector<double>> acs_pred(3), acs_rec(3);
  std::vector<int32_t> q;
  for (int g = 0; g < depth; ++g) {
    const LevelCodes& child_lv = levels[depth - 1 - g];
    const LevelCodes& parent_lv = levels[depth - g];
    int g_lo = 3 * (depth - 1 - g);

    predict_children(parent_lv.codes, recon, parent_lv.w,
                     child_lv.codes, child_lv.w, C,
                     have_grand ? &grand : nullptr, pp, nbr_p,
                     /*build_child_tab=*/g + 1 < depth, pred, counts,
                     nbr_c, pws);
    grand.swap(counts);
    have_grand = true;
    nbr_p.swap(nbr_c);

    pv = pred;
    for (int s = 0; s < 3; ++s)
      sweep_forward(sweeps[g_lo + s], pv, C, acs_pred[s], scratch);
    for (int s = 0; s < 3; ++s) {
      int64_t m = (int64_t)acs_pred[s].size() / C;
      q.resize(m * C);
      rcd_zrow(dec, zrow_ctx, q.data(), m, C);
      acs_rec[s].resize(m * C);
      for (int64_t i = 0; i < m; ++i)
        for (int c = 0; c < C; ++c)
          acs_rec[s][i * C + c] =
              acs_pred[s][i * C + c] + dequant1(q[i * C + c], steps[c]);
    }
    for (int s = 2; s >= 0; --s)
      sweep_inverse(sweeps[g_lo + s], recon, C, acs_rec[s], scratch);
  }
  // round-half-even like np.round
  for (int64_t i = 0; i < n * C; ++i)
    out_values[i] = (int64_t)std::nearbyint(recon[i]);
  return 0;
}
