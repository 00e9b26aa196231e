// Genome->transcript projection engine (native hot path).
//
// C++ port of oarfish_tpu/genome/project.py::project_blocks plus the
// soft-clip rescue extension (genome/rescue.py) — the from-scratch
// equivalent of the bramble projection the reference drives
// (reference: src/bulk.rs:521, src/util/projection.rs:238-273). The
// Python implementation is kept as the differential oracle; at
// GENCODE scale (250k transcripts, 80k reads) the per-hit Python
// (candidate lookup + exon walks + x-drop rescue) was ~70% of the
// map phase (PERF_NOTES round-4).
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC project.cpp
//        -o liboarfish_project.so -pthread
//
// Semantics mirror project_blocks exactly:
//   * candidates = transcripts sharing a 16kb genome bin with the
//     alignment span whose exonic span overlaps it
//   * matched = exonic overlap of the aligned blocks (1-based incl.)
//   * each intron inside the transcript span must coincide with a
//     transcript junction within `tol`, else similarity is discounted
//     by junc_miss_discount per miss
//   * rescue: x-drop (+1/-2, drop 6) extension of the soft-clipped
//     ends against the transcript's exonic context outward from the
//     first/last matched genomic base; rescued bases join `matched`
//     and extend the transcript-space interval (strand-aware)
//   * transcript coords via the exon cumulative map; '-' strand flips

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int BIN_SHIFT = 14;
constexpr int64_t CLIP_CAP = 200;
constexpr int XDROP = 6;
constexpr int64_t MIN_CLIP = 3;

struct G2T {
  int64_t T = 0;
  const int64_t* exon_off;
  const int64_t* exon_s;
  const int64_t* exon_e;
  const int64_t* cum_before;
  const int64_t* tlen;
  const int8_t* strand_neg;
  const int32_t* chrom_of;
  int64_t n_chroms = 0;
  const int64_t* chrom_bin_off;  // [n_chroms+1] into bin_off
  const int64_t* bin_off;        // [total_bins+1] into bin_tids
  const int32_t* bin_tids;
  // genome sequences (rescue); null when rescue is off
  const char* gseqs = nullptr;
  const int64_t* goff = nullptr;
};

struct ProjOut {
  std::vector<int32_t> tid;
  std::vector<int64_t> start, end;
  std::vector<int64_t> matched;
  std::vector<double> sim;
  std::vector<uint8_t> is_rev;
};

// x-drop extension: bases matched through the best-scoring prefix
static int64_t extend_match(const char* a, int64_t na, const char* b,
                            int64_t nb) {
  int score = 0, best = 0;
  int64_t best_len = 0;
  int64_t n = na < nb ? na : nb;
  for (int64_t i = 0; i < n; i++) {
    score += (a[i] == b[i]) ? 1 : -2;
    if (score > best) {
      best = score;
      best_len = i + 1;
    }
    if (best - score > XDROP) break;
  }
  return best_len;
}

// exonic bases LEFT of g (1-based, exclusive), right-to-left
static int64_t left_context(const G2T& g2t, int64_t t, int64_t g,
                            int64_t cap, char* out) {
  int32_t cid = g2t.chrom_of[t];
  if (cid < 0 || cid >= g2t.n_chroms || !g2t.gseqs) return 0;
  const char* chrom = g2t.gseqs + g2t.goff[cid];
  int64_t clen = g2t.goff[cid + 1] - g2t.goff[cid];
  int64_t lo = g2t.exon_off[t], hi = g2t.exon_off[t + 1];
  // i = last exon with start < g  (searchsorted right) - 1
  int64_t i = hi - 1;
  {
    int64_t a = lo, b = hi;  // first index with exon_s > g-? use starts<=g
    while (a < b) {
      int64_t m = (a + b) / 2;
      if (g2t.exon_s[m] <= g)
        a = m + 1;
      else
        b = m;
    }
    i = a - 1;
  }
  int64_t pos = g - 1;  // rightmost base to include (1-based)
  int64_t n = 0;
  while (i >= lo && n < cap) {
    int64_t s = g2t.exon_s[i], e = g2t.exon_e[i];
    int64_t h = pos < e ? pos : e;
    for (int64_t p = h; p >= s && n < cap; p--) {
      if (p >= 1 && p <= clen) out[n++] = chrom[p - 1];
      else out[n++] = 'N';
    }
    i--;
    if (i >= lo) pos = g2t.exon_e[i];
  }
  return n;
}

// exonic bases RIGHT of g (1-based, exclusive), forward
static int64_t right_context(const G2T& g2t, int64_t t, int64_t g,
                             int64_t cap, char* out) {
  int32_t cid = g2t.chrom_of[t];
  if (cid < 0 || cid >= g2t.n_chroms || !g2t.gseqs) return 0;
  const char* chrom = g2t.gseqs + g2t.goff[cid];
  int64_t clen = g2t.goff[cid + 1] - g2t.goff[cid];
  int64_t lo = g2t.exon_off[t], hi = g2t.exon_off[t + 1];
  // i = first exon with end >= g (searchsorted left on ends)
  int64_t i;
  {
    int64_t a = lo, b = hi;
    while (a < b) {
      int64_t m = (a + b) / 2;
      if (g2t.exon_e[m] < g)
        a = m + 1;
      else
        b = m;
    }
    i = a;
  }
  int64_t pos = g + 1;
  int64_t n = 0;
  while (i < hi && n < cap) {
    int64_t s = g2t.exon_s[i], e = g2t.exon_e[i];
    int64_t l = pos > s ? pos : s;
    for (int64_t p = l; p <= e && n < cap; p++) {
      if (p >= 1 && p <= clen) out[n++] = chrom[p - 1];
      else out[n++] = 'N';
    }
    i++;
    if (i < hi) pos = g2t.exon_s[i];
  }
  return n;
}

// transcript coordinate of genomic position g (1-based), or -1
static int64_t to_txp_coord(const G2T& g2t, int64_t t, int64_t g) {
  int64_t lo = g2t.exon_off[t], hi = g2t.exon_off[t + 1];
  int64_t a = lo, b = hi;
  while (a < b) {  // searchsorted right on starts
    int64_t m = (a + b) / 2;
    if (g2t.exon_s[m] <= g)
      a = m + 1;
    else
      b = m;
  }
  int64_t i = a - 1;
  if (i < lo || g > g2t.exon_e[i]) return -1;
  int64_t fwd = g2t.cum_before[i] + (g - g2t.exon_s[i]);  // 0-based
  if (g2t.strand_neg[t]) return g2t.tlen[t] - fwd;
  return fwd + 1;
}

struct Scratch {
  std::vector<int64_t> stamp;   // per-transcript visit epoch
  int64_t epoch = 0;
  std::vector<int32_t> cands;
  char ctx[CLIP_CAP];
  char rev[CLIP_CAP];
};

static void project_one(
    const G2T& g2t, Scratch& sc, int64_t n_blocks, const int64_t* bs,
    const int64_t* be, int64_t n_introns, const int64_t* is_,
    const int64_t* ie_, int64_t q_aligned, int32_t chrom, uint8_t is_rc,
    // clipL_rev: first min(true,CAP) bytes of the REVERSED left clip;
    // clipR: first min(true,CAP) bytes of the forward right clip.
    // nclipL/nclipR are the TRUE clip lengths (q_den uses them capped)
    const char* clipL_rev, int64_t nclipL, const char* clipR,
    int64_t nclipR,
    double junc_miss_discount, int64_t tol, ProjOut& out) {
  if (n_blocks == 0 || q_aligned == 0) return;
  int64_t q_den = q_aligned;
  // rescue is "active" for a hit when the caller supplied clips (the
  // Python callers gate which hits get clips; empty clips = no rescue
  // and no q_den extension — mirrors project_blocks' rescue=None)
  bool rescue = g2t.gseqs != nullptr && (nclipL > 0 || nclipR > 0);
  if (rescue)
    q_den += (nclipL < CLIP_CAP ? nclipL : CLIP_CAP) +
             (nclipR < CLIP_CAP ? nclipR : CLIP_CAP);
  int64_t gstart = bs[0], gend = be[n_blocks - 1];
  if (chrom < 0 || chrom >= g2t.n_chroms) return;
  // candidates via 16kb bins (dedup by epoch stamp)
  sc.cands.clear();
  sc.epoch++;
  int64_t b0 = gstart >> BIN_SHIFT, b1 = gend >> BIN_SHIFT;
  int64_t nbins_c =
      g2t.chrom_bin_off[chrom + 1] - g2t.chrom_bin_off[chrom];
  for (int64_t b = b0; b <= b1; b++) {
    if (b < 0 || b >= nbins_c) continue;
    int64_t o = g2t.chrom_bin_off[chrom] + b;
    for (int64_t k = g2t.bin_off[o]; k < g2t.bin_off[o + 1]; k++) {
      int32_t t = g2t.bin_tids[k];
      if (sc.stamp[t] == sc.epoch) continue;
      sc.stamp[t] = sc.epoch;
      int64_t lo = g2t.exon_off[t], hi = g2t.exon_off[t + 1];
      if (lo >= hi) continue;
      int64_t span_s = g2t.exon_s[lo], span_e = g2t.exon_e[hi - 1];
      if (span_s <= gend && span_e >= gstart) sc.cands.push_back(t);
    }
  }
  for (int32_t t : sc.cands) {
    int64_t lo = g2t.exon_off[t], hi = g2t.exon_off[t + 1];
    int64_t matched = 0, first_g = -1, last_g = -1;
    for (int64_t bi = 0; bi < n_blocks; bi++) {
      int64_t B_s = bs[bi], B_e = be[bi];
      // first exon with end >= B_s
      int64_t a = lo, b = hi;
      while (a < b) {
        int64_t m = (a + b) / 2;
        if (g2t.exon_e[m] < B_s)
          a = m + 1;
        else
          b = m;
      }
      for (int64_t i = a; i < hi; i++) {
        int64_t s = g2t.exon_s[i], e = g2t.exon_e[i];
        if (s > B_e) break;
        int64_t o_s = B_s > s ? B_s : s;
        int64_t o_e = B_e < e ? B_e : e;
        if (o_s <= o_e) {
          matched += o_e - o_s + 1;
          if (first_g < 0) first_g = o_s;
          last_g = o_e;
        }
      }
    }
    if (matched == 0 || first_g < 0) continue;

    int64_t span_s = g2t.exon_s[lo], span_e = g2t.exon_e[hi - 1];
    int64_t n_mismatch = 0;
    for (int64_t ii = 0; ii < n_introns; ii++) {
      int64_t gs = is_[ii], ge = ie_[ii];
      if (ge < span_s || gs > span_e) continue;
      // i = searchsorted_left(ends, gs-1-tol)
      int64_t a = lo, b = hi;
      int64_t key = gs - 1 - tol;
      while (a < b) {
        int64_t m = (a + b) / 2;
        if (g2t.exon_e[m] < key)
          a = m + 1;
        else
          b = m;
      }
      bool ok = false;
      for (int64_t j = a; j <= a + 1; j++) {
        if (j >= lo && j < hi - 1) {
          int64_t d1 = g2t.exon_e[j] - (gs - 1);
          int64_t d2 = g2t.exon_s[j + 1] - (ge + 1);
          if ((d1 < 0 ? -d1 : d1) <= tol && (d2 < 0 ? -d2 : d2) <= tol) {
            ok = true;
            break;
          }
        }
      }
      if (!ok) n_mismatch++;
    }

    int64_t rl = 0, rr = 0;
    if (rescue) {
      if (nclipL >= MIN_CLIP) {
        int64_t cap = nclipL < CLIP_CAP ? nclipL : CLIP_CAP;
        int64_t nctx = left_context(g2t, t, first_g, cap, sc.ctx);
        rl = extend_match(clipL_rev, cap, sc.ctx, nctx);
      }
      if (nclipR >= MIN_CLIP) {
        int64_t cap = nclipR < CLIP_CAP ? nclipR : CLIP_CAP;
        int64_t nctx = right_context(g2t, t, last_g, cap, sc.ctx);
        rr = extend_match(clipR, cap, sc.ctx, nctx);
      }
      matched += rl + rr;
    }

    int64_t t1 = to_txp_coord(g2t, t, first_g);
    int64_t t2 = to_txp_coord(g2t, t, last_g);
    if (t1 < 0 || t2 < 0) continue;
    int64_t start = t1 <= t2 ? t1 : t2;
    int64_t end = t1 <= t2 ? t2 : t1;
    if (rl || rr) {
      if (g2t.strand_neg[t]) {
        start -= rr;
        end += rl;
      } else {
        start -= rl;
        end += rr;
      }
      if (start < 1) start = 1;
      if (end > g2t.tlen[t]) end = g2t.tlen[t];
    }

    // denominator = max(aligned query span, projected transcript span):
    // the span term charges internal transcript sequence the alignment
    // skips, so junction evidence discriminates against the
    // intron-retaining isoform (see project_blocks in
    // oarfish_tpu/genome/project.py, the differential oracle)
    int64_t span = end - start + 1;
    double sim =
        double(matched) / double(q_den > span ? q_den : span);
    if (junc_miss_discount < 1.0 && n_mismatch)
      sim *= std::pow(junc_miss_discount, double(n_mismatch));
    out.tid.push_back(t);
    out.start.push_back(start);
    out.end.push_back(end);
    out.matched.push_back(matched);
    out.sim.push_back(sim);
    out.is_rev.push_back(uint8_t(is_rc ^ uint8_t(g2t.strand_neg[t])));
  }
}

}  // namespace

extern "C" {

struct ProjResult {
  int64_t n;           // total candidate records
  int64_t* hit_off;    // [n_hits+1]
  int32_t* tid;
  int64_t* start;
  int64_t* end;
  int64_t* matched;
  double* sim;
  uint8_t* is_rev;
};

void oarfish_project_result_free(ProjResult* r) {
  if (!r) return;
  free(r->hit_off);
  free(r->tid);
  free(r->start);
  free(r->end);
  free(r->matched);
  free(r->sim);
  free(r->is_rev);
  delete r;
}

static char comp_upper(char c) {
  switch (c) {
    case 'a': case 'A': return 'T';
    case 'c': case 'C': return 'G';
    case 'g': case 'G': return 'C';
    case 't': case 'T': return 'A';
    case 'u': case 'U': return 'A';
    default: return char(toupper((unsigned char)c));
  }
}

static char up(char c) { return char(toupper((unsigned char)c)); }

static ProjResult* run_project_batch(
    // g2t
    int64_t T, const int64_t* exon_off, const int64_t* exon_s,
    const int64_t* exon_e, const int64_t* cum_before, const int64_t* tlen,
    const int8_t* strand_neg, const int32_t* chrom_of, int64_t n_chroms,
    const int64_t* chrom_bin_off, const int64_t* bin_off,
    const int32_t* bin_tids,
    // genome sequences (rescue); pass null to disable rescue
    const char* gseqs, const int64_t* goff,
    // hits
    int64_t n_hits, const int32_t* hit_chrom, const int64_t* block_off,
    const int64_t* block_s, const int64_t* block_e,
    const int64_t* intron_off, const int64_t* intron_s,
    const int64_t* intron_e, const uint8_t* hit_is_rc,
    const int64_t* q_aligned,
    // clip source A: explicit clips (genome-forward, uppercased),
    // concatenated; null offsets -> none
    const char* clipL, const int64_t* clipL_off, const char* clipR,
    const int64_t* clipR_off,
    // clip source B: raw reads — clips computed in here from the
    // per-hit query extent (genome_reads mode gate: c5>=3 || c3>=3)
    const char* reads, const int64_t* read_seq_off,
    const int64_t* hit_read, const int64_t* qstart, const int64_t* qend,
    double junc_miss_discount, int64_t tol, int32_t n_threads) {
  G2T g2t{T,        exon_off, exon_s,  exon_e,      cum_before, tlen,
          strand_neg, chrom_of};
  g2t.n_chroms = n_chroms;
  g2t.chrom_bin_off = chrom_bin_off;
  g2t.bin_off = bin_off;
  g2t.bin_tids = bin_tids;
  g2t.gseqs = gseqs;
  g2t.goff = goff;

  int nt = n_threads > 0 ? n_threads
                         : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (int64_t(nt) > n_hits) nt = int(n_hits > 0 ? n_hits : 1);

  std::vector<ProjOut> parts(nt);
  std::vector<std::vector<int64_t>> counts(nt);
  // contiguous shards keep per-hit output order reconstructible
  std::vector<int64_t> shard_off(nt + 1, 0);
  for (int t = 0; t < nt; t++)
    shard_off[t + 1] = n_hits * int64_t(t + 1) / nt;

  std::vector<std::thread> pool;
  for (int t = 0; t < nt; t++) {
    pool.emplace_back([&, t] {
      Scratch sc;
      sc.stamp.assign(size_t(T), 0);
      auto& out = parts[t];
      auto& cnt = counts[t];
      char bufL[CLIP_CAP], bufR[CLIP_CAP];
      for (int64_t h = shard_off[t]; h < shard_off[t + 1]; h++) {
        size_t before = out.tid.size();
        int64_t nb = block_off[h + 1] - block_off[h];
        int64_t ni = intron_off ? intron_off[h + 1] - intron_off[h] : 0;
        const char* cLr = nullptr;
        const char* cR = nullptr;
        int64_t nL = 0, nR = 0;
        if (reads) {
          int64_t r0 = hit_read[h];
          const char* rd = reads + read_seq_off[r0];
          int64_t L = read_seq_off[r0 + 1] - read_seq_off[r0];
          bool rc = hit_is_rc[h] != 0;
          int64_t qs = qstart[h], qe = qend[h];
          int64_t c5 = rc ? L - qe : qs;
          int64_t c3 = rc ? qs : L - qe;
          if (c5 >= 3 || c3 >= 3) {
            // fwd = rc ? revcomp(rd) : rd (uppercased); left clip is
            // fwd[:c5] REVERSED, right clip fwd[L-c3:], capped at CAP
            int64_t n5 = c5 < CLIP_CAP ? c5 : CLIP_CAP;
            for (int64_t i = 0; i < n5; i++) {
              int64_t j = c5 - 1 - i;  // fwd index
              bufL[i] = rc ? comp_upper(rd[L - 1 - j]) : up(rd[j]);
            }
            int64_t n3 = c3 < CLIP_CAP ? c3 : CLIP_CAP;
            for (int64_t i = 0; i < n3; i++) {
              int64_t j = L - c3 + i;  // fwd index
              bufR[i] = rc ? comp_upper(rd[L - 1 - j]) : up(rd[j]);
            }
            cLr = bufL;
            cR = bufR;
            nL = c5;
            nR = c3;
          }
        } else if (clipL_off) {
          int64_t lenL = clipL_off[h + 1] - clipL_off[h];
          int64_t lenR = clipR_off[h + 1] - clipR_off[h];
          const char* pL = clipL + clipL_off[h];
          int64_t n5 = lenL < CLIP_CAP ? lenL : CLIP_CAP;
          for (int64_t i = 0; i < n5; i++) bufL[i] = pL[lenL - 1 - i];
          cLr = bufL;
          cR = clipR + clipR_off[h];
          nL = lenL;
          nR = lenR;
        }
        project_one(
            g2t, sc, nb, block_s + block_off[h], block_e + block_off[h],
            ni, intron_s ? intron_s + (intron_off ? intron_off[h] : 0)
                         : nullptr,
            intron_e ? intron_e + (intron_off ? intron_off[h] : 0)
                     : nullptr,
            q_aligned[h], hit_chrom[h], hit_is_rc[h],
            cLr, nL, cR, nR,
            junc_miss_discount, tol, out);
        cnt.push_back(int64_t(out.tid.size() - before));
      }
    });
  }
  for (auto& th : pool) th.join();

  auto* r = new ProjResult();
  int64_t total = 0;
  for (auto& p : parts) total += int64_t(p.tid.size());
  r->n = total;
  r->hit_off = (int64_t*)malloc(sizeof(int64_t) * size_t(n_hits + 1));
  r->tid = (int32_t*)malloc(sizeof(int32_t) * size_t(total ? total : 1));
  r->start = (int64_t*)malloc(sizeof(int64_t) * size_t(total ? total : 1));
  r->end = (int64_t*)malloc(sizeof(int64_t) * size_t(total ? total : 1));
  r->matched =
      (int64_t*)malloc(sizeof(int64_t) * size_t(total ? total : 1));
  r->sim = (double*)malloc(sizeof(double) * size_t(total ? total : 1));
  r->is_rev =
      (uint8_t*)malloc(sizeof(uint8_t) * size_t(total ? total : 1));
  int64_t off = 0, h0 = 0;
  r->hit_off[0] = 0;
  for (int t = 0; t < nt; t++) {
    auto& p = parts[t];
    if (!p.tid.empty()) {
      memcpy(r->tid + off, p.tid.data(), p.tid.size() * sizeof(int32_t));
      memcpy(r->start + off, p.start.data(),
             p.start.size() * sizeof(int64_t));
      memcpy(r->end + off, p.end.data(), p.end.size() * sizeof(int64_t));
      memcpy(r->matched + off, p.matched.data(),
             p.matched.size() * sizeof(int64_t));
      memcpy(r->sim + off, p.sim.data(), p.sim.size() * sizeof(double));
      memcpy(r->is_rev + off, p.is_rev.data(),
             p.is_rev.size() * sizeof(uint8_t));
    }
    for (int64_t c : counts[t]) {
      off += c;
      r->hit_off[++h0] = off;
    }
  }
  return r;
}

ProjResult* oarfish_project_batch(
    int64_t T, const int64_t* exon_off, const int64_t* exon_s,
    const int64_t* exon_e, const int64_t* cum_before, const int64_t* tlen,
    const int8_t* strand_neg, const int32_t* chrom_of, int64_t n_chroms,
    const int64_t* chrom_bin_off, const int64_t* bin_off,
    const int32_t* bin_tids, const char* gseqs, const int64_t* goff,
    int64_t n_hits, const int32_t* hit_chrom, const int64_t* block_off,
    const int64_t* block_s, const int64_t* block_e,
    const int64_t* intron_off, const int64_t* intron_s,
    const int64_t* intron_e, const uint8_t* hit_is_rc,
    const int64_t* q_aligned, const char* clipL,
    const int64_t* clipL_off, const char* clipR,
    const int64_t* clipR_off, double junc_miss_discount, int64_t tol,
    int32_t n_threads) {
  return run_project_batch(
      T, exon_off, exon_s, exon_e, cum_before, tlen, strand_neg,
      chrom_of, n_chroms, chrom_bin_off, bin_off, bin_tids, gseqs, goff,
      n_hits, hit_chrom, block_off, block_s, block_e, intron_off,
      intron_s, intron_e, hit_is_rc, q_aligned, clipL, clipL_off, clipR,
      clipR_off, nullptr, nullptr, nullptr, nullptr, nullptr,
      junc_miss_discount, tol, n_threads);
}

// raw-read variant: clips computed in-thread from the reads blob +
// per-hit query extents (genome_reads mode; kills the per-hit Python
// clip-assembly loop)
ProjResult* oarfish_project_batch_reads(
    int64_t T, const int64_t* exon_off, const int64_t* exon_s,
    const int64_t* exon_e, const int64_t* cum_before, const int64_t* tlen,
    const int8_t* strand_neg, const int32_t* chrom_of, int64_t n_chroms,
    const int64_t* chrom_bin_off, const int64_t* bin_off,
    const int32_t* bin_tids, const char* gseqs, const int64_t* goff,
    int64_t n_hits, const int32_t* hit_chrom, const int64_t* block_off,
    const int64_t* block_s, const int64_t* block_e,
    const int64_t* intron_off, const int64_t* intron_s,
    const int64_t* intron_e, const uint8_t* hit_is_rc,
    const int64_t* q_aligned, const char* reads,
    const int64_t* read_seq_off, const int64_t* hit_read,
    const int64_t* qstart, const int64_t* qend,
    double junc_miss_discount, int64_t tol, int32_t n_threads) {
  return run_project_batch(
      T, exon_off, exon_s, exon_e, cum_before, tlen, strand_neg,
      chrom_of, n_chroms, chrom_bin_off, bin_off, bin_tids, gseqs, goff,
      n_hits, hit_chrom, block_off, block_s, block_e, intron_off,
      intron_s, intron_e, hit_is_rc, q_aligned, nullptr, nullptr,
      nullptr, nullptr, reads, read_seq_off, hit_read, qstart, qend,
      junc_miss_discount, tol, n_threads);
}

}  // extern "C"
