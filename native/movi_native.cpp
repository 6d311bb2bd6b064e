// movi_tpu native kernels: SA-IS suffix array + Kasai LCP.
//
// Replaces the reference's external pfp-thresholds toolchain
// (CMakeLists.txt:80-94) for index construction: the Python builder calls
// these via ctypes (movi_tpu/build/suffix.py) to go FASTA -> SA -> BWT ->
// LCP -> thresholds entirely in-process.
//
// SA-IS: induced sorting suffix array construction, O(n) time.
// The input text must end with a unique, smallest sentinel byte (0).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

template <typename Char>
void get_counts(const Char* s, int64_t* cnt, int64_t n, int64_t K) {
  std::memset(cnt, 0, sizeof(int64_t) * K);
  for (int64_t i = 0; i < n; i++) cnt[s[i]]++;
}

void get_buckets(const int64_t* cnt, int64_t* bkt, int64_t K, bool end) {
  int64_t sum = 0;
  for (int64_t i = 0; i < K; i++) {
    sum += cnt[i];
    bkt[i] = end ? sum : sum - cnt[i];
  }
}

// t[i] = true iff suffix i is S-type
template <typename Char>
void classify(const Char* s, std::vector<bool>& t, int64_t n) {
  t[n - 1] = true;  // sentinel is S
  for (int64_t i = n - 2; i >= 0; i--) {
    t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);
  }
}

inline bool is_lms(const std::vector<bool>& t, int64_t i) {
  return i > 0 && t[i] && !t[i - 1];
}

template <typename Char>
void induce(const Char* s, int64_t* sa, const std::vector<bool>& t,
            std::vector<int64_t>& cnt, std::vector<int64_t>& bkt,
            int64_t n, int64_t K) {
  // induce L-type from sorted LMS
  get_buckets(cnt.data(), bkt.data(), K, false);
  for (int64_t i = 0; i < n; i++) {
    int64_t j = sa[i] - 1;
    if (sa[i] > 0 && j >= 0 && !t[j]) sa[bkt[s[j]]++] = j;
  }
  // induce S-type
  get_buckets(cnt.data(), bkt.data(), K, true);
  for (int64_t i = n - 1; i >= 0; i--) {
    int64_t j = sa[i] - 1;
    if (sa[i] > 0 && j >= 0 && t[j]) sa[--bkt[s[j]]] = j;
  }
}

template <typename Char>
void sais(const Char* s, int64_t* sa, int64_t n, int64_t K) {
  if (n == 1) { sa[0] = 0; return; }

  std::vector<bool> t(n);
  classify(s, t, n);

  std::vector<int64_t> cnt(K), bkt(K);
  get_counts(s, cnt.data(), n, K);

  // step 1: place LMS suffixes at bucket ends (arbitrary order), induce
  get_buckets(cnt.data(), bkt.data(), K, true);
  std::fill(sa, sa + n, (int64_t)-1);
  for (int64_t i = n - 1; i > 0; i--) {
    if (is_lms(t, i)) sa[--bkt[s[i]]] = i;
  }
  induce(s, sa, t, cnt, bkt, n, K);

  // step 2: compact sorted LMS suffixes into sa[0..n1)
  int64_t n1 = 0;
  for (int64_t i = 0; i < n; i++) {
    if (is_lms(t, sa[i])) sa[n1++] = sa[i];
  }

  // name LMS substrings
  std::fill(sa + n1, sa + n, (int64_t)-1);
  int64_t name = 0, prev = -1;
  for (int64_t i = 0; i < n1; i++) {
    int64_t pos = sa[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      for (int64_t d = 0;; d++) {
        if (pos + d >= n || prev + d >= n) { diff = true; break; }
        if (s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
          diff = true; break;
        }
        if (d > 0 && (is_lms(t, pos + d) || is_lms(t, prev + d))) {
          // reached the end of both LMS substrings with equality
          diff = !(is_lms(t, pos + d) && is_lms(t, prev + d));
          break;
        }
      }
    }
    if (diff) { name++; prev = pos; }
    sa[n1 + pos / 2] = name - 1;
  }
  // compact names to the tail
  int64_t* s1 = sa + n - n1;
  for (int64_t i = n - 1, j = n - 1; i >= n1; i--) {
    if (sa[i] >= 0) sa[j--] = sa[i];
  }

  // step 3: recurse if names are not unique
  if (name < n1) {
    sais<int64_t>(s1, sa, n1, name);
  } else {
    for (int64_t i = 0; i < n1; i++) sa[s1[i]] = i;
  }

  // map recursion result back to LMS positions
  std::vector<int64_t> lms(n1);
  for (int64_t i = 1, j = 0; i < n; i++) {
    if (is_lms(t, i)) lms[j++] = i;
  }
  for (int64_t i = 0; i < n1; i++) sa[i] = lms[sa[i]];

  // step 4: place sorted LMS at bucket ends, induce final SA
  std::fill(sa + n1, sa + n, (int64_t)-1);
  get_buckets(cnt.data(), bkt.data(), K, true);
  for (int64_t i = n1 - 1; i >= 0; i--) {
    int64_t j = sa[i];
    sa[i] = -1;
    sa[--bkt[s[j]]] = j;
  }
  induce(s, sa, t, cnt, bkt, n, K);
}

}  // namespace

extern "C" {

// Suffix array of text[0..n); text[n-1] must be the unique smallest byte.
int movi_sais(const uint8_t* text, int64_t* sa, int64_t n) {
  if (n <= 0) return 1;
  if (n == 1) { sa[0] = 0; return 0; }
  sais<uint8_t>(text, sa, n, 256);
  return 0;
}

// Kasai LCP: lcp[i] = lcp(suffix(sa[i-1]), suffix(sa[i])), lcp[0] = 0.
// rank is scratch of size n.
int movi_lcp_kasai(const uint8_t* text, const int64_t* sa, int64_t* lcp,
                   int64_t* rank, int64_t n) {
  for (int64_t i = 0; i < n; i++) rank[sa[i]] = i;
  int64_t h = 0;
  lcp[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t r = rank[i];
    if (r > 0) {
      int64_t j = sa[r - 1];
      int64_t m = n - (i > j ? i : j);
      while (h < m && text[i + h] == text[j + h]) h++;
      lcp[r] = h;
      if (h > 0) h--;
    } else {
      h = 0;
    }
  }
  return 0;
}

// BWT from SA: bwt[i] = text[(sa[i] + n - 1) % n]
int movi_bwt(const uint8_t* text, const int64_t* sa, uint8_t* bwt,
             int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    int64_t p = sa[i];
    bwt[i] = text[p == 0 ? n - 1 : p - 1];
  }
  return 0;
}

// Per-run thresholds: for run k (head char c, start s), the first position
// t in (prev_end_of_c, s] minimizing lcp[t]; 0 if c unseen before.
// starts/ends are run boundaries; heads are run head chars.
int movi_thresholds(const uint8_t* heads, const int64_t* starts,
                    const int64_t* lcp, int64_t* thresholds,
                    int64_t original_r, int64_t n) {
  int64_t last_end[256];
  for (int i = 0; i < 256; i++) last_end[i] = -1;
  for (int64_t k = 0; k < original_r; k++) {
    uint8_t c = heads[k];
    int64_t s = starts[k];
    int64_t end = (k + 1 < original_r) ? starts[k + 1] : n;
    if (last_end[c] < 0) {
      thresholds[k] = 0;
    } else {
      int64_t lo = last_end[c] + 1;
      int64_t best = lo;
      int64_t best_v = lcp[lo];
      for (int64_t t = lo + 1; t <= s; t++) {
        if (lcp[t] < best_v) { best_v = lcp[t]; best = t; }
      }
      thresholds[k] = best;
    }
    last_end[c] = end - 1;
  }
  return 0;
}

// O(n) LF-cycle sweep over the move table, starting at run 0 offset 0
// (BWT row 0, whose SA value is tot_len - 1).  Visits every BWT position
// exactly once, decrementing the SA value each step; optionally fills
//   - out_sa[row / rate] = SA value at rows with row % rate == 0
//     (find_sampled_SA_entries, move_structure_build.cpp:1173-1212)
//   - out_doc[row] = doc id of the document containing the SA value
//     (build_doc_pats, move_structure_color.cpp:4-24)
// Pass rate = 0 to skip SA sampling, out_doc = nullptr to skip doc_pats.
int movi_lf_sweep(const int32_t* n, const int32_t* off, const int64_t* id,
                  const int64_t* all_p, int64_t r, int64_t tot_len,
                  int64_t rate, int64_t* out_sa,
                  const int64_t* doc_offsets, const int32_t* doc_ids,
                  int64_t num_docs, uint16_t* out_doc) {
  int64_t offset = 0, index = 0, sa_val = tot_len;
  int64_t doc_ind = num_docs - 1;
  for (int64_t i = 0; i < tot_len; i++) {
    sa_val--;
    int64_t row = all_p[index] + offset;
    if (out_doc) {
      while (doc_ind > 0 && sa_val < doc_offsets[doc_ind - 1]) doc_ind--;
      out_doc[row] = (uint16_t)doc_ids[doc_ind];
    }
    if (out_sa && rate > 0 && row % rate == 0) out_sa[row / rate] = sa_val;
    // LF_move with fast-forward (move_structure.cpp:59-87)
    offset += off[index];
    index = id[index];
    while (index < r - 1 && offset >= n[index]) {
      offset -= n[index];
      index++;
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched FASTA/FASTQ reader (plain or gzip via zlib), replacing the
// reference's vendored kseq (include/kseq.h) for production host I/O:
// Python-level line parsing cannot keep up with the >200 Mbases/s query
// engines (SURVEY.md "Host I/O throughput").
//
// Two-pass ctypes interface:
//   movi_fastx_scan  -> (#reads, total sequence bytes, total name bytes)
//   movi_fastx_parse -> concatenated seqs + per-read (offset, length),
//                       concatenated names + per-read name offsets
// Multi-line FASTA records are concatenated; FASTQ quality lines are
// skipped (the '+' separator delimits them).

namespace {

struct FastxVisitor {
  // callback-style single implementation used by both passes
  template <typename OnName, typename OnSeqChunk, typename OnRecordEnd>
  static int run(const char* path, OnName on_name, OnSeqChunk on_seq,
                 OnRecordEnd on_end) {
    gzFile f = gzopen(path, "rb");
    if (!f) return 1;
    std::vector<char> buf(1 << 20);
    std::string line;
    bool in_record = false;
    bool fastq = false;
    int fastq_line = 0;  // 0=seq, 1='+', 2=qual
    auto start_record = [&](const char* s, int64_t len) {
      in_record = true;
      fastq = (s[0] == '@');
      fastq_line = 0;
      int64_t e = 1;  // name = up to first whitespace
      while (e < len && s[e] != ' ' && s[e] != '\t') e++;
      on_name(s + 1, e - 1);
    };
    auto handle_line = [&](const char* s, int64_t len) {
      if (len > 0 && (s[len - 1] == '\r')) len--;
      if (len == 0) return;
      if (!in_record) {
        if (s[0] == '>' || s[0] == '@') start_record(s, len);
        return;
      }
      if (fastq) {
        if (fastq_line == 0) {
          if (s[0] == '+') { fastq_line = 1; return; }
          on_seq(s, len);
        } else {  // the quality line ends the record
          on_end();
          in_record = false;
        }
      } else {
        if (s[0] == '>' || s[0] == '@') {
          on_end();
          start_record(s, len);
          return;
        }
        on_seq(s, len);
      }
    };
    std::string pending;
    while (true) {
      int got = gzread(f, buf.data(), (unsigned)buf.size());
      if (got < 0) { gzclose(f); return 2; }
      if (got == 0) break;
      int64_t start = 0;
      while (start < got) {
        const char* nl = (const char*)std::memchr(
            buf.data() + start, '\n', (size_t)(got - start));
        if (!nl) break;
        int64_t i = nl - buf.data();
        if (!pending.empty()) {
          pending.append(buf.data() + start, i - start);
          handle_line(pending.data(), (int64_t)pending.size());
          pending.clear();
        } else {
          handle_line(buf.data() + start, i - start);
        }
        start = i + 1;
      }
      if (start < got) pending.append(buf.data() + start, got - start);
    }
    if (!pending.empty()) handle_line(pending.data(), (int64_t)pending.size());
    if (in_record) on_end();
    gzclose(f);
    return 0;
  }
};

}  // namespace

extern "C" {

int movi_fastx_scan(const char* path, int64_t* n_reads, int64_t* seq_bytes,
                    int64_t* name_bytes) {
  int64_t nr = 0, sb = 0, nb = 0;
  int rc = FastxVisitor::run(
      path,
      [&](const char* s, int64_t len) { nr++; nb += len; },
      [&](const char* s, int64_t len) { sb += len; },
      [&]() {});
  *n_reads = nr;
  *seq_bytes = sb;
  *name_bytes = nb;
  return rc;
}

int movi_fastx_parse(const char* path, uint8_t* seqs, int64_t* seq_offsets,
                     int32_t* lengths, char* names, int64_t* name_offsets) {
  int64_t ri = 0, spos = 0, npos = 0, cur_len = 0;
  int rc = FastxVisitor::run(
      path,
      [&](const char* s, int64_t len) {
        name_offsets[ri] = npos;
        std::memcpy(names + npos, s, len);
        npos += len;
        seq_offsets[ri] = spos;
        cur_len = 0;
      },
      [&](const char* s, int64_t len) {
        std::memcpy(seqs + spos, s, len);
        spos += len;
        cur_len += len;
      },
      [&]() { lengths[ri++] = (int32_t)cur_len; });
  name_offsets[ri] = npos;
  seq_offsets[ri] = spos;
  return rc;
}

// Single-core scalar PML query loop: the reference's no-prefetch inner
// loop (move_structure_query.cpp:234-361) over our SoA move table.  Used
// by bench.py to MEASURE the CPU baseline that vs_baseline is computed
// against, instead of assuming a literature constant.
//
//   n/off/id/c    : move rows (c = alphabet slot; the '$' run stores 0 and
//                   matches alphabet[0], move_structure_query.cpp:277)
//   thr_full      : [r, sigma] threshold per (run, read char slot)
//   reads_alpha   : [num_reads * read_len] read chars already mapped to
//                   alphabet slots, in right-to-left processing order
// Returns the sum of all emitted PMLs (checksum; also defeats DCE).
int64_t movi_scalar_pml(const int32_t* n, const int32_t* off,
                        const int64_t* id, const uint8_t* c,
                        const uint16_t* thr_full, int64_t r, int32_t sigma,
                        const uint8_t* reads_alpha, int64_t num_reads,
                        int64_t read_len) {
  int64_t checksum = 0;
  for (int64_t q = 0; q < num_reads; q++) {
    const uint8_t* read = reads_alpha + q * read_len;
    int64_t idx = r - 1;
    int64_t offset = n[idx] - 1;
    int64_t match_len = 0;
    for (int64_t p = 0; p < read_len; p++) {
      int32_t a = read[p];
      if (a >= sigma) {
        match_len = 0;  // illegal char: plain LF, no reposition
      } else if (c[idx] == a) {
        match_len++;
      } else {
        // reposition_thresholds (move_structure_query.cpp:513-601):
        // offset >= threshold -> scan down, else scan up
        if (offset >= thr_full[idx * sigma + a]) {
          do { idx++; } while (c[idx] != a);
          offset = 0;
        } else {
          do { idx--; } while (c[idx] != a);
          offset = n[idx] - 1;
        }
        match_len = 0;
      }
      checksum += match_len;
      // LF_move + fast_forward (move_structure.cpp:59-87)
      offset += off[idx];
      idx = id[idx];
      while (idx < r - 1 && offset >= n[idx]) {
        offset -= n[idx];
        idx++;
      }
    }
  }
  return checksum;
}

// Right-aligned batch packing: out[nl, w] <- reads [start, start+nl) of
// the flat (seqs, offsets, lengths) arrays, padded with 0xFF on the left
// (optionally with each read reversed in place for --reverse).
int movi_fastx_pack(const uint8_t* seqs, const int64_t* offs,
                    const int32_t* lengths, int64_t start, int64_t nl,
                    int64_t w, int reverse, uint8_t* out) {
  std::memset(out, 0xFF, (size_t)(nl * w));
  for (int64_t i = 0; i < nl; i++) {
    int64_t L = lengths[start + i];
    if (L > w) L = w;
    const uint8_t* src = seqs + offs[start + i];
    uint8_t* dst = out + i * w + (w - L);
    if (reverse) {
      for (int64_t j = 0; j < L; j++) dst[j] = src[L - 1 - j];
    } else {
      std::memcpy(dst, src, (size_t)L);
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Single-core scalar baselines for the non-PML query types, so bench.py
// can MEASURE a CPU denominator for every capability instead of only
// PML.  Each mirrors the reference's algorithm over our SoA move table:
//   - count:   query_backward_search  (move_structure_search.cpp:340-352)
//   - zml:     query_zml              (move_structure_query.cpp:690-786)
//   - kmer membership: query_all_kmers with look-ahead skipping
//                                      (sequitur.cpp:322-421)
//   - kmer exact counts: query_kmers_from_bidirectional with the k/2
//     partial-interval cache           (sequitur.cpp:14-255)
//   - MEM BML: query_mem_bml          (mem_finder.cpp:29-103)
// Interval updates use the precomputed next-run tables (the repo's O(1)
// replacement for the reference's run scan) and the bidirectional skip
// uses the same per-(threshold, run) prefix tables as the device engine
// -- both make this a mildly STRONGER baseline than the reference's
// scan/walk loops, which keeps the measured ratios honest.

namespace scalar_search {

struct Ctx {
  const int32_t* n;
  const int32_t* off;
  const int64_t* id;
  const int32_t* nd;      // [sigma*r] first run >= i with char a ('$' excl.)
  const int32_t* nu;      // [sigma*r] last run <= i with char a
  const int64_t* all_p;   // [r+1]
  const int64_t* init_tab;  // [sigma*4] (rs, os, re, oe) per char
  const int64_t* skipP;   // [sigma*r] weighted prefix (bidirectional skip)
  const uint8_t* skipU;   // [sigma*r] per-row weight
  int64_t r;
  int32_t sigma;
};

struct Iv { int64_t rs, os, re, oe; };

static inline bool empty(const Iv& v) {
  return !(v.rs < v.re || (v.rs == v.re && v.os <= v.oe));
}

static inline void lf(const Ctx& c, int64_t& run, int64_t& o) {
  o += c.off[run];
  run = c.id[run];
  while (run < c.r - 1 && o >= c.n[run]) { o -= c.n[run]; run++; }
}

static inline Iv init_iv(const Ctx& c, int a) {
  if (a < 0 || a >= c.sigma) return Iv{1, 0, 0, 0};  // canonical empty
  const int64_t* p = c.init_tab + 4 * a;
  return Iv{p[0], p[1], p[2], p[3]};
}

// backward_search_step: next-table interval update + LF both ends.
// Returns false (iv untouched) when the updated interval is empty.
static bool bs_step(const Ctx& c, int a, Iv& iv) {
  if (a < 0 || a >= c.sigma) return false;
  int64_t d = c.nd[(int64_t)a * c.r + iv.rs];
  if (d >= c.r || d > iv.re) return false;
  int64_t os = (d == iv.rs) ? iv.os : 0;
  int64_t e = c.nu[(int64_t)a * c.r + iv.re];
  int64_t oe = (e == iv.re) ? iv.oe : (int64_t)c.n[e] - 1;
  lf(c, d, os);
  lf(c, e, oe);
  iv = Iv{d, os, e, oe};
  return true;
}

static inline int64_t count(const Ctx& c, const Iv& v) {
  if (empty(v)) return 0;
  return c.all_p[v.re] + v.oe - c.all_p[v.rs] - v.os + 1;
}

static void resolve(const Ctx& c, int64_t abs_pos, int64_t& run,
                    int64_t& o) {
  int64_t lo = 0, hi = c.r;  // all_p has r+1 entries
  while (hi - lo > 1) {
    int64_t mid = (lo + hi) >> 1;
    if (c.all_p[mid] <= abs_pos) lo = mid; else hi = mid;
  }
  run = lo;
  o = abs_pos - c.all_p[lo];
}

// extend_bidirectional (move_structure_search.cpp:66-120): backward-step
// the `s` interval with char a, advance the `o` interval by the skip
// count (O(1) via the prefix tables instead of the reference's run walk).
static bool extend_bidir(const Ctx& c, int a, Iv& s, Iv& o) {
  if (a < 0 || a >= c.sigma) return false;
  Iv s2 = s;
  if (!bs_step(c, a, s2)) return false;
  int t = c.sigma - 1 - a;
  const int64_t* P = c.skipP + (int64_t)t * c.r;
  const uint8_t* U = c.skipU + (int64_t)t * c.r;
  int64_t skip = P[s.re] + (int64_t)U[s.re] * (s.oe + 1)
               - P[s.rs] - (int64_t)U[s.rs] * s.os;
  int64_t cnt = count(c, s2);
  int64_t abs0 = c.all_p[o.rs] + o.os + skip;
  resolve(c, abs0, o.rs, o.os);
  resolve(c, abs0 + cnt - 1, o.re, o.oe);
  s = s2;
  return true;
}

// look_ahead_backward_search (move_structure_search.cpp:354-385), ftab-less.
static bool look_ahead(const Ctx& c, const int8_t* rd, int64_t pos,
                       int64_t step, int64_t k) {
  int64_t pa = pos - step;
  int64_t pos_saved = pa;
  Iv iv = init_iv(c, rd[pa]);
  int64_t max_len = k - step;
  while (pa > 0 && !empty(iv)) {
    Iv niv = iv;
    if (!bs_step(c, rd[pa - 1], niv)) break;
    iv = niv;
    pa--;
    if (pos_saved - pa > max_len) break;
  }
  return pos - pa >= k - 1;
}

// query_kmers_from (sequitur.cpp:257-320), ftab-less: one maximal
// backward stretch; returns the new pos_on_r, found via out-param.
static int64_t kmers_from(const Ctx& c, const int8_t* rd, int64_t pos,
                          int64_t k, int64_t& found) {
  int64_t pos_saved = pos;
  Iv iv = init_iv(c, rd[pos]);
  if (empty(iv)) { found = 0; return pos_saved - 1; }
  while (pos > 0) {
    Iv niv = iv;
    if (!bs_step(c, rd[pos - 1], niv)) break;
    iv = niv;
    pos--;
  }
  if (pos_saved - pos >= k - 1) {
    found = pos_saved - pos - k + 2;
    return pos + k - 2;
  }
  found = 0;
  return pos_saved - 1;
}

struct Partial { Iv fw; int64_t ml; };

// query_kmers_from_bidirectional (sequitur.cpp:14-255), ftab-less:
// anchor at the window's left end, extend right caching partial
// intervals past k/2, left-extend each partial with plain backward
// steps.  (The reference's skip_kmers short-cut is dead code -- both
// branches leave it 0 -- so every saved partial is processed.)
static int64_t kmer_group(const Ctx& c, const int8_t* rd, int64_t& pos,
                          int64_t k, int64_t& total, Partial* partials) {
  int64_t pos_saved = pos;
  int64_t kmer_left = pos - k + 1;
  int a0 = rd[kmer_left];
  bool init_ok = a0 >= 0 && a0 < c.sigma;
  Iv fw = init_iv(c, a0);
  Iv rc = init_ok ? init_iv(c, c.sigma - 1 - a0) : Iv{1, 0, 0, 0};
  int64_t match_len = 1;
  int64_t partial_count = k / 2;
  int64_t non_ext = k - partial_count;
  int64_t kmer_middle = pos_saved - partial_count;
  int64_t saved = 0;
  int64_t kmer_right = kmer_left;
  int64_t found = 0;
  while (kmer_right < pos_saved) {
    int64_t next_pos = kmer_right + 1;
    int cc = rd[next_pos];
    bool ok = init_ok && cc >= 0 && cc < c.sigma
              && extend_bidir(c, c.sigma - 1 - cc, rc, fw);  // extend_right
    if (!ok) { pos = kmer_right; break; }
    match_len++;
    kmer_right = next_pos;
    pos = kmer_right;
    if (kmer_right > kmer_middle && kmer_right != pos_saved) {
      partials[match_len - non_ext - 1] = Partial{fw, match_len};
      saved++;
    }
  }
  if (kmer_right == pos_saved) {
    found++;
    total += count(c, fw);
    kmer_right--;
    pos = kmer_right;
  }
  if (kmer_right > kmer_middle) {
    for (int64_t i = 0; i < saved; i++) {
      Iv f = partials[i].fw;
      int64_t ml = partials[i].ml;
      int64_t kle = kmer_left;
      while (ml < k && kle > 0) {
        if (!bs_step(c, rd[kle - 1], f)) break;
        kle--;
        ml++;
      }
      if (ml == k) { found++; total += count(c, f); }
    }
    pos = kmer_middle;
  }
  return found;
}

}  // namespace scalar_search

extern "C" {

using scalar_search::Ctx;
using scalar_search::Iv;

// Count queries; returns sum over reads of (matched + count).
int64_t movi_scalar_count(const int32_t* n, const int32_t* off,
                          const int64_t* id, const int32_t* nd,
                          const int32_t* nu, const int64_t* all_p,
                          const int64_t* init_tab, int64_t r,
                          int32_t sigma, const int8_t* reads,
                          int64_t num_reads, int64_t read_len) {
  Ctx c{n, off, id, nd, nu, all_p, init_tab, nullptr, nullptr, r, sigma};
  int64_t checksum = 0;
  for (int64_t q = 0; q < num_reads; q++) {
    const int8_t* rd = reads + q * read_len;
    int64_t pos = read_len - 1;
    int a = rd[pos];
    if (a < 0 || a >= sigma) continue;
    Iv iv = scalar_search::init_iv(c, a);
    int64_t matched = 1;
    while (pos > 0) {
      if (!scalar_search::bs_step(c, rd[pos - 1], iv)) break;
      pos--;
      matched++;
    }
    checksum += matched + scalar_search::count(c, iv);
  }
  return checksum;
}

// ZML; returns the sum of all emitted matching lengths.
int64_t movi_scalar_zml(const int32_t* n, const int32_t* off,
                        const int64_t* id, const int32_t* nd,
                        const int32_t* nu, const int64_t* all_p,
                        const int64_t* init_tab, int64_t r, int32_t sigma,
                        const int8_t* reads, int64_t num_reads,
                        int64_t read_len) {
  Ctx c{n, off, id, nd, nu, all_p, init_tab, nullptr, nullptr, r, sigma};
  int64_t checksum = 0;
  for (int64_t q = 0; q < num_reads; q++) {
    const int8_t* rd = reads + q * read_len;
    int64_t pos = read_len - 1;
    while (pos >= 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
    if (pos < 0) continue;
    Iv iv = scalar_search::init_iv(c, rd[pos]);
    int64_t ml = 0;
    while (pos > 0) {
      Iv niv = iv;
      if (scalar_search::bs_step(c, rd[pos - 1], niv)) {
        checksum += ml;
        pos--;
        ml++;
        iv = niv;
      } else {
        checksum += ml;
        pos--;
        ml = 0;
        while (pos > 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
        iv = scalar_search::init_iv(c, rd[pos]);
      }
    }
    if (scalar_search::empty(iv)) ml = 0;
    checksum += ml;
  }
  return checksum;
}

// K-mer membership with look-ahead skipping; returns total found kmers.
int64_t movi_scalar_kmer_membership(
    const int32_t* n, const int32_t* off, const int64_t* id,
    const int32_t* nd, const int32_t* nu, const int64_t* all_p,
    const int64_t* init_tab, int64_t r, int32_t sigma,
    const int8_t* reads, int64_t num_reads, int64_t read_len,
    int64_t k) {
  Ctx c{n, off, id, nd, nu, all_p, init_tab, nullptr, nullptr, r, sigma};
  int64_t found_total = 0;
  int64_t step = k / 3;
  for (int64_t q = 0; q < num_reads; q++) {
    const int8_t* rd = reads + q * read_len;
    int64_t pos = read_len - 1;
    while (pos >= 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
    while (pos >= k - 1) {
      if (pos >= k - 1 + step
          && !scalar_search::look_ahead(c, rd, pos, step, k)) {
        pos = pos - step - 1;
      } else {
        int64_t found = 0;
        pos = scalar_search::kmers_from(c, rd, pos, k, found);
        found_total += found;
      }
      while (pos >= 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
    }
  }
  return found_total;
}

// Exact k-mer counts via the bidirectional k/2 cache + look-ahead;
// returns found kmers, writes the summed interval counts to out_total.
// Requires an rc-complete index (prepare_ref default).
int64_t movi_scalar_kmer_count(
    const int32_t* n, const int32_t* off, const int64_t* id,
    const int32_t* nd, const int32_t* nu, const int64_t* all_p,
    const int64_t* init_tab, const int64_t* skipP, const uint8_t* skipU,
    int64_t r, int32_t sigma, const int8_t* reads, int64_t num_reads,
    int64_t read_len, int64_t k, int64_t* out_total) {
  Ctx c{n, off, id, nd, nu, all_p, init_tab, skipP, skipU, r, sigma};
  int64_t found_total = 0, counts_total = 0;
  int64_t step = k / 3;
  std::vector<scalar_search::Partial> partials((size_t)(k / 2 + 1));
  for (int64_t q = 0; q < num_reads; q++) {
    const int8_t* rd = reads + q * read_len;
    int64_t pos = read_len - 1;
    while (pos >= 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
    while (pos >= k - 1) {
      if (pos >= k - 1 + step
          && !scalar_search::look_ahead(c, rd, pos, step, k)) {
        pos = pos - step - 1;
      } else {
        found_total += scalar_search::kmer_group(c, rd, pos, k,
                                                 counts_total,
                                                 partials.data());
      }
      while (pos >= 0 && (rd[pos] < 0 || rd[pos] >= sigma)) pos--;
    }
  }
  *out_total = counts_total;
  return found_total;
}

// MEM finding (BML); returns sum over MEMs of (start*3 + end*5 +
// count*7), writes the MEM count to out_nmems.  Requires an
// rc-complete index.
int64_t movi_scalar_mem_bml(
    const int32_t* n, const int32_t* off, const int64_t* id,
    const int32_t* nd, const int32_t* nu, const int64_t* all_p,
    const int64_t* init_tab, const int64_t* skipP, const uint8_t* skipU,
    int64_t r, int32_t sigma, const int8_t* reads, int64_t num_reads,
    int64_t read_len, int64_t L, int64_t* out_nmems) {
  Ctx c{n, off, id, nd, nu, all_p, init_tab, skipP, skipU, r, sigma};
  int64_t checksum = 0, nmems = 0;
  for (int64_t q = 0; q < num_reads; q++) {
    const int8_t* rd = reads + q * read_len;
    int64_t m = read_len;
    int64_t pos = 0;
    while (pos < m) {
      if (pos + L > m) { pos = m; break; }
      int64_t init_pos = pos + L - 1;
      int a0 = rd[init_pos];
      bool legal0 = a0 >= 0 && a0 < sigma;
      Iv fw = scalar_search::init_iv(c, a0);
      Iv rc = legal0 ? scalar_search::init_iv(c, sigma - 1 - a0)
                     : Iv{1, 0, 0, 0};
      init_pos--;
      // backward extension over the rest of the length-L window
      bool failed = false;
      for (int64_t j = 0; j <= init_pos - pos; j++) {
        int cc = rd[init_pos - j];
        if (!(legal0 && scalar_search::extend_bidir(c, cc, fw, rc))) {
          pos = init_pos - j + 1;
          failed = true;
          break;
        }
      }
      if (failed) continue;
      // forward extension to maximality (plain rc steps of comp(char))
      int64_t i = pos + L;
      for (; i < m; i++) {
        int cc = rd[i];
        int a = (cc >= 0 && cc < sigma) ? (sigma - 1 - cc) : 0;
        Iv rc2 = rc;
        if (!scalar_search::bs_step(c, a, rc2)) break;
        rc = rc2;
      }
      checksum += pos * 3 + i * 5 + scalar_search::count(c, rc) * 7;
      nmems++;
      int64_t end_pos = i;
      if (end_pos >= m) { pos = m; break; }
      // backward scan from the MEM end to the next candidate left end
      int64_t ip = end_pos;
      Iv f2 = scalar_search::init_iv(c, rd[ip]);
      ip--;
      int64_t i2 = 0;
      while (i2 <= ip - (pos + 1)) {
        Iv nf = f2;
        if (!scalar_search::bs_step(c, rd[ip - i2], nf)) break;
        f2 = nf;
        i2++;
      }
      pos = ip - i2 + 1;
    }
  }
  *out_nmems = nmems;
  return checksum;
}

}  // extern "C"
