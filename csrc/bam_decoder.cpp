// Host-side streaming BAM decoder: multithreaded BGZF inflate + columnar
// record extraction.
//
// TPU-era replacement for the reference's noodles-bam/noodles-bgzf ingest
// path (reference: src/alignment_parser.rs:301-437 record streaming;
// noodles multithreaded bgzf, main.rs:408-414). Responsibilities here are
// deliberately narrow: inflate, decode the fields the quantifier needs
// (name grouping, flags, ref id, position, CIGAR reference span, sequence
// length, AS score, CB barcode), verify name-collation, and hand columnar
// arrays to Python where the vectorized filter + CSR pack run.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC bam_decoder.cpp
//        -o liboarfish_host.so -lz -pthread

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <libdeflate.h>
#include <zlib.h>

namespace {

// Phase timing to stderr when OARFISH_DECODE_TIMING is set.
struct PhaseTimer {
  bool on = getenv("OARFISH_DECODE_TIMING") != nullptr;
  std::chrono::steady_clock::time_point t0 = std::chrono::steady_clock::now();
  void mark(const char* what) {
    if (!on) return;
    auto t1 = std::chrono::steady_clock::now();
    fprintf(stderr, "[decode] %-10s %7.1f ms\n", what,
            std::chrono::duration<double, std::milli>(t1 - t0).count());
    t0 = t1;
  }
};

}  // namespace

namespace {

struct Block {
  size_t in_off;
  size_t in_size;   // total member size
  size_t out_off;
  size_t out_size;  // ISIZE
};

bool scan_blocks(const uint8_t* data, size_t n, std::vector<Block>& blocks,
                 size_t& total_out, std::string& err) {
  size_t pos = 0;
  total_out = 0;
  while (pos < n) {
    if (pos + 18 > n || data[pos] != 0x1f || data[pos + 1] != 0x8b) {
      err = "bad gzip magic at offset " + std::to_string(pos);
      return false;
    }
    uint8_t flg = data[pos + 3];
    if (!(flg & 0x04)) {
      err = "gzip member without FEXTRA; not a BGZF file";
      return false;
    }
    uint16_t xlen;
    memcpy(&xlen, data + pos + 10, 2);
    size_t xpos = pos + 12, xend = xpos + xlen;
    if (xend > n) {
      err = "truncated BGZF FEXTRA field";
      return false;
    }
    size_t bsize = 0;
    while (xpos + 4 <= xend) {
      uint8_t si1 = data[xpos], si2 = data[xpos + 1];
      uint16_t slen;
      memcpy(&slen, data + xpos + 2, 2);
      if (si1 == 'B' && si2 == 'C' && slen == 2 && xpos + 6 <= xend) {
        uint16_t bs;
        memcpy(&bs, data + xpos + 4, 2);
        bsize = size_t(bs) + 1;
      }
      xpos += 4 + slen;
    }
    // the compressed payload sits between the FEXTRA field and the
    // 8-byte CRC/ISIZE trailer: bsize must cover header + trailer or
    // the inflate-side length arithmetic underflows
    if (!bsize || pos + bsize > n || bsize < 12 + size_t(xlen) + 8) {
      err = "BGZF block missing/invalid BC subfield";
      return false;
    }
    uint32_t isize;
    memcpy(&isize, data + pos + bsize - 4, 4);
    blocks.push_back({pos, bsize, total_out, isize});
    total_out += isize;
    pos += bsize;
  }
  return true;
}

// libdeflate raw-deflate decompress (~3x zlib); one reusable
// decompressor per worker thread.
bool inflate_block(const uint8_t* src, const Block& b, uint8_t* dst,
                   libdeflate_decompressor* dec) {
  uint16_t xlen;
  memcpy(&xlen, src + b.in_off + 10, 2);
  const uint8_t* comp = src + b.in_off + 12 + xlen;
  size_t comp_len = b.in_size - 12 - xlen - 8;
  if (b.out_size == 0) return true;
  size_t actual = 0;
  auto rc = libdeflate_deflate_decompress(dec, comp, comp_len,
                                          dst + b.out_off, b.out_size,
                                          &actual);
  return rc == LIBDEFLATE_SUCCESS && actual == b.out_size;
}

// CIGAR ops consuming the reference: M(0) D(2) N(3) =(7) X(8)
inline bool consumes_ref(uint32_t op) {
  return op == 0 || op == 2 || op == 3 || op == 7 || op == 8;
}

struct Columns {
  std::vector<int64_t> group_id;
  std::vector<uint16_t> flag;
  std::vector<int32_t> ref_id;
  std::vector<int64_t> pos;
  std::vector<int64_t> ref_span;
  std::vector<int64_t> seq_len;
  std::vector<int64_t> score;
  std::vector<uint8_t> has_score;
  std::vector<int64_t> cb_id;  // barcode id per record (-1 if no CB)
};

}  // namespace

extern "C" {

struct OarfishDecoded {
  int64_t n_records;
  int64_t n_groups;
  int64_t n_refs;
  int64_t num_unmapped;
  int64_t* group_id;
  uint16_t* flag;
  int32_t* ref_id;
  int64_t* pos;
  int64_t* ref_span;
  int64_t* seq_len;
  int64_t* score;
  uint8_t* has_score;
  int64_t* cb_id;
  // header
  char* header_text;
  int64_t header_text_len;
  char* ref_names;  // \0-separated, n_refs entries
  int64_t ref_names_len;
  int64_t* ref_lengths;
  // group head names (\0-separated, n_groups entries) when requested
  char* group_names;
  int64_t group_names_len;
  // distinct barcodes (\0-separated) in first-seen order, when present
  char* barcodes;
  int64_t barcodes_len;
  int64_t n_barcodes;
  // status
  char* error;  // malloc'd message on failure (all arrays null then)
  char* dup_name;  // set when the collation check failed
};

void oarfish_decoded_free(OarfishDecoded* d) {
  if (!d) return;
  free(d->group_id);
  free(d->flag);
  free(d->ref_id);
  free(d->pos);
  free(d->ref_span);
  free(d->seq_len);
  free(d->score);
  free(d->has_score);
  free(d->cb_id);
  free(d->header_text);
  free(d->ref_names);
  free(d->ref_lengths);
  free(d->group_names);
  free(d->barcodes);
  free(d->error);
  free(d->dup_name);
  free(d);
}

}  // extern "C" (reopened below)

static OarfishDecoded* make_error(const std::string& msg) {
  auto* d = static_cast<OarfishDecoded*>(calloc(1, sizeof(OarfishDecoded)));
  d->error = strdup(msg.c_str());
  return d;
}

template <typename T>
static T* steal(std::vector<T>& v) {
  T* p = static_cast<T*>(malloc(v.size() * sizeof(T)));
  memcpy(p, v.data(), v.size() * sizeof(T));
  return p;
}
struct Part {
  Columns c;
  std::string names_blob;          // group-head names, \0-separated
  std::vector<size_t> name_off;    // offsets into names_blob (per group)
  std::vector<std::string> bc_order;  // local barcodes, first-seen
  int64_t num_unmapped = 0;
  int64_t n_groups = 0;
  std::string last_name;           // name of the final group (if any)
  bool parse_error = false;
};

// Parallel field extraction over contiguous record ranges of one
// window buffer. Grouping is local to each part; the sequential merge
// stitches name groups across part (and window) boundaries.
static bool scan_records(const uint8_t* p,
                         const std::vector<size_t>& rec_offs,
                         int threads, int want_barcodes,
                         int64_t /*unused*/, std::vector<Part>& parts) {
  int64_t n_recs = int64_t(rec_offs.size());
  int nt = threads > 0 ? threads : 1;
  if (nt > 16) nt = 16;
  if (n_recs < 4096) nt = 1;
  parts.assign(size_t(nt), Part());
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
      pool.emplace_back([&, t] {
        Part& pt = parts[t];
        int64_t lo = n_recs * t / nt, hi = n_recs * (t + 1) / nt;
        std::unordered_map<std::string, int64_t> bc_local;
        int64_t group = -1;
        std::string prev_name;
        bool have_prev = false;
        for (int64_t ri = lo; ri < hi; ri++) {
          const uint8_t* r = p + rec_offs[ri] + 4;
          int32_t block_size;
          memcpy(&block_size, p + rec_offs[ri], 4);
          // within-record bounds: the offset scan only validated that
          // the record fits the buffer; a corrupt record must become a
          // clean parse error, never an out-of-bounds read
          if (block_size < 33) {  // 32 fixed bytes + >=1 name byte
            pt.parse_error = true;
            return;
          }
          const size_t rec_end = size_t(block_size);
          int32_t ref_id, pos_, l_seq;
          memcpy(&ref_id, r, 4);
          memcpy(&pos_, r + 4, 4);
          uint8_t l_read_name = r[8];
          uint16_t n_cigar, flag_;
          memcpy(&n_cigar, r + 12, 2);
          memcpy(&flag_, r + 14, 2);
          memcpy(&l_seq, r + 16, 4);
          const char* name = reinterpret_cast<const char*>(r + 32);
          if (l_read_name == 0 || l_seq < 0 ||
              32 + size_t(l_read_name) > rec_end) {
            pt.parse_error = true;
            return;
          }
          size_t name_len = size_t(l_read_name) - 1;

          if (flag_ & 0x4) {
            pt.num_unmapped++;
            continue;
          }

          size_t cig_off = 32 + l_read_name;
          size_t tag_off = cig_off + 4 * size_t(n_cigar) +
                           (size_t(l_seq) + 1) / 2 + size_t(l_seq);
          if (cig_off + 4 * size_t(n_cigar) > rec_end ||
              tag_off > rec_end) {
            pt.parse_error = true;
            return;
          }
          int64_t span = 0;
          for (uint16_t i = 0; i < n_cigar; i++) {
            uint32_t cv;
            memcpy(&cv, r + cig_off + 4 * size_t(i), 4);
            if (consumes_ref(cv & 0xF)) span += cv >> 4;
          }
          int64_t score = 0;
          bool has_score = false;
          int64_t cb = -1;
          bool tag_bad = false;
          auto fits = [&](size_t k) {
            if (tag_off + k <= rec_end) return true;
            tag_bad = true;
            return false;
          };
          while (!tag_bad && tag_off + 3 <= rec_end) {
            uint8_t t0 = r[tag_off], t1 = r[tag_off + 1], vt = r[tag_off + 2];
            tag_off += 3;
            switch (vt) {
              case 'A':
                if (!fits(1)) break;
                tag_off += 1;
                break;
              case 'c': {
                if (!fits(1)) break;
                if (t0 == 'A' && t1 == 'S') {
                  score = *reinterpret_cast<const int8_t*>(r + tag_off);
                  has_score = true;
                }
                tag_off += 1;
                break;
              }
              case 'C': {
                if (!fits(1)) break;
                if (t0 == 'A' && t1 == 'S') {
                  score = r[tag_off];
                  has_score = true;
                }
                tag_off += 1;
                break;
              }
              case 's': {
                if (!fits(2)) break;
                if (t0 == 'A' && t1 == 'S') {
                  int16_t v;
                  memcpy(&v, r + tag_off, 2);
                  score = v;
                  has_score = true;
                }
                tag_off += 2;
                break;
              }
              case 'S': {
                if (!fits(2)) break;
                if (t0 == 'A' && t1 == 'S') {
                  uint16_t v;
                  memcpy(&v, r + tag_off, 2);
                  score = v;
                  has_score = true;
                }
                tag_off += 2;
                break;
              }
              case 'i': {
                if (!fits(4)) break;
                if (t0 == 'A' && t1 == 'S') {
                  int32_t v;
                  memcpy(&v, r + tag_off, 4);
                  score = v;
                  has_score = true;
                }
                tag_off += 4;
                break;
              }
              case 'I': {
                if (!fits(4)) break;
                if (t0 == 'A' && t1 == 'S') {
                  uint32_t v;
                  memcpy(&v, r + tag_off, 4);
                  score = v;
                  has_score = true;
                }
                tag_off += 4;
                break;
              }
              case 'f':
                if (!fits(4)) break;
                tag_off += 4;
                break;
              case 'Z':
              case 'H': {
                size_t z = tag_off;
                while (z < rec_end && r[z] != 0) z++;
                if (want_barcodes && t0 == 'C' && t1 == 'B' && vt == 'Z') {
                  std::string bc(reinterpret_cast<const char*>(r + tag_off),
                                 z - tag_off);
                  auto it = bc_local.find(bc);
                  if (it == bc_local.end()) {
                    cb = int64_t(pt.bc_order.size());
                    bc_local.emplace(bc, cb);
                    pt.bc_order.push_back(bc);
                  } else {
                    cb = it->second;
                  }
                }
                tag_off = z + 1;
                break;
              }
              case 'B': {
                if (!fits(5)) break;
                uint8_t sub = r[tag_off];
                uint32_t count;
                memcpy(&count, r + tag_off + 1, 4);
                size_t esz;
                switch (sub) {
                  case 'c': case 'C': esz = 1; break;
                  case 's': case 'S': esz = 2; break;
                  case 'i': case 'I': case 'f': esz = 4; break;
                  default:
                    pt.parse_error = true;
                    return;
                }
                if (size_t(count) > (rec_end - tag_off - 5) / esz) {
                  tag_bad = true;
                  break;
                }
                tag_off += 5 + esz * size_t(count);
                break;
              }
              default:
                pt.parse_error = true;
                return;
            }
          }
          if (tag_bad) {
            pt.parse_error = true;
            return;
          }

          bool same = have_prev && prev_name.size() == name_len &&
                      memcmp(prev_name.data(), name, name_len) == 0;
          if (!same) {
            group++;
            prev_name.assign(name, name_len);
            have_prev = true;
            pt.name_off.push_back(pt.names_blob.size());
            pt.names_blob.append(name, name_len);
            pt.names_blob.push_back('\0');
          }
          if (ref_id < 0) continue;  // mapped but no reference: never pushed

          pt.c.group_id.push_back(group);
          pt.c.flag.push_back(flag_);
          pt.c.ref_id.push_back(ref_id);
          pt.c.pos.push_back(pos_);
          pt.c.ref_span.push_back(span);
          pt.c.seq_len.push_back(l_seq);
          pt.c.score.push_back(score);
          pt.c.has_score.push_back(has_score ? 1 : 0);
          if (want_barcodes) pt.c.cb_id.push_back(cb);
        }
        pt.n_groups = group + 1;
        pt.last_name = prev_name;
      });
    }
    for (auto& th : pool) th.join();
  }
  for (auto& pt : parts)
    if (pt.parse_error) return false;
  return true;
}

// Growable malloc-backed output column (released to the caller, freed
// by oarfish_decoded_free). Doubling growth; release() trims.
template <typename T>
struct GrowBuf {
  T* p = nullptr;
  size_t n = 0, cap = 0;
  void grow(size_t add) {
    if (n + add <= cap) return;
    size_t want = n + add;
    size_t c2 = cap ? cap * 2 : 4096;
    if (c2 < want) c2 = want;
    p = static_cast<T*>(realloc(p, c2 * sizeof(T)));
    cap = c2;
  }
  T* release() {
    if (p && n < cap)
      p = static_cast<T*>(realloc(p, (n ? n : 1) * sizeof(T)));
    T* q = p;
    p = nullptr;
    cap = n = 0;
    return q;
  }
  ~GrowBuf() { free(p); }
};

extern "C" {

// Streaming decode: the compressed file is memory-mapped (the OS pages
// it in sequentially and can evict behind us) and inflated in bounded
// WINDOWS (default 256 MB of inflated data; OARFISH_DECODE_WINDOW_MB
// overrides — tests use tiny windows to force many of them). Records
// that straddle a window boundary are carried as a byte tail into the
// next window. Peak RSS is therefore O(columns + one window), not
// O(compressed + inflated whole file) as the previous whole-file
// implementation required — the reference streams through noodles the
// same way (SURVEY: alignment_parser.rs record streaming).
OarfishDecoded* oarfish_decode_bam(const char* path, int threads,
                                   int keep_names, int64_t sort_check_num,
                                   int want_barcodes) {
  PhaseTimer tm;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return make_error(std::string("cannot open ") + path);
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size <= 0) {
    close(fd);
    return make_error(std::string("cannot stat ") + path);
  }
  size_t fsize = size_t(st.st_size);
  void* map = mmap(nullptr, fsize, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED)
    return make_error(std::string("cannot mmap ") + path);
  madvise(map, fsize, MADV_SEQUENTIAL);
  const uint8_t* comp = static_cast<const uint8_t*>(map);
  auto fail = [&](const std::string& msg) {
    munmap(map, fsize);
    return make_error(msg);
  };
  tm.mark("open");

  std::vector<Block> blocks;
  size_t total_out = 0;
  std::string err;
  if (!scan_blocks(comp, fsize, blocks, total_out, err)) return fail(err);
  tm.mark("index");

  size_t WBYTES = 256ull << 20;
  if (const char* we = getenv("OARFISH_DECODE_WINDOW_MB")) {
    long mb = atol(we);
    if (mb > 0) WBYTES = size_t(mb) << 20;
  }
  if (const char* we = getenv("OARFISH_DECODE_WINDOW_BYTES")) {
    long b = atol(we);  // test hook: force many tiny windows
    if (b > 0) WBYTES = size_t(b);
  }

  // window buffer: carried tail bytes + the next blocks' inflated data
  std::vector<uint8_t> win;
  size_t bi = 0;  // next block to inflate
  int nt_inf = threads > 0 ? threads : 1;
  auto fill_window = [&]() -> bool {  // false on inflate failure
    size_t carry = win.size();
    size_t first = bi, add = 0;
    while (bi < blocks.size() && add < WBYTES) {
      add += blocks[bi].out_size;
      bi++;
    }
    if (add == 0) return true;
    win.resize(carry + add);
    const size_t base = blocks[first].out_off;
    std::atomic<size_t> next{first};
    std::atomic<bool> ok{true};
    std::vector<std::thread> pool;
    int nw = int(std::min<size_t>(size_t(nt_inf), bi - first));
    for (int t = 0; t < nw; t++) {
      pool.emplace_back([&] {
        libdeflate_decompressor* dec = libdeflate_alloc_decompressor();
        size_t i;
        while ((i = next.fetch_add(1)) < bi) {
          Block b = blocks[i];
          b.out_off = carry + (b.out_off - base);
          if (!inflate_block(comp, b, win.data(), dec)) ok.store(false);
        }
        libdeflate_free_decompressor(dec);
      });
    }
    for (auto& th : pool) th.join();
    return ok.load();
  };

  // --- header: grow the first window until it parses completely
  std::string header_text, ref_names;
  std::vector<int64_t> ref_lengths;
  int32_t n_ref = 0;
  size_t off = 0;
  for (;;) {
    if (!fill_window()) return fail("BGZF inflate failure");
    const uint8_t* p = win.data();
    size_t have = win.size();
    if (have < 12) {
      if (bi >= blocks.size()) return fail("missing BAM magic");
      continue;
    }
    if (memcmp(p, "BAM\x01", 4) != 0) return fail("missing BAM magic");
    int32_t l_text;
    memcpy(&l_text, p + 4, 4);
    if (l_text < 0) return fail("corrupt BAM header");
    size_t o = 8 + size_t(l_text);
    if (o + 4 > have) {
      if (bi >= blocks.size()) return fail("truncated BAM header");
      continue;
    }
    memcpy(&n_ref, p + o, 4);
    o += 4;
    if (n_ref < 0) return fail("corrupt BAM header");
    bool complete = true;
    std::string names;
    std::vector<int64_t> lens;
    lens.reserve(size_t(n_ref));
    for (int i = 0; i < n_ref; i++) {
      if (o + 4 > have) { complete = false; break; }
      int32_t l_name;
      memcpy(&l_name, p + o, 4);
      o += 4;
      if (l_name <= 0 || o + size_t(l_name) + 4 > have) {
        if (l_name <= 0) return fail("corrupt BAM header");
        complete = false;
        break;
      }
      names.append(reinterpret_cast<const char*>(p + o),
                   size_t(l_name) - 1);
      names.push_back('\0');
      o += size_t(l_name);
      int32_t l_ref;
      memcpy(&l_ref, p + o, 4);
      o += 4;
      lens.push_back(l_ref);
    }
    if (!complete) {
      if (bi >= blocks.size()) return fail("truncated BAM header");
      continue;
    }
    header_text.assign(reinterpret_cast<const char*>(p + 8),
                       size_t(l_text));
    ref_names = std::move(names);
    ref_lengths = std::move(lens);
    off = o;
    break;
  }
  // drop the header bytes: the remainder is the first record carry
  win.erase(win.begin(), win.begin() + off);
  tm.mark("header");

  // --- global accumulation state (spans windows)
  GrowBuf<int64_t> out_group_id, out_pos, out_ref_span, out_seq_len,
      out_score, out_cb_id;
  GrowBuf<uint16_t> out_flag;
  GrowBuf<int32_t> out_ref_id;
  GrowBuf<uint8_t> out_has_score;
  std::string group_names;
  std::vector<std::string> barcode_order;
  std::unordered_map<std::string, int64_t> bc_lookup;
  std::unordered_set<std::string> seen_names;
  int64_t num_unmapped = 0;
  int64_t checked_groups = 0;
  char* dup_name = nullptr;
  int64_t group = -1;      // last global group id
  std::string carry_name;  // name of the last group so far
  bool have_carry = false;
  size_t tot = 0;

  std::vector<size_t> rec_offs;
  std::vector<Part> parts;
  for (;;) {
    if (win.empty() && bi >= blocks.size()) break;
    // record boundaries within this window; leftover bytes carry over
    rec_offs.clear();
    const uint8_t* p = win.data();
    const size_t have = win.size();
    size_t o = 0;
    while (o + 4 <= have) {
      int32_t block_size;
      memcpy(&block_size, p + o, 4);
      if (block_size < 0) {
        free(dup_name);
        return fail("corrupt BAM record");
      }
      if (o + 4 + size_t(block_size) > have) break;
      rec_offs.push_back(o);
      o += 4 + size_t(block_size);
    }
    if (rec_offs.empty() && bi >= blocks.size()) {
      free(dup_name);
      return fail("truncated BAM record");
    }

    if (!scan_records(p, rec_offs, threads, want_barcodes,
                      sort_check_num, parts)) {
      free(dup_name);
      return fail(
          "corrupt BAM record (bad field bounds or unknown tag type)");
    }

    // --- merge this window's parts into the global columns: group-id
    // bases with boundary stitching, global barcode remap (first-seen
    // order), collation check over the first `sort_check_num` names
    for (auto& pt : parts) {
      num_unmapped += pt.num_unmapped;
      int64_t group_base = 0;
      if (pt.n_groups > 0) {
        const char* first = pt.names_blob.data() + pt.name_off[0];
        bool stitch = have_carry && carry_name == first;
        group_base = group + (stitch ? 0 : 1);
        for (int64_t g = stitch ? 1 : 0; g < pt.n_groups; g++) {
          const char* nm = pt.names_blob.data() + pt.name_off[size_t(g)];
          if (keep_names) {
            group_names.append(nm);
            group_names.push_back('\0');
          }
          if (checked_groups < sort_check_num) {
            auto ins = seen_names.insert(nm);
            if (!ins.second && !dup_name) dup_name = strdup(nm);
            checked_groups++;
          }
        }
        group = group_base + pt.n_groups - 1;
        carry_name = pt.last_name;
        have_carry = true;
      }
      std::vector<int64_t> bc_map(pt.bc_order.size());
      for (size_t i = 0; i < pt.bc_order.size(); i++) {
        auto it = bc_lookup.find(pt.bc_order[i]);
        if (it == bc_lookup.end()) {
          bc_map[i] = int64_t(barcode_order.size());
          bc_lookup.emplace(pt.bc_order[i], bc_map[i]);
          barcode_order.push_back(pt.bc_order[i]);
        } else {
          bc_map[i] = it->second;
        }
      }
      const size_t m = pt.c.flag.size();
      out_group_id.grow(m);
      out_flag.grow(m);
      out_ref_id.grow(m);
      out_pos.grow(m);
      out_ref_span.grow(m);
      out_seq_len.grow(m);
      out_score.grow(m);
      out_has_score.grow(m);
      for (size_t i = 0; i < m; i++)
        out_group_id.p[out_group_id.n + i] = pt.c.group_id[i] + group_base;
      memcpy(out_flag.p + out_flag.n, pt.c.flag.data(), m * 2);
      memcpy(out_ref_id.p + out_ref_id.n, pt.c.ref_id.data(), m * 4);
      memcpy(out_pos.p + out_pos.n, pt.c.pos.data(), m * 8);
      memcpy(out_ref_span.p + out_ref_span.n, pt.c.ref_span.data(), m * 8);
      memcpy(out_seq_len.p + out_seq_len.n, pt.c.seq_len.data(), m * 8);
      memcpy(out_score.p + out_score.n, pt.c.score.data(), m * 8);
      memcpy(out_has_score.p + out_has_score.n, pt.c.has_score.data(), m);
      if (want_barcodes) {
        out_cb_id.grow(m);
        for (size_t i = 0; i < m; i++)
          out_cb_id.p[out_cb_id.n + i] =
              pt.c.cb_id[i] < 0 ? -1 : bc_map[size_t(pt.c.cb_id[i])];
        out_cb_id.n += m;
      }
      out_group_id.n += m;
      out_flag.n += m;
      out_ref_id.n += m;
      out_pos.n += m;
      out_ref_span.n += m;
      out_seq_len.n += m;
      out_score.n += m;
      out_has_score.n += m;
      tot += m;
      pt = Part();  // release
    }

    // carry the partial tail and refill
    const size_t consumed = o;
    win.erase(win.begin(), win.begin() + consumed);
    if (bi >= blocks.size()) {
      if (!win.empty()) {
        free(dup_name);
        return fail("truncated BAM record");
      }
      break;
    }
    if (!fill_window()) {
      free(dup_name);
      return fail("BGZF inflate failure");
    }
  }
  munmap(map, fsize);
  map = nullptr;
  tm.mark("scan+merge");

  std::string barcodes_blob;
  auto* d = static_cast<OarfishDecoded*>(calloc(1, sizeof(OarfishDecoded)));
  d->n_records = int64_t(tot);
  d->n_groups = group + 1;
  d->n_refs = n_ref;
  d->num_unmapped = num_unmapped;
  d->group_id = out_group_id.release();
  d->flag = out_flag.release();
  d->ref_id = out_ref_id.release();
  d->pos = out_pos.release();
  d->ref_span = out_ref_span.release();
  d->seq_len = out_seq_len.release();
  d->score = out_score.release();
  d->has_score = out_has_score.release();
  d->cb_id = want_barcodes ? out_cb_id.release() : nullptr;
  d->header_text = static_cast<char*>(malloc(header_text.size()));
  memcpy(d->header_text, header_text.data(), header_text.size());
  d->header_text_len = int64_t(header_text.size());
  d->ref_names = static_cast<char*>(malloc(ref_names.size()));
  memcpy(d->ref_names, ref_names.data(), ref_names.size());
  d->ref_names_len = int64_t(ref_names.size());
  d->ref_lengths = steal(ref_lengths);
  if (keep_names) {
    d->group_names = static_cast<char*>(malloc(group_names.size()));
    memcpy(d->group_names, group_names.data(), group_names.size());
    d->group_names_len = int64_t(group_names.size());
  }
  if (want_barcodes) {
    for (auto& bc : barcode_order) {
      barcodes_blob.append(bc);
      barcodes_blob.push_back('\0');
    }
    d->barcodes = static_cast<char*>(malloc(barcodes_blob.size()));
    memcpy(d->barcodes, barcodes_blob.data(), barcodes_blob.size());
    d->barcodes_len = int64_t(barcodes_blob.size());
    d->n_barcodes = int64_t(barcode_order.size());
  }
  d->dup_name = dup_name;
  tm.mark("finish");
  return d;
}

}  // extern "C"
