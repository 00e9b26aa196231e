// Native output-line assembly for the writer layer (quant/writers.py).
//
// Formats f64 values exactly like Rust's `Display` (the reference's
// writers print counts with `{}`: shortest round-trip decimal digits in
// positional notation, integral values without a fraction part) and
// assembles whole output lines for the large writer surfaces:
//   - `.count.mtx` MatrixMarket COO triplets (write_function.rs:25-70):
//     cells x nonzeros lines at single-cell scale (~10M+),
//   - `.quant` rows (write_function.rs:113-120),
//   - `.ambig_info.tsv` rows (write_function.rs:123-145).
// Per-line Python formatting costs minutes at that scale and the numpy
// np.char token path measured ~6 us/line (object-dtype overhead); this
// runs ~0.1 us/line/core and threads across chunks.
//
// Entry points return the number of bytes written, or -(bytes needed)
// when `cap` is too small (the caller re-calls with a larger buffer).

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Shortest round-trip f64 -> Rust-Display positional form. `buf` must
// hold >= 400 bytes (positional expansion of denormals). Returns length.
int fmt_f64_display(double v, char* buf) {
  if (std::isnan(v)) { std::memcpy(buf, "NaN", 3); return 3; }
  if (std::isinf(v)) {
    if (v < 0) { std::memcpy(buf, "-inf", 4); return 4; }
    std::memcpy(buf, "inf", 3); return 3;
  }
  if (v == std::trunc(v) && std::fabs(v) < 1e16) {
    return std::snprintf(buf, 32, "%lld", (long long)v);
  }
  if (std::fabs(v) < 1e16) {
    // libstdc++ to_chars(fixed) = Ryu shortest round-trip in positional
    // form. For non-integral |v| < 1e16 that is exactly the shortest
    // significant-digit string (Rust Display / Python repr digits): a
    // shorter digit string would also be a shorter fixed string, so
    // fixed-minimality and digit-minimality coincide. (They can diverge
    // for integral values >= 1e16, where trailing zeros are free in
    // fixed form — that range takes the %g expansion path below.)
    auto r = std::to_chars(buf, buf + 360, v, std::chars_format::fixed);
    return (int)(r.ptr - buf);
  }
  // Smallest precision p whose correctly-rounded %.pg round-trips ==
  // the shortest round-trip digit string (repr / Rust Display digits).
  // Round-trip success is monotone in p; binary-search then verify
  // minimality directly so byte-exactness never rests on the
  // monotonicity argument.
  char tmp[64];
  int lo = 1, hi = 17;
  while (lo < hi) {
    int mid = (lo + hi) / 2;
    std::snprintf(tmp, sizeof tmp, "%.*g", mid, v);
    if (std::strtod(tmp, nullptr) == v) hi = mid; else lo = mid + 1;
  }
  while (lo > 1) {  // belt-and-braces minimality check
    std::snprintf(tmp, sizeof tmp, "%.*g", lo - 1, v);
    if (std::strtod(tmp, nullptr) == v) --lo; else break;
  }
  int len = std::snprintf(tmp, sizeof tmp, "%.*g", lo, v);
  char* e = std::strchr(tmp, 'e');
  if (!e) { std::memcpy(buf, tmp, (size_t)len); return len; }

  // Expand exponent form positionally (|v| >= 1e16 or < 1e-4).
  int exp = std::atoi(e + 1);
  const char* p = tmp;
  char* o = buf;
  if (*p == '-') *o++ = *p++;
  char digits[32];
  int nd = 0;
  for (const char* q = p; q < e; ++q)
    if (*q != '.') digits[nd++] = *q;
  int point = 1 + exp;  // digits before the decimal point
  if (point <= 0) {
    *o++ = '0'; *o++ = '.';
    for (int i = 0; i < -point; ++i) *o++ = '0';
    std::memcpy(o, digits, (size_t)nd); o += nd;
  } else if (point >= nd) {
    std::memcpy(o, digits, (size_t)nd); o += nd;
    for (int i = 0; i < point - nd; ++i) *o++ = '0';
  } else {
    std::memcpy(o, digits, (size_t)point); o += point;
    *o++ = '.';
    std::memcpy(o, digits + point, (size_t)(nd - point)); o += nd - point;
  }
  return (int)(o - buf);
}

int fmt_i64(long long v, char* buf) {
  return std::snprintf(buf, 24, "%lld", v);
}

// Run `line_fn(i, scratch) -> len` over [0, n), threaded in contiguous
// chunks, concatenating into `out` (cap-limited). Returns written or
// -needed.
template <typename F>
int64_t assemble_lines(int64_t n, char* out, int64_t cap, F&& line_fn) {
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  if (n < 65536) nt = 1;
  std::vector<std::vector<char>> parts((size_t)nt);
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&, t, lo, hi]() {
      auto& buf = parts[(size_t)t];
      buf.reserve((size_t)(hi - lo) * 24);
      char scratch[512];
      for (int64_t i = lo; i < hi; ++i) {
        int len = line_fn(i, scratch);
        buf.insert(buf.end(), scratch, scratch + len);
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (auto& p : parts) total += (int64_t)p.size();
  if (total > cap) return -total;
  char* o = out;
  for (auto& p : parts) {
    std::memcpy(o, p.data(), p.size());
    o += p.size();
  }
  return total;
}

}  // namespace

extern "C" {

// ".count.mtx" body: "<rows[i]+1> <cols[i]+1> <vals[i]>\n" per i.
int64_t oarfish_mtx_lines(const int64_t* rows, const int64_t* cols,
                          const double* vals, int64_t n, char* out,
                          int64_t cap) {
  return assemble_lines(n, out, cap, [&](int64_t i, char* s) {
    char* o = s;
    o += fmt_i64(rows[i] + 1, o); *o++ = ' ';
    o += fmt_i64(cols[i] + 1, o); *o++ = ' ';
    o += fmt_f64_display(vals[i], o); *o++ = '\n';
    return (int)(o - s);
  });
}

// ".quant" body: "<name>\t<len>\t<count>\n". Names come as a
// concatenated u8 buffer + (n+1) offsets. Names longer than 400 bytes
// are rejected (return INT64_MIN) so the scratch cannot overflow.
int64_t oarfish_quant_lines(const uint8_t* name_buf,
                            const int64_t* name_off, const int64_t* lens,
                            const double* counts, int64_t n, char* out,
                            int64_t cap) {
  for (int64_t i = 0; i < n; ++i)
    if (name_off[i + 1] - name_off[i] > 400) return INT64_MIN;
  return assemble_lines(n, out, cap, [&](int64_t i, char* s) {
    char* o = s;
    int64_t nl = name_off[i + 1] - name_off[i];
    std::memcpy(o, name_buf + name_off[i], (size_t)nl); o += nl;
    *o++ = '\t';
    o += fmt_i64(lens[i], o); *o++ = '\t';
    o += fmt_f64_display(counts[i], o); *o++ = '\n';
    return (int)(o - s);
  });
}

// ".ambig_info.tsv" body: "<u>\t<max(t-u,0)>\t<t>\n".
int64_t oarfish_ambig_lines(const int64_t* uniq, const int64_t* total,
                            int64_t n, char* out, int64_t cap) {
  return assemble_lines(n, out, cap, [&](int64_t i, char* s) {
    char* o = s;
    long long u = uniq[i], t = total[i];
    long long a = t - u; if (a < 0) a = 0;
    o += fmt_i64(u, o); *o++ = '\t';
    o += fmt_i64(a, o); *o++ = '\t';
    o += fmt_i64(t, o); *o++ = '\n';
    return (int)(o - s);
  });
}

// Bare value tokens "<v>" separated by nothing, with (n+1) offsets out —
// lets Python slice tokens for surfaces this file doesn't assemble.
int64_t oarfish_fmt_f64(const double* vals, int64_t n, char* out,
                        int64_t cap, int64_t* offsets) {
  char scratch[512];
  int64_t pos = 0;
  offsets[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int len = fmt_f64_display(vals[i], scratch);
    if (pos + len <= cap) std::memcpy(out + pos, scratch, (size_t)len);
    pos += len;
    offsets[i + 1] = pos;
  }
  return pos <= cap ? pos : -pos;
}

}  // extern "C"
