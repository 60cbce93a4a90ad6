// Fast text-matrix writer — native backend for io/writer.py.
//
// Counterpart of fast_reader.cpp: emits the reference file grammar
// (/root/reference/src/reader/file_matrix_reader.hpp: "dense|sparse",
// dims, [nnz], entries; complex entries as "re im" pairs) from caller
// buffers. np.savetxt formats rows in Python (~19 s for the 1M-row bench
// file); this streams snprintf'd chunks through a 4 MiB buffer instead.
//
// Build: make -C native   (compiled into libfast_reader.so)
// ABI: plain C, consumed via ctypes (io/native.py).

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

class BufferedFile {
 public:
  explicit BufferedFile(const char* path) : f_(std::fopen(path, "wb")) {
    buf_.reserve(kCap + 512);
  }
  ~BufferedFile() { close(); }

  // Flush + fclose, capturing BOTH failure sources: a short fwrite of our
  // buffer and an error draining stdio's own buffer inside fclose (e.g.
  // ENOSPC) — otherwise a truncated file could report success.
  bool close() {
    if (!f_) return !failed_;
    flush();
    if (std::fclose(f_) != 0) failed_ = true;
    f_ = nullptr;
    return !failed_;
  }
  bool ok() const { return f_ != nullptr && !failed_; }

  void append(const char* s, size_t n) {
    buf_.append(s, n);
    if (buf_.size() >= kCap) flush();
  }
  void append_str(const char* s) { append(s, std::strlen(s)); }

  void number(double v) {
    char tmp[40];
    int n = std::snprintf(tmp, sizeof tmp, "%.17g", v);
    append(tmp, static_cast<size_t>(n));
  }
  void integer(long v) {
    char tmp[32];
    int n = std::snprintf(tmp, sizeof tmp, "%ld", v);
    append(tmp, static_cast<size_t>(n));
  }

  void flush() {
    if (!f_ || buf_.empty()) return;
    if (std::fwrite(buf_.data(), 1, buf_.size(), f_) != buf_.size())
      failed_ = true;
    buf_.clear();
  }

 private:
  static constexpr size_t kCap = 4u << 20;
  FILE* f_;
  std::string buf_;
  bool failed_ = false;
};

void set_err(char* err, int errlen, const char* msg) {
  if (err && errlen > 0) {
    std::snprintf(err, static_cast<size_t>(errlen), "%s", msg);
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 on IO failure (message in err).
int eigsol_write_dense(const char* path, long rows, long cols,
                       const double* re, const double* im, char* err,
                       int errlen) {
  BufferedFile out(path);
  if (!out.ok()) {
    set_err(err, errlen, "cannot open file for writing");
    return 1;
  }
  out.append_str("dense\n");
  out.integer(rows);
  out.append_str(" ");
  out.integer(cols);
  out.append_str("\n");
  for (long r = 0; r < rows; ++r) {
    for (long c = 0; c < cols; ++c) {
      if (c) out.append_str(" ");
      long i = r * cols + c;
      out.number(re[i]);
      if (im) {
        out.append_str(" ");
        out.number(im[i]);
      }
    }
    out.append_str("\n");
  }
  if (!out.close()) {
    set_err(err, errlen, "short write");
    return 1;
  }
  return 0;
}

int eigsol_write_sparse(const char* path, long rows, long cols, long nnz,
                        const long* r, const long* c, const double* re,
                        const double* im, char* err, int errlen) {
  BufferedFile out(path);
  if (!out.ok()) {
    set_err(err, errlen, "cannot open file for writing");
    return 1;
  }
  out.append_str("sparse\n");
  out.integer(rows);
  out.append_str(" ");
  out.integer(cols);
  out.append_str("\n");
  out.integer(nnz);
  out.append_str("\n");
  for (long i = 0; i < nnz; ++i) {
    out.integer(r[i]);
    out.append_str(" ");
    out.integer(c[i]);
    out.append_str(" ");
    out.number(re[i]);
    if (im) {
      out.append_str(" ");
      out.number(im[i]);
    }
    out.append_str("\n");
  }
  if (!out.close()) {
    set_err(err, errlen, "short write");
    return 1;
  }
  return 0;
}

}  // extern "C"
