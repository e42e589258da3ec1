// Native data loader for COMSOL text exports (and similar whitespace
// tables). The reference delegates parsing to pandas
// (CG_HQPINN_IBMtest_16qubits.py:261); production exports run to millions of
// nodes, so the framework ships a C++ fast path: mmap the file, skip
// '%'-comment headers, parse doubles with std::from_chars, fill a
// caller-provided buffer. Exposed via a C ABI for ctypes (no pybind11 in
// the image); qcpinn_tpu/data/cz_loader.py falls back to the Python parser
// when the shared object is absent.
//
// Build: make -C native   (produces native/libqcpinn_native.so)

#include <cerrno>
#include <cfloat>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_spaces(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t' || *c.p == ',' || *c.p == '\r'))
    ++c.p;
}

inline void skip_line(Cursor& c) {
  while (c.p < c.end && *c.p != '\n') ++c.p;
  if (c.p < c.end) ++c.p;
}

// std::from_chars<double> handles scientific notation and is locale-free.
inline bool parse_double(Cursor& c, double* out) {
  auto [ptr, ec] = std::from_chars(c.p, c.end, *out);
  if (ec != std::errc()) return false;
  c.p = ptr;
  return true;
}

}  // namespace

extern "C" {

// First pass: count data rows and columns (from the first data row).
// Returns 0 on success. Comment lines start with '%' or '#'.
int qcpinn_table_dims(const char* path, int64_t* rows, int64_t* cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  if (st.st_size == 0) { close(fd); *rows = 0; *cols = 0; return 0; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return -3;

  Cursor c{static_cast<const char*>(mem),
           static_cast<const char*>(mem) + st.st_size};
  int64_t r = 0, k = 0;
  while (c.p < c.end) {
    skip_spaces(c);
    if (c.p >= c.end) break;
    if (*c.p == '%' || *c.p == '#' || *c.p == '\n') { skip_line(c); continue; }
    // count doubles in this line
    int64_t n_in_line = 0;
    const char* line_start = c.p;
    while (c.p < c.end && *c.p != '\n') {
      skip_spaces(c);
      if (c.p >= c.end || *c.p == '\n') break;
      double v;
      if (!parse_double(c, &v)) { n_in_line = -1; break; }
      ++n_in_line;
    }
    skip_line(c);
    if (n_in_line <= 0) continue;  // non-numeric (e.g. CSV header) line
    if (k == 0) k = n_in_line;
    if (n_in_line == k) ++r;
    (void)line_start;
  }
  munmap(mem, st.st_size);
  *rows = r;
  *cols = k;
  return 0;
}

// Second pass: fill `out` (rows*cols doubles, row-major). Rows whose column
// count differs from `cols` are skipped (matching the Python parser).
// Returns number of rows written, or negative errno-style code.
int64_t qcpinn_table_read(const char* path, double* out, int64_t rows,
                          int64_t cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return -3;

  Cursor c{static_cast<const char*>(mem),
           static_cast<const char*>(mem) + st.st_size};
  int64_t r = 0;
  double* row_buf = new double[cols];
  while (c.p < c.end && r < rows) {
    skip_spaces(c);
    if (c.p >= c.end) break;
    if (*c.p == '%' || *c.p == '#' || *c.p == '\n') { skip_line(c); continue; }
    int64_t n_in_line = 0;
    bool bad = false;
    while (c.p < c.end && *c.p != '\n') {
      skip_spaces(c);
      if (c.p >= c.end || *c.p == '\n') break;
      double v;
      if (!parse_double(c, &v)) { bad = true; break; }
      if (n_in_line < cols) row_buf[n_in_line] = v;
      ++n_in_line;
    }
    skip_line(c);
    if (!bad && n_in_line == cols) {
      memcpy(out + r * cols, row_buf, sizeof(double) * cols);
      ++r;
    }
  }
  delete[] row_buf;
  munmap(mem, st.st_size);
  return r;
}

}  // extern "C"
