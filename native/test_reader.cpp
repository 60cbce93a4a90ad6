// Standalone test harness for fast_reader.cpp — built with ASan/UBSan by
// `make test-asan` (the CI sanitizer pass for the native code; the
// reference had no sanitizer story at all, SURVEY.md §5).
//
// Exercises: header parsing, dense and sparse bodies, every error path,
// and a large randomized sparse file passed via argv.

#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int eigsol_read_header(const char*, int*, long*, long*, long*, char*, int);
int eigsol_read_dense(const char*, int, long, long, double*, double*, char*, int);
int eigsol_read_sparse(const char*, int, long, long, long, long*, long*, double*,
                       double*, char*, int);
}

static int failures = 0;

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      ++failures;                                                       \
    }                                                                   \
  } while (0)

static std::string write_tmp(const char* name, const char* text) {
  std::string path = std::string("/tmp/eigsol_reader_") + name + ".txt";
  FILE* f = std::fopen(path.c_str(), "w");
  std::fputs(text, f);
  std::fclose(f);
  return path;
}

int main(int argc, char** argv) {
  char err[512];
  int storage;
  long rows, cols, nnz;

  // dense happy path
  auto p = write_tmp("dense", "dense\n2 3\n1 2 3\n4 5 6\n");
  CHECK(eigsol_read_header(p.c_str(), &storage, &rows, &cols, &nnz, err, 512) == 0);
  CHECK(storage == 0 && rows == 2 && cols == 3);
  double re[6], im[6];
  CHECK(eigsol_read_dense(p.c_str(), 0, rows, cols, re, im, err, 512) == 0);
  CHECK(re[0] == 1 && re[5] == 6);

  // complex dense
  p = write_tmp("cdense", "dense\n1 2\n1 2 3 4\n");
  CHECK(eigsol_read_dense(p.c_str(), 1, 1, 2, re, im, err, 512) == 0);
  CHECK(re[0] == 1 && im[0] == 2 && re[1] == 3 && im[1] == 4);

  // sparse happy path
  p = write_tmp("sparse", "sparse\n3 3\n2\n0 0 1.5\n2 1 -2.5\n");
  CHECK(eigsol_read_header(p.c_str(), &storage, &rows, &cols, &nnz, err, 512) == 0);
  CHECK(storage == 1 && nnz == 2);
  long rr[2], cc[2];
  CHECK(eigsol_read_sparse(p.c_str(), 0, 3, 3, 2, rr, cc, re, im, err, 512) == 0);
  CHECK(rr[1] == 2 && cc[1] == 1 && re[1] == -2.5);

  // error paths
  p = write_tmp("badkw", "diagonal\n2 2\n");
  CHECK(eigsol_read_header(p.c_str(), &storage, &rows, &cols, &nnz, err, 512) == 1);
  CHECK(std::strstr(err, "Unknown storage type") != nullptr);

  p = write_tmp("baddims", "dense\n0 2\n");
  CHECK(eigsol_read_header(p.c_str(), &storage, &rows, &cols, &nnz, err, 512) == 1);
  CHECK(std::strstr(err, "must be positive") != nullptr);

  p = write_tmp("oob", "sparse\n2 2\n1\n0 9 1.0\n");
  CHECK(eigsol_read_sparse(p.c_str(), 0, 2, 2, 1, rr, cc, re, im, err, 512) == 1);
  CHECK(std::strstr(err, "out of range") != nullptr);

  p = write_tmp("trunc", "dense\n2 2\n1 2 3\n");
  {
    double r4[4], i4[4];
    CHECK(eigsol_read_dense(p.c_str(), 0, 2, 2, r4, i4, err, 512) == 1);
    CHECK(std::strstr(err, "Failed to read scalar entry") != nullptr);
  }

  p = write_tmp("junk", "dense\n1 1\n1.5x\n");
  CHECK(eigsol_read_dense(p.c_str(), 0, 1, 1, re, im, err, 512) == 1);

  CHECK(eigsol_read_header("/nonexistent", &storage, &rows, &cols, &nnz, err, 512) == 1);

  // optional big-file pass from argv (bounds under ASan)
  if (argc > 1) {
    CHECK(eigsol_read_header(argv[1], &storage, &rows, &cols, &nnz, err, 512) == 0);
    std::vector<long> R(nnz), C(nnz);
    std::vector<double> V(nnz);
    CHECK(eigsol_read_sparse(argv[1], 0, rows, cols, nnz, R.data(), C.data(),
                             V.data(), nullptr, err, 512) == 0);
    std::printf("big file: %ld x %ld nnz=%ld ok\n", rows, cols, nnz);
  }

  if (failures == 0) std::printf("native reader tests: ALL PASS\n");
  return failures == 0 ? 0 : 1;
}
