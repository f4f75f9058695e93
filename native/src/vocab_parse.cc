// Fast DBoW2 text-vocabulary parser.
//
// The reference's slowest initialization step is parsing the ~100 MB
// ORBvoc.txt with C++ streams (System.cpp:38-39 ->
// TemplatedVocabulary.h:241 loadFromTextFile). This is the TPU engine's
// native equivalent: one read() of the whole file, then a single
// hand-rolled scan (no istream, no strtod for the common integer case)
// that fills flat arrays ready for Vocabulary construction. Multi-
// threaded: the file is split at line boundaries and chunks parse in
// parallel (each node line is independent).
//
// Format (TemplatedVocabulary.h:1382-1416 writer):
//   header: k L scoring weighting
//   per node: parent_id is_leaf d0..d31 weight

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Span {
  const char* p;
  const char* end;
};

inline void skip_ws(Span& s) {
  while (s.p < s.end && (*s.p == ' ' || *s.p == '\t' || *s.p == '\r' ||
                         *s.p == '\n'))
    ++s.p;
}

inline long parse_int(Span& s) {
  skip_ws(s);
  bool neg = false;
  if (s.p < s.end && *s.p == '-') {
    neg = true;
    ++s.p;
  }
  long v = 0;
  while (s.p < s.end && *s.p >= '0' && *s.p <= '9') {
    v = v * 10 + (*s.p - '0');
    ++s.p;
  }
  return neg ? -v : v;
}

inline double parse_float(Span& s) {
  skip_ws(s);
  char* endp = nullptr;
  double v = strtod(s.p, &endp);
  s.p = endp;
  return v;
}

// Count newline-terminated non-empty lines in [p, end).
int64_t count_lines(const char* p, const char* end) {
  int64_t n = 0;
  bool content = false;
  for (const char* c = p; c < end; ++c) {
    if (*c == '\n') {
      if (content) ++n;
      content = false;
    } else if (*c != ' ' && *c != '\t' && *c != '\r') {
      content = true;
    }
  }
  if (content) ++n;
  return n;
}

char* read_file(const char* path, int64_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  int64_t size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc(size + 1);
  if (!buf) {
    fclose(f);
    return nullptr;
  }
  int64_t got = (int64_t)fread(buf, 1, size, f);
  fclose(f);
  if (got != size) {
    free(buf);
    return nullptr;
  }
  buf[size] = '\0';
  *size_out = size;
  return buf;
}

void parse_chunk(const char* p, const char* end, int32_t* parents,
                 uint8_t* is_leaf, uint8_t* desc, float* weights,
                 int64_t base, int64_t capacity) {
  Span s{p, end};
  int64_t i = base;
  while (true) {
    skip_ws(s);
    if (s.p >= s.end || i >= capacity) break;
    parents[i] = (int32_t)parse_int(s);
    is_leaf[i] = (uint8_t)parse_int(s);
    uint8_t* d = desc + i * 32;
    for (int b = 0; b < 32; ++b) d[b] = (uint8_t)parse_int(s);
    weights[i] = (float)parse_float(s);
    ++i;
  }
}

}  // namespace

extern "C" {

// Parse header + count node lines. Returns node count (excluding header)
// or -1 on IO error. k/L from the header.
int64_t vocab_count(const char* path, int* k, int* L) {
  int64_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  Span s{buf, buf + size};
  *k = (int)parse_int(s);
  *L = (int)parse_int(s);
  parse_int(s);  // scoring
  parse_int(s);  // weighting
  while (s.p < s.end && *s.p != '\n') ++s.p;  // rest of header line
  int64_t n = count_lines(s.p, s.end);
  free(buf);
  return n;
}

// Fill caller-allocated arrays (length = capacity nodes):
//   parents [n] int32, is_leaf [n] uint8, desc [n,32] uint8, weights [n]
// float32. Returns nodes parsed or -1 on IO error. Parses chunks in
// parallel on n_threads (<=0: hardware_concurrency).
int64_t vocab_parse(const char* path, int32_t* parents, uint8_t* is_leaf,
                    uint8_t* desc, float* weights, int64_t capacity,
                    int n_threads) {
  int64_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  Span s{buf, buf + size};
  parse_int(s);  // k
  parse_int(s);  // L
  parse_int(s);
  parse_int(s);
  while (s.p < s.end && *s.p != '\n') ++s.p;
  const char* body = s.p;
  const char* end = buf + size;

  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;

  // Split at line boundaries; count lines per chunk to get bases.
  std::vector<const char*> starts(nt + 1);
  starts[0] = body;
  int64_t approx = (end - body) / nt;
  for (int t = 1; t < nt; ++t) {
    const char* c = body + t * approx;
    while (c < end && *c != '\n') ++c;
    if (c < end) ++c;
    starts[t] = c;
  }
  starts[nt] = end;
  for (int t = 1; t < nt; ++t)
    if (starts[t] < starts[t - 1]) starts[t] = starts[t - 1];

  std::vector<int64_t> bases(nt + 1, 0);
  {
    std::vector<std::thread> ts;
    std::vector<int64_t> counts(nt, 0);
    for (int t = 0; t < nt; ++t)
      ts.emplace_back([&, t] { counts[t] = count_lines(starts[t], starts[t + 1]); });
    for (auto& th : ts) th.join();
    for (int t = 0; t < nt; ++t) bases[t + 1] = bases[t] + counts[t];
  }
  int64_t total = bases[nt] < capacity ? bases[nt] : capacity;

  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    ts.emplace_back(parse_chunk, starts[t], starts[t + 1], parents, is_leaf,
                    desc, weights, bases[t], capacity);
  }
  for (auto& th : ts) th.join();
  free(buf);
  return total;
}

}  // extern "C"
