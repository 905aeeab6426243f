// Native data loader for DeepMimic motion clips.
//
// The TPU-native framework keeps its hot compute in XLA, but the runtime
// around it (IO, parsing, batch prefetch) is native C++ — this library
// replaces the Python-side json.load of DeepMimic clip files
// (reference: utils/SimpleConverter.py:25-38) with a single-pass numeric
// parser plus a threaded batch loader, exposed through a plain C ABI for
// ctypes binding (pbrl_tpu/io_native.py).
//
// Format parsed (reference motions/humanoid3d_*.txt): a JSON object with
//   "Loop": "wrap" | "none" | "mirror"
//   "Frames": [[f0, f1, ...], ...]   -- rectangular numeric matrix
// Only the numeric payload is extracted; anything else is skipped
// structurally. Malformed files return an error code, never crash.

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Clip {
  std::vector<double> data;  // rows*cols, row-major
  int64_t rows = 0;
  int64_t cols = 0;
  int loop = 0;  // 0 = none, 1 = wrap, 2 = mirror
};

// ---------------------------------------------------------------------------
// Minimal single-pass parser for the clip subset of JSON.
// ---------------------------------------------------------------------------

class Parser {
 public:
  explicit Parser(const std::string& text) : s_(text), i_(0) {}

  bool parse(Clip* out, std::string* err) {
    skip_ws();
    if (!expect('{')) return fail(err, "expected '{'");
    while (true) {
      skip_ws();
      if (peek() == '}') { ++i_; break; }
      std::string key;
      if (!parse_string(&key)) return fail(err, "expected key string");
      skip_ws();
      if (!expect(':')) return fail(err, "expected ':'");
      skip_ws();
      if (key == "Loop") {
        std::string v;
        if (!parse_string(&v)) return fail(err, "Loop must be a string");
        if (v == "wrap") out->loop = 1;
        else if (v == "mirror") out->loop = 2;
        else out->loop = 0;
      } else if (key == "Frames") {
        if (!parse_frames(out, err)) return false;
      } else {
        if (!skip_value()) return fail(err, "bad value for key " + key);
      }
      skip_ws();
      if (peek() == ',') { ++i_; continue; }
      if (peek() == '}') { ++i_; break; }
      return fail(err, "expected ',' or '}'");
    }
    if (out->rows == 0) return fail(err, "no Frames found");
    return true;
  }

 private:
  char peek() const { return i_ < s_.size() ? s_[i_] : '\0'; }
  bool expect(char c) { if (peek() != c) return false; ++i_; return true; }
  void skip_ws() { while (i_ < s_.size() && std::isspace((unsigned char)s_[i_])) ++i_; }
  static bool fail(std::string* err, const std::string& m) {
    if (err) *err = m;
    return false;
  }

  bool parse_string(std::string* out) {
    if (!expect('"')) return false;
    out->clear();
    while (i_ < s_.size() && s_[i_] != '"') {
      if (s_[i_] == '\\' && i_ + 1 < s_.size()) ++i_;  // skip escapes
      out->push_back(s_[i_++]);
    }
    return expect('"');
  }

  bool parse_number(double* out) {
    const char* start = s_.data() + i_;
    char* end = nullptr;
    *out = std::strtod(start, &end);
    if (end == start) return false;
    i_ += static_cast<size_t>(end - start);
    return true;
  }

  bool parse_frames(Clip* out, std::string* err) {
    skip_ws();
    if (!expect('[')) return fail(err, "Frames must be an array");
    int64_t cols = -1;
    while (true) {
      skip_ws();
      if (peek() == ']') { ++i_; break; }
      if (!expect('[')) return fail(err, "frame must be an array");
      int64_t n = 0;
      while (true) {
        skip_ws();
        if (peek() == ']') { ++i_; break; }
        double v;
        if (!parse_number(&v)) return fail(err, "bad number in frame");
        out->data.push_back(v);
        ++n;
        skip_ws();
        if (peek() == ',') { ++i_; continue; }
      }
      if (cols < 0) cols = n;
      else if (n != cols) return fail(err, "ragged Frames matrix");
      ++out->rows;
      skip_ws();
      if (peek() == ',') { ++i_; continue; }
    }
    out->cols = cols < 0 ? 0 : cols;
    return true;
  }

  // Skip any JSON value (used for unknown keys).
  bool skip_value() {
    skip_ws();
    char c = peek();
    if (c == '"') { std::string tmp; return parse_string(&tmp); }
    if (c == '[' || c == '{') {
      char open = c, close = (c == '[') ? ']' : '}';
      int depth = 0;
      while (i_ < s_.size()) {
        char d = s_[i_];
        if (d == '"') { std::string tmp; if (!parse_string(&tmp)) return false; continue; }
        if (d == open) ++depth;
        if (d == close && --depth == 0) { ++i_; return true; }
        ++i_;
      }
      return false;
    }
    double v;
    return parse_number(&v) ||
           (s_.compare(i_, 4, "true") == 0 && (i_ += 4)) ||
           (s_.compare(i_, 5, "false") == 0 && (i_ += 5)) ||
           (s_.compare(i_, 4, "null") == 0 && (i_ += 4));
  }

  const std::string& s_;
  size_t i_;
};

int load_one(const char* path, Clip* clip, std::string* err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { *err = "cannot open file"; return 1; }
  std::string text((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());
  Parser p(text);
  if (!p.parse(clip, err)) return 2;
  return 0;
}

std::mutex g_err_mutex;
std::string g_last_error;

void set_error(const std::string& e) {
  std::lock_guard<std::mutex> lk(g_err_mutex);
  g_last_error = e;
}

}  // namespace

extern "C" {

// Parse one clip. On success returns 0 and fills *out_data (malloc'd,
// caller frees via pbrl_free), *rows, *cols, *loop.
int pbrl_load_clip(const char* path, double** out_data, int64_t* rows,
                   int64_t* cols, int* loop) {
  Clip clip;
  std::string err;
  int rc = load_one(path, &clip, &err);
  if (rc != 0) { set_error(err); return rc; }
  auto* buf = static_cast<double*>(std::malloc(clip.data.size() * sizeof(double)));
  if (!buf) { set_error("out of memory"); return 3; }
  std::memcpy(buf, clip.data.data(), clip.data.size() * sizeof(double));
  *out_data = buf;
  *rows = clip.rows;
  *cols = clip.cols;
  *loop = clip.loop;
  return 0;
}

// Threaded batch load: n clips in parallel. Outputs are parallel arrays;
// entries with nonzero status have null data. Returns count of failures.
int pbrl_load_clips(const char** paths, int n, double** out_data,
                    int64_t* rows, int64_t* cols, int* loops, int* status) {
  std::vector<std::thread> workers;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = n < hw ? n : hw;
  if (n_threads < 1) n_threads = 1;
  std::vector<int> next(1, 0);
  std::mutex m;
  auto work = [&]() {
    while (true) {
      int i;
      {
        std::lock_guard<std::mutex> lk(m);
        if (next[0] >= n) return;
        i = next[0]++;
      }
      out_data[i] = nullptr;
      status[i] = pbrl_load_clip(paths[i], &out_data[i], &rows[i], &cols[i],
                                 &loops[i]);
    }
  };
  for (int t = 0; t < n_threads; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
  int failures = 0;
  for (int i = 0; i < n; ++i) failures += status[i] != 0;
  return failures;
}

void pbrl_free(double* p) { std::free(p); }

// Last error message (thread-global, best effort). Valid until next call.
const char* pbrl_last_error() {
  std::lock_guard<std::mutex> lk(g_err_mutex);
  return g_last_error.c_str();
}

int pbrl_io_version() { return 1; }

}  // extern "C"
