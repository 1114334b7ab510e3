// Native host-side runtime ops for the SSR-Speech TPU framework.
//
// The reference delegates its hot host paths to Python (codes/phoneme txt
// parsing in data/gigaspeech.py:43-64 runs per item per epoch inside
// DataLoader workers; the word-level Levenshtein alignment in
// edit_utils_en.py:10-66 is O(n*m) pure Python). These are the only
// CPU-bound inner loops in the system, so they live here in C++ and are
// bound via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC ssr_native.cpp -o libssr_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// parse_int_matrix: read a whitespace-separated integer matrix text file
// (one row per line) into a caller-allocated int32 buffer.
// Returns 0 on success; fills n_rows/n_cols (ragged rows -> first row's
// length wins, short rows padded with pad_value, long rows truncated).
// ---------------------------------------------------------------------------
int parse_int_matrix(const char* path, int32_t* out, int max_rows,
                     int max_cols, int32_t pad_value, int* n_rows,
                     int* n_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -2;
  }
  fclose(f);
  buf[size] = '\0';

  int rows = 0;
  int cols = -1;
  const char* p = buf.data();
  const char* end = buf.data() + size;
  while (p < end && rows < max_rows) {
    // parse one line
    int col = 0;
    int32_t* row_out = out + (long)rows * max_cols;
    bool any = false;
    while (p < end && *p != '\n') {
      // skip spaces/tabs/CR
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
      if (p >= end || *p == '\n') break;
      bool neg = false;
      if (*p == '-') { neg = true; p++; }
      long v = 0;
      bool digit = false;
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        p++;
        digit = true;
      }
      if (!digit) { // non-numeric token: skip it
        while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') p++;
        continue;
      }
      any = true;
      if (col < max_cols) row_out[col] = (int32_t)(neg ? -v : v);
      col++;
    }
    if (p < end) p++;  // consume newline
    if (!any) continue;  // skip empty lines
    if (cols < 0) cols = col < max_cols ? col : max_cols;
    for (int c = col; c < cols; c++) row_out[c] = pad_value;
    rows++;
  }
  *n_rows = rows;
  *n_cols = cols < 0 ? 0 : cols;
  return 0;
}

// ---------------------------------------------------------------------------
// levenshtein_ops: minimal-edit alignment between two int sequences with the
// reference's tie-breaking (deletion > insertion > substitution when equal,
// edit_utils_en.py:29-39). Emits ops as (src_start, src_end, kind) triples,
// kind: 0=del, 1=ins, 2=sub. Returns the edit distance, or -1 on overflow.
// ---------------------------------------------------------------------------
int levenshtein_ops(const int32_t* a, int n, const int32_t* b, int m,
                    int32_t* ops_out, int max_ops, int* n_ops) {
  std::vector<int32_t> dist((n + 1) * (m + 1));
  std::vector<int8_t> back((n + 1) * (m + 1));  // 0=diag,1=del,2=ins
  auto D = [&](int i, int j) -> int32_t& { return dist[i * (m + 1) + j]; };
  auto B = [&](int i, int j) -> int8_t& { return back[i * (m + 1) + j]; };
  for (int i = 0; i <= n; i++) { D(i, 0) = i; B(i, 0) = 1; }
  for (int j = 0; j <= m; j++) { D(0, j) = j; B(0, j) = 2; }
  B(0, 0) = 0;
  for (int i = 1; i <= n; i++) {
    for (int j = 1; j <= m; j++) {
      int cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      int del = D(i - 1, j) + 1;
      int ins = D(i, j - 1) + 1;
      int sub = D(i - 1, j - 1) + cost;
      int best = del < ins ? del : ins;
      best = best < sub ? best : sub;
      D(i, j) = best;
      if (best == del) B(i, j) = 1;
      else if (best == ins) B(i, j) = 2;
      else B(i, j) = 0;
    }
  }
  // backtrace (reverse order, same walk as edit_utils_en.py:42-64)
  std::vector<int32_t> rev;
  int i = n, j = m;
  while (i > 0 || j > 0) {
    int8_t bk = B(i, j);
    if (i > 0 && bk == 1) {
      rev.push_back(0); rev.push_back(i); rev.push_back(i - 1);
      i--;
    } else if (j > 0 && bk == 2) {
      rev.push_back(1); rev.push_back(i); rev.push_back(i);
      j--;
    } else {
      if (a[i - 1] != b[j - 1]) {
        rev.push_back(2); rev.push_back(i); rev.push_back(i - 1);
      }
      i--; j--;
    }
  }
  int count = (int)(rev.size() / 3);
  if (count > max_ops) return -1;
  for (int k = 0; k < count; k++) {
    // reverse into (start, end, kind)
    int src = (count - 1 - k) * 3;
    ops_out[k * 3 + 0] = rev[src + 2];
    ops_out[k * 3 + 1] = rev[src + 1];
    ops_out[k * 3 + 2] = rev[src + 0];
  }
  *n_ops = count;
  return D(n, m);
}

// ---------------------------------------------------------------------------
// pad_collate_i32: gather variable-length int32 rows into one padded matrix.
// Used by the batch collator; avoids a python loop over items x timesteps.
// srcs: array of row pointers; lens: row lengths.
// ---------------------------------------------------------------------------
void pad_collate_i32(const int32_t** srcs, const int32_t* lens, int n,
                     int32_t* out, int width, int32_t pad_value) {
  for (int i = 0; i < n; i++) {
    int l = lens[i] < width ? lens[i] : width;
    memcpy(out + (long)i * width, srcs[i], l * sizeof(int32_t));
    for (int c = l; c < width; c++) out[(long)i * width + c] = pad_value;
  }
}

}  // extern "C"
