// Native graph-core routines: the host-side hot spots of data preparation.
//
// The reference delegates all native work to libraries (DGL/cuBLAS; SURVEY
// §2.6) and runs its own data prep in pure python — k-core filtering over
// millions of raw interactions (dataset.py:66-92) is minutes of dict loops.
// These are the TPU build's native runtime equivalents, exposed through a
// plain C ABI for ctypes (no pybind11 in the image).
//
// Build: see native/__init__.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Iterative k-core peeling over a deduplicated bipartite edge list.
// Inputs: edges (users[e], items[e]) with dense ids; outputs keep flags.
// Semantics match dataset.py:66-92: repeatedly drop users/items whose
// remaining degree < min_inter until a fixed point (the k-core is unique,
// so any peeling order yields the reference's surviving set).
void kcore(const int64_t* users, const int64_t* items, int64_t n_edges,
           int64_t n_users, int64_t n_items, int64_t min_inter,
           uint8_t* keep_users, uint8_t* keep_items) {
  std::vector<int64_t> u_deg(n_users, 0), i_deg(n_items, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    u_deg[users[e]]++;
    i_deg[items[e]]++;
  }
  // CSR over both sides for O(deg) neighbor walks during peeling
  std::vector<int64_t> u_off(n_users + 1, 0), i_off(n_items + 1, 0);
  for (int64_t u = 0; u < n_users; ++u) u_off[u + 1] = u_off[u] + u_deg[u];
  for (int64_t i = 0; i < n_items; ++i) i_off[i + 1] = i_off[i] + i_deg[i];
  std::vector<int64_t> u_adj(n_edges), i_adj(n_edges);
  {
    std::vector<int64_t> ucur(u_off.begin(), u_off.end() - 1);
    std::vector<int64_t> icur(i_off.begin(), i_off.end() - 1);
    for (int64_t e = 0; e < n_edges; ++e) {
      u_adj[ucur[users[e]]++] = items[e];
      i_adj[icur[items[e]]++] = users[e];
    }
  }
  std::memset(keep_users, 1, n_users);
  std::memset(keep_items, 1, n_items);
  std::vector<int64_t> queue;
  queue.reserve(n_users + n_items);
  // encode: user u -> u, item i -> n_users + i
  for (int64_t u = 0; u < n_users; ++u)
    if (u_deg[u] < min_inter) { keep_users[u] = 0; queue.push_back(u); }
  for (int64_t i = 0; i < n_items; ++i)
    if (i_deg[i] < min_inter) { keep_items[i] = 0; queue.push_back(n_users + i); }
  for (size_t qi = 0; qi < queue.size(); ++qi) {
    int64_t node = queue[qi];
    if (node < n_users) {
      int64_t u = node;
      for (int64_t p = u_off[u]; p < u_off[u + 1]; ++p) {
        int64_t i = u_adj[p];
        if (keep_items[i] && --i_deg[i] < min_inter) {
          keep_items[i] = 0;
          queue.push_back(n_users + i);
        }
      }
    } else {
      int64_t i = node - n_users;
      for (int64_t p = i_off[i]; p < i_off[i + 1]; ++p) {
        int64_t u = i_adj[p];
        if (keep_users[u] && --u_deg[u] < min_inter) {
          keep_users[u] = 0;
          queue.push_back(u);
        }
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Raw-file parsers: the host-side data-loading hot spots.
//
// The reference parses Gowalla_totalCheckins.txt with a python
// time.strptime per line (dataset.py:183-186) — ~10-20us/line, minutes at
// the 6.4M-line full file. These parse the fixed formats directly.
// Timestamps are UTC epoch seconds (days-from-civil; the reference's
// time.mktime depended on the host timezone — ordering, the only thing the
// chronological split consumes, is unchanged).

#include <cstdio>

namespace {

inline int64_t days_from_civil(int64_t y, int64_t m, int64_t d) {
  y -= m <= 2;
  const int64_t era = (y >= 0 ? y : y - 399) / 400;
  const int64_t yoe = y - era * 400;
  const int64_t doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + doe - 719468;
}

inline const char* parse_int(const char* p, const char* end, int64_t* out) {
  int64_t v = 0;
  bool neg = false, any = false;
  if (p < end && *p == '-') { neg = true; ++p; }
  while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; any = true; }
  if (!any) return nullptr;
  *out = neg ? -v : v;
  return p;
}

inline bool all_digits(const char* p, int n) {
  for (int k = 0; k < n; ++k)
    if (p[k] < '0' || p[k] > '9') return false;
  return true;
}

inline int64_t fixed_digits(const char* p, int n) {
  int64_t v = 0;
  for (int k = 0; k < n; ++k) v = v * 10 + (p[k] - '0');
  return v;
}

// validates "%Y-%m-%dT%H:%M:%SZ" (20 chars): digit fields + separators —
// corrupt content must fail loudly, as the reference's strptime did
inline bool valid_iso8601z(const char* p) {
  return all_digits(p, 4) && p[4] == '-' && all_digits(p + 5, 2) &&
         p[7] == '-' && all_digits(p + 8, 2) && p[10] == 'T' &&
         all_digits(p + 11, 2) && p[13] == ':' && all_digits(p + 14, 2) &&
         p[16] == ':' && all_digits(p + 17, 2) && p[19] == 'Z';
}

std::vector<char> read_all(const char* path) {
  std::vector<char> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(sz);
  if (sz && std::fread(buf.data(), 1, sz, f) != (size_t)sz) buf.clear();
  std::fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Gowalla_totalCheckins.txt: "user \t %Y-%m-%dT%H:%M:%SZ \t lat \t lon \t item".
// Fills users/items/ts; returns rows parsed, -1 on open failure, -2 on a
// malformed line or capacity overflow.
int64_t parse_gowalla(const char* path, int64_t cap, int64_t* users,
                      int64_t* items, int64_t* ts) {
  std::vector<char> buf = read_all(path);
  if (buf.empty()) return -1;
  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t n = 0;
  while (p < end) {
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    if (n >= cap) return -2;
    int64_t u;
    p = parse_int(p, end, &u);
    if (!p || p >= end || *p != '\t') return -2;
    ++p;
    // fixed-width %Y-%m-%dT%H:%M:%SZ (20 chars), content-validated
    if (end - p < 20 || !valid_iso8601z(p)) return -2;
    const int64_t y = fixed_digits(p, 4), mo = fixed_digits(p + 5, 2),
                  d = fixed_digits(p + 8, 2), h = fixed_digits(p + 11, 2),
                  mi = fixed_digits(p + 14, 2), s = fixed_digits(p + 17, 2);
    p += 20;
    if (p >= end || *p != '\t') return -2;
    ++p;
    for (int skip = 0; skip < 2; ++skip) {  // lat, lon
      while (p < end && *p != '\t') ++p;
      if (p >= end) return -2;
      ++p;
    }
    int64_t i;
    p = parse_int(p, end, &i);
    if (!p) return -2;
    // ANY trailing content after the item id must fail: the reference
    // tab-splits and calls int() on the whole 5th field, so "123 junk"
    // raises there — exempting spaces/tabs would silently accept it here
    if (p < end && *p != '\n' && *p != '\r') return -2;
    users[n] = u;
    items[n] = i;
    ts[n] = days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s;
    ++n;
    while (p < end && *p != '\n') ++p;
  }
  return n;
}

// "user item item ..." adjacency text (ProcessedDataset train/val/test.txt,
// dataset.py:140-164). Fills the flat item stream (first token of each line
// — the user id — is DISCARDED; line order is the user id, as in the
// reference) and per-line offsets; returns the line count, -1/-2 as above.
int64_t parse_adjacency(const char* path, int64_t cap_items,
                        int64_t cap_lines, int64_t* flat_items,
                        int64_t* offsets) {
  std::vector<char> buf = read_all(path);
  if (buf.empty()) return -1;
  const char* p = buf.data();
  const char* end = p + buf.size();
  // match the python fallback's read().strip().split('\n') exactly:
  // leading/trailing blank lines are dropped, INTERIOR blank lines are
  // EMPTY ROWS (line order is the user id — skipping them would shift
  // every later user's list onto the wrong user, silent corruption)
  while (p < end &&
         (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t'))
    ++p;
  int64_t n_lines = 0, n_items = 0, pending_blank = 0;
  while (p < end) {
    const char* le = p;
    while (le < end && *le != '\n') ++le;
    bool blank = true;
    for (const char* q = p; q < le; ++q) {
      if (*q != ' ' && *q != '\t' && *q != '\r') {
        blank = false;
        break;
      }
    }
    if (blank) {
      ++pending_blank;  // emitted only if a non-blank line follows
    } else {
      // strictness guards: the fallback splits on SINGLE SPACES, so a line
      // with leading whitespace discards an EMPTY first token (every numeric
      // token is then an item), and a tab inside a token makes int() raise.
      // Both cases must fail over to the fallback's exact semantics rather
      // than silently re-interpreting the line here.
      if (*p == ' ' || *p == '\t') return -2;
      for (const char* q = p; q < le; ++q)
        if (*q == '\t') return -2;
      for (; pending_blank > 0; --pending_blank) {
        if (n_lines >= cap_lines) return -2;
        offsets[n_lines++] = n_items;
      }
      if (n_lines >= cap_lines) return -2;
      offsets[n_lines] = n_items;
      const char* q = p;
      bool first = true;
      while (q < le) {
        if (*q == ' ' || *q == '\r') {
          ++q;
          continue;
        }
        int64_t v;
        q = parse_int(q, le, &v);
        if (!q) return -2;
        if (first) {
          first = false;  // user id token: discarded
        } else {
          if (n_items >= cap_items) return -2;
          flat_items[n_items++] = v;
        }
      }
      ++n_lines;
    }
    p = (le < end) ? le + 1 : le;
  }
  offsets[n_lines] = n_items;
  return n_lines;
}

}  // extern "C"
