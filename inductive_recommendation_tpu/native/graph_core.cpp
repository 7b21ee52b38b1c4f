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
