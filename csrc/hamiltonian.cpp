// Native Hamiltonian-path solver (the framework's host-side native layer).
//
// Same search semantics as sfc_vit_tpu/curves/hamiltonian.py (which
// behavior-matches the reference DFS at
// /root/reference/src/curves/space_filling_curves.py:273-443):
// neighbor priority ordering (cardinal-before-diagonal, then guide-curve
// score, stable), bridge pruning with forced-move detection, flood-fill
// reachability pruning, and the same start-point policy.  Exact-path
// parity with the Python solver is pinned by tests/test_native.py.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC -o libsfc_native.so hamiltonian.cpp

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Solver {
  int width, height, total;
  bool diag;
  const int64_t* priority;  // length total (cell id = x*height+y), or null
  std::vector<std::vector<int>> ordered;  // priority-ordered neighbors
  std::vector<std::vector<int>> static_nbrs;
  std::vector<uint8_t> visited;
  std::vector<int> path;
  // flood-fill scratch
  std::vector<int> flood_stack;
  std::vector<int> seen_mark;
  int seen_epoch = 0;

  int cell_id(int x, int y) const { return x * height + y; }

  Solver(int w, int h, const int64_t* prio, bool use_diag)
      : width(w), height(h), total(w * h), diag(use_diag), priority(prio) {
    static const int CARD[4][2] = {{1, 0}, {-1, 0}, {0, 1}, {0, -1}};
    static const int DIAG[4][2] = {{1, 1}, {1, -1}, {-1, 1}, {-1, -1}};
    static_nbrs.resize(total);
    ordered.resize(total);
    for (int x = 0; x < width; ++x) {
      for (int y = 0; y < height; ++y) {
        const int c = cell_id(x, y);
        auto& sn = static_nbrs[c];
        for (int d = 0; d < 4; ++d) {
          const int nx = x + CARD[d][0], ny = y + CARD[d][1];
          if (0 <= nx && nx < width && 0 <= ny && ny < height)
            sn.push_back(cell_id(nx, ny));
        }
        if (diag) {
          for (int d = 0; d < 4; ++d) {
            const int nx = x + DIAG[d][0], ny = y + DIAG[d][1];
            if (0 <= nx && nx < width && 0 <= ny && ny < height)
              sn.push_back(cell_id(nx, ny));
          }
        }
        // Ordered copy: stable sort by (is_diagonal, guide score) --
        // identical to the Python key (is_diag, score).
        auto ord = sn;
        std::stable_sort(ord.begin(), ord.end(), [&](int a, int b) {
          const int ax = a / height, ay = a % height;
          const int bx = b / height, by = b % height;
          const int da =
              (std::abs(ax - x) == 1 && std::abs(ay - y) == 1) ? 1 : 0;
          const int db =
              (std::abs(bx - x) == 1 && std::abs(by - y) == 1) ? 1 : 0;
          const int64_t sa = priority ? priority[a] : 0;
          const int64_t sb = priority ? priority[b] : 0;
          if (da != db) return da < db;
          return sa < sb;
        });
        ordered[c] = std::move(ord);
      }
    }
    visited.assign(total, 0);
    seen_mark.assign(total, 0);
    flood_stack.reserve(total);
  }

  bool flood_ok(int start, int remaining) {
    ++seen_epoch;
    flood_stack.clear();
    flood_stack.push_back(start);
    seen_mark[start] = seen_epoch;
    int count = 0;
    while (!flood_stack.empty()) {
      const int c = flood_stack.back();
      flood_stack.pop_back();
      if (++count >= remaining) return true;
      for (int nb : static_nbrs[c]) {
        if (!visited[nb] && seen_mark[nb] != seen_epoch) {
          seen_mark[nb] = seen_epoch;
          flood_stack.push_back(nb);
        }
      }
    }
    return count >= remaining;
  }

  // Unvisited neighbours with bridge pruning / forced-move detection.
  void children_of(int cell, int path_len, std::vector<int>& out) {
    out.clear();
    std::vector<int> forced, filtered;
    for (int nb : ordered[cell]) {
      if (visited[nb]) continue;
      int exits = 0;
      for (int u : static_nbrs[nb])
        if (!visited[u] && u != cell) ++exits;
      if (exits == 0 && path_len + 1 < total) continue;
      if (exits == 1) forced.push_back(nb);
      filtered.push_back(nb);
    }
    out = forced.empty() ? filtered : forced;
  }

  struct Frame {
    int cell;
    std::vector<int> children;
    size_t next;
  };

  bool search(int start) {
    path.clear();
    path.push_back(start);
    visited[start] = 1;
    if (total == 1) return true;
    std::vector<Frame> stack;
    stack.push_back({start, {}, 0});
    children_of(start, (int)path.size(), stack.back().children);
    while (!stack.empty()) {
      Frame& frame = stack.back();
      bool advanced = false;
      while (frame.next < frame.children.size()) {
        const int nb = frame.children[frame.next++];
        visited[nb] = 1;
        path.push_back(nb);
        if ((int)path.size() == total) return true;
        if (flood_ok(nb, total - (int)path.size())) {
          stack.push_back({nb, {}, 0});
          children_of(nb, (int)path.size(), stack.back().children);
          advanced = true;
          break;
        }
        visited[nb] = 0;
        path.pop_back();
      }
      if (!advanced) {
        const int cell = stack.back().cell;
        stack.pop_back();
        visited[cell] = 0;
        if (!path.empty() && path.back() == cell) path.pop_back();
      }
    }
    return false;
  }
};

}  // namespace

extern "C" {

// Returns the path length (== width*height) on success, 0 on failure.
// priority: length width*height (cell id x*height+y), or nullptr.
// start: cell id to start from when priority is given, else ignored
// (the four corners are tried, reference policy).
// out_xy: int32 buffer of length 2*width*height, filled with (x, y).
int sfc_find_hamiltonian_path(int width, int height,
                              const int64_t* priority, int start,
                              int use_diag, int32_t* out_xy) {
  Solver solver(width, height, priority, use_diag != 0);
  std::vector<int> starts;
  if (priority) {
    starts.push_back(start);
  } else {
    starts = {solver.cell_id(0, 0), solver.cell_id(width - 1, 0),
              solver.cell_id(0, height - 1),
              solver.cell_id(width - 1, height - 1)};
  }
  for (int s : starts) {
    if (solver.search(s)) {
      for (int i = 0; i < solver.total; ++i) {
        out_xy[2 * i] = solver.path[i] / height;
        out_xy[2 * i + 1] = solver.path[i] % height;
      }
      return solver.total;
    }
    std::fill(solver.visited.begin(), solver.visited.end(), 0);
  }
  return 0;
}

}  // extern "C"
