// Sequential MCTS oracle — a native cross-validation reference for the
// vectorized search.
//
// The reference's search core is native Rust (src/node.rs best_child +
// src/async_mcts.rs search_iteration); this oracle re-implements the SAME
// intended semantics (SURVEY.md §8) sequentially in C++ so the JAX
// lockstep engine can be golden-tested against an independent
// implementation, operation for operation:
//   * PUCT: Q + cpuct * P[a] * sqrt(N_parent + 1e-6) / (1 + N[a])
//     (node.rs:352-356 verbatim), Q = W/N with Q=0 for unvisited,
//     first-index argmax tie-break;
//   * masked uniform prior over valid moves (the uniform dummy net of
//     examples/connect_four.rs:12-43 with value 0);
//   * one expansion per simulation, node capacity num_sims+1;
//   * terminal children break the descent and back up their stored value
//     (async_mcts.rs:246-249); depth cutoff backs up the heuristic (=0);
//   * negamax sign alternation on backup (fixing defect D5).
//
// All floating-point arithmetic is ordered exactly like the JAX kernel
// (float32 throughout) so visit counts match bit-for-bit.
//
// Game: Connect-Four 6x7 (canonical boards, +1 to move).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int ROWS = 6;
constexpr int COLS = 7;
constexpr float EPS = 1e-6f;  // node.rs:12

struct Board {
  int8_t cells[ROWS][COLS];
  int8_t height[COLS];
};

bool has_win(const Board& b, int player) {
  for (int r = 0; r < ROWS; ++r)
    for (int c = 0; c + 3 < COLS; ++c)
      if (b.cells[r][c] == player && b.cells[r][c + 1] == player &&
          b.cells[r][c + 2] == player && b.cells[r][c + 3] == player)
        return true;
  for (int r = 0; r + 3 < ROWS; ++r)
    for (int c = 0; c < COLS; ++c)
      if (b.cells[r][c] == player && b.cells[r + 1][c] == player &&
          b.cells[r + 2][c] == player && b.cells[r + 3][c] == player)
        return true;
  for (int r = 0; r + 3 < ROWS; ++r)
    for (int c = 0; c + 3 < COLS; ++c)
      if (b.cells[r][c] == player && b.cells[r + 1][c + 1] == player &&
          b.cells[r + 2][c + 2] == player && b.cells[r + 3][c + 3] == player)
        return true;
  for (int r = 3; r < ROWS; ++r)
    for (int c = 0; c + 3 < COLS; ++c)
      if (b.cells[r][c] == player && b.cells[r - 1][c + 1] == player &&
          b.cells[r - 2][c + 2] == player && b.cells[r - 3][c + 3] == player)
        return true;
  return false;
}

// canonical step: drop +1 in `col`, then negate (next player's view)
Board step(const Board& b, int col) {
  Board n = b;
  int row = n.height[col] < ROWS - 1 ? n.height[col] : ROWS - 1;
  n.cells[row][col] = 1;
  if (n.height[col] < ROWS) n.height[col] += 1;
  for (int r = 0; r < ROWS; ++r)
    for (int c = 0; c < COLS; ++c) n.cells[r][c] = -n.cells[r][c];
  return n;
}

// (done, value from player-to-move perspective)
void terminal(const Board& b, bool* done, float* value) {
  bool lose = has_win(b, -1);
  bool win = has_win(b, 1);
  bool full = true;
  for (int c = 0; c < COLS; ++c) full &= b.height[c] >= ROWS;
  *done = lose || win || full;
  *value = win ? 1.0f : (lose ? -1.0f : 0.0f);
}

struct Node {
  Board board;
  float n[COLS];
  float w[COLS];
  float p[COLS];
  int child[COLS];
  bool valid[COLS];
  bool term;
  float tval;
};

void init_node(Node& nd, const Board& b) {
  nd.board = b;
  int nvalid = 0;
  for (int c = 0; c < COLS; ++c) {
    nd.n[c] = 0.0f;
    nd.w[c] = 0.0f;
    nd.child[c] = -1;
    nd.valid[c] = b.height[c] < ROWS;
    nvalid += nd.valid[c];
  }
  for (int c = 0; c < COLS; ++c)
    nd.p[c] = nd.valid[c] ? 1.0f / static_cast<float>(nvalid) : 0.0f;
  terminal(b, &nd.term, &nd.tval);
}

}  // namespace

extern "C" {

// Run `num_sims` simulations of uniform-prior PUCT MCTS from the given
// canonical position. Writes root visit counts into counts[7].
// board: int8[42] row-major, heights: int8[7].
void az_oracle_search(const int8_t* board, const int8_t* heights,
                      int num_sims, float cpuct, int max_depth,
                      float* counts) {
  Board root{};
  for (int r = 0; r < ROWS; ++r)
    for (int c = 0; c < COLS; ++c) root.cells[r][c] = board[r * COLS + c];
  for (int c = 0; c < COLS; ++c) root.height[c] = heights[c];

  std::vector<Node> nodes;
  nodes.reserve(num_sims + 1);
  nodes.emplace_back();
  init_node(nodes[0], root);

  std::vector<int> path_n(max_depth), path_a(max_depth);

  if (!nodes[0].term) {
    for (int sim = 0; sim < num_sims; ++sim) {
      int cur = 0, depth = 0;
      float v_leaf = 0.0f;
      bool did = false;
      while (true) {
        Node& nd = nodes[cur];
        // PUCT argmax, first-index tie-break (node.rs:343-370)
        float n_parent = 0.0f;
        for (int a = 0; a < COLS; ++a) n_parent += nd.n[a];
        float best = -1e38f;
        int best_a = 0;
        float sq = std::sqrt(n_parent + EPS);
        for (int a = 0; a < COLS; ++a) {
          if (!nd.valid[a]) continue;
          float q = nd.n[a] > 0.0f ? nd.w[a] / nd.n[a] : 0.0f;
          float u = cpuct * nd.p[a] * sq / (1.0f + nd.n[a]);
          float s = q + u;
          if (s > best) {
            best = s;
            best_a = a;
          }
        }
        path_n[depth] = cur;
        path_a[depth] = best_a;
        depth += 1;
        int child = nd.child[best_a];
        if (child == -1) {
          // EXPAND + EVALUATE (uniform prior, value 0). Out of capacity the
          // node isn't materialized but its value still backs up — the
          // graceful-degradation semantics of the vectorized search.
          Board nb = step(nd.board, best_a);
          bool nb_done;
          float nb_tval;
          terminal(nb, &nb_done, &nb_tval);
          v_leaf = nb_done ? nb_tval : 0.0f;
          if (static_cast<int>(nodes.size()) <= num_sims) {
            nodes.emplace_back();
            init_node(nodes.back(), nb);
            nodes[cur].child[best_a] = static_cast<int>(nodes.size()) - 1;
          }
          did = true;
          break;
        }
        if (nodes[child].term) {
          v_leaf = nodes[child].tval;
          did = true;
          break;
        }
        if (depth >= max_depth) {
          v_leaf = 0.0f;  // eval_heuristic == 0 for connect-four
          did = true;
          break;
        }
        cur = child;
      }
      if (!did) continue;
      // BACKUP with negamax alternation: edge d sits (depth-d) plies
      // above the leaf; odd distance flips the sign.
      for (int d = 0; d < depth; ++d) {
        float sign = ((depth - d) % 2 == 1) ? -1.0f : 1.0f;
        Node& nd = nodes[path_n[d]];
        nd.n[path_a[d]] += 1.0f;
        nd.w[path_a[d]] += sign * v_leaf;
      }
    }
  }
  for (int a = 0; a < COLS; ++a) counts[a] = nodes[0].n[a];
}

}  // extern "C"
