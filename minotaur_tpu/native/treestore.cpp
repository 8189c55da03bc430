// Native node store for the branch-and-bound tree.
//
// Reference analogue: TreeManager + NodeHeap/NodeStack + Node storage
// (src/base/TreeManager.cpp, NodeHeap.cpp). The reference's node is a
// pointer-rich object; here a node is a row in contiguous (vlb, vub,
// warm) arrays plus scalar metadata, so batch pops hand the caller dense
// slabs ready to ship to the device without any gather on the Python
// side.  Exposed through a C ABI for ctypes.
//
// Heap order: min by (lb, -depth) — best-bound first, deeper as
// tie-break, matching TreeSearchOrder::BEST_THEN_DIVE
// (TreeManager.cpp:36-57).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct HeapEntry {
  double key1;     // lb
  double key2;     // tie-break (-depth for BthenD, depth for bfs, ...)
  uint64_t seq;    // FIFO tie-break for determinism
  int64_t slot;    // row in the arrays
};

struct EntryLess {
  bool operator()(const HeapEntry& a, const HeapEntry& b) const {
    // std::push_heap builds a max-heap; invert for min-heap
    if (a.key1 != b.key1) return a.key1 > b.key1;
    if (a.key2 != b.key2) return a.key2 > b.key2;
    return a.seq > b.seq;
  }
};

class TreeStore {
 public:
  TreeStore(int64_t n, int order)
      : n_(n), order_(order), seq_(0) {}

  int64_t alloc_slot() {
    if (!free_.empty()) {
      int64_t s = free_.back();
      free_.pop_back();
      return s;
    }
    int64_t s = static_cast<int64_t>(lb_.size());
    lb_.push_back(0.0);
    depth_.push_back(0);
    nid_.push_back(0);
    bvar_.push_back(-1);
    vlb_.resize((s + 1) * n_);
    vub_.resize((s + 1) * n_);
    warm_.resize((s + 1) * n_);
    has_warm_.push_back(0);
    return s;
  }

  void push(int64_t nid, int64_t depth, double lb, const double* vlb,
            const double* vub, const double* warm, int has_warm,
            int64_t bvar) {
    int64_t s = alloc_slot();
    nid_[s] = nid;
    depth_[s] = depth;
    lb_[s] = lb;
    bvar_[s] = bvar;
    std::memcpy(&vlb_[s * n_], vlb, n_ * sizeof(double));
    std::memcpy(&vub_[s * n_], vub, n_ * sizeof(double));
    if (has_warm) std::memcpy(&warm_[s * n_], warm, n_ * sizeof(double));
    has_warm_[s] = has_warm;
    heap_.push_back(make_entry(s));
    std::push_heap(heap_.begin(), heap_.end(), EntryLess{});
  }

  // Pops up to k nodes with lb < cutoff into caller-provided slabs.
  // Returns the number of nodes written; pruned-by-cutoff nodes are
  // freed and counted in *pruned.
  int64_t pop_batch(int64_t k, double cutoff, double* vlb_out,
                    double* vub_out, double* warm_out, int* has_warm_out,
                    double* lb_out, int64_t* depth_out, int64_t* nid_out,
                    int64_t* bvar_out, int64_t* pruned) {
    int64_t got = 0;
    *pruned = 0;
    while (!heap_.empty() && got < k) {
      std::pop_heap(heap_.begin(), heap_.end(), EntryLess{});
      HeapEntry e = heap_.back();
      heap_.pop_back();
      int64_t s = e.slot;
      if (lb_[s] >= cutoff) {
        free_.push_back(s);
        ++*pruned;
        continue;
      }
      std::memcpy(vlb_out + got * n_, &vlb_[s * n_], n_ * sizeof(double));
      std::memcpy(vub_out + got * n_, &vub_[s * n_], n_ * sizeof(double));
      std::memcpy(warm_out + got * n_, &warm_[s * n_], n_ * sizeof(double));
      has_warm_out[got] = has_warm_[s];
      lb_out[got] = lb_[s];
      depth_out[got] = depth_[s];
      nid_out[got] = nid_[s];
      bvar_out[got] = bvar_[s];
      free_.push_back(s);
      ++got;
    }
    return got;
  }

  // Drop all open nodes with lb >= cutoff; returns count dropped.
  int64_t prune_by_cutoff(double cutoff) {
    int64_t dropped = 0;
    std::vector<HeapEntry> keep;
    keep.reserve(heap_.size());
    for (const HeapEntry& e : heap_) {
      if (lb_[e.slot] >= cutoff) {
        free_.push_back(e.slot);
        ++dropped;
      } else {
        keep.push_back(e);
      }
    }
    if (dropped) {
      heap_.swap(keep);
      std::make_heap(heap_.begin(), heap_.end(), EntryLess{});
    }
    return dropped;
  }

  double best_lb() const {
    double best = 1e300;
    for (const HeapEntry& e : heap_) best = std::min(best, lb_[e.slot]);
    return best;
  }

  int64_t size() const { return static_cast<int64_t>(heap_.size()); }
  int64_t n() const { return n_; }

 private:
  HeapEntry make_entry(int64_t s) {
    double k1, k2;
    switch (order_) {
      case 0:  // dfs: deepest first
        k1 = -static_cast<double>(depth_[s]);
        k2 = lb_[s];
        break;
      case 1:  // bfs: best bound, shallower first
        k1 = lb_[s];
        k2 = static_cast<double>(depth_[s]);
        break;
      default:  // BthenD
        k1 = lb_[s];
        k2 = -static_cast<double>(depth_[s]);
    }
    return HeapEntry{k1, k2, seq_++, s};
  }

  int64_t n_;
  int order_;
  uint64_t seq_;
  std::vector<double> lb_, vlb_, vub_, warm_;
  std::vector<int64_t> depth_, nid_, bvar_, free_;
  std::vector<int> has_warm_;
  std::vector<HeapEntry> heap_;
};

}  // namespace

extern "C" {

void* treestore_create(int64_t n, int order) {
  return new TreeStore(n, order);
}

void treestore_destroy(void* ts) { delete static_cast<TreeStore*>(ts); }

void treestore_push(void* ts, int64_t nid, int64_t depth, double lb,
                    const double* vlb, const double* vub,
                    const double* warm, int has_warm, int64_t bvar) {
  static_cast<TreeStore*>(ts)->push(nid, depth, lb, vlb, vub, warm,
                                    has_warm, bvar);
}

// Batch push: k nodes from dense slabs (row i = node i).
void treestore_push_batch(void* ts, int64_t k, const int64_t* nid,
                          const int64_t* depth, const double* lb,
                          const double* vlb, const double* vub,
                          const double* warm, const int* has_warm,
                          const int64_t* bvar) {
  TreeStore* t = static_cast<TreeStore*>(ts);
  int64_t n = t->n();
  for (int64_t i = 0; i < k; ++i) {
    t->push(nid[i], depth[i], lb[i], vlb + i * n, vub + i * n,
            warm + i * n, has_warm[i], bvar[i]);
  }
}

int64_t treestore_pop_batch(void* ts, int64_t k, double cutoff,
                            double* vlb_out, double* vub_out,
                            double* warm_out, int* has_warm_out,
                            double* lb_out, int64_t* depth_out,
                            int64_t* nid_out, int64_t* bvar_out,
                            int64_t* pruned) {
  return static_cast<TreeStore*>(ts)->pop_batch(
      k, cutoff, vlb_out, vub_out, warm_out, has_warm_out, lb_out,
      depth_out, nid_out, bvar_out, pruned);
}

int64_t treestore_prune(void* ts, double cutoff) {
  return static_cast<TreeStore*>(ts)->prune_by_cutoff(cutoff);
}

double treestore_best_lb(void* ts) {
  return static_cast<TreeStore*>(ts)->best_lb();
}

int64_t treestore_size(void* ts) {
  return static_cast<TreeStore*>(ts)->size();
}

}  // extern "C"
