// Native HNSW core: build + search on packed arrays.
//
// The graph-builder for the TPU framework's HNSW index. Same algorithm
// family as the reference (Malkov & Yashunin; reference behavior at
// src/hnsw/graph.rs:19-424 — geometric level sampling, Algorithm-2 beam
// search per layer, bidirectional linking with re-scoring prune, lazy-dead
// slots, entry-point promotion) but designed around this framework's
// packed structure-of-arrays model so the adjacency exports directly into
// the padded int32[N, L, M] device tables consumed by the Pallas/XLA
// traversal (ops/hnsw_device.py). Driven from Python via ctypes; the
// pure-Python HnswGraph remains as the fallback implementation.
//
// Hot-loop specifics vs the Python build path (~400 vec/s):
//   * epoch-stamped visited marks in per-thread scratch (no hash sets)
//   * flat f32 storage, distance kernels inlined over contiguous rows
//   * std::priority_queue candidate/result heaps with (dist, id) ordering
//   * parallel batch build: striped per-node mutexes guard adjacency,
//     slots/levels pre-assigned, entry updates under one mutex
//     (insert-only parallelism, the hnswlib discipline)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <utility>
#include <vector>

namespace {

enum Metric : uint32_t { kL2 = 0, kCosine = 1, kDot = 2 };

using DistId = std::pair<float, int32_t>;  // (distance, slot)

constexpr size_t kLockStripes = 4096;  // power of two

struct VisitScratch {
    std::vector<uint64_t> mark;
    uint64_t epoch = 0;
};

// Per-thread visited scratch shared across handles: the epoch only ever
// increases within a thread, so stale marks from other searches/handles
// can never read as "visited". Makes concurrent searches (e.g. HTTP
// readers holding a shared read-lock) race-free without allocation per
// call.
thread_local VisitScratch g_tls_scratch;

struct HnswCore {
    uint32_t dim;
    uint32_t m;
    uint32_t m_max0;
    uint32_t ef_construction;
    uint32_t max_layers;
    Metric metric;
    double ml;
    std::mt19937_64 rng;

    int64_t capacity = 0;
    std::atomic<int64_t> count{0};
    std::vector<float> vectors;    // capacity * dim
    std::vector<float> norms;      // capacity
    std::vector<float> sq_norms;   // capacity
    std::vector<int32_t> levels;   // capacity, -1 dead
    std::vector<int64_t> ids;      // capacity, -1 dead
    std::vector<uint8_t> valid;    // capacity
    // adjacency: per slot, per layer (0..level) a neighbor list
    std::vector<std::vector<std::vector<int32_t>>> neighbors;
    std::vector<int32_t> free_slots;
    int32_t entry = -1;
    int32_t max_level = 0;
    uint64_t version = 0;
    int64_t zero_norm_live = 0;  // O(1) cosine zero-vector check

    // striped adjacency locks (one at a time — no lock ordering issues);
    // engaged only while a parallel batch insert is in flight, so the
    // serial path pays no synchronization cost
    std::mutex stripes[kLockStripes];
    std::mutex entry_mutex;   // guards (entry, max_level)
    bool use_locks = false;

    struct MaybeLock {
        std::mutex* m;
        explicit MaybeLock(HnswCore& h, int32_t slot)
            : m(h.use_locks
                  ? &h.stripes[static_cast<size_t>(slot) & (kLockStripes - 1)]
                  : nullptr) {
            if (m) m->lock();
        }
        ~MaybeLock() {
            if (m) m->unlock();
        }
    };

    const float* row(int32_t slot) const {
        return vectors.data() + static_cast<size_t>(slot) * dim;
    }

    void grow(int64_t want) {
        if (capacity >= want) return;
        int64_t new_cap = capacity ? capacity : 256;
        while (new_cap < want) new_cap *= 2;
        vectors.resize(static_cast<size_t>(new_cap) * dim, 0.f);
        norms.resize(new_cap, 0.f);
        sq_norms.resize(new_cap, 0.f);
        levels.resize(new_cap, -1);
        ids.resize(new_cap, -1);
        valid.resize(new_cap, 0);
        neighbors.resize(new_cap);
        for (int64_t s = new_cap - 1; s >= capacity; s--)
            free_slots.push_back(static_cast<int32_t>(s));
        capacity = new_cap;
    }

    int32_t take_slot() {
        if (free_slots.empty()) grow(capacity ? capacity * 2 : 256);
        int32_t s = free_slots.back();
        free_slots.pop_back();
        return s;
    }

    // distance for ranking AND for the returned value semantics:
    // l2 -> true euclidean; cosine -> 1 - clamped similarity; dot -> -dot
    float dist(const float* q, float q_norm, int32_t slot) const {
        const float* x = row(slot);
        float dot = 0.f;
        for (uint32_t i = 0; i < dim; i++) dot += q[i] * x[i];
        switch (metric) {
            case kL2: {
                float d2 = q_norm * q_norm + sq_norms[slot] - 2.f * dot;
                return std::sqrt(d2 > 0.f ? d2 : 0.f);
            }
            case kCosine: {
                float denom = q_norm * norms[slot];
                float sim = denom == 0.f ? 0.f : dot / denom;
                sim = std::min(1.f, std::max(-1.f, sim));
                return 1.f - sim;
            }
            default:
                return -dot;
        }
    }

    bool has_zero_norm_live() const { return zero_norm_live > 0; }

    int random_level_locked() {
        std::uniform_real_distribution<double> u01(0.0, 1.0);
        double u = u01(rng);
        if (u < 1e-12) u = 1e-12;
        int level = static_cast<int>(-std::log(u) * ml);
        int cap_level = static_cast<int>(max_layers) - 1;
        return level < cap_level ? level : cap_level;
    }

    // copy a node's layer adjacency under its stripe lock
    size_t copy_neighbors(int32_t slot, int layer, int32_t* out,
                          size_t out_cap) {
        MaybeLock g(*this, slot);
        const auto& layer_lists = neighbors[slot];
        if (layer >= static_cast<int>(layer_lists.size())) return 0;
        const auto& list = layer_lists[layer];
        size_t n_copy = std::min(list.size(), out_cap);
        std::memcpy(out, list.data(), n_copy * sizeof(int32_t));
        return n_copy;
    }

    // Algorithm 2: ef-bounded beam search on one layer. With a non-null
    // ``mask`` only mask-passing slots enter the RESULT set (navigation
    // still expands every neighbor — the hnswlib filtered-search shape);
    // ``visit_budget`` bounds the expansion when eligible nodes are rare
    // (0 = unbounded). A shortfall makes the caller fall back.
    void search_layer(const float* q, float q_norm,
                      const std::vector<DistId>& entries, uint32_t ef,
                      int layer, VisitScratch& vs, std::vector<DistId>* out,
                      const uint8_t* mask = nullptr,
                      int64_t visit_budget = 0) {
        if (static_cast<int64_t>(vs.mark.size()) < capacity)
            vs.mark.resize(capacity, 0);
        vs.epoch++;
        std::priority_queue<DistId, std::vector<DistId>,
                            std::greater<DistId>> candidates;
        std::priority_queue<DistId> results;
        int64_t visits = 0;
        for (const auto& e : entries) {
            if (vs.mark[e.second] == vs.epoch) continue;
            vs.mark[e.second] = vs.epoch;
            candidates.push(e);
            if (!mask || mask[e.second]) {
                results.push(e);
                if (results.size() > ef) results.pop();
            }
        }
        // adjacency copy buffer sized to the configuration (lists hold at
        // most m_max0 entries, +1 transiently before pruning)
        static thread_local std::vector<int32_t> nbr_buf;
        const size_t nbr_cap = static_cast<size_t>(m_max0) + 8;
        if (nbr_buf.size() < nbr_cap) nbr_buf.resize(nbr_cap);
        int32_t* nbrs = nbr_buf.data();
        while (!candidates.empty()) {
            DistId c = candidates.top();
            candidates.pop();
            if (results.size() >= ef && c.first > results.top().first) break;
            if (visit_budget && visits > visit_budget) break;
            size_t n_nbrs = copy_neighbors(c.second, layer, nbrs, nbr_cap);
            for (size_t j = 0; j < n_nbrs; j++) {
                int32_t nb = nbrs[j];
                if (vs.mark[nb] == vs.epoch || !valid[nb]) continue;
                vs.mark[nb] = vs.epoch;
                visits++;
                float d = dist(q, q_norm, nb);
                bool eligible = !mask || mask[nb];
                if (results.size() < ef || d < results.top().first) {
                    candidates.push({d, nb});
                    if (eligible) {
                        results.push({d, nb});
                        if (results.size() > ef) results.pop();
                    }
                }
            }
        }
        out->clear();
        out->reserve(results.size());
        while (!results.empty()) {
            out->push_back(results.top());
            results.pop();
        }
        std::sort(out->begin(), out->end());
    }

    // re-score + truncate a node's layer adjacency to max degree.
    // caller must hold lock_of(slot).
    void prune_locked(int32_t slot, int layer) {
        auto& list = neighbors[slot][layer];
        uint32_t limit = layer == 0 ? m_max0 : m;
        std::vector<int32_t> live;
        live.reserve(list.size());
        for (int32_t nb : list)
            if (valid[nb]) live.push_back(nb);
        if (live.size() <= limit) {
            list = std::move(live);
            return;
        }
        const float* q = row(slot);
        float qn = norms[slot];
        std::vector<DistId> scored;
        scored.reserve(live.size());
        for (int32_t nb : live) scored.push_back({dist(q, qn, nb), nb});
        std::sort(scored.begin(), scored.end());
        list.clear();
        for (uint32_t i = 0; i < limit; i++) list.push_back(scored[i].second);
    }

    // Core of Algorithm 1 once a slot/level has been assigned and the
    // node's data written. Thread-safe under the striped-lock discipline.
    void link_into_graph(int32_t slot, int level, VisitScratch& vs) {
        int32_t ep;
        int start_level;
        {
            std::lock_guard<std::mutex> g(entry_mutex);
            ep = entry;
            start_level = max_level;
        }
        const float* q = row(slot);
        float qn = norms[slot];
        std::vector<DistId> eps{{dist(q, qn, ep), ep}};
        std::vector<DistId> found;

        for (int layer = start_level; layer > level; layer--) {
            search_layer(q, qn, eps, 1, layer, vs, &found);
            if (!found.empty()) eps.assign(1, found.front());
        }
        int top = level < start_level ? level : start_level;
        for (int layer = top; layer >= 0; layer--) {
            search_layer(q, qn, eps, ef_construction, layer, vs, &found);
            uint32_t limit = layer == 0 ? m_max0 : m;
            {
                MaybeLock g(*this, slot);
                auto& own = neighbors[slot][layer];
                own.clear();
                for (uint32_t i = 0; i < found.size() && i < m; i++)
                    own.push_back(found[i].second);
            }
            for (uint32_t i = 0; i < found.size() && i < m; i++) {
                int32_t nb = found[i].second;
                MaybeLock g(*this, nb);
                auto& nb_layers = neighbors[nb];
                if (layer >= static_cast<int>(nb_layers.size())) continue;
                nb_layers[layer].push_back(slot);
                if (nb_layers[layer].size() > limit) prune_locked(nb, layer);
            }
            eps = found;
        }
        if (level > start_level) {
            std::lock_guard<std::mutex> g(entry_mutex);
            if (level > max_level) {
                entry = slot;
                max_level = level;
            }
        }
    }

    void write_node(int32_t slot, int level, int64_t internal_id,
                    const float* vec) {
        std::memcpy(vectors.data() + static_cast<size_t>(slot) * dim, vec,
                    sizeof(float) * dim);
        float sq = 0.f;
        for (uint32_t i = 0; i < dim; i++) sq += vec[i] * vec[i];
        sq_norms[slot] = sq;
        norms[slot] = std::sqrt(sq);
        levels[slot] = level;
        ids[slot] = internal_id;
        {
            MaybeLock g(*this, slot);
            neighbors[slot].assign(level + 1, {});
            valid[slot] = 1;
        }
    }

    // Algorithm 1: serial insert.
    int64_t insert(int64_t internal_id, const float* vec) {
        grow(count.load() + 1);
        int32_t slot = take_slot();
        int level = random_level_locked();
        write_node(slot, level, internal_id, vec);
        if (sq_norms[slot] == 0.f) zero_norm_live++;
        count++;
        version++;
        if (entry < 0) {
            std::lock_guard<std::mutex> g(entry_mutex);
            entry = slot;
            max_level = level;
            return slot;
        }
        link_into_graph(slot, level, g_tls_scratch);
        return slot;
    }

    // Parallel batch insert (fresh IDs only — the Python wrapper routes
    // duplicates through the serial path). Returns slots via out_slots.
    void insert_batch(const int64_t* batch_ids, const float* vecs,
                      int64_t n_items, int n_threads, int32_t* out_slots) {
        if (n_items <= 0) return;
        grow(count.load() + n_items);
        // pre-assign slots + levels serially (cheap, RNG stays seeded)
        std::vector<int> batch_levels(n_items);
        for (int64_t i = 0; i < n_items; i++) {
            out_slots[i] = take_slot();
            batch_levels[i] = random_level_locked();
        }
        int64_t start = 0;
        if (entry < 0) {
            // bootstrap the graph with the first node serially
            write_node(out_slots[0], batch_levels[0], batch_ids[0], vecs);
            if (sq_norms[out_slots[0]] == 0.f) zero_norm_live++;
            {
                std::lock_guard<std::mutex> g(entry_mutex);
                entry = out_slots[0];
                max_level = batch_levels[0];
            }
            count++;
            start = 1;
        }
        std::atomic<int64_t> next{start};
        int workers = n_threads < 1 ? 1 : n_threads;
        if (workers > n_items - start) workers = static_cast<int>(
            n_items - start > 0 ? n_items - start : 1);
        auto work = [&]() {
            while (true) {
                int64_t i = next.fetch_add(1);
                if (i >= n_items) break;
                int32_t slot = out_slots[i];
                write_node(slot, batch_levels[i], batch_ids[i],
                           vecs + static_cast<size_t>(i) * dim);
                if (sq_norms[slot] == 0.f) {
                    std::lock_guard<std::mutex> g(entry_mutex);
                    zero_norm_live++;
                }
                count++;
                link_into_graph(slot, batch_levels[i], g_tls_scratch);
            }
        };
        if (workers <= 1) {
            work();
        } else {
            use_locks = true;
            std::vector<std::thread> pool;
            pool.reserve(workers);
            for (int t = 0; t < workers; t++) pool.emplace_back(work);
            for (auto& th : pool) th.join();
            use_locks = false;
        }
        version++;
    }

    void remove_slot(int32_t slot) {
        for (int layer = 0;
             layer < static_cast<int>(neighbors[slot].size()); layer++) {
            for (int32_t nb : neighbors[slot][layer]) {
                auto& nb_layers = neighbors[nb];
                if (layer >= static_cast<int>(nb_layers.size())) continue;
                auto& list = nb_layers[layer];
                list.erase(std::remove(list.begin(), list.end(), slot),
                           list.end());
            }
        }
        neighbors[slot].clear();
        if (sq_norms[slot] == 0.f) zero_norm_live--;
        valid[slot] = 0;
        levels[slot] = -1;
        ids[slot] = -1;
        free_slots.push_back(slot);
        count--;
        version++;
        if (entry == slot) {
            entry = -1;
            max_level = 0;
            int32_t best = -1;
            int32_t best_level = -1;
            for (int64_t s = 0; s < capacity; s++) {
                if (valid[s] && levels[s] > best_level) {
                    best_level = levels[s];
                    best = static_cast<int32_t>(s);
                }
            }
            if (best >= 0) {
                entry = best;
                max_level = best_level;
            }
        }
    }

    // Algorithm 5: k-NN search. Returns count, or -2 for a cosine
    // zero-vector error (reference distance.rs:51-55 semantics). With a
    // mask, layer-0 results admit only mask-passing slots (navigation
    // unmasked); visit_budget bounds the filtered expansion.
    int64_t search(const float* q, uint32_t k, uint32_t ef, int64_t* out_ids,
                   float* out_dists, const uint8_t* mask = nullptr,
                   int64_t visit_budget = 0) {
        if (entry < 0 || count.load() == 0 || k == 0) return 0;
        float sq = 0.f;
        for (uint32_t i = 0; i < dim; i++) sq += q[i] * q[i];
        float qn = std::sqrt(sq);
        if (metric == kCosine && (qn == 0.f || has_zero_norm_live()))
            return -2;
        if (ef < k) ef = k;
        std::vector<DistId> eps{{dist(q, qn, entry), entry}};
        std::vector<DistId> found;
        for (int layer = max_level; layer >= 1; layer--) {
            search_layer(q, qn, eps, 1, layer, g_tls_scratch, &found);
            if (!found.empty()) eps.assign(1, found.front());
        }
        search_layer(q, qn, eps, ef, 0, g_tls_scratch, &found, mask,
                     visit_budget);
        int64_t n_out = 0;
        for (size_t i = 0; i < found.size() && n_out < k; i++) {
            out_ids[n_out] = ids[found[i].second];
            out_dists[n_out] = found[i].first;
            n_out++;
        }
        return n_out;
    }
};

}  // namespace

extern "C" {

void* vdb_hnsw_create(uint32_t dim, uint32_t m, uint32_t m_max0,
                      uint32_t ef_construction, uint32_t max_layers,
                      uint32_t metric, uint64_t seed, double ml) {
    HnswCore* h = new HnswCore();
    h->dim = dim;
    h->m = m;
    h->m_max0 = m_max0;
    h->ef_construction = ef_construction;
    h->max_layers = max_layers;
    h->metric = static_cast<Metric>(metric);
    h->ml = ml;
    h->rng.seed(seed);
    return h;
}

void vdb_hnsw_free(void* handle) {
    delete static_cast<HnswCore*>(handle);
}

// Returns the slot the vector landed in (>= 0).
int64_t vdb_hnsw_insert(void* handle, int64_t internal_id, const float* vec) {
    return static_cast<HnswCore*>(handle)->insert(internal_id, vec);
}

// Parallel batch insert of fresh IDs; fills out_slots (one per item).
void vdb_hnsw_insert_batch(void* handle, const int64_t* ids,
                           const float* vecs, int64_t n_items,
                           int32_t n_threads, int32_t* out_slots) {
    static_cast<HnswCore*>(handle)->insert_batch(ids, vecs, n_items,
                                                 n_threads, out_slots);
}

// Removes by slot (the Python wrapper owns the id->slot map).
void vdb_hnsw_remove_slot(void* handle, int32_t slot) {
    static_cast<HnswCore*>(handle)->remove_slot(slot);
}

int64_t vdb_hnsw_search(void* handle, const float* q, uint32_t k, uint32_t ef,
                        int64_t* out_ids, float* out_dists) {
    return static_cast<HnswCore*>(handle)->search(q, k, ef, out_ids,
                                                  out_dists);
}

// Exact filtered search: mask is uint8[capacity] over slots (1 = eligible
// for the result set); visit_budget bounds the filtered layer-0 expansion
// (0 = unbounded). Shortfalls (< k results) make the caller fall back.
int64_t vdb_hnsw_search_masked(void* handle, const float* q, uint32_t k,
                               uint32_t ef, const uint8_t* mask,
                               int64_t visit_budget, int64_t* out_ids,
                               float* out_dists) {
    return static_cast<HnswCore*>(handle)->search(q, k, ef, out_ids,
                                                  out_dists, mask,
                                                  visit_budget);
}

int64_t vdb_hnsw_len(void* handle) {
    return static_cast<HnswCore*>(handle)->count.load();
}

int64_t vdb_hnsw_capacity(void* handle) {
    return static_cast<HnswCore*>(handle)->capacity;
}

int32_t vdb_hnsw_entry(void* handle) {
    return static_cast<HnswCore*>(handle)->entry;
}

int32_t vdb_hnsw_max_level(void* handle) {
    return static_cast<HnswCore*>(handle)->max_level;
}

uint64_t vdb_hnsw_version(void* handle) {
    return static_cast<HnswCore*>(handle)->version;
}

int vdb_hnsw_get_slot(void* handle, int32_t slot, float* out) {
    HnswCore* h = static_cast<HnswCore*>(handle);
    if (slot < 0 || slot >= h->capacity || !h->valid[slot]) return -1;
    std::memcpy(out, h->row(slot), sizeof(float) * h->dim);
    return 0;
}

// Restore a graph from a padded structure-of-arrays export (the inverse of
// vdb_hnsw_export): neighbors is capacity x max_layers x m_max0 with -1
// padding. Norms/sq-norms/zero counter/free slots are recomputed. The
// handle must be freshly created with matching dim/max_layers/m_max0.
int vdb_hnsw_import(void* handle, const float* vectors,
                    const int32_t* neighbors, const int32_t* levels,
                    const int64_t* ids, const uint8_t* valid,
                    int64_t capacity, int32_t entry, int32_t max_level) {
    HnswCore* h = static_cast<HnswCore*>(handle);
    if (h->count.load() != 0) return -1;
    // validate before touching state: a corrupt-but-loadable file must
    // fail cleanly (the engine falls back to rebuild), never read out of
    // bounds or abort the process
    if (capacity < 0 || entry >= capacity ||
        max_level >= static_cast<int32_t>(h->max_layers))
        return -1;
    const uint32_t Lv = h->max_layers;
    const uint32_t Mv = h->m_max0;
    for (int64_t s = 0; s < capacity; s++) {
        if (!valid[s]) continue;
        int32_t lev = levels[s];
        if (lev < 0 || lev >= static_cast<int32_t>(Lv)) return -1;
        for (int32_t layer = 0; layer <= lev; layer++) {
            const int32_t* src = neighbors +
                (static_cast<size_t>(s) * Lv + layer) * Mv;
            for (uint32_t j = 0; j < Mv && src[j] >= 0; j++)
                if (src[j] >= capacity) return -1;
        }
    }
    h->grow(capacity);
    // grow may round capacity up; import fills the prefix
    std::memcpy(h->vectors.data(), vectors,
                sizeof(float) * static_cast<size_t>(capacity) * h->dim);
    std::memcpy(h->levels.data(), levels, sizeof(int32_t) * capacity);
    std::memcpy(h->ids.data(), ids, sizeof(int64_t) * capacity);
    std::memcpy(h->valid.data(), valid, sizeof(uint8_t) * capacity);
    const uint32_t L = h->max_layers;
    const uint32_t M = h->m_max0;
    int64_t live = 0;
    h->free_slots.clear();
    for (int64_t s = h->capacity - 1; s >= 0; s--) {
        if (s >= capacity || !h->valid[s]) {
            h->free_slots.push_back(static_cast<int32_t>(s));
            continue;
        }
        live++;
        const float* x = h->row(static_cast<int32_t>(s));
        float sq = 0.f;
        for (uint32_t i = 0; i < h->dim; i++) sq += x[i] * x[i];
        h->sq_norms[s] = sq;
        h->norms[s] = std::sqrt(sq);
        if (sq == 0.f) h->zero_norm_live++;
        int level = h->levels[s];
        auto& layer_lists = h->neighbors[s];
        layer_lists.assign(level + 1, {});
        for (int layer = 0; layer <= level && layer < static_cast<int>(L);
             layer++) {
            const int32_t* src = neighbors +
                (static_cast<size_t>(s) * L + layer) * M;
            for (uint32_t j = 0; j < M && src[j] >= 0; j++)
                layer_lists[layer].push_back(src[j]);
        }
    }
    h->count = live;
    h->entry = entry;
    h->max_level = max_level;
    h->version++;
    return 0;
}

// Fill caller-allocated buffers with the padded structure-of-arrays export
// (shapes: vectors/norms capacity x dim / capacity; neighbors capacity x
// max_layers x m_max0 with -1 padding; levels/ids/valid capacity).
int vdb_hnsw_export(void* handle, float* vectors, float* norms,
                    int32_t* neighbors, int32_t* levels, int64_t* ids,
                    uint8_t* valid) {
    HnswCore* h = static_cast<HnswCore*>(handle);
    const int64_t cap = h->capacity;
    const uint32_t L = h->max_layers;
    const uint32_t M = h->m_max0;
    std::memcpy(vectors, h->vectors.data(),
                sizeof(float) * static_cast<size_t>(cap) * h->dim);
    std::memcpy(norms, h->norms.data(), sizeof(float) * cap);
    std::memcpy(levels, h->levels.data(), sizeof(int32_t) * cap);
    std::memcpy(ids, h->ids.data(), sizeof(int64_t) * cap);
    std::memcpy(valid, h->valid.data(), sizeof(uint8_t) * cap);
    std::fill(neighbors,
              neighbors + static_cast<size_t>(cap) * L * M, -1);
    for (int64_t s = 0; s < cap; s++) {
        if (!h->valid[s]) continue;
        const auto& layer_lists = h->neighbors[s];
        for (size_t layer = 0; layer < layer_lists.size() && layer < L;
             layer++) {
            const auto& list = layer_lists[layer];
            int32_t* dst = neighbors +
                (static_cast<size_t>(s) * L + layer) * M;
            for (size_t j = 0; j < list.size() && j < M; j++)
                dst[j] = list[j];
        }
    }
    return 0;
}

}  // extern "C"
