// Native bag-of-binary-words runtime: vocabulary tree + inverted index.
//
// C++ replacement for the reference's DBoW2 third-party library
// (/root/reference/Thirdparty/DBoW2: TemplatedVocabulary, BowVector,
// FeatureVector, ScoringObject) — the host-side half of place recognition.
// The TPU half (dense Hamming matrices for matching) stays in JAX; this
// library owns what is irreducibly host-sequential: the vocabulary tree
// walk, the inverted file, and sparse L1 scoring over posting lists.
//
// - Training: hierarchical binary k-medians (k branching, L levels) over
//   256-bit ORB descriptors, majority-vote bit medians, k-means++-style
//   seeding — the same construction DBoW2's `create()` uses.
// - Quantization: per-descriptor tree walk by Hamming argmin (popcount).
// - Scoring: tf-idf weighted L1 score s = 2 - |v - w|_1 accumulated over
//   shared words only (DBoW2 ScoringObject.cc L1Scoring), via the
//   inverted index so query cost is O(shared postings), not O(keyframes).
//
// C ABI (extern "C") for ctypes; no global state, handles are opaque.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <random>
#include <unordered_map>
#include <vector>

namespace {

constexpr int DESC_BYTES = 32;  // 256-bit ORB

inline int hamming(const uint8_t* a, const uint8_t* b) {
    uint64_t av[4], bv[4];
    std::memcpy(av, a, 32);
    std::memcpy(bv, b, 32);
    return __builtin_popcountll(av[0] ^ bv[0]) +
           __builtin_popcountll(av[1] ^ bv[1]) +
           __builtin_popcountll(av[2] ^ bv[2]) +
           __builtin_popcountll(av[3] ^ bv[3]);
}

// majority-vote bit median of a descriptor subset
void bit_median(const uint8_t* descs, const std::vector<int>& idx,
                uint8_t* out) {
    int counts[256] = {0};
    for (int i : idx) {
        const uint8_t* d = descs + size_t(i) * DESC_BYTES;
        for (int byte = 0; byte < DESC_BYTES; ++byte) {
            uint8_t v = d[byte];
            while (v) {
                int bit = __builtin_ctz(v);
                counts[byte * 8 + bit]++;
                v &= v - 1;
            }
        }
    }
    const int half = (int(idx.size()) + 1) / 2;
    std::memset(out, 0, DESC_BYTES);
    for (int b = 0; b < 256; ++b)
        if (counts[b] >= half) out[b / 8] |= uint8_t(1u << (b % 8));
}

struct Vocab {
    int k = 10;
    int levels = 6;
    int n_words = 0;                 // number of leaves
    std::vector<uint8_t> centers;    // (n_nodes, 32), level-major layout
    std::vector<int> children;       // (n_nodes, k) child node ids, -1 none
    std::vector<int> word_id;        // node -> leaf word id (-1 internal)
    std::vector<float> idf;          // (n_words,)

    int n_nodes() const { return int(word_id.size()); }
};

struct Index {
    int n_words = 0;
    int max_docs = 0;
    // posting lists: word -> [(doc, weight)]
    std::vector<std::vector<std::pair<int, float>>> postings;
    // per-doc L1-normalized sparse vectors (for min-score checks)
    std::vector<std::unordered_map<int, float>> docs;
};

// k-medians clustering of a descriptor subset; returns cluster assignment
void kmedians(const uint8_t* descs, const std::vector<int>& idx, int k,
              std::mt19937& rng, std::vector<uint8_t>& centers,
              std::vector<int>& assign) {
    const int n = int(idx.size());
    k = std::min(k, n);
    centers.assign(size_t(k) * DESC_BYTES, 0);
    assign.assign(n, 0);

    // k-means++ style seeding on Hamming distance
    std::vector<int> seed_ids;
    std::uniform_int_distribution<int> uni(0, n - 1);
    seed_ids.push_back(idx[uni(rng)]);
    std::vector<int> d2(n, 256);
    for (int c = 1; c < k; ++c) {
        long total = 0;
        for (int i = 0; i < n; ++i) {
            int d = hamming(descs + size_t(idx[i]) * DESC_BYTES,
                            descs + size_t(seed_ids.back()) * DESC_BYTES);
            d2[i] = std::min(d2[i], d);
            total += d2[i];
        }
        if (total == 0) { seed_ids.push_back(idx[uni(rng)]); continue; }
        std::uniform_int_distribution<long> pick(0, total - 1);
        long r = pick(rng);
        int chosen = idx[n - 1];
        for (int i = 0; i < n; ++i) {
            r -= d2[i];
            if (r < 0) { chosen = idx[i]; break; }
        }
        seed_ids.push_back(chosen);
    }
    for (int c = 0; c < k; ++c)
        std::memcpy(&centers[size_t(c) * DESC_BYTES],
                    descs + size_t(seed_ids[c]) * DESC_BYTES, DESC_BYTES);

    std::vector<std::vector<int>> members(k);
    for (int it = 0; it < 8; ++it) {
        for (auto& m : members) m.clear();
        for (int i = 0; i < n; ++i) {
            int best = 0, bd = 1 << 30;
            for (int c = 0; c < k; ++c) {
                int d = hamming(descs + size_t(idx[i]) * DESC_BYTES,
                                &centers[size_t(c) * DESC_BYTES]);
                if (d < bd) { bd = d; best = c; }
            }
            assign[i] = best;
            members[best].push_back(idx[i]);
        }
        bool changed = false;
        for (int c = 0; c < k; ++c) {
            if (members[c].empty()) continue;
            uint8_t med[DESC_BYTES];
            bit_median(descs, members[c], med);
            if (std::memcmp(med, &centers[size_t(c) * DESC_BYTES], DESC_BYTES)) {
                std::memcpy(&centers[size_t(c) * DESC_BYTES], med, DESC_BYTES);
                changed = true;
            }
        }
        if (!changed) break;
    }
}

void build_level(Vocab& v, const uint8_t* descs,
                 const std::vector<int>& subset, int level, int parent,
                 std::mt19937& rng) {
    if (subset.empty()) return;
    if (level == v.levels || int(subset.size()) <= 1) {
        // leaf: parent becomes a word
        v.word_id[parent] = v.n_words++;
        return;
    }
    std::vector<uint8_t> centers;
    std::vector<int> assign;
    kmedians(descs, subset, v.k, rng, centers, assign);
    const int kk = int(centers.size() / DESC_BYTES);
    for (int c = 0; c < kk; ++c) {
        std::vector<int> sub;
        for (size_t i = 0; i < subset.size(); ++i)
            if (assign[i] == c) sub.push_back(subset[i]);
        if (sub.empty()) continue;
        int node = v.n_nodes();
        v.centers.insert(v.centers.end(), &centers[size_t(c) * DESC_BYTES],
                         &centers[size_t(c) * DESC_BYTES] + DESC_BYTES);
        v.children.insert(v.children.end(), size_t(v.k), -1);
        v.word_id.push_back(-1);
        v.children[size_t(parent) * v.k + c] = node;
        build_level(v, descs, sub, level + 1, node, rng);
    }
}

int quantize_one(const Vocab& v, const uint8_t* d) {
    int node = 0;
    while (v.word_id[node] < 0) {
        int best = -1, bd = 1 << 30;
        for (int c = 0; c < v.k; ++c) {
            int ch = v.children[size_t(node) * v.k + c];
            if (ch < 0) continue;
            int dist = hamming(d, &v.centers[size_t(ch) * DESC_BYTES]);
            if (dist < bd) { bd = dist; best = ch; }
        }
        if (best < 0) return -1;  // malformed branch
        node = best;
    }
    return v.word_id[node];
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- vocabulary

void* vocab_train(const uint8_t* descs, int n, int k, int levels,
                  unsigned seed) {
    auto* v = new Vocab();
    v->k = k;
    v->levels = levels;
    // root node (center unused)
    v->centers.assign(DESC_BYTES, 0);
    v->children.assign(size_t(k), -1);
    v->word_id.assign(1, -1);
    std::vector<int> all(n);
    for (int i = 0; i < n; ++i) all[i] = i;
    std::mt19937 rng(seed);
    build_level(*v, descs, all, 0, 0, rng);
    // idf from the training corpus: idf_w = log(n / n_w)
    std::vector<int> counts(v->n_words, 0);
    for (int i = 0; i < n; ++i) {
        int w = quantize_one(*v, descs + size_t(i) * DESC_BYTES);
        if (w >= 0) counts[w]++;
    }
    v->idf.resize(v->n_words);
    for (int w = 0; w < v->n_words; ++w)
        v->idf[w] = counts[w] > 0 ? std::log(float(n) / counts[w]) : 0.0f;
    return v;
}

int vocab_n_words(void* h) { return static_cast<Vocab*>(h)->n_words; }
int vocab_n_nodes(void* h) { return static_cast<Vocab*>(h)->n_nodes(); }

void vocab_quantize(void* h, const uint8_t* descs, int n, int* out_words,
                    float* out_weights) {
    auto* v = static_cast<Vocab*>(h);
    for (int i = 0; i < n; ++i) {
        int w = quantize_one(*v, descs + size_t(i) * DESC_BYTES);
        out_words[i] = w;
        out_weights[i] = w >= 0 ? v->idf[w] : 0.0f;
    }
}

int vocab_save(void* h, const char* path) {
    auto* v = static_cast<Vocab*>(h);
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    const char magic[8] = {'V', 'I', 'O', 'R', 'B', 'V', 'O', 'C'};
    std::fwrite(magic, 1, 8, f);
    int hdr[4] = {v->k, v->levels, v->n_words, v->n_nodes()};
    std::fwrite(hdr, sizeof(int), 4, f);
    std::fwrite(v->centers.data(), 1, v->centers.size(), f);
    std::fwrite(v->children.data(), sizeof(int), v->children.size(), f);
    std::fwrite(v->word_id.data(), sizeof(int), v->word_id.size(), f);
    std::fwrite(v->idf.data(), sizeof(float), v->idf.size(), f);
    std::fclose(f);
    return 0;
}

void* vocab_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    char magic[8];
    if (std::fread(magic, 1, 8, f) != 8 ||
        std::memcmp(magic, "VIORBVOC", 8) != 0) {
        std::fclose(f);
        return nullptr;
    }
    int hdr[4];
    if (std::fread(hdr, sizeof(int), 4, f) != 4) { std::fclose(f); return nullptr; }
    auto* v = new Vocab();
    v->k = hdr[0];
    v->levels = hdr[1];
    v->n_words = hdr[2];
    int n_nodes = hdr[3];
    v->centers.resize(size_t(n_nodes) * DESC_BYTES);
    v->children.resize(size_t(n_nodes) * v->k);
    v->word_id.resize(n_nodes);
    v->idf.resize(v->n_words);
    bool ok = std::fread(v->centers.data(), 1, v->centers.size(), f) == v->centers.size()
        && std::fread(v->children.data(), sizeof(int), v->children.size(), f) == v->children.size()
        && std::fread(v->word_id.data(), sizeof(int), v->word_id.size(), f) == v->word_id.size()
        && std::fread(v->idf.data(), sizeof(float), v->idf.size(), f) == v->idf.size();
    std::fclose(f);
    if (!ok) { delete v; return nullptr; }
    return v;
}

void vocab_free(void* h) { delete static_cast<Vocab*>(h); }

// ------------------------------------------------------------ inverted index

void* index_create(int n_words, int max_docs) {
    auto* ix = new Index();
    ix->n_words = n_words;
    ix->max_docs = max_docs;
    ix->postings.resize(n_words);
    ix->docs.resize(max_docs);
    return ix;
}

// add a document (keyframe) from its features' word ids + tf-idf weights;
// the vector is L1-normalized (DBoW2 BowVector::normalize L1_NORM)
void index_add(void* h, int doc, const int* words, const float* weights,
               int n) {
    auto* ix = static_cast<Index*>(h);
    auto& vec = ix->docs[doc];
    vec.clear();
    double norm = 0;
    for (int i = 0; i < n; ++i) {
        if (words[i] < 0 || weights[i] <= 0) continue;
        vec[words[i]] += weights[i];
    }
    for (auto& kv : vec) norm += kv.second;
    if (norm <= 0) return;
    for (auto& kv : vec) kv.second = float(kv.second / norm);
    for (auto& kv : vec) ix->postings[kv.first].push_back({doc, kv.second});
}

// query: L1 score against every indexed doc sharing >= 1 word.
// score(v, w) = sum_shared (|v_i| + |w_i| - |v_i - w_i|) / 2  in [0, 1]
// (equivalent to 1 - 0.5 |v - w|_1 for L1-normalized vectors — DBoW2
// ScoringObject.cc). Outputs per-doc score and shared-word count.
void index_query(void* h, const int* words, const float* weights, int n,
                 float* out_scores, int* out_common) {
    auto* ix = static_cast<Index*>(h);
    std::unordered_map<int, float> q;
    double norm = 0;
    for (int i = 0; i < n; ++i) {
        if (words[i] < 0 || weights[i] <= 0) continue;
        q[words[i]] += weights[i];
    }
    for (auto& kv : q) norm += kv.second;
    std::memset(out_scores, 0, sizeof(float) * ix->max_docs);
    std::memset(out_common, 0, sizeof(int) * ix->max_docs);
    if (norm <= 0) return;
    for (auto& kv : q) kv.second = float(kv.second / norm);
    for (auto& kv : q) {
        for (auto& post : ix->postings[kv.first]) {
            float vi = kv.second, wi = post.second;
            out_scores[post.first] +=
                0.5f * (std::fabs(vi) + std::fabs(wi) - std::fabs(vi - wi));
            out_common[post.first] += 1;
        }
    }
}

// pairwise score between two indexed docs (for the min-covisible-score gate)
float index_pair_score(void* h, int a, int b) {
    auto* ix = static_cast<Index*>(h);
    const auto& va = ix->docs[a];
    const auto& vb = ix->docs[b];
    const auto& small = va.size() < vb.size() ? va : vb;
    const auto& big = va.size() < vb.size() ? vb : va;
    float s = 0;
    for (const auto& kv : small) {
        auto it = big.find(kv.first);
        if (it == big.end()) continue;
        s += 0.5f * (std::fabs(kv.second) + std::fabs(it->second) -
                     std::fabs(kv.second - it->second));
    }
    return s;
}

void index_clear_doc(void* h, int doc) {
    auto* ix = static_cast<Index*>(h);
    for (auto& kv : ix->docs[doc]) {
        auto& lst = ix->postings[kv.first];
        lst.erase(std::remove_if(lst.begin(), lst.end(),
                                 [doc](auto& p) { return p.first == doc; }),
                  lst.end());
    }
    ix->docs[doc].clear();
}

void index_free(void* h) { delete static_cast<Index*>(h); }

}  // extern "C"
