// Fast CIDEr(-D) scorer for SCST rewards.
//
// C++ rebuild of the hot host-side path in SCST training: per-batch CIDEr of
// sampled captions against precomputed training references (the reference
// implements this in Python dict arithmetic — eval/cider/reinforce_cider_scorer.py
// — and it sits between every device sampling step and gradient step).
//
// Semantics match the Python scorer exactly (see evalcap/cider.py, including the
// bigram-based length quirk and unseen-ngram df=0 handling); parity is asserted
// in tests/test_native_cider.py at 1e-6.
//
// C ABI for ctypes:
//   corpus blob: images separated by '\x1e' (RS), references by '\x1f' (US),
//   tokens by ' '.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kN = 4;
constexpr double kSigma = 6.0;

// 64-bit FNV-1a over the word-id sequence; collisions are statistically
// negligible for vocab-scale corpora.
inline uint64_t hash_ids(const int* ids, int n) {
  uint64_t h = 1469598103934665603ull;
  for (int i = 0; i < n; ++i) {
    uint64_t v = static_cast<uint64_t>(ids[i]);
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xff;
      h *= 1099511628211ull;
    }
  }
  return h;
}

struct NGramCounts {
  // per n-gram order: hash -> term frequency
  std::unordered_map<uint64_t, int> counts[kN];
  int length = 0;  // bigram tf total (the reference's length quirk)
};

struct Vec {
  std::unordered_map<uint64_t, double> v[kN];
  double norm[kN] = {0, 0, 0, 0};
  int length = 0;
};

struct Corpus {
  std::unordered_map<std::string, int> word_ids;
  std::vector<std::vector<NGramCounts>> refs;   // [image][ref]
  std::unordered_map<uint64_t, double> doc_freq;
  double log_ref_len = 0.0;
  // lazily-built tf-idf vectors per image (valid once df is final)
  std::vector<std::vector<Vec>> ref_vecs;
  std::vector<bool> vec_ready;

  int word_id(const std::string& w, bool create) {
    auto it = word_ids.find(w);
    if (it != word_ids.end()) return it->second;
    if (!create) {
      // unseen word: unique negative id so its n-grams miss the df table,
      // matching Python's df=0 for novel n-grams
      int id = -static_cast<int>(word_ids.size()) - 1;
      word_ids.emplace(w, id);
      return id;
    }
    int id = static_cast<int>(word_ids.size());
    word_ids.emplace(w, id);
    return id;
  }

  NGramCounts cook(const std::string& sentence, bool create_ids) {
    NGramCounts out;
    std::vector<int> ids;
    size_t pos = 0;
    while (pos < sentence.size()) {
      size_t sp = sentence.find(' ', pos);
      if (sp == std::string::npos) sp = sentence.size();
      if (sp > pos) ids.push_back(word_id(sentence.substr(pos, sp - pos), create_ids));
      pos = sp + 1;
    }
    int len = static_cast<int>(ids.size());
    for (int k = 1; k <= kN; ++k) {
      for (int i = 0; i + k <= len; ++i) {
        ++out.counts[k - 1][hash_ids(ids.data() + i, k)];
      }
    }
    for (auto& kv : out.counts[1]) out.length += kv.second;
    return out;
  }

  Vec to_vec(const NGramCounts& c) const {
    Vec out;
    out.length = c.length;
    for (int n = 0; n < kN; ++n) {
      for (auto& kv : c.counts[n]) {
        auto it = doc_freq.find(kv.first);
        double df = it == doc_freq.end() ? 0.0 : it->second;
        double idf = log_ref_len - std::log(std::max(1.0, df));
        double val = static_cast<double>(kv.second) * idf;
        out.v[n].emplace(kv.first, val);
        out.norm[n] += val * val;
      }
      out.norm[n] = std::sqrt(out.norm[n]);
    }
    return out;
  }
};

double sim_sum(const Vec& hyp, const Vec& ref) {
  double delta = static_cast<double>(hyp.length - ref.length);
  double penalty = std::exp(-(delta * delta) / (2 * kSigma * kSigma));
  double total = 0.0;
  for (int n = 0; n < kN; ++n) {
    double val = 0.0;
    for (auto& kv : hyp.v[n]) {
      auto it = ref.v[n].find(kv.first);
      if (it != ref.v[n].end()) {
        val += std::min(kv.second, it->second) * it->second;
      }
    }
    if (hyp.norm[n] != 0.0 && ref.norm[n] != 0.0) val /= hyp.norm[n] * ref.norm[n];
    total += val * penalty;
  }
  return total;
}

std::vector<std::string> split(const std::string& blob, char sep) {
  std::vector<std::string> out;
  size_t pos = 0;
  while (true) {
    size_t next = blob.find(sep, pos);
    if (next == std::string::npos) {
      out.push_back(blob.substr(pos));
      break;
    }
    out.push_back(blob.substr(pos, next - pos));
    pos = next + 1;
  }
  return out;
}

}  // namespace

extern "C" {

void* cider_corpus_new(const char* refs_blob) {
  auto* corpus = new Corpus();
  std::string blob(refs_blob);
  for (const auto& image : split(blob, '\x1e')) {
    std::vector<NGramCounts> cooked;
    for (const auto& ref : split(image, '\x1f')) {
      cooked.push_back(corpus->cook(ref, /*create_ids=*/true));
    }
    // document frequency: one count per image per distinct n-gram
    std::unordered_map<uint64_t, bool> seen;
    for (const auto& c : cooked) {
      for (int n = 0; n < kN; ++n) {
        for (auto& kv : c.counts[n]) seen[kv.first] = true;
      }
    }
    for (auto& kv : seen) corpus->doc_freq[kv.first] += 1.0;
    corpus->refs.push_back(std::move(cooked));
  }
  corpus->log_ref_len = std::log(static_cast<double>(corpus->refs.size()));
  corpus->ref_vecs.resize(corpus->refs.size());
  corpus->vec_ready.assign(corpus->refs.size(), false);
  return corpus;
}

void cider_corpus_free(void* handle) { delete static_cast<Corpus*>(handle); }

int cider_corpus_size(void* handle) {
  return static_cast<int>(static_cast<Corpus*>(handle)->refs.size());
}

// hyps_blob: '\x1e'-separated hypotheses; ref_idx maps each to a corpus image.
void cider_score(void* handle, const char* hyps_blob, const int* ref_idx,
                 int num_hyps, float* out) {
  auto* corpus = static_cast<Corpus*>(handle);
  auto hyps = split(std::string(hyps_blob), '\x1e');
  for (int i = 0; i < num_hyps; ++i) {
    Vec hyp = corpus->to_vec(corpus->cook(hyps[i], /*create_ids=*/false));
    int img = ref_idx[i];
    if (!corpus->vec_ready[img]) {
      for (const auto& rc : corpus->refs[img]) {
        corpus->ref_vecs[img].push_back(corpus->to_vec(rc));
      }
      corpus->vec_ready[img] = true;
    }
    const auto& ref_vecs = corpus->ref_vecs[img];
    double acc = 0.0;
    for (const auto& rv : ref_vecs) acc += sim_sum(hyp, rv);
    // mean over n-grams (sim_sum already sums n; divide by kN), / num refs, x10
    out[i] = static_cast<float>(acc / kN / ref_vecs.size() * 10.0);
  }
}

}  // extern "C"
