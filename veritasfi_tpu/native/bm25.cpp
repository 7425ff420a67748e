// Native BM25 engine: tokenizer + Porter stemmer + eagerly-scored sparse
// index + top-k scoring, exposed through a C ABI for ctypes.
//
// Host-side replacement for the reference's bm25s + PyStemmer stack
// (reference: src/utils/bm25Retriever.py:10-87). Scoring semantics match
// veritasfi_tpu/retrieval/bm25.py exactly (lucene variant by default):
//   idf      = ln(1 + (N - df + 0.5) / (df + 0.5))
//   tf_part  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
// with per-(doc, term) contributions precomputed at build time, so a query
// is a sparse column-sum over its (stemmed, stopword-filtered) terms.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 bm25.cpp -o libvfi_bm25.so

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Porter stemmer (same algorithm as retrieval/stemmer.py)
// ---------------------------------------------------------------------------
bool is_cons(const std::string& w, int i) {
  char c = w[i];
  if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
  if (c == 'y') return i == 0 ? true : !is_cons(w, i - 1);
  return true;
}

int measure(const std::string& w) {
  int m = 0;
  bool prev_vowel = false;
  for (int i = 0; i < (int)w.size(); ++i) {
    bool cons = is_cons(w, i);
    if (cons && prev_vowel) ++m;
    prev_vowel = !cons;
  }
  return m;
}

bool has_vowel(const std::string& w) {
  for (int i = 0; i < (int)w.size(); ++i)
    if (!is_cons(w, i)) return true;
  return false;
}

bool ends_double_cons(const std::string& w) {
  int n = w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
}

bool cvc(const std::string& w) {
  int n = w.size();
  if (n < 3) return false;
  if (!(is_cons(w, n - 3) && !is_cons(w, n - 2) && is_cons(w, n - 1)))
    return false;
  char c = w[n - 1];
  return c != 'w' && c != 'x' && c != 'y';
}

bool ends_with(const std::string& w, const char* suf) {
  size_t n = std::strlen(suf);
  return w.size() >= n && w.compare(w.size() - n, n, suf) == 0;
}

struct Rule { const char* suf; const char* repl; };

const Rule STEP2[] = {
    {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
    {"anci", "ance"}, {"izer", "ize"}, {"abli", "able"}, {"alli", "al"},
    {"entli", "ent"}, {"eli", "e"}, {"ousli", "ous"}, {"ization", "ize"},
    {"ation", "ate"}, {"ator", "ate"}, {"alism", "al"}, {"iveness", "ive"},
    {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
    {"iviti", "ive"}, {"biliti", "ble"},
};

const Rule STEP3[] = {
    {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
    {"ical", "ic"}, {"ful", ""}, {"ness", ""},
};

const char* STEP4[] = {
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
};

std::string porter_stem(std::string w) {
  if (w.size() <= 2) return w;

  // Step 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);

  // Step 1b
  if (ends_with(w, "eed")) {
    std::string stem = w.substr(0, w.size() - 3);
    if (measure(stem) > 0) w.resize(w.size() - 1);
  } else {
    bool flag = false;
    if (ends_with(w, "ed") && has_vowel(w.substr(0, w.size() - 2))) {
      w.resize(w.size() - 2); flag = true;
    } else if (ends_with(w, "ing") && has_vowel(w.substr(0, w.size() - 3))) {
      w.resize(w.size() - 3); flag = true;
    }
    if (flag) {
      if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
        w += 'e';
      } else if (ends_double_cons(w) && !ends_with(w, "l") &&
                 !ends_with(w, "s") && !ends_with(w, "z")) {
        w.resize(w.size() - 1);
      } else if (measure(w) == 1 && cvc(w)) {
        w += 'e';
      }
    }
  }

  // Step 1c
  if (ends_with(w, "y") && has_vowel(w.substr(0, w.size() - 1)))
    w[w.size() - 1] = 'i';

  // Step 2
  for (const auto& r : STEP2) {
    if (ends_with(w, r.suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(r.suf));
      if (measure(stem) > 0) w = stem + r.repl;
      break;
    }
  }

  // Step 3
  for (const auto& r : STEP3) {
    if (ends_with(w, r.suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(r.suf));
      if (measure(stem) > 0) w = stem + r.repl;
      break;
    }
  }

  // Step 4
  bool matched = false;
  for (const char* suf : STEP4) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 1) w = stem;
      matched = true;
      break;
    }
  }
  if (!matched && ends_with(w, "ion") && w.size() > 3) {
    char c = w[w.size() - 4];
    if (c == 's' || c == 't') {
      std::string stem = w.substr(0, w.size() - 3);
      if (measure(stem) > 1) w = stem;
    }
  }

  // Step 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !cvc(stem))) w = stem;
  }

  // Step 5b
  if (measure(w) > 1 && ends_double_cons(w) && ends_with(w, "l"))
    w.resize(w.size() - 1);

  return w;
}

// ---------------------------------------------------------------------------
// Tokenizer: lowercase, \w\w+ words, english stopwords (matches bm25.py)
// ---------------------------------------------------------------------------
const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string> s = {
      "a","about","above","after","again","against","all","am","an","and",
      "any","are","as","at","be","because","been","before","being","below",
      "between","both","but","by","can","did","do","does","doing","don",
      "down","during","each","few","for","from","further","had","has",
      "have","having","he","her","here","hers","herself","him","himself",
      "his","how","i","if","in","into","is","it","its","itself","just",
      "me","more","most","my","myself","no","nor","not","now","of","off",
      "on","once","only","or","other","our","ours","ourselves","out",
      "over","own","s","same","she","should","so","some","such","t","than",
      "that","the","their","theirs","them","themselves","then","there",
      "these","they","this","those","through","to","too","under","until",
      "up","very","was","we","were","what","when","where","which","while",
      "who","whom","why","will","with","you","your","yours","yourself",
      "yourselves"};
  return s;
}

inline bool word_char(unsigned char c) {
  return std::isalnum(c) || c == '_';
}

std::vector<std::string> tokenize(const char* text) {
  std::vector<std::string> out;
  std::string cur;
  for (const char* p = text; *p; ++p) {
    unsigned char c = (unsigned char)*p;
    if (word_char(c)) {
      cur += (char)std::tolower(c);
    } else if (!cur.empty()) {
      if (cur.size() >= 2 && !stopwords().count(cur))
        out.push_back(porter_stem(cur));
      cur.clear();
    }
  }
  if (cur.size() >= 2 && !stopwords().count(cur))
    out.push_back(porter_stem(cur));
  return out;
}

// ---------------------------------------------------------------------------
// Index
// ---------------------------------------------------------------------------
// Flat-CSR postings (term-major): rows ascend within each term because both
// build paths emit docs in insertion order. Query scoring accumulates into a
// dense scratch that SELF-CLEANS: only candidate slots touched by the query's
// postings are written and reset afterwards, so a 10M-row corpus never pays a
// 40 MB memset or a full-corpus scan per query (the old partial_sort top-k
// was O(N log k) over every row; this is O(postings + candidates)).
struct BM25Handle {
  int num_docs = 0;
  std::unordered_map<std::string, int> vocab;
  std::vector<int64_t> indptr;    // [V+1]
  std::vector<int32_t> rows;      // [nnz], ascending doc id within each term
  std::vector<float> contribs;    // [nnz], idf * tf_part (always > 0)
  // query-time scratch (guarded: one query at a time per handle)
  std::vector<float> scratch;     // dense [num_docs], all-zero between calls
  std::vector<int32_t> cands;     // candidate doc ids of the current query
};

struct Hit {
  float s;
  int32_t i;
};

// "better" = higher score, then lower doc id (FAISS-style deterministic
// tie-break, matching retrieval/bm25.py's lexsort order).
inline bool better(const Hit& a, const Hit& b) {
  if (a.s != b.s) return a.s > b.s;
  return a.i < b.i;
}

// Accumulate the query terms' postings into h->scratch, recording each doc
// the first time it is touched (contributions are strictly positive, so
// scratch[d] == 0 means "untouched"). Duplicate query terms count once per
// occurrence, like bm25s and the Python engine.
void accumulate_ids(BM25Handle* h, const int32_t* qids, int32_t nq) {
  if ((int)h->scratch.size() < h->num_docs) h->scratch.assign(h->num_docs, 0.f);
  h->cands.clear();
  int v = (int)(h->indptr.size() ? h->indptr.size() - 1 : 0);
  for (int32_t t = 0; t < nq; ++t) {
    int32_t term = qids[t];
    if (term < 0 || term >= v) continue;
    const int32_t* r = h->rows.data() + h->indptr[term];
    const float* c = h->contribs.data() + h->indptr[term];
    int64_t n = h->indptr[term + 1] - h->indptr[term];
    for (int64_t j = 0; j < n; ++j) {
      float& slot = h->scratch[r[j]];
      if (slot == 0.f) h->cands.push_back(r[j]);
      slot += c[j];
    }
  }
}

std::vector<int32_t> query_to_ids(BM25Handle* h, const char* query) {
  std::vector<int32_t> ids;
  for (auto& t : tokenize(query)) {
    auto it = h->vocab.find(t);
    ids.push_back(it == h->vocab.end() ? -1 : it->second);
  }
  return ids;
}

int32_t topk_from_scratch(BM25Handle* h, int32_t k, int32_t* out_ids,
                          float* out_scores) {
  int n = h->num_docs;
  k = std::min((int)k, n);
  if (k <= 0) {
    for (int32_t d : h->cands) h->scratch[d] = 0.f;
    return 0;
  }
  // heap of the current top-k with the WORST element on top
  std::vector<Hit> heap;
  heap.reserve(k);
  auto cmp = [](const Hit& a, const Hit& b) { return better(a, b); };
  for (int32_t d : h->cands) {
    Hit hit{h->scratch[d], d};
    if ((int)heap.size() < k) {
      heap.push_back(hit);
      std::push_heap(heap.begin(), heap.end(), cmp);
    } else if (better(hit, heap.front())) {
      std::pop_heap(heap.begin(), heap.end(), cmp);
      heap.back() = hit;
      std::push_heap(heap.begin(), heap.end(), cmp);
    }
  }
  std::sort(heap.begin(), heap.end(), better);
  // fewer positive-score docs than k: pad with zero-score docs in ascending
  // id order (exactly the Python engine's full-corpus lexsort tail)
  if ((int)heap.size() < k) {
    for (int32_t d = 0; d < n && (int)heap.size() < k; ++d)
      if (h->scratch[d] == 0.f) heap.push_back(Hit{0.f, d});
  }
  for (int j = 0; j < k; ++j) {
    out_ids[j] = heap[j].i;
    out_scores[j] = heap[j].s;
  }
  for (int32_t d : h->cands) h->scratch[d] = 0.f;
  return k;
}

}  // namespace

namespace {

// Shared index finalization: per-doc (term, tf) pairs arrive through a
// callback-free two-pass design — callers fill `doc_tf` as flat (term, tf)
// runs per doc; this computes idf, prefix-sums the CSR layout, and writes
// postings in doc order (ascending rows per term).
void finalize_postings(BM25Handle* h, int32_t n_docs, int v,
                       const std::vector<int64_t>& tf_indptr,
                       const std::vector<int32_t>& tf_terms,
                       const std::vector<float>& tf_counts,
                       const std::vector<float>& doc_len, double avgdl,
                       double k1, double b, int32_t robertson) {
  std::vector<int64_t> df(v, 0);
  int64_t nnz = (int64_t)tf_terms.size();
  for (int64_t j = 0; j < nnz; ++j) ++df[tf_terms[j]];
  // idf once per vocabulary term, not per posting (millions of redundant
  // std::log calls at collection load otherwise)
  std::vector<float> idf_tab(v);
  for (int t = 0; t < v; ++t)
    idf_tab[t] =
        std::log(1.0f + (n_docs - (float)df[t] + 0.5f) / ((float)df[t] + 0.5f));
  h->indptr.assign(v + 1, 0);
  for (int t = 0; t < v; ++t) h->indptr[t + 1] = h->indptr[t] + df[t];
  h->rows.resize(nnz);
  h->contribs.resize(nnz);
  std::vector<int64_t> cursor(h->indptr.begin(), h->indptr.end() - 1);
  for (int32_t i = 0; i < n_docs; ++i) {
    float norm = (float)(k1 * (1.0 - b + b * doc_len[i] / avgdl));
    for (int64_t j = tf_indptr[i]; j < tf_indptr[i + 1]; ++j) {
      float tf_part = tf_counts[j] / (tf_counts[j] + norm);
      if (robertson) tf_part *= (float)(k1 + 1.0);
      int64_t pos = cursor[tf_terms[j]]++;
      h->rows[pos] = i;
      h->contribs[pos] = idf_tab[tf_terms[j]] * tf_part;
    }
  }
}

}  // namespace

extern "C" {

void* vfi_bm25_build(const char** docs, int32_t n_docs, double k1, double b,
                     int32_t robertson) {
  auto* h = new BM25Handle();
  h->num_docs = n_docs;

  std::vector<int64_t> tf_indptr(1, 0);
  std::vector<int32_t> tf_terms;
  std::vector<float> tf_counts;
  std::vector<float> doc_len(n_docs);
  double total_len = 0.0;
  std::unordered_map<int, float> counts;
  for (int i = 0; i < n_docs; ++i) {
    auto toks = tokenize(docs[i]);
    doc_len[i] = (float)toks.size();
    total_len += toks.size();
    counts.clear();
    for (auto& t : toks) {
      auto it = h->vocab.find(t);
      int col;
      if (it == h->vocab.end()) {
        col = (int)h->vocab.size();
        h->vocab.emplace(t, col);
      } else {
        col = it->second;
      }
      counts[col] += 1.0f;
    }
    for (auto& kv : counts) {
      tf_terms.push_back(kv.first);
      tf_counts.push_back(kv.second);
    }
    tf_indptr.push_back((int64_t)tf_terms.size());
  }
  double avgdl = n_docs ? std::max(total_len / n_docs, 1e-9) : 1.0;
  finalize_postings(h, n_docs, (int)h->vocab.size(), tf_indptr, tf_terms,
                    tf_counts, doc_len, avgdl, k1, b, robertson);
  return h;
}

// Build from pre-tokenized docs: `tokens[indptr[d]..indptr[d+1])` are doc
// d's term ids in [0, vocab_size). Used by corpus-scale fixtures (10M docs
// never materialize strings) and by callers with their own tokenization;
// the resulting handle shares the EXACT query-time code path with the text
// build. Doc length = token count, like the tokenize() contract.
void* vfi_bm25_build_tokens(const int64_t* indptr, const int32_t* tokens,
                            int32_t n_docs, int32_t vocab_size, double k1,
                            double b, int32_t robertson) {
  auto* h = new BM25Handle();
  h->num_docs = n_docs;
  std::vector<int64_t> tf_indptr(1, 0);
  std::vector<int32_t> tf_terms;
  std::vector<float> tf_counts;
  tf_terms.reserve(indptr[n_docs]);  // upper bound: every token unique
  std::vector<float> doc_len(n_docs);
  std::vector<int32_t> buf;
  for (int32_t i = 0; i < n_docs; ++i) {
    int64_t lo = indptr[i], hi = indptr[i + 1];
    doc_len[i] = (float)(hi - lo);
    buf.assign(tokens + lo, tokens + hi);
    std::sort(buf.begin(), buf.end());
    for (size_t j = 0; j < buf.size();) {
      size_t run = j + 1;
      while (run < buf.size() && buf[run] == buf[j]) ++run;
      if (buf[j] >= 0 && buf[j] < vocab_size) {
        tf_terms.push_back(buf[j]);
        tf_counts.push_back((float)(run - j));
      }
      j = run;
    }
    tf_indptr.push_back((int64_t)tf_terms.size());
  }
  double avgdl =
      n_docs ? std::max((double)indptr[n_docs] / n_docs, 1e-9) : 1.0;
  finalize_postings(h, n_docs, vocab_size, tf_indptr, tf_terms, tf_counts,
                    doc_len, avgdl, k1, b, robertson);
  return h;
}

void vfi_bm25_free(void* handle) { delete (BM25Handle*)handle; }

int32_t vfi_bm25_num_docs(void* handle) {
  return ((BM25Handle*)handle)->num_docs;
}

// Posting-list length (document frequency) of a term id; -1 if out of
// range. Lets benchmarks report how many postings a query actually touches
// (the honest cost driver of the sparse leg) without a host-side rebuild.
int64_t vfi_bm25_df(void* handle, int32_t term) {
  auto* h = (BM25Handle*)handle;
  int v = (int)(h->indptr.size() ? h->indptr.size() - 1 : 0);
  if (term < 0 || term >= v) return -1;
  return h->indptr[term + 1] - h->indptr[term];
}

// Dense scores of every doc for the query (API kept for parity tests and
// full-distribution callers; top-k never goes through this path anymore).
void vfi_bm25_scores(void* handle, const char* query, float* out) {
  auto* h = (BM25Handle*)handle;
  auto ids = query_to_ids(h, query);
  std::fill(out, out + h->num_docs, 0.0f);
  accumulate_ids(h, ids.data(), (int32_t)ids.size());
  for (int32_t d : h->cands) {
    out[d] = h->scratch[d];
    h->scratch[d] = 0.f;
  }
}

void vfi_bm25_scores_ids(void* handle, const int32_t* qids, int32_t nq,
                         float* out) {
  auto* h = (BM25Handle*)handle;
  std::fill(out, out + h->num_docs, 0.0f);
  accumulate_ids(h, qids, nq);
  for (int32_t d : h->cands) {
    out[d] = h->scratch[d];
    h->scratch[d] = 0.f;
  }
}

// Top-k (descending score, ascending index tie-break). Returns count.
int32_t vfi_bm25_topk(void* handle, const char* query, int32_t k,
                      int32_t* out_ids, float* out_scores) {
  auto* h = (BM25Handle*)handle;
  auto ids = query_to_ids(h, query);
  accumulate_ids(h, ids.data(), (int32_t)ids.size());
  return topk_from_scratch(h, k, out_ids, out_scores);
}

int32_t vfi_bm25_topk_ids(void* handle, const int32_t* qids, int32_t nq,
                          int32_t k, int32_t* out_ids, float* out_scores) {
  auto* h = (BM25Handle*)handle;
  accumulate_ids(h, qids, nq);
  return topk_from_scratch(h, k, out_ids, out_scores);
}

}  // extern "C"
