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
struct BM25Handle {
  int num_docs = 0;
  std::unordered_map<std::string, int> vocab;
  // CSC: per-term doc rows + precomputed contributions
  std::vector<std::vector<int32_t>> term_rows;
  std::vector<std::vector<float>> term_scores;
};

}  // namespace

extern "C" {

void* vfi_bm25_build(const char** docs, int32_t n_docs, double k1, double b,
                     int32_t robertson) {
  auto* h = new BM25Handle();
  h->num_docs = n_docs;

  std::vector<std::unordered_map<int, float>> doc_tf(n_docs);
  std::vector<float> doc_len(n_docs);
  double total_len = 0.0;
  for (int i = 0; i < n_docs; ++i) {
    auto toks = tokenize(docs[i]);
    doc_len[i] = (float)toks.size();
    total_len += toks.size();
    for (auto& t : toks) {
      auto it = h->vocab.find(t);
      int col;
      if (it == h->vocab.end()) {
        col = (int)h->vocab.size();
        h->vocab.emplace(t, col);
      } else {
        col = it->second;
      }
      doc_tf[i][col] += 1.0f;
    }
  }
  double avgdl = n_docs ? std::max(total_len / n_docs, 1e-9) : 1.0;

  int v = (int)h->vocab.size();
  std::vector<float> df(v, 0.0f);
  for (int i = 0; i < n_docs; ++i)
    for (auto& kv : doc_tf[i]) df[kv.first] += 1.0f;

  h->term_rows.resize(v);
  h->term_scores.resize(v);
  // idf once per vocabulary term, not per posting (millions of redundant
  // std::log calls at collection load otherwise)
  std::vector<float> idf_tab(v);
  for (int t = 0; t < v; ++t)
    idf_tab[t] = std::log(1.0f + (n_docs - df[t] + 0.5f) / (df[t] + 0.5f));
  for (int i = 0; i < n_docs; ++i) {
    float norm = (float)(k1 * (1.0 - b + b * doc_len[i] / avgdl));
    for (auto& kv : doc_tf[i]) {
      float idf = idf_tab[kv.first];
      float tf_part = kv.second / (kv.second + norm);
      if (robertson) tf_part *= (float)(k1 + 1.0);
      h->term_rows[kv.first].push_back(i);
      h->term_scores[kv.first].push_back(idf * tf_part);
    }
  }
  return h;
}

void vfi_bm25_free(void* handle) { delete (BM25Handle*)handle; }

int32_t vfi_bm25_num_docs(void* handle) {
  return ((BM25Handle*)handle)->num_docs;
}

// Dense scores of every doc for the query.
void vfi_bm25_scores(void* handle, const char* query, float* out) {
  auto* h = (BM25Handle*)handle;
  std::fill(out, out + h->num_docs, 0.0f);
  for (auto& t : tokenize(query)) {
    auto it = h->vocab.find(t);
    if (it == h->vocab.end()) continue;
    const auto& rows = h->term_rows[it->second];
    const auto& scores = h->term_scores[it->second];
    for (size_t j = 0; j < rows.size(); ++j) out[rows[j]] += scores[j];
  }
}

// Top-k (descending score, ascending index tie-break). Returns count.
int32_t vfi_bm25_topk(void* handle, const char* query, int32_t k,
                      int32_t* out_ids, float* out_scores) {
  auto* h = (BM25Handle*)handle;
  std::vector<float> scores(h->num_docs);
  vfi_bm25_scores(handle, query, scores.data());
  int n = h->num_docs;
  k = std::min((int)k, n);
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::partial_sort(order.begin(), order.begin() + k, order.end(),
                    [&](int a, int b) {
                      if (scores[a] != scores[b]) return scores[a] > scores[b];
                      return a < b;
                    });
  for (int j = 0; j < k; ++j) {
    out_ids[j] = order[j];
    out_scores[j] = scores[order[j]];
  }
  return k;
}

}  // extern "C"
