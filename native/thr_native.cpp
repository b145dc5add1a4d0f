// thr_native: C++ fast path for host-side ingestion hot loops.
//
// The TPU owns the query path; ingestion's cost centers are pure host work:
// tokenization/normalization of every document and inverted-index assembly
// (the Python loops in analyzer.py / index/bm25_index.py). This module
// reimplements exactly those loops:
//
//   - analyzer: UTF-8 aware lowercase + Latin accent folding + alnum token
//     splitting + stopword filter + light S-stemmer + vocabulary building,
//     byte-for-byte compatible with the Python Analyzer/Vocabulary pipeline
//     (verified by tests/test_native.py parity checks);
//   - postings builder: token-id streams -> df / CSR offsets / doc-ordered
//     postings / per-doc term table, matching index/bm25_index.py.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). All buffers are
// caller-allocated numpy arrays; the only state is the analyzer handle's
// vocabulary (append-only, mirrored back to Python on demand).
//
// Build: make -C native    (-> native/libthr_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ---- UTF-8 decoding -------------------------------------------------------

inline uint32_t decode_utf8(const unsigned char* s, size_t len, size_t& i) {
  unsigned char c = s[i];
  if (c < 0x80) { i += 1; return c; }
  if ((c >> 5) == 0x6 && i + 1 < len) {
    uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    i += 2; return cp;
  }
  if ((c >> 4) == 0xE && i + 2 < len) {
    uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
    i += 3; return cp;
  }
  if ((c >> 3) == 0x1E && i + 3 < len) {
    uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                  ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    i += 4; return cp;
  }
  i += 1;  // invalid byte: skip
  return 0xFFFD;
}

// ---- accent folding -------------------------------------------------------
//
// CODE-GENERATED from the canonical spec in triple_hybrid_rag_tpu/analyzer.py
// (fold_char): lowercase -> NFD -> drop combining marks -> explicit folds for
// non-decomposable Latin letters -> keep [0-9a-z]. Covers Latin-1 Supplement,
// Latin Extended-A/B, and Latin Extended Additional; '.' = token separator.
// Parity with the Python tokenizer over every covered codepoint is asserted in
// tests/test_native.py -- regenerate both tables together if the spec changes.

static const char kFoldLatin[] =  // [0xC0, 0x250)
    "aaaaaaaceeeeiiii.nooooo.ouuuuy.saaaaaaaceeeeiiii.nooooo.ouuuuy.y"
    "aaaaaaccccccccddddeeeeeeeeeegggggggghhhhiiiiiiiiii..jjkkkllllll."
    ".llnnnnnn...oooooo..rrrrrrssssssssttttttuuuuuuuuuuuuwwyyyzzzzzz."
    "................................oo.............uu..............."
    ".............aaiioouuuuuuuuuu.aaaaaa..ggkkoooo..j...gg..nnaaaaoo"
    "aaaaeeeeiiiioooorrrruuuusstt..hh......aaeeooooooooyy............"
    "................";
static const char kFoldExtAdd[] =  // [0x1E00, 0x1F00)
    "aabbbbbbccddddddddddeeeeeeeeeeffgghhhhhhhhhhiiiikkkkkkllllllllmm"
    "mmmmnnnnnnnnoooooooopppprrrrrrrrssssssssssttttttttuuuuuuuuuuvvvv"
    "wwwwwwwwwwxxxxyyzzzzzzhtwy....s.aaaaaaaaaaaaaaaaaaaaaaaaeeeeeeee"
    "eeeeeeeeiiiioooooooooooooooooooooooouuuuuuuuuuuuuuyyyyyyyy......";

char fold_codepoint(uint32_t cp) {
  // returns folded ASCII char for letter codepoints, 0 for non-token chars
  if (cp >= '0' && cp <= '9') return (char)cp;
  if (cp >= 'a' && cp <= 'z') return (char)cp;
  if (cp >= 'A' && cp <= 'Z') return (char)(cp - 'A' + 'a');
  char c = 0;
  if (cp >= 0xC0 && cp < 0x250) c = kFoldLatin[cp - 0xC0];
  else if (cp >= 0x1E00 && cp < 0x1F00) c = kFoldExtAdd[cp - 0x1E00];
  else if (cp == 0x212A) c = 'k';  // KELVIN SIGN: str.lower() -> 'k'
  else if (cp == 0x212B) c = 'a';  // ANGSTROM SIGN: lower() -> U+00E5 -> 'a'
  return c == '.' ? 0 : c;
}

// (U+212A KELVIN SIGN and U+212B ANGSTROM SIGN fold like Python str.lower():
//  the only two codepoints outside the Latin ranges that lower() maps INTO
//  them — exhaustively verified against the Python tokenizer)
// ---- S-stemmer (mirror of analyzer.s_stem) --------------------------------

// English -oes plurals the Portuguese -oes->-ao rule must skip (mirror of
// analyzer._EN_OES_WORDS; 'shoes' must stem to 'shoe', not 'shao')
static const std::unordered_set<std::string> kEnOesWords = {
    "shoes", "heroes", "echoes", "tomatoes", "potatoes", "goes", "does",
    "toes", "foes", "woes", "hoes", "oboes", "torpedoes", "dominoes",
    "volcanoes", "mosquitoes", "canoes", "vetoes", "embargoes", "cargoes",
    "mangoes", "haloes", "zeroes", "tornadoes", "buffaloes",
};

void s_stem(std::string& t) {
  size_t n = t.size();
  auto ends = [&](const char* suf) {
    size_t m = strlen(suf);
    return n >= m && t.compare(n - m, m, suf) == 0;
  };
  if (n > 4 && ends("oes") && kEnOesWords.find(t) == kEnOesWords.end()) {
    t.replace(n - 3, 3, "ao"); return;
  }
  if (n > 4 && ends("ies") && t[n - 4] != 'a' && t[n - 4] != 'e') {
    t.replace(n - 3, 3, "y"); return;
  }
  if (n > 3 && ends("es") && t[n - 3] != 'a' && t[n - 3] != 'e' && t[n - 3] != 'o') {
    t.resize(n - 1); return;
  }
  if (n > 3 && t[n - 1] == 's' && t[n - 2] != 'u' && t[n - 2] != 's') {
    t.resize(n - 1); return;
  }
}

struct Analyzer {
  std::unordered_set<std::string> stopwords;
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> terms;
  int min_token_len = 2;
  bool stemming = true;

  int32_t term_id(const std::string& t, bool add) {
    auto it = vocab.find(t);
    if (it != vocab.end()) return it->second;
    if (!add) return -1;
    int32_t id = (int32_t)terms.size();
    vocab.emplace(t, id);
    terms.push_back(t);
    return id;
  }
};

void tokenize_into(Analyzer* a, const unsigned char* text, size_t len, bool add,
                   std::vector<int32_t>& out) {
  std::string tok;
  size_t i = 0;
  auto flush = [&]() {
    if ((int)tok.size() >= a->min_token_len && !a->stopwords.count(tok)) {
      if (a->stemming) s_stem(tok);
      out.push_back(a->term_id(tok, add));
    }
    tok.clear();
  };
  while (i < len) {
    uint32_t cp = decode_utf8(text, len, i);
    if (cp >= 0x300 && cp < 0x370) continue;  // combining marks: NFD'd input support
    char folded = fold_codepoint(cp);
    if (folded) tok.push_back(folded);
    else if (!tok.empty()) flush();
  }
  if (!tok.empty()) flush();
}

}  // namespace

extern "C" {

void* thr_analyzer_new(const char* stopwords_blob, int32_t n_stopwords,
                       int32_t min_token_len, int32_t stemming) {
  auto* a = new Analyzer();
  a->min_token_len = min_token_len;
  a->stemming = stemming != 0;
  const char* p = stopwords_blob;
  for (int32_t i = 0; i < n_stopwords; ++i) {
    size_t l = strlen(p);
    a->stopwords.emplace(p, l);
    p += l + 1;
  }
  return a;
}

void thr_analyzer_free(void* h) { delete (Analyzer*)h; }

// Tokenize n texts (concatenated UTF-8 bytes + int64 offsets[n+1]).
// Returns token ids + per-text offsets via out params; buffers owned by the
// handle until the next call (caller copies immediately).
static thread_local std::vector<int32_t> g_token_buf;
static thread_local std::vector<int64_t> g_off_buf;

void thr_tokenize(void* h, const unsigned char* blob, const int64_t* offsets,
                  int32_t n_texts, int32_t add_to_vocab,
                  const int32_t** out_tokens, const int64_t** out_offsets,
                  int64_t* out_n_tokens) {
  auto* a = (Analyzer*)h;
  g_token_buf.clear();
  g_off_buf.assign(1, 0);
  for (int32_t i = 0; i < n_texts; ++i) {
    tokenize_into(a, blob + offsets[i], (size_t)(offsets[i + 1] - offsets[i]),
                  add_to_vocab != 0, g_token_buf);
    g_off_buf.push_back((int64_t)g_token_buf.size());
  }
  *out_tokens = g_token_buf.data();
  *out_offsets = g_off_buf.data();
  *out_n_tokens = (int64_t)g_token_buf.size();
}

int32_t thr_vocab_size(void* h) { return (int32_t)((Analyzer*)h)->terms.size(); }

// Copy the vocabulary as NUL-separated bytes; returns required size when buf null.
int64_t thr_vocab_dump(void* h, char* buf, int64_t cap) {
  auto* a = (Analyzer*)h;
  int64_t need = 0;
  for (const auto& t : a->terms) need += (int64_t)t.size() + 1;
  if (!buf || cap < need) return need;
  char* p = buf;
  for (const auto& t : a->terms) {
    memcpy(p, t.data(), t.size());
    p += t.size();
    *p++ = '\0';
  }
  return need;
}

// Build CSR postings + doc stats from tokenized docs.
// Inputs: token ids (flat) + offsets[n_docs+1]; vocab size V; df cap (0 = none).
// Two-phase: pass 1 (counts) fills df + doc_lengths + n_unique (tf map per doc);
// pass 2 fills CSR arrays allocated by caller from pass-1 sizes.
void thr_postings_count(const int32_t* tokens, const int64_t* offsets,
                        int32_t n_docs, int32_t vocab_size,
                        int64_t* df_out,        // [V]
                        float* doc_len_out,     // [n_docs]
                        int64_t* total_pairs) { // [1] sum of unique terms per doc
  std::vector<int32_t> last_doc(vocab_size, -1);
  int64_t pairs = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    int64_t start = offsets[d], end = offsets[d + 1];
    doc_len_out[d] = (float)(end - start);
    for (int64_t i = start; i < end; ++i) {
      int32_t t = tokens[i];
      if (t < 0 || t >= vocab_size) continue;
      if (last_doc[t] != d) {
        last_doc[t] = d;
        df_out[t]++;
        pairs++;
      }
    }
  }
  *total_pairs = pairs;
}

// Pass 2: fill CSR (doc-ascending within term) + per-doc term table.
// The term table keeps the TOP-L terms by BM25 contribution when a doc has more
// unique terms than the cap (parity with the Python build's top-weight policy);
// idf[] and denom[] let the selection use the true contribution formula.
void thr_postings_fill(const int32_t* tokens, const int64_t* offsets,
                       int32_t n_docs, int32_t vocab_size,
                       const int64_t* csr_offsets,  // [V+1] from cumsum(df)
                       int32_t* postings_doc,       // [nnz]
                       float* postings_tf,          // [nnz]
                       int32_t doc_term_cap,        // term-table width L
                       const float* idf,            // [V]
                       const float* denom,          // [n_docs] k1*(1-b+b*dl/avgdl)
                       float k1_plus1,
                       int32_t* table_ids,          // [n_docs, L], pre-filled -2
                       float* table_tfs,            // [n_docs, L] (raw tf; weights in py)
                       int32_t* overflow_count) {   // [1]
  std::vector<int64_t> cursor(vocab_size);
  for (int32_t t = 0; t < vocab_size; ++t) cursor[t] = csr_offsets[t];
  // per-doc tf accumulation via a sparse scratch keyed by term
  std::vector<float> tf_scratch(vocab_size, 0.f);
  std::vector<int32_t> touched;
  std::vector<std::pair<float, int32_t>> ranked;
  touched.reserve(256);
  int32_t overflow = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    touched.clear();
    for (int64_t i = offsets[d]; i < offsets[d + 1]; ++i) {
      int32_t t = tokens[i];
      if (t < 0 || t >= vocab_size) continue;
      if (tf_scratch[t] == 0.f) touched.push_back(t);
      tf_scratch[t] += 1.f;
    }
    for (int32_t t : touched) {
      postings_doc[cursor[t]] = d;
      postings_tf[cursor[t]] = tf_scratch[t];
      cursor[t]++;
    }
    const int32_t* selected = touched.data();
    int32_t n_sel = (int32_t)touched.size();
    if (n_sel > doc_term_cap) {
      overflow++;
      ranked.clear();
      for (int32_t t : touched) {
        float tf = tf_scratch[t];
        float w = idf[t] * tf * k1_plus1 / (tf + denom[d]);
        ranked.emplace_back(-w, t);
      }
      // (-w, t) pair order = weight desc with term-id-asc tie-break: the selected
      // SET is deterministic and matches the Python build's lexsort((ts, -w))[:L].
      std::nth_element(ranked.begin(), ranked.begin() + doc_term_cap, ranked.end());
      for (int32_t j = 0; j < doc_term_cap; ++j) touched[j] = ranked[j].second;
      // canonical slot order: term id ascending (matches Python overflow path)
      std::sort(touched.begin(), touched.begin() + doc_term_cap);
      n_sel = doc_term_cap;
      selected = touched.data();
    }
    for (int32_t j = 0; j < n_sel; ++j) {
      int32_t t = selected[j];
      table_ids[(int64_t)d * doc_term_cap + j] = t;
      table_tfs[(int64_t)d * doc_term_cap + j] = tf_scratch[t];
    }
    for (int64_t i = offsets[d]; i < offsets[d + 1]; ++i) {
      int32_t t = tokens[i];
      if (t >= 0 && t < vocab_size) tf_scratch[t] = 0.f;
    }
  }
  *overflow_count = overflow;
}

}  // extern "C"
