// Native host-side index-build runtime.
//
// TPU-native replacement for the reference's host hot loops: the per-token
// Python tokenize/term-dict loop (`/root/reference/searcharray/indexing.py:64-99`)
// and the O(T log T) stable argsort inversion (`indexing.py:102-115`).
// Device-side compute (popcount/intersect/BM25 etc.) lives in XLA/Pallas;
// this library only turns raw text into sorted (term, doc, posn) columns at
// memory speed.
//
// Exposed C ABI (ctypes):
//   sa_tokenize_corpus : text -> term_ids/doc_ids(implicit)/posns + vocab
//   sa_sort_by_term    : stable counting-sort permutation by term id
//
// Build: ninja/make via setup_native.py (g++ -O3 -march=native -fPIC).
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <deque>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Corpus {
  std::vector<int32_t> term_ids;   // one per token
  std::vector<int32_t> doc_lens;   // tokens per doc (pre-truncation clamp)
  std::vector<char> vocab_chars;   // concatenated term bytes
  std::vector<int64_t> vocab_offsets;  // V+1 offsets into vocab_chars
};

struct TokenizerOpts {
  bool lowercase;
  bool strip_punct;
  int32_t max_posn;  // truncate docs to this many tokens (0 = no limit)
};

// Python str.split() whitespace, ASCII subset: also 0x1c-0x1f (FS/GS/RS/US).
// Non-ASCII docs never reach this tokenizer (builder routes them to the
// Python path), so the ASCII set is exact here.
inline bool is_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v' || (c >= 0x1c && c <= 0x1f);
}

inline bool is_punct_ascii(unsigned char c) {
  return (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
         (c >= '[' && c <= '`') || (c >= '{' && c <= '~');
}

// First-occurrence-ordered string interner (reference TermDict semantics,
// `term_dict.py:16-21`).
class Interner {
 public:
  int32_t intern(std::string_view tok) {
    auto it = map_.find(tok);
    if (it != map_.end()) return it->second;
    int32_t id = static_cast<int32_t>(offsets_.size() - 1);
    chars_.insert(chars_.end(), tok.begin(), tok.end());
    offsets_.push_back(static_cast<int64_t>(chars_.size()));
    // the key must point at stable storage: rebuild view into chars_ later;
    // store in arena-backed string list
    arena_.emplace_back(tok);
    map_.emplace(arena_.back(), id);
    return id;
  }
  std::vector<char> chars_;
  std::vector<int64_t> offsets_{0};

 private:
  // deque: stable element addresses so string_view keys never dangle
  std::deque<std::string> arena_;
  std::unordered_map<std::string_view, int32_t> map_;
};

Corpus* tokenize(const char* buf, const int64_t* doc_offsets, int64_t n_docs,
                 TokenizerOpts opts) {
  auto* out = new Corpus();
  Interner interner;
  out->doc_lens.resize(n_docs);

  std::string scratch;
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* beg = buf + doc_offsets[d];
    const char* end = buf + doc_offsets[d + 1];
    int32_t count = 0;
    const char* p = beg;
    while (p < end) {
      while (p < end && (is_ws(*p) ||
                         (opts.strip_punct && is_punct_ascii(*p))))
        ++p;
      const char* tok_beg = p;
      while (p < end && !is_ws(*p) &&
             !(opts.strip_punct && is_punct_ascii(*p)))
        ++p;
      if (p == tok_beg) continue;
      if (opts.max_posn > 0 && count >= opts.max_posn) continue;
      std::string_view tok(tok_beg, static_cast<size_t>(p - tok_beg));
      if (opts.lowercase) {
        scratch.assign(tok);
        for (auto& c : scratch)
          if (c >= 'A' && c <= 'Z') c = static_cast<char>(c - 'A' + 'a');
        out->term_ids.push_back(interner.intern(scratch));
      } else {
        out->term_ids.push_back(interner.intern(tok));
      }
      ++count;
    }
    out->doc_lens[d] = count;
  }
  out->vocab_chars = std::move(interner.chars_);
  out->vocab_offsets = std::move(interner.offsets_);
  return out;
}

}  // namespace

extern "C" {

// Tokenize a corpus packed as one buffer + per-doc offsets (n_docs+1).
// Returns an opaque handle; query sizes then copy out and free.
void* sa_tokenize_corpus(const char* buf, const int64_t* doc_offsets,
                         int64_t n_docs, int32_t lowercase,
                         int32_t strip_punct, int32_t max_posn) {
  TokenizerOpts opts{lowercase != 0, strip_punct != 0, max_posn};
  return tokenize(buf, doc_offsets, n_docs, opts);
}

int64_t sa_corpus_num_tokens(void* h) {
  return static_cast<int64_t>(static_cast<Corpus*>(h)->term_ids.size());
}
int64_t sa_corpus_num_terms(void* h) {
  return static_cast<int64_t>(
      static_cast<Corpus*>(h)->vocab_offsets.size() - 1);
}
int64_t sa_corpus_vocab_bytes(void* h) {
  return static_cast<int64_t>(static_cast<Corpus*>(h)->vocab_chars.size());
}

void sa_corpus_export(void* h, int32_t* term_ids, int32_t* doc_lens,
                      char* vocab_chars, int64_t* vocab_offsets) {
  auto* c = static_cast<Corpus*>(h);
  std::memcpy(term_ids, c->term_ids.data(),
              c->term_ids.size() * sizeof(int32_t));
  std::memcpy(doc_lens, c->doc_lens.data(),
              c->doc_lens.size() * sizeof(int32_t));
  std::memcpy(vocab_chars, c->vocab_chars.data(), c->vocab_chars.size());
  std::memcpy(vocab_offsets, c->vocab_offsets.data(),
              c->vocab_offsets.size() * sizeof(int64_t));
}

void sa_corpus_free(void* h) { delete static_cast<Corpus*>(h); }

// Stable counting sort by term id: writes the permutation such that
// term_ids[perm] is grouped by term with original (doc, posn) order kept.
// O(n + V), replacing numpy's O(n log n) stable argsort.
void sa_sort_by_term(const int32_t* term_ids, int64_t n, int32_t num_terms,
                     int64_t* perm) {
  std::vector<int64_t> counts(static_cast<size_t>(num_terms) + 1, 0);
  for (int64_t i = 0; i < n; ++i) counts[term_ids[i] + 1]++;
  for (int32_t t = 0; t < num_terms; ++t) counts[t + 1] += counts[t];
  for (int64_t i = 0; i < n; ++i) perm[counts[term_ids[i]]++] = i;
}

// Fused index inversion + roaringish encoding, one batch in one call.
//
// Replaces the numpy pipeline (builder.py: np.repeat doc ids/posns,
// counting-sort gather, segmented reduceat encode, lexsort doc-term CSR)
// with three O(n) passes.  Wire format per word (frozen):
//   u64 = doc_key << 36 | (posn / 18) << 18 | 1 << (posn % 18)
//
// Inputs : term_ids[n] in token order, doc_lens[n_docs] (tokens per doc),
//          start_doc (global id of doc 0), num_terms (vocab size).
// Outputs: words_out       (cap n)        packed posting words, term-major
//          present_out     (cap num_terms) term ids with >=1 posting
//          bounds_out      (cap num_terms+1) word ranges per present term
//          dt_cols_out     (cap n)        doc->term CSR columns (term asc)
//          dt_rows_out     (n_docs+1)     doc->term CSR offsets
//          sizes_out[3]  = {n_words, n_present, n_pairs}
void sa_invert_encode(const int32_t* term_ids, int64_t n,
                      const int32_t* doc_lens, int64_t n_docs,
                      int64_t start_doc, int32_t num_terms,
                      uint64_t* words_out, int32_t* present_out,
                      int64_t* bounds_out, uint32_t* dt_cols_out,
                      int64_t* dt_rows_out, int64_t* sizes_out) {
  // pass 1: histogram -> term-major offsets
  std::vector<int64_t> offsets(static_cast<size_t>(num_terms) + 1, 0);
  for (int64_t i = 0; i < n; ++i) offsets[term_ids[i] + 1]++;
  for (int32_t t = 0; t < num_terms; ++t) offsets[t + 1] += offsets[t];

  // pass 2: scatter (doc, posn) into term-major order (stable)
  std::vector<int32_t> tdoc(static_cast<size_t>(n));
  std::vector<int32_t> tposn(static_cast<size_t>(n));
  {
    std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
    int64_t i = 0;
    for (int64_t d = 0; d < n_docs; ++d) {
      const int32_t len = doc_lens[d];
      for (int32_t p = 0; p < len; ++p, ++i) {
        const int64_t slot = cursor[term_ids[i]]++;
        tdoc[slot] = static_cast<int32_t>(d);
        tposn[slot] = p;
      }
    }
  }

  // pass 3: encode words + collect (doc, term) pairs per doc
  std::vector<int64_t> dt_count(static_cast<size_t>(n_docs) + 1, 0);
  std::vector<int32_t> pair_doc;
  std::vector<int32_t> pair_term;
  pair_doc.reserve(1024);
  pair_term.reserve(1024);
  int64_t w = 0;
  int64_t n_present = 0;
  for (int32_t t = 0; t < num_terms; ++t) {
    const int64_t lo = offsets[t], hi = offsets[t + 1];
    if (lo == hi) continue;
    present_out[n_present] = t;
    bounds_out[n_present] = w;
    ++n_present;
    uint64_t prev_hdr = ~0ull;
    int32_t prev_doc = -1;
    for (int64_t i = lo; i < hi; ++i) {
      const uint64_t key = static_cast<uint64_t>(start_doc + tdoc[i]);
      const uint64_t posn = static_cast<uint64_t>(tposn[i]);
      const uint64_t hdr = (key << 36) | ((posn / 18) << 18);
      const uint64_t bit = 1ull << (posn % 18);
      if (hdr != prev_hdr) {
        words_out[w++] = hdr | bit;
        prev_hdr = hdr;
      } else {
        words_out[w - 1] |= bit;
      }
      if (tdoc[i] != prev_doc) {
        prev_doc = tdoc[i];
        dt_count[tdoc[i] + 1]++;
        pair_doc.push_back(tdoc[i]);
        pair_term.push_back(t);
      }
    }
  }
  bounds_out[n_present] = w;

  // pass 4: doc-major CSR from the term-major (doc, term) pairs; terms
  // come out ascending per doc because pass 3 visits terms ascending
  for (int64_t d = 0; d < n_docs; ++d) dt_count[d + 1] += dt_count[d];
  for (int64_t d = 0; d <= n_docs; ++d) dt_rows_out[d] = dt_count[d];
  {
    std::vector<int64_t> cursor(dt_count.begin(), dt_count.end() - 1);
    const int64_t n_pairs = static_cast<int64_t>(pair_doc.size());
    for (int64_t i = 0; i < n_pairs; ++i) {
      dt_cols_out[cursor[pair_doc[i]]++] =
          static_cast<uint32_t>(pair_term[i]);
    }
    sizes_out[2] = n_pairs;
  }
  sizes_out[0] = w;
  sizes_out[1] = n_present;
}

// Gather posting segments from per-batch buffers into one contiguous
// term-major buffer (the _repack hot loop).  Replaces numpy's
// arange+repeat+fancy-gather pipeline, which builds THREE word-sized
// int64 index arrays before copying a single byte (measured 45 s of a
// 68 s 1M-doc build; this is a plain memcpy per segment).
//   bufs     : per-batch base pointers (as int64 addresses)
//   seg_buf  : which batch each segment reads from
//   starts   : word offset of each segment within its batch buffer
//   lens     : words per segment
// Output segments are written consecutively in call order.
void sa_copy_segments(const int64_t* bufs, const int32_t* seg_buf,
                      const int64_t* starts, const int64_t* lens,
                      int64_t n_segs, uint64_t* out) {
  int64_t w = 0;
  for (int64_t s = 0; s < n_segs; ++s) {
    const uint64_t* src =
        reinterpret_cast<const uint64_t*>(bufs[seg_buf[s]]) + starts[s];
    std::memcpy(out + w, src, static_cast<size_t>(lens[s]) * sizeof(uint64_t));
    w += lens[s];
  }
}

// u64 posting words -> 32-bit device planes (hdr32 = key << blk_bits |
// block, pay32 = 18-bit posn bitmap), one pass.  Replaces ~10 numpy
// word-sized passes with temporaries (kernels.compress_planes).
// Returns the max header so the caller can run its 31-bit range check.
int64_t sa_compress_planes(const uint64_t* words, int64_t n,
                           int32_t blk_bits, int32_t* hdr_out,
                           uint32_t* pay_out) {
  int64_t max_hdr = -1;
  const uint64_t blk_mask = (1ull << 18) - 1;
  const uint64_t pay_mask = (1ull << 18) - 1;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t w = words[i];
    const int64_t hdr = static_cast<int64_t>(
        ((w >> 36) << blk_bits) | ((w >> 18) & blk_mask));
    hdr_out[i] = static_cast<int32_t>(hdr);
    pay_out[i] = static_cast<uint32_t>(w & pay_mask);
    if (hdr > max_hdr) max_hdr = hdr;
  }
  return max_hdr;
}

// Per term: max posting words falling in any doc_block-sized doc range
// (the tile bound for the Pallas block-reduce scorer).  Words in a slice
// are doc-sorted, so equal (doc / doc_block) words form contiguous runs.
// Replaces a numpy pipeline whose np.maximum.at scatter ran ~100 ns/word.
void sa_block_max(const uint64_t* words, const int64_t* offsets,
                  const int64_t* lengths, int64_t num_terms,
                  int32_t doc_block, int64_t* out) {
  for (int64_t t = 0; t < num_terms; ++t) {
    const int64_t lo = offsets[t], n = lengths[t];
    int64_t best = 0, run = 0;
    uint64_t prev_blk = ~0ull;
    for (int64_t i = 0; i < n; ++i) {
      const uint64_t blk = (words[lo + i] >> 36) /
                           static_cast<uint64_t>(doc_block);
      run = (blk == prev_blk) ? run + 1 : 1;
      prev_blk = blk;
      if (run > best) best = run;
    }
    out[t] = best;
  }
}

// Per-term document frequency over the CSR posting buffer: one pass,
// counting doc-key changes (key = word >> 36) within each term's slice.
// Replaces the numpy repeat+bincount pipeline (O(W) int64 temporaries).
void sa_doc_freqs(const uint64_t* words, const int64_t* offsets,
                  const int64_t* lengths, int64_t num_terms,
                  int64_t* df_out) {
  for (int64_t t = 0; t < num_terms; ++t) {
    const int64_t lo = offsets[t], n = lengths[t];
    int64_t df = 0;
    uint64_t prev = ~0ull;
    for (int64_t i = 0; i < n; ++i) {
      const uint64_t key = words[lo + i] >> 36;
      df += (key != prev);
      prev = key;
    }
    df_out[t] = df;
  }
}

}  // extern "C"
