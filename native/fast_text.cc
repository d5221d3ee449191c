// fast_text — native batch text pipeline for conzic-tpu.
//
// The reference's host-side text work is HF Python tokenizers invoked per
// candidate inside the hot loop (/root/reference/gen_utils.py:75,
// clip/clip.py:71-73). The rebuild moves the hot loop on device; the
// remaining host text paths (snapshot decoding of (iters, B) id rows,
// large-corpus BPE encoding for the retrieval index builder, bridge-table
// construction over the 30,522-entry vocab) run through this C++ library
// when built, with the Python implementations as the always-available
// canonical fallback (behavior pinned by tests to be identical).
//
// C ABI only — consumed via ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003u ^
           std::hash<std::string>()(p.second);
  }
};

struct WordPieceVocab {
  std::vector<std::string> tokens;
  std::unordered_map<std::string, int32_t> ids;
  std::vector<uint8_t> is_special;  // [PAD]/[UNK]/[CLS]/[SEP]/[MASK]
  int32_t unk_id = -1;  // substituted for out-of-range ids (HF parity)
};

struct BpeVocab {
  std::unordered_map<std::string, int32_t> ids;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  int32_t unk_id = 0;
};

// ---------------------------------------------------------------------------
// WordPiece decode: ids -> " ".join(tokens).replace(" ##", "") + cleanup
// (mirrors conzic_tpu/text/wordpiece.py decode()).
// ---------------------------------------------------------------------------

void replace_all(std::string& s, const std::string& from,
                 const std::string& to) {
  size_t pos = 0;
  while ((pos = s.find(from, pos)) != std::string::npos) {
    s.replace(pos, from.size(), to);
    pos += to.size();
  }
}

std::string cleanup(std::string text) {
  replace_all(text, " .", ".");
  replace_all(text, " ?", "?");
  replace_all(text, " !", "!");
  replace_all(text, " ,", ",");
  replace_all(text, " ' ", "'");  // HF: no trailing space
  replace_all(text, " n't", "n't");
  replace_all(text, " 'm", "'m");
  replace_all(text, " 's", "'s");
  replace_all(text, " 've", "'ve");
  replace_all(text, " 're", "'re");
  return text;
}

std::string decode_row(const WordPieceVocab& v, const int32_t* ids, int n,
                       bool skip_special) {
  // Mirrors Python: " ".join(tokens).replace(" ##", "") — only a
  // space-preceded "##" is merged; a row-leading "##piece" keeps its marker.
  std::string out;
  bool first = true;
  for (int i = 0; i < n; ++i) {
    int32_t id = ids[i];
    if (id < 0 || id >= (int32_t)v.tokens.size()) {
      // Python convert_ids_to_tokens maps unknown ids to the UNK token
      // (HF get(index, unk_token)); silently skipping would desync the
      // pinned native==Python contract
      if (v.unk_id < 0) continue;
      id = v.unk_id;
    }
    if (skip_special && v.is_special[id]) continue;
    const std::string& tok = v.tokens[id];
    if (!first && tok.size() >= 2 && tok[0] == '#' && tok[1] == '#') {
      out.append(tok, 2, std::string::npos);
    } else {
      if (!first) out.push_back(' ');
      out.append(tok);
    }
    first = false;
  }
  // strip (python .strip() after join/merge)
  size_t b = out.find_first_not_of(' ');
  size_t e = out.find_last_not_of(' ');
  if (b == std::string::npos) return "";
  return cleanup(out.substr(b, e - b + 1));
}

// ---------------------------------------------------------------------------
// BPE word encoding (mirrors conzic_tpu/text/bpe.py _bpe for a single
// pre-normalized byte-encoded token).
// ---------------------------------------------------------------------------

std::vector<std::string> bpe_word(const BpeVocab& v, const std::string& token) {
  std::vector<std::string> word;
  // split into UTF-8 codepoints; last gets </w>
  size_t i = 0;
  while (i < token.size()) {
    size_t len = 1;
    unsigned char c = token[i];
    if ((c & 0x80) == 0x00) len = 1;
    else if ((c & 0xE0) == 0xC0) len = 2;
    else if ((c & 0xF0) == 0xE0) len = 3;
    else if ((c & 0xF8) == 0xF0) len = 4;
    word.push_back(token.substr(i, len));
    i += len;
  }
  if (word.empty()) return word;
  word.back() += "</w>";
  if (word.size() == 1) return word;
  while (word.size() > 1) {
    int32_t best_rank = std::numeric_limits<int32_t>::max();
    std::pair<std::string, std::string> best;
    for (size_t j = 0; j + 1 < word.size(); ++j) {
      auto it = v.ranks.find({word[j], word[j + 1]});
      if (it != v.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best = it->first;
      }
    }
    if (best_rank == std::numeric_limits<int32_t>::max()) break;
    std::vector<std::string> merged;
    for (size_t j = 0; j < word.size();) {
      if (j + 1 < word.size() && word[j] == best.first &&
          word[j + 1] == best.second) {
        merged.push_back(word[j] + word[j + 1]);
        j += 2;
      } else {
        merged.push_back(word[j]);
        j += 1;
      }
    }
    word.swap(merged);
  }
  return word;
}

}  // namespace

extern "C" {

// --- WordPiece vocab lifecycle ---------------------------------------------

void* ft_wordpiece_new(const char** tokens, int32_t n,
                       const int32_t* special_ids, int32_t n_special,
                       int32_t unk_id) {
  auto* v = new WordPieceVocab();
  v->unk_id = (unk_id >= 0 && unk_id < n) ? unk_id : -1;
  v->tokens.reserve(n);
  v->is_special.assign(n, 0);
  for (int32_t i = 0; i < n; ++i) {
    v->tokens.emplace_back(tokens[i]);
    v->ids.emplace(v->tokens.back(), i);
  }
  for (int32_t i = 0; i < n_special; ++i) {
    int32_t id = special_ids[i];
    if (id >= 0 && id < n) v->is_special[id] = 1;
  }
  return v;
}

void ft_wordpiece_free(void* handle) {
  delete static_cast<WordPieceVocab*>(handle);
}

// Batch decode rows of shape (n_rows, row_len) into out_buf, '\n'-joined.
// Returns bytes written (excluding terminating NUL), or -1 if out_cap too
// small (caller doubles the buffer and retries).
int64_t ft_wordpiece_batch_decode(void* handle, const int32_t* ids,
                                  int32_t n_rows, int32_t row_len,
                                  int32_t skip_special, char* out_buf,
                                  int64_t out_cap) {
  auto* v = static_cast<WordPieceVocab*>(handle);
  std::string all;
  all.reserve((size_t)n_rows * row_len * 6);
  for (int32_t r = 0; r < n_rows; ++r) {
    if (r) all.push_back('\n');
    all += decode_row(*v, ids + (size_t)r * row_len, row_len,
                      skip_special != 0);
  }
  if ((int64_t)all.size() + 1 > out_cap) return -1;
  std::memcpy(out_buf, all.data(), all.size());
  out_buf[all.size()] = '\0';
  return (int64_t)all.size();
}

// --- BPE vocab lifecycle ----------------------------------------------------

void* ft_bpe_new(const char** vocab_tokens, const int32_t* vocab_ids,
                 int32_t n_vocab, const char** merge_firsts,
                 const char** merge_seconds, int32_t n_merges,
                 int32_t unk_id) {
  auto* v = new BpeVocab();
  for (int32_t i = 0; i < n_vocab; ++i) {
    v->ids.emplace(std::string(vocab_tokens[i]), vocab_ids[i]);
  }
  for (int32_t i = 0; i < n_merges; ++i) {
    v->ranks.emplace(std::make_pair(std::string(merge_firsts[i]),
                                    std::string(merge_seconds[i])),
                     i);
  }
  v->unk_id = unk_id;
  return v;
}

void ft_bpe_free(void* handle) { delete static_cast<BpeVocab*>(handle); }

// Encode one pre-normalized byte-encoded word into ids.
// Returns number of pieces (clamped to max_out).
int32_t ft_bpe_encode_word(void* handle, const char* word, int32_t* out_ids,
                           int32_t max_out) {
  auto* v = static_cast<BpeVocab*>(handle);
  auto pieces = bpe_word(*v, std::string(word));
  int32_t n = 0;
  for (const auto& p : pieces) {
    if (n >= max_out) break;
    auto it = v->ids.find(p);
    out_ids[n++] = it == v->ids.end() ? v->unk_id : it->second;
  }
  return n;
}

// Batch-encode n pre-normalized words, each -> up to max_pieces ids.
// out_ids has shape (n, max_pieces), out_lens (n,).
void ft_bpe_encode_words(void* handle, const char** words, int32_t n,
                         int32_t* out_ids, int32_t* out_lens,
                         int32_t max_pieces) {
  for (int32_t i = 0; i < n; ++i) {
    out_lens[i] =
        ft_bpe_encode_word(handle, words[i], out_ids + (size_t)i * max_pieces,
                           max_pieces);
  }
}

}  // extern "C"
