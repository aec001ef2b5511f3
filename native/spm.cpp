// SentencePiece unigram Viterbi encoder (host-side hot loop of the tokenizer).
//
// The reference consumes Google's sentencepiece C++ through fairseq2
// (spec mirrored at ggml/examples/unity/fairseq2.cpp:1637-1860); this is the
// TPU framework's native counterpart for corpus-scale tokenization (dataset
// building, finetune dataloaders). Semantics replicate text/spm.py::encode
// EXACTLY (iteration order, strict-> tie-breaking, single-char matched flag,
// byte fallback) so the Python implementation remains the parity reference.
// Normalization (NFKC, whitespace collapse, dummy prefix) stays in Python —
// this receives normalized UTF-8 bytes.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct SpmModel {
  std::unordered_map<std::string, int32_t> pieces;  // matchable only
  std::vector<float> scores;                        // all pieces
  int32_t byte_ids[256];
  int32_t unk_id = 0;
  float unk_score = -10.0f;
  int max_len = 1;  // longest matchable piece, bytes
};

inline int utf8_len(uint8_t b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xe) return 3;
  if ((b >> 3) == 0x1e) return 4;
  return 1;  // invalid byte: treat as one unit
}

}  // namespace

extern "C" {

// blob: concatenated UTF-8 piece bytes; offsets: (n+1) prefix offsets.
// matchable: n bytes (0/1). byte_ids: 256 int32 (-1 = no byte fallback piece).
void* seamless_spm_create(const uint8_t* blob, const int64_t* offsets,
                          int64_t n, const float* scores,
                          const uint8_t* matchable, const int32_t* byte_ids,
                          int32_t unk_id) {
  if (!blob || !offsets || !scores || !matchable || !byte_ids || n <= 0)
    return nullptr;
  auto* m = new SpmModel();
  m->scores.assign(scores, scores + n);
  float min_score = scores[0];
  for (int64_t i = 0; i < n; i++) min_score = std::min(min_score, scores[i]);
  m->unk_score = min_score - 10.0f;
  m->unk_id = unk_id;
  std::memcpy(m->byte_ids, byte_ids, 256 * sizeof(int32_t));
  for (int64_t i = 0; i < n; i++) {
    const int64_t len = offsets[i + 1] - offsets[i];
    if (len > m->max_len) m->max_len = static_cast<int>(len);
    if (matchable[i])
      m->pieces.emplace(
          std::string(reinterpret_cast<const char*>(blob) + offsets[i],
                      static_cast<size_t>(len)),
          static_cast<int32_t>(i));
  }
  return m;
}

// Viterbi over normalized UTF-8 text. Returns the id count (<= max_out),
// or -1 on error / overflow.
int64_t seamless_spm_encode(void* h, const uint8_t* text, int64_t len,
                            int32_t* out, int64_t max_out) {
  auto* m = static_cast<SpmModel*>(h);
  if (!m || !text || !out || len < 0) return -1;
  if (len == 0) return 0;
  constexpr double NEG = -1e18;
  const int64_t n = len;
  std::vector<double> best(static_cast<size_t>(n) + 1, NEG);
  std::vector<int64_t> back_start(static_cast<size_t>(n) + 1, -1);
  std::vector<int32_t> back_id(static_cast<size_t>(n) + 1, -2);
  best[0] = 0.0;
  std::string key;
  for (int64_t i = 0; i < n; i++) {
    if (best[i] <= NEG / 2) continue;
    const int cl = utf8_len(text[i]);
    bool matched = false;
    const int64_t limit = std::min(n, i + m->max_len);
    for (int64_t j = i + 1; j <= limit; j++) {
      key.assign(reinterpret_cast<const char*>(text) + i,
                 static_cast<size_t>(j - i));
      auto it = m->pieces.find(key);
      if (it == m->pieces.end()) continue;
      const double sc = best[i] + m->scores[it->second];
      if (sc > best[j]) {
        best[j] = sc;
        back_start[j] = i;
        back_id[j] = it->second;
      }
      if (j == i + cl) matched = true;
    }
    if (!matched) {
      const int64_t j = std::min(n, i + static_cast<int64_t>(cl));
      const double sc = best[i] + m->unk_score;
      if (sc > best[j]) {
        best[j] = sc;
        back_start[j] = i;
        back_id[j] = -1;  // unknown char -> byte fallback at backtrack
      }
    }
  }
  // backtrack (reversed), then reverse into out
  std::vector<int32_t> rev;
  rev.reserve(static_cast<size_t>(n));
  int64_t pos = n;
  bool any_byte = false;
  for (int b = 0; b < 256; b++)
    if (m->byte_ids[b] >= 0) { any_byte = true; break; }
  while (pos > 0) {
    const int64_t start = back_start[pos];
    const int32_t pid = back_id[pos];
    if (start < 0) return -1;  // unreachable state (shouldn't happen)
    if (pid == -1) {
      if (any_byte) {
        for (int64_t b = pos - 1; b >= start; b--) {
          const int32_t bid = m->byte_ids[text[b]];
          rev.push_back(bid >= 0 ? bid : m->unk_id);
        }
      } else {
        rev.push_back(m->unk_id);
      }
    } else {
      rev.push_back(pid);
    }
    pos = start;
  }
  if (static_cast<int64_t>(rev.size()) > max_out) return -1;
  for (size_t k = 0; k < rev.size(); k++)
    out[k] = rev[rev.size() - 1 - k];
  return static_cast<int64_t>(rev.size());
}

void seamless_spm_destroy(void* h) {
  delete static_cast<SpmModel*>(h);
}

}  // extern "C"
