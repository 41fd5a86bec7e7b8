// Batch ESM-2 tokenizer fast path — the framework-native stand-in for the
// role HF's Rust `tokenizers` plays in the reference stack
// (environment.yml:147 backs EsmTokenizer). One pass per sequence:
// byte-table lookup, greedy multi-char special matching ("<mask>" etc.),
// <cls>/<eos> framing, pad/truncate to a static bucket length.
//
// C ABI for ctypes; vocabulary is fixed (the 33-token ESM alphabet,
// protein_clip_tpu/data/tokenizer.py).

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t CLS = 0, PAD = 1, EOS = 2, UNK = 3, MASK = 32, NULL1 = 31;

// single-char token ids, index = byte value
int8_t byte_table[256];
bool table_init = false;

void init_table() {
  if (table_init) return;
  for (int i = 0; i < 256; ++i) byte_table[i] = UNK;
  const char* toks = "LAGVSERTIDPKQNFYMHWCXBUZO.-";
  // ids 4..30 in vocab order
  for (int i = 0; toks[i]; ++i)
    byte_table[static_cast<unsigned char>(toks[i])] =
        static_cast<int8_t>(4 + i);
  table_init = true;
}

// greedy special-token match at s[i]; returns token id and advances *len
int32_t match_special(const char* s, int* len) {
  struct Special { const char* text; int n; int32_t id; };
  static const Special specials[] = {
      {"<null_1>", 8, NULL1}, {"<mask>", 6, MASK}, {"<cls>", 5, CLS},
      {"<pad>", 5, PAD}, {"<eos>", 5, EOS}, {"<unk>", 5, UNK},
  };
  for (const auto& sp : specials) {
    if (std::strncmp(s, sp.text, sp.n) == 0) {
      *len = sp.n;
      return sp.id;
    }
  }
  *len = 1;
  return byte_table[static_cast<unsigned char>('<')];
}

}  // namespace

extern "C" {

// Tokenize n sequences into (n, pad_to) int32 ids + mask (caller-allocated,
// row-major). Adds <cls>/<eos>; truncates to pad_to keeping a final <eos>.
// Returns the max unpadded encoded length across the batch.
int pct_tokenize_batch(const char** seqs, int n, int pad_to,
                       int32_t* out_ids, int32_t* out_mask) {
  init_table();
  int max_len = 0;
  for (int row = 0; row < n; ++row) {
    int32_t* ids = out_ids + static_cast<int64_t>(row) * pad_to;
    int32_t* mask = out_mask + static_cast<int64_t>(row) * pad_to;
    const char* s = seqs[row];
    int w = 0;
    ids[w++] = CLS;
    int full_len = 1;  // tracks untruncated length for the return value
    for (int i = 0; s[i]; ) {
      int32_t id;
      int adv = 1;
      if (s[i] == '<') {
        id = match_special(s + i, &adv);
      } else {
        id = byte_table[static_cast<unsigned char>(s[i])];
      }
      i += adv;
      ++full_len;
      if (w < pad_to - 1) ids[w++] = id;
    }
    ++full_len;  // eos
    ids[w++] = EOS;
    if (full_len > max_len) max_len = full_len;
    for (int j = 0; j < w; ++j) mask[j] = 1;
    for (int j = w; j < pad_to; ++j) { ids[j] = PAD; mask[j] = 0; }
  }
  return max_len;
}

}  // extern "C"
