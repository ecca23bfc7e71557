// comat_host — native host-side runtime for comat_tpu.
//
// The reference leans on torch DataLoader worker processes and a
// proprietary ceph client (aoss_client) for latent blobs
// (reference: training_utils/gan_dataset.py:8,51,61-62,
// dataset.py DataLoader), and on HF's Rust tokenizers. This library
// provides the TPU-host equivalents in C++ with a ctypes ABI:
//
//   1. LatentStore: jsonl-indexed .npy latent reader with a
//      std::thread prefetch pool — batch i+1's blobs are read/decoded
//      while the device executes step i (python threads cannot overlap
//      this work on the single-core hosts TPU VMs often expose per
//      process; these threads hold no GIL).
//   2. BPETokenizer: CLIP byte-level BPE (vocab.json + merges.txt),
//      batch-encoding prompts straight into int32 buffers with
//      BOS/EOS/pad-to-77 semantics identical to
//      comat_tpu/text/tokenizer.py (parity-tested).
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cctype>
#include <climits>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <functional>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

// ---------------------------------------------------------------------
// Minimal helpers
// ---------------------------------------------------------------------

namespace {

std::string json_extract_string(const std::string& line, const std::string& key) {
  // extract "key": "value" from a flat json object line
  auto kpos = line.find("\"" + key + "\"");
  if (kpos == std::string::npos) return "";
  auto colon = line.find(':', kpos);
  auto q1 = line.find('"', colon + 1);
  auto q2 = q1;
  do {
    q2 = line.find('"', q2 + 1);
  } while (q2 != std::string::npos && line[q2 - 1] == '\\');
  if (q1 == std::string::npos || q2 == std::string::npos) return "";
  std::string out = line.substr(q1 + 1, q2 - q1 - 1);
  // unescape the simple cases
  std::string res;
  for (size_t i = 0; i < out.size(); ++i) {
    if (out[i] == '\\' && i + 1 < out.size()) {
      ++i;
      switch (out[i]) {
        case 'n': res += '\n'; break;
        case 't': res += '\t'; break;
        default: res += out[i];
      }
    } else {
      res += out[i];
    }
  }
  return res;
}

}  // namespace

// ---------------------------------------------------------------------
// 1. Latent store with prefetch pool
// ---------------------------------------------------------------------

struct NpyBlob {
  std::vector<int64_t> shape;
  std::vector<float> data;
  bool ok = false;
};

static bool read_npy(const std::string& path, NpyBlob* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  unsigned char ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(&header[0], hlen);
  if (header.find("'<f4'") == std::string::npos &&
      header.find("'float32'") == std::string::npos)
    return false;  // only float32, C-order
  if (header.find("'fortran_order': True") != std::string::npos) return false;
  auto sp = header.find("'shape':");
  auto l = header.find('(', sp);
  auto r = header.find(')', l);
  std::string dims = header.substr(l + 1, r - l - 1);
  std::stringstream ss(dims);
  std::string tok;
  size_t total = 1;
  out->shape.clear();
  while (std::getline(ss, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    int64_t d = std::stoll(tok);
    out->shape.push_back(d);
    total *= static_cast<size_t>(d);
  }
  out->data.resize(total);
  f.read(reinterpret_cast<char*>(out->data.data()),
         static_cast<std::streamsize>(total * sizeof(float)));
  out->ok = static_cast<bool>(f);
  return out->ok;
}

struct LatentStore {
  std::vector<std::string> prompts;
  std::vector<std::vector<std::string>> files;  // per prompt
  std::unordered_map<std::string, int> prompt_to_idx;
  std::string root;

  // prefetch machinery
  std::vector<std::thread> workers;
  std::deque<std::pair<int64_t, std::string>> queue;  // ticket, path
  std::map<int64_t, NpyBlob> done;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::atomic<bool> stop{false};
  int64_t next_ticket = 0;
  unsigned seed = 12345;

  explicit LatentStore(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { worker_loop(); });
  }
  ~LatentStore() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker_loop() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      NpyBlob blob;
      read_npy(job.second, &blob);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.first] = std::move(blob);
      }
      cv_done.notify_all();
    }
  }

  int64_t submit(const std::string& path) {
    std::lock_guard<std::mutex> lk(mu);
    int64_t t = next_ticket++;
    queue.emplace_back(t, path);
    cv_work.notify_one();
    return t;
  }

  bool wait(int64_t ticket, NpyBlob* out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return done.count(ticket) > 0; });
    *out = std::move(done[ticket]);
    done.erase(ticket);
    return out->ok;
  }
};

extern "C" {

void* ch_store_open(const char* index_path, const char* root, int n_threads) {
  auto* s = new LatentStore(n_threads > 0 ? n_threads : 2);
  s->root = root ? root : "";
  std::ifstream f(index_path);
  if (!f) {
    delete s;
    return nullptr;
  }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    std::string prompt = json_extract_string(line, "prompt");
    std::string file = json_extract_string(line, "file_path");
    if (file.empty()) continue;
    auto it = s->prompt_to_idx.find(prompt);
    int idx;
    if (it == s->prompt_to_idx.end()) {
      idx = static_cast<int>(s->prompts.size());
      s->prompt_to_idx[prompt] = idx;
      s->prompts.push_back(prompt);
      s->files.emplace_back();
    } else {
      idx = it->second;
    }
    s->files[idx].push_back(file);
  }
  return s;
}

int ch_store_num_prompts(void* h) {
  return static_cast<int>(static_cast<LatentStore*>(h)->prompts.size());
}

int ch_store_lookup(void* h, const char* prompt) {
  auto* s = static_cast<LatentStore*>(h);
  auto it = s->prompt_to_idx.find(prompt);
  return it == s->prompt_to_idx.end() ? -1 : it->second;
}

// Submit async reads for a batch of prompt indices. Picks one latent
// uniformly per prompt (reference gan_dataset.py:59 random.choice).
// Returns tickets into `tickets_out` (caller allocates n).
void ch_store_prefetch(void* h, const int* prompt_idx, int n,
                       int64_t* tickets_out) {
  auto* s = static_cast<LatentStore*>(h);
  for (int i = 0; i < n; ++i) {
    int pi = prompt_idx[i];
    const auto& fl = s->files[pi];
    s->seed = s->seed * 1664525u + 1013904223u;
    const std::string& rel = fl[s->seed % fl.size()];
    std::string path =
        (!rel.empty() && rel[0] == '/') ? rel : s->root + "/" + rel;
    tickets_out[i] = s->submit(path);
  }
}

// Blocking fetch of a previously submitted ticket into out (size
// floats). Returns number of floats written, or -1.
int64_t ch_store_fetch(void* h, int64_t ticket, float* out, int64_t size) {
  auto* s = static_cast<LatentStore*>(h);
  NpyBlob blob;
  if (!s->wait(ticket, &blob)) return -1;
  int64_t n = static_cast<int64_t>(blob.data.size());
  if (n > size) return -1;
  std::memcpy(out, blob.data.data(), n * sizeof(float));
  return n;
}

void ch_store_close(void* h) { delete static_cast<LatentStore*>(h); }

}  // extern "C"

// ---------------------------------------------------------------------
// 2. CLIP byte-level BPE tokenizer
// ---------------------------------------------------------------------

struct BPETokenizer {
  std::unordered_map<std::string, int> vocab;
  std::unordered_map<std::string, int> merge_rank;  // "a b" -> rank
  std::unordered_map<int, std::string> byte_enc;    // byte -> unicode utf8
  std::unordered_map<std::string, std::vector<int>> cache;
  std::mutex cache_mu;
  int bos = 49406, eos = 49407;
};

static void build_byte_encoder(BPETokenizer* t) {
  std::vector<int> bs;
  for (int b = int('!'); b <= int('~'); ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs(bs.begin(), bs.end());
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (std::find(bs.begin(), bs.end(), b) == bs.end()) {
      bs.push_back(b);
      cs.push_back(256 + n);
      ++n;
    }
  }
  auto to_utf8 = [](int cp) {
    std::string out;
    if (cp < 0x80) {
      out += static_cast<char>(cp);
    } else if (cp < 0x800) {
      out += static_cast<char>(0xC0 | (cp >> 6));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      out += static_cast<char>(0xE0 | (cp >> 12));
      out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    }
    return out;
  };
  for (size_t i = 0; i < bs.size(); ++i) t->byte_enc[bs[i]] = to_utf8(cs[i]);
}

// split a UTF-8 string into codepoint-wise pieces
static std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  for (size_t i = 0; i < s.size();) {
    unsigned char c = s[i];
    int len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    out.push_back(s.substr(i, len));
    i += len;
  }
  return out;
}

static std::vector<int> bpe_word(BPETokenizer* t, const std::string& mapped) {
  {
    std::lock_guard<std::mutex> lk(t->cache_mu);
    auto it = t->cache.find(mapped);
    if (it != t->cache.end()) return it->second;
  }
  std::vector<std::string> word = utf8_chars(mapped);
  if (word.empty()) return {};
  word.back() += "</w>";
  while (word.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = t->merge_rank.find(word[i] + " " + word[i + 1]);
      if (it != t->merge_rank.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // merge ALL occurrences of this pair (left to right)
    std::string a = word[best_i], b = word[best_i + 1];
    std::vector<std::string> merged;
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
        merged.push_back(a + b);
        i += 2;
      } else {
        merged.push_back(word[i]);
        i += 1;
      }
    }
    word = std::move(merged);
  }
  std::vector<int> ids;
  for (auto& w : word) {
    auto it = t->vocab.find(w);
    if (it != t->vocab.end()) ids.push_back(it->second);
  }
  {
    std::lock_guard<std::mutex> lk(t->cache_mu);
    t->cache[mapped] = ids;
  }
  return ids;
}

static bool is_letter(char c) { return std::isalpha(static_cast<unsigned char>(c)); }
static bool is_digit(char c) { return std::isdigit(static_cast<unsigned char>(c)); }

// CLIP-style pretokenization (ASCII subset, matching the python
// fallback in comat_tpu/text/tokenizer.py)
static std::vector<std::string> pretokenize(const std::string& text) {
  std::vector<std::string> out;
  size_t i = 0;
  const std::string s = text;
  auto is_space = [](char c) { return std::isspace(static_cast<unsigned char>(c)); };
  while (i < s.size()) {
    if (is_space(s[i])) {
      ++i;
      continue;
    }
    // contractions
    static const char* contr[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
    bool got = false;
    for (auto* c : contr) {
      size_t l = std::strlen(c);
      if (s.compare(i, l, c) == 0) {
        out.emplace_back(s.substr(i, l));
        i += l;
        got = true;
        break;
      }
    }
    if (got) continue;
    if (is_letter(s[i])) {
      size_t j = i;
      while (j < s.size() && is_letter(s[j])) ++j;
      out.emplace_back(s.substr(i, j - i));
      i = j;
    } else if (is_digit(s[i])) {
      out.emplace_back(s.substr(i, 1));
      ++i;
    } else {
      size_t j = i;
      while (j < s.size() && !is_space(s[j]) && !is_letter(s[j]) &&
             !is_digit(s[j]))
        ++j;
      out.emplace_back(s.substr(i, j - i));
      i = j;
    }
  }
  return out;
}

extern "C" {

void* ch_bpe_load(const char* vocab_json_path, const char* merges_path) {
  auto* t = new BPETokenizer();
  build_byte_encoder(t);
  // vocab.json: flat {"tok": id, ...}
  std::ifstream vf(vocab_json_path);
  if (!vf) {
    delete t;
    return nullptr;
  }
  std::stringstream buf;
  buf << vf.rdbuf();
  std::string v = buf.str();
  size_t i = 0;
  while (true) {
    size_t q1 = v.find('"', i);
    if (q1 == std::string::npos) break;
    size_t q2 = q1;
    do {
      q2 = v.find('"', q2 + 1);
    } while (q2 != std::string::npos && v[q2 - 1] == '\\');
    if (q2 == std::string::npos) break;
    std::string key = v.substr(q1 + 1, q2 - q1 - 1);
    // unescape \uXXXX is not needed for CLIP vocab (utf-8 file); handle \\ and \"
    std::string uk;
    for (size_t p = 0; p < key.size(); ++p) {
      if (key[p] == '\\' && p + 1 < key.size() &&
          (key[p + 1] == '"' || key[p + 1] == '\\')) {
        ++p;
      }
      uk += key[p];
    }
    size_t colon = v.find(':', q2);
    size_t end = v.find_first_of(",}", colon);
    int id = std::stoi(v.substr(colon + 1, end - colon - 1));
    t->vocab[uk] = id;
    i = end + 1;
  }
  if (t->vocab.count("<|startoftext|>")) t->bos = t->vocab["<|startoftext|>"];
  if (t->vocab.count("<|endoftext|>")) t->eos = t->vocab["<|endoftext|>"];

  std::ifstream mf(merges_path);
  if (!mf) {
    delete t;
    return nullptr;
  }
  std::string line;
  int rank = 0;
  bool first = true;
  while (std::getline(mf, line)) {
    if (first && line.rfind("#", 0) == 0) {
      first = false;
      continue;
    }
    first = false;
    if (line.empty()) continue;
    t->merge_rank[line] = rank++;
  }
  return t;
}

// Encode n texts into out (n x max_len int32), EOS-padded; eos position
// per row into eos_out. Matches CLIPBPETokenizer.__call__.
void ch_bpe_encode_batch(void* h, const char** texts, int n, int max_len,
                         int32_t* out, int32_t* eos_out) {
  auto* t = static_cast<BPETokenizer*>(h);
  for (int r = 0; r < n; ++r) {
    std::string text = texts[r];
    for (auto& c : text) c = std::tolower(static_cast<unsigned char>(c));
    std::vector<int> ids;
    ids.push_back(t->bos);
    for (auto& wtok : pretokenize(text)) {
      std::string mapped;
      for (unsigned char b : wtok) mapped += t->byte_enc[b];
      for (int id : bpe_word(t, mapped)) ids.push_back(id);
    }
    ids.push_back(t->eos);
    if (static_cast<int>(ids.size()) > max_len) {
      ids.resize(max_len);
      ids.back() = t->eos;
    }
    eos_out[r] = static_cast<int32_t>(ids.size()) - 1;
    for (int c = 0; c < max_len; ++c)
      out[r * max_len + c] =
          c < static_cast<int>(ids.size()) ? ids[c] : t->eos;
  }
}

void ch_bpe_free(void* h) { delete static_cast<BPETokenizer*>(h); }

}  // extern "C"
